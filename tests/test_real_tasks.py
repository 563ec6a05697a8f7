"""Real-text fixture suite (VERDICT r2 #7): the REAL task classes of
eval/tasks.py run end-to-end over assets/real_tasks/*.jsonl through the
full BlockTransformerLM adapter path, including generate_until with the
real extraction regexes applied to ACTUAL model generations."""

import json
import os

import jax
import numpy as np
import pytest

from block_transformer_tpu.config import make_block_config
from block_transformer_tpu.eval import adapters, harness, tasks
from block_transformer_tpu.models import init_block_transformer_params

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FIX = os.path.join(ROOT, "assets", "real_tasks")

pytestmark = pytest.mark.skipif(not os.path.isdir(FIX),
                                reason="fixtures not built")


def _load(name):
    with open(os.path.join(FIX, name)) as f:
        return [json.loads(l) for l in f]


class ByteTok:
    eos_token_id = 0

    def encode(self, s):
        return [min(ord(c), 255) + 3 for c in s]

    def decode(self, toks):
        return "".join(chr(int(t) - 3) for t in toks if 3 <= t < 259)


def test_fixture_schemas():
    lam = _load("lambada_pg.jsonl")
    assert len(lam) >= 200
    for d in lam[:20]:
        ctx, word = d["text"].rsplit(" ", 1)
        assert len(ctx.split()) >= 25 and word.isalpha()
        # LAMBADA guessability: target occurs earlier in the passage
        assert word.lower() in ctx.lower()
    wik = _load("wikitext_pg.jsonl")
    assert len(wik) >= 12
    # encoded pages carry real wikitext tokenization artifacts that the
    # REAL detokenizer strips
    enc = "".join(d["page"] for d in wik)
    assert " , " in enc and " . " in enc
    dec = tasks.wikitext_detokenizer(wik[0]["page"])
    assert " , " not in dec and "@-@" not in dec
    # both splits present
    assert any(d["seen"] for d in lam) and any(not d["seen"] for d in lam)


def test_trivia_gsm8k_schemas_match_real_tasks():
    tri = tasks.TriviaQA(docs=_load("trivia_real.jsonl"))
    d = tri.docs()[0]
    assert tri.doc_to_text(d).startswith("Question: ")
    assert tri.gold_answers(d)
    g = tasks.GSM8K(docs=_load("gsm8k_style.jsonl"))
    d = g.docs()[0]
    # the real flexible-extract regex finds the #### gold number
    assert g.gold_answers(d)[0].lstrip("-").isdigit()
    assert g._extract_number("so the total is 12 + 5 = 17. #### 17") == "17"
    assert g._extract_number("I think it is 1,234 dollars") == "1234"


@pytest.fixture(scope="module")
def tiny_lm():
    cfg = make_block_config("tiny", vocab_size=512,
                            block_decoder_hidden=64,
                            block_decoder_layers=2, max_length=512)
    params = jax.jit(lambda k: init_block_transformer_params(
        k, cfg, dtype=jax.numpy.float32))(jax.random.PRNGKey(0))
    return adapters.BlockTransformerLM(params, cfg, ByteTok(),
                                       max_length=512, batch_size=4)


def test_real_suite_end_to_end(tiny_lm):
    """Full adapter path over every fixture task (limit=4 docs for CI
    speed): loglikelihood, rolling ppl, and generate_until with the real
    stop sequences + extraction regexes on actual generations."""
    suite = [tasks.LambadaOpenAI(docs=_load("lambada_pg.jsonl")[:4]),
             tasks.Wikitext(docs=_load("wikitext_pg.jsonl")[:2]),
             tasks.TriviaQA(docs=_load("trivia_real.jsonl")[:4]),
             tasks.GSM8K(docs=_load("gsm8k_style.jsonl")[:2])]
    out = harness.evaluate(tiny_lm, suite, return_per_doc=True)
    r = out["results"]
    assert 0.0 <= r["lambada_openai"]["acc"] <= 1.0
    assert np.isfinite(r["lambada_openai"]["perplexity"])
    assert r["wikitext"]["word_perplexity"] > 1.0
    assert 0.0 <= r["triviaqa"]["exact_match"] <= 1.0
    assert 0.0 <= r["gsm8k"]["exact_match"] <= 1.0
    assert len(out["per_doc"]["lambada_openai"]) == 4


def test_gsm8k_extraction_on_real_generation(tiny_lm):
    """The untrained byte model's raw generation flows through the real
    gsm8k extraction — exercising the regex on model output, not strings
    we invented."""
    g = tasks.GSM8K(docs=_load("gsm8k_style.jsonl")[:1])
    (req,) = g.build_requests(g.docs()[0])
    gen = tiny_lm.generate_until([req[1]])[0]
    assert isinstance(gen, str)
    # extraction must not crash on arbitrary bytes and returns a digit
    # string or empty
    ans = g.extract_answer(gen)
    assert ans == "" or ans.lstrip("-").replace(".", "").isdigit()
