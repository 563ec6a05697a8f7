"""Eval harness tests: adapter logit alignment vs direct forward, harness
driver + metrics with a mock LM, and the multiple-choice/perplexity task
machinery."""

import numpy as np
import jax
import jax.numpy as jnp

from tests.test_block_parity import make_cfg, VOCAB, L
from block_transformer_tpu.eval import adapters, harness
from block_transformer_tpu.models import block_transformer as bt
from block_transformer_tpu.models import vanilla as vmod
from block_transformer_tpu.config import NeoXConfig


class CharTokenizer:
    """Maps each character to ord(c) % (VOCAB-2) + 2 (never emits 0/1)."""
    eos_token_id = 0

    def encode(self, s):
        return [ord(c) % (VOCAB - 2) + 2 for c in s]


def test_vanilla_adapter_alignment():
    cfg = NeoXConfig(vocab_size=VOCAB, hidden_size=64, num_layers=2,
                     num_heads=4, intermediate_size=256,
                     max_position_embeddings=256)
    params = vmod.init_vanilla_params(jax.random.PRNGKey(0), cfg)
    lm = adapters.VanillaLM(params, cfg, CharTokenizer(), max_length=128,
                            batch_size=4)
    ctx = [5, 6, 7]
    cont = [8, 9]
    (ll, greedy), = lm._loglikelihood_tokens([(ctx, cont)])
    # manual: forward over [5,6,7,8] (input = whole[:-1]); logits[t] predicts
    # position t+1 of whole
    whole = ctx + cont
    logits = np.asarray(vmod.vanilla_forward(
        params, cfg, jnp.asarray([whole[:-1]], jnp.int32)))
    lp = logits - np.log(np.exp(logits - logits.max(-1, keepdims=True)
                                ).sum(-1, keepdims=True)) - logits.max(-1, keepdims=True)
    want = lp[0, 2, 8] + lp[0, 3, 9]
    np.testing.assert_allclose(ll, want, rtol=1e-4)


def test_block_adapter_alignment():
    cfg = make_cfg()
    params = bt.init_block_transformer_params(jax.random.PRNGKey(1), cfg)
    lm = adapters.BlockTransformerLM(params, cfg, CharTokenizer(),
                                     max_length=64, batch_size=4)
    ctx = [5, 6, 7, 8, 9]
    cont = [10, 11, 12]
    (ll, greedy), = lm._loglikelihood_tokens([(ctx, cont)])

    # manual reconstruction of the pad-adapter layout:
    whole = ctx + cont
    inp = whole[:-1]
    S = len(inp)
    left = L - 1
    total = S + left
    right = (-total) % L or L
    total += right
    ids = np.zeros((1, total), np.int64)
    ids[0, left:left + S] = inp
    att = np.zeros_like(ids)
    att[0, left:left + S] = 1
    att[0, left + S] = 1   # EOS bit
    N = total // L
    out = bt.block_transformer_forward(
        params, cfg, jnp.asarray(ids.reshape(1, N, L)),
        jnp.asarray(att.reshape(1, N, L)),
        jnp.asarray(att.reshape(1, N, L).any(-1).astype(np.int64)))
    flat = np.asarray(out.logits).reshape(1, (N - 1) * L, -1)[:, :S]
    lp = flat - np.log(np.exp(flat - flat.max(-1, keepdims=True)
                              ).sum(-1, keepdims=True)) - flat.max(-1, keepdims=True)
    # cont tokens are whole[-3:], predicted by logits at input positions
    # len(whole)-4 .. len(whole)-2
    want = sum(lp[0, len(whole) - 1 - len(cont) + j, t]
               for j, t in enumerate(cont))
    np.testing.assert_allclose(ll, want, rtol=1e-4)


class MockLM(harness.LM):
    """Scores continuation 'good' higher than others."""
    max_length = 64

    def tok_encode(self, s):
        return [ord(c) % 50 + 2 for c in s]

    def _loglikelihood_tokens(self, requests):
        out = []
        for ctx, cont in requests:
            score = -1.0 if cont == self.tok_encode(" good") else -5.0
            out.append((score * max(1, len(cont)), False))
        return out


class ToyMC(harness.MultipleChoiceTask):
    name = "toy_mc"

    def docs(self):
        return [{"q": f"question {i}", "gold": 0} for i in range(10)]

    def doc_to_text(self, doc):
        return doc["q"]

    def doc_to_choices(self, doc):
        return [" good", " bad"]

    def gold_index(self, doc):
        return doc["gold"]


def test_harness_driver_mc():
    res = harness.evaluate(MockLM(), [ToyMC()])
    assert res["results"]["toy_mc"]["acc"] == 1.0
    assert "acc_norm" in res["results"]["toy_mc"]
    table = harness.make_table(res)
    assert "toy_mc" in table


def test_perplexity_metrics():
    pairs = [(-10.0, 5), (-20.0, 10)]
    wp = harness.weighted_perplexity(pairs)
    np.testing.assert_allclose(wp, np.exp(30 / 15))
    bpb = harness.bits_per_byte(pairs)
    np.testing.assert_allclose(bpb, 30 / 15 / np.log(2))


def test_block_adapter_nopad_alignment():
    """nopad variant: right-pad only; scored positions shift by L-1
    (block_transformer_nopad.py semantics — first L-1 predictions are
    unavailable and padded with zero logits)."""
    cfg = make_cfg()
    import jax
    from block_transformer_tpu.models import block_transformer as bt
    params = bt.init_block_transformer_params(jax.random.PRNGKey(3), cfg)
    lm = adapters.BlockTransformerLM(params, cfg, CharTokenizer(),
                                     max_length=64, batch_size=4, nopad=True)
    ctx = [5, 6, 7, 8, 9, 10]
    cont = [11, 12]
    (ll, greedy), = lm._loglikelihood_tokens([(ctx, cont)])

    # manual: inputs laid out WITHOUT left pad; forward logits flat index j
    # predicts input position j+L; adapter re-aligns by prepending L-1 zero
    # rows so row t predicts input t+1 like the pad variant
    whole = ctx + cont
    inp = whole[:-1]
    S = len(inp)
    total = S + ((-S) % L or L)
    ids = np.zeros((1, total), np.int64)
    ids[0, :S] = inp
    att = np.zeros_like(ids)
    att[0, :S] = 1
    att[0, S] = 1
    N = total // L
    out = bt.block_transformer_forward(
        params, cfg, jnp.asarray(ids.reshape(1, N, L)),
        jnp.asarray(att.reshape(1, N, L)),
        jnp.asarray(att.reshape(1, N, L).any(-1).astype(np.int64)))
    flat = np.asarray(out.logits).reshape(1, (N - 1) * L, -1)
    lp = flat - np.log(np.exp(flat - flat.max(-1, keepdims=True)
                              ).sum(-1, keepdims=True)) - flat.max(-1, keepdims=True)
    # without left padding, flat row r predicts input position r + L, so the
    # logit for cont[j] (input position len(ctx)+j) sits at row len(ctx)+j-L
    want = sum(lp[0, (len(ctx) + j) - L, t] for j, t in enumerate(cont))
    np.testing.assert_allclose(ll, want, rtol=1e-4)


def test_rolling_windows_cover_all_tokens_once():
    """Rolling requests must partition the document exactly once with
    1-token contexts (upstream context_len=1 window semantics)."""
    captured = []

    class CaptureLM(harness.LM):
        max_length = 8
        def tok_encode(self, s):
            return list(range(2, 2 + len(s)))
        def _loglikelihood_tokens(self, reqs):
            captured.extend(reqs)
            return [(-1.0, False)] * len(reqs)

    lm = CaptureLM()
    text = "x" * 20   # 20 tokens, max_length 8
    (total,) = lm.loglikelihood_rolling([text])
    preds = [cont for _, cont in captured]
    # windows: 8 (first), then 7, 5
    assert [len(p) for p in preds] == [8, 7, 5]
    flat = [t for p in preds for t in p]
    assert flat == list(range(2, 22))
    # contexts: EOT then the single preceding token
    assert captured[0][0] == [0]
    assert captured[1][0] == [captured[0][1][-1]]
    assert total == -3.0


def test_caching_lm(tmp_path):
    from block_transformer_tpu.eval.caching import CachingLM

    class Counting(harness.LM):
        max_length = 32
        calls = 0
        def tok_encode(self, s): return [ord(c) % 50 + 2 for c in s]
        def _loglikelihood_tokens(self, reqs):
            Counting.calls += len(reqs)
            return [(-float(len(c)), False) for _, c in reqs]
        def generate_until(self, reqs):
            Counting.calls += len(reqs)
            return ["out"] * len(reqs)

    lm = CachingLM(Counting(), str(tmp_path / "cache.db"), cache_tag="step1")
    reqs = [("ctx a", " one"), ("ctx b", " two")]
    r1 = lm.loglikelihood(reqs)
    n_after_first = Counting.calls
    r2 = lm.loglikelihood(reqs)
    assert r1 == r2
    assert Counting.calls == n_after_first  # all hits, no recompute
    # a new tag misses (different checkpoint)
    lm2 = CachingLM(Counting(), str(tmp_path / "cache.db"), cache_tag="step2")
    lm2.loglikelihood(reqs)
    assert Counting.calls > n_after_first
    g1 = lm.generate_until([("q", {"until": ["\n"]})])
    g2 = lm.generate_until([("q", {"until": ["\n"]})])
    assert g1 == g2 == ["out"]


def test_filters():
    from block_transformer_tpu.eval import filters as F
    resp = ["The answer is 42.", "no numbers here"]
    got = F.RegexFilter(r"-?\d+").apply(resp)
    assert got == ["42", "[invalid]"]
    assert F.WhitespaceFilter().apply(["  x  "]) == ["x"]
    assert F.TakeFirst().apply(["a", "b"]) == ["a"]
    assert F.MajorityVote().apply(["4", "5", "4"]) == ["4"]
    out = F.apply_filters([F.RegexFilter(r"\d+"), F.MajorityVote()],
                          ["is 7", "was 7", "got 9"])
    assert out == ["7"]


def test_fewshot_sampler():
    from block_transformer_tpu.eval.samplers import (FewshotSampler,
                                                     build_fewshot_context)
    task = ToyMC()
    docs = task.docs()
    sampler = FewshotSampler(docs, seed=0)
    shots = sampler.sample(3, exclude_doc=docs[0])
    assert len(shots) == 3 and docs[0] not in shots
    ctx = build_fewshot_context(task, docs[0], 2, sampler)
    # two exemplars with their gold answers, then the query
    assert ctx.count(" good") == 2
    assert ctx.endswith(task.doc_to_text(docs[0]))


def test_batched_generate_until_matches_serial():
    """Batched (bucketed, left-padded) generate_until == one-by-one greedy."""
    from block_transformer_tpu.inference import generate as gen
    cfg = make_cfg()
    params = bt.init_block_transformer_params(jax.random.PRNGKey(2), cfg)
    lm = adapters.BlockTransformerLM(params, cfg, CharTokenizer(),
                                     max_length=64, batch_size=4)
    lm.tokenizer.decode = lambda ids: "".join(chr(65 + (i % 26)) for i in ids)
    ctxs = ["hello world", "a", "some longer context here!", "mid ctx"]
    reqs = [(c, {"until": [], "max_gen_toks": 8}) for c in ctxs]
    got = lm.generate_until(reqs)

    for c, g in zip(ctxs, got):
        toks = lm.tok_encode(c)
        res = gen.generate(params, cfg, np.asarray(toks, np.int32)[None],
                           max_length=len(toks) + 8)
        new = res[0, len(toks):].tolist()
        if lm.eot_token_id in new:
            new = new[:new.index(lm.eot_token_id)]
        assert g == lm.tokenizer.decode(new), (c, g)
