"""Run the REAL task classes on real-text fixtures (VERDICT r2 #7).

Runs eval/tasks.py's actual LambadaOpenAI / Wikitext / TriviaQA / GSM8K
classes (the restored lm_eval v0.4.0 semantics — NOT the byte-level
analogues of eval/byte_tasks.py) over the committed real-text fixtures in
assets/real_tasks/ (built by scripts/build_real_task_fixtures.py from the
reference's bundled Paul Graham essays), through the full adapter path
(BlockTransformerLM pad adapter -> harness), at fp32 / INT8 / INT4
weights. The generate_until tasks exercise the real extraction regexes
(alias exact-match, gsm8k number extraction) on ACTUAL model generations.

The model is byte-level (this environment has no reference checkpoints or
real tokenizer corpora) trained on the pgbytes corpus — the same essays
minus every 10th (eval-only holdout). Per-doc ``seen`` flags let the
report separate memorized-text accuracy from held-out accuracy; the
quantization DELTAS are the gate either way (BASELINE.json <=0.5%).

Usage:
  python scripts/real_task_eval.py --model_dir results/pg5m \
      --out results/real_tasks [--cpu]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _maybe_force_cpu():
    if os.environ.get("BT_CPU") == "1" or "--cpu" in sys.argv:
        if "--cpu" in sys.argv:
            sys.argv.remove("--cpu")
        import jax
        jax.config.update("jax_platforms", "cpu")


_maybe_force_cpu()


def _enable_compile_cache():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


_enable_compile_cache()

VOCAB = 512
OFFSET = 3


class ByteTokenizer:
    eos_token_id = 0

    def encode(self, s: str):
        return [min(ord(c), 255) + OFFSET for c in s]

    def decode(self, toks):
        return "".join(chr(int(t) - OFFSET) for t in toks
                       if t >= OFFSET and t < 256 + OFFSET)


def load_fixture(path):
    with open(path) as f:
        return [json.loads(l) for l in f]


def split_seen(per_doc, docs, key):
    """Mean of ``key`` over seen / holdout doc subsets."""
    seen = [r[key] for r, d in zip(per_doc, docs) if d.get("seen", True)]
    held = [r[key] for r, d in zip(per_doc, docs) if not d.get("seen", True)]
    out = {}
    if seen:
        out["seen"] = float(np.mean(seen))
    if held:
        out["holdout"] = float(np.mean(held))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model_dir", default="results/pg5m")
    ap.add_argument("--fixtures", default="assets/real_tasks")
    ap.add_argument("--out", default="results/real_tasks")
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--max_length", type=int, default=1024)
    ap.add_argument("--lr", type=float, default=6e-4)
    ap.add_argument("--steps", type=int, default=3000,
                    help="optimizer horizon used when the checkpoint was "
                    "written (needed to rebuild the TrainState template)")
    ap.add_argument("--int4_group", type=int, default=32)
    ap.add_argument("--limit", type=int, default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from block_transformer_tpu.config import get_config
    from block_transformer_tpu.eval import adapters, harness, tasks
    from block_transformer_tpu.models.block_transformer import (
        init_block_transformer_params)
    from block_transformer_tpu.ops import quant
    from block_transformer_tpu.train import optimizer as opt_mod
    from block_transformer_tpu.train import train_step as ts
    from block_transformer_tpu.utils import checkpoint as ckpt

    cfg = get_config("block_main_b4_5", vocab_size=VOCAB,
                     max_length=args.max_length)

    step = ckpt.find_latest_checkpoint(args.model_dir)
    assert step, f"no checkpoint in {args.model_dir}"
    tmpl = jax.eval_shape(
        lambda: init_block_transformer_params(jax.random.PRNGKey(0), cfg))
    tx, _ = opt_mod.make_optimizer(
        peak_lr=args.lr, warmup_steps=max(100, args.steps // 20),
        total_steps=args.steps, weight_decay=0.1, b1=0.9, b2=0.95)
    state_tmpl = ts.TrainState(params=tmpl,
                               opt_state=jax.eval_shape(tx.init, tmpl),
                               step=jax.ShapeDtypeStruct((), jnp.int32))
    params = jax.tree.map(
        jnp.asarray,
        ckpt.restore_checkpoint(args.model_dir, step, state_tmpl).params)
    print(f"[real_tasks] loaded {args.model_dir}@{step}")

    fx = {n: load_fixture(os.path.join(args.fixtures, f))
          for n, f in (("lambada", "lambada_pg.jsonl"),
                       ("wikitext", "wikitext_pg.jsonl"),
                       ("trivia", "trivia_real.jsonl"),
                       ("gsm8k", "gsm8k_style.jsonl"))}
    if args.limit:
        fx = {k: v[:args.limit] for k, v in fx.items()}

    suite = [tasks.LambadaOpenAI(docs=fx["lambada"]),
             tasks.Wikitext(docs=fx["wikitext"]),
             tasks.TriviaQA(docs=fx["trivia"]),
             tasks.GSM8K(docs=fx["gsm8k"])]

    variants = {
        "fp32": params,
        "int8": quant.quantize_block_transformer(params, bits=8),
        "int4_g32": quant.quantize_block_transformer(
            params, bits=4, group_size=args.int4_group,
            lm_head_bits=8),
    }

    os.makedirs(args.out, exist_ok=True)
    report = {}
    for vname, p in variants.items():
        lm = adapters.BlockTransformerLM(p, cfg, ByteTokenizer(),
                                         max_length=args.max_length,
                                         batch_size=args.batch)
        t0 = time.time()
        res = harness.evaluate(lm, suite, verbose=True, return_per_doc=True)
        r = res["results"]
        # seen/holdout split for the text tasks
        per_doc = res.get("per_doc", {})
        if "lambada_openai" in per_doc:
            r["lambada_openai"]["acc_split"] = split_seen(
                per_doc["lambada_openai"], fx["lambada"], "acc")
        report[vname] = r
        print(f"[real_tasks] {vname} done in {time.time()-t0:.0f}s: "
              f"{json.dumps(r, default=float)[:400]}")

    # deltas vs fp32 (the BASELINE gate is on ppl/acc deltas)
    gates = {}
    f = report["fp32"]
    for vname in ("int8", "int4_g32"):
        q = report[vname]
        gates[vname] = {
            "lambada_acc_delta": q["lambada_openai"]["acc"]
            - f["lambada_openai"]["acc"],
            "lambada_ppl_delta_pct": 100.0 * (
                q["lambada_openai"]["perplexity"]
                / max(f["lambada_openai"]["perplexity"], 1e-9) - 1.0),
            "wikitext_word_ppl_delta_pct": 100.0 * (
                q["wikitext"]["word_perplexity"]
                / max(f["wikitext"]["word_perplexity"], 1e-9) - 1.0),
        }
    report["gates_vs_fp32"] = gates

    out_path = os.path.join(args.out, "real_tasks.json")
    with open(out_path, "w") as fjson:
        json.dump(report, fjson, indent=1, default=float)
    print(f"[real_tasks] wrote {out_path}")
    print(json.dumps(gates, indent=1, default=float))


if __name__ == "__main__":
    main()
