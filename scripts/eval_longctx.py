"""Long-context evaluation entry: PG19-style positionwise perplexity and
needle-in-a-haystack (reference §2.6: util/perplexity.py, needle/needle.py).

Examples:
  python scripts/eval_longctx.py ppl --model block_main_b4_5 --random \
      --context 2048 --synthetic-docs 4
  python scripts/eval_longctx.py needle --model block_main_b4_5 --random \
      --context 1024 --haystack path/to/essays.txt
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _maybe_force_cpu():
    import os, sys
    if os.environ.get("BT_CPU") == "1" or "--cpu" in sys.argv:
        if "--cpu" in sys.argv:
            sys.argv.remove("--cpu")
        import jax
        jax.config.update("jax_platforms", "cpu")


_maybe_force_cpu()


def load_params(args, cfg):
    import jax
    import jax.numpy as jnp
    from block_transformer_tpu.models import block_transformer as bt
    if args.random:
        return jax.jit(lambda k: bt.init_block_transformer_params(
            k, cfg, dtype=jnp.bfloat16))(jax.random.PRNGKey(0))
    from block_transformer_tpu.utils import torch_import
    return torch_import.load_checkpoint(args.ckpt, cfg, dtype=jnp.bfloat16)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=["ppl", "needle"])
    ap.add_argument("--model", default="block_main_b4_5")
    ap.add_argument("--ckpt", default=None)
    ap.add_argument("--random", action="store_true")
    ap.add_argument("--context", type=int, default=2048)
    ap.add_argument("--batch_size", type=int, default=4)
    ap.add_argument("--synthetic-docs", type=int, default=0,
                    help="use N synthetic token docs (smoke)")
    ap.add_argument("--docs", default=None, help="jsonl with {'text': ...}")
    ap.add_argument("--haystack", default=None, help="text file for needle")
    ap.add_argument("--depths", default="0,25,50,75,100")
    ap.add_argument("--tokenizer", default="pythia")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax.numpy as jnp
    from block_transformer_tpu.config import get_config
    from block_transformer_tpu.eval import longctx
    from block_transformer_tpu.models import block_transformer as bt

    cfg = get_config(args.model)
    params = load_params(args, cfg)
    L = cfg.block_length

    if args.mode == "ppl":
        if args.synthetic_docs:
            rng = np.random.default_rng(0)
            docs = [rng.integers(1, cfg.vocab_size - 50,
                                 size=args.context * 2 + 17)
                    for _ in range(args.synthetic_docs)]
        else:
            from block_transformer_tpu.data.tokenizer import load_tokenizer
            tok = load_tokenizer(args.tokenizer)
            with open(args.docs) as f:
                docs = [np.asarray(tok.encode(json.loads(l)["text"]))
                        for l in f]

        import jax

        @jax.jit
        def block_fn(batch):
            B, C = batch.shape
            ids = batch.reshape(B, C // L, L)
            att = jnp.ones_like(ids)
            bam = jnp.ones(ids.shape[:2], jnp.int32)
            return bt.block_transformer_forward(params, cfg, ids, att,
                                                bam).logits

        loss, n = longctx.loss_by_position_over_chunks(
            block_fn, docs, args.context, batch_size=args.batch_size,
            block_length=L)
        result = {"context_length": args.context, "n_chunks": int(n),
                  "mean_loss": float(loss.mean()),
                  "loss_by_position": loss.tolist()}
        print(json.dumps({k: v for k, v in result.items()
                          if k != "loss_by_position"}))
    else:
        from block_transformer_tpu.data.tokenizer import load_tokenizer
        from block_transformer_tpu.inference import generate as gen
        tok = load_tokenizer(args.tokenizer)
        hay = open(args.haystack).read() if args.haystack else ("word " * 4000)
        depths = [float(d) for d in args.depths.split(",")]
        samples = longctx.generate_needle_suite(hay, tok, args.context,
                                                depths=depths)
        gens = []
        for s in samples:
            ids = np.asarray(tok.encode(s["prompt"]))[None]
            out = gen.generate(params, cfg, ids,
                               max_length=ids.shape[1] + 16)
            gens.append(tok.decode(out[0, ids.shape[1]:].tolist()))
        result = {"scores_by_depth": longctx.score_needle_results(samples, gens)}
        print(json.dumps(result))

    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f, indent=2)


if __name__ == "__main__":
    main()
