"""Zero-shot evaluation entry — analogue of the reference's
eval_zero_shot_task.py: load a checkpoint (reference safetensors layout or
our orbax train state), wrap it in the block (pad/nopad) or vanilla LM
adapter, run the task suite, print a table + JSON.

Examples:
  python scripts/eval_zero_shot_task.py --model block_main_b4_5 \
      --ckpt results/block_main_b4_5/final --tasks lambada_openai,hellaswag
  python scripts/eval_zero_shot_task.py --model block_main_b4_5 --random \
      --tasks hellaswag --limit 50      # smoke with random weights
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _maybe_force_cpu():
    import os, sys
    if os.environ.get("BT_CPU") == "1" or "--cpu" in sys.argv:
        if "--cpu" in sys.argv:
            sys.argv.remove("--cpu")
        import jax
        jax.config.update("jax_platforms", "cpu")


_maybe_force_cpu()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="block_main_b4_5")
    ap.add_argument("--ckpt", default=None)
    ap.add_argument("--random", action="store_true",
                    help="random init (smoke runs)")
    ap.add_argument("--tasks", default="lambada_openai,wikitext,hellaswag,"
                    "arc_easy,sciq")
    ap.add_argument("--limit", type=int, default=None)
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument("--max_length", type=int, default=2048)
    ap.add_argument("--nopad", action="store_true",
                    help="use the no-left-pad adapter (old checkpoints)")
    ap.add_argument("--quantize", choices=["int8", "int4"], default=None)
    ap.add_argument("--tokenizer", default="pythia")
    ap.add_argument("--out", default=None, help="JSON output path")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from block_transformer_tpu.config import get_config
    from block_transformer_tpu.models import block_transformer as bt
    from block_transformer_tpu.eval import adapters, harness, tasks as task_mod

    cfg = get_config(args.model)
    if args.random:
        params = jax.jit(lambda k: bt.init_block_transformer_params(
            k, cfg, dtype=jnp.float32))(jax.random.PRNGKey(0))
    elif args.ckpt:
        from block_transformer_tpu.utils import torch_import
        params = torch_import.load_checkpoint(args.ckpt, cfg,
                                              dtype=jnp.float32)
    else:
        ap.error("--ckpt or --random required")

    if args.quantize:
        from block_transformer_tpu.ops import quant
        params = quant.quantize_block_transformer(
            params, bits=8 if args.quantize == "int8" else 4)

    from block_transformer_tpu.data.tokenizer import load_tokenizer
    tokenizer = load_tokenizer(args.tokenizer)

    lm = adapters.BlockTransformerLM(params, cfg, tokenizer,
                                     max_length=args.max_length,
                                     batch_size=args.batch_size,
                                     nopad=args.nopad)
    tasks = task_mod.get_tasks(args.tasks.split(","))
    results = harness.evaluate(lm, tasks, limit=args.limit, verbose=True)
    print(harness.make_table(results))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
