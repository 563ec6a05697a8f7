"""Export a trained checkpoint to the reference's per-component HF layout
(analogue of pretrain_block_transformer.py:145-155 final save).

  python scripts/export_checkpoint.py --model block_main_b4_5 \
      --run_dir results/quality/block_main_b4_5 --out exports/b4_5_hf
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _maybe_force_cpu():
    if os.environ.get("BT_CPU") == "1" or "--cpu" in sys.argv:
        if "--cpu" in sys.argv:
            sys.argv.remove("--cpu")
        import jax
        jax.config.update("jax_platforms", "cpu")


_maybe_force_cpu()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="block_main_b4_5")
    ap.add_argument("--run_dir", required=True,
                    help="trainer output dir containing checkpoint-<step>")
    ap.add_argument("--step", type=int, default=None,
                    help="checkpoint step (default: latest)")
    ap.add_argument("--out", required=True)
    ap.add_argument("--vocab_size", type=int, default=None)
    args = ap.parse_args()

    from block_transformer_tpu.config import get_config
    from block_transformer_tpu.utils import checkpoint as ckpt
    from block_transformer_tpu.utils import torch_export

    overrides = {"vocab_size": args.vocab_size} if args.vocab_size else {}
    cfg = get_config(args.model, **overrides)
    step = args.step or ckpt.find_latest_checkpoint(args.run_dir)
    assert step, f"no checkpoints under {args.run_dir}"
    params = ckpt.restore_params(args.run_dir, step)
    out = torch_export.export_block_transformer(params, cfg, args.out)
    print(f"exported checkpoint-{step} -> {out} (embedder/ block_decoder/ "
          f"token_decoder/ HF layout)")


if __name__ == "__main__":
    main()
