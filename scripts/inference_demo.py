"""Batch-decoding speed demo — analogue of the reference's
inference_demo.py (reference §2.5): load the latest checkpoint (or random
init), decode a batch with streaming of the first sample, report device
memory and tokens/sec (inference_demo.py:148-162 metrics).

Usage:
  python scripts/inference_demo.py --model block_main_b4_5 --batch 32 \
      --max_length 256 [--ckpt results/block_main_b4_5]
"""

import argparse
import os
import sys
import time

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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="block_main_b4_5")
    ap.add_argument("--ckpt", default=None,
                    help="reference-format checkpoint dir (safetensors)")
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--prompt_len", type=int, default=8)
    ap.add_argument("--max_length", type=int, default=256)
    ap.add_argument("--temperature", type=float, default=0.0,
                    help="0 = greedy")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from block_transformer_tpu.config import get_config
    from block_transformer_tpu.models import block_transformer as bt
    from block_transformer_tpu.inference import generate as gen

    cfg = get_config(args.model)
    if args.ckpt:
        from block_transformer_tpu.utils import torch_import
        params = torch_import.load_checkpoint(args.ckpt, cfg, dtype=jnp.bfloat16)
        print(f"loaded checkpoint from {args.ckpt}")
    else:
        params = jax.jit(lambda k: bt.init_block_transformer_params(
            k, cfg, dtype=jnp.bfloat16))(jax.random.PRNGKey(0))
        print("using randomly initialized weights")
    print(f"parameters: {bt.count_params(params)/1e6:.1f}M")

    rng = np.random.default_rng(0)
    L = cfg.block_length
    prompt_len = max(L, (args.prompt_len // L) * L)
    prompts = rng.integers(1, cfg.vocab_size - 50, size=(args.batch, prompt_len))
    N = prompt_len // L
    ids = jnp.asarray(prompts.reshape(args.batch, N, L), jnp.int32)
    att = jnp.ones_like(ids)
    bam = jnp.ones((args.batch, N), jnp.int32)
    max_blocks = args.max_length // L

    greedy = args.temperature <= 0.0
    # compile
    res = gen.generate_blocks(params, cfg, ids, att, bam,
                              max_blocks=max_blocks, greedy=greedy,
                              temperature=max(args.temperature, 1e-6))
    jax.block_until_ready(res.tokens)
    t0 = time.perf_counter()
    res = gen.generate_blocks(params, cfg, ids, att, bam,
                              max_blocks=max_blocks, greedy=greedy,
                              temperature=max(args.temperature, 1e-6),
                              key=jax.random.PRNGKey(1))
    jax.block_until_ready(res.tokens)
    dt = time.perf_counter() - t0

    n_blocks = int(res.n_blocks)
    toks = np.asarray(res.tokens)[:, :n_blocks].reshape(args.batch, -1)
    new_tokens = (n_blocks * L - prompt_len) * args.batch
    stats = jax.local_devices()[0].memory_stats() or {}
    print(f"first sample tokens: {toks[0].tolist()[:64]} ...")
    print(f"max memory in use:   {stats.get('peak_bytes_in_use', 0)/2**30:.2f} GiB")
    print(f"generation time:     {dt:.3f} s")
    print(f"tokens/sec/sample:   {new_tokens / args.batch / dt:.1f}")
    print(f"tokens/sec:          {new_tokens / dt:.1f}")


if __name__ == "__main__":
    main()
