"""Stage-level race: token-decoder decode step, int8 vs mixed48 weights.

The full mixed48 generate graph is a very long remote compile; this probes
the hypothesis cheaply using bench._two_level_decomposition — the token
stage at decode is weight-streaming-bound (~604MB int8 per token step), so
int4 token-decoder weights should cut its per-block-step time toward half.

Usage: python scripts/mixed48_stage_probe.py [--batch 128]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import bench as B


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--kv", default="int4")
    args = ap.parse_args()

    B._enable_compile_cache()
    import jax
    import jax.numpy as jnp
    from block_transformer_tpu.config import get_config
    from block_transformer_tpu.models import block_transformer as bt
    from block_transformer_tpu.ops import quant

    cfg = get_config("block_main_b4_1.2b")
    dtype = jnp.bfloat16
    base = jax.jit(lambda k: bt.init_block_transformer_params(
        k, cfg, dtype=dtype))(jax.random.PRNGKey(0))

    for name, kwargs in [
            ("int8", {"bits": 8}),
            ("mixed48", {"bits": 8, "token_decoder_bits": 4,
                         "lm_head_bits": 8, "group_size": 128})]:
        params = jax.jit(lambda p: quant.quantize_block_transformer(
            p, **kwargs))(base)
        d = B._two_level_decomposition(params, cfg, args.batch, 2048, 128,
                                       dtype, args.kv)
        print(f"{name:8s} token {d['token_decoder_ms_per_block_step']:.2f} "
              f"ms/block-step   block {d['block_decoder_ms_per_block_step']:.2f}"
              f" ms/block-step", flush=True)
        del params


if __name__ == "__main__":
    main()
