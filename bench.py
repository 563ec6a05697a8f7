"""Benchmark driver: decode throughput of the Block Transformer on TPU.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Regime (BASELINE.md / measure_generation_time.py defaults): prefill 128 /
decode 128 greedy, batch as configured, block_main family model, bf16.
``vs_baseline`` is the decode-throughput ratio vs the vanilla GPTNeoX
baseline at matched parameter count measured in the same process — the
reference's headline claim is this ratio (10-20x at scale; README.md:18).
"""

import argparse
import json
import os
import time

import numpy as np


def _enable_compile_cache():
    import jax
    cache_dir = os.environ.get("JAX_CACHE_DIR", "/root/repo/.jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def bench_block(model_name: str, batch, prefill: int, decode: int,
                dtype_str: str = "bfloat16", quantize: str = None,
                kv_cache: str = "bf16"):
    import jax
    import jax.numpy as jnp
    from block_transformer_tpu.config import get_config
    from block_transformer_tpu.models import block_transformer as bt
    from block_transformer_tpu.inference import generate as gen
    from block_transformer_tpu.utils import hbm

    dtype = jnp.bfloat16 if dtype_str == "bfloat16" else jnp.float32
    cfg = get_config(model_name)
    if quantize and quantize != "none":
        from block_transformer_tpu.ops import quant
    if batch == "auto":
        batch = hbm.auto_batch(
            lambda b: hbm.block_model_bytes(cfg, b, prefill, decode,
                                            kv_cache=kv_cache))
        print(f"[bench] block auto batch -> {batch}", flush=True)
    batch = int(batch)
    params = jax.jit(lambda k: bt.init_block_transformer_params(
        k, cfg, dtype=dtype))(jax.random.PRNGKey(0))
    if quantize and quantize != "none":
        params = jax.jit(lambda p: quant.quantize_block_transformer(
            p, bits=8 if quantize == "int8" else 4))(params)
    L = cfg.block_length
    N = prefill // L
    max_blocks = (prefill + decode) // L
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(1, 50254, size=(batch, N, L)), jnp.int32)
    att = jnp.ones((batch, N, L), jnp.int32)
    bam = jnp.ones((batch, N), jnp.int32)

    def run():
        res = gen.generate_blocks(params, cfg, ids, att, bam,
                                  max_blocks=max_blocks, greedy=True,
                                  kv_cache=kv_cache)
        jax.block_until_ready(res.tokens)
        return res

    run()  # warmup + compile
    n_rep = 3
    t0 = time.perf_counter()
    for _ in range(n_rep):
        run()
    dt = (time.perf_counter() - t0) / n_rep
    decode_tokens = batch * decode
    return decode_tokens / dt, batch


def bench_vanilla(name: str, batch, prefill: int, decode: int,
                  dtype_str: str = "bfloat16"):
    import jax
    import jax.numpy as jnp
    from block_transformer_tpu.config import get_vanilla_config
    from block_transformer_tpu.models import vanilla, neox
    from block_transformer_tpu.utils import hbm
    import functools

    dtype = jnp.bfloat16 if dtype_str == "bfloat16" else jnp.float32
    cfg = get_vanilla_config(name)
    if batch == "auto":
        # vanilla decode holds ~2 cache copies through the loop (measured
        # 16.08G at b32/p2048 where the static estimate says 7.9G)
        batch = hbm.auto_batch(
            lambda b: hbm.vanilla_model_bytes(cfg, b, prefill, decode),
            margin=0.4)
        print(f"[bench] vanilla auto batch -> {batch}", flush=True)
    batch = int(batch)
    params = jax.jit(lambda k: vanilla.init_vanilla_params(
        k, cfg, dtype=dtype))(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(1, 50254, size=(batch, prefill)), jnp.int32)

    @jax.jit
    def full_generate(params, ids):
        # cache created INSIDE the jit: one executable, XLA owns liveness
        cache = neox.KVCache.create(cfg, batch, prefill + decode, dtype=dtype)
        logits, cache = vanilla.vanilla_prefill(params, cfg, ids, cache)
        tok = jnp.argmax(logits, -1).astype(jnp.int32)

        def body(i, carry):
            tok, cache = carry
            logits, cache = vanilla.vanilla_decode_step(params, cfg, tok, cache)
            return jnp.argmax(logits, -1).astype(jnp.int32), cache

        tok, cache = jax.lax.fori_loop(0, decode, body, (tok, cache))
        return tok

    def run():
        jax.block_until_ready(full_generate(params, ids))

    run()
    n_rep = 3
    t0 = time.perf_counter()
    for _ in range(n_rep):
        run()
    dt = (time.perf_counter() - t0) / n_rep
    return batch * decode / dt, batch


def main():
    ap = argparse.ArgumentParser()
    # defaults = the BASELINE.json north-star regime: 1.2B, prefill 2048 /
    # decode 128, each model at its max feasible batch (static HBM search)
    ap.add_argument("--model", default="block_main_b4_1.2b")
    ap.add_argument("--vanilla", default="vanilla_410")
    ap.add_argument("--batch", default="auto",
                    help="int or 'auto' (per-model static-HBM batch search)")
    ap.add_argument("--prefill", type=int, default=2048)
    ap.add_argument("--decode", type=int, default=128)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--quantize", choices=["int8", "int4", "none"],
                    default="int8",
                    help="weight quantization (BASELINE.json operating "
                    "point: int8 weights + int8 KV)")
    ap.add_argument("--kv", choices=["bf16", "int8"], default="int8",
                    help="global block-level KV cache dtype")
    args = ap.parse_args()

    _enable_compile_cache()
    block_tps, block_batch = bench_block(args.model, args.batch, args.prefill,
                                         args.decode, args.dtype,
                                         args.quantize, args.kv)
    print(f"[bench] block: {block_tps:.1f} tok/s at b{block_batch}",
          file=__import__("sys").stderr, flush=True)
    import gc
    gc.collect()
    vanilla_tps, vanilla_batch = bench_vanilla(args.vanilla, args.batch,
                                               args.prefill, args.decode,
                                               args.dtype)
    ratio = block_tps / vanilla_tps if vanilla_tps > 0 else 0.0
    print(json.dumps({
        "metric": f"decode_tokens_per_sec[{args.model}"
                  f"{'-' + args.quantize if args.quantize and args.quantize != 'none' else ''}"
                  f"{'-kv8' if args.kv == 'int8' else ''} b{block_batch} "
                  f"p{args.prefill}/d{args.decode} vs {args.vanilla} "
                  f"b{vanilla_batch}]",
        "value": round(block_tps, 1),
        "unit": "tok/s",
        "vs_baseline": round(ratio, 3),
    }))


if __name__ == "__main__":
    main()
