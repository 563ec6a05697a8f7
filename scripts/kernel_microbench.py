"""Per-kernel roofline microbenchmark: Pallas vs XLA at the decode shapes.

The instrument VERDICT round-1 asked for: every fused kernel measured in
isolation against its XLA equivalent on the exact shapes of the 1.2B
decode operating point, with effective GB/s (the decode path is
bandwidth-bound: weight/cache bytes dominate). Each measurement loops the
op inside ONE jit with a data dependence between iterations so dispatch
overhead and LICM can't distort it (see memory: microbench rules for this
platform), then divides by the iteration count.

Writes MICROBENCH.json and prints a table. Run on the real TPU:

  python scripts/kernel_microbench.py            # full suite
  python scripts/kernel_microbench.py --iters 16 --quick
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _cache():
    import jax
    d = os.environ.get("JAX_CACHE_DIR", "/root/repo/.jax_cache")
    os.makedirs(d, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", d)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def timed_loop(fn, carry, iters):
    """Median-of-3 of (time for `iters` chained applications of fn) / iters."""
    import jax

    jax.block_until_ready(fn(carry))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(carry))
        best = min(best, time.perf_counter() - t0)
    return best / iters


def bench_int8_matmul(results, L, M, K, N, iters, dtype):
    import jax
    import jax.numpy as jnp
    from block_transformer_tpu.ops import dequant_matmul as dm

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((M, K)), dtype)
    w = jnp.asarray(rng.integers(-127, 127, (L, K, N)).astype(np.int8))
    s = jnp.asarray(rng.uniform(0.01, 0.02, (L, N)).astype(np.float32))

    def chain(call):
        @jax.jit
        def run(x, w, s):
            def body(i, x):
                out = call(x, w, s, i % L)
                return x * (1.0 + 1e-12 * jnp.sum(out).astype(x.dtype))
            return jax.lax.fori_loop(0, iters, body, x)
        return lambda x, _r=run: _r(x, w, s)

    variants = {
        "pallas_stacked": chain(
            lambda x, w, s, i: dm.int8_matmul_stacked(x, w, s, i)),
        "xla_dynidx_convert_dot": chain(
            lambda x, w, s, i: (jnp.dot(
                x, jax.lax.dynamic_index_in_dim(w, i, 0, False).astype(x.dtype),
                preferred_element_type=jnp.float32)
                * jax.lax.dynamic_index_in_dim(s, i, 0, False)).astype(x.dtype)),
    }
    bytes_per = M * K * x.dtype.itemsize + K * N + N * 4 + M * N * x.dtype.itemsize
    for name, run in variants.items():
        t = timed_loop(run, x, iters)
        results.append({"op": f"int8_matmul M{M} K{K} N{N}", "variant": name,
                        "us": 1e6 * t, "GB/s": bytes_per / t / 1e9,
                        "TFLOP/s": 2 * M * K * N / t / 1e12})


def bench_int4_matmul(results, L, M, K, N, iters, dtype):
    import jax
    import jax.numpy as jnp
    from block_transformer_tpu.ops import dequant_matmul as dm
    from block_transformer_tpu.ops import quant

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((M, K)), dtype)
    w = jnp.asarray(rng.integers(-120, 120, (L, K // 2, N)).astype(np.int8))
    s = jnp.asarray(rng.uniform(0.01, 0.02, (L, N)).astype(np.float32))

    def chain(call):
        @jax.jit
        def run(x, w, s):
            def body(i, x):
                out = call(x, w, s, i % L)
                return x * (1.0 + 1e-12 * jnp.sum(out).astype(x.dtype))
            return jax.lax.fori_loop(0, iters, body, x)
        return lambda x, _r=run: _r(x, w, s)

    def xla_dequant(x, w, s, i):
        wi = jax.lax.dynamic_index_in_dim(w, i, 0, False)
        si = jax.lax.dynamic_index_in_dim(s, i, 0, False)
        wd = quant.dequantize_int4(wi, si, x.dtype)
        return jnp.dot(x, wd, preferred_element_type=x.dtype)

    variants = {
        "pallas_stacked": chain(
            lambda x, w, s, i: dm.int4_matmul_stacked(x, w, s, i)),
        "xla_dequant_dot": chain(xla_dequant),
    }
    bytes_per = M * K * x.dtype.itemsize + K * N // 2 + N * 4 \
        + M * N * x.dtype.itemsize
    for name, run in variants.items():
        t = timed_loop(run, x, iters)
        results.append({"op": f"int4_matmul M{M} K{K} N{N}", "variant": name,
                        "us": 1e6 * t, "GB/s": bytes_per / t / 1e9,
                        "TFLOP/s": 2 * M * K * N / t / 1e12})


def bench_decode_attention(results, L, B, H, cap, D, S, iters, dtype):
    import jax
    import jax.numpy as jnp
    from block_transformer_tpu.ops import decode_attention as da
    from block_transformer_tpu.ops import masks

    rng = np.random.default_rng(2)
    q0 = jnp.asarray(rng.standard_normal((B, H, S, D)), dtype)
    kq = jnp.asarray(rng.integers(-127, 127, (L, B, H, cap, D)).astype(np.int8))
    vq = jnp.asarray(rng.integers(-127, 127, (L, B, H, cap, D)).astype(np.int8))
    ks = jnp.asarray(rng.uniform(0.005, 0.02, (L, B, H, cap)).astype(np.float32))
    vs = jnp.asarray(rng.uniform(0.005, 0.02, (L, B, H, cap)).astype(np.float32))
    valid_len = cap - 64
    kv_valid = jnp.asarray((np.arange(cap)[None] < valid_len
                            ).astype(np.int32).repeat(B, 0))
    mask = masks.decode_mask(jnp.int32(valid_len - S), cap, S, kv_valid)

    def chain(call):
        # cache arrays are explicit args: closure constants this size get
        # inlined into the compile payload and break the remote compiler
        @jax.jit
        def run(q, kq, ks, vq, vs):
            def body(i, q):
                out = call(q, kq, ks, vq, vs, i % L)
                return q * (1.0 + 1e-12 * jnp.sum(out).astype(q.dtype))
            return jax.lax.fori_loop(0, iters, body, q)
        return run

    def xla_dequant_attn(q, kq, ks, vq, vs, i):
        k = (jax.lax.dynamic_index_in_dim(kq, i, 0, False).astype(jnp.float32)
             * jax.lax.dynamic_index_in_dim(ks, i, 0, False)[..., None]
             ).astype(q.dtype)
        v = (jax.lax.dynamic_index_in_dim(vq, i, 0, False).astype(jnp.float32)
             * jax.lax.dynamic_index_in_dim(vs, i, 0, False)[..., None]
             ).astype(q.dtype)
        s_ = jnp.einsum("bhsd,bhkd->bhsk", q, k,
                        preferred_element_type=jnp.float32) / (D ** 0.5)
        s_ = s_ + mask.bias()
        p = jax.nn.softmax(s_, axis=-1).astype(q.dtype)
        return jnp.einsum("bhsk,bhkd->bhsd", p, v,
                          preferred_element_type=jnp.float32).astype(q.dtype)

    variants = {
        "pallas_fused_stacked": chain(
            lambda q, kq, ks, vq, vs, i: da.decode_attention_int8_stacked(
                q, kq, ks, vq, vs, i, mask)),
        "xla_dequant_attn": chain(xla_dequant_attn),
    }
    bytes_per = B * H * cap * (2 * D + 8)    # int8 K+V once + scales
    for name, run in variants.items():
        t = timed_loop(lambda c, _r=run: _r(c, kq, ks, vq, vs), q0, iters)
        results.append({"op": f"decode_attn_int8 B{B} H{H} cap{cap} S{S}",
                        "variant": name, "us": 1e6 * t,
                        "GB/s": bytes_per / t / 1e9})


def bench_flash_prefill(results, B, H, Q, D, iters, dtype):
    import jax
    import jax.numpy as jnp
    from block_transformer_tpu.ops import flash_attention as fa
    from block_transformer_tpu.ops import masks

    rng = np.random.default_rng(3)
    q0 = jnp.asarray(rng.standard_normal((B, H, Q, D)), dtype)
    k = jnp.asarray(rng.standard_normal((B, H, Q, D)), dtype)
    v = jnp.asarray(rng.standard_normal((B, H, Q, D)), dtype)
    pos = jnp.arange(Q, dtype=jnp.int32)
    mask = masks.causal_mask(pos, pos)

    def chain(call):
        @jax.jit
        def run(q, k, v):
            def body(i, q):
                out = call(q, k, v)
                return q * (1.0 + 1e-12 * jnp.sum(out).astype(q.dtype))
            return jax.lax.fori_loop(0, iters, body, q)
        return lambda q, _r=run: _r(q, k, v)

    def xla_attn(q, k, v):
        s_ = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32) / (D ** 0.5)
        s_ = s_ + mask.bias()
        p = jax.nn.softmax(s_, axis=-1).astype(q.dtype)
        return jnp.einsum("bhqk,bhkd->bhqd", p, v,
                          preferred_element_type=jnp.float32).astype(q.dtype)

    variants = {
        "pallas_flash": chain(
            lambda q, k, v: fa.flash_attention(q, k, v, mask)),
        "xla_bias_attn": chain(xla_attn),
    }
    flops = 4 * B * H * Q * Q * D
    for name, run in variants.items():
        t = timed_loop(run, q0, iters)
        results.append({"op": f"flash_prefill B{B} H{H} Q{Q}", "variant": name,
                        "us": 1e6 * t, "TFLOP/s": flops / t / 1e12})


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=32)
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--attn_only", action="store_true")
    ap.add_argument("--out", default="MICROBENCH.json")
    ap.add_argument("--cpu_interpret", action="store_true",
                    help="smoke the harness on CPU (tiny shapes, interpret)")
    args = ap.parse_args()

    if args.cpu_interpret:
        import jax
        jax.config.update("jax_platforms", "cpu")

    _cache()
    import jax
    import jax.numpy as jnp
    dtype = jnp.float32 if args.cpu_interpret else jnp.bfloat16
    print(f"[microbench] devices: {jax.devices()}", flush=True)

    results = []
    it = args.iters
    if args.cpu_interpret:
        from jax.experimental.pallas import tpu as pltpu
        with pltpu.force_tpu_interpret_mode():
            bench_int8_matmul(results, 2, 8, 256, 128, 2, dtype)
            bench_int4_matmul(results, 2, 8, 256, 128, 2, dtype)
    else:
        # 1.2B decode shapes: batch 256 rows through QKV/out/up/down + head
        shapes = [(12, 256, 2048, 6144), (12, 256, 2048, 2048),
                  (12, 256, 2048, 8192), (12, 256, 8192, 2048)]
        if not args.quick:
            shapes.append((1, 256, 2048, 50304))    # LM head
        def flush():
            with open(args.out, "w") as f:
                json.dump({"results": results,
                           "platform": str(jax.devices()[0])}, f, indent=2)

        for (L, M, K, N) in ([] if args.attn_only else shapes):
            bench_int8_matmul(results, L, M, K, N, it, dtype)
            bench_int4_matmul(results, L, M, K, N, it, dtype)
            print(f"[microbench] matmuls K{K} N{N} done", flush=True)
            flush()
        bench_decode_attention(results, 12, 256, 16, 640, 128, 1, it, dtype)
        flush()
        if not args.quick and not args.attn_only:
            bench_decode_attention(results, 12, 64, 16, 640, 128, 1, it, dtype)
            flush()
            bench_flash_prefill(results, 8, 16, 2048, 128, max(4, it // 8),
                                dtype)
        print("[microbench] attention done", flush=True)

    with open(args.out, "w") as f:
        json.dump({"results": results,
                   "platform": str(jax.devices()[0])}, f, indent=2)
    width = max(len(r["op"]) for r in results) + 2
    print(f"{'op':{width}s} {'variant':26s} {'us':>10s} {'GB/s':>8s} "
          f"{'TFLOP/s':>9s}")
    for r in results:
        print(f"{r['op']:{width}s} {r['variant']:26s} {r['us']:10.1f} "
              f"{r.get('GB/s', float('nan')):8.1f} "
              f"{r.get('TFLOP/s', float('nan')):9.2f}")


if __name__ == "__main__":
    main()
