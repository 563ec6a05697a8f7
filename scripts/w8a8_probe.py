"""Probe: is int8 x int8 dot_general ~2x bf16 on the v5e MXU at prefill shapes?

Races three prefill-shaped matmul chains inside single jits (data-dependent
iterations so LICM can't hoist the body):
  1. bf16 x bf16 dot            (current prefill compute path after convert)
  2. int8 w convert + bf16 dot  (current int8-weight prefill path)
  3. dynamic-quant act -> int8 x int8 dot -> int32 -> rescale  (W8A8 candidate)

Run on the real chip: python scripts/w8a8_probe.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

M, K, N = 32768, 2048, 8192
ITERS = 20


def timed(fn, *args):
    out = fn(*args)
    _ = np.asarray(out[0, :8])  # force full sync via host fetch
    t0 = time.perf_counter()
    out = fn(*args)
    _ = np.asarray(out[0, :8])
    dt = (time.perf_counter() - t0) / ITERS
    flops = 2 * M * K * N
    return dt, flops / dt / 1e12


def chain(body):
    def run(x, w, s):
        def step(i, x):
            y = body(x, w, s)
            # fold the FULL output back into x (reshape-sum over N/K groups)
            # so iterations are data-dependent and no column is dead code
            fold = y.reshape(M, N // K, K).sum(axis=1)
            return x + fold.astype(x.dtype) * 1e-6
        return jax.lax.fori_loop(0, ITERS, step, x)
    return jax.jit(run)


def bf16_body(x, w, s):
    return jnp.dot(x, w, preferred_element_type=jnp.bfloat16)


def convert_body(x, w_q, s):
    return (jnp.dot(x, w_q.astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32) * s).astype(jnp.bfloat16)


def w8a8_body(x, w_q, s):
    amax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    sx = (amax / 127.0).astype(jnp.float32) + 1e-12
    xq = jnp.round(x.astype(jnp.float32) / sx).astype(jnp.int8)
    acc = jax.lax.dot_general(xq, w_q, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    return (acc.astype(jnp.float32) * sx * s).astype(jnp.bfloat16)


def main():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (M, K), jnp.bfloat16)
    w = jax.random.normal(jax.random.PRNGKey(1), (K, N), jnp.bfloat16)
    w_q = jnp.clip(jnp.round(w.astype(jnp.float32) * 16), -127, 127).astype(jnp.int8)
    s = jnp.full((N,), 1 / 16.0, jnp.float32)

    for name, body, wa in [("bf16 dot", bf16_body, w),
                           ("int8w convert+dot", convert_body, w_q),
                           ("W8A8 dyn-quant int8 dot", w8a8_body, w_q)]:
        dt, tf = timed(chain(body), x, wa, s)
        print(f"{name:28s} {dt*1e3:8.3f} ms/iter  {tf:7.1f} TFLOP/s")


if __name__ == "__main__":
    main()
