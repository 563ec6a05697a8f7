"""Isolate int8 vs bf16 MXU dot rate: square weights, output chains directly."""
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

M, K = 32768, 4096
ITERS = 20


def timed(fn, *args):
    out = fn(*args)
    _ = np.asarray(out[0, :8])
    t0 = time.perf_counter()
    out = fn(*args)
    _ = np.asarray(out[0, :8])
    dt = (time.perf_counter() - t0) / ITERS
    return dt, 2 * M * K * K / dt / 1e12


def chain(body):
    def run(x, w):
        def step(i, x):
            return body(x, w)
        return jax.lax.fori_loop(0, ITERS, step, x)
    return jax.jit(run)


def bf16_body(x, w):
    y = jnp.dot(x, w, preferred_element_type=jnp.bfloat16)
    return y * 0.01  # keep magnitudes bounded across iterations


def w8a8_body(x, w_q):
    amax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    sx = (amax / 127.0).astype(jnp.float32) + 1e-12
    xq = jnp.round(x.astype(jnp.float32) / sx).astype(jnp.int8)
    acc = jax.lax.dot_general(xq, w_q, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    return (acc.astype(jnp.float32) * sx * 0.001).astype(jnp.bfloat16)


def int8_pure_body(xq, w_q):
    # pure s8 x s8 -> s32, re-quantize output to int8 cheaply (shift)
    acc = jax.lax.dot_general(xq, w_q, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    return (acc >> 8).astype(jnp.int8)


def main():
    x = jax.random.normal(jax.random.PRNGKey(0), (M, K), jnp.bfloat16)
    w = jax.random.normal(jax.random.PRNGKey(1), (K, K), jnp.bfloat16) * 0.01
    w_q = jnp.clip(jnp.round(w.astype(jnp.float32) * 1600), -127, 127).astype(jnp.int8)
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) * 16), -127, 127).astype(jnp.int8)

    for name, body, a, b in [("bf16 dot", bf16_body, x, w),
                             ("W8A8 dyn-quant", w8a8_body, x, w_q),
                             ("pure s8xs8 dot", int8_pure_body, xq, w_q)]:
        dt, tf = timed(chain(body), a, b)
        print(f"{name:20s} {dt*1e3:8.3f} ms/iter  {tf:7.1f} TFLOP/s")


if __name__ == "__main__":
    main()
