"""Probe: decode attention over an int4 KV cache vs int8 vs bf16.

The int8 decode attention is measured AT the HBM roofline (RESULTS.md:
0.90 ms/layer = the 335MB cache read at ~370 GB/s), so halving cache bytes
with int4 storage should halve the time — IF XLA fuses the s4->bf16
convert into the attention dots like it does for s8.

Each chain iteration WRITES one new position into the carried cache (like
real decode), so the convert cannot be loop-hoisted.

Run on the real chip: python scripts/int4kv_probe.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

B, H, CAP, D = 128, 16, 640, 128
ITERS = 32


def timed(fn, *args):
    # block_until_ready does not truly sync over the axon tunnel —
    # a host fetch does
    out = fn(*args)
    _ = np.asarray(out[0, 0, 0, :8])
    t0 = time.perf_counter()
    out = fn(*args)
    _ = np.asarray(out[0, 0, 0, :8])
    return (time.perf_counter() - t0) / ITERS


def softmax_attn(q, k, v):
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k) / float(np.sqrt(D))
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v)


def chain_bf16():
    def run(q, K, V):
        def step(i, carry):
            q, K, V = carry
            newk = q[:, :, 0, :] * 0.5
            K = jax.lax.dynamic_update_slice(K, newk[:, :, None, :].astype(K.dtype),
                                             (0, 0, i % CAP, 0))
            o = softmax_attn(q, K.astype(q.dtype), V.astype(q.dtype))
            return o, K, V
        return jax.lax.fori_loop(0, ITERS, step, (q, K, V))[0]
    return jax.jit(run)


def chain_quant(qdtype, qmax):
    def run(q, K, V, ks, vs):
        # int4 arrays cannot be created/transferred eagerly on this
        # platform (axon plugin recursion bug) — cast inside the jit
        K = K.astype(qdtype)
        V = V.astype(qdtype)

        def step(i, carry):
            q, K, V, ks, vs = carry
            newk = q[:, :, 0, :] * 0.5
            a = jnp.maximum(jnp.max(jnp.abs(newk), axis=-1), 1e-8) / qmax
            nq = jnp.round(newk / a[..., None]).astype(qdtype)
            K = jax.lax.dynamic_update_slice(K, nq[:, :, None, :],
                                             (0, 0, i % CAP, 0))
            ks = jax.lax.dynamic_update_slice(ks, a[:, :, None].astype(jnp.float32),
                                              (0, 0, i % CAP))
            kd = K.astype(q.dtype) * ks[..., None].astype(q.dtype)
            vd = V.astype(q.dtype) * vs[..., None].astype(q.dtype)
            o = softmax_attn(q, kd, vd)
            return o, K, V, ks, vs
        return jax.lax.fori_loop(0, ITERS, step, (q, K, V, ks, vs))[0]
    return jax.jit(run)


def main():
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (B, H, 1, D), jnp.bfloat16)
    Kf = jax.random.normal(jax.random.PRNGKey(1), (B, H, CAP, D), jnp.bfloat16)
    Vf = jax.random.normal(jax.random.PRNGKey(2), (B, H, CAP, D), jnp.bfloat16)
    scales = jnp.ones((B, H, CAP), jnp.float32) * 0.02

    k8 = jnp.clip(jnp.round(Kf.astype(jnp.float32) * 50), -127, 127).astype(jnp.int8)
    v8 = jnp.clip(jnp.round(Vf.astype(jnp.float32) * 50), -127, 127).astype(jnp.int8)
    k4 = jnp.clip(jnp.round(Kf.astype(jnp.float32) * 3.5), -7, 7).astype(jnp.int8)
    v4 = jnp.clip(jnp.round(Vf.astype(jnp.float32) * 3.5), -7, 7).astype(jnp.int8)

    bytes_bf16 = 2 * B * H * CAP * D * 2
    for name, mk, nbytes in [
            ("bf16 cache", lambda: timed(chain_bf16(), q, Kf, Vf), bytes_bf16),
            ("int8 cache", lambda: timed(chain_quant(jnp.int8, 127.0), q, k8,
                                         v8, scales, scales), bytes_bf16 // 2),
            ("int4 cache", lambda: timed(chain_quant(jnp.int4, 7.0), q, k4,
                                         v4, scales, scales), bytes_bf16 // 4)]:
        dt = mk()
        gbs = nbytes / dt / 1e9
        print(f"{name:12s} {dt*1e3:7.3f} ms/step  {gbs:6.0f} GB/s cache stream",
              flush=True)


if __name__ == "__main__":
    main()
