"""Pallas TPU decode attention with fused INT8 KV dequantization.

The BASELINE.json "fused INT8 KV dequant" kernel: during decode the query
is tiny (1..8 positions) while the cached K/V span the full capacity, so
the HBM cost is reading the cache. With ``QuantKVCache`` the XLA path first
materializes a bf16 copy of each layer's K/V (write + re-read ≈ 3x the
cache bytes); this kernel streams the int8 tiles into VMEM and widens them
in-register instead — the cache is read once, at half the bf16 bytes.

Online-softmax over KV tiles, mask from AttnMask index vectors (same
convention as ops/flash_attention.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from block_transformer_tpu.ops import masks as masks_lib

_NEG = -1e30


def _kernel(q_idx_ref, kv_idx_ref, kv_valid_ref, q_ref, k_ref, ks_ref,
            v_ref, vs_ref, o_ref, acc_ref, m_ref, l_ref, *, scale):
    ik = pl.program_id(2)

    @pl.when(ik == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, _NEG)
        l_ref[:] = jnp.zeros_like(l_ref)

    q = q_ref[0, 0]                               # [Sp, D] bf16
    k_i8 = k_ref[0, 0]                            # [bk, D] int8
    ks = ks_ref[0, 0, 0]                          # [bk] f32
    # dequant fused: widen in-register, scale folded into the score
    s = jax.lax.dot_general(q.astype(jnp.float32), k_i8.astype(jnp.float32),
                            (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    s = s * (ks[None, :] * scale)

    qi = q_idx_ref[0, 0]
    ki = kv_idx_ref[0, 0]
    ok = ki[None, :] <= qi[:, None]
    ok = ok & (kv_valid_ref[0, 0][None, :] != 0)
    s = jnp.where(ok, s, _NEG)

    m_prev = m_ref[:]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
    p = jnp.exp(s - m_new)                        # [Sp, bk]
    corr = jnp.exp(m_prev - m_new)
    l_ref[:] = l_ref[:] * corr + jnp.sum(p, axis=1, keepdims=True)
    # V dequant fused into the PV matmul: (p * vs) @ v_i8
    pv = p * vs_ref[0, 0, 0][None, :]
    acc_ref[:] = acc_ref[:] * corr + jax.lax.dot(
        pv, v_ref[0, 0].astype(jnp.float32),
        preferred_element_type=jnp.float32)
    m_ref[:] = m_new

    @pl.when(ik == pl.num_programs(2) - 1)
    def _():
        o_ref[0, 0] = (acc_ref[:] / jnp.maximum(l_ref[:], 1e-30)
                       ).astype(o_ref.dtype)


def _cdiv(a, b):
    return -(-a // b)


@functools.partial(jax.jit, static_argnames=("bk", "interpret"))
def _decode_attn(q, k_q, k_s, v_q, v_s, q_idx, kv_idx, kv_valid, *,
                 bk: int, interpret: bool):
    B, H, S, D = q.shape
    K = k_q.shape[2]
    scale = 1.0 / (D ** 0.5)
    Sp = max(8, _cdiv(S, 8) * 8)
    if Sp != S:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, Sp - S), (0, 0)))
        q_idx = jnp.pad(q_idx, ((0, 0), (0, Sp - S)))
    Kp = _cdiv(K, bk) * bk
    if Kp != K:
        k_q = jnp.pad(k_q, ((0, 0), (0, 0), (0, Kp - K), (0, 0)))
        v_q = jnp.pad(v_q, ((0, 0), (0, 0), (0, Kp - K), (0, 0)))
        k_s = jnp.pad(k_s, ((0, 0), (0, 0), (0, Kp - K)))
        v_s = jnp.pad(v_s, ((0, 0), (0, 0), (0, Kp - K)))
        kv_idx = jnp.pad(kv_idx, ((0, 0), (0, Kp - K)),
                         constant_values=jnp.iinfo(jnp.int32).max)
        kv_valid = jnp.pad(kv_valid, ((0, 0), (0, Kp - K)))

    grid = (B, H, Kp // bk)
    out = pl.pallas_call(
        functools.partial(_kernel, scale=scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, Sp), lambda b, h, ik: (b, 0, 0),
                         memory_space=pltpu.VMEM),   # q_idx
            pl.BlockSpec((1, 1, bk), lambda b, h, ik: (0, 0, ik),
                         memory_space=pltpu.VMEM),   # kv_idx
            pl.BlockSpec((1, 1, bk), lambda b, h, ik: (b, 0, ik),
                         memory_space=pltpu.VMEM),   # kv_valid
            pl.BlockSpec((1, 1, Sp, D), lambda b, h, ik: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),   # q
            pl.BlockSpec((1, 1, bk, D), lambda b, h, ik: (b, h, ik, 0),
                         memory_space=pltpu.VMEM),   # k int8
            pl.BlockSpec((1, 1, 1, bk), lambda b, h, ik: (b, h, 0, ik),
                         memory_space=pltpu.VMEM),   # k scale
            pl.BlockSpec((1, 1, bk, D), lambda b, h, ik: (b, h, ik, 0),
                         memory_space=pltpu.VMEM),   # v int8
            pl.BlockSpec((1, 1, 1, bk), lambda b, h, ik: (b, h, 0, ik),
                         memory_space=pltpu.VMEM),   # v scale
        ],
        out_specs=pl.BlockSpec((1, 1, Sp, D), lambda b, h, ik: (b, h, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, Sp, D), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((Sp, D), jnp.float32),
            pltpu.VMEM((Sp, 1), jnp.float32),
            pltpu.VMEM((Sp, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * Sp * Kp * D,
            bytes_accessed=B * H * Kp * D * 2 + B * H * Sp * D * 4,
            transcendentals=B * H * Sp * Kp),
        interpret=interpret,
    )(q_idx[:, None, :], kv_idx[:, None, :], kv_valid[:, None, :],
      q, k_q, k_s[:, :, None, :], v_q, v_s[:, :, None, :])
    return out[:, :, :S, :]


def decode_attention_int8(q, k_q, k_s, v_q, v_s, mask: masks_lib.AttnMask,
                          *, bk: int = 512, interpret: bool = False):
    """q [B, H, S, D] (S<=8); k_q/v_q int8 [B, H, K, D]; k_s/v_s f32
    [B, H, K]; mask: AttnMask. -> [B, H, S, D] in q.dtype."""
    B, H, S, D = q.shape
    K = k_q.shape[2]
    q_idx = mask.q_idx
    if q_idx.ndim == 1:
        q_idx = jnp.broadcast_to(q_idx[None], (B, S))
    kv_idx = mask.kv_idx[None]
    kv_valid = mask.kv_valid
    if kv_valid is None:
        kv_valid = jnp.ones((B, K), jnp.int32)
    bk = min(bk, max(128, _cdiv(K, 128) * 128))
    return _decode_attn(q, k_q, k_s.astype(jnp.float32), v_q,
                        v_s.astype(jnp.float32), q_idx.astype(jnp.int32),
                        kv_idx.astype(jnp.int32), kv_valid.astype(jnp.int32),
                        bk=bk, interpret=interpret)
