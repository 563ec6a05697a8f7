"""Pallas TPU fused attention (flash-style online softmax).

TPU-native replacement for the reference's FlashAttention-2 CUDA dependency
(SURVEY.md §2.9). Consumes the structured ``masks.AttnMask`` index vectors
directly — causality (token- or block-granular) and padding are evaluated
in-kernel per tile, so no O(Q·K) bias ever exists in HBM. The same kernel
therefore serves:

- the block decoder's block-causal global attention (indices = block ids,
  the mask of model/block_decoder/gpt_neo_x.py:16-24),
- ordinary causal attention for the vanilla baseline,
- padded prefill (kv_valid).

Grid: (batch, heads, Q tiles, KV tiles), KV innermost; fp32 running max /
sum / accumulator live in VMEM scratch across KV steps.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from block_transformer_tpu.ops import masks as masks_lib

_NEG = -1e30


def _kernel(q_idx_ref, kv_idx_ref, kv_valid_ref, q_ref, k_ref, v_ref,
            o_ref, acc_ref, m_ref, l_ref, *, scale):
    ik = pl.program_id(3)

    @pl.when(ik == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, _NEG)
        l_ref[:] = jnp.zeros_like(l_ref)

    q = q_ref[0, 0]                        # [bq, D]
    k = k_ref[0, 0]                        # [bk, D]
    v = v_ref[0, 0]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    qi = q_idx_ref[0, 0]                   # [bq]
    ki = kv_idx_ref[0, 0]                  # [bk]
    ok = ki[None, :] <= qi[:, None]
    ok = ok & (kv_valid_ref[0, 0][None, :] != 0)
    s = jnp.where(ok, s, _NEG)

    m_prev = m_ref[:]                      # [bq, 1]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
    p = jnp.exp(s - m_new)                 # [bq, bk]
    corr = jnp.exp(m_prev - m_new)         # [bq, 1]
    l_ref[:] = l_ref[:] * corr + jnp.sum(p, axis=1, keepdims=True)
    acc_ref[:] = acc_ref[:] * corr + jax.lax.dot(
        p.astype(v.dtype), v, preferred_element_type=jnp.float32)
    m_ref[:] = m_new

    @pl.when(ik == pl.num_programs(3) - 1)
    def _():
        o_ref[0, 0] = (acc_ref[:] / jnp.maximum(l_ref[:], 1e-30)
                       ).astype(o_ref.dtype)


def _cdiv(a, b):
    return -(-a // b)


def supported(q, k) -> bool:
    """Shapes this kernel pipelines well on. Small-Q decode steps should
    use the head-batched kernels in ops/decode_attention.py instead (this
    grid is per-(batch, head); at Q<8 its tiles cannot fill the pipeline),
    so the structured-mask Pallas path covers every regime between them."""
    B, H, Q, D = q.shape
    K = k.shape[2]
    return Q >= 8 and K >= 128 and D <= 128


@functools.partial(jax.jit, static_argnames=("bq", "bk", "interpret"))
def _flash(q, k, v, q_idx, kv_idx, kv_valid, *, bq, bk, interpret):
    B, H, Q, D = q.shape
    K = k.shape[2]
    scale = 1.0 / (D ** 0.5)

    Qp, Kp = _cdiv(Q, bq) * bq, _cdiv(K, bk) * bk
    if Qp != Q:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, Qp - Q), (0, 0)))
        q_idx = jnp.pad(q_idx, ((0, 0), (0, Qp - Q)))
    if Kp != K:
        k = jnp.pad(k, ((0, 0), (0, 0), (0, Kp - K), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, Kp - K), (0, 0)))
        kv_idx = jnp.pad(kv_idx, ((0, 0), (0, Kp - K)),
                         constant_values=jnp.iinfo(jnp.int32).max)
        kv_valid = jnp.pad(kv_valid, ((0, 0), (0, Kp - K)))

    # index vectors as [B, 1, len]: Pallas TPU requires the last-two block
    # dims to divide (8, 128) or equal the array dims — the middle 1 does
    q_idx3 = q_idx[:, None, :]
    kv_idx3 = kv_idx[:, None, :]
    kv_valid3 = kv_valid[:, None, :]

    grid = (B, H, Qp // bq, Kp // bk)
    out = pl.pallas_call(
        functools.partial(_kernel, scale=scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, bq), lambda b, h, iq, ik: (b, 0, iq),
                         memory_space=pltpu.VMEM),      # q_idx
            pl.BlockSpec((1, 1, bk), lambda b, h, iq, ik: (0, 0, ik),
                         memory_space=pltpu.VMEM),      # kv_idx
            pl.BlockSpec((1, 1, bk), lambda b, h, iq, ik: (b, 0, ik),
                         memory_space=pltpu.VMEM),      # kv_valid
            pl.BlockSpec((1, 1, bq, D), lambda b, h, iq, ik: (b, h, iq, 0),
                         memory_space=pltpu.VMEM),      # q
            pl.BlockSpec((1, 1, bk, D), lambda b, h, iq, ik: (b, h, ik, 0),
                         memory_space=pltpu.VMEM),      # k
            pl.BlockSpec((1, 1, bk, D), lambda b, h, iq, ik: (b, h, ik, 0),
                         memory_space=pltpu.VMEM),      # v
        ],
        out_specs=pl.BlockSpec((1, 1, bq, D), lambda b, h, iq, ik: (b, h, iq, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, Qp, D), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((bq, D), jnp.float32),
            pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * Qp * Kp * D,
            bytes_accessed=(B * H * (Qp + 2 * Kp) * D * q.dtype.itemsize
                            + B * H * Qp * D * q.dtype.itemsize),
            transcendentals=B * H * Qp * Kp),
        interpret=interpret,
    )(q_idx3, kv_idx3, kv_valid3, q, k, v)
    return out[:, :, :Q, :]


def flash_attention(q, k, v, mask: masks_lib.AttnMask, *, bq: int = 128,
                    bk: int = 128, interpret: bool = False):
    """q [B, H, Q, D]; k, v [B, H, K, D]; mask: AttnMask. -> [B, H, Q, D]."""
    B, H, Q, D = q.shape
    K = k.shape[2]
    q_idx = mask.q_idx
    if q_idx.ndim == 1:
        q_idx = jnp.broadcast_to(q_idx[None], (B, Q))
    kv_idx = mask.kv_idx[None]
    kv_valid = mask.kv_valid
    if kv_valid is None:
        kv_valid = jnp.ones((B, K), jnp.int32)
    bq = min(bq, max(8, _cdiv(Q, 8) * 8))
    bk = min(bk, max(128, K))
    return _flash(q, k, v, q_idx.astype(jnp.int32), kv_idx.astype(jnp.int32),
                  kv_valid.astype(jnp.int32), bq=bq, bk=bk,
                  interpret=interpret)
