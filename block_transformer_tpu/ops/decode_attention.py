"""Pallas TPU decode attention with fused INT8 KV dequantization.

The BASELINE.json "fused INT8 KV dequant" kernel: during decode the query
is tiny (1..8 positions) while the cached K/V span the full capacity, so
the HBM cost is reading the cache. This kernel streams the int8 tiles
into VMEM and widens them in-register — the cache is read once, at half
the bf16 bytes.

**Status (measured, see RESULTS.md):** opt-in via BT_FUSED_KV_ATTN=1.
XLA's own lowering of the fallback path (models/neox.py dequant +
attention) turns out to fuse the int8->bf16 convert into the attention
dots without materializing the cache, and measures 0.90 ms/layer at
b128/cap640 — exactly the 335MB cache read at this platform's ~370 GB/s
effective bandwidth, i.e. the bandwidth roofline. This kernel reaches
1.27 ms/layer (limited by its 2*bb*H small per-(batch, head) MXU
matmuls, which exceed the tile DMA time and can't hide under it), so
the XLA path is the default. The kernel remains the reference
implementation for platforms where XLA does materialize the dequant.

Round-2 design (vs the gated round-1 kernel):

- **Stacked cache + scalar-prefetched layer index**: the kernel consumes
  the full ``[L, B, H, cap, D]`` cache arrays with the layer selected in
  the index map. A ``pallas_call`` whose operand is a per-layer
  ``dynamic_index`` slice forces XLA to materialize that slice (hundreds
  of MB per decode step at b256) — passing the stacked buffer by pointer
  eliminates the copy that made the round-1 kernel 2x slower than XLA.
- **Head- and batch-batched grid** (B/bb, K tiles): all heads plus ``bb``
  batch rows are processed inside one grid step (statically unrolled), so
  DMA transfers are ~bb*H x larger and per-step grid overhead is
  amortized — the round-1 per-(batch, head) grid starved the pipeline
  with tiny transfers, and the round-2a (B, 128-slot) grid still spent
  ~3.6us/step of overhead on ~0.5MB copies (measured 151 GB/s vs the
  ~800 GB/s v5e HBM roofline).
- **Full-row K tiles**: ``bk`` is the largest lane-aligned divisor of the
  capacity within the VMEM budget (e.g. 640 for the b256/p2048 global
  cache), not a fixed power-of-two list — one K step per row means the
  online-softmax scratch is touched once and the whole row streams as a
  single DMA.

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


def _cdiv(a, b):
    return -(-a // b)


def _make_kernel(bb: int, H: int, Sp: int, scale: float, quantized: bool):
    """Vectorized kernel body: ONE batched dot_general over the merged
    (bb*H) dim for QK and PV, whole-array masking/softmax. The per-(b, h)
    Python unroll (v1) emitted ~7 tiny ops per head and was op-issue bound
    at ~3x the DMA time of its K/V tile (measured 1.33 vs 0.90 ms/layer
    against XLA at b128/cap640)."""
    BH = bb * H

    def kernel(l_ref, q_idx_ref, kv_idx_ref, kv_valid_ref, q_ref, k_ref,
               *rest):
        if quantized:
            ks_ref, v_ref, vs_ref, o_ref, acc_ref, m_ref, l_sum_ref = rest
        else:
            v_ref, o_ref, acc_ref, m_ref, l_sum_ref = rest
        del l_ref
        ik = pl.program_id(1)
        multi_k = pl.num_programs(1) > 1
        bk = k_ref.shape[3]

        # dots run in q's dtype (bf16 in production — int8 cache values are
        # exact in bf16, and the XLA fallback path computes attention in
        # q.dtype too); accumulation stays f32 via preferred_element_type
        cdt = q_ref.dtype
        q = q_ref[:].reshape(BH, Sp, -1)
        k = k_ref[0].reshape(BH, bk, -1).astype(cdt)
        v = v_ref[0].reshape(BH, bk, -1).astype(cdt)
        # scores [BH, Sp, bk]: batched over the merged (b, h) dim
        s = jax.lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)
        if quantized:
            s = s * (ks_ref[0].reshape(BH, 1, bk) * scale)
        else:
            s = s * scale
        # mask: causal vs q_idx + validity, shared across heads of a row
        ki = kv_idx_ref[0, 0]                               # [bk]
        qi = q_idx_ref[:].reshape(bb, 1, Sp, 1)
        valid = kv_valid_ref[:].reshape(bb, 1, 1, bk)
        ok = (ki.reshape(1, 1, 1, bk) <= qi) & (valid != 0)
        ok = jnp.broadcast_to(ok, (bb, H, Sp, bk)).reshape(BH, Sp, bk)
        s = jnp.where(ok, s, _NEG)

        m_new = jnp.max(s, axis=2, keepdims=True)           # [BH, Sp, 1]
        p = jnp.exp(s - m_new)
        l_new = jnp.sum(p, axis=2, keepdims=True)
        if quantized:
            p = p * vs_ref[0].reshape(BH, 1, bk)
        a_new = jax.lax.dot_general(p.astype(cdt), v,
                                    (((2,), (1,)), ((0,), (0,))),
                                    preferred_element_type=jnp.float32)

        if multi_k:
            @pl.when(ik == 0)
            def _():
                acc_ref[:] = jnp.zeros_like(acc_ref)
                m_ref[:] = jnp.full_like(m_ref, _NEG)
                l_sum_ref[:] = jnp.zeros_like(l_sum_ref)

            m2, l2 = m_new.reshape(BH * Sp, 1), l_new.reshape(BH * Sp, 1)
            a2 = a_new.reshape(BH * Sp, -1)
            m_prev = m_ref[:]
            m_tot = jnp.maximum(m_prev, m2)
            corr_p = jnp.exp(m_prev - m_tot)
            corr_n = jnp.exp(m2 - m_tot)
            l_sum_ref[:] = l_sum_ref[:] * corr_p + l2 * corr_n
            acc_ref[:] = acc_ref[:] * corr_p + a2 * corr_n
            m_ref[:] = m_tot

            @pl.when(ik == pl.num_programs(1) - 1)
            def _():
                o_ref[:] = (acc_ref[:] / jnp.maximum(l_sum_ref[:], 1e-30)
                            ).reshape(o_ref.shape).astype(o_ref.dtype)
        else:                                         # single K tile: direct
            out = a_new / jnp.maximum(l_new, 1e-30)
            o_ref[:] = out.reshape(o_ref.shape).astype(o_ref.dtype)

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("bk", "bb", "interpret", "quantized"))
def _decode_attn(q, k_q, k_s, v_q, v_s, layer, q_idx, kv_idx, kv_valid, *,
                 bk: int, bb: int, interpret: bool, quantized: bool = True):
    B, H, S, D = q.shape
    L, B2, H2, K, D2 = k_q.shape
    assert (B, H, D) == (B2, H2, D2)
    scale = 1.0 / (D ** 0.5)
    Sp = max(8, _cdiv(S, 8) * 8)
    if Sp != S:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, Sp - S), (0, 0)))
        q_idx = jnp.pad(q_idx, ((0, 0), (0, Sp - S)))
    assert K % bk == 0, f"stacked cache capacity {K} must divide bk={bk}"
    assert B % bb == 0, (B, bb)

    kv_spec = pl.BlockSpec((1, bb, H, bk, D),
                           lambda b, ik, l: (l[0], b, 0, ik, 0),
                           memory_space=pltpu.VMEM)
    sc_spec = pl.BlockSpec((1, bb, H, 1, bk),
                           lambda b, ik, l: (l[0], b, 0, 0, ik),
                           memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((bb, 1, Sp), lambda b, ik, l: (b, 0, 0),
                     memory_space=pltpu.VMEM),           # q_idx
        pl.BlockSpec((1, 1, bk), lambda b, ik, l: (0, 0, ik),
                     memory_space=pltpu.VMEM),           # kv_idx
        pl.BlockSpec((bb, 1, bk), lambda b, ik, l: (b, 0, ik),
                     memory_space=pltpu.VMEM),           # kv_valid
        pl.BlockSpec((bb, H, Sp, D), lambda b, ik, l: (b, 0, 0, 0),
                     memory_space=pltpu.VMEM),           # q
        kv_spec,                                         # k
    ]
    args = [jnp.asarray(layer, jnp.int32).reshape(1),
            q_idx[:, None, :], kv_idx[None, None, :], kv_valid[:, None, :],
            q, k_q]
    if quantized:
        in_specs += [sc_spec, kv_spec, sc_spec]
        args += [k_s[:, :, :, None, :], v_q, v_s[:, :, :, None, :]]
    else:
        in_specs += [kv_spec]
        args += [v_q]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B // bb, K // bk),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bb, H, Sp, D), lambda b, ik, l: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((bb * H * Sp, D), jnp.float32),
            pltpu.VMEM((bb * H * Sp, 1), jnp.float32),
            pltpu.VMEM((bb * H * Sp, 1), jnp.float32),
        ],
    )
    itemsize = 1 if quantized else k_q.dtype.itemsize
    out = pl.pallas_call(
        _make_kernel(bb, H, Sp, scale, quantized),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, H, Sp, D), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * Sp * K * D,
            bytes_accessed=B * H * K * (2 * D * itemsize + 8)
            + B * H * Sp * D * 4,
            transcendentals=B * H * Sp * K),
        interpret=interpret,
    )(*args)
    return out[:, :, :S, :]


# Scoped-VMEM ceiling for one grid step's working set. XLA rejects TPU
# custom calls whose stack allocation exceeds 16MB; the estimator below
# doubles every pipelined block (double buffering) and pads trailing dims
# to the 128-lane tile (a D=64 cache measured exactly 2x the naive
# estimate: 17.5M scoped for a 9.2M un-padded sum), leaving ~3MB slack
# for Mosaic temporaries.
_VMEM_LIMIT = 13 * 1024 * 1024


def _vmem_limit() -> int:
    """Estimator budget; raise together with XLA's scoped-vmem ceiling
    (XLA_FLAGS=--xla_tpu_scoped_vmem_limit_kib=...) via BT_ATTN_VMEM_MB
    to unlock larger batch tiles."""
    import os
    mb = os.environ.get("BT_ATTN_VMEM_MB")
    return int(mb) * 1024 * 1024 if mb else _VMEM_LIMIT


def _pick_tiles(B: int, H: int, K: int, D: int, itemsize: int,
                quantized: bool, Sp: int = 8):
    """(bk, bb): choose the K tile and batch tile maximizing the per-step
    DMA size under the scoped-VMEM limit. Both must divide their dims
    (the stacked cache can't be padded)."""
    Dp = -(-D // 128) * 128          # VMEM lane padding

    def step_bytes(bb, bk):
        kv = 2 * bb * H * bk * Dp * itemsize
        sc = 2 * bb * H * bk * 4 if quantized else 0
        qo = 2 * bb * H * Sp * Dp * 2
        valid = (bb + 1) * bk * 4 + bb * Sp * 4
        scratch = bb * H * Sp * (Dp + 2) * 4
        return 2 * (kv + sc + qo + valid) + scratch

    if K % 128:
        bks = [K]                    # unaligned capacity: tests/tiny shapes
    else:
        bks = [d for d in range(K, 0, -128) if K % d == 0]
    best = None
    for bk in bks:
        for bb in range(min(8, B), 0, -1):
            if B % bb or step_bytes(bb, bk) > _vmem_limit():
                continue
            if best is None or bb * bk > best[0] * best[1]:
                best = (bb, bk)
            break                    # smaller bb only shrinks the DMA
    if best is None:
        best = (1, bks[-1])          # tiny-shape fallback (tests)
    return best[1], best[0]


def _prep(q, K, mask):
    B, H, S, D = q.shape
    q_idx = mask.q_idx
    if q_idx.ndim == 1:
        q_idx = jnp.broadcast_to(q_idx[None], (B, S))
    kv_valid = mask.kv_valid
    if kv_valid is None:
        kv_valid = jnp.ones((B, K), jnp.int32)
    return (q_idx.astype(jnp.int32), mask.kv_idx.astype(jnp.int32),
            kv_valid.astype(jnp.int32))


def decode_attention_int8_stacked(q, k_q, k_s, v_q, v_s, layer,
                                  mask: masks_lib.AttnMask, *,
                                  interpret: bool = False):
    """Fused int8-KV decode attention over a stacked cache.

    q [B, H, S, D] (S<=8); k_q/v_q int8 [L, B, H, cap, D]; k_s/v_s f32
    [L, B, H, cap]; layer: traced scalar int32; mask: AttnMask at cache
    granularity. -> [B, H, S, D] in q.dtype.
    """
    B, H, S, D = q.shape
    K = k_q.shape[3]
    q_idx, kv_idx, kv_valid = _prep(q, K, mask)
    bk, bb = _pick_tiles(B, H, K, D, 1, True)
    return _decode_attn(q, k_q, k_s.astype(jnp.float32), v_q,
                        v_s.astype(jnp.float32), layer, q_idx, kv_idx,
                        kv_valid, bk=bk, bb=bb, interpret=interpret,
                        quantized=True)


def decode_attention_stacked(q, k, v, layer, mask: masks_lib.AttnMask, *,
                             interpret: bool = False):
    """Unquantized (bf16/f32 KV) head-batched decode attention over a
    stacked cache: same structure as the int8 form without scales — the
    small-Q decode counterpart of ops/flash_attention.py (whose
    per-(batch, head) grid needs Q>=64 tiles to pipeline well).

    q [B, H, S, D] (S<=8); k/v [L, B, H, cap, D]; layer scalar int32.
    """
    B, H, S, D = q.shape
    K = k.shape[3]
    q_idx, kv_idx, kv_valid = _prep(q, K, mask)
    bk, bb = _pick_tiles(B, H, K, D, k.dtype.itemsize, False)
    return _decode_attn(q, k, None, v, None, layer, q_idx, kv_idx,
                        kv_valid, bk=bk, bb=bb, interpret=interpret,
                        quantized=False)


def decode_attention_int8(q, k_q, k_s, v_q, v_s, mask: masks_lib.AttnMask,
                          *, interpret: bool = False):
    """Single-layer form (kept for tests/microbench): wraps the stacked
    kernel with L=1. q [B,H,S,D]; k_q/v_q int8 [B,H,K,D]; k_s/v_s [B,H,K]."""
    return decode_attention_int8_stacked(
        q, k_q[None], k_s[None], v_q[None], v_s[None], 0, mask,
        interpret=interpret)
