"""Paged INT8-KV decode attention (vLLM-style page pool, TPU-native).

The serving engine's fixed-capacity pooled cache reserves
``n_slots x max_capacity`` whether or not a request is short; a paged pool
allocates fixed-size pages from a shared free list so HBM scales with the
tokens actually resident. The TPU problem with paging is the gather: an
XLA ``take`` of each slot's pages materializes a full copy of the active
cache per decode step — at the measured HBM roofline that doubles decode
attention time. This kernel instead resolves the page table inside the
``pallas_call`` **index maps** (scalar prefetch): the page id for grid
step ``(slot, group)`` is read from SMEM and the DMA engine streams that
page of the pool directly into VMEM. No gather, no materialization — the
pool is read once at int8 width, like the contiguous kernel.

Round-3 retile: the round-2 grid ``(B, n_virt)`` streamed ONE page per
step — ~1 MB DMAs and a single small per-(row, head) MXU matmul per step,
measured at 40% of the contiguous kernel's throughput (1,175 vs 2,968
tok/s on the d64 engine workload; VERDICT r2). Pages cannot share a
BlockSpec (each needs its own page-table lookup), but one grid step CAN
carry **multiple page operands**: grid ``(B, n_virt/npp)`` with ``npp``
K/V/scale operand quadruples whose index maps select consecutive virtual
pages ``pt[b, g*npp + j]``. The kernel concatenates the page tiles in
VMEM and issues ONE batched dot over ``npp*page_size`` keys — per-step
DMA and MXU work grow ``npp``-fold, recovering the row-batched streaming
that makes the contiguous kernel run at the bandwidth roofline. ``npp``
is chosen like the contiguous kernel's K tile: the largest divisor of
``n_virt`` whose double-buffered working set fits scoped VMEM.

Masking uses the same virtual-position ``AttnMask`` arrays as the
contiguous path (they are contiguous in virtual space, so one BlockSpec
covers a whole group): a slot whose tail pages are unallocated points
them at page 0 with ``kv_valid = 0`` there, which masks them out of the
softmax. Layer selection follows ops/decode_attention.py: the stacked
``[L, n_pages, H, page, D]`` pool is passed whole and the layer index is
the first scalar-prefetch operand, so no per-layer slice is ever
materialized.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from block_transformer_tpu.ops import masks as masks_lib
from block_transformer_tpu.ops.decode_attention import (_cdiv, _vmem_limit,
                                                        _NEG)


def _paged_kernel(H: int, Sp: int, ps: int, npp: int, scale: float):
    """One grid step = one slot row x ``npp`` consecutive virtual pages:
    concatenate the page tiles in VMEM, one batched QK dot over the
    merged head dim, online softmax across groups."""
    bk = npp * ps

    def kernel(l_ref, pt_ref, q_idx_ref, kv_idx_ref, kv_valid_ref, q_ref,
               *rest):
        del l_ref, pt_ref                  # consumed by the index maps
        k_refs = rest[0:npp]
        ks_refs = rest[npp:2 * npp]
        v_refs = rest[2 * npp:3 * npp]
        vs_refs = rest[3 * npp:4 * npp]
        o_ref, acc_ref, m_ref, l_sum_ref = rest[4 * npp:]
        ig = pl.program_id(1)
        multi = pl.num_programs(1) > 1

        cdt = q_ref.dtype
        q = q_ref[:].reshape(H, Sp, -1)
        if npp == 1:
            k = k_refs[0][0, 0].astype(cdt)                    # [H, ps, D]
            v = v_refs[0][0, 0].astype(cdt)
            ks = ks_refs[0][0, 0].reshape(H, 1, ps)
            vsc = vs_refs[0][0, 0].reshape(H, 1, ps)
        else:
            k = jnp.concatenate([r[0, 0] for r in k_refs], 1).astype(cdt)
            v = jnp.concatenate([r[0, 0] for r in v_refs], 1).astype(cdt)
            ks = jnp.concatenate([r[0, 0] for r in ks_refs], 2)
            vsc = jnp.concatenate([r[0, 0] for r in vs_refs], 2)
        s = jax.lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)
        s = s * (ks * scale)                                   # [H, Sp, bk]

        ki = kv_idx_ref[0, 0]                                  # [bk]
        qi = q_idx_ref[:].reshape(1, Sp, 1)
        valid = kv_valid_ref[:].reshape(1, 1, bk)
        ok = (ki.reshape(1, 1, bk) <= qi) & (valid != 0)
        s = jnp.where(jnp.broadcast_to(ok, (H, Sp, bk)), s, _NEG)

        m_new = jnp.max(s, axis=2, keepdims=True)              # [H, Sp, 1]
        p = jnp.exp(s - m_new)
        l_new = jnp.sum(p, axis=2, keepdims=True)
        p = p * vsc
        a_new = jax.lax.dot_general(p.astype(cdt), v,
                                    (((2,), (1,)), ((0,), (0,))),
                                    preferred_element_type=jnp.float32)

        if multi:
            @pl.when(ig == 0)
            def _():
                acc_ref[:] = jnp.zeros_like(acc_ref)
                m_ref[:] = jnp.full_like(m_ref, _NEG)
                l_sum_ref[:] = jnp.zeros_like(l_sum_ref)

            m2, l2 = m_new.reshape(H * Sp, 1), l_new.reshape(H * Sp, 1)
            a2 = a_new.reshape(H * Sp, -1)
            m_prev = m_ref[:]
            m_tot = jnp.maximum(m_prev, m2)
            corr_p = jnp.exp(m_prev - m_tot)
            corr_n = jnp.exp(m2 - m_tot)
            l_sum_ref[:] = l_sum_ref[:] * corr_p + l2 * corr_n
            acc_ref[:] = acc_ref[:] * corr_p + a2 * corr_n
            m_ref[:] = m_tot

            @pl.when(ig == pl.num_programs(1) - 1)
            def _():
                o_ref[:] = (acc_ref[:] / jnp.maximum(l_sum_ref[:], 1e-30)
                            ).reshape(o_ref.shape).astype(o_ref.dtype)
        else:
            out = a_new / jnp.maximum(l_new, 1e-30)
            o_ref[:] = out.reshape(o_ref.shape).astype(o_ref.dtype)

    return kernel


def _pick_npp(n_virt: int, H: int, ps: int, D: int, Sp: int) -> int:
    """Largest divisor of ``n_virt`` whose per-step working set (K+V int8
    pages + f32 scales, double-buffered, lane-padded D) fits scoped VMEM.
    ``BT_PAGED_NPP`` overrides (racing/tests)."""
    import os
    forced = os.environ.get("BT_PAGED_NPP")
    if forced:
        npp = int(forced)
        assert n_virt % npp == 0, (n_virt, npp)
        return npp
    Dp = -(-D // 128) * 128

    def step_bytes(npp):
        kv = 2 * H * npp * ps * Dp          # int8 K+V
        sc = 2 * H * npp * ps * 4           # f32 scales
        qo = 2 * H * Sp * Dp * 2
        valid = 2 * npp * ps * 4 + Sp * 4
        scratch = H * Sp * (Dp + 2) * 4
        return 2 * (kv + sc + qo + valid) + scratch

    for npp in range(n_virt, 0, -1):
        if n_virt % npp == 0 and step_bytes(npp) <= _vmem_limit():
            return npp
    return 1


@functools.partial(jax.jit, static_argnames=("interpret", "npp"))
def _paged_attn(q, k_q, k_s, v_q, v_s, layer, page_table, q_idx, kv_idx,
                kv_valid, *, npp: int, interpret: bool):
    """q [B, H, S, D]; k_q/v_q int8 [L, P, H, ps, D]; k_s/v_s f32
    [L, P, H, ps]; page_table int32 [B, n_virt]; mask arrays at virtual
    positions ([B, n_virt*ps] / [n_virt*ps])."""
    B, H, S, D = q.shape
    L, P, H2, ps, D2 = k_q.shape
    assert (H, D) == (H2, D2)
    n_virt = page_table.shape[1]
    K = n_virt * ps
    bk = npp * ps
    scale = 1.0 / (D ** 0.5)
    Sp = max(8, _cdiv(S, 8) * 8)
    if Sp != S:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, Sp - S), (0, 0)))
        q_idx = jnp.pad(q_idx, ((0, 0), (0, Sp - S)))

    # scalar-prefetch operands: [0] layer, [1] page table. One K/V/scale
    # operand quadruple per page-in-group; j=j binds the page offset.
    def kv_spec(j):
        return pl.BlockSpec(
            (1, 1, H, ps, D),
            lambda b, ig, l, pt, j=j: (l[0], pt[b, ig * npp + j], 0, 0, 0),
            memory_space=pltpu.VMEM)

    def sc_spec(j):
        return pl.BlockSpec(
            (1, 1, H, 1, ps),
            lambda b, ig, l, pt, j=j: (l[0], pt[b, ig * npp + j], 0, 0, 0),
            memory_space=pltpu.VMEM)

    in_specs = [
        pl.BlockSpec((1, 1, Sp), lambda b, ig, l, pt: (b, 0, 0),
                     memory_space=pltpu.VMEM),            # q_idx
        pl.BlockSpec((1, 1, bk), lambda b, ig, l, pt: (0, 0, ig),
                     memory_space=pltpu.VMEM),            # kv_idx (virtual)
        pl.BlockSpec((1, 1, bk), lambda b, ig, l, pt: (b, 0, ig),
                     memory_space=pltpu.VMEM),            # kv_valid (virtual)
        pl.BlockSpec((1, H, Sp, D), lambda b, ig, l, pt: (b, 0, 0, 0),
                     memory_space=pltpu.VMEM),            # q
    ]
    in_specs += [kv_spec(j) for j in range(npp)]
    in_specs += [sc_spec(j) for j in range(npp)]
    in_specs += [kv_spec(j) for j in range(npp)]
    in_specs += [sc_spec(j) for j in range(npp)]
    args = [jnp.asarray(layer, jnp.int32).reshape(1),
            page_table.astype(jnp.int32),
            q_idx[:, None, :], kv_idx[None, None, :], kv_valid[:, None, :],
            q]
    args += [k_q] * npp + [k_s[:, :, :, None, :]] * npp
    args += [v_q] * npp + [v_s[:, :, :, None, :]] * npp

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, n_virt // npp),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, H, Sp, D), lambda b, ig, l, pt: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((H * Sp, D), jnp.float32),
            pltpu.VMEM((H * Sp, 1), jnp.float32),
            pltpu.VMEM((H * Sp, 1), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        _paged_kernel(H, Sp, ps, npp, scale),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, H, Sp, D), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * Sp * K * D,
            bytes_accessed=B * H * K * (2 * D + 8) + B * H * Sp * D * 4,
            transcendentals=B * H * Sp * K),
        interpret=interpret,
    )(*args)
    return out[:, :, :S, :]


def paged_decode_attention_int8(q, k_q, k_s, v_q, v_s, layer, page_table,
                                mask: masks_lib.AttnMask, *,
                                interpret: bool = False):
    """Fused int8 decode attention over a paged pool.

    q [B, H, S, D] (S <= 8); pool k_q/v_q int8 [L, n_pages, H, page, D]
    with f32 scales [L, n_pages, H, page]; page_table [B, n_virt] maps each
    slot's virtual page index to a pool page (unallocated tail -> page 0
    with kv_valid 0); mask: AttnMask over the virtual positions
    [B, n_virt*page]. Returns [B, H, S, D] in q.dtype.
    """
    B, H, S, D = q.shape
    n_virt = page_table.shape[1]
    ps = k_q.shape[3]
    K = n_virt * ps
    q_idx = mask.q_idx
    if q_idx.ndim == 1:
        q_idx = jnp.broadcast_to(q_idx[None], (B, S))
    kv_valid = mask.kv_valid
    if kv_valid is None:
        kv_valid = jnp.ones((B, K), jnp.int32)
    npp = _pick_npp(n_virt, H, ps, D, max(8, _cdiv(S, 8) * 8))
    return _paged_attn(q, k_q, k_s.astype(jnp.float32), v_q,
                       v_s.astype(jnp.float32), layer, page_table,
                       q_idx.astype(jnp.int32), mask.kv_idx.astype(jnp.int32),
                       kv_valid.astype(jnp.int32), npp=npp,
                       interpret=interpret)
