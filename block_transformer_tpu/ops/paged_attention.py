"""Paged INT8-KV decode attention (vLLM-style page pool, TPU-native).

The serving engine's fixed-capacity pooled cache reserves
``n_slots x max_capacity`` whether or not a request is short; a paged pool
allocates fixed-size pages from a shared free list so HBM scales with the
tokens actually resident. The TPU problem with paging is the gather: an
XLA ``take`` of each slot's pages materializes a full copy of the active
cache per decode step — at the measured HBM roofline that doubles decode
attention time. This kernel instead resolves the page table inside the
``pallas_call`` **index maps** (scalar prefetch): the page id for grid
step ``(slot, page)`` is read from SMEM and the DMA engine streams that
page of the pool directly into VMEM. No gather, no materialization — the
pool is read once at int8 width, like the contiguous kernel.

Grid: ``(B, n_pages_virtual)`` — one batch row per step (different rows
need different physical pages, so rows cannot share a block), pages
streamed in virtual order with online softmax across page steps. Masking
uses the same virtual-position ``AttnMask`` arrays as the contiguous
path: a slot whose tail pages are unallocated points them at page 0 with
``kv_valid = 0`` there, which masks them out of the softmax.

Layer selection follows ops/decode_attention.py: the stacked
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
from block_transformer_tpu.ops.decode_attention import _make_kernel, _cdiv


@functools.partial(jax.jit, static_argnames=("interpret",))
def _paged_attn(q, k_q, k_s, v_q, v_s, layer, page_table, q_idx, kv_idx,
                kv_valid, *, interpret: bool):
    """q [B, H, S, D]; k_q/v_q int8 [L, P, H, ps, D]; k_s/v_s f32
    [L, P, H, ps]; page_table int32 [B, n_virt]; mask arrays at virtual
    positions ([B, n_virt*ps] / [n_virt*ps])."""
    B, H, S, D = q.shape
    L, P, H2, ps, D2 = k_q.shape
    assert (H, D) == (H2, D2)
    n_virt = page_table.shape[1]
    K = n_virt * ps
    scale = 1.0 / (D ** 0.5)
    Sp = max(8, _cdiv(S, 8) * 8)
    if Sp != S:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, Sp - S), (0, 0)))
        q_idx = jnp.pad(q_idx, ((0, 0), (0, Sp - S)))

    # scalar-prefetch operands: [0] layer, [1] page table
    kv_spec = pl.BlockSpec((1, 1, H, ps, D),
                           lambda b, ip, l, pt: (l[0], pt[b, ip], 0, 0, 0),
                           memory_space=pltpu.VMEM)
    sc_spec = pl.BlockSpec((1, 1, H, 1, ps),
                           lambda b, ip, l, pt: (l[0], pt[b, ip], 0, 0, 0),
                           memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((1, 1, Sp), lambda b, ip, l, pt: (b, 0, 0),
                     memory_space=pltpu.VMEM),            # q_idx
        pl.BlockSpec((1, 1, ps), lambda b, ip, l, pt: (0, 0, ip),
                     memory_space=pltpu.VMEM),            # kv_idx (virtual)
        pl.BlockSpec((1, 1, ps), lambda b, ip, l, pt: (b, 0, ip),
                     memory_space=pltpu.VMEM),            # kv_valid (virtual)
        pl.BlockSpec((1, H, Sp, D), lambda b, ip, l, pt: (b, 0, 0, 0),
                     memory_space=pltpu.VMEM),            # q
        kv_spec, sc_spec, kv_spec, sc_spec,
    ]
    args = [jnp.asarray(layer, jnp.int32).reshape(1),
            page_table.astype(jnp.int32),
            q_idx[:, None, :], kv_idx[None, None, :], kv_valid[:, None, :],
            q, k_q, k_s[:, :, :, None, :], v_q, v_s[:, :, :, None, :]]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, n_virt),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, H, Sp, D), lambda b, ip, l, pt: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((H * Sp, D), jnp.float32),
            pltpu.VMEM((H * Sp, 1), jnp.float32),
            pltpu.VMEM((H * Sp, 1), jnp.float32),
        ],
    )
    inner = _make_kernel(1, H, Sp, scale, True)

    def kernel(l_ref, pt_ref, *rest):
        # the page table is consumed by the index maps only
        del pt_ref
        inner(l_ref, *rest)

    out = pl.pallas_call(
        kernel,
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
    K = page_table.shape[1] * k_q.shape[3]
    q_idx = mask.q_idx
    if q_idx.ndim == 1:
        q_idx = jnp.broadcast_to(q_idx[None], (B, S))
    kv_valid = mask.kv_valid
    if kv_valid is None:
        kv_valid = jnp.ones((B, K), jnp.int32)
    return _paged_attn(q, k_q, k_s.astype(jnp.float32), v_q,
                       v_s.astype(jnp.float32), layer, page_table,
                       q_idx.astype(jnp.int32), mask.kv_idx.astype(jnp.int32),
                       kv_valid.astype(jnp.int32), interpret=interpret)
