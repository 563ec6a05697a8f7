"""Paged INT8-KV decode attention (vLLM-style page pool, TPU-native).

The serving engine's fixed-capacity pooled cache reserves
``n_slots x max_capacity`` whether or not a request is short; a paged pool
allocates fixed-size pages from a shared free list so HBM scales with the
tokens actually resident. The TPU problem with paging is the gather: an
XLA ``take`` of each slot's pages materializes a full copy of the active
cache per decode step — at the measured HBM roofline that doubles decode
attention time. This kernel instead resolves the page table inside the
``pallas_call`` **index maps** (scalar prefetch): the page id for grid
step ``(slot tile, page group)`` is read from SMEM and the DMA engine
streams that page of the pool directly into VMEM. No gather, no
materialization — the pool is read once at int8 width, like the
contiguous kernel.

Round-4 tiling — ROW BATCHING (VERDICT r3 item 4): the round-2 grid
``(B, n_virt)`` streamed ONE ~1MB page and ran one small per-(row, head)
MXU matmul per step (measured 1,175 tok/s vs the contiguous kernel's
2,968 on the d64 engine workload); the round-3 retile batched ``npp``
consecutive pages per step but kept ONE batch row per step and measured
no better (1,181 tok/s, BENCH_DETAIL_paged_r3.json) — at engine
workloads ``n_virt`` is small (~2-3 pages of 256 positions at p2048), so
per-slot page grouping had nothing to group. What the contiguous kernel
has and this one lacked is **batch tiling**: its grid carries a tile of
batch rows per step so the DMA streams several rows' K tiles at once and
the dot is batched over (row, head). Pages of different slots cannot
share a BlockSpec (each needs its own page-table lookup), but one grid
step CAN carry ``nbt x npp`` page operands — ``npp`` consecutive virtual
pages for each of ``nbt`` slot rows, index maps
``pt[bq*nbt + i, ig*npp + j]``. The kernel stacks the page tiles in VMEM
to ``[nbt, H, npp*ps, D]`` and issues ONE dot_general batched over
(slot, head) — per-step DMA and MXU work grow ``nbt*npp``-fold. The
(nbt, npp) tile is chosen like the contiguous kernel's K tile: the
largest product whose double-buffered working set fits scoped VMEM
(npp preferred on ties — fewer online-softmax group passes).

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


def _paged_kernel(H: int, Sp: int, ps: int, nbt: int, npp: int, scale: float,
                  fresh: bool = False):
    """One grid step = ``nbt`` slot rows x ``npp`` consecutive virtual
    pages each: stack the page tiles in VMEM, one (slot, head)-batched QK
    dot over the merged ``npp*ps`` key dim, online softmax across page
    groups. With ``fresh``, the current decode step's just-quantized K/V
    (not yet written to the pool — see the deferred-write note below)
    joins the softmax as one extra online group on the last page group."""
    bk = npp * ps

    def kernel(l_ref, pt_ref, q_idx_ref, kv_idx_ref, kv_valid_ref, q_ref,
               *rest):
        del l_ref, pt_ref                  # consumed by the index maps
        np_ops = nbt * npp
        if fresh:
            kf_ref, vf_ref = rest[:2]      # dequantized f32 [nbt, H, D]
            rest = rest[2:]
        k_refs = rest[0:np_ops]
        ks_refs = rest[np_ops:2 * np_ops]
        v_refs = rest[2 * np_ops:3 * np_ops]
        vs_refs = rest[3 * np_ops:4 * np_ops]
        o_ref, acc_ref, m_ref, l_sum_ref = rest[4 * np_ops:]
        ig = pl.program_id(1)
        multi = pl.num_programs(1) > 1

        cdt = q_ref.dtype
        # Mosaic's tpu.matmul supports at most ONE batch dim: fuse
        # (slot-in-tile, head) into a single leading batch axis R = nbt*H
        R = nbt * H
        q = q_ref[:].reshape(R, Sp, -1)                        # [R,Sp,D]

        def row(refs, i, axis):
            tiles = [refs[i * npp + j][0, 0] for j in range(npp)]
            return tiles[0] if npp == 1 else jnp.concatenate(tiles, axis)

        def gather(refs, axis, tail):
            rows = [row(refs, i, axis) for i in range(nbt)]
            x = rows[0][None] if nbt == 1 else jnp.stack(rows)
            return x.reshape((R,) + tail)

        k = gather(k_refs, 1, (bk, -1)).astype(cdt)            # [R,bk,D]
        v = gather(v_refs, 1, (bk, -1)).astype(cdt)
        ks = gather(ks_refs, 2, (1, bk))                       # [R,1,bk]
        vsc = gather(vs_refs, 2, (1, bk))
        s = jax.lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)
        s = s * (ks * scale)                                   # [R,Sp,bk]

        ki = kv_idx_ref[0, 0]                                  # [bk]
        qi = q_idx_ref[:].reshape(nbt, 1, Sp, 1)
        valid = kv_valid_ref[:].reshape(nbt, 1, 1, bk)
        ok = (ki.reshape(1, 1, 1, bk) <= qi) & (valid != 0)
        ok = jnp.broadcast_to(ok, (nbt, H, Sp, bk)).reshape(R, Sp, bk)
        s = jnp.where(ok, s, _NEG)

        m_new = jnp.max(s, axis=2, keepdims=True)              # [R,Sp,1]
        p = jnp.exp(s - m_new)
        l_new = jnp.sum(p, axis=2, keepdims=True)
        p = p * vsc
        a_new = jax.lax.dot_general(p.astype(cdt), v,
                                    (((2,), (1,)), ((0,), (0,))),
                                    preferred_element_type=jnp.float32)

        if fresh:
            # The current token's K/V as one extra online-softmax group,
            # folded into the LAST page group's partials before the merge.
            # The pool is masked at ki == qi (the caller passes q_idx - 1),
            # so this term is the only self-attention contribution.
            last = (ig == pl.num_programs(1) - 1) if multi else True
            kf = kf_ref[:].reshape(R, 1, -1)                   # f32, dequant
            qf = q.astype(jnp.float32)
            s_f = jnp.sum(qf * kf, axis=2, keepdims=True) * scale  # [R,Sp,1]
            s_f = jnp.where(last, s_f, _NEG)
            m2 = jnp.maximum(m_new, s_f)
            corr = jnp.exp(m_new - m2)
            # gate explicitly rather than relying on exp(_NEG - m2) -> 0:
            # for a fully-masked non-last group m_new == s_f == _NEG and
            # the ratio would be exp(0) = 1, injecting a spurious vf term
            # (harmless only because the finite _NEG cancels in the
            # cross-group merge; an -inf sentinel would NaN)
            pf = jnp.where(last, jnp.exp(s_f - m2), 0.0)
            vf = vf_ref[:].reshape(R, 1, -1)
            l_new = l_new * corr + pf
            a_new = a_new * corr + pf * vf
            m_new = m2

        if multi:
            @pl.when(ig == 0)
            def _():
                acc_ref[:] = jnp.zeros_like(acc_ref)
                m_ref[:] = jnp.full_like(m_ref, _NEG)
                l_sum_ref[:] = jnp.zeros_like(l_sum_ref)

            m2, l2 = m_new.reshape(R * Sp, 1), l_new.reshape(R * Sp, 1)
            a2 = a_new.reshape(R * Sp, -1)
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


def _pick_tiles(B: int, n_virt: int, H: int, ps: int, D: int,
                Sp: int) -> tuple:
    """(nbt, npp): largest ``nbt*npp`` page-operand tile (divisors of B /
    n_virt) whose per-step working set (K+V int8 pages + f32 scales,
    double-buffered, lane-padded D) fits scoped VMEM; npp wins ties
    (fewer online-softmax group passes). ``BT_PAGED_NBT`` /
    ``BT_PAGED_NPP`` override (racing/tests)."""
    import os
    Dp = -(-D // 128) * 128

    def step_bytes(nbt, npp):
        kv = 2 * nbt * npp * H * ps * Dp    # int8 K+V
        sc = 2 * nbt * npp * H * ps * 4     # f32 scales
        qo = 2 * nbt * H * Sp * Dp * 2
        valid = nbt * (2 * npp * ps * 4 + Sp * 4)
        # deferred-write fresh K/V operands (f32 [nbt, H, D] x2); counted
        # unconditionally so the tile choice is safe whether or not the
        # caller passes ``fresh`` (ADVICE r4: a tile picked at the VMEM
        # limit without these could exceed scoped VMEM when fresh is on)
        fresh_ops = 2 * nbt * H * Dp * 4
        scratch = nbt * H * Sp * (Dp + 2) * 4
        return 2 * (kv + sc + qo + valid + fresh_ops) + scratch

    f_nbt, f_npp = os.environ.get("BT_PAGED_NBT"), os.environ.get(
        "BT_PAGED_NPP")
    if f_nbt or f_npp:
        nbt = int(f_nbt) if f_nbt else 1
        npp = int(f_npp) if f_npp else 1
        assert B % nbt == 0 and n_virt % npp == 0, (B, nbt, n_virt, npp)
        return nbt, npp

    nbts = [d for d in range(1, B + 1) if B % d == 0]
    npps = [d for d in range(1, n_virt + 1) if n_virt % d == 0]
    best = (1, 1)
    for nbt in nbts:
        for npp in npps:
            if nbt * npp > 64:              # DMA-queue sanity cap
                continue
            if step_bytes(nbt, npp) > _vmem_limit():
                continue
            if (nbt * npp, npp) > (best[0] * best[1], best[1]):
                best = (nbt, npp)
    return best


@functools.partial(jax.jit, static_argnames=("interpret", "nbt", "npp"))
def _paged_attn(q, k_q, k_s, v_q, v_s, layer, page_table, q_idx, kv_idx,
                kv_valid, fresh=None, *, nbt: int, npp: int,
                interpret: bool):
    """q [B, H, S, D]; k_q/v_q int8 [L, P, H, ps, D]; k_s/v_s f32
    [L, P, H, ps]; page_table int32 [B, n_virt]; mask arrays at virtual
    positions ([B, n_virt*ps] / [n_virt*ps]); fresh (optional): the
    current step's not-yet-written (kq [B,H,D] int8, ks [B,H] f32,
    vq, vs) quadruple, merged in-kernel as an extra softmax group."""
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
    # operand quadruple per (slot-in-tile i, page-in-group j).
    def kv_spec(i, j):
        return pl.BlockSpec(
            (1, 1, H, ps, D),
            lambda bq, ig, l, pt, i=i, j=j: (l[0],
                                             pt[bq * nbt + i, ig * npp + j],
                                             0, 0, 0),
            memory_space=pltpu.VMEM)

    def sc_spec(i, j):
        return pl.BlockSpec(
            (1, 1, H, 1, ps),
            lambda bq, ig, l, pt, i=i, j=j: (l[0],
                                             pt[bq * nbt + i, ig * npp + j],
                                             0, 0, 0),
            memory_space=pltpu.VMEM)

    pairs = [(i, j) for i in range(nbt) for j in range(npp)]
    in_specs = [
        pl.BlockSpec((nbt, 1, Sp), lambda bq, ig, l, pt: (bq, 0, 0),
                     memory_space=pltpu.VMEM),            # q_idx
        pl.BlockSpec((1, 1, bk), lambda bq, ig, l, pt: (0, 0, ig),
                     memory_space=pltpu.VMEM),            # kv_idx (virtual)
        pl.BlockSpec((nbt, 1, bk), lambda bq, ig, l, pt: (bq, 0, ig),
                     memory_space=pltpu.VMEM),            # kv_valid (virtual)
        pl.BlockSpec((nbt, H, Sp, D), lambda bq, ig, l, pt: (bq, 0, 0, 0),
                     memory_space=pltpu.VMEM),            # q
    ]
    args = [jnp.asarray(layer, jnp.int32).reshape(1),
            page_table.astype(jnp.int32),
            q_idx[:, None, :], kv_idx[None, None, :], kv_valid[:, None, :],
            q]
    if fresh is not None:
        # fresh K/V arrive DEQUANTIZED (f32 [B, H, D]): applying the
        # per-(row, head) scale in-kernel needs a lane->sublane relayout
        # of the [B, H] scale block that Mosaic cannot shape-cast; the
        # dequant is one tiny XLA elementwise outside instead.
        kf, vf = fresh
        in_specs += [
            pl.BlockSpec((nbt, H, D), lambda bq, ig, l, pt: (bq, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nbt, H, D), lambda bq, ig, l, pt: (bq, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
        args += [kf.astype(jnp.float32), vf.astype(jnp.float32)]
    in_specs += [kv_spec(i, j) for (i, j) in pairs]
    in_specs += [sc_spec(i, j) for (i, j) in pairs]
    in_specs += [kv_spec(i, j) for (i, j) in pairs]
    in_specs += [sc_spec(i, j) for (i, j) in pairs]
    n_ops = len(pairs)
    args += [k_q] * n_ops + [k_s[:, :, :, None, :]] * n_ops
    args += [v_q] * n_ops + [v_s[:, :, :, None, :]] * n_ops

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B // nbt, n_virt // npp),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((nbt, H, Sp, D),
                               lambda bq, ig, l, pt: (bq, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((nbt * H * Sp, D), jnp.float32),
            pltpu.VMEM((nbt * H * Sp, 1), jnp.float32),
            pltpu.VMEM((nbt * H * Sp, 1), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        _paged_kernel(H, Sp, ps, nbt, npp, scale, fresh=fresh is not None),
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
                                fresh=None, interpret: bool = False):
    """Fused int8 decode attention over a paged pool.

    q [B, H, S, D] (S <= 8); pool k_q/v_q int8 [L, n_pages, H, page, D]
    with f32 scales [L, n_pages, H, page]; page_table [B, n_virt] maps each
    slot's virtual page index to a pool page (unallocated tail -> page 0
    with kv_valid 0); mask: AttnMask over the virtual positions
    [B, n_virt*page]. ``fresh`` (deferred-write decode, S == 1): the
    current step's not-yet-written K/V as a DEQUANTIZED (k [B,H,D],
    v [B,H,D]) pair (dequantized so quantization error matches what a
    pool read would see) — the kernel merges it as one extra softmax
    group and the caller MUST pass ``mask.q_idx - 1`` so the stale pool
    slot at the write frontier is masked. Returns [B, H, S, D] in
    q.dtype.
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
    nbt, npp = _pick_tiles(B, n_virt, H, ps, D, max(8, _cdiv(S, 8) * 8))
    if fresh is not None:
        # the kernel applies the single fresh token's score to every query
        # row, which is only correct for the S == 1 decode step
        assert S == 1, f"fresh requires S == 1, got S={S}"
        fresh = tuple(fresh)
    return _paged_attn(q, k_q, k_s.astype(jnp.float32), v_q,
                       v_s.astype(jnp.float32), layer, page_table,
                       q_idx.astype(jnp.int32), mask.kv_idx.astype(jnp.int32),
                       kv_valid.astype(jnp.int32), fresh, nbt=nbt, npp=npp,
                       interpret=interpret)


# ---------------------------------------------------------------------------
# Paged WRITE scatter (round 4)
# ---------------------------------------------------------------------------
#
# The round-4 probe (BENCH_DETAIL_paged_nowrite.json vs _paged_r4b) showed
# the read kernel + page indirection cost ~1% vs the contiguous engine —
# while the XLA advanced-index scatter that WRITES each decode step's K/V
# into the pool cost the other ~60% (1,174 vs 2,936 tok/s at d64): XLA
# lowers the gather-indexed scatter into a serialized per-row loop. The
# fix is the same trick as the read path: resolve (page, offset) in the
# pallas_call index maps (scalar prefetch) and let the DMA engine place
# each row's K/V tile directly, with the pool aliased in place
# (input_output_aliases), so untouched pages are never copied.
#
# Mosaic requires the last two block dims to be 8/128-divisible (or the
# full array dim), so a width-1 position store is not expressible; both
# layouts are small read-modify-writes instead:
#   values [L, P, H, ps, D]: RMW a (1, 1, H, _VSUB, D) sub-tile at
#     (layer, page[b], 0, off[b] // _VSUB, 0), blending the new position
#     at off[b] % _VSUB with an iota mask (32 sublanes = the int8 tile);
#   scales [L, P, H, ps]: off indexes the LANE dim — RMW a
#     (1, 1, H, _SSUB) lane block at off[b] // _SSUB, blend at
#     off[b] % _SSUB.
# Per step that moves ~2 x (H*_VSUB*D + H*_SSUB*4) bytes per K/V pair —
# ~6% of what decode attention already reads per step, vs the whole-page
# RMW alternative which would have doubled the paged decode's traffic.
#
# Constraint: one position per slot per call (S == 1, the decode-window
# step). With S > 1 a slot writes the same page sub-tile twice in one
# launch and the RMW's pipelined input DMA could read a stale block —
# callers keep the XLA scatter for multi-position (prefill-style)
# writes. Dead slots all point at null page 0; their RMW collision only
# corrupts page 0, which every read masks out.

_VSUB = 32     # value sub-tile sublanes (int8 tile height)
_SSUB = 128    # scale sub-block lanes


def _paged_write_kernel(H, ps, D):
    def kernel(layer_ref, page_ref, off_ref,
               kq_ref, ks_ref, vq_ref, vs_ref,
               kin_ref, ksin_ref, vin_ref, vsin_ref,
               ko_ref, kso_ref, vo_ref, vso_ref):
        del layer_ref, page_ref
        b = pl.program_id(0)
        off = off_ref[b, 0]
        vsub = min(_VSUB, ps)
        ssub = min(_SSUB, ps)
        pos = jax.lax.broadcasted_iota(jnp.int32, (1, 1, H, vsub, 1), 3)
        mv = pos == off % vsub
        ko_ref[...] = jnp.where(mv, kq_ref[...].reshape(1, 1, H, 1, D),
                                kin_ref[...])
        vo_ref[...] = jnp.where(mv, vq_ref[...].reshape(1, 1, H, 1, D),
                                vin_ref[...])
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, H, ssub), 3)
        ms = lane == off % ssub
        kso_ref[...] = jnp.where(ms, ks_ref[...].reshape(1, 1, H, 1),
                                 ksin_ref[...])
        vso_ref[...] = jnp.where(ms, vs_ref[...].reshape(1, 1, H, 1),
                                 vsin_ref[...])

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret",))
def paged_write_int8(k_pool, ks_pool, v_pool, vs_pool, layer, page, off,
                     kq, ks, vq, vs, *, interpret: bool = False):
    """Scatter one decode step's quantized K/V into the paged pool, in
    place.

    k_pool/v_pool int8 [L, P, H, ps, D]; ks_pool/vs_pool f32
    [L, P, H, ps]; layer scalar int32; page/off int32 [B] (each slot's
    target page and in-page offset); kq/vq int8 [B, H, D]; ks/vs f32
    [B, H]. Returns the four updated pools (aliased — zero-copy for
    untouched pages).
    """
    L, P, H, ps, D = k_pool.shape
    B = page.shape[0]

    def kv_new_spec():
        return pl.BlockSpec((1, 1, H, D),
                            lambda b, l, pg, of: (b, 0, 0, 0),
                            memory_space=pltpu.VMEM)

    def sc_new_spec():
        return pl.BlockSpec((1, 1, H),
                            lambda b, l, pg, of: (b, 0, 0),
                            memory_space=pltpu.VMEM)

    vsub = min(_VSUB, ps)
    ssub = min(_SSUB, ps)
    assert ps % vsub == 0 and ps % ssub == 0, (ps, vsub, ssub)

    def pool_val_spec():
        return pl.BlockSpec((1, 1, H, vsub, D),
                            lambda b, l, pg, of: (l[0], pg[b, 0], 0,
                                                  of[b, 0] // vsub, 0),
                            memory_space=pltpu.VMEM)

    def pool_sc_spec():
        return pl.BlockSpec((1, 1, H, ssub),
                            lambda b, l, pg, of: (l[0], pg[b, 0], 0,
                                                  of[b, 0] // ssub),
                            memory_space=pltpu.VMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(B,),
        in_specs=[kv_new_spec(), sc_new_spec(), kv_new_spec(), sc_new_spec(),
                  pool_val_spec(), pool_sc_spec(),
                  pool_val_spec(), pool_sc_spec()],
        out_specs=[pool_val_spec(), pool_sc_spec(),
                   pool_val_spec(), pool_sc_spec()],
    )
    outs = pl.pallas_call(
        _paged_write_kernel(H, ps, D),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(k_pool.shape, k_pool.dtype),
            jax.ShapeDtypeStruct(ks_pool.shape, ks_pool.dtype),
            jax.ShapeDtypeStruct(v_pool.shape, v_pool.dtype),
            jax.ShapeDtypeStruct(vs_pool.shape, vs_pool.dtype),
        ],
        # flattened input order: layer(0) page(1) off(2) kq(3) ks(4) vq(5)
        # vs(6) k_pool(7) ks_pool(8) v_pool(9) vs_pool(10)
        input_output_aliases={7: 0, 8: 1, 9: 2, 10: 3},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(jnp.asarray(layer, jnp.int32).reshape(1),
      page.astype(jnp.int32).reshape(B, 1),
      off.astype(jnp.int32).reshape(B, 1),
      kq[:, None], ks[:, None], vq[:, None], vs[:, None],
      k_pool, ks_pool, v_pool, vs_pool)
    return outs


def _paged_write_layers_kernel(H, ps, D, lt):
    def kernel(page_ref, off_ref,
               kq_ref, ks_ref, vq_ref, vs_ref,
               kin_ref, ksin_ref, vin_ref, vsin_ref,
               ko_ref, kso_ref, vo_ref, vso_ref):
        del page_ref
        b = pl.program_id(0)
        off = off_ref[b, 0]
        vsub = min(_VSUB, ps)
        ssub = min(_SSUB, ps)
        pos = jax.lax.broadcasted_iota(jnp.int32, (lt, 1, H, vsub, 1), 3)
        mv = pos == off % vsub
        ko_ref[...] = jnp.where(mv, kq_ref[...].reshape(lt, 1, H, 1, D),
                                kin_ref[...])
        vo_ref[...] = jnp.where(mv, vq_ref[...].reshape(lt, 1, H, 1, D),
                                vin_ref[...])
        lane = jax.lax.broadcasted_iota(jnp.int32, (lt, 1, H, ssub), 3)
        ms = lane == off % ssub
        kso_ref[...] = jnp.where(ms, ks_ref[...].reshape(lt, 1, H, 1),
                                 ksin_ref[...])
        vso_ref[...] = jnp.where(ms, vs_ref[...].reshape(lt, 1, H, 1),
                                 vsin_ref[...])

    return kernel


def _pick_layer_tile(L: int, H: int, ps: int, D: int) -> int:
    """Largest divisor ``lt`` of L whose double-buffered in+out write
    working set (K+V int8 sub-tiles + f32 scale blocks, x2 for the RMW's
    input copy) fits scoped VMEM."""
    vsub = min(_VSUB, ps)
    ssub = min(_SSUB, ps)
    Dp = -(-D // 128) * 128

    def bytes_for(lt):
        val = lt * H * vsub * Dp            # one int8 K or V block
        sc = lt * H * ssub * 4
        new = lt * H * Dp + lt * H * 4
        # K+V, in+out, double-buffered, plus the new-value operands
        return 2 * (2 * 2 * (val + sc) + 2 * new)

    for lt in sorted((d for d in range(1, L + 1) if L % d == 0),
                     reverse=True):
        if bytes_for(lt) <= _vmem_limit():
            return lt
    return 1


@functools.partial(jax.jit, static_argnames=("interpret",))
def paged_write_layers_int8(k_pool, ks_pool, v_pool, vs_pool, page, off,
                            kq, ks, vq, vs, *, interpret: bool = False):
    """Scatter one decode step's quantized K/V for ALL layers into the
    paged pool, in place.

    Same RMW blend as :func:`paged_write_int8`, but batched over the
    layer dim: every layer of a slot shares the same (page, off) target
    (the page table has no layer axis), so one grid step can move an
    ``lt``-layer block instead of a single layer's. The per-layer kernel
    inside the decode ``lax.scan`` issued ``L x B`` tiny (~H*32*D-byte)
    latency-bound DMAs per token step; called once after the scan with
    the layers stacked, this kernel issues ``(L/lt) x B`` DMAs each
    ``lt``-fold larger — same traffic, bandwidth-bound instead of
    latency-bound (the deferred-write design note in models/neox.py).

    kq/vq int8 [L, B, H, D]; ks/vs f32 [L, B, H]; page/off int32 [B].
    Returns the four pools (aliased in place).
    """
    L, P, H, ps, D = k_pool.shape
    Lk, B, Hk, Dk = kq.shape
    assert (Lk, Hk, Dk) == (L, H, D), (kq.shape, k_pool.shape)
    lt = _pick_layer_tile(L, H, ps, D)

    def kv_new_spec():
        return pl.BlockSpec((lt, 1, H, D),
                            lambda b, li, pg, of: (li, b, 0, 0),
                            memory_space=pltpu.VMEM)

    def sc_new_spec():
        # [L, B, 1, H]: trailing block dims (1, H) are full array dims
        # (Mosaic's 8/128 block-divisibility rule)
        return pl.BlockSpec((lt, 1, 1, H),
                            lambda b, li, pg, of: (li, b, 0, 0),
                            memory_space=pltpu.VMEM)

    vsub = min(_VSUB, ps)
    ssub = min(_SSUB, ps)
    assert ps % vsub == 0 and ps % ssub == 0, (ps, vsub, ssub)

    def pool_val_spec():
        return pl.BlockSpec((lt, 1, H, vsub, D),
                            lambda b, li, pg, of: (li, pg[b, 0], 0,
                                                   of[b, 0] // vsub, 0),
                            memory_space=pltpu.VMEM)

    def pool_sc_spec():
        return pl.BlockSpec((lt, 1, H, ssub),
                            lambda b, li, pg, of: (li, pg[b, 0], 0,
                                                   of[b, 0] // ssub),
                            memory_space=pltpu.VMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, L // lt),
        in_specs=[kv_new_spec(), sc_new_spec(), kv_new_spec(), sc_new_spec(),
                  pool_val_spec(), pool_sc_spec(),
                  pool_val_spec(), pool_sc_spec()],
        out_specs=[pool_val_spec(), pool_sc_spec(),
                   pool_val_spec(), pool_sc_spec()],
    )
    outs = pl.pallas_call(
        _paged_write_layers_kernel(H, ps, D, lt),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(k_pool.shape, k_pool.dtype),
            jax.ShapeDtypeStruct(ks_pool.shape, ks_pool.dtype),
            jax.ShapeDtypeStruct(v_pool.shape, v_pool.dtype),
            jax.ShapeDtypeStruct(vs_pool.shape, vs_pool.dtype),
        ],
        # flattened input order: page(0) off(1) kq(2) ks(3) vq(4) vs(5)
        # k_pool(6) ks_pool(7) v_pool(8) vs_pool(9)
        input_output_aliases={6: 0, 7: 1, 8: 2, 9: 3},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(page.astype(jnp.int32).reshape(B, 1),
      off.astype(jnp.int32).reshape(B, 1),
      kq, ks.astype(jnp.float32)[:, :, None], vq,
      vs.astype(jnp.float32)[:, :, None],
      k_pool, ks_pool, v_pool, vs_pool)
    return outs


def _page_copy_kernel(H, ps, D):
    def kernel(pt_ref, kr_ref, ksr_ref, vr_ref, vsr_ref,
               kin_ref, ksin_ref, vin_ref, vsin_ref,
               ko_ref, kso_ref, vo_ref, vso_ref):
        del pt_ref, kin_ref, ksin_ref, vin_ref, vsin_ref
        ko_ref[...] = kr_ref[...]
        vo_ref[...] = vr_ref[...]
        kso_ref[...] = ksr_ref[...]
        vso_ref[...] = vsr_ref[...]

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret",))
def paged_page_copy_int8(k_pool, ks_pool, v_pool, vs_pool, pt_rows,
                         row_k, row_ks, row_v, row_vs, *,
                         interpret: bool = False):
    """Admission-prefill page placement: copy G freshly-prefilled rows'
    K/V into their allocated pool pages, page-granularly, in place.

    k_pool/v_pool int8 [L, P, H, ps, D] (+ f32 scale pools [L, P, H, ps]);
    pt_rows int32 [G, nv] — each admitted row's pool page per virtual
    page (unallocated tails -> null page 0, whose contents are masked);
    row_k/row_v int8 [L, G, H, nv*ps, D] (+ scales [L, G, H, nv*ps])
    from the standalone admission mini-cache. Write-only full-page
    blocks — no read-modify-write, so pages may be written launch-wide
    in any order (page-0 collisions are masked anyway). Replaces an XLA
    gather-indexed scatter that serialized per page (the decode-write
    analysis of BENCH_DETAIL_paged_nowrite.json applies here too: the
    paged engine's admit time measured 0.29 s vs 0.13 s contiguous).
    """
    L, P, H, ps, D = k_pool.shape
    G, nv = pt_rows.shape

    def row_val_spec():
        return pl.BlockSpec((1, 1, H, ps, D),
                            lambda l, g, j, pt: (l, g, 0, j, 0),
                            memory_space=pltpu.VMEM)

    def row_sc_spec():
        return pl.BlockSpec((1, 1, H, ps),
                            lambda l, g, j, pt: (l, g, 0, j),
                            memory_space=pltpu.VMEM)

    def pool_val_spec():
        return pl.BlockSpec((1, 1, H, ps, D),
                            lambda l, g, j, pt: (l, pt[g, j], 0, 0, 0),
                            memory_space=pltpu.VMEM)

    def pool_sc_spec():
        return pl.BlockSpec((1, 1, H, ps),
                            lambda l, g, j, pt: (l, pt[g, j], 0, 0),
                            memory_space=pltpu.VMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(L, G, nv),
        in_specs=[row_val_spec(), row_sc_spec(), row_val_spec(),
                  row_sc_spec(),
                  pool_val_spec(), pool_sc_spec(),
                  pool_val_spec(), pool_sc_spec()],
        out_specs=[pool_val_spec(), pool_sc_spec(),
                   pool_val_spec(), pool_sc_spec()],
    )
    outs = pl.pallas_call(
        _page_copy_kernel(H, ps, D),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(k_pool.shape, k_pool.dtype),
            jax.ShapeDtypeStruct(ks_pool.shape, ks_pool.dtype),
            jax.ShapeDtypeStruct(v_pool.shape, v_pool.dtype),
            jax.ShapeDtypeStruct(vs_pool.shape, vs_pool.dtype),
        ],
        # flattened inputs: pt(0) row_k(1) row_ks(2) row_v(3) row_vs(4)
        # k_pool(5) ks_pool(6) v_pool(7) vs_pool(8)
        input_output_aliases={5: 0, 6: 1, 7: 2, 8: 3},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary")),
        interpret=interpret,
    )(pt_rows.astype(jnp.int32), row_k, row_ks, row_v, row_vs,
      k_pool, ks_pool, v_pool, vs_pool)
    return outs
