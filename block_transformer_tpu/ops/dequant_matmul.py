"""Pallas TPU kernels: fused INT8 / INT4 weight dequant + matmul.

``out[M, N] = (x[M, K] @ dequant(w_q)[K, N]) * scale[N]``

The dequant never materializes in HBM: quantized weight tiles stream into
VMEM (half / quarter the bytes of bf16 — weight loading is the decode
bottleneck), are widened in-register, hit the MXU, and the per-channel
scale is applied once to the fp32 accumulator on the final K step. This is
the TPU-native replacement for the reference's cuBLAS matmuls
(SURVEY.md §2.9) at the BASELINE.json operating point.

Two call forms per precision:

- ``int{8,4}_matmul(x, w_q, scale)`` — single weight matrix.
- ``int{8,4}_matmul_stacked(x, w_q, scale, layer)`` — **stacked** form for
  layer-scanned stacks: ``w_q`` is the whole ``[L, K, N]`` parameter array
  and ``layer`` a traced scalar. The layer is selected *inside the kernel's
  index map* via scalar prefetch, so XLA passes the full stacked buffer by
  pointer — no per-layer slice of the weights is ever materialized. (A
  ``pallas_call`` operand that is itself a ``dynamic_slice`` forces XLA to
  materialize the slice — for a 1.2B decode step that copy was ~50 MB per
  layer and made the round-1 kernel 2x slower than XLA's fused
  convert+dot. The stacked form is why the kernels can win.)

INT4 uses split-half packing (ops/quant.py): byte-plane row ``i`` holds
original rows ``i`` (low nibble) and ``i + K/2`` (high nibble), so the
kernel computes ``x_lo @ sext(w << 28 >> 28) + x_hi @ sext(w << 24 >> 28)``
with two disjoint K-slices of x — no sublane interleave anywhere.

Grid is (M/bm, N/bn, K/bk) with K innermost; an fp32 VMEM scratch
accumulates across K steps (revisited output pattern).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _cdiv(a, b):
    return -(-a // b)


def _round_up(x, m):
    return _cdiv(x, m) * m


def _snap_tile(want: int, dim: int, unit: int = 128) -> int:
    """Largest lane-aligned tile <= want that divides dim (dim must be a
    multiple of ``unit``; weights can't be padded in the stacked form)."""
    assert dim % unit == 0, (dim, unit)
    t = min(want, dim)
    t = (t // unit) * unit
    while dim % t:
        t -= unit
    return t


# ---------------------------------------------------------------------------
# INT8
# ---------------------------------------------------------------------------

def _int8_kernel(l_ref, x_ref, w_ref, scale_ref, o_ref, acc_ref):
    del l_ref                      # consumed by the index maps
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jnp.dot(x_ref[:], w_ref[0].astype(x_ref.dtype),
                          preferred_element_type=jnp.float32)

    @pl.when(k == pl.num_programs(2) - 1)
    def _():
        o_ref[:] = (acc_ref[:] * scale_ref[0].astype(jnp.float32)
                    ).astype(o_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("bm", "bn", "bk", "interpret"))
def int8_matmul_stacked(x, w_q, scale, layer, *, bm: int = 256,
                        bn: int = 512, bk: int = 512,
                        interpret: bool = False):
    """x [M, K]; w_q int8 [L, K, N]; scale f32 [L, N]; layer scalar int32."""
    M, K = x.shape
    L, K2, N = w_q.shape
    assert K == K2 and scale.shape == (L, N), (x.shape, w_q.shape, scale.shape)

    bm = min(bm, _round_up(M, 8))
    bn = _snap_tile(bn, N)
    bk = _snap_tile(bk, K)
    Mp = _round_up(M, bm)
    if Mp != M:
        x = jnp.pad(x, ((0, Mp - M), (0, 0)))

    grid = (Mp // bm, N // bn, K // bk)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, k, l: (i, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, bn), lambda i, j, k, l: (l[0], k, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bn), lambda i, j, k, l: (l[0], 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, k, l: (i, j),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
    )
    out = pl.pallas_call(
        _int8_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Mp, N), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * N * K,
            bytes_accessed=Mp * K * x.dtype.itemsize + K * N + Mp * N * 2,
            transcendentals=0),
        interpret=interpret,
    )(jnp.asarray(layer, jnp.int32).reshape(1),
      x, w_q, scale.reshape(L, 1, N))
    return out[:M, :N]


def int8_matmul(x, w_q, scale, *, bm: int = 256, bn: int = 512,
                bk: int = 512, interpret: bool = False):
    """x [M, K] (bf16/fp32); w_q [K, N] int8; scale [N] fp32 -> [M, N]."""
    K, N = w_q.shape
    # pad to lane/tile multiples for the stacked form's no-pad requirement
    Kp, Np = _round_up(K, 128), _round_up(N, 128)
    if (Kp, Np) != (K, N):
        w_q = jnp.pad(w_q, ((0, Kp - K), (0, Np - N)))
        scale = jnp.pad(scale, (0, Np - N))
        x = jnp.pad(x, ((0, 0), (0, Kp - K)))
    out = int8_matmul_stacked(x, w_q[None], scale[None], 0, bm=bm, bn=bn,
                              bk=bk, interpret=interpret)
    return out[:, :N]


# ---------------------------------------------------------------------------
# INT4 (split-half packed)
# ---------------------------------------------------------------------------

def _int4_kernel(l_ref, x_lo_ref, x_hi_ref, w_ref, s_lo_ref, s_hi_ref,
                 o_ref, acc_ref):
    del l_ref                      # consumed by the index maps
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    u = w_ref[0].astype(jnp.int32)
    w_lo = ((u << 28) >> 28).astype(x_lo_ref.dtype)   # rows [0, K/2)
    w_hi = ((u << 24) >> 28).astype(x_lo_ref.dtype)   # rows [K/2, K)
    # Each K tile lies inside a single scale group per nibble plane
    # (enforced by the bk | gs snap below), so the group scale multiplies
    # the tile's integer partial product exactly.
    acc_ref[:] += (jnp.dot(x_lo_ref[:], w_lo,
                           preferred_element_type=jnp.float32)
                   * s_lo_ref[0, 0].astype(jnp.float32))
    acc_ref[:] += (jnp.dot(x_hi_ref[:], w_hi,
                           preferred_element_type=jnp.float32)
                   * s_hi_ref[0, 0].astype(jnp.float32))

    @pl.when(k == pl.num_programs(2) - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("bm", "bn", "bk", "interpret"))
def int4_matmul_stacked(x, w_p, scale, layer, *, bm: int = 256,
                        bn: int = 512, bk: int = 512,
                        interpret: bool = False):
    """x [M, K]; w_p int8 [L, K/2, N] split-half packed;
    scale f32 [L, G, N] group-wise (or legacy [L, N] per-channel = G 1).

    Group ``g`` covers unpacked input rows [g*gs, (g+1)*gs), gs = K/G; gs
    must divide K/2 so the nibble planes don't straddle groups
    (ops/quant.quantize_int4 guarantees this). ``bk`` is the *packed-row*
    tile (covers bk unpacked rows in each plane) and is snapped so every
    tile sits inside one group — the kernel then scales each tile's
    partial product, which is exact.
    """
    M, K = x.shape
    L, Kh, N = w_p.shape
    if scale.ndim == 2:
        scale = scale.reshape(L, 1, N)
    G = scale.shape[1]
    assert K == 2 * Kh and scale.shape == (L, G, N) and K % G == 0
    gs = K // G
    assert G == 1 or Kh % gs == 0, (K, G, "groups straddle the split half")

    bm = min(bm, _round_up(M, 8))
    bn = _snap_tile(bn, N)
    bk = _snap_tile(bk, Kh)
    if G > 1:
        bk = min(bk, _snap_tile(gs, Kh))
        while gs % bk:
            bk -= 128
    Mp = _round_up(M, bm)
    if Mp != M:
        x = jnp.pad(x, ((0, Mp - M), (0, 0)))

    nkb = Kh // bk
    grid = (Mp // bm, N // bn, nkb)
    # scales carry a singleton axis before N so the block's last-two dims
    # are (1, bn) — Mosaic requires dim -2 of a block to divide 8 or equal
    # the array dim, which a (1, 1, bn) block over [L, G>1, N] violates
    if G == 1:
        s_lo_map = s_hi_map = lambda i, j, k, l: (l[0], 0, 0, j)
    else:
        s_lo_map = lambda i, j, k, l: (l[0], (k * bk) // gs, 0, j)
        s_hi_map = lambda i, j, k, l: (l[0], (k * bk + Kh) // gs, 0, j)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            # low-nibble rows of x: columns [0, K/2)
            pl.BlockSpec((bm, bk), lambda i, j, k, l: (i, k),
                         memory_space=pltpu.VMEM),
            # high-nibble rows of x: columns [K/2, K) — same array, block
            # index offset by the number of packed-K blocks
            pl.BlockSpec((bm, bk),
                         lambda i, j, k, l, _nkb=nkb: (i, k + _nkb),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, bn), lambda i, j, k, l: (l[0], k, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, bn), s_lo_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, bn), s_hi_map, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, k, l: (i, j),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
    )
    out = pl.pallas_call(
        _int4_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Mp, N), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * N * K,
            bytes_accessed=Mp * K * x.dtype.itemsize + Kh * N + Mp * N * 2,
            transcendentals=0),
        interpret=interpret,
    )(jnp.asarray(layer, jnp.int32).reshape(1), x, x, w_p,
      scale[:, :, None, :], scale[:, :, None, :])
    return out[:M]


def int4_matmul(x, w_p, scale, *, bm: int = 256, bn: int = 512,
                bk: int = 512, interpret: bool = False):
    """x [M, K]; w_p [K/2, N] int8 split-half packed; scale [G, N] or [N]."""
    Kh, N = w_p.shape
    if scale.ndim == 1:
        scale = scale.reshape(1, N)
    Khp, Np = _round_up(Kh, 128), _round_up(N, 128)
    if (Khp, Np) != (Kh, N):
        if Khp != Kh and scale.shape[0] > 1:
            # padding packed rows would shift the group<->row mapping;
            # group-wise scales require lane-aligned K (model dims are)
            from block_transformer_tpu.ops import quant
            return jnp.dot(x, quant.dequantize_int4(w_p, scale, x.dtype),
                           preferred_element_type=x.dtype)
        # padding packed rows appends zero rows to BOTH nibble planes, i.e.
        # zero weight rows at [Kh, Khp) and [K/2 + Kh, ...): pad x columns
        # to match the padded split-half layout
        w_p = jnp.pad(w_p, ((0, Khp - Kh), (0, Np - N)))
        scale = jnp.pad(scale, ((0, 0), (0, Np - N)))
        x_lo, x_hi = x[:, :Kh], x[:, Kh:]
        pad = jnp.zeros((x.shape[0], Khp - Kh), x.dtype)
        x = jnp.concatenate([x_lo, pad, x_hi, pad], axis=1)
    out = int4_matmul_stacked(x, w_p[None], scale[None], 0, bm=bm, bn=bn,
                              bk=bk, interpret=interpret)
    return out[:, :N]
