"""Pallas TPU kernel: fused INT8 weight dequant + matmul.

``out[M, N] = (x[M, K] @ w_q[K, N].astype(bf16)) * scale[N]``

The dequant never materializes in HBM: int8 weight tiles stream into VMEM
(half the bytes of bf16 — weight-loading is the decode bottleneck), are
widened in-register, hit the MXU, and the per-channel scale is applied once
to the fp32 accumulator on the final K step. This is the TPU-native
replacement for the reference's cuBLAS matmuls (SURVEY.md §2.9) at the
BASELINE.json operating point (INT8 weights at speed-of-light).

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


def _kernel(x_ref, w_ref, scale_ref, o_ref, acc_ref):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jnp.dot(x_ref[:], w_ref[:].astype(x_ref.dtype),
                          preferred_element_type=jnp.float32)

    @pl.when(k == pl.num_programs(2) - 1)
    def _():
        o_ref[:] = (acc_ref[:] * scale_ref[:].astype(jnp.float32)
                    ).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("bm", "bn", "bk", "interpret"))
def int8_matmul(x, w_q, scale, *, bm: int = 256, bn: int = 256, bk: int = 512,
                interpret: bool = False):
    """x [M, K] (bf16/fp32); w_q [K, N] int8; scale [N] fp32 -> [M, N]."""
    M, K = x.shape
    K2, N = w_q.shape
    assert K == K2 and scale.shape == (N,)

    bm = min(bm, _round_up(M, 8))
    bn = min(bn, _round_up(N, 128))
    bk = min(bk, _round_up(K, 128))
    Mp, Np, Kp = _round_up(M, bm), _round_up(N, bn), _round_up(K, bk)
    if (Mp, Kp) != (M, K):
        x = jnp.pad(x, ((0, Mp - M), (0, Kp - K)))
    if (Kp, Np) != (K, N):
        w_q = jnp.pad(w_q, ((0, Kp - K), (0, Np - N)))
    if Np != N:
        scale = jnp.pad(scale, (0, Np - N))

    grid = (Mp // bm, Np // bn, Kp // bk)
    out = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, k: (i, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bn), lambda i, j, k: (k, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j, k: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mp, Np), x.dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * Np * Kp,
            bytes_accessed=Mp * Kp * x.dtype.itemsize + Kp * Np + Mp * Np * 2,
            transcendentals=0),
        interpret=interpret,
    )(x, w_q, scale.reshape(1, -1))
    return out[:M, :N]
