"""Weight-only quantization: INT8 and INT4 with per-output-channel scales.

The BASELINE.json north star: every matmul weight (QKV/out/MLP/LM-head/
expansion/projection) stored quantized, dequant fused into the matmul
(ops/linear.py dispatches to the Pallas kernel on TPU). Symmetric
per-channel quantization:

    scale[n] = max(|W[:, n]|) / q_max;  W_q = round(W / scale)

INT4 packs two signed nibbles per int8 byte along the *input* (K) axis so
the unpack in the kernel is a cheap shift/mask on contiguous lanes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def quantize_int8(w: jax.Array):
    """w [K, N] float -> (w_q int8 [K, N], scale fp32 [N])."""
    a = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=0)
    scale = jnp.maximum(a, 1e-8) / 127.0
    w_q = jnp.clip(jnp.round(w.astype(jnp.float32) / scale), -127, 127)
    return w_q.astype(jnp.int8), scale.astype(jnp.float32)


def dequantize_int8(w_q, scale, dtype=jnp.bfloat16):
    return (w_q.astype(jnp.float32) * scale).astype(dtype)


def _int4_group_size(K: int, group_size) -> int:
    """Effective K-group size: must divide K/2 (split-half planes may not
    straddle a group) — otherwise collapse to per-channel (one group)."""
    if not group_size or group_size <= 0:
        return K
    half = K // 2
    if half % group_size == 0:
        return group_size
    return K


def quantize_int4(w: jax.Array, group_size: int = 128):
    """w [K, N] float -> (packed int8 [K/2, N], scale fp32 [G, N]).

    Values in [-7, 7] with symmetric **group-wise** scales: group ``g``
    covers input rows ``[g*gs, (g+1)*gs)`` (gs = effective group size, a
    divisor of K/2 — or K itself for per-channel when group_size doesn't
    divide). Group-wise scales are what lets INT4 meet the ppl gate
    (per-channel INT4 measured +1.5% ppl; see QUALITY.md).

    **Split-half packing**: byte row ``i`` holds ``lo = row i`` (low
    nibble) and ``hi = row i + K/2`` (high nibble). The two nibble planes
    are therefore *contiguous disjoint row ranges* of the original weight,
    so the fused kernel unpacks with two shifts and needs no sublane
    interleave — the matmul splits into ``x[:, :K/2] @ lo + x[:, K/2:] @ hi``
    (ops/dequant_matmul.py), and each K tile sits inside one group so the
    group scale multiplies the tile's partial product exactly.
    """
    K = w.shape[0]
    assert K % 2 == 0, "int4 packing requires even K"
    gs = _int4_group_size(K, group_size)
    G = K // gs
    wf = w.astype(jnp.float32)
    wg = wf.reshape(G, gs, -1)
    a = jnp.max(jnp.abs(wg), axis=1)                           # [G, N]
    # absmax scales, deliberately NOT weight-MSE-searched: a shrink-factor
    # grid search (f in 1.0..0.75, round-to-nearest with clipping) lowers
    # weight MSE but clips outlier rows, and outliers carry the signal —
    # measured end-to-end it WORSENED INT4 ppl delta 0.905% -> 1.536%
    # (quality_run, block_main_b4_5@3000). Group granularity is the knob
    # that works (per-channel 1.53% -> g128 0.905%).
    scale = jnp.maximum(a, 1e-8) / 7.0
    q = jnp.clip(jnp.round(wf / jnp.repeat(scale, gs, axis=0)), -7, 7
                 ).astype(jnp.int8)
    half = K // 2
    lo = q[:half].astype(jnp.uint8) & 0xF
    hi = (q[half:].astype(jnp.uint8) & 0xF) << 4
    return (lo | hi).astype(jnp.int8), scale.astype(jnp.float32)


def unpack_int4(packed, dtype=jnp.int8):
    """packed [K/2, N] -> int values [K, N] in [-7, 7] (split-half layout)."""
    u = packed.astype(jnp.int32)
    lo = (u << 28) >> 28          # sign-extend low nibble
    hi = (u << 24) >> 28          # sign-extend high nibble
    return jnp.concatenate([lo, hi], axis=0).astype(dtype)


def dequantize_int4(packed, scale, dtype=jnp.bfloat16):
    """scale: [N] (legacy per-channel) or [G, N] group-wise."""
    w = unpack_int4(packed).astype(jnp.float32)
    if scale.ndim == 2:
        scale = jnp.repeat(scale, w.shape[0] // scale.shape[0], axis=0)
    return (w * scale).astype(dtype)


# ---------------------------------------------------------------------------
# Whole-model weight quantization
# ---------------------------------------------------------------------------

_QUANT_LEAF_NAMES = ("kernel",)   # dense kernels only; embeddings/LN stay fp


def _is_linear(node) -> bool:
    return isinstance(node, dict) and "kernel" in node


def quantize_linear(node: dict, bits: int, group_size: int = 128):
    """{'kernel': [..., K, N], 'bias'?} -> quantized param dict.

    Stacked-layer kernels ([L, K, N]) are quantized per layer via vmap.
    """
    import functools
    kernel = node["kernel"]
    qfn = (quantize_int8 if bits == 8
           else functools.partial(quantize_int4, group_size=group_size))
    if kernel.ndim == 3:
        w_q, scale = jax.vmap(qfn)(kernel)
    else:
        w_q, scale = qfn(kernel)
    out = {f"kernel_q{bits}": w_q, "scale": scale}
    if "bias" in node:
        out["bias"] = node["bias"]
    return out


def quantize_model_params(params, bits: int = 8, skip_paths=(),
                          group_size: int = 128):
    """Replace every dense-kernel node in the pytree with its quantized form.

    skip_paths: tuples of path-name substrings to leave in fp (e.g.
    ("embed_out",) to keep the LM head full precision).
    """
    def walk(node, path):
        if _is_linear(node):
            if any(all(s in path for s in sp) if isinstance(sp, tuple)
                   else sp in path for sp in skip_paths):
                return node
            return quantize_linear(node, bits, group_size=group_size)
        if isinstance(node, dict):
            return {k: walk(v, path + (k,)) for k, v in node.items()}
        return node

    return walk(params, ())


# ---------------------------------------------------------------------------
# Fake-quant (QAT): straight-through quantize->dequantize on the SAME grid
# ---------------------------------------------------------------------------


def _qdq_int8(w):
    """Quantize->dequantize roundtrip, numerically identical to
    quantize_int8 + dequantize_int8 (same scales, same rounding)."""
    wf = w.astype(jnp.float32)
    scale = jnp.maximum(jnp.max(jnp.abs(wf), axis=0), 1e-8) / 127.0
    q = jnp.clip(jnp.round(wf / scale), -127, 127)
    return (q * scale).astype(w.dtype)


def _qdq_int4(w, group_size: int = 128):
    """Roundtrip identical to quantize_int4 + dequantize_int4 (group-wise
    absmax scales; the packing is lossless so it is skipped)."""
    K = w.shape[0]
    gs = _int4_group_size(K, group_size)
    wf = w.astype(jnp.float32)
    wg = wf.reshape(K // gs, gs, -1)
    scale = jnp.maximum(jnp.max(jnp.abs(wg), axis=1, keepdims=True),
                        1e-8) / 7.0
    q = jnp.clip(jnp.round(wg / scale), -7, 7)
    return (q * scale).reshape(wf.shape).astype(w.dtype)


def _ste(w, qdq):
    """Straight-through estimator: forward sees qdq(w), backward sees
    identity (round/clip have zero gradient almost everywhere)."""
    return w + jax.lax.stop_gradient(qdq - w)


def fake_quant_linear(node: dict, bits: int, group_size: int = 128):
    kernel = node["kernel"]
    qdq = (_qdq_int8 if bits == 8
           else lambda w: _qdq_int4(w, group_size=group_size))
    if kernel.ndim == 3:
        fq = jax.vmap(qdq)(kernel)
    else:
        fq = qdq(kernel)
    out = dict(node)
    out["kernel"] = _ste(kernel, fq)
    return out


def fake_quant_model_params(params, bits: int = 8, skip_paths=(),
                            group_size: int = 128):
    def walk(node, path):
        if _is_linear(node):
            if any(all(s in path for s in sp) if isinstance(sp, tuple)
                   else sp in path for sp in skip_paths):
                return node
            return fake_quant_linear(node, bits, group_size=group_size)
        if isinstance(node, dict):
            return {k: walk(v, path + (k,)) for k, v in node.items()}
        return node

    return walk(params, ())


def fake_quant_block_transformer(params, bits: int = 8,
                                 group_size: int = 128,
                                 token_decoder_bits: int = None,
                                 lm_head_bits: int = None):
    """QAT transform: the same kernel selection and quantization grid as
    quantize_block_transformer, but as an in-graph quantize->dequantize
    with straight-through gradients. Train with
    make_train_step(..., param_transform=this); afterwards
    quantize_block_transformer with the SAME arguments rounds the adapted
    master weights onto exactly the grid the loss optimized against.
    """
    td_bits = bits if token_decoder_bits is None else token_decoder_bits
    out = dict(params)
    out["block_decoder"] = fake_quant_model_params(
        params["block_decoder"], bits, group_size=group_size)
    skip = ("embed_out",) if lm_head_bits is not None else ()
    out["token_decoder"] = fake_quant_model_params(
        params["token_decoder"], td_bits, group_size=group_size,
        skip_paths=skip)
    if lm_head_bits is not None:
        out["token_decoder"] = dict(out["token_decoder"])
        out["token_decoder"]["embed_out"] = fake_quant_linear(
            params["token_decoder"]["embed_out"], lm_head_bits,
            group_size=group_size)
    return out


def quantize_block_transformer(params, bits: int = 8, group_size: int = 128,
                               skip_lm_head: bool = False,
                               token_decoder_bits: int = None,
                               lm_head_bits: int = None):
    """Quantize a block-transformer param tree for inference.

    Dense kernels in both decoder stacks + LM head + expansion go to
    INT8/INT4; the embedder (token lookup + tiny strided projection) and all
    layer norms / biases stay full precision. INT4 uses group-wise scales
    (``group_size`` input rows per scale) — the per-channel-only variant
    measured +1.5% ppl and fails the <=0.5% gate (QUALITY.md).

    ``skip_lm_head=True`` keeps ``token_decoder.embed_out`` in activation
    precision: XLA will not hoist the head's dequant out of the decode
    loop (206MB materialized bf16 per step at 1.2B — profiled at 28% of
    the token-decoder stage), so an unquantized read-only head streams
    fewer bytes per step than a quantized one, and is strictly better for
    quality (the INT4 gate config in QUALITY.md pairs int4 bodies with a
    higher-precision head for the same reason).

    ``token_decoder_bits`` / ``lm_head_bits`` allow mixed precision: at
    decode the token decoder is weight-streaming-bound (it re-reads its
    whole stack per token step while the block decoder reads per *block*
    step), so INT4 there buys ~2x stream reduction where it hurts most,
    while the block decoder and LM head stay INT8 (better quality, and
    their decode cost is attention/compute-dominated). E.g. the bench's
    ``--quantize mixed48`` = block INT8 + token INT4(group) + head INT8.
    """
    td_bits = bits if token_decoder_bits is None else token_decoder_bits
    out = dict(params)
    out["block_decoder"] = quantize_model_params(
        params["block_decoder"], bits, group_size=group_size)
    skip = ("embed_out",) if (skip_lm_head or lm_head_bits is not None) else ()
    out["token_decoder"] = quantize_model_params(
        params["token_decoder"], td_bits, group_size=group_size,
        skip_paths=skip)
    if lm_head_bits is not None and not skip_lm_head:
        out["token_decoder"] = dict(out["token_decoder"])
        out["token_decoder"]["embed_out"] = quantize_linear(
            params["token_decoder"]["embed_out"], lm_head_bits,
            group_size=group_size)
    return out
