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


def quantize_int4(w: jax.Array):
    """w [K, N] float -> (packed int8 [K/2, N], scale fp32 [N]).

    Values in [-7, 7]; **split-half packing**: byte row ``i`` holds
    ``lo = row i`` (low nibble) and ``hi = row i + K/2`` (high nibble).
    The two nibble planes are therefore *contiguous disjoint row ranges*
    of the original weight, so the fused kernel unpacks with two shifts
    and needs no sublane interleave — the matmul splits into
    ``x[:, :K/2] @ lo + x[:, K/2:] @ hi`` (ops/dequant_matmul.py).
    """
    K = w.shape[0]
    assert K % 2 == 0, "int4 packing requires even K"
    a = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=0)
    scale = jnp.maximum(a, 1e-8) / 7.0
    q = jnp.clip(jnp.round(w.astype(jnp.float32) / scale), -7, 7).astype(jnp.int8)
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
    return (unpack_int4(packed).astype(jnp.float32) * scale).astype(dtype)


# ---------------------------------------------------------------------------
# Whole-model weight quantization
# ---------------------------------------------------------------------------

_QUANT_LEAF_NAMES = ("kernel",)   # dense kernels only; embeddings/LN stay fp


def _is_linear(node) -> bool:
    return isinstance(node, dict) and "kernel" in node


def quantize_linear(node: dict, bits: int):
    """{'kernel': [..., K, N], 'bias'?} -> quantized param dict.

    Stacked-layer kernels ([L, K, N]) are quantized per layer via vmap.
    """
    kernel = node["kernel"]
    qfn = quantize_int8 if bits == 8 else quantize_int4
    if kernel.ndim == 3:
        w_q, scale = jax.vmap(qfn)(kernel)
    else:
        w_q, scale = qfn(kernel)
    out = {f"kernel_q{bits}": w_q, "scale": scale}
    if "bias" in node:
        out["bias"] = node["bias"]
    return out


def quantize_model_params(params, bits: int = 8, skip_paths=()):
    """Replace every dense-kernel node in the pytree with its quantized form.

    skip_paths: tuples of path-name substrings to leave in fp (e.g.
    ("embed_out",) to keep the LM head full precision).
    """
    def walk(node, path):
        if _is_linear(node):
            if any(all(s in path for s in sp) if isinstance(sp, tuple)
                   else sp in path for sp in skip_paths):
                return node
            return quantize_linear(node, bits)
        if isinstance(node, dict):
            return {k: walk(v, path + (k,)) for k, v in node.items()}
        return node

    return walk(params, ())


def quantize_block_transformer(params, bits: int = 8):
    """Quantize a block-transformer param tree for inference.

    Dense kernels in both decoder stacks + LM head + expansion go to
    INT8/INT4; the embedder (token lookup + tiny strided projection) and all
    layer norms / biases stay full precision.
    """
    out = dict(params)
    out["block_decoder"] = quantize_model_params(params["block_decoder"], bits)
    out["token_decoder"] = quantize_model_params(params["token_decoder"], bits)
    return out
