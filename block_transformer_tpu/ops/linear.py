"""Unified linear application: fp, INT8, or INT4 weight-only quantized.

Every matmul in the model goes through ``apply_linear`` so quantization is
a pure parameter-tree transformation (ops/quant.quantize_model_params) —
model code never branches on precision. On TPU the quantized paths call the
fused Pallas dequant-matmul (ops/dequant_matmul.py); elsewhere (CPU tests)
they fall back to an XLA dequant+dot that is numerically identical.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from block_transformer_tpu.ops import quant


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def apply_linear(x: jax.Array, p: dict, use_pallas: bool = None) -> jax.Array:
    """x [..., K] @ params -> [..., N] (+ bias if present)."""
    if "kernel" in p:
        out = jnp.dot(x, p["kernel"], preferred_element_type=x.dtype)
    elif "kernel_q8" in p:
        out = _int8_matmul(x, p["kernel_q8"], p["scale"], use_pallas)
    elif "kernel_q4" in p:
        w = quant.dequantize_int4(p["kernel_q4"], p["scale"], x.dtype)
        out = jnp.dot(x, w, preferred_element_type=x.dtype)
    else:
        raise KeyError(f"no kernel in linear params: {list(p)}")
    if "bias" in p:
        out = out + p["bias"].astype(out.dtype)
    return out


def _int8_matmul(x, w_q, scale, use_pallas):
    if use_pallas is None:
        # default to XLA's convert+dot: the current Pallas tiling measured
        # slower end-to-end on v5e (RESULTS.md); opt back in per-call or via
        # BT_PALLAS_INT8=1 once the kernel is head/row-batched
        import os
        use_pallas = _on_tpu() and os.environ.get("BT_PALLAS_INT8") == "1"
    lead = x.shape[:-1]
    K = x.shape[-1]
    N = w_q.shape[-1]
    x2 = x.reshape(-1, K)
    if use_pallas:
        from block_transformer_tpu.ops import dequant_matmul
        out = dequant_matmul.int8_matmul(x2, w_q, scale)
    else:
        out = (jnp.dot(x2, w_q.astype(x.dtype), preferred_element_type=jnp.float32)
               * scale).astype(x.dtype)
    return out.reshape(lead + (N,))
