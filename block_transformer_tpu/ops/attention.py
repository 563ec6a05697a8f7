"""Attention backends.

``attention(q, k, v, mask, impl)`` computes masked multi-head attention
from a structured ``masks.AttnMask``. Two implementations:

- ``"xla"``: materialized additive bias + einsum + fp32 softmax. XLA fuses
  this well for the short sequences that dominate this architecture (token
  decoder ≤ block_length + prefix positions); always available (CPU tests).
- ``"pallas"``: fused flash-style kernel (ops/flash_attention.py) that
  consumes the mask's index vectors directly — no O(Q*K) bias in HBM.
  TPU only; falls back to xla for shapes below the tiling constraints.

This replaces the reference's FlashAttention-2 dependency
(requirements.txt flash-attn; SURVEY.md §2.9).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from block_transformer_tpu.ops import masks as masks_lib


def attention_xla(q, k, v, mask: masks_lib.AttnMask):
    """q: [B, H, Q, D]; k,v: [B, H, K, D]. Returns [B, H, Q, D] in q.dtype.
    Softmax in fp32 (HF GPTNeoX upcasts scores; parity-critical in bf16)."""
    D = q.shape[-1]
    scale = 1.0 / jnp.sqrt(jnp.float32(D))
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    scores = scores + mask.bias()  # broadcasts over heads
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs.astype(q.dtype), v,
                     preferred_element_type=jnp.float32)
    return out.astype(q.dtype)


def attention(q, k, v, mask: masks_lib.AttnMask, impl: str = "xla"):
    if impl == "pallas":
        from block_transformer_tpu.ops import flash_attention
        if flash_attention.supported(q, k):
            return flash_attention.flash_attention(q, k, v, mask)
        impl = "xla"
    if impl == "xla":
        return attention_xla(q, k, v, mask)
    raise ValueError(f"unknown attention impl {impl!r}")
