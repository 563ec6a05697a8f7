"""Attention backends.

``attention(q, k, v, bias, impl)`` computes masked multi-head attention.
Two implementations:

- ``"xla"``: einsum + fp32 softmax. XLA fuses this well for the short
  sequences that dominate this architecture (token decoder ≤
  block_length + prefix positions); always available (CPU tests).
- ``"pallas"``: fused flash-style Pallas kernel for long block-decoder
  sequences (ops/flash_attention.py); TPU only, falls back to xla when the
  shapes don't meet the tiling constraints.

This is the TPU-native replacement for the reference's FlashAttention-2
dependency (requirements.txt flash-attn; SURVEY.md §2.9).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def attention_xla(q, k, v, bias):
    """q: [B, H, Q, D]; k,v: [B, H, K, D]; bias: fp32 [B, 1, Q, K] additive.

    Returns [B, H, Q, D] in q.dtype. Softmax in fp32 (HF GPTNeoX upcasts
    scores; parity-critical for bf16 runs).
    """
    D = q.shape[-1]
    scale = 1.0 / jnp.sqrt(jnp.float32(D))
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    scores = scores + bias  # bias broadcasts over heads
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs.astype(q.dtype), v,
                     preferred_element_type=jnp.float32)
    return out.astype(q.dtype)


def attention(q, k, v, bias, impl: str = "xla"):
    if impl == "xla":
        return attention_xla(q, k, v, bias)
    elif impl == "pallas":
        from block_transformer_tpu.ops import flash_attention
        return flash_attention.attention(q, k, v, bias)
    else:
        raise ValueError(f"unknown attention impl {impl!r}")
