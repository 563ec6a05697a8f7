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


def attention_xla_chunked(q, k, v, mask: masks_lib.AttnMask,
                          tile: int = 256):
    """Online-softmax attention over K tiles, in plain XLA (lax.scan).

    The direct formulation materializes fp32 scores [B, H, Q, K] in HBM
    (3-4 passes over ~1.2GB per prefill chunk-layer at the headline
    shape); here each tile's scores are consumed by elementwise
    exp/accumulate in the same fusion as the dot that produced them, so
    HBM traffic drops to K/V once + small [B, H, Q] stats per tile — the
    flash-attention access pattern expressed at the XLA level. Numerics:
    same fp32 softmax / q.dtype probs-dot as attention_xla, reassociated
    over tiles.
    """
    B, H, Q, D = q.shape
    K = k.shape[2]
    nt = -(-K // tile)
    Kp = nt * tile
    q_idx = mask.q_idx
    if q_idx.ndim == 1:
        q_idx = jnp.broadcast_to(q_idx[None], (B, Q))
    kv_valid = mask.kv_valid
    if kv_valid is None:
        kv_valid = jnp.ones((B, K), jnp.int32)
    if Kp != K:
        k = jnp.pad(k, ((0, 0), (0, 0), (0, Kp - K), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, Kp - K), (0, 0)))
        kv_valid = jnp.pad(kv_valid, ((0, 0), (0, Kp - K)))
        kv_idx = jnp.pad(mask.kv_idx, (0, Kp - K),
                         constant_values=2**30)
    else:
        kv_idx = mask.kv_idx
    scale = 1.0 / jnp.sqrt(jnp.float32(D))
    # tile-major xs views
    kt = k.reshape(B, H, nt, tile, D).transpose(2, 0, 1, 3, 4)
    vt = v.reshape(B, H, nt, tile, D).transpose(2, 0, 1, 3, 4)
    kit = kv_idx.reshape(nt, tile)
    kvt = kv_valid.reshape(B, nt, tile).transpose(1, 0, 2)

    def body(carry, xs):
        acc, m, l = carry
        ktile, vtile, ki, kva = xs
        s = jnp.einsum("bhqd,bhkd->bhqk", q, ktile,
                       preferred_element_type=jnp.float32) * scale
        ok = ((ki[None, None, None, :] <= q_idx[:, None, :, None])
              & (kva[:, None, None, :] != 0))
        s = jnp.where(ok, s, -1e30)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1))
        p = jnp.exp(s - m_new[..., None])
        corr = jnp.exp(m - m_new)
        l = l * corr + jnp.sum(p, axis=-1)
        pv = jnp.einsum("bhqk,bhkd->bhqd", p.astype(q.dtype), vtile,
                        preferred_element_type=jnp.float32)
        acc = acc * corr[..., None] + pv
        return (acc, m_new, l), None

    acc0 = jnp.zeros((B, H, Q, D), jnp.float32)
    m0 = jnp.full((B, H, Q), -1e30, jnp.float32)
    l0 = jnp.zeros((B, H, Q), jnp.float32)
    (acc, _, l), _ = jax.lax.scan(body, (acc0, m0, l0), (kt, vt, kit, kvt))
    return (acc / jnp.maximum(l, 1e-30)[..., None]).astype(q.dtype)


def _chunked_tile() -> int:
    import os
    return int(os.environ.get("BT_CHUNKED_ATTN_TILE", "256"))


def _use_chunked(Q: int, K: int) -> bool:
    """Prefill-shaped XLA attention through the online-softmax tiles:
    Q >= 64 rows with enough K tiles to amortize the rescale — decode
    shapes keep the direct form. Raced on chip at the b384 default
    operating point: 9,997 vs 12,769 tok/s (-22%, BENCH_DETAIL_chunked),
    and again at the isolated prefill probe shape (b256 p2048:
    2.392 s vs 1.665 s streaming / 1.422 s fresh — scripts/
    prefill_profile.py, 2026-08-20): the per-tile rescale traffic costs
    more than score fusion saves, so it stays opt-in
    (BT_CHUNKED_PREFILL_ATTN=1); its value is score-buffer memory
    headroom at prefill lengths past p2048, not speed."""
    import os
    if os.environ.get("BT_CHUNKED_PREFILL_ATTN", "0") != "1":
        return False
    return Q >= 64 and K >= 2 * _chunked_tile()


def attention(q, k, v, mask: masks_lib.AttnMask, impl: str = "xla"):
    if impl == "pallas":
        from block_transformer_tpu.ops import flash_attention
        from block_transformer_tpu.ops import linear
        if linear.pallas_allowed() and flash_attention.supported(q, k):
            return flash_attention.flash_attention(q, k, v, mask)
        impl = "xla"
    if impl == "xla":
        if _use_chunked(q.shape[2], k.shape[2]):
            return attention_xla_chunked(q, k, v, mask, tile=_chunked_tile())
        return attention_xla(q, k, v, mask)
    raise ValueError(f"unknown attention impl {impl!r}")
