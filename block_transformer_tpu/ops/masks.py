"""Attention-mask library for the hierarchical architecture.

All masks are built once per call as additive fp32 biases ``[B, 1, Q, K]``
(0 where attendable, ``NEG_INF`` where masked) from absolute position
indices, so the same functions serve full-sequence forward and fixed-capacity
KV-cache decode without shape changes.

Semantics encoded here (the parity-critical part — SURVEY.md §7.3):

- **Block-causal bias** (block decoder): embedding token ``j`` of block ``i``
  may attend *every* embedding token of blocks ``0..i`` — i.e. attendable iff
  ``k_pos // n_embedding_tokens <= q_pos // n_embedding_tokens``. This is the
  ``tril[n-1::n].repeat_interleave(n)`` construction of the reference
  (model/block_decoder/gpt_neo_x.py:16-24) expressed in closed form.
- **Padding**: a key whose (block-)attention-mask bit is 0 is masked for all
  queries (HF additive-mask convention; block mask is repeat-interleaved to
  embedding-token granularity per model/block_decoder/gpt_neo_x.py:99).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

NEG_INF = jnp.float32(-1e30)


class AttnMask(NamedTuple):
    """Structured attention mask: ``allowed[b, q, k] = kv_idx[k] <= q_idx[q]
    (and kv_valid[b, k])``.

    ``q_idx`` / ``kv_idx`` are *comparison indices*: token positions for
    ordinary causal attention, block indices for the block decoder's
    block-causal pattern. Fixed-capacity cache slots beyond the write
    frontier carry indices greater than every query index, so decode-step
    masking falls out of the same comparison. The Pallas flash kernel
    consumes these vectors directly; the XLA path materializes ``bias()``.
    """

    q_idx: jax.Array                   # [Q] or [B, Q] int32
    kv_idx: jax.Array                  # [K] int32
    kv_valid: Optional[jax.Array]      # [B, K] (1 = usable key) or None

    def allowed(self) -> jax.Array:
        """[B, Q, K] bool (B=1 when unbatched q_idx and no kv_valid)."""
        q = self.q_idx if self.q_idx.ndim == 2 else self.q_idx[None]
        ok = self.kv_idx[None, None, :] <= q[:, :, None]
        if self.kv_valid is not None:
            ok = ok & (self.kv_valid[:, None, :] != 0)
        return ok

    def bias(self) -> jax.Array:
        """Additive fp32 [B, 1, Q, K] (0 attendable / NEG_INF masked)."""
        return jnp.where(self.allowed(), 0.0, NEG_INF)[:, None].astype(jnp.float32)


def _ar(n):
    return jnp.arange(n, dtype=jnp.int32)


def causal_bias(q_positions, kv_positions, kv_valid=None):
    """Additive causal bias from absolute positions.

    q_positions: [Q] or [B, Q]; kv_positions: [K] or [B, K];
    kv_valid: optional [B, K] bool/int — 0 keys are masked everywhere.
    Returns fp32 [B, 1, Q, K] (B=1 if both position args are unbatched).
    """
    q = jnp.asarray(q_positions)
    k = jnp.asarray(kv_positions)
    if q.ndim == 1:
        q = q[None]
    if k.ndim == 1:
        k = k[None]
    ok = k[:, None, :] <= q[:, :, None]             # [B, Q, K]
    if kv_valid is not None:
        ok = ok & (jnp.asarray(kv_valid)[:, None, :] != 0)
    return jnp.where(ok, 0.0, NEG_INF)[:, None].astype(jnp.float32)


def block_causal_bias(q_block_idx, kv_block_idx, n_embedding_tokens: int = 1,
                      kv_valid=None):
    """Block-decoder bias at embedding-token granularity.

    q_block_idx / kv_block_idx: [Q]/[K] or batched — the *block index* of
    each embedding-token position (position // n_embedding_tokens).
    kv_valid: [B, K] validity at embedding-token granularity (i.e.
    block_attention_mask repeat-interleaved by the caller, or per-key flags).
    """
    del n_embedding_tokens  # indices are already at block granularity
    return causal_bias(q_block_idx, kv_block_idx, kv_valid)


def block_decoder_self_attention_bias(block_attention_mask, n_embedding_tokens: int):
    """Full-sequence block-decoder bias.

    block_attention_mask: [B, N] (1 = real block). Sequence length is
    ``N * n_embedding_tokens``. Returns [B, 1, S, S].
    """
    B, N = block_attention_mask.shape
    S = N * n_embedding_tokens
    pos_block = _ar(S) // n_embedding_tokens  # block index per position
    kv_valid = jnp.repeat(block_attention_mask, n_embedding_tokens, axis=1)
    return block_causal_bias(pos_block, pos_block, kv_valid=kv_valid)


def token_decoder_self_attention_bias(attention_mask, n_prefix: int):
    """Token-decoder full-forward bias under the prefix strategy.

    attention_mask: [B, T] over the *token* part of the adapted input
    (already excludes the BOS that the adaptation dropped). The adapted input
    is [prefix(n_prefix) tokens(T)]; the prefix is always attendable
    (model/token_decoder/base.py:498-500). Returns [B, 1, n_prefix+T, n_prefix+T].
    """
    B, T = attention_mask.shape
    S = n_prefix + T
    valid = jnp.concatenate(
        [jnp.ones((B, n_prefix), attention_mask.dtype), attention_mask], axis=1)
    return causal_bias(_ar(S), _ar(S), kv_valid=valid)


def decode_step_bias(cache_length, capacity: int, q_len: int, kv_valid=None,
                     batch: int = 1):
    """Bias for a decode step appending ``q_len`` new positions to a cache.

    Queries occupy absolute positions [cache_length, cache_length + q_len);
    keys are the full capacity buffer, valid iff index < cache_length + q_len
    (and kv_valid if given). Returns [B, 1, q_len, capacity].
    """
    q_pos = cache_length + _ar(q_len)
    k_idx = _ar(capacity)
    ok = (k_idx[None, :] <= q_pos[:, None]) & (k_idx[None, :] < cache_length + q_len)
    ok = jnp.broadcast_to(ok[None], (batch, q_len, capacity))
    if kv_valid is not None:
        ok = ok & (jnp.asarray(kv_valid)[:, None, :] != 0)
    return jnp.where(ok, 0.0, NEG_INF)[:, None].astype(jnp.float32)


def block_decode_step_bias(cache_length, capacity: int, q_len: int,
                           block_kv_valid, n_embedding_tokens: int = 1):
    """Block-decoder decode-step bias with block-granular causality.

    cache_length: embedding tokens already in cache. block_kv_valid:
    [B, capacity] validity per cached embedding-token slot (0 beyond current
    blocks or for padding blocks / finished sequences).
    """
    B = block_kv_valid.shape[0]
    q_pos = cache_length + _ar(q_len)
    k_idx = _ar(capacity)
    q_block = q_pos // n_embedding_tokens
    k_block = k_idx // n_embedding_tokens
    ok = (k_block[None, :] <= q_block[:, None]) & (k_idx[None, :] < cache_length + q_len)
    ok = jnp.broadcast_to(ok[None], (B, q_len, capacity))
    ok = ok & (block_kv_valid[:, None, :] != 0)
    return jnp.where(ok, 0.0, NEG_INF)[:, None].astype(jnp.float32)


# ---------------------------------------------------------------------------
# Structured-mask constructors (AttnMask) — preferred API
# ---------------------------------------------------------------------------

def causal_mask(q_positions, kv_positions, kv_valid=None) -> AttnMask:
    return AttnMask(jnp.asarray(q_positions, jnp.int32),
                    jnp.asarray(kv_positions, jnp.int32),
                    None if kv_valid is None else jnp.asarray(kv_valid))


def block_decoder_train_mask(block_attention_mask, n_embedding_tokens: int
                             ) -> AttnMask:
    B, N = block_attention_mask.shape
    S = N * n_embedding_tokens
    idx = _ar(S) // n_embedding_tokens
    kv_valid = jnp.repeat(block_attention_mask, n_embedding_tokens, axis=1)
    return AttnMask(idx, idx, kv_valid)


def token_decoder_train_mask(attention_mask, n_prefix: int) -> AttnMask:
    B, T = attention_mask.shape
    S = n_prefix + T
    valid = jnp.concatenate(
        [jnp.ones((B, n_prefix), attention_mask.dtype), attention_mask], axis=1)
    return AttnMask(_ar(S), _ar(S), valid)


def decode_mask(cache_length, capacity: int, q_len: int, kv_valid=None
                ) -> AttnMask:
    """Queries at absolute positions [cache_length, cache_length+q_len)
    against a fixed-capacity cache (unwritten slots mask out via the index
    comparison)."""
    return AttnMask(cache_length + _ar(q_len), _ar(capacity), kv_valid)


def block_decode_mask(cache_length, capacity: int, q_len: int,
                      block_kv_valid, n_embedding_tokens: int = 1) -> AttnMask:
    q_idx = (cache_length + _ar(q_len)) // n_embedding_tokens
    kv_idx = _ar(capacity) // n_embedding_tokens
    return AttnMask(q_idx, kv_idx, block_kv_valid)
