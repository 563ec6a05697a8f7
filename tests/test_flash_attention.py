"""Pallas flash attention vs the XLA reference path (interpret mode on CPU),
across the mask patterns the model uses: causal, block-causal, padded."""

import numpy as np
import jax
import jax.numpy as jnp

from block_transformer_tpu.ops import attention, flash_attention, masks


def _rand_qkv(B, H, Q, K, D, seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.standard_normal((B, H, Q, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, H, K, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, H, K, D)), jnp.float32)
    return q, k, v


def _compare(q, k, v, mask, atol=2e-3):
    want = np.asarray(attention.attention_xla(q, k, v, mask))
    got = np.asarray(flash_attention.flash_attention(q, k, v, mask,
                                                     interpret=True))
    # only compare rows that have at least one attendable key
    ok = np.asarray(mask.allowed()).any(-1)        # [B, Q]
    if ok.ndim == 2 and ok.shape[0] == 1 and q.shape[0] > 1:
        ok = np.broadcast_to(ok, (q.shape[0], ok.shape[1]))
    sel = np.broadcast_to(ok[:, None, :, None], got.shape)
    np.testing.assert_allclose(got[sel], want[sel], atol=atol, rtol=1e-3)


def test_flash_causal():
    B, H, Q, D = 2, 2, 160, 64
    q, k, v = _rand_qkv(B, H, Q, Q, D)
    pos = jnp.arange(Q, dtype=jnp.int32)
    _compare(q, k, v, masks.causal_mask(pos, pos))


def test_flash_block_causal():
    B, H, S, D = 1, 2, 192, 32
    n = 2  # n_embedding_tokens
    q, k, v = _rand_qkv(B, H, S, S, D, seed=1)
    bam = jnp.ones((B, S // n), jnp.int32).at[:, -10:].set(0)
    mask = masks.block_decoder_train_mask(bam, n)
    _compare(q, k, v, mask)


def test_flash_padded_prefill_vs_cache_layout():
    # queries appended to a half-filled cache: kv longer than q
    B, H, D = 2, 2, 64
    cap, qlen = 256, 64
    q, k, v = _rand_qkv(B, H, qlen, cap, D, seed=2)
    kv_valid = jnp.zeros((B, cap), jnp.int32).at[:, :128 + qlen].set(1)
    mask = masks.decode_mask(jnp.int32(128), cap, qlen, kv_valid=kv_valid)
    _compare(q, k, v, mask)


def test_flash_non_tile_multiple_shapes():
    B, H, Q, D = 1, 1, 100, 64   # Q not a multiple of the 128 tile
    q, k, v = _rand_qkv(B, H, Q, Q, D, seed=3)
    pos = jnp.arange(Q, dtype=jnp.int32)
    _compare(q, k, v, masks.causal_mask(pos, pos))


def test_decode_attention_int8_interpret():
    from block_transformer_tpu.ops import decode_attention
    from block_transformer_tpu.models.neox import quantize_kv
    rng = np.random.default_rng(7)
    B, H, S, K, D = 2, 4, 1, 256, 64
    q = jnp.asarray(rng.standard_normal((B, H, S, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, H, K, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, H, K, D)), jnp.float32)
    k_q, k_s = quantize_kv(k)
    v_q, v_s = quantize_kv(v)
    kv_valid = jnp.zeros((B, K), jnp.int32).at[:, :129].set(1)
    mask = masks.decode_mask(jnp.int32(128), K, S, kv_valid=kv_valid)
    got = np.asarray(decode_attention.decode_attention_int8(
        q, k_q, k_s, v_q, v_s, mask, interpret=True))
    # reference: dequant then exact attention
    k_d = (k_q.astype(jnp.float32) * k_s[..., None])
    v_d = (v_q.astype(jnp.float32) * v_s[..., None])
    want = np.asarray(attention.attention_xla(q, k_d, v_d, mask))
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=2e-3)
