"""Online-softmax chunked XLA attention: parity with the direct form."""

import numpy as np
import jax
import jax.numpy as jnp

from block_transformer_tpu.ops import attention as attn
from block_transformer_tpu.ops import masks


def _case(B=2, H=3, Q=96, K=700, D=64, seed=0, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.standard_normal((B, H, Q, D)), dtype)
    k = jnp.asarray(rng.standard_normal((B, H, K, D)), dtype)
    v = jnp.asarray(rng.standard_normal((B, H, K, D)), dtype)
    q_idx = jnp.asarray(rng.integers(0, K, size=(B, Q)), jnp.int32)
    kv_idx = jnp.arange(K, dtype=jnp.int32)
    kv_valid = jnp.asarray(rng.integers(0, 2, size=(B, K)), jnp.int32)
    # every query must attend to something: make position 0 always valid
    kv_valid = kv_valid.at[:, 0].set(1)
    return q, k, v, masks.AttnMask(q_idx, kv_idx, kv_valid)


def test_chunked_matches_direct_f32():
    q, k, v, mask = _case()
    want = np.asarray(attn.attention_xla(q, k, v, mask))
    got = np.asarray(attn.attention_xla_chunked(q, k, v, mask, tile=128))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_chunked_matches_direct_bf16():
    q, k, v, mask = _case(seed=1, dtype=jnp.bfloat16, K=512)
    want = np.asarray(attn.attention_xla(q, k, v, mask), np.float32)
    got = np.asarray(attn.attention_xla_chunked(q, k, v, mask, tile=256),
                     np.float32)
    np.testing.assert_allclose(got, want, atol=3e-2, rtol=3e-2)


def test_chunked_unaligned_tail():
    # K not a tile multiple: padded tail must be fully masked
    q, k, v, mask = _case(seed=2, K=300)
    want = np.asarray(attn.attention_xla(q, k, v, mask))
    got = np.asarray(attn.attention_xla_chunked(q, k, v, mask, tile=128))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_dispatch_gate(monkeypatch):
    q, k, v, mask = _case()
    monkeypatch.setenv("BT_CHUNKED_PREFILL_ATTN", "1")
    got = np.asarray(attn.attention(q, k, v, mask))
    want = np.asarray(attn.attention_xla(q, k, v, mask))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)
    monkeypatch.setenv("BT_CHUNKED_PREFILL_ATTN", "0")
    got2 = np.asarray(attn.attention(q, k, v, mask))
    np.testing.assert_array_equal(got2, want)
