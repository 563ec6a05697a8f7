"""Mask-library golden tests: the closed-form biases must reproduce the
reference's tensor constructions (model/block_decoder/gpt_neo_x.py:16-24)."""

import numpy as np
import jax.numpy as jnp

from block_transformer_tpu.ops import masks


def reference_block_bias(max_positions: int, n: int) -> np.ndarray:
    """The reference construction: tril rows sliced every n, then each row
    repeated n times (numpy re-derivation of gpt_neo_x.py:16-24)."""
    tril = np.tril(np.ones((max_positions, max_positions), dtype=bool))
    sliced = tril[n - 1::n]                     # rows at n-1, 2n-1, ...
    return np.repeat(sliced, n, axis=0)         # [max_positions, max_positions]


def test_block_causal_matches_reference_construction():
    for n in (1, 2, 4):
        S = 16
        ref = reference_block_bias(S, n)[:S, :S]
        pos_block = jnp.arange(S) // n
        bias = masks.block_causal_bias(pos_block, pos_block)
        got = np.asarray(bias[0, 0] == 0.0)
        np.testing.assert_array_equal(got, ref)


def test_block_decoder_bias_padding():
    # 2 blocks real, 1 padding; n_emb=2 -> seq 6
    bam = jnp.array([[1, 1, 0]])
    bias = masks.block_decoder_self_attention_bias(bam, 2)
    ok = np.asarray(bias[0, 0] == 0.0)
    # padding block keys (positions 4,5) masked for all queries
    assert not ok[:, 4].any() and not ok[:, 5].any()
    # within block 0, both embedding tokens attend each other (incl. "future")
    assert ok[0, 1] and ok[1, 0]
    # block 1 attends block 0 but not vice versa
    assert ok[2, 0] and not ok[0, 2]


def test_token_decoder_bias():
    att = jnp.array([[1, 1, 0]])  # 3 tokens, last padded
    bias = masks.token_decoder_self_attention_bias(att, n_prefix=2)
    ok = np.asarray(bias[0, 0] == 0.0)
    assert ok.shape == (5, 5)
    # causal
    assert ok[0, 0] and not ok[0, 1]
    # prefix always attendable by later positions
    assert ok[4, 0] and ok[4, 1]
    # padded token key masked
    assert not ok[4, 4]


def test_decode_step_bias():
    bias = masks.decode_step_bias(jnp.int32(3), capacity=8, q_len=1)
    ok = np.asarray(bias[0, 0, 0] == 0.0)
    np.testing.assert_array_equal(ok, [True] * 4 + [False] * 4)

    bias = masks.block_decode_step_bias(
        jnp.int32(2), capacity=6, q_len=1,
        block_kv_valid=jnp.array([[1, 1, 1, 0, 0, 0]]), n_embedding_tokens=1)
    ok = np.asarray(bias[0, 0, 0] == 0.0)
    np.testing.assert_array_equal(ok, [True, True, True, False, False, False])
