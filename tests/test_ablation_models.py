"""Composite forward with the reference's ablation families: roberta /
roberta_cls / t5 embedders, summation / cross_attention decoding (mirroring
conf/trainer/block_ablation_b4_85_*.yaml shapes at tiny size)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from block_transformer_tpu.config import (BlockTransformerConfig,
                                          EmbedderConfig, NeoXConfig,
                                          TokenDecoderConfig)
from block_transformer_tpu.models import block_transformer as bt

V, H, L = 96, 64, 4


def _neox(layers=2):
    return NeoXConfig(vocab_size=V, hidden_size=H, num_layers=layers,
                      num_heads=4, intermediate_size=H * 4,
                      max_position_embeddings=64)


def _run(cfg):
    params = bt.init_block_transformer_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    ids = rng.integers(2, V, size=(2, 3, L))
    att = np.ones_like(ids)
    att[0, -1, 2:] = 0
    bam = att.any(-1).astype(np.int64)
    labels = np.where(att == 0, -100, ids)
    out = bt.block_transformer_forward(params, cfg, jnp.asarray(ids),
                                       jnp.asarray(att), jnp.asarray(bam),
                                       labels=jnp.asarray(labels),
                                       compute_logits=True)
    assert out.logits.shape == (2, 2, L, V)
    assert np.isfinite(float(out.loss))
    return out


def test_roberta_prefix_ablation():
    emb = EmbedderConfig(cls="roberta", vocab_size=V, hidden_size=H // L,
                         projection_hidden_size=H, encoder_layers=2)
    cfg = BlockTransformerConfig(
        block_length=L, embedder=emb, block_decoder=_neox(),
        token_decoder=TokenDecoderConfig(neox=_neox(), expansion_ratio=1))
    _run(cfg)


def test_roberta_cls_summation_ablation():
    # 2 CLS tokens of hidden 32 concat -> ph 64; summation needs
    # n_expanded_emb == block_length (expansion_ratio = L)
    emb = EmbedderConfig(cls="roberta_cls", vocab_size=V, hidden_size=32,
                         projection_hidden_size=H, encoder_layers=2,
                         n_cls_tokens=2)
    cfg = BlockTransformerConfig(
        block_length=L, embedder=emb, block_decoder=_neox(),
        token_decoder=TokenDecoderConfig(neox=_neox(), expansion_ratio=L,
                                         decoding_strategy="summation"))
    _run(cfg)


def test_cls_cross_attention_t5_ablation():
    emb = EmbedderConfig(cls="roberta_cls", vocab_size=V, hidden_size=32,
                         projection_hidden_size=H, encoder_layers=2,
                         n_cls_tokens=2)
    cfg = BlockTransformerConfig(
        block_length=L, embedder=emb, block_decoder=_neox(),
        token_decoder=TokenDecoderConfig(neox=_neox(), expansion_ratio=L,
                                         decoding_strategy="cross_attention",
                                         cls="t5"))
    _run(cfg)


def test_t5_embedder_prefix_ablation():
    emb = EmbedderConfig(cls="t5", vocab_size=V, hidden_size=H // L,
                         projection_hidden_size=H, encoder_layers=2)
    cfg = BlockTransformerConfig(
        block_length=L, embedder=emb, block_decoder=_neox(),
        token_decoder=TokenDecoderConfig(neox=_neox(), expansion_ratio=2))
    _run(cfg)


def test_cross_attention_requires_t5():
    with pytest.raises(ValueError):
        TokenDecoderConfig(neox=_neox(), decoding_strategy="cross_attention",
                           cls="gpt-neo-x")


def test_gpt_neo_composite_ablation():
    """GPT-Neo block + token decoders through the full composite."""
    emb = EmbedderConfig(vocab_size=V, hidden_size=H // L,
                         projection_hidden_size=H)
    cfg = BlockTransformerConfig(
        block_length=L, embedder=emb, block_decoder=_neox(),
        token_decoder=TokenDecoderConfig(neox=_neox(), expansion_ratio=2,
                                         cls="gpt-neo"),
        block_decoder_cls="gpt-neo", block_decoder_window=4)
    _run(cfg)
