"""Tests: uptraining init layer mappings, PG19 positionwise loss, needle
generation/scoring, token mapper."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from block_transformer_tpu.config import (BlockTransformerConfig,
                                          EmbedderConfig, NeoXConfig,
                                          TokenDecoderConfig)
from block_transformer_tpu.models import block_transformer as bt
from block_transformer_tpu.models import vanilla as vmod
from block_transformer_tpu.train import uptrain
from block_transformer_tpu.eval import longctx
from block_transformer_tpu.data.tokenizer import TokenMapper

V, H = 96, 64


def _cfgs(block_layers=2, token_layers=2, vanilla_layers=4):
    blk = NeoXConfig(vocab_size=V, hidden_size=H, num_layers=block_layers,
                     num_heads=4, intermediate_size=H * 4,
                     max_position_embeddings=64)
    tok = NeoXConfig(vocab_size=V, hidden_size=H, num_layers=token_layers,
                     num_heads=4, intermediate_size=H * 4,
                     max_position_embeddings=64)
    cfg = BlockTransformerConfig(
        block_length=4,
        embedder=EmbedderConfig(vocab_size=V, hidden_size=H // 4,
                                projection_hidden_size=H),
        block_decoder=blk,
        token_decoder=TokenDecoderConfig(neox=tok, expansion_ratio=2))
    van = NeoXConfig(vocab_size=V, hidden_size=H, num_layers=vanilla_layers,
                     num_heads=4, intermediate_size=H * 4,
                     max_position_embeddings=64)
    return cfg, van


@pytest.mark.parametrize("method,vl", [("skip", 4), ("partition", 4),
                                       ("duplicate", 2)])
def test_uptrain_layer_mapping(method, vl):
    cfg, van_cfg = _cfgs(vanilla_layers=vl)
    bp = bt.init_block_transformer_params(jax.random.PRNGKey(0), cfg)
    vp = vmod.init_vanilla_params(jax.random.PRNGKey(1), van_cfg)
    out = uptrain.load_block_from_vanilla(bp, cfg, vp, van_cfg, method=method)

    # embedder embeddings copied
    np.testing.assert_array_equal(np.asarray(out["embedder"]["embeddings"]["weight"]),
                                  np.asarray(vp["embed_in"]["weight"]))
    # head + final LN copied
    np.testing.assert_array_equal(np.asarray(out["token_decoder"]["embed_out"]["kernel"]),
                                  np.asarray(vp["embed_out"]["kernel"]))

    want_b = {"skip": [0, 2], "partition": [0, 1], "duplicate": [0, 1]}[method]
    want_t = {"skip": [0, 2], "partition": [2, 3], "duplicate": [0, 1]}[method]
    got_b = np.asarray(out["block_decoder"]["layers"]["attn"]["qkv"]["kernel"])
    got_t = np.asarray(out["token_decoder"]["layers"]["attn"]["qkv"]["kernel"])
    src = np.asarray(vp["layers"]["attn"]["qkv"]["kernel"])
    np.testing.assert_array_equal(got_b, src[want_b])
    np.testing.assert_array_equal(got_t, src[want_t])


def test_uptrain_identity_expansion():
    cfg, van_cfg = _cfgs(vanilla_layers=4)
    bp = bt.init_block_transformer_params(jax.random.PRNGKey(0), cfg)
    vp = vmod.init_vanilla_params(jax.random.PRNGKey(1), van_cfg)
    out = uptrain.load_block_from_vanilla(
        bp, cfg, vp, van_cfg, method="partition",
        initialize_identity_expansion_layer=True)
    from block_transformer_tpu.models import token_decoder as td
    be = jnp.asarray(np.random.default_rng(0).standard_normal((3, 1, H)),
                     jnp.float32)
    expanded = td.expand_block_embeddings(out["token_decoder"],
                                          cfg.token_decoder, be, 2)
    # identity expansion: both expanded slots equal the block embedding
    np.testing.assert_allclose(np.asarray(expanded[:, 0]), np.asarray(be[:, 0]),
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(expanded[:, 1]), np.asarray(be[:, 0]),
                               rtol=1e-5)


def test_positionwise_loss_vanilla_and_block():
    cfg, van_cfg = _cfgs()
    bp = bt.init_block_transformer_params(jax.random.PRNGKey(0), cfg)
    vp = vmod.init_vanilla_params(jax.random.PRNGKey(1), van_cfg)
    rng = np.random.default_rng(0)
    docs = [rng.integers(1, V, size=40) for _ in range(3)]
    C = 16

    def vanilla_fn(batch):
        return vmod.vanilla_forward(vp, van_cfg, jnp.asarray(batch))

    loss_v, n_v = longctx.loss_by_position_over_chunks(vanilla_fn, docs, C,
                                                       batch_size=4)
    assert loss_v.shape == (C - 1,) and n_v == 6 and np.isfinite(loss_v).all()

    L = cfg.block_length

    def block_fn(batch):
        B, Cc = batch.shape
        ids = jnp.asarray(batch.reshape(B, Cc // L, L))
        att = jnp.ones_like(ids)
        bam = jnp.ones(ids.shape[:2], jnp.int32)
        return bt.block_transformer_forward(bp, cfg, ids, att, bam).logits

    loss_b, n_b = longctx.loss_by_position_over_chunks(block_fn, docs, C,
                                                       batch_size=4,
                                                       block_length=L)
    assert loss_b.shape == (C - L,) and np.isfinite(loss_b).all()


class _Tok:
    def encode(self, s):
        return [ord(c) % 90 + 2 for c in s]

    def decode(self, toks):
        return "".join(chr((t - 2) % 90 + 32) for t in toks)


def test_needle_suite():
    hay = "word " * 400
    samples = longctx.generate_needle_suite(hay, _Tok(), context_length=256,
                                            depths=(0, 50, 100), n_templates=2)
    assert len(samples) == 6
    for s in samples:
        assert s["city"] in s["prompt"]
    scores = longctx.score_needle_results(
        samples, [s["needle"] if s["depth_percent"] == 50 else "nope"
                  for s in samples])
    assert scores[50] == 1.0 and scores[0] == 0.0


def test_token_mapper():
    ev = {"a": 0, "b": 1, "c": 2, "<eos>": 3}
    dv = {"b": 0, "c": 5, "d": 1, "<eos>": 2}
    m = TokenMapper(ev, dv, {"eos": 3, "unk": None, "pad": None, "bos": None},
                    {"eos": 2, "unk": None, "pad": None, "bos": None})
    np.testing.assert_array_equal(m.embedder_to_token_decoder([0, 1, 2, 3]),
                                  [2, 0, 5, 2])   # 'a' falls back to eos
    np.testing.assert_array_equal(m.token_decoder_to_embedder([0, 5, 2]),
                                  [1, 2, 3])
