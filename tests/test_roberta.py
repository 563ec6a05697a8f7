"""RoBERTa encoder parity vs HF torch + embedder variant behavior."""

import numpy as np
import torch
import jax
import jax.numpy as jnp

from transformers import RobertaConfig as HFRobertaConfig, RobertaModel

from block_transformer_tpu.config import EmbedderConfig
from block_transformer_tpu.models import roberta as rb
from block_transformer_tpu.utils import torch_import

VOCAB = 120


def make_pair(seed=0, hidden=64, layers=2, heads=4):
    torch.manual_seed(seed)
    hf_cfg = HFRobertaConfig(vocab_size=VOCAB, hidden_size=hidden,
                             num_hidden_layers=layers, num_attention_heads=heads,
                             intermediate_size=hidden * 4,
                             max_position_embeddings=64, type_vocab_size=1,
                             pad_token_id=1, attn_implementation="eager")
    hf = RobertaModel(hf_cfg, add_pooling_layer=False).eval()
    cfg = rb.RobertaConfig(vocab_size=VOCAB, hidden_size=hidden,
                           num_layers=layers, num_heads=heads,
                           intermediate_size=hidden * 4,
                           max_position_embeddings=64)
    params = torch_import.roberta_params_from_state_dict(hf.state_dict(),
                                                         layers)
    return hf, cfg, params


def test_roberta_encoder_parity():
    hf, cfg, params = make_pair()
    rng = np.random.default_rng(0)
    ids = rng.integers(2, VOCAB, size=(2, 8))
    mask = np.ones((2, 8), dtype=np.int64)
    mask[1, 6:] = 0
    ids[1, 6:] = 1  # pad token
    with torch.no_grad():
        want = hf(input_ids=torch.tensor(ids),
                  attention_mask=torch.tensor(mask)).last_hidden_state.numpy()
    got = np.asarray(rb.roberta_encode(params, cfg, jnp.asarray(ids),
                                       jnp.asarray(mask)))
    sel = mask.astype(bool)
    np.testing.assert_allclose(got[sel], want[sel], atol=3e-4, rtol=3e-4)


def test_roberta_embedder_shapes():
    _, cfg, params = make_pair(seed=1)
    ecfg = EmbedderConfig(vocab_size=VOCAB, hidden_size=64 // 4,
                          n_embedding_tokens=1, projection_method="concat",
                          projection_hidden_size=64 * 4)
    # concat over L=4 tokens of hidden 64 -> ph 256
    full = {"roberta": params}
    rng = np.random.default_rng(1)
    ids = rng.integers(2, VOCAB, size=(3, 5, 4))
    out = rb.roberta_embed_blocks(full, cfg, ecfg, 4, jnp.asarray(ids))
    assert out.shape == (3, 5, 1, 256)


def test_roberta_cls_embedder():
    _, cfg, params = make_pair(seed=2)
    ecfg = EmbedderConfig(vocab_size=VOCAB, hidden_size=64,
                          n_embedding_tokens=1, projection_method="concat",
                          projection_hidden_size=64)
    key = jax.random.PRNGKey(0)
    full = {"roberta": params,
            "cls_embeddings": {"weight": jax.random.normal(key, (1, 64)) * 0.02}}
    rng = np.random.default_rng(2)
    ids = rng.integers(2, VOCAB, size=(2, 3, 4))
    out = rb.roberta_embed_blocks(full, cfg, ecfg, 4, jnp.asarray(ids),
                                  n_cls_tokens=1)
    assert out.shape == (2, 3, 1, 64)
    # CLS states must depend on the block content
    ids2 = ids.copy()
    ids2[0, 0, 0] = (ids2[0, 0, 0] + 1) % VOCAB
    out2 = rb.roberta_embed_blocks(full, cfg, ecfg, 4, jnp.asarray(ids2),
                                   n_cls_tokens=1)
    assert np.abs(np.asarray(out[0, 0]) - np.asarray(out2[0, 0])).max() > 0
