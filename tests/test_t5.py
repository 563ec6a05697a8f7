"""T5 stack parity vs HF torch (encoder bidirectional + decoder with
cross-attention) and the relative-position bucket function."""

import numpy as np
import torch
import jax.numpy as jnp

from transformers import T5Config as HFT5Config, T5Model

from block_transformer_tpu.models import t5 as t5m
from block_transformer_tpu.utils import torch_import

VOCAB = 96


def make_pair(seed=0, d=64, layers=2, heads=4):
    torch.manual_seed(seed)
    hf_cfg = HFT5Config(vocab_size=VOCAB, d_model=d, d_kv=d // heads,
                        d_ff=d * 4, num_layers=layers, num_heads=heads,
                        relative_attention_num_buckets=32,
                        feed_forward_proj="relu", dropout_rate=0.0,
                        attn_implementation="eager")
    hf = T5Model(hf_cfg).eval()
    cfg = t5m.T5Config(vocab_size=VOCAB, d_model=d, d_kv=d // heads,
                       d_ff=d * 4, num_layers=layers, num_heads=heads)
    sd = hf.state_dict()
    enc = torch_import.t5_stack_params_from_state_dict(
        sd, layers, is_decoder=False, prefix="encoder.")
    dec = torch_import.t5_stack_params_from_state_dict(
        sd, layers, is_decoder=True, prefix="decoder.")
    return hf, cfg, enc, dec


def test_bucket_function_matches_hf():
    from transformers.models.t5.modeling_t5 import T5Attention
    rel = np.arange(-40, 40).reshape(1, -1).repeat(2, 0)
    want = T5Attention._relative_position_bucket(
        torch.tensor(rel), bidirectional=True, num_buckets=32,
        max_distance=128).numpy()
    got = np.asarray(t5m.relative_position_bucket(
        jnp.asarray(rel), bidirectional=True, num_buckets=32,
        max_distance=128))
    np.testing.assert_array_equal(got, want)
    want_c = T5Attention._relative_position_bucket(
        torch.tensor(rel), bidirectional=False, num_buckets=32,
        max_distance=128).numpy()
    got_c = np.asarray(t5m.relative_position_bucket(
        jnp.asarray(rel), bidirectional=False, num_buckets=32,
        max_distance=128))
    np.testing.assert_array_equal(got_c, want_c)


def test_t5_encoder_parity():
    hf, cfg, enc, dec = make_pair()
    rng = np.random.default_rng(0)
    ids = rng.integers(2, VOCAB, size=(2, 10))
    mask = np.ones((2, 10), np.int64)
    mask[1, 7:] = 0
    with torch.no_grad():
        want = hf.encoder(input_ids=torch.tensor(ids),
                          attention_mask=torch.tensor(mask)
                          ).last_hidden_state.numpy()
    got = np.asarray(t5m.t5_stack(enc, cfg, input_ids=jnp.asarray(ids),
                                  attention_mask=jnp.asarray(mask),
                                  is_decoder=False))
    sel = mask.astype(bool)
    np.testing.assert_allclose(got[sel], want[sel], atol=5e-4, rtol=5e-4)


def test_t5_decoder_cross_attention_parity():
    hf, cfg, enc, dec = make_pair(seed=1)
    rng = np.random.default_rng(1)
    enc_ids = rng.integers(2, VOCAB, size=(2, 6))
    dec_ids = rng.integers(2, VOCAB, size=(2, 5))
    with torch.no_grad():
        out = hf(input_ids=torch.tensor(enc_ids),
                 decoder_input_ids=torch.tensor(dec_ids))
        want = out.last_hidden_state.numpy()
    enc_h = t5m.t5_stack(enc, cfg, input_ids=jnp.asarray(enc_ids),
                         is_decoder=False)
    got = np.asarray(t5m.t5_stack(dec, cfg, input_ids=jnp.asarray(dec_ids),
                                  is_decoder=True,
                                  encoder_hidden_states=enc_h))
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=5e-4)
