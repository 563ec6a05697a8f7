"""GPT-Neo stack parity vs HF torch (global+local attention layers)."""

import numpy as np
import torch
import jax.numpy as jnp

from transformers import GPTNeoConfig as HFNeoConfig, GPTNeoForCausalLM

from block_transformer_tpu.models import gpt_neo as gn
from block_transformer_tpu.utils import torch_import

VOCAB = 96


def make_pair(seed=0, hidden=64, layers=2, heads=4, window=4):
    torch.manual_seed(seed)
    hf_cfg = HFNeoConfig(vocab_size=VOCAB, hidden_size=hidden,
                         num_layers=layers, num_heads=heads,
                         intermediate_size=hidden * 4,
                         max_position_embeddings=64, window_size=window,
                         attention_types=[[["global", "local"], layers // 2]],
                         attn_implementation="eager",
                         bos_token_id=0, eos_token_id=0)
    hf = GPTNeoForCausalLM(hf_cfg).eval()
    cfg = gn.GPTNeoConfig(vocab_size=VOCAB, hidden_size=hidden,
                          num_layers=layers, num_heads=heads,
                          intermediate_size=hidden * 4,
                          max_position_embeddings=64, window_size=window)
    params = torch_import.gpt_neo_params_from_state_dict(hf.state_dict(),
                                                         layers)
    return hf, cfg, params


def test_gpt_neo_logits_parity():
    hf, cfg, params = make_pair()
    rng = np.random.default_rng(0)
    ids = rng.integers(1, VOCAB, size=(2, 12))  # > window to hit the band
    with torch.no_grad():
        want = hf(input_ids=torch.tensor(ids)).logits.numpy()
    got = np.asarray(gn.gpt_neo_forward(params, cfg, jnp.asarray(ids)))
    np.testing.assert_allclose(got, want, atol=3e-4, rtol=3e-4)


def test_gpt_neo_block_decoder_runs():
    _, cfg, params = make_pair(seed=1)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 8, 64)), jnp.float32)
    bam = jnp.ones((2, 8), jnp.int32).at[:, -2:].set(0)
    h = gn.gpt_neo_block_decoder_forward(params, cfg, x, bam, 1)
    assert h.shape == (2, 8, 64)
    assert np.isfinite(np.asarray(h)).all()
