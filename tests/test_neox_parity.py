"""Numerical parity of the JAX GPT-NeoX stack vs HF transformers (torch CPU).

This pins our compute core to the exact backend the reference builds on
(GPTNeoXForCausalLM; model/token_decoder/gpt_neo_x.py), at fp32, including
partial RoPE, parallel residual, fused-QKV layout conversion and padding
masks.
"""

import numpy as np
import pytest
import jax.numpy as jnp

import torch
from transformers import GPTNeoXConfig, GPTNeoXForCausalLM

from block_transformer_tpu.config import NeoXConfig
from block_transformer_tpu.models import vanilla
from block_transformer_tpu.utils import torch_import

VOCAB = 128


def make_pair(seed=0, hidden=64, layers=2, heads=4, parallel=True):
    torch.manual_seed(seed)
    hf_cfg = GPTNeoXConfig(
        vocab_size=VOCAB, hidden_size=hidden, num_hidden_layers=layers,
        num_attention_heads=heads, intermediate_size=hidden * 4,
        max_position_embeddings=64, rotary_pct=0.25,
        use_parallel_residual=parallel, attn_implementation="eager",
        bos_token_id=0, eos_token_id=0,
    )
    hf = GPTNeoXForCausalLM(hf_cfg).eval()
    cfg = NeoXConfig(vocab_size=VOCAB, hidden_size=hidden, num_layers=layers,
                     num_heads=heads, intermediate_size=hidden * 4,
                     max_position_embeddings=64, use_parallel_residual=parallel)
    params = torch_import.neox_params_from_state_dict(hf.state_dict(), cfg)
    return hf, cfg, params


@pytest.mark.parametrize("parallel", [True, False])
def test_logits_parity(parallel):
    hf, cfg, params = make_pair(parallel=parallel)
    rng = np.random.default_rng(0)
    ids = rng.integers(1, VOCAB, size=(2, 10))
    with torch.no_grad():
        ref = hf(input_ids=torch.tensor(ids)).logits.numpy()
    got = np.asarray(vanilla.vanilla_forward(params, cfg, jnp.asarray(ids)))
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=2e-4)


def test_logits_parity_with_padding():
    hf, cfg, params = make_pair(seed=1)
    rng = np.random.default_rng(1)
    ids = rng.integers(1, VOCAB, size=(2, 12))
    mask = np.ones((2, 12), dtype=np.int64)
    mask[0, 8:] = 0   # right padding
    mask[1, :3] = 0   # left padding
    with torch.no_grad():
        ref = hf(input_ids=torch.tensor(ids),
                 attention_mask=torch.tensor(mask)).logits.numpy()
    got = np.asarray(vanilla.vanilla_forward(params, cfg, jnp.asarray(ids),
                                             attention_mask=jnp.asarray(mask)))
    # compare only attended query positions (masked rows are garbage in both)
    sel = mask.astype(bool)
    np.testing.assert_allclose(got[sel], ref[sel], atol=2e-4, rtol=2e-4)


def test_decode_cache_matches_full_forward():
    _, cfg, params = make_pair(seed=2)
    rng = np.random.default_rng(2)
    ids = rng.integers(1, VOCAB, size=(2, 9))
    full = np.asarray(vanilla.vanilla_forward(params, cfg, jnp.asarray(ids)))

    from block_transformer_tpu.models import neox
    cache = neox.KVCache.create(cfg, batch=2, capacity=16, dtype=jnp.float32)
    logits, cache = vanilla.vanilla_prefill(params, cfg, jnp.asarray(ids[:, :6]), cache)
    np.testing.assert_allclose(np.asarray(logits), full[:, 5], atol=1e-4, rtol=1e-4)
    for t in range(6, 9):
        logits, cache = vanilla.vanilla_decode_step(params, cfg,
                                                    jnp.asarray(ids[:, t]), cache)
        np.testing.assert_allclose(np.asarray(logits), full[:, t],
                                   atol=1e-4, rtol=1e-4)
