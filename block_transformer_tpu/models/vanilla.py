"""Vanilla GPT-NeoX causal LM — the baseline family (vanilla_31..410).

Counterpart of the reference's ``GPTNeoXForCausalLM`` baseline path
(pretrain_vanilla_transformer.py, model/utils.py:58-84) for head-to-head
throughput/perplexity comparisons (BASELINE.json config 3).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from block_transformer_tpu.config import NeoXConfig
from block_transformer_tpu.models import neox
from block_transformer_tpu.ops import masks


def init_vanilla_params(key, cfg: NeoXConfig, dtype=jnp.float32):
    return neox.init_neox_params(key, cfg, with_embed_in=True,
                                 with_lm_head=True, dtype=dtype)


def vanilla_forward(params, cfg: NeoXConfig, input_ids, attention_mask=None,
                    remat: bool = False):
    """input_ids: [B, S] -> logits [B, S, V] fp32."""
    B, S = input_ids.shape
    x = neox.embed_tokens(params, input_ids)
    positions = jnp.arange(S, dtype=jnp.int32)
    mask = masks.causal_mask(positions, positions, kv_valid=attention_mask)
    hidden, _ = neox.neox_stack(params, x, cfg=cfg, mask=mask,
                                positions=positions, remat=remat)
    return neox.lm_logits(params, hidden)


def vanilla_loss(params, cfg: NeoXConfig, input_ids, attention_mask, labels,
                 remat: bool = False):
    """Standard shifted CE (labels -100 ignored). Returns scalar fp32.

    ``remat=True`` checkpoints each layer so the backward pass recomputes
    attention instead of storing per-layer [B, H, S, S] probabilities
    (without it a 31M model at batch 64 x 1024 needs 26 GB of residuals).
    """
    logits = vanilla_forward(params, cfg, input_ids, attention_mask,
                             remat=remat)
    lg = logits[:, :-1].astype(jnp.float32)
    tgt = labels[:, 1:]
    w = (tgt != -100).astype(jnp.float32)
    if attention_mask is not None:
        w = w * attention_mask[:, 1:].astype(jnp.float32)
    logp = jax.nn.log_softmax(lg, axis=-1)
    ll = jnp.take_along_axis(logp, jnp.clip(tgt, 0)[..., None], axis=-1)[..., 0]
    return jnp.sum(-ll * w) / jnp.maximum(jnp.sum(w), 1.0)


def vanilla_prefill(params, cfg: NeoXConfig, input_ids, cache: neox.KVCache,
                    attention_mask=None):
    """Prefill the cache with a prompt; returns (last-position logits, cache)."""
    B, S = input_ids.shape
    x = neox.embed_tokens(params, input_ids)
    capacity = cache.k.shape[3]
    kv_valid = None
    if attention_mask is not None:
        pad = jnp.zeros((B, capacity - S), attention_mask.dtype)
        kv_valid = jnp.concatenate([attention_mask, pad], axis=1)
    mask = masks.decode_mask(cache.length, capacity, S, kv_valid=kv_valid)
    positions = cache.length + jnp.arange(S, dtype=jnp.int32)
    hidden, cache = neox.neox_stack(params, x, cfg=cfg, mask=mask,
                                    positions=positions, cache=cache)
    return neox.lm_logits(params, hidden[:, -1, :]), cache


def vanilla_decode_step(params, cfg: NeoXConfig, token_ids, cache: neox.KVCache):
    """token_ids [B] -> (logits [B, V], cache)."""
    B = token_ids.shape[0]
    x = neox.embed_tokens(params, token_ids[:, None])
    capacity = cache.k.shape[3]
    mask = masks.decode_mask(cache.length, capacity, 1)
    positions = cache.length + jnp.arange(1, dtype=jnp.int32)
    hidden, cache = neox.neox_stack(params, x, cfg=cfg, mask=mask,
                                    positions=positions, cache=cache)
    return neox.lm_logits(params, hidden[:, -1, :]), cache
