"""Block decoder: coarse autoregressive self-attention over block embeddings.

TPU-native counterpart of the reference's GPTNeoXBlockDecoder
(model/block_decoder/gpt_neo_x.py:56-126): a GPT-NeoX stack with no token
embedding and no LM head, consuming block embeddings directly; the
block-causal attention bias lets every embedding token of block *i* attend
through block *i* (ops/masks.block_decoder_self_attention_bias reproduces
the tril[n-1::n].repeat_interleave(n) construction of gpt_neo_x.py:16-24).
Hidden states are returned as the "logits" (gpt_neo_x.py:120-126).

Also carries the optional auxiliary block-decoding loss of
model/block_decoder/base.py:26-74 (MSE or InfoNCE-contrastive @ T=0.07 on
hidden states vs next-block input embeddings).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from block_transformer_tpu.config import NeoXConfig
from block_transformer_tpu.models import neox
from block_transformer_tpu.ops import masks


def _gpt_neo_cfg(cfg: NeoXConfig, window: int):
    from block_transformer_tpu.models.gpt_neo import GPTNeoConfig
    return GPTNeoConfig(vocab_size=cfg.vocab_size, hidden_size=cfg.hidden_size,
                        num_layers=cfg.num_layers, num_heads=cfg.num_heads,
                        intermediate_size=cfg.intermediate_size,
                        max_position_embeddings=cfg.max_position_embeddings,
                        window_size=window,
                        pad_token_id=cfg.pad_token_id,
                        eos_token_id=cfg.eos_token_id)


def init_block_decoder_params(key, cfg: NeoXConfig, dtype=jnp.float32,
                              cls: str = "gpt-neo-x", window: int = 256):
    if cls == "gpt-neo":
        from block_transformer_tpu.models import gpt_neo as gn
        return gn.init_gpt_neo_params(key, _gpt_neo_cfg(cfg, window),
                                      with_embed=True, with_lm_head=False,
                                      dtype=dtype)
    return neox.init_neox_params(key, cfg, with_embed_in=False,
                                 with_lm_head=False, dtype=dtype)


def block_decoder_forward(params, cfg: NeoXConfig, inputs_embeds,
                          block_attention_mask, n_embedding_tokens: int,
                          remat: bool = False, cls: str = "gpt-neo-x",
                          window: int = 256):
    """inputs_embeds: [B, N * n_emb, hidden]; block_attention_mask: [B, N].

    Returns hidden states [B, N * n_emb, hidden] (final layer norm applied).
    """
    B, S, _ = inputs_embeds.shape
    if cls == "gpt-neo":
        from block_transformer_tpu.models import gpt_neo as gn
        return gn.gpt_neo_block_decoder_forward(
            params, _gpt_neo_cfg(cfg, window), inputs_embeds,
            block_attention_mask, n_embedding_tokens)
    mask = masks.block_decoder_train_mask(block_attention_mask,
                                          n_embedding_tokens)
    positions = jnp.arange(S, dtype=jnp.int32)
    hidden, _ = neox.neox_stack(params, inputs_embeds, cfg=cfg, mask=mask,
                                positions=positions, remat=remat)
    return hidden


def block_decoding_loss(hidden_states, inputs_embeds, block_attention_mask,
                        n_embedding_tokens: int, loss_type: str = "contrastive"):
    """Auxiliary loss: hidden state at block i should predict block i+1's
    input embedding (model/block_decoder/base.py:26-74).

    hidden_states / inputs_embeds: [B, N * n_emb, h];
    block_attention_mask: [B, N]. Computed in fp32 like the reference.
    """
    n = n_embedding_tokens
    attn = jnp.repeat(block_attention_mask, n, axis=1)      # [B, S]
    label_mask = attn[:, n:, None].astype(jnp.float32)      # [B, S-n, 1]
    h = hidden_states[:, :-n, :].astype(jnp.float32) * label_mask
    y = jax.lax.stop_gradient(inputs_embeds[:, n:, :].astype(jnp.float32)) * label_mask
    hs = h.reshape(-1, h.shape[-1])
    ys = y.reshape(-1, y.shape[-1])
    if loss_type == "mse":
        return jnp.mean(jnp.square(hs - ys))
    elif loss_type == "contrastive":
        hs = hs / (jnp.linalg.norm(hs, axis=-1, keepdims=True) + 1e-12)
        ys = ys / (jnp.linalg.norm(ys, axis=-1, keepdims=True) + 1e-12)
        temperature = 0.07
        logits = (hs @ ys.T) / temperature
        logits = logits - jax.lax.stop_gradient(jnp.max(logits, axis=-1, keepdims=True))
        log_prob = logits - jnp.log(jnp.sum(jnp.exp(logits), axis=1, keepdims=True))
        return -jnp.mean(jnp.diagonal(log_prob))
    raise ValueError(f"unknown block_decoding_loss_type {loss_type!r}")
