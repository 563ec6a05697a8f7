"""Lookup embedder: token block -> block embedding(s).

Reimplements the semantics of the reference's main embedder
(model/embedder/lookup.py:30-87 + model/embedder/base.py:69-96):

- per-token ``nn.Embedding`` lookup with ``padding_idx=pad_token_id`` (the
  pad row is identically zero and receives no gradient — reproduced here by
  masking the lookup, which is exactly equivalent),
- projection to ``[n_embedding_tokens, projection_hidden_size]`` either by
  **concat** (reshape of the per-token embeddings — the method every main
  config uses) or by **projection_layer** (strided Conv1d == grouped dense,
  init std ``(hidden*block_length)^-0.5`` per model/embedder/base.py:91-96).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from block_transformer_tpu.config import EmbedderConfig


def _heads_for(hidden: int, heads):
    if heads:
        return heads
    for hd in (64, 32, 16, 8):
        if hidden % hd == 0 and hidden // hd >= 1:
            return max(1, hidden // hd)
    return 1


def _roberta_cfg(cfg: EmbedderConfig):
    from block_transformer_tpu.models.roberta import RobertaConfig
    # position ids reach pad_token_id + block_length + n_cls_tokens; 512
    # rows (roberta standard is 514) covers any sane block/pad configuration
    return RobertaConfig(vocab_size=cfg.vocab_size, hidden_size=cfg.hidden_size,
                         num_layers=cfg.encoder_layers,
                         num_heads=_heads_for(cfg.hidden_size, cfg.encoder_heads),
                         intermediate_size=cfg.hidden_size * 4,
                         max_position_embeddings=512,
                         pad_token_id=cfg.pad_token_id)


def _t5_cfg(cfg: EmbedderConfig):
    from block_transformer_tpu.models.t5 import T5Config
    heads = _heads_for(cfg.hidden_size, cfg.encoder_heads)
    return T5Config(vocab_size=cfg.vocab_size, d_model=cfg.hidden_size,
                    d_kv=cfg.hidden_size // heads, d_ff=cfg.hidden_size * 4,
                    num_layers=cfg.encoder_layers, num_heads=heads,
                    pad_token_id=cfg.pad_token_id)


def init_embedder_params(key, cfg: EmbedderConfig, block_length: int,
                         dtype=jnp.float32):
    if cfg.cls in ("roberta", "roberta_cls"):
        from block_transformer_tpu.models import roberta as rb
        n_cls = cfg.n_cls_tokens if cfg.cls == "roberta_cls" else 0
        return rb.init_roberta_embedder_params(
            key, _roberta_cfg(cfg), cfg, block_length, n_cls_tokens=n_cls,
            dtype=dtype)
    if cfg.cls == "t5":
        from block_transformer_tpu.models import t5 as t5m
        k1, k2 = jax.random.split(key)
        params = {"t5": t5m.init_t5_stack_params(k1, _t5_cfg(cfg),
                                                 is_decoder=False, dtype=dtype)}
        if cfg.projection_method == "projection_layer":
            ksz = block_length // cfg.n_embedding_tokens
            std = (cfg.hidden_size * block_length) ** -0.5
            params["projection"] = {
                "kernel": (std * jax.random.normal(
                    k2, (ksz, cfg.hidden_size, cfg.projection_hidden_size),
                    jnp.float32)).astype(dtype),
                "bias": jnp.zeros((cfg.projection_hidden_size,), dtype)}
        return params
    k_emb, k_proj = jax.random.split(key)
    emb = cfg.initializer_range * jax.random.normal(
        k_emb, (cfg.vocab_size, cfg.hidden_size), jnp.float32)
    emb = emb.at[cfg.pad_token_id].set(0.0)  # padding_idx row
    params = {"embeddings": {"weight": emb.astype(dtype)}}
    if cfg.projection_method == "projection_layer":
        ksz = block_length // cfg.n_embedding_tokens
        std = (cfg.hidden_size * block_length) ** -0.5
        kern = std * jax.random.normal(
            k_proj, (ksz, cfg.hidden_size, cfg.projection_hidden_size), jnp.float32)
        params["projection"] = {
            "kernel": kern.astype(dtype),
            "bias": jnp.zeros((cfg.projection_hidden_size,), dtype)}
    return params


def embed_blocks(params, cfg: EmbedderConfig, block_length: int, input_ids,
                 attention_mask=None):
    """input_ids: [..., block_length] int32 -> [..., n_embedding_tokens,
    projection_hidden_size].

    Leading dims are arbitrary (the caller flattens batch*n_blocks).
    """
    if cfg.cls in ("roberta", "roberta_cls"):
        from block_transformer_tpu.models import roberta as rb
        n_cls = cfg.n_cls_tokens if cfg.cls == "roberta_cls" else 0
        return rb.roberta_embed_blocks(params, _roberta_cfg(cfg), cfg,
                                       block_length, input_ids,
                                       attention_mask, n_cls_tokens=n_cls)
    if cfg.cls == "t5":
        from block_transformer_tpu.models import t5 as t5m
        lead = input_ids.shape[:-1]
        L = input_ids.shape[-1]
        ids = input_ids.reshape(-1, L)
        att = (attention_mask.reshape(-1, L) if attention_mask is not None
               else jnp.ones_like(ids))
        hidden = t5m.t5_stack(params["t5"], _t5_cfg(cfg), input_ids=ids,
                              attention_mask=att, is_decoder=False)
        n = cfg.n_embedding_tokens
        B = ids.shape[0]
        if cfg.projection_method == "concat":
            out = hidden.reshape(B, n, (L // n) * cfg.hidden_size)
        else:
            ksz = L // n
            grouped = hidden.reshape(B, n, ksz * cfg.hidden_size)
            kern = params["projection"]["kernel"].reshape(
                ksz * cfg.hidden_size, -1)
            out = jnp.dot(grouped, kern, preferred_element_type=hidden.dtype)
            out = out + params["projection"]["bias"].astype(out.dtype)
        return out.reshape(lead + (n, -1))
    ids = input_ids
    lead = ids.shape[:-1]
    L = ids.shape[-1]
    assert L == block_length, (L, block_length)

    h = params["embeddings"]["weight"][ids]           # [..., L, hidden]
    # padding_idx semantics: pad rows are zero (init) and stay zero under
    # training because the forward masks them (no gradient flows to the row).
    h = jnp.where((ids == cfg.pad_token_id)[..., None], 0.0, h)

    n = cfg.n_embedding_tokens
    if cfg.projection_method == "concat":
        out = h.reshape(lead + (n, cfg.projection_hidden_size))
    else:  # projection_layer: strided conv == dense over each group of ksz tokens
        ksz = L // n
        grouped = h.reshape(lead + (n, ksz * cfg.hidden_size))
        kernel = params["projection"]["kernel"].reshape(
            ksz * cfg.hidden_size, cfg.projection_hidden_size)
        out = jnp.dot(grouped, kernel, preferred_element_type=h.dtype)
        out = out + params["projection"]["bias"].astype(out.dtype)
    return out
