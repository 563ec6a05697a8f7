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


def init_embedder_params(key, cfg: EmbedderConfig, block_length: int,
                         dtype=jnp.float32):
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


def embed_blocks(params, cfg: EmbedderConfig, block_length: int, input_ids):
    """input_ids: [..., block_length] int32 -> [..., n_embedding_tokens,
    projection_hidden_size].

    Leading dims are arbitrary (the caller flattens batch*n_blocks).
    """
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
