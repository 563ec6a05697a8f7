"""Uptraining initialization: seed a block transformer from a pretrained
vanilla GPT-NeoX (model/utils.py:231-343 semantics).

Layer mappings: ``skip`` (block/token decoder layer i <- vanilla layer 2i,
requires vanilla depth = 2x), ``partition`` (block decoder takes the first
``block_layers`` vanilla layers, token decoder the rest), ``duplicate``
(both take all vanilla layers). Options: mean projection init (strided-conv
embedder projection = mean of the block's token embeddings), identity
expansion init (each of the ``expansion_ratio`` output slots = identity),
and ``compute_token_decoder_embeddings`` (token-decoder input embeddings =
block-decoder outputs over single-token inputs).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from block_transformer_tpu.config import BlockTransformerConfig, NeoXConfig
from block_transformer_tpu.models import neox
from block_transformer_tpu.ops import masks


def _layer_slice(stacked, idx):
    idx = jnp.asarray(idx, jnp.int32)
    return jax.tree.map(lambda a: a[idx], stacked)


def _layer_indices(method: str, vanilla_layers: int, target_layers: int,
                   role: str):
    if method == "skip":
        if target_layers * 2 != vanilla_layers:
            raise ValueError(f"skip requires vanilla depth = 2x target "
                             f"({vanilla_layers} vs {target_layers})")
        return np.arange(target_layers) * 2
    if method == "partition":
        if role == "block":
            return np.arange(target_layers)
        return np.arange(target_layers) + (vanilla_layers - target_layers)
    if method == "duplicate":
        if target_layers != vanilla_layers:
            raise ValueError("duplicate requires equal depth")
        return np.arange(target_layers)
    raise ValueError(f"invalid method {method!r}")


def load_block_from_vanilla(block_params, cfg: BlockTransformerConfig,
                            vanilla_params, vanilla_cfg: NeoXConfig,
                            method: str = "partition",
                            initialize_mean_embedder_projection: bool = False,
                            initialize_identity_expansion_layer: bool = False,
                            compute_token_decoder_embeddings: bool = False):
    """Returns a new block-transformer param tree seeded from the vanilla."""
    out = jax.tree.map(lambda x: x, block_params)  # shallow-ish copy
    bd_cfg, td_cfg = cfg.block_decoder, cfg.token_decoder.neox
    vl = vanilla_cfg.num_layers

    # embedder embeddings <- vanilla input embeddings
    out["embedder"] = dict(out["embedder"])
    out["embedder"]["embeddings"] = {
        "weight": vanilla_params["embed_in"]["weight"]}

    if initialize_mean_embedder_projection:
        # strided-conv projection = mean over the block's tokens (identity
        # per channel scaled 1/block_length); requires projection_layer
        # embedder with hidden == projection hidden
        ksz = cfg.block_length // cfg.n_embedding_tokens
        h = cfg.embedder.hidden_size
        ph = cfg.embedder.projection_hidden_size
        kern = jnp.tile((jnp.eye(h, ph) / cfg.block_length)[None], (ksz, 1, 1))
        out["embedder"]["projection"] = {
            "kernel": kern.astype(vanilla_params["embed_in"]["weight"].dtype),
            "bias": jnp.zeros((ph,), kern.dtype)}

    # block decoder layers
    bidx = _layer_indices(method, vl, bd_cfg.num_layers, "block")
    out["block_decoder"] = dict(out["block_decoder"])
    out["block_decoder"]["layers"] = _layer_slice(vanilla_params["layers"], bidx)

    # token decoder
    tidx = _layer_indices(method, vl, td_cfg.num_layers, "token")
    out["token_decoder"] = dict(out["token_decoder"])
    out["token_decoder"]["layers"] = _layer_slice(vanilla_params["layers"], tidx)
    out["token_decoder"]["final_ln"] = vanilla_params["final_ln"]
    out["token_decoder"]["embed_out"] = vanilla_params["embed_out"]

    if compute_token_decoder_embeddings:
        # embed_in[v] <- block_decoder(embed_in[v] as a length-1 sequence)
        emb = out["embedder"]["embeddings"]["weight"][:, None, :]  # [V, 1, h]
        mask = masks.causal_mask(jnp.zeros((1,), jnp.int32),
                                 jnp.zeros((1,), jnp.int32))

        @jax.jit
        def run(params, x):
            h, _ = neox.neox_stack(params, x, cfg=bd_cfg, mask=mask,
                                   positions=jnp.zeros((1,), jnp.int32))
            return h

        hidden = run(out["block_decoder"], emb)
        out["token_decoder"]["embed_in"] = {"weight": hidden[:, 0, :]}
    else:
        out["token_decoder"]["embed_in"] = {
            "weight": vanilla_params["embed_in"]["weight"]}

    if initialize_identity_expansion_layer:
        h = td_cfg.hidden_size
        ph = cfg.embedder.projection_hidden_size
        ratio = cfg.expansion_ratio
        eye = jnp.eye(ph, h)
        kern = jnp.concatenate([eye] * ratio, axis=1)      # [ph, h*ratio]
        out["token_decoder"]["expansion"] = {
            "kernel": kern.astype(vanilla_params["embed_in"]["weight"].dtype),
            "bias": jnp.zeros((h * ratio,), kern.dtype)}

    return out
