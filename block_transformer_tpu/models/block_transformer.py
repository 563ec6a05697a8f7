"""The composite Block Transformer: embed -> block-decode -> shift ->
token-decode, with per-component losses.

Semantics mirror the reference's ``BlockTransformer.forward``
(model/block_transformer.py:50-225) exactly, re-expressed with static shapes:

- block decoder consumes the *current* block's embedding; its output at
  position *i* conditions decoding of block *i+1* (shift-left at
  block_transformer.py:124-132,142-146),
- token decoder input is ``[BOS, x1..xB]`` predicting ``[x1..xB]`` with
  BOS == EOS id (token_decoder/base.py:53-54, block_transformer.py:166-173),
- ``skip_padding_blocks`` becomes loss masking instead of boolean gather
  (identical loss value: the reference's mean over gathered tokens equals
  our masked mean over all tokens).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from block_transformer_tpu.config import BlockTransformerConfig
from block_transformer_tpu.models import block_decoder as bd
from block_transformer_tpu.models import embedder as emb
from block_transformer_tpu.models import token_decoder as td
from block_transformer_tpu.models import neox


def init_block_transformer_params(key, cfg: BlockTransformerConfig,
                                  dtype=jnp.float32):
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "embedder": emb.init_embedder_params(k1, cfg.embedder, cfg.block_length, dtype),
        "block_decoder": bd.init_block_decoder_params(
            k2, cfg.block_decoder, dtype, cls=cfg.block_decoder_cls,
            window=cfg.block_decoder_window),
        "token_decoder": td.init_token_decoder_params(
            k3, cfg.token_decoder, cfg.embedder.projection_hidden_size, dtype),
    }


def count_params(params) -> int:
    return sum(int(x.size) for x in jax.tree.leaves(params))


class BlockTransformerOutput(NamedTuple):
    logits: Optional[jax.Array]          # [B, N-1, L, V] fp32 (eval path)
    loss: Optional[jax.Array]
    token_decoding_loss: Optional[jax.Array]
    block_decoding_loss: Optional[jax.Array]
    auto_encoding_loss: Optional[jax.Array]
    loss_by_position: Optional[jax.Array]  # [L+1] fp32 mean CE by position


def _token_ce(logits, labels, weight):
    """Masked token CE. logits [Bb, L, V] fp32; labels [Bb, L] int; weight
    [Bb, L] fp32 (0 = excluded). Returns (mean loss, per-position mean [L])."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    ll = jnp.take_along_axis(logp, jnp.clip(labels, 0)[..., None], axis=-1)[..., 0]
    ce = -ll * weight
    total = jnp.sum(weight)
    loss = jnp.sum(ce) / jnp.maximum(total, 1.0)
    # per-position CE mean over rows where that position is valid
    pos_count = jnp.sum(weight, axis=0)
    loss_by_pos = jnp.sum(ce, axis=0) / jnp.maximum(pos_count, 1.0)
    return loss, loss_by_pos


def block_transformer_forward(params, cfg: BlockTransformerConfig,
                              input_ids, attention_mask, block_attention_mask,
                              labels=None, compute_logits: bool = None,
                              remat: bool = False,
                              block_decoder_fn=None,
                              token_decoder_stack_fn=None) -> BlockTransformerOutput:
    """input_ids/attention_mask: [B, N, L]; block_attention_mask: [B, N];
    labels: [B, N, L] with -100 on ignored positions (or None for eval).

    When ``labels`` is None, returns logits [B, N-1, L, V] (the eval path,
    equivalent to block_transformer.py:200-209 at every position lm_eval
    reads); when labels are given, returns losses.
    """
    B, N, L = input_ids.shape
    n_emb = cfg.n_embedding_tokens
    if compute_logits is None:
        compute_logits = labels is None

    # ---- embedding -------------------------------------------------------
    block_embeds = emb.embed_blocks(params["embedder"], cfg.embedder,
                                    cfg.block_length, input_ids,
                                    attention_mask=attention_mask)
    # [B, N, n_emb, ph]
    ph = cfg.embedder.projection_hidden_size
    inputs_embeds = block_embeds.reshape(B, N * n_emb, ph)
    # sequence parallelism: keep the block axis sharded over the ambient
    # mesh's ``seq`` axis (no-op otherwise) — parallel/sharding.seq_constraint
    from block_transformer_tpu.parallel import sharding as _sh
    inputs_embeds = _sh.seq_constraint(inputs_embeds)

    # ---- block decoding --------------------------------------------------
    # block_decoder_fn lets parallel/pipeline.py substitute the pp-scheduled
    # stack without the model knowing about meshes
    bd_forward = block_decoder_fn or bd.block_decoder_forward
    hidden = bd_forward(params["block_decoder"], cfg.block_decoder,
                        inputs_embeds, block_attention_mask,
                        n_emb, remat=remat,
                        cls=cfg.block_decoder_cls,
                        window=cfg.block_decoder_window)
    hidden = _sh.seq_constraint(hidden)

    block_loss = None
    if cfg.use_block_decoding_loss and labels is not None:
        block_loss = cfg.block_decoding_loss_weight * bd.block_decoding_loss(
            hidden, inputs_embeds, block_attention_mask, n_emb,
            cfg.block_decoding_loss_type)

    # ---- shift left & flatten -------------------------------------------
    # block i's output conditions block i+1's tokens
    ids_s = input_ids[:, 1:, :].reshape(B * (N - 1), L)
    att_s = attention_mask[:, 1:, :].reshape(B * (N - 1), L)
    blk_s = block_attention_mask[:, 1:].reshape(B * (N - 1))
    labels_s = None
    if labels is not None:
        labels_s = labels[:, 1:, :].reshape(B * (N - 1), L)

    block_embeddings = hidden[:, :-n_emb, :].reshape(B * (N - 1), n_emb, ph)

    # ---- token decoding --------------------------------------------------
    bos = jnp.full((B * (N - 1), 1), cfg.bos_token_id, ids_s.dtype)
    td_ids = jnp.concatenate([bos, ids_s], axis=1)            # [Bb, L+1]
    td_att = jnp.concatenate(
        [jnp.ones((B * (N - 1), 1), att_s.dtype), att_s], axis=1)

    logits = td.token_decoder_train_forward(
        params["token_decoder"], cfg.token_decoder, td_ids, td_att,
        block_embeddings, cfg.expansion_ratio, cfg.block_length, remat=remat,
        stack_fn=token_decoder_stack_fn)
    # [Bb, L, V] predicting x1..xL

    token_loss = None
    loss_by_pos = None
    auto_loss = None
    total = None
    if labels is not None and cfg.use_token_decoding_loss:
        # content positions: non-pad or attended (token_decoder/base.py:277-283),
        # valid label, non-padding block
        tgt = labels_s
        weight = (att_s.astype(jnp.float32)
                  * (tgt != -100).astype(jnp.float32)
                  * blk_s.astype(jnp.float32)[:, None])
        token_loss, loss_by_pos = _token_ce(logits.astype(jnp.float32), tgt, weight)
        total = token_loss if total is None else total + token_loss

    if cfg.use_auto_encoding_loss and labels is not None:
        # condition the token decoder on the block's *own* input embedding
        # (block_transformer.py:149-151,187-198)
        own_embeds = block_embeds[:, 1:, :, :].reshape(B * (N - 1), n_emb, ph)
        ae_logits = td.token_decoder_train_forward(
            params["token_decoder"], cfg.token_decoder, td_ids, td_att,
            own_embeds, cfg.expansion_ratio, cfg.block_length, remat=remat,
            stack_fn=token_decoder_stack_fn)
        weight = (att_s.astype(jnp.float32)
                  * (labels_s != -100).astype(jnp.float32)
                  * blk_s.astype(jnp.float32)[:, None])
        ae, _ = _token_ce(ae_logits.astype(jnp.float32), labels_s, weight)
        auto_loss = cfg.auto_encoding_loss_weight * ae
        total = auto_loss if total is None else total + auto_loss

    if block_loss is not None:
        total = block_loss if total is None else total + block_loss

    out_logits = None
    if compute_logits:
        out_logits = logits.reshape(B, N - 1, L, -1)

    return BlockTransformerOutput(out_logits, total, token_loss, block_loss,
                                  auto_loss, loss_by_pos)
