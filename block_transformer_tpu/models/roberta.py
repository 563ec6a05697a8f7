"""RoBERTa encoder stack + embedder variants (reference ablations).

Functional JAX implementation matching HF ``RobertaModel`` numerics
(post-LN encoder blocks, learned absolute positions with the RoBERTa
``padding_idx + 1`` offset, GELU, bidirectional attention over the block's
tokens). Used by the reference's ablation embedders:

- ``RobertaEmbedder`` (model/embedder/roberta.py:10-79): full encoder over
  the block's tokens, then the Base projection (concat / strided conv).
- ``RobertaCLSEmbedder`` (model/embedder/roberta_cls.py:11-96): prepends
  ``n_cls_tokens`` CLS tokens and keeps only their hidden states as the
  block embedding.

Weight layout follows models/neox.py conventions ([in, out] kernels, layers
stacked for lax.scan); utils/torch_import.roberta_params_from_state_dict
maps HF checkpoints.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp

from block_transformer_tpu.config import EmbedderConfig
from block_transformer_tpu.models.neox import layer_norm
from block_transformer_tpu.ops import linear as linear_ops


@dataclass(frozen=True)
class RobertaConfig:
    vocab_size: int = 50265
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 514
    type_vocab_size: int = 1
    layer_norm_eps: float = 1e-5
    initializer_range: float = 0.02
    pad_token_id: int = 1


def init_roberta_params(key, cfg: RobertaConfig, dtype=jnp.float32):
    std = cfg.initializer_range
    h, m = cfg.hidden_size, cfg.intermediate_size
    ks = jax.random.split(key, 8)

    def dense(k, shape):
        return {"kernel": (std * jax.random.normal(k, shape, jnp.float32)
                           ).astype(dtype),
                "bias": jnp.zeros((shape[-1],), dtype)}

    def ln():
        return {"scale": jnp.ones((h,), dtype), "bias": jnp.zeros((h,), dtype)}

    def layer(k):
        k1, k2, k3, k4 = jax.random.split(k, 4)
        return {
            "attn": {"q": dense(k1, (h, h)), "k": dense(k2, (h, h)),
                     "v": dense(k3, (h, h)), "out": dense(k4, (h, h))},
            "attn_ln": ln(),
            "mlp": {"up": dense(jax.random.fold_in(k, 5), (h, m)),
                    "down": dense(jax.random.fold_in(k, 6), (m, h))},
            "mlp_ln": ln(),
        }

    layers = [layer(jax.random.fold_in(ks[0], i)) for i in range(cfg.num_layers)]
    return {
        "word_embeddings": {"weight": (std * jax.random.normal(
            ks[1], (cfg.vocab_size, h), jnp.float32)).astype(dtype)},
        "position_embeddings": {"weight": (std * jax.random.normal(
            ks[2], (cfg.max_position_embeddings, h), jnp.float32)).astype(dtype)},
        "token_type_embeddings": {"weight": (std * jax.random.normal(
            ks[3], (cfg.type_vocab_size, h), jnp.float32)).astype(dtype)},
        "embed_ln": ln(),
        "layers": jax.tree.map(lambda *xs: jnp.stack(xs, 0), *layers),
    }


def roberta_encode(params, cfg: RobertaConfig, input_ids, attention_mask=None,
                   inputs_embeds=None):
    """[B, S] -> hidden [B, S, h]. Bidirectional attention; padding masked."""
    if inputs_embeds is None:
        x = params["word_embeddings"]["weight"][input_ids]
        B, S = input_ids.shape
    else:
        x = inputs_embeds
        B, S = x.shape[:2]
    # RoBERTa position ids: padding_idx + cumulative count of non-pad tokens
    # (HF create_position_ids_from_input_ids: derived from ids != pad)
    if attention_mask is None:
        attention_mask = jnp.ones((B, S), jnp.int32)
    pos_mask = ((input_ids != cfg.pad_token_id).astype(jnp.int32)
                if input_ids is not None else attention_mask)
    pos_ids = (jnp.cumsum(pos_mask, axis=1) * pos_mask + cfg.pad_token_id)
    x = (x + params["position_embeddings"]["weight"][pos_ids]
         + params["token_type_embeddings"]["weight"][jnp.zeros((B, S), jnp.int32)])
    x = layer_norm(x, params["embed_ln"], cfg.layer_norm_eps)

    bias = jnp.where(attention_mask[:, None, None, :] != 0, 0.0, -1e30
                     ).astype(jnp.float32)
    H = cfg.num_heads
    D = cfg.hidden_size // H
    scale = 1.0 / jnp.sqrt(jnp.float32(D))

    def body(h, p):
        def proj(name):
            y = linear_ops.apply_linear(h, p["attn"][name])
            return y.reshape(B, S, H, D).transpose(0, 2, 1, 3)
        q, k, v = proj("q"), proj("k"), proj("v")
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                            preferred_element_type=jnp.float32) * scale
        probs = jax.nn.softmax(scores + bias, axis=-1).astype(h.dtype)
        ctx = jnp.einsum("bhqk,bhkd->bhqd", probs, v,
                         preferred_element_type=jnp.float32).astype(h.dtype)
        ctx = ctx.transpose(0, 2, 1, 3).reshape(B, S, H * D)
        attn_out = linear_ops.apply_linear(ctx, p["attn"]["out"])
        h = layer_norm(h + attn_out, p["attn_ln"], cfg.layer_norm_eps)
        mlp = linear_ops.apply_linear(
            jax.nn.gelu(linear_ops.apply_linear(h, p["mlp"]["up"]),
                        approximate=False), p["mlp"]["down"])
        h = layer_norm(h + mlp, p["mlp_ln"], cfg.layer_norm_eps)
        return h, None

    x, _ = jax.lax.scan(body, x, params["layers"])
    return x


# ---------------------------------------------------------------------------
# Embedder variants
# ---------------------------------------------------------------------------

def init_roberta_embedder_params(key, rcfg: RobertaConfig,
                                 ecfg: EmbedderConfig, block_length: int,
                                 n_cls_tokens: int = 0, dtype=jnp.float32):
    k1, k2, k3 = jax.random.split(key, 3)
    params = {"roberta": init_roberta_params(k1, rcfg, dtype)}
    if n_cls_tokens:
        params["cls_embeddings"] = {
            "weight": (rcfg.initializer_range * jax.random.normal(
                k3, (n_cls_tokens, rcfg.hidden_size), jnp.float32)).astype(dtype)}
    if ecfg.projection_method == "projection_layer":
        base = block_length + n_cls_tokens if not n_cls_tokens else n_cls_tokens
        ksz = (n_cls_tokens or block_length) // ecfg.n_embedding_tokens
        std = (rcfg.hidden_size * block_length) ** -0.5
        params["projection"] = {
            "kernel": (std * jax.random.normal(
                k2, (ksz, rcfg.hidden_size, ecfg.projection_hidden_size),
                jnp.float32)).astype(dtype),
            "bias": jnp.zeros((ecfg.projection_hidden_size,), dtype)}
    return params


def roberta_embed_blocks(params, rcfg: RobertaConfig, ecfg: EmbedderConfig,
                         block_length: int, input_ids, attention_mask=None,
                         n_cls_tokens: int = 0):
    """[..., L] -> [..., n_embedding_tokens, projection_hidden_size].

    With ``n_cls_tokens``: prepend learned CLS vectors, keep only their
    hidden states (roberta_cls.py semantics); else use all token hiddens.
    """
    lead = input_ids.shape[:-1]
    L = input_ids.shape[-1]
    ids = input_ids.reshape(-1, L)
    B = ids.shape[0]
    att = (attention_mask.reshape(-1, L) if attention_mask is not None
           else jnp.ones((B, L), jnp.int32))

    if n_cls_tokens:
        tok = params["roberta"]["word_embeddings"]["weight"][ids]
        cls = jnp.broadcast_to(params["cls_embeddings"]["weight"][None],
                               (B, n_cls_tokens, tok.shape[-1])).astype(tok.dtype)
        x = jnp.concatenate([cls, tok], axis=1)
        att_full = jnp.concatenate(
            [jnp.ones((B, n_cls_tokens), att.dtype), att], axis=1)
        hidden = roberta_encode(params["roberta"], rcfg, None, att_full,
                                inputs_embeds=x)
        hidden = hidden[:, :n_cls_tokens, :]        # CLS states only
        n_src = n_cls_tokens
    else:
        hidden = roberta_encode(params["roberta"], rcfg, ids, att)
        n_src = L

    n = ecfg.n_embedding_tokens
    if ecfg.projection_method == "concat":
        out = hidden.reshape(B, n, (n_src // n) * rcfg.hidden_size)
    else:
        ksz = n_src // n
        grouped = hidden.reshape(B, n, ksz * rcfg.hidden_size)
        kern = params["projection"]["kernel"].reshape(
            ksz * rcfg.hidden_size, -1)
        out = jnp.dot(grouped, kern, preferred_element_type=hidden.dtype)
        out = out + params["projection"]["bias"].astype(out.dtype)
    return out.reshape(lead + (n, -1))
