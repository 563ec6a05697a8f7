"""T5 encoder/decoder stacks (reference ablations).

Functional JAX implementation matching HF ``T5Stack`` numerics: RMSNorm
(pre-LN, no bias), bias-free linears, relative-position-bucket attention
bias computed in layer 0 and shared down the stack, NO 1/sqrt(d) attention
scaling, ReLU MLP (t5-base v1.0). Serves:

- ``T5Embedder`` (model/embedder/t5.py:11-83): encoder over the block's
  tokens + Base projection,
- ``T5TokenDecoder`` (model/token_decoder/t5.py:14-131): decoder-only stack
  whose cross-attention attends to the expanded block embeddings (the
  ``cross_attention`` decoding strategy), logits rescaled by d_model^-0.5
  when embeddings are tied (token_decoder/base.py:306-309).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from block_transformer_tpu.ops import linear as linear_ops


@dataclass(frozen=True)
class T5Config:
    vocab_size: int = 32128
    d_model: int = 768
    d_kv: int = 64
    d_ff: int = 3072
    num_layers: int = 12
    num_heads: int = 12
    relative_attention_num_buckets: int = 32
    relative_attention_max_distance: int = 128
    layer_norm_eps: float = 1e-6
    tie_word_embeddings: bool = True
    pad_token_id: int = 0
    eos_token_id: int = 1
    bos_token_id: int = 0  # decoder_start_token_id


def rms_norm(x, scale, eps):
    x32 = x.astype(jnp.float32)
    var = jnp.mean(jnp.square(x32), axis=-1, keepdims=True)
    return (x32 * jax.lax.rsqrt(var + eps) * scale.astype(jnp.float32)
            ).astype(x.dtype)


def relative_position_bucket(rel_pos, bidirectional: bool, num_buckets: int,
                             max_distance: int):
    """HF T5 _relative_position_bucket semantics (log-spaced buckets)."""
    ret = jnp.zeros_like(rel_pos)
    n = -rel_pos
    if bidirectional:
        num_buckets //= 2
        ret = ret + (n < 0).astype(jnp.int32) * num_buckets
        n = jnp.abs(n)
    else:
        n = jnp.maximum(n, 0)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    val_if_large = max_exact + (
        jnp.log(n.astype(jnp.float32) / max_exact + 1e-9)
        / jnp.log(max_distance / max_exact) * (num_buckets - max_exact)
    ).astype(jnp.int32)
    val_if_large = jnp.minimum(val_if_large, num_buckets - 1)
    return ret + jnp.where(is_small, n, val_if_large)


def _init_dense(key, shape, std, dtype):
    return {"kernel": (std * jax.random.normal(key, shape, jnp.float32)
                       ).astype(dtype)}


def init_t5_stack_params(key, cfg: T5Config, *, is_decoder: bool,
                         with_embed: bool = True, dtype=jnp.float32):
    d, inner = cfg.d_model, cfg.num_heads * cfg.d_kv
    ks = jax.random.split(key, 4)

    def layer(k):
        kk = jax.random.split(k, 12)
        p = {
            "self_attn": {"q": _init_dense(kk[0], (d, inner), d ** -0.5, dtype),
                          "k": _init_dense(kk[1], (d, inner), d ** -0.5, dtype),
                          "v": _init_dense(kk[2], (d, inner), d ** -0.5, dtype),
                          "o": _init_dense(kk[3], (inner, d), inner ** -0.5, dtype)},
            "self_ln": {"scale": jnp.ones((d,), dtype)},
            "mlp": {"wi": _init_dense(kk[4], (d, cfg.d_ff), d ** -0.5, dtype),
                    "wo": _init_dense(kk[5], (cfg.d_ff, d), cfg.d_ff ** -0.5,
                                      dtype)},
            "mlp_ln": {"scale": jnp.ones((d,), dtype)},
        }
        if is_decoder:
            p["cross_attn"] = {
                "q": _init_dense(kk[6], (d, inner), d ** -0.5, dtype),
                "k": _init_dense(kk[7], (d, inner), d ** -0.5, dtype),
                "v": _init_dense(kk[8], (d, inner), d ** -0.5, dtype),
                "o": _init_dense(kk[9], (inner, d), inner ** -0.5, dtype)}
            p["cross_ln"] = {"scale": jnp.ones((d,), dtype)}
        return p

    layers = [layer(jax.random.fold_in(ks[0], i)) for i in range(cfg.num_layers)]
    params = {
        "layers": jax.tree.map(lambda *xs: jnp.stack(xs, 0), *layers),
        "rel_bias": {"weight": (d ** -0.5 * jax.random.normal(
            ks[1], (cfg.relative_attention_num_buckets, cfg.num_heads),
            jnp.float32)).astype(dtype)},
        "final_ln": {"scale": jnp.ones((d,), dtype)},
    }
    if with_embed:
        params["embed"] = {"weight": (1.0 * jax.random.normal(
            ks[2], (cfg.vocab_size, d), jnp.float32)).astype(dtype)}
    return params


def _mha(x_q, x_kv, p, cfg: T5Config, bias):
    """T5 attention: no scaling, no biases. bias: [B or 1, H, Q, K] fp32."""
    B, Q, _ = x_q.shape
    K = x_kv.shape[1]
    H, D = cfg.num_heads, cfg.d_kv

    def proj(x, w):
        y = linear_ops.apply_linear(x, w)
        return y.reshape(x.shape[0], -1, H, D).transpose(0, 2, 1, 3)

    q = proj(x_q, p["q"])
    k = proj(x_kv, p["k"])
    v = proj(x_kv, p["v"])
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32)
    probs = jax.nn.softmax(scores + bias, axis=-1).astype(x_q.dtype)
    ctx = jnp.einsum("bhqk,bhkd->bhqd", probs, v,
                     preferred_element_type=jnp.float32).astype(x_q.dtype)
    ctx = ctx.transpose(0, 2, 1, 3).reshape(B, Q, H * D)
    return linear_ops.apply_linear(ctx, p["o"])


def t5_stack(params, cfg: T5Config, *, input_ids=None, inputs_embeds=None,
             attention_mask=None, is_decoder: bool,
             encoder_hidden_states=None, encoder_attention_mask=None):
    """Forward a T5 encoder or decoder stack; returns hidden [B, S, d]."""
    if inputs_embeds is None:
        x = params["embed"]["weight"][input_ids]
    else:
        x = inputs_embeds
    B, S, _ = x.shape
    if attention_mask is None:
        attention_mask = jnp.ones((B, S), jnp.int32)

    pos = jnp.arange(S)
    rel = pos[None, :] - pos[:, None]                     # key - query
    buckets = relative_position_bucket(
        rel, bidirectional=not is_decoder,
        num_buckets=cfg.relative_attention_num_buckets,
        max_distance=cfg.relative_attention_max_distance)
    pos_bias = params["rel_bias"]["weight"][buckets].transpose(2, 0, 1)[None]
    pos_bias = pos_bias.astype(jnp.float32)               # [1, H, S, S]
    pad_bias = jnp.where(attention_mask[:, None, None, :] != 0, 0.0, -1e30)
    self_bias = pos_bias + pad_bias
    if is_decoder:
        causal = jnp.tril(jnp.ones((S, S), bool))
        self_bias = self_bias + jnp.where(causal, 0.0, -1e30)[None, None]

    cross_bias = None
    if is_decoder and encoder_hidden_states is not None:
        if encoder_attention_mask is None:
            encoder_attention_mask = jnp.ones(
                encoder_hidden_states.shape[:2], jnp.int32)
        cross_bias = jnp.where(
            encoder_attention_mask[:, None, None, :] != 0, 0.0, -1e30
        ).astype(jnp.float32)

    def body(h, p):
        normed = rms_norm(h, p["self_ln"]["scale"], cfg.layer_norm_eps)
        h = h + _mha(normed, normed, p["self_attn"], cfg, self_bias)
        if is_decoder and encoder_hidden_states is not None:
            c = _mha(rms_norm(h, p["cross_ln"]["scale"], cfg.layer_norm_eps),
                     encoder_hidden_states, p["cross_attn"], cfg, cross_bias)
            h = h + c
        m = rms_norm(h, p["mlp_ln"]["scale"], cfg.layer_norm_eps)
        m = linear_ops.apply_linear(
            jax.nn.relu(linear_ops.apply_linear(m, p["mlp"]["wi"])),
            p["mlp"]["wo"])
        h = h + m
        return h, None

    x, _ = jax.lax.scan(body, x, params["layers"])
    return rms_norm(x, params["final_ln"]["scale"], cfg.layer_norm_eps)


def t5_lm_logits(params, cfg: T5Config, hidden):
    """Tied-head logits with the d_model^-0.5 rescale
    (token_decoder/base.py:306-309)."""
    if cfg.tie_word_embeddings:
        hidden = hidden * (cfg.d_model ** -0.5)
        return jnp.einsum("bsd,vd->bsv", hidden.astype(jnp.float32),
                          params["embed"]["weight"].astype(jnp.float32))
    return linear_ops.apply_linear(hidden, params["lm_head"]).astype(jnp.float32)
