"""GPT-Neo stack + block/token decoder variants (reference ablations).

Functional JAX implementation matching HF ``GPTNeoForCausalLM`` numerics:
learned absolute positions, pre-LN blocks with serial residuals, bias-free
Q/K/V projections (out/MLP have biases), **unscaled** attention scores (the
GPT-Neo quirk), tanh-approximated GELU ("gelu_new"), tied LM head, and
alternating global/local attention layers (local = causal band of
``window_size``).

Reference counterparts: model/block_decoder/gpt_neo.py (block-causal mask
with the local-window band XOR for local layers, :12-128) and
model/token_decoder/gpt_neo.py.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp

from block_transformer_tpu.models.neox import layer_norm
from block_transformer_tpu.ops import linear as linear_ops
from block_transformer_tpu.ops import masks as masks_lib


@dataclass(frozen=True)
class GPTNeoConfig:
    vocab_size: int = 50257
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 2048
    window_size: int = 256
    attention_layers: Tuple[str, ...] = ()   # per-layer "global"/"local";
    # default alternates starting with global (HF attention_types [[...]])
    layer_norm_eps: float = 1e-5
    initializer_range: float = 0.02
    bos_token_id: int = 50256
    eos_token_id: int = 50256
    pad_token_id: int = 50256

    def layer_types(self):
        if self.attention_layers:
            return self.attention_layers
        return tuple("global" if i % 2 == 0 else "local"
                     for i in range(self.num_layers))


def init_gpt_neo_params(key, cfg: GPTNeoConfig, *, with_embed=True,
                        with_lm_head=True, dtype=jnp.float32):
    h, m = cfg.hidden_size, cfg.intermediate_size
    std = cfg.initializer_range
    ks = jax.random.split(key, 4)

    def dense(k, shape, bias=True):
        p = {"kernel": (std * jax.random.normal(k, shape, jnp.float32)
                        ).astype(dtype)}
        if bias:
            p["bias"] = jnp.zeros((shape[-1],), dtype)
        return p

    def ln():
        return {"scale": jnp.ones((h,), dtype), "bias": jnp.zeros((h,), dtype)}

    def layer(k):
        kk = jax.random.split(k, 6)
        return {
            "ln1": ln(), "ln2": ln(),
            "attn": {"q": dense(kk[0], (h, h), bias=False),
                     "k": dense(kk[1], (h, h), bias=False),
                     "v": dense(kk[2], (h, h), bias=False),
                     "out": dense(kk[3], (h, h))},
            "mlp": {"up": dense(kk[4], (h, m)), "down": dense(kk[5], (m, h))},
        }

    layers = [layer(jax.random.fold_in(ks[0], i)) for i in range(cfg.num_layers)]
    params = {
        "layers": jax.tree.map(lambda *xs: jnp.stack(xs, 0), *layers),
        "final_ln": ln(),
    }
    if with_embed:
        params["wte"] = {"weight": (std * jax.random.normal(
            ks[1], (cfg.vocab_size, h), jnp.float32)).astype(dtype)}
        params["wpe"] = {"weight": (std * jax.random.normal(
            ks[2], (cfg.max_position_embeddings, h), jnp.float32)).astype(dtype)}
    return params


def _local_band_ok(q_idx, kv_idx, window: int):
    """GPT-Neo local attention: key within (query - window, query]."""
    diff = q_idx[:, :, None] - kv_idx[None, None, :]
    return (diff >= 0) & (diff < window)


def gpt_neo_stack(params, cfg: GPTNeoConfig, x, mask: masks_lib.AttnMask,
                  positions):
    """x: [B, S, h] (embeddings incl. positions added by caller)."""
    B, S, _ = x.shape
    H = cfg.num_heads
    D = cfg.hidden_size // H
    base_ok = mask.allowed()                      # [B or 1, Q, K]
    q_idx = mask.q_idx if mask.q_idx.ndim == 2 else mask.q_idx[None]
    local_ok = base_ok & _local_band_ok(q_idx, mask.kv_idx, cfg.window_size)
    bias_global = jnp.where(base_ok, 0.0, -1e30)[:, None].astype(jnp.float32)
    bias_local = jnp.where(local_ok, 0.0, -1e30)[:, None].astype(jnp.float32)

    types = cfg.layer_types()
    is_local = jnp.asarray([t == "local" for t in types], jnp.bool_)

    def body(h, layer_in):
        p, loc = layer_in
        a_in = layer_norm(h, p["ln1"], cfg.layer_norm_eps)

        def proj(name):
            y = linear_ops.apply_linear(a_in, p["attn"][name])
            return y.reshape(B, S, H, D).transpose(0, 2, 1, 3)

        q, k, v = proj("q"), proj("k"), proj("v")
        scores = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32),
                            k.astype(jnp.float32))  # UNSCALED (GPT-Neo)
        bias = jnp.where(loc, bias_local, bias_global)
        probs = jax.nn.softmax(scores + bias, axis=-1).astype(h.dtype)
        ctx = jnp.einsum("bhqk,bhkd->bhqd", probs, v,
                         preferred_element_type=jnp.float32).astype(h.dtype)
        ctx = ctx.transpose(0, 2, 1, 3).reshape(B, S, H * D)
        h = h + linear_ops.apply_linear(ctx, p["attn"]["out"])
        m_in = layer_norm(h, p["ln2"], cfg.layer_norm_eps)
        mlp = linear_ops.apply_linear(
            jax.nn.gelu(linear_ops.apply_linear(m_in, p["mlp"]["up"]),
                        approximate=True),        # gelu_new (tanh approx)
            p["mlp"]["down"])
        return h + mlp, None

    x, _ = jax.lax.scan(body, x, (params["layers"], is_local))
    return layer_norm(x, params["final_ln"], cfg.layer_norm_eps)


def gpt_neo_forward(params, cfg: GPTNeoConfig, input_ids, attention_mask=None):
    """Vanilla GPT-Neo LM: [B, S] -> logits [B, S, V] fp32 (tied head)."""
    B, S = input_ids.shape
    pos = jnp.arange(S, dtype=jnp.int32)
    x = params["wte"]["weight"][input_ids] + params["wpe"]["weight"][pos][None]
    mask = masks_lib.causal_mask(pos, pos, kv_valid=attention_mask)
    h = gpt_neo_stack(params, cfg, x, mask, pos)
    return jnp.einsum("bsh,vh->bsv", h.astype(jnp.float32),
                      params["wte"]["weight"].astype(jnp.float32))


def gpt_neo_stack_cached(params, cfg: GPTNeoConfig, x,
                         mask: masks_lib.AttnMask, positions, cache):
    """Cached decode stack (neox-style carried cache, no RoPE — learned
    positions are already in ``x``). cache: models/neox.KVCache with
    capacity K; mask index vectors span the capacity. Local layers XOR the
    causal band exactly as the uncached stack."""
    from block_transformer_tpu.models import neox
    B, S, _ = x.shape
    H = cfg.num_heads
    D = cfg.hidden_size // H
    base_ok = mask.allowed()
    q_idx = mask.q_idx if mask.q_idx.ndim == 2 else mask.q_idx[None]
    local_ok = base_ok & _local_band_ok(q_idx, mask.kv_idx, cfg.window_size)
    bias_global = jnp.where(base_ok, 0.0, -1e30)[:, None].astype(jnp.float32)
    bias_local = jnp.where(local_ok, 0.0, -1e30)[:, None].astype(jnp.float32)
    is_local = jnp.asarray([t == "local" for t in cfg.layer_types()],
                           jnp.bool_)
    layers = params["layers"]

    def body(carry, layer_in):
        h, ck, cv = carry
        i, loc = layer_in
        p = neox.layer_view(layers, i)
        a_in = layer_norm(h, p["ln1"], cfg.layer_norm_eps)

        def proj(name):
            y = linear_ops.apply_linear(a_in, p["attn"][name])
            return y.reshape(B, S, H, D).transpose(0, 2, 1, 3)

        q, k, v = proj("q"), proj("k"), proj("v")
        ck = neox._write_kv(ck, k, i, cache.length)
        cv = neox._write_kv(cv, v, i, cache.length)
        k_all = jax.lax.dynamic_index_in_dim(ck, i, 0, keepdims=False)
        v_all = jax.lax.dynamic_index_in_dim(cv, i, 0, keepdims=False)
        scores = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32),
                            k_all.astype(jnp.float32))   # UNSCALED (GPT-Neo)
        bias = jnp.where(loc, bias_local, bias_global)
        probs = jax.nn.softmax(scores + bias, axis=-1).astype(h.dtype)
        ctx = jnp.einsum("bhqk,bhkd->bhqd", probs, v_all.astype(h.dtype),
                         preferred_element_type=jnp.float32).astype(h.dtype)
        ctx = ctx.transpose(0, 2, 1, 3).reshape(B, S, H * D)
        h = h + linear_ops.apply_linear(ctx, p["attn"]["out"])
        m_in = layer_norm(h, p["ln2"], cfg.layer_norm_eps)
        mlp = linear_ops.apply_linear(
            jax.nn.gelu(linear_ops.apply_linear(m_in, p["mlp"]["up"]),
                        approximate=True), p["mlp"]["down"])
        return (h + mlp, ck, cv), None

    idx = jnp.arange(cfg.num_layers, dtype=jnp.int32)
    (h, nk, nv), _ = jax.lax.scan(body, (x, cache.k, cache.v),
                                  (idx, is_local))
    from block_transformer_tpu.models.neox import KVCache
    new_cache = KVCache(nk, nv, cache.length + S)
    return layer_norm(h, params["final_ln"], cfg.layer_norm_eps), new_cache


# ---------------------------------------------------------------------------
# Block/token decoder variants
# ---------------------------------------------------------------------------

def gpt_neo_block_decoder_forward(params, cfg: GPTNeoConfig, inputs_embeds,
                                  block_attention_mask,
                                  n_embedding_tokens: int):
    """Block decoder on GPT-Neo: block-causal mask; local layers restrict to
    a block-granular window (gpt_neo.py:21-23 semantics). No token/position
    embeddings — inputs are block embeddings + learned positions."""
    B, S, _ = inputs_embeds.shape
    pos = jnp.arange(S, dtype=jnp.int32)
    x = inputs_embeds + params["wpe"]["weight"][pos][None].astype(inputs_embeds.dtype)
    mask = masks_lib.block_decoder_train_mask(block_attention_mask,
                                              n_embedding_tokens)
    return gpt_neo_stack(params, cfg, x, mask, pos)


def gpt_neo_token_decoder_forward(params, cfg: GPTNeoConfig, inputs_embeds,
                                  mask: masks_lib.AttnMask):
    """Token decoder core: embeds (with prefix already adapted) -> hidden."""
    B, S, _ = inputs_embeds.shape
    pos = jnp.arange(S, dtype=jnp.int32)
    x = inputs_embeds + params["wpe"]["weight"][pos][None].astype(inputs_embeds.dtype)
    return gpt_neo_stack(params, cfg, x, mask, pos)
