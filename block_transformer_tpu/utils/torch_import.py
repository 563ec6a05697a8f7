"""Import reference (PyTorch/HF) checkpoints into our parameter pytrees.

Handles the reference's two on-disk layouts (SURVEY.md §5.4):

- per-component HF ``save_pretrained`` dirs ``{embedder,block_decoder,
  token_decoder}/model.safetensors`` (pretrain_block_transformer.py:145-155),
- HF ``Trainer`` combined checkpoints ``checkpoint-<step>/model.safetensors``
  with ``embedder.`` / ``block_decoder.`` / ``token_decoder.`` name prefixes.

Layout conversions (torch stores Linear weights ``[out, in]``; we store
``[in, out]``; HF's fused QKV interleaves per head as ``(head, q|k|v, dim)``
while we use ``(q|k|v, head, dim)`` — see models/neox.py docstring).
"""

from __future__ import annotations

import os
from typing import Dict, Mapping

import jax.numpy as jnp
import numpy as np

from block_transformer_tpu.config import (BlockTransformerConfig, NeoXConfig,
                                          TokenDecoderConfig)


def _np(x):
    if hasattr(x, "detach"):
        x = x.detach().cpu().float().numpy()
    return np.asarray(x)


def _convert_qkv_weight(w, num_heads: int, head_dim: int):
    """HF [3h, h] with row order (head, qkv, dim) -> ours [h, 3h] with column
    order (qkv, head, dim)."""
    h = num_heads * head_dim
    w = _np(w).reshape(num_heads, 3, head_dim, h)
    w = w.transpose(3, 1, 0, 2).reshape(h, 3 * h)
    return w


def _convert_qkv_bias(b, num_heads: int, head_dim: int):
    b = _np(b).reshape(num_heads, 3, head_dim)
    return b.transpose(1, 0, 2).reshape(3 * num_heads * head_dim)


def neox_params_from_state_dict(sd: Mapping[str, np.ndarray], cfg: NeoXConfig,
                                *, prefix: str = "", with_embed_in=True,
                                with_lm_head=True, dtype=jnp.float32):
    """Convert a GPTNeoXForCausalLM-style state dict to our stacked pytree."""
    H, D = cfg.num_heads, cfg.head_dim
    g = prefix + "gpt_neox."

    def get(name):
        return _np(sd[name])

    layers = {"ln1": {"scale": [], "bias": []}, "ln2": {"scale": [], "bias": []},
              "attn": {"qkv": {"kernel": [], "bias": []},
                       "out": {"kernel": [], "bias": []}},
              "mlp": {"up": {"kernel": [], "bias": []},
                      "down": {"kernel": [], "bias": []}}}
    for i in range(cfg.num_layers):
        l = f"{g}layers.{i}."
        layers["ln1"]["scale"].append(get(l + "input_layernorm.weight"))
        layers["ln1"]["bias"].append(get(l + "input_layernorm.bias"))
        layers["ln2"]["scale"].append(get(l + "post_attention_layernorm.weight"))
        layers["ln2"]["bias"].append(get(l + "post_attention_layernorm.bias"))
        layers["attn"]["qkv"]["kernel"].append(
            _convert_qkv_weight(sd[l + "attention.query_key_value.weight"], H, D))
        layers["attn"]["qkv"]["bias"].append(
            _convert_qkv_bias(sd[l + "attention.query_key_value.bias"], H, D))
        layers["attn"]["out"]["kernel"].append(get(l + "attention.dense.weight").T)
        layers["attn"]["out"]["bias"].append(get(l + "attention.dense.bias"))
        layers["mlp"]["up"]["kernel"].append(get(l + "mlp.dense_h_to_4h.weight").T)
        layers["mlp"]["up"]["bias"].append(get(l + "mlp.dense_h_to_4h.bias"))
        layers["mlp"]["down"]["kernel"].append(get(l + "mlp.dense_4h_to_h.weight").T)
        layers["mlp"]["down"]["bias"].append(get(l + "mlp.dense_4h_to_h.bias"))

    import jax
    stacked = jax.tree.map(lambda xs: jnp.asarray(np.stack(xs), dtype), layers,
                           is_leaf=lambda x: isinstance(x, list))
    params = {
        "layers": stacked,
        "final_ln": {"scale": jnp.asarray(get(g + "final_layer_norm.weight"), dtype),
                     "bias": jnp.asarray(get(g + "final_layer_norm.bias"), dtype)},
    }
    if with_embed_in:
        params["embed_in"] = {
            "weight": jnp.asarray(get(g + "embed_in.weight"), dtype)}
    if with_lm_head:
        params["embed_out"] = {
            "kernel": jnp.asarray(get(prefix + "embed_out.weight").T, dtype)}
    return params


def embedder_params_from_state_dict(sd: Mapping[str, np.ndarray], *,
                                    prefix: str = "", dtype=jnp.float32):
    params = {"embeddings": {
        "weight": jnp.asarray(_np(sd[prefix + "embeddings.weight"]), dtype)}}
    conv_key = prefix + "projection_layer.weight"
    if conv_key in sd:
        w = _np(sd[conv_key])            # [ph, hidden, k]
        params["projection"] = {
            "kernel": jnp.asarray(w.transpose(2, 1, 0), dtype),
            "bias": jnp.asarray(_np(sd[prefix + "projection_layer.bias"]), dtype)}
    return params


def token_decoder_params_from_state_dict(sd, cfg: TokenDecoderConfig, *,
                                         prefix: str = "", dtype=jnp.float32):
    params = neox_params_from_state_dict(sd, cfg.neox, prefix=prefix,
                                         with_embed_in=True, with_lm_head=True,
                                         dtype=dtype)
    exp_key = prefix + "expansion_layer.weight"
    if exp_key in sd:
        w = _np(sd[exp_key])             # [h*ratio, ph, 1] (Conv1d k=1)
        params["expansion"] = {
            "kernel": jnp.asarray(w[:, :, 0].T, dtype),
            "bias": jnp.asarray(_np(sd[prefix + "expansion_layer.bias"]), dtype)}
    return params


def roberta_params_from_state_dict(sd: Mapping[str, np.ndarray], num_layers: int,
                                   *, prefix: str = "", dtype=jnp.float32):
    """HF RobertaModel state dict -> models/roberta.py pytree."""
    import jax

    def get(name):
        return _np(sd[prefix + name])

    layers = []
    for i in range(num_layers):
        l = f"encoder.layer.{i}."
        layers.append({
            "attn": {
                "q": {"kernel": get(l + "attention.self.query.weight").T,
                      "bias": get(l + "attention.self.query.bias")},
                "k": {"kernel": get(l + "attention.self.key.weight").T,
                      "bias": get(l + "attention.self.key.bias")},
                "v": {"kernel": get(l + "attention.self.value.weight").T,
                      "bias": get(l + "attention.self.value.bias")},
                "out": {"kernel": get(l + "attention.output.dense.weight").T,
                        "bias": get(l + "attention.output.dense.bias")},
            },
            "attn_ln": {"scale": get(l + "attention.output.LayerNorm.weight"),
                        "bias": get(l + "attention.output.LayerNorm.bias")},
            "mlp": {"up": {"kernel": get(l + "intermediate.dense.weight").T,
                           "bias": get(l + "intermediate.dense.bias")},
                    "down": {"kernel": get(l + "output.dense.weight").T,
                             "bias": get(l + "output.dense.bias")}},
            "mlp_ln": {"scale": get(l + "output.LayerNorm.weight"),
                       "bias": get(l + "output.LayerNorm.bias")},
        })
    stacked = jax.tree.map(lambda *xs: jnp.asarray(np.stack(xs), dtype), *layers)
    return {
        "word_embeddings": {"weight": jnp.asarray(
            get("embeddings.word_embeddings.weight"), dtype)},
        "position_embeddings": {"weight": jnp.asarray(
            get("embeddings.position_embeddings.weight"), dtype)},
        "token_type_embeddings": {"weight": jnp.asarray(
            get("embeddings.token_type_embeddings.weight"), dtype)},
        "embed_ln": {"scale": jnp.asarray(get("embeddings.LayerNorm.weight"), dtype),
                     "bias": jnp.asarray(get("embeddings.LayerNorm.bias"), dtype)},
        "layers": stacked,
    }


def t5_stack_params_from_state_dict(sd: Mapping[str, np.ndarray],
                                    num_layers: int, *, is_decoder: bool,
                                    prefix: str = "", dtype=jnp.float32):
    """HF T5Stack state dict (e.g. ``encoder.`` / ``decoder.`` sub-tree of a
    T5Model) -> models/t5.py pytree. T5 linears have no bias; kernels
    transpose to [in, out]."""
    import jax

    def get(name):
        return _np(sd[prefix + name])

    def dense(name):
        return {"kernel": jnp.asarray(get(name + ".weight").T, dtype)}

    layers = []
    for i in range(num_layers):
        b = f"block.{i}."
        p = {
            "self_attn": {"q": dense(b + "layer.0.SelfAttention.q"),
                          "k": dense(b + "layer.0.SelfAttention.k"),
                          "v": dense(b + "layer.0.SelfAttention.v"),
                          "o": dense(b + "layer.0.SelfAttention.o")},
            "self_ln": {"scale": jnp.asarray(
                get(b + "layer.0.layer_norm.weight"), dtype)},
        }
        if is_decoder:
            p["cross_attn"] = {"q": dense(b + "layer.1.EncDecAttention.q"),
                               "k": dense(b + "layer.1.EncDecAttention.k"),
                               "v": dense(b + "layer.1.EncDecAttention.v"),
                               "o": dense(b + "layer.1.EncDecAttention.o")}
            p["cross_ln"] = {"scale": jnp.asarray(
                get(b + "layer.1.layer_norm.weight"), dtype)}
            ff = b + "layer.2."
        else:
            ff = b + "layer.1."
        p["mlp"] = {"wi": dense(ff + "DenseReluDense.wi"),
                    "wo": dense(ff + "DenseReluDense.wo")}
        p["mlp_ln"] = {"scale": jnp.asarray(get(ff + "layer_norm.weight"),
                                            dtype)}
        layers.append(p)

    import jax
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs, 0), *layers)
    params = {
        "layers": stacked,
        "rel_bias": {"weight": jnp.asarray(get(
            "block.0.layer.0.SelfAttention.relative_attention_bias.weight"),
            dtype)},
        "final_ln": {"scale": jnp.asarray(get("final_layer_norm.weight"),
                                          dtype)},
    }
    emb_key = prefix + "embed_tokens.weight"
    if emb_key in sd:
        params["embed"] = {"weight": jnp.asarray(_np(sd[emb_key]), dtype)}
    elif "shared.weight" in sd:
        params["embed"] = {"weight": jnp.asarray(_np(sd["shared.weight"]),
                                                 dtype)}
    return params


def block_transformer_params_from_state_dict(sd, cfg: BlockTransformerConfig,
                                             dtype=jnp.float32):
    """Combined Trainer-checkpoint state dict (prefixed component names)."""
    return {
        "embedder": embedder_params_from_state_dict(sd, prefix="embedder.",
                                                    dtype=dtype),
        "block_decoder": neox_params_from_state_dict(
            sd, cfg.block_decoder, prefix="block_decoder.",
            with_embed_in=False, with_lm_head=False, dtype=dtype),
        "token_decoder": token_decoder_params_from_state_dict(
            sd, cfg.token_decoder, prefix="token_decoder.", dtype=dtype),
    }


def _load_safetensors_dir(path: str) -> Dict[str, np.ndarray]:
    """Load all *.safetensors under a dir into one numpy state dict."""
    from safetensors.numpy import load_file
    sd: Dict[str, np.ndarray] = {}
    for fn in sorted(os.listdir(path)):
        if fn.endswith(".safetensors"):
            sd.update(load_file(os.path.join(path, fn)))
    if not sd:
        raise FileNotFoundError(f"no .safetensors files under {path}")
    return sd


def load_checkpoint(path: str, cfg: BlockTransformerConfig, dtype=jnp.bfloat16):
    """Load either checkpoint layout from ``path``.

    Per-component layout: path contains embedder/ block_decoder/
    token_decoder/ subdirs. Combined layout: path contains model.safetensors
    with prefixed keys.
    """
    if os.path.isdir(os.path.join(path, "embedder")):
        return {
            "embedder": embedder_params_from_state_dict(
                _load_safetensors_dir(os.path.join(path, "embedder")), dtype=dtype),
            "block_decoder": neox_params_from_state_dict(
                _load_safetensors_dir(os.path.join(path, "block_decoder")),
                cfg.block_decoder, with_embed_in=False, with_lm_head=False,
                dtype=dtype),
            "token_decoder": token_decoder_params_from_state_dict(
                _load_safetensors_dir(os.path.join(path, "token_decoder")),
                cfg.token_decoder, dtype=dtype),
        }
    sd = _load_safetensors_dir(path)
    return block_transformer_params_from_state_dict(sd, cfg, dtype=dtype)


def gpt_neo_params_from_state_dict(sd, num_layers: int, *, prefix: str = "",
                                   dtype=jnp.float32):
    """HF GPTNeoForCausalLM/GPTNeoModel state dict -> models/gpt_neo.py tree."""
    import jax

    g = prefix + ("transformer." if any(k.startswith(prefix + "transformer.")
                                        for k in sd) else "")

    def get(name):
        return _np(sd[g + name])

    def dense(name, bias=True):
        p = {"kernel": jnp.asarray(get(name + ".weight").T, dtype)}
        if bias:
            p["bias"] = jnp.asarray(get(name + ".bias"), dtype)
        return p

    layers = []
    for i in range(num_layers):
        b = f"h.{i}."
        layers.append({
            "ln1": {"scale": jnp.asarray(get(b + "ln_1.weight"), dtype),
                    "bias": jnp.asarray(get(b + "ln_1.bias"), dtype)},
            "ln2": {"scale": jnp.asarray(get(b + "ln_2.weight"), dtype),
                    "bias": jnp.asarray(get(b + "ln_2.bias"), dtype)},
            "attn": {
                "q": dense(b + "attn.attention.q_proj", bias=False),
                "k": dense(b + "attn.attention.k_proj", bias=False),
                "v": dense(b + "attn.attention.v_proj", bias=False),
                "out": dense(b + "attn.attention.out_proj"),
            },
            "mlp": {"up": dense(b + "mlp.c_fc"),
                    "down": dense(b + "mlp.c_proj")},
        })
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs, 0), *layers)
    return {
        "layers": stacked,
        "final_ln": {"scale": jnp.asarray(get("ln_f.weight"), dtype),
                     "bias": jnp.asarray(get("ln_f.bias"), dtype)},
        "wte": {"weight": jnp.asarray(get("wte.weight"), dtype)},
        "wpe": {"weight": jnp.asarray(get("wpe.weight"), dtype)},
    }
