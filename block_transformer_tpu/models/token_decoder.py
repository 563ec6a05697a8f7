"""Token decoder: within-block decoding conditioned on a block embedding.

TPU-native counterpart of the reference's BaseTokenDecoder/
GPTNeoXTokenDecoder (model/token_decoder/base.py, gpt_neo_x.py). Two
decoding strategies (base.py:289-293):

- **prefix** (the main-config strategy): the block embedding is expanded to
  ``n_expanded_emb = n_embedding_tokens * expansion_ratio`` prefix input
  embeddings via a kernel-1 Conv1d == dense ``[projection_hidden,
  hidden*expansion_ratio]`` (base.py:61-68, init std projection_hidden^-0.5
  per base.py:455-459); the BOS the caller provides is *dropped* and the
  prefix takes its place (base.py:461-502).
- **summation**: the expanded embedding (one vector per block position) is
  added positionwise to the token embeddings; prefix stays BOS
  (base.py:504-536).

The training forward mirrors ``discard_redundant_tokens`` semantics
(base.py:276-343) with static shapes: the last input token is statically
dropped so exactly ``block_length`` logit positions are produced per block
(predicting x1..xB); data-dependent redundant positions are handled by loss
masking rather than gather.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from block_transformer_tpu.config import TokenDecoderConfig
from block_transformer_tpu.models import neox
from block_transformer_tpu.ops import masks


def _t5_cfg(cfg: TokenDecoderConfig):
    from block_transformer_tpu.models.t5 import T5Config
    n = cfg.neox
    return T5Config(vocab_size=n.vocab_size, d_model=n.hidden_size,
                    d_kv=n.head_dim, d_ff=n.intermediate_size,
                    num_layers=n.num_layers, num_heads=n.num_heads,
                    pad_token_id=n.pad_token_id, eos_token_id=n.eos_token_id)


def _gpt_neo_cfg(cfg: TokenDecoderConfig):
    from block_transformer_tpu.models.gpt_neo import GPTNeoConfig
    n = cfg.neox
    return GPTNeoConfig(vocab_size=n.vocab_size, hidden_size=n.hidden_size,
                        num_layers=n.num_layers, num_heads=n.num_heads,
                        intermediate_size=n.intermediate_size,
                        max_position_embeddings=n.max_position_embeddings,
                        pad_token_id=n.pad_token_id,
                        eos_token_id=n.eos_token_id)


def init_token_decoder_params(key, cfg: TokenDecoderConfig, projection_hidden_size: int,
                              dtype=jnp.float32):
    k_stack, k_exp = jax.random.split(key)
    if cfg.cls == "t5":
        from block_transformer_tpu.models import t5 as t5m
        params = {"t5": t5m.init_t5_stack_params(k_stack, _t5_cfg(cfg),
                                                 is_decoder=True, dtype=dtype)}
    elif cfg.cls == "gpt-neo":
        from block_transformer_tpu.models import gpt_neo as gn
        params = {"gpt_neo": gn.init_gpt_neo_params(
            k_stack, _gpt_neo_cfg(cfg), with_embed=True, dtype=dtype)}
    else:
        params = neox.init_neox_params(k_stack, cfg.neox, with_embed_in=True,
                                       with_lm_head=True, dtype=dtype)
    if cfg.expansion_method == "expansion_layer":
        h = cfg.neox.hidden_size
        std = projection_hidden_size ** -0.5
        params["expansion"] = {
            "kernel": (std * jax.random.normal(
                k_exp, (projection_hidden_size, h * cfg.expansion_ratio),
                jnp.float32)).astype(dtype),
            "bias": jnp.zeros((h * cfg.expansion_ratio,), dtype),
        }
    return params


def expand_block_embeddings(params, cfg: TokenDecoderConfig, block_embeddings,
                            expansion_ratio: int):
    """[..., n_emb, projection_hidden] -> [..., n_emb * ratio, hidden].

    Mirrors BaseTokenDecoder.expand_block_embeddings (base.py:118-139).
    """
    h = cfg.neox.hidden_size
    lead = block_embeddings.shape[:-2]
    n_emb = block_embeddings.shape[-2]
    if cfg.expansion_method == "expansion_layer":
        from block_transformer_tpu.ops import linear as linear_ops
        out = linear_ops.apply_linear(block_embeddings, params["expansion"])
        # [..., n_emb, h*ratio] -> [..., n_emb*ratio, h]
        return out.reshape(lead + (n_emb * expansion_ratio, h))
    else:  # None: repeat_interleave
        return jnp.repeat(block_embeddings, expansion_ratio, axis=-2)


def token_decoder_train_forward(params, cfg: TokenDecoderConfig,
                                input_ids, attention_mask, block_embeddings,
                                expansion_ratio: int, block_length: int,
                                remat: bool = False, stack_fn=None):
    """Teacher-forced forward over one block per row.

    input_ids: [Bb, L+1] = [BOS, x1..xL]; attention_mask: [Bb, L+1] with
    mask[:, 0] == 1; block_embeddings: [Bb, n_emb, projection_hidden].
    Returns logits [Bb, L, vocab] (fp32) predicting x1..xL.
    """
    Bb, Lp1 = input_ids.shape
    L = Lp1 - 1
    assert L == block_length
    n_emb = block_embeddings.shape[-2]
    n_exp = n_emb * expansion_ratio

    expanded = expand_block_embeddings(params, cfg, block_embeddings,
                                       expansion_ratio)  # [Bb, n_exp, h]

    is_gpt_neo = cfg.cls == "gpt-neo"

    def _embed(ids):
        if is_gpt_neo:
            return params["gpt_neo"]["wte"]["weight"][ids]
        return neox.embed_tokens(params, ids)

    def _stack(x, mask, positions):
        if stack_fn is not None:
            # parallel/pipeline.py substitutes the pp-scheduled stack here
            assert not is_gpt_neo, "pp token decoder supports the NeoX family"
            return stack_fn(params, x, mask, positions)
        if is_gpt_neo:
            from block_transformer_tpu.models import gpt_neo as gn
            return gn.gpt_neo_token_decoder_forward(
                params["gpt_neo"], _gpt_neo_cfg(cfg), x, mask)
        h, _ = neox.neox_stack(params, x, cfg=cfg.neox, mask=mask,
                               positions=positions, remat=remat)
        return h

    if cfg.decoding_strategy == "prefix":
        # discard last input token (static analogue of
        # discard_redundant_tokens, base.py:281), then drop BOS and prepend
        # the expanded prefix (base.py:489-500).
        tok_ids = input_ids[:, 1:-1]                       # x1..x_{L-1}
        tok_embeds = _embed(tok_ids)
        x = jnp.concatenate([expanded.astype(tok_embeds.dtype), tok_embeds], axis=1)
        # adapted attention mask: [ones(n_exp), a1..a_{L-1}]
        mask = masks.token_decoder_train_mask(
            attention_mask[:, 1:-1], n_prefix=n_exp)
        S = n_exp + L - 1
        positions = jnp.arange(S, dtype=jnp.int32)
        hidden = _stack(x, mask, positions)
        # drop redundant output prefix of length n_exp - 1 (base.py:321-329)
        hidden = hidden[:, n_exp - 1:, :]                  # [Bb, L, h]
    elif cfg.decoding_strategy == "summation":
        # keep BOS, add expanded embedding positionwise (base.py:504-536);
        # n_expanded_emb must equal block_length (base.py:56-59).
        tok_ids = input_ids[:, :-1]                        # [BOS, x1..x_{L-1}]
        tok_embeds = _embed(tok_ids)
        x = tok_embeds + expanded[:, :L, :].astype(tok_embeds.dtype)
        mask = masks.token_decoder_train_mask(
            attention_mask[:, 1:-1], n_prefix=1)
        positions = jnp.arange(L, dtype=jnp.int32)
        hidden = _stack(x, mask, positions)
    elif cfg.decoding_strategy == "cross_attention":
        # T5 decoder: keep BOS prefix, cross-attend to the expanded block
        # embeddings (token_decoder/base.py:538-552, t5.py:58-72); adapted
        # prefix length 1 -> no redundant output prefix (base.py:321-329)
        from block_transformer_tpu.models import t5 as t5m
        t5cfg = _t5_cfg(cfg)
        tok_ids = input_ids[:, :-1]                        # [BOS, x1..x_{L-1}]
        att = jnp.concatenate(
            [jnp.ones((Bb, 1), attention_mask.dtype), attention_mask[:, 1:-1]],
            axis=1)
        hidden = t5m.t5_stack(params["t5"], t5cfg, input_ids=tok_ids,
                              attention_mask=att, is_decoder=True,
                              encoder_hidden_states=expanded)
        return t5m.t5_lm_logits(params["t5"], t5cfg, hidden)
    else:
        raise NotImplementedError(cfg.decoding_strategy)

    if is_gpt_neo:
        # tied head (GPT-Neo lm_head shares wte)
        return jnp.einsum("blh,vh->blv", hidden.astype(jnp.float32),
                          params["gpt_neo"]["wte"]["weight"].astype(jnp.float32))
    return neox.lm_logits(params, hidden)                  # [Bb, L, V] fp32


# ---------------------------------------------------------------------------
# Decode-time pieces (used by inference/generate.py)
# ---------------------------------------------------------------------------

def token_decoder_prefix_step(params, cfg: TokenDecoderConfig, expanded,
                              cache: neox.KVCache):
    """Run the expanded-prefix mini-prefill of one block's decode.

    expanded: [B, n_exp, h]. Writes positions [0, n_exp) of the (fresh)
    local cache; returns (logits for the block's first token [B, V], cache).
    """
    B, n_exp, _ = expanded.shape
    capacity = cache.k.shape[3]
    mask = masks.decode_mask(cache.length, capacity, n_exp)
    positions = cache.length + jnp.arange(n_exp, dtype=jnp.int32)
    hidden, cache = neox.neox_stack(params, expanded, cfg=cfg.neox, mask=mask,
                                    positions=positions, cache=cache)
    return neox.lm_logits(params, hidden[:, -1, :]), cache


def token_decoder_token_step(params, cfg: TokenDecoderConfig, token_ids,
                             cache: neox.KVCache):
    """One within-block decode step: token_ids [B] -> (logits [B, V], cache)."""
    B = token_ids.shape[0]
    x = neox.embed_tokens(params, token_ids[:, None])       # [B, 1, h]
    capacity = cache.k.shape[3]
    mask = masks.decode_mask(cache.length, capacity, 1)
    positions = (cache.length + jnp.arange(1, dtype=jnp.int32))
    hidden, cache = neox.neox_stack(params, x, cfg=cfg.neox, mask=mask,
                                    positions=positions, cache=cache)
    return neox.lm_logits(params, hidden[:, -1, :]), cache
