"""Two-level autoregressive generation engine (jitted, static shapes).

TPU-native re-design of ``BlockTransformer.generate``
(model/block_transformer.py:279-449) and the inner
``BaseTokenDecoder.generate`` (model/token_decoder/base.py:399-453):

- **outer loop** (one iteration per block = per ``block_length`` tokens):
  block decoder consumes one block embedding against a persistent
  fixed-capacity *global* KV cache (grows by ``n_embedding_tokens`` slots
  per block — the tiny cache behind the paper's 10-20x decode claim),
- **inner loop**: the token decoder decodes up to ``block_length`` tokens
  against an *ephemeral local* cache (capacity ``n_expanded_emb +
  block_length``) that is re-created every block, matching the reference's
  allocate-and-discard local cache (SURVEY.md §3.2),
- the whole generate is ONE jitted function: ``lax.while_loop`` outside,
  ``lax.fori_loop`` inside, output tokens written into a preallocated
  ``[B, max_blocks, block_length]`` buffer with ``dynamic_update_slice`` —
  no ``concat`` growth, no retracing across steps.

EOS semantics mirror the reference: a sequence finishes when a generated
block contains EOS (block_transformer.py:411-416); finished sequences emit
pad tokens and zero block embeddings (block_transformer.py:383-421); inside
a block, tokens after EOS are pad (HF GenerationMixin behavior).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from block_transformer_tpu.config import BlockTransformerConfig
from block_transformer_tpu.models import embedder as emb
from block_transformer_tpu.models import neox
from block_transformer_tpu.models import token_decoder as td
from block_transformer_tpu.ops import masks


class GenerationResult(NamedTuple):
    tokens: jax.Array        # [B, max_blocks, block_length] (prompt + generated)
    n_blocks: jax.Array      # scalar int32: valid blocks in `tokens`
    unfinished: jax.Array    # [B] int32


def _sample(logits, greedy: bool, temperature: float, key,
            top_k: int = 0, top_p: float = 1.0):
    """Greedy or temperature sampling with optional top-k / nucleus filters
    (the sampling surface of the reference demo's generation_config)."""
    if greedy:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    logits = logits / temperature
    if top_k and top_k > 0:
        kth = jnp.sort(logits, axis=-1)[..., -top_k][..., None]
        logits = jnp.where(logits < kth, -jnp.inf, logits)
    if top_p < 1.0:
        sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
        probs = jax.nn.softmax(sorted_logits, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        # keep tokens until cumulative prob exceeds top_p (always keep top-1)
        cutoff_idx = jnp.sum((cum - probs) < top_p, axis=-1) - 1
        cutoff = jnp.take_along_axis(sorted_logits, cutoff_idx[..., None],
                                     axis=-1)
        logits = jnp.where(logits < cutoff, -jnp.inf, logits)
    return jax.random.categorical(key, logits, axis=-1).astype(jnp.int32)


def decode_block_tokens_rerun(params, cfg: BlockTransformerConfig,
                              block_embeddings, *, greedy: bool = True,
                              temperature: float = 1.0, key=None,
                              top_k: int = 0, top_p: float = 1.0):
    """Universal inner loop for every token-decoder family/strategy
    (GPT-Neo, T5 cross-attention, summation): each step re-runs the
    teacher-forced forward over the fixed-length adapted input with future
    slots fed as pad — causal masking makes position ``i``'s logits depend
    only on tokens <= i, so this is numerically identical to cached
    stepping at ~L x the compute of a cached inner loop. Blocks are <= a
    dozen positions, so the overhead is negligible next to the block
    decoder; the GPT-NeoX prefix family uses the cached fast path in
    ``decode_block_tokens`` instead. Mirrors the reference's delegation to
    HF GenerationMixin for these families (token_decoder/base.py:399-453).
    """
    from block_transformer_tpu.models import token_decoder as td_mod
    tcfg = cfg.token_decoder
    L = cfg.block_length
    B = block_embeddings.shape[0]
    eos, pad = cfg.eos_token_id, cfg.pad_token_id
    if key is None:
        key = jax.random.PRNGKey(0)
    ids = jnp.full((B, L + 1), pad, jnp.int32).at[:, 0].set(cfg.bos_token_id)
    att = jnp.ones((B, L + 1), jnp.int32)
    tokens = jnp.zeros((B, L), jnp.int32)
    alive = jnp.ones((B,), bool)

    def body(i, carry):
        ids, tokens, alive, key = carry
        key, kk = jax.random.split(key)
        logits = td_mod.token_decoder_train_forward(
            params["token_decoder"], tcfg, ids, att, block_embeddings,
            cfg.expansion_ratio, L)                       # [B, L, V]
        nxt = _sample(logits[:, i], greedy, temperature, kk, top_k, top_p)
        emit = jnp.where(alive & (nxt != eos), nxt, pad)
        alive = alive & (nxt != eos)
        tokens = tokens.at[:, i].set(emit)
        ids = ids.at[:, i + 1].set(emit)
        return ids, tokens, alive, key

    _, tokens, alive, _ = jax.lax.fori_loop(0, L, body,
                                            (ids, tokens, alive, key))
    return tokens, alive


def decode_block_tokens(params, cfg: BlockTransformerConfig, block_embeddings,
                        *, greedy: bool = True, temperature: float = 1.0,
                        key=None, n_tokens: Optional[int] = None,
                        top_k: int = 0, top_p: float = 1.0):
    """Inner loop: decode one block of tokens from block embeddings.

    block_embeddings: [B, n_emb, projection_hidden]. Returns tokens [B, L]
    (pad after EOS within the block). The local KV cache lives entirely
    inside this function — allocated fresh and discarded, like the
    reference's per-block ``past_key_values`` (SURVEY.md §3.2).
    """
    tcfg = cfg.token_decoder
    if tcfg.cls != "gpt-neo-x" or tcfg.decoding_strategy != "prefix":
        assert n_tokens is None
        return decode_block_tokens_rerun(
            params, cfg, block_embeddings, greedy=greedy,
            temperature=temperature, key=key, top_k=top_k, top_p=top_p)
    L = cfg.block_length if n_tokens is None else n_tokens
    n_exp = cfg.n_expanded_emb
    B = block_embeddings.shape[0]
    eos = cfg.eos_token_id
    pad = cfg.pad_token_id
    if key is None:
        key = jax.random.PRNGKey(0)

    expanded = td.expand_block_embeddings(params["token_decoder"], tcfg,
                                          block_embeddings, cfg.expansion_ratio)
    cache = neox.KVCache.create(tcfg.neox, B, n_exp + L,
                                dtype=expanded.dtype)
    logits, cache = td.token_decoder_prefix_step(params["token_decoder"], tcfg,
                                                 expanded, cache)
    key, k0 = jax.random.split(key)
    first = _sample(logits, greedy, temperature, k0, top_k, top_p)
    alive = first != eos
    first = jnp.where(alive, first, pad)
    tokens0 = jnp.zeros((B, L), jnp.int32).at[:, 0].set(first)

    def body(i, carry):
        tokens, cache, alive, key = carry
        key, kk = jax.random.split(key)
        prev = tokens[:, i - 1]
        # feed pad for dead rows (their outputs are ignored)
        logits, cache = td.token_decoder_token_step(
            params["token_decoder"], tcfg, jnp.where(alive, prev, pad), cache)
        nxt = _sample(logits, greedy, temperature, kk, top_k, top_p)
        emit = jnp.where(alive & (nxt != eos), nxt, pad)
        alive = alive & (nxt != eos)
        tokens = tokens.at[:, i].set(emit)
        return tokens, cache, alive, key

    tokens, _, alive, _ = jax.lax.fori_loop(1, L, body,
                                            (tokens0, cache, alive, key))
    return tokens, alive


class _GenCarry(NamedTuple):
    tokens: jax.Array            # [B, max_blocks, L]
    n_blocks: jax.Array          # int32 blocks written (prompt + generated)
    next_embeds: jax.Array       # [B, n_emb, ph] block-decoder input
    cache: neox.KVCache          # global block-level cache
    kv_valid: jax.Array          # [B, capacity] per-slot validity
    unfinished: jax.Array        # [B] int32
    key: jax.Array


def _constrain_carry(c: _GenCarry) -> _GenCarry:
    """Pin the while-loop carry's shardings when running under a mesh.

    Without explicit constraints GSPMD is free to re-shard loop carries
    between iterations (the round-1 SPMD reshard warning on the decode
    inner loop); pinning batch on the data axes and cache heads on
    ``model`` keeps every iteration's layout identical.
    """
    mesh = jax.sharding.get_abstract_mesh()
    if mesh is None or not mesh.axis_names or "data" not in mesh.axis_names:
        return c
    from jax.sharding import PartitionSpec as P
    batch = (("dcn", "data") if "dcn" in mesh.axis_names else "data",)
    model = "model" if "model" in mesh.axis_names else None
    wsc = jax.lax.with_sharding_constraint
    cache = c.cache
    kv_spec = P(None, batch[0], model, None, None)
    sc_spec = P(None, batch[0], model, None)
    if isinstance(cache, neox.QuantKVCache):
        cache = neox.QuantKVCache(wsc(cache.k, kv_spec), wsc(cache.v, kv_spec),
                                  wsc(cache.k_scale, sc_spec),
                                  wsc(cache.v_scale, sc_spec), cache.length)
    else:
        cache = neox.KVCache(wsc(cache.k, kv_spec), wsc(cache.v, kv_spec),
                             cache.length)
    return c._replace(
        tokens=wsc(c.tokens, P(batch[0], None, None)),
        next_embeds=wsc(c.next_embeds, P(batch[0], None, None)),
        cache=cache,
        kv_valid=wsc(c.kv_valid, P(batch[0], None)),
        unfinished=wsc(c.unfinished, P(batch[0])),
    )


def _block_decoder_step(params, cfg: BlockTransformerConfig, inputs_embeds,
                        cache: neox.KVCache, kv_valid, new_valid):
    """Append ``S = inputs_embeds.shape[1]`` positions to the global cache and
    run the block decoder. Returns (hidden [B, S, ph], cache, kv_valid)."""
    B, S, _ = inputs_embeds.shape
    n = cfg.n_embedding_tokens
    capacity = cache.k.shape[3]
    kv_valid = jax.lax.dynamic_update_slice(
        kv_valid, new_valid.astype(kv_valid.dtype), (0, cache.length))
    mask = masks.block_decode_mask(cache.length, capacity, S, kv_valid, n)
    positions = cache.length + jnp.arange(S, dtype=jnp.int32)
    if cfg.block_decoder_cls == "gpt-neo":
        from block_transformer_tpu.models import block_decoder as bd_mod
        from block_transformer_tpu.models import gpt_neo as gn
        gcfg = bd_mod._gpt_neo_cfg(cfg.block_decoder, cfg.block_decoder_window)
        x = inputs_embeds + params["block_decoder"]["wpe"]["weight"][
            positions][None].astype(inputs_embeds.dtype)
        hidden, cache = gn.gpt_neo_stack_cached(
            params["block_decoder"], gcfg, x, mask, positions, cache)
        return hidden, cache, kv_valid
    hidden, cache = neox.neox_stack(params["block_decoder"], inputs_embeds,
                                    cfg=cfg.block_decoder, mask=mask,
                                    positions=positions, cache=cache)
    return hidden, cache, kv_valid


def _fresh_prefill_enabled() -> bool:
    """Fresh-KV single-pass prefill (BT_FRESH_PREFILL, default on).

    Raced on chip 2026-08-20 (scripts/prefill_profile.py, b256 p2048
    int8 weights+KV): fresh 1.422 s vs streaming 1.665 s (-15%) vs
    chunked online-softmax 2.392 s vs fresh+Pallas-flash 1.688 s, over
    a 0.588 s matmul floor — attending to the just-computed bf16 K/V
    beats re-reading the (de)quantized cache chunk by chunk, and XLA's
    fused attention beats both hand kernels at this shape. Prefill
    attention also reads *unquantized* K/V, strictly reducing prefill
    quantization error. Set BT_FRESH_PREFILL=0 for the round-2
    streaming path (also used automatically for gpt-neo block decoders
    and paged caches).
    """
    import os
    return os.environ.get("BT_FRESH_PREFILL", "1") == "1"


def prefill_blocks(params, cfg: BlockTransformerConfig, input_ids,
                   attention_mask, block_attention_mask, *, capacity: int,
                   kv_cache: str = "bf16", prefill_chunk_blocks: int = 128,
                   fresh_prefill: bool | None = None):
    """Generation prefill: embed the prompt blocks and stream them through
    the block decoder. Returns ``(next_embeds [B, n, ph], cache, kv_valid)``
    positioned at the last real prompt block.

    Chunked: the prompt's block embeddings stream through the block decoder
    in fixed chunks (cache carried in place), so transient attention
    activations scale with the chunk, not the whole prompt — this is what
    lets decode batch sizes reach b128+ at p2048 on one chip.
    """
    B, N, L = input_ids.shape
    n = cfg.n_embedding_tokens
    ph = cfg.embedder.projection_hidden_size
    block_embeds = emb.embed_blocks(params["embedder"], cfg.embedder,
                                    cfg.block_length, input_ids,
                                    attention_mask=attention_mask)  # [B,N,n,ph]
    inputs_embeds = block_embeds.reshape(B, N * n, ph)
    cache = neox.make_kv_cache(cfg.block_decoder, B, capacity, kv_cache,
                               dtype=inputs_embeds.dtype)
    kv_valid = jnp.zeros((B, capacity), jnp.int32)
    prompt_valid = jnp.repeat(block_attention_mask.astype(jnp.int32), n, axis=1)

    S_total = N * n
    if fresh_prefill is None:
        # direct (non-jitted) callers: resolve the env default here; jitted
        # callers must pass the resolved flag so it keys the jit cache
        fresh_prefill = _fresh_prefill_enabled()
    if (fresh_prefill and cfg.block_decoder_cls != "gpt-neo"
            and not isinstance(cache, neox.PagedKVCache)):
        # single-pass fresh-KV prefill: attention reads the just-computed
        # bf16 K/V (write-only quantized cache) — see neox_prefill_fresh
        mask = masks.block_decode_mask(jnp.int32(0), S_total, S_total,
                                       prompt_valid, n)
        positions = jnp.arange(S_total, dtype=jnp.int32)
        hidden, cache = neox.neox_prefill_fresh(
            params["block_decoder"], inputs_embeds,
            cfg=cfg.block_decoder, mask=mask, positions=positions,
            cache=cache, q_tile=max(1, prefill_chunk_blocks) * n)
        kv_valid = jax.lax.dynamic_update_slice(kv_valid, prompt_valid,
                                                (0, 0))
        return hidden[:, -n:, :], cache, kv_valid
    chunk_req = max(1, prefill_chunk_blocks) * n
    if S_total <= chunk_req:
        hidden, cache, kv_valid = _block_decoder_step(
            params, cfg, inputs_embeds, cache, kv_valid, prompt_valid)
        next_embeds = hidden[:, -n:, :]  # output of the last prompt block
    else:
        # pad the prompt up to a chunk multiple (padded tail is marked
        # invalid, so it never influences attention, and decode overwrites
        # those cache slots); each chunk emits its hidden states and the
        # true last prompt position is indexed out afterwards
        chunk = chunk_req
        n_chunks = -(-S_total // chunk)
        pad_to = n_chunks * chunk
        if capacity < pad_to:
            raise ValueError(
                f"max_blocks capacity {capacity} < padded prefill {pad_to}; "
                f"raise max_blocks or lower prefill_chunk_blocks")
        x_pad = jnp.pad(inputs_embeds, ((0, 0), (0, pad_to - S_total), (0, 0)))
        v_pad = jnp.pad(prompt_valid, ((0, 0), (0, pad_to - S_total)))
        x_chunks = x_pad.reshape(B, n_chunks, chunk, ph).transpose(1, 0, 2, 3)
        v_chunks = v_pad.reshape(B, n_chunks, chunk).transpose(1, 0, 2)

        def chunk_body(carry, xs):
            cache, kv_valid = carry
            xc, vc = xs
            hidden, cache, kv_valid = _block_decoder_step(
                params, cfg, xc, cache, kv_valid, vc)
            return (cache, kv_valid), hidden

        (cache, kv_valid), hiddens = jax.lax.scan(
            chunk_body, (cache, kv_valid), (x_chunks, v_chunks))
        # hiddens: [n_chunks, B, chunk, ph] -> [B, pad_to, ph]
        hiddens = hiddens.transpose(1, 0, 2, 3).reshape(B, pad_to, ph)
        next_embeds = hiddens[:, S_total - n:S_total, :]
        # rewind the cache write frontier to the true prompt length so the
        # first generated block overwrites the padded slots
        cache = cache._replace(length=jnp.int32(S_total))
        kv_valid = jnp.where(
            jnp.arange(capacity)[None] < S_total, kv_valid, 0)
    return next_embeds, cache, kv_valid


def generate_blocks(params, cfg: BlockTransformerConfig, input_ids,
                    attention_mask, block_attention_mask, *, max_blocks: int,
                    greedy: bool = True, temperature: float = 1.0,
                    top_k: int = 0, top_p: float = 1.0,
                    key=None, prefill_chunk_blocks: int = 128,
                    kv_cache: str = "bf16",
                    fresh_prefill: bool | None = None) -> GenerationResult:
    """Block-format generation: input_ids/attention_mask [B, N, L],
    block_attention_mask [B, N]; generates until ``max_blocks`` total blocks
    or all sequences finish. Fully jitted; one trace per (B, N, max_blocks).

    ``fresh_prefill=None`` resolves BT_FRESH_PREFILL at *call* time and
    passes it as a static jit argument, so flipping the env var within a
    process retraces instead of silently reusing the cached path.
    """
    if fresh_prefill is None:
        fresh_prefill = _fresh_prefill_enabled()
    from block_transformer_tpu.ops import linear as linear_ops
    # declare the KV mode for pairing-aware W8A8 dispatch; kv_cache is a
    # static jit arg, so the trace this context wraps is the one the
    # compiled decision belongs to
    with linear_ops.kv_mode(kv_cache):
        return _generate_blocks_jit(
            params, cfg, input_ids, attention_mask, block_attention_mask,
            max_blocks=max_blocks, greedy=greedy, temperature=temperature,
            top_k=top_k, top_p=top_p, key=key,
            prefill_chunk_blocks=prefill_chunk_blocks, kv_cache=kv_cache,
            fresh_prefill=bool(fresh_prefill))


@functools.partial(jax.jit, static_argnames=("cfg", "max_blocks", "greedy",
                                             "temperature", "top_k", "top_p",
                                             "prefill_chunk_blocks",
                                             "kv_cache", "fresh_prefill"))
def _generate_blocks_jit(params, cfg: BlockTransformerConfig, input_ids,
                         attention_mask, block_attention_mask, *,
                         max_blocks: int, greedy: bool = True,
                         temperature: float = 1.0,
                         top_k: int = 0, top_p: float = 1.0,
                         key=None, prefill_chunk_blocks: int = 128,
                         kv_cache: str = "bf16",
                         fresh_prefill: bool = True) -> GenerationResult:
    B, N, L = input_ids.shape
    n = cfg.n_embedding_tokens
    ph = cfg.embedder.projection_hidden_size
    if cfg.block_decoder_cls == "gpt-neo" and kv_cache != "bf16":
        raise NotImplementedError(
            "quantized global KV with the gpt-neo block decoder is not "
            "wired; use kv_cache='bf16' for the ablation family")
    if key is None:
        key = jax.random.PRNGKey(0)
    # round capacity to a lane multiple so the fused decode-attention
    # kernel gets an aligned K tiling (extra slots stay kv_valid=0)
    capacity = max_blocks * n
    if capacity >= 128:
        capacity = -(-capacity // 128) * 128

    next_embeds, cache, kv_valid = prefill_blocks(
        params, cfg, input_ids, attention_mask, block_attention_mask,
        capacity=capacity, kv_cache=kv_cache,
        prefill_chunk_blocks=prefill_chunk_blocks,
        fresh_prefill=fresh_prefill)

    tokens = jnp.zeros((B, max_blocks, L), jnp.int32)
    tokens = jax.lax.dynamic_update_slice(tokens, input_ids.astype(jnp.int32),
                                          (0, 0, 0))
    carry = _constrain_carry(
        _GenCarry(tokens=tokens, n_blocks=jnp.int32(N),
                  next_embeds=next_embeds, cache=cache, kv_valid=kv_valid,
                  unfinished=jnp.ones((B,), jnp.int32), key=key))

    # ---- outer decode loop ----------------------------------------------
    def cond(c: _GenCarry):
        return (c.n_blocks < max_blocks) & (jnp.sum(c.unfinished) > 0)

    def body(c: _GenCarry) -> _GenCarry:
        key, kb = jax.random.split(c.key)
        block_emb = c.next_embeds.reshape(B, n, ph)
        alive = c.unfinished.astype(bool)
        new_tokens, inner_alive = decode_block_tokens(params, cfg, block_emb,
                                                      greedy=greedy,
                                                      temperature=temperature,
                                                      top_k=top_k, top_p=top_p,
                                                      key=kb)
        new_tokens = jnp.where(alive[:, None], new_tokens, cfg.pad_token_id)
        # finished if an EOS was emitted in this block (the emitted EOS and
        # everything after it surface as pad; block_transformer.py:411-412)
        unfinished = c.unfinished * inner_alive.astype(jnp.int32)

        tokens = jax.lax.dynamic_update_slice(
            c.tokens, new_tokens[:, None, :], (0, c.n_blocks, 0))

        # re-embed the generated block; zero embeddings for finished rows
        # (block_transformer.py:418-421)
        new_block_emb = emb.embed_blocks(params["embedder"], cfg.embedder,
                                         cfg.block_length, new_tokens)
        new_block_emb = jnp.where(alive[:, None, None], new_block_emb, 0.0)
        hidden, cache, kv_valid = _block_decoder_step(
            params, cfg, new_block_emb.reshape(B, n, ph).astype(c.next_embeds.dtype),
            c.cache, c.kv_valid,
            jnp.broadcast_to(unfinished[:, None], (B, n)))
        return _constrain_carry(
            _GenCarry(tokens=tokens, n_blocks=c.n_blocks + 1,
                      next_embeds=hidden[:, -n:, :], cache=cache,
                      kv_valid=kv_valid, unfinished=unfinished, key=key))

    final = jax.lax.while_loop(cond, body, carry)
    return GenerationResult(final.tokens, final.n_blocks, final.unfinished)


# ---------------------------------------------------------------------------
# Vanilla-format convenience wrapper (host-side pre/post processing)
# ---------------------------------------------------------------------------

def preprocess_inputs(cfg: BlockTransformerConfig, input_ids, attention_mask=None):
    """Flat [B, T] -> block format with LEFT pad to a block boundary
    (block_transformer.py:227-266). Returns dict + pad length added."""
    import numpy as np
    ids = np.asarray(input_ids)
    if ids.ndim == 1:
        ids = ids[None]
    if attention_mask is None:
        att = (ids != cfg.pad_token_id).astype(np.int32)
    else:
        att = np.asarray(attention_mask).astype(np.int32).reshape(ids.shape)
    B, T = ids.shape
    L = cfg.block_length
    pad_len = (-T) % L
    if pad_len:
        ids = np.pad(ids, ((0, 0), (pad_len, 0)), constant_values=cfg.pad_token_id)
        att = np.pad(att, ((0, 0), (pad_len, 0)), constant_values=0)
    N = ids.shape[1] // L
    ids = ids.reshape(B, N, L)
    att = att.reshape(B, N, L)
    bam = (att.any(axis=-1)).astype(np.int32)
    return {"input_ids": ids, "attention_mask": att,
            "block_attention_mask": bam, "initial_block_padding": pad_len}


def generate(params, cfg: BlockTransformerConfig, input_ids,
             attention_mask=None, max_length: int = 100, greedy: bool = True,
             temperature: float = 1.0, top_k: int = 0, top_p: float = 1.0,
             key=None):
    """Vanilla-format generate: flat token ids in, flat token ids out
    (prompt + up to ``max_length`` total tokens, truncated at max_length)."""
    import numpy as np
    d = preprocess_inputs(cfg, input_ids, attention_mask)
    B, N, L = d["input_ids"].shape
    pad_len = d["initial_block_padding"]
    max_blocks = N + max(0, -(-(max_length + pad_len - N * L) // L))
    res = generate_blocks(params, cfg, jnp.asarray(d["input_ids"]),
                          jnp.asarray(d["attention_mask"]),
                          jnp.asarray(d["block_attention_mask"]),
                          max_blocks=max_blocks, greedy=greedy,
                          temperature=temperature, top_k=top_k, top_p=top_p,
                          key=key)
    toks = np.asarray(res.tokens)[:, :int(res.n_blocks)].reshape(B, -1)
    toks = toks[:, pad_len:]
    return toks[:, :max_length]
