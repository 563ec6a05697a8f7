"""Tensor-parallel two-level decode under ``jax.shard_map``.

GSPMD (annotate + let XLA choose) is the default path everywhere else in
the framework; this module is the **explicit-collective** decode step of
SURVEY.md §5.8 / §7.2 step 6: every array is a manual per-device shard,
and the collectives are placed by hand so their cost and position are
auditable:

- QKV / MLP-up are column-parallel (local heads / local FFN slice), out /
  MLP-down row-parallel. The two partial sums share **one fused
  ``psum``** per layer (legal because GPT-NeoX uses the parallel
  attn+MLP residual), so a layer costs a single model-axis collective of
  ``[B_local, S, hidden]`` — half the collectives of the naive
  row-parallel placement, and the all-gather of the round-1 GSPMD decode
  (the SPMD reshard warning on the loop carry) is gone by construction.
- The LM head is vocab-sharded; sampling does one tiled ``all_gather``
  of ``[B_local, V/tp]`` logits per token step.
- The global block-level KV cache lives sharded over (data: batch,
  model: heads) for its whole lifetime; nothing ever gathers it.
- The outer while-loop's stopping flag is ``psum``-reduced over the data
  axis so every shard exits on the same step.

Reuses the exact layer math of models/neox.py (layer_qkv + layer_norm +
the fused Pallas dequant matmuls through StackedLinear views) on local
shards, with a local NeoXConfig whose (hidden, heads, ffn) are divided by
the model-axis size — numerics are the single-device path's, verified
token-exact in tests/test_tp_decode.py.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from block_transformer_tpu.config import BlockTransformerConfig, NeoXConfig
from block_transformer_tpu.models import embedder as emb
from block_transformer_tpu.models import neox
from block_transformer_tpu.models import token_decoder as td
from block_transformer_tpu.ops import masks
from block_transformer_tpu.ops.linear import StackedLinear, apply_linear


# ---------------------------------------------------------------------------
# Partition specs for shard_map (manual) TP decode
# ---------------------------------------------------------------------------

def _neox_tp_spec(tail: str) -> P:
    rules = {
        "layers/attn/qkv/kernel": P(None, None, "model"),
        "layers/attn/qkv/bias": P(None, "model"),
        "layers/attn/qkv/kernel_q8": P(None, None, "model"),
        "layers/attn/qkv/kernel_q4": P(None, None, "model"),
        "layers/attn/qkv/scale": P(None, "model"),
        "layers/attn/out/kernel": P(None, "model", None),
        "layers/attn/out/kernel_q8": P(None, "model", None),
        "layers/attn/out/kernel_q4": P(None, "model", None),
        "layers/attn/out/scale": P(None, None),
        "layers/attn/out/bias": P(None, None),
        "layers/mlp/up/kernel": P(None, None, "model"),
        "layers/mlp/up/kernel_q8": P(None, None, "model"),
        "layers/mlp/up/kernel_q4": P(None, None, "model"),
        "layers/mlp/up/scale": P(None, "model"),
        "layers/mlp/up/bias": P(None, "model"),
        "layers/mlp/down/kernel": P(None, "model", None),
        "layers/mlp/down/kernel_q8": P(None, "model", None),
        "layers/mlp/down/kernel_q4": P(None, "model", None),
        "layers/mlp/down/scale": P(None, None),
        "layers/mlp/down/bias": P(None, None),
        "embed_out/kernel": P(None, "model"),
        "embed_out/kernel_q8": P(None, "model"),
        "embed_out/kernel_q4": P(None, "model"),
        "embed_out/scale": P("model",),
    }
    return rules.get(tail)


def tp_param_specs(params: dict):
    """Manual-mode PartitionSpecs for a block-transformer param tree.

    Embedder, layer norms, biases of row-parallel matmuls, and the
    expansion layer are replicated; everything matmul-heavy shards as in
    _neox_tp_spec. INT4 packed kernels shard like their fp kernels (the
    packed axis is K/2, still the row axis) — but **row-parallel packed
    kernels are only shard-valid after ``prepare_tp_params(..., tp=...)``
    repacks them** (split-half planes must nest inside each shard).

    INT4 *group* scales are rank-3 ``[L, G, N]`` (rank-2 ``[G, V]`` for
    the unstacked LM head) and shard by role: column-parallel on N,
    row-parallel on G (each shard owns its K-rows' groups; G == 1
    replicates — scaling partial sums commutes with the psum).
    """

    def spec(path, leaf):
        names = []
        for k in path:
            names.append(getattr(k, "key", getattr(k, "name", str(k))))
        if names[0] == "embedder":
            return P()
        tail = "/".join(names[1:])
        ndim = getattr(leaf, "ndim", None)
        if tail.endswith("/scale") and ndim == 3:      # int4 [L, G, N]
            role = tail.rsplit("/", 2)[-2]
            if role in ("out", "down"):                # row-parallel
                return (P(None, "model", None) if leaf.shape[1] > 1
                        else P())
            if role in ("qkv", "up"):                  # column-parallel
                return P(None, None, "model")
        if tail == "embed_out/scale" and ndim == 2:    # int4 [G, V]
            return P(None, "model")
        s = _neox_tp_spec(tail)
        if s is not None:
            return s
        return P()  # ln / final_ln / embed_in / expansion / replicated bias

    return jax.tree_util.tree_map_with_path(spec, params)


# ---------------------------------------------------------------------------
# Host-side param preparation: head-major QKV layout
# ---------------------------------------------------------------------------

def _qkv_head_major_perm(hidden: int, num_heads: int) -> jnp.ndarray:
    """Column permutation (q|k|v, head, d) -> (head, q|k|v, d).

    The stacked QKV kernel stores Q columns [0, h), K [h, 2h), V [2h, 3h)
    (models/neox.py layout). Contiguous column sharding would hand shard 0
    all of Q plus a slice of K — permuting to head-major makes each
    contiguous 3h/tp chunk exactly the (q, k, v) of H/tp whole heads.
    """
    D = hidden // num_heads
    perm = np.empty((3 * hidden,), np.int32)
    j = 0
    for head in range(num_heads):
        for s in range(3):
            for d in range(D):
                perm[j] = s * hidden + head * D + d
                j += 1
    return jnp.asarray(perm)


def _repack_q4_rows_for_tp(w_p: jax.Array, tp: int) -> jax.Array:
    """Re-lay a split-half packed int4 kernel so each of ``tp`` contiguous
    row shards is itself a valid split-half packing of its own K rows.

    Global packing stores unpacked row r in packed row ``r`` (low nibble,
    r < K/2) or ``r - K/2`` (high nibble) — sharding those packed rows
    hands shard j nibbles of rows ``[j*K/2t, (j+1)*K/2t) U [K/2 + ...)``,
    while the row-parallel matmul gives it activation columns
    ``[j*K/t, (j+1)*K/t)``. Unpack once (host-side, at preparation) and
    repack per shard block so packed row ``j*K/2t + p`` holds the shard's
    local rows ``p`` (lo) and ``p + K/2t`` (hi)."""
    from block_transformer_tpu.ops import quant
    L, Kh, N = w_p.shape
    K = 2 * Kh
    assert K % (2 * tp) == 0, (K, tp)
    vals = jax.vmap(quant.unpack_int4)(w_p)            # [L, K, N] in [-7, 7]
    v = vals.reshape(L, tp, K // tp, N)
    halfl = K // (2 * tp)
    lo = v[:, :, :halfl].astype(jnp.uint8) & 0xF
    hi = (v[:, :, halfl:].astype(jnp.uint8) & 0xF) << 4
    return (lo | hi).astype(jnp.int8).reshape(L, Kh, N)


def prepare_tp_params(params: dict, cfg: BlockTransformerConfig,
                      tp: int = None) -> dict:
    """Permute every stack's QKV node to head-major column order (kernel /
    quantized kernel / bias / scale) so tp_param_specs' contiguous column
    shards carry whole heads, and repack row-parallel INT4 kernels
    (attn-out / MLP-down) for ``tp`` shards (split-half planes must nest
    inside each shard — see _repack_q4_rows_for_tp). Pure host-side
    transform; apply once before sharding with tp_param_specs.

    ``tp`` (the model-axis size) is required when the tree carries
    ``kernel_q4`` leaves; fp/int8 trees don't need it."""
    out = dict(params)
    for name, ncfg in (("block_decoder", cfg.block_decoder),
                       ("token_decoder", cfg.token_decoder.neox)):
        if name not in params:
            continue
        stack = dict(params[name])
        layers = dict(stack["layers"])
        attn = dict(layers["attn"])
        qkv = dict(attn["qkv"])
        perm = _qkv_head_major_perm(ncfg.hidden_size, ncfg.num_heads)
        for k in list(qkv):
            qkv[k] = jnp.take(qkv[k], perm, axis=-1)
        attn["qkv"] = qkv
        for parent, role in ((attn, "out"), (dict(layers["mlp"]), "down")):
            node = dict(parent[role])
            if "kernel_q4" in node:
                assert tp, ("prepare_tp_params needs tp=mesh.shape['model'] "
                            "to repack row-parallel int4 kernels")
                G = node["scale"].shape[1] if node["scale"].ndim == 3 else 1
                assert G == 1 or G % tp == 0, \
                    (f"{name}/{role}: int4 group count {G} must be a "
                     f"multiple of tp={tp} (groups shard with their rows)")
                node["kernel_q4"] = _repack_q4_rows_for_tp(
                    node["kernel_q4"], tp)
                parent[role] = node
            if role == "down":
                layers["mlp"] = parent
        layers["attn"] = attn
        stack["layers"] = layers
        out[name] = stack
    return out


def _tp_layer_qkv(p, x, *, lcfg: NeoXConfig, cos, sin, positions):
    """layer_qkv for the head-major local QKV shard: the local columns are
    (head, q|k|v, d) over H_local heads."""
    B, S, H, D = x.shape[0], x.shape[1], lcfg.num_heads, lcfg.head_dim
    attn_in = neox.layer_norm(x, p["ln1"], lcfg.layer_norm_eps)
    qkv = apply_linear(attn_in, p["attn"]["qkv"])              # [B, S, H*3D]
    qkv = qkv.reshape(B, S, H, 3, D).transpose(3, 0, 2, 1, 4)  # [3, B, H, S, D]
    q, k, v = qkv[0], qkv[1], qkv[2]
    q = neox.apply_rope(q, cos, sin, positions)
    k = neox.apply_rope(k, cos, sin, positions)
    return q, k, v


# ---------------------------------------------------------------------------
# Local (per-shard) layer step with one fused psum
# ---------------------------------------------------------------------------

def _local_cfg(cfg: NeoXConfig, tp: int) -> NeoXConfig:
    assert cfg.num_heads % tp == 0 and cfg.intermediate_size % tp == 0
    return dataclasses.replace(cfg, hidden_size=cfg.hidden_size // tp,
                               num_heads=cfg.num_heads // tp,
                               intermediate_size=cfg.intermediate_size // tp)


def _nobias(node: dict) -> dict:
    return {k: v for k, v in node.items() if k != "bias"}


def _bias_of(node: dict, i):
    if "bias" not in node:
        return 0.0
    return jax.lax.dynamic_index_in_dim(node["bias"], i, 0, keepdims=False)


def _tp_stack(params, x, *, cfg: NeoXConfig, tp: int, mask, positions,
              cache, write_pos, axis: str = "model", fresh: bool = False,
              q_tile: int = 512):
    """Cached decode stack on local shards; one psum('model') per layer.

    params: LOCAL shards laid out per tp_param_specs. x replicated over
    the model axis ([B_local, S, hidden]). cache: local
    [L, B_local, H_local, cap, D] (+scales for QuantKVCache).

    ``fresh=True`` is the prefill-from-empty-cache fast path (mirrors
    models/neox.neox_prefill_fresh, -15% prefill on chip): attention
    consumes the just-computed bf16 local K/V instead of re-reading the
    (de)quantized cache; the cache is write-only. Attention is per-head
    independent, so this is the same math as the single-device fresh
    path on each shard's heads — TP decode stays token-exact vs the
    single-device generator with both defaults aligned. Only valid when
    the attended keys are exactly the S being written (empty cache /
    freshly reset engine slots) — ``mask`` must span S keys, not
    capacity.
    """
    lcfg = _local_cfg(cfg, tp)
    cos, sin = neox.rope_tables(cfg, max(cfg.max_position_embeddings,
                                         cache.k.shape[3]))
    layers = params["layers"]
    quantized = isinstance(cache, neox.QuantKVCache)
    use_fused = (neox._fused_kv_attn_enabled(x.shape[1])
                 and (not quantized or cache.k.dtype == jnp.int8))
    if fresh:
        # q-tiled fresh attention (same closure as the single-device fresh
        # prefill): bounds the per-layer transient score buffer at
        # [B, H_local, q_tile, S] instead of one untiled S x S pass
        fresh_attn = neox.fresh_attn_tiles(mask, x.shape[1], q_tile,
                                           cfg.attn_impl)

    def body(carry, i):
        if quantized:
            h, ck, cv, cks, cvs = carry
        else:
            h, ck, cv = carry
        p = neox.layer_view(layers, i)
        q, k, v = _tp_layer_qkv(p, h, lcfg=lcfg, cos=cos, sin=sin,
                                positions=positions)
        if quantized:
            kq, ks = neox.quantize_kv(k, cache.k.dtype)
            vq, vs = neox.quantize_kv(v, cache.k.dtype)
            ck = neox._write_kv(ck, kq, i, write_pos)
            cv = neox._write_kv(cv, vq, i, write_pos)
            cks = neox._write_kv(cks, ks, i, write_pos)
            cvs = neox._write_kv(cvs, vs, i, write_pos)
            if fresh:
                attn = fresh_attn(q, k, v)
            elif use_fused:
                from block_transformer_tpu.ops import decode_attention
                attn = decode_attention.decode_attention_int8_stacked(
                    q, ck, cks, cv, cvs, i, mask)
            else:
                kq_all = jax.lax.dynamic_index_in_dim(ck, i, 0, False)
                vq_all = jax.lax.dynamic_index_in_dim(cv, i, 0, False)
                ks_all = jax.lax.dynamic_index_in_dim(cks, i, 0, False)
                vs_all = jax.lax.dynamic_index_in_dim(cvs, i, 0, False)
                k_all = (kq_all.astype(jnp.float32)
                         * ks_all[..., None]).astype(q.dtype)
                v_all = (vq_all.astype(jnp.float32)
                         * vs_all[..., None]).astype(q.dtype)
                attn = neox._attention(q, k_all, v_all, mask, cfg.attn_impl)
        else:
            ck = neox._write_kv(ck, k, i, write_pos)
            cv = neox._write_kv(cv, v, i, write_pos)
            if fresh:
                attn = fresh_attn(q, k, v)
            else:
                k_all = jax.lax.dynamic_index_in_dim(ck, i, 0, False)
                v_all = jax.lax.dynamic_index_in_dim(cv, i, 0, False)
                attn = neox._attention(q, k_all.astype(q.dtype),
                                       v_all.astype(q.dtype), mask,
                                       cfg.attn_impl)

        B, S = h.shape[0], h.shape[1]
        a_flat = attn.transpose(0, 2, 1, 3).reshape(B, S, -1)
        a_part = apply_linear(a_flat,
                              StackedLinear(_nobias(layers["attn"]["out"]), i))
        mlp_in = neox.layer_norm(h, p["ln2"], cfg.layer_norm_eps)
        u = apply_linear(mlp_in, p["mlp"]["up"])        # bias is sharded
        m_part = apply_linear(jax.nn.gelu(u, approximate=False),
                              StackedLinear(_nobias(layers["mlp"]["down"]), i))
        # ONE fused collective per layer: attn-out and MLP-down partials
        # share the psum (parallel residual); replicated biases added once
        tot = jax.lax.psum(a_part + m_part, axis)
        tot = tot + _bias_of(layers["attn"]["out"], i) \
                  + _bias_of(layers["mlp"]["down"], i)
        assert cfg.use_parallel_residual, \
            "tp decode implements the parallel-residual (Pythia) layout"
        h = h + tot.astype(h.dtype)
        return ((h, ck, cv, cks, cvs) if quantized else (h, ck, cv)), None

    idx = jnp.arange(cfg.num_layers, dtype=jnp.int32)
    if quantized:
        (h, nk, nv, nks, nvs), _ = jax.lax.scan(
            body, (x, cache.k, cache.v, cache.k_scale, cache.v_scale), idx)
        new_cache = neox.QuantKVCache(nk, nv, nks, nvs,
                                      cache.length + x.shape[1])
    else:
        (h, nk, nv), _ = jax.lax.scan(body, (x, cache.k, cache.v), idx)
        new_cache = neox.KVCache(nk, nv, cache.length + x.shape[1])
    h = neox.layer_norm(h, params["final_ln"], cfg.layer_norm_eps)
    return h, new_cache


def _tp_stack_paged(params, x, *, cfg: NeoXConfig, tp: int, mask, positions,
                    cache, write_pos, axis: str = "model"):
    """Paged-pool decode stack on local shards; one psum per layer.

    The paged analogue of ``_tp_stack``'s cached branch: the page pool is
    LOCAL to this shard on both mesh axes — pages partition over the data
    axes (each data shard's sub-pool serves its own slots, page-table
    entries are shard-local ids) and heads over ``model`` — so the fused
    Pallas page-table attention (ops/paged_attention.py) runs per shard
    exactly as on one device, and pool HBM scales 1/(dp*tp). ``mask`` is
    over virtual positions; ``write_pos`` is per row [B] (slot
    frontiers). Mirrors the single-device paged branch of
    models/neox.neox_stack.
    """
    lcfg = _local_cfg(cfg, tp)
    ps = cache.page_size
    pt = cache.page_table
    S = x.shape[1]
    cos, sin = neox.rope_tables(cfg, max(cfg.max_position_embeddings,
                                         pt.shape[1] * ps))
    layers = params["layers"]
    interp = jax.devices()[0].platform != "tpu"
    if write_pos.ndim == 0:
        write_pos = jnp.broadcast_to(write_pos, (x.shape[0],))
    vp = write_pos[:, None] + jnp.arange(S, dtype=jnp.int32)[None]
    page = jnp.take_along_axis(pt, vp // ps, axis=1)              # [B, S]
    off = vp % ps
    kv_dtype = cache.k.dtype

    def body(carry, i):
        h, ck, cv, cks, cvs = carry
        p = neox.layer_view(layers, i)
        q, k, v = _tp_layer_qkv(p, h, lcfg=lcfg, cos=cos, sin=sin,
                                positions=positions)
        kq, ks = neox.quantize_kv(k, kv_dtype)
        vq, vs = neox.quantize_kv(v, kv_dtype)
        ck = ck.at[i, page, :, off].set(kq.transpose(0, 2, 1, 3))
        cv = cv.at[i, page, :, off].set(vq.transpose(0, 2, 1, 3))
        cks = cks.at[i, page, :, off].set(ks.transpose(0, 2, 1))
        cvs = cvs.at[i, page, :, off].set(vs.transpose(0, 2, 1))
        from block_transformer_tpu.ops import paged_attention
        attn = paged_attention.paged_decode_attention_int8(
            q, ck, cks, cv, cvs, i, pt, mask, interpret=interp
        ).astype(q.dtype)
        B, Sx = h.shape[0], h.shape[1]
        a_flat = attn.transpose(0, 2, 1, 3).reshape(B, Sx, -1)
        a_part = apply_linear(a_flat,
                              StackedLinear(_nobias(layers["attn"]["out"]), i))
        mlp_in = neox.layer_norm(h, p["ln2"], cfg.layer_norm_eps)
        u = apply_linear(mlp_in, p["mlp"]["up"])
        m_part = apply_linear(jax.nn.gelu(u, approximate=False),
                              StackedLinear(_nobias(layers["mlp"]["down"]), i))
        tot = jax.lax.psum(a_part + m_part, axis)
        tot = tot + _bias_of(layers["attn"]["out"], i) \
                  + _bias_of(layers["mlp"]["down"], i)
        assert cfg.use_parallel_residual, \
            "tp decode implements the parallel-residual (Pythia) layout"
        h = h + tot.astype(h.dtype)
        return (h, ck, cv, cks, cvs), None

    idx = jnp.arange(cfg.num_layers, dtype=jnp.int32)
    (h, nk, nv, nks, nvs), _ = jax.lax.scan(
        body, (x, cache.k, cache.v, cache.k_scale, cache.v_scale), idx)
    new_cache = cache._replace(k=nk, v=nv, k_scale=nks, v_scale=nvs,
                               length=cache.length + S)
    h = neox.layer_norm(h, params["final_ln"], cfg.layer_norm_eps)
    return h, new_cache


def _tp_logits(params, hidden, axis: str = "model"):
    """Vocab-sharded LM head + tiled all_gather -> full [.., V] fp32."""
    local = apply_linear(hidden, _nobias(params["embed_out"]))
    if "bias" in params["embed_out"]:
        local = local + params["embed_out"]["bias"]
    return jax.lax.all_gather(local.astype(jnp.float32), axis, axis=local.ndim - 1,
                              tiled=True)


def _tp_sample_tokens(params, hidden, greedy, temperature, key,
                      top_k: int = 0, top_p: float = 1.0,
                      axis: str = "model"):
    """Vocab-sharded sampling WITHOUT gathering the logits.

    The round-2 path all-gathered the full ``[B, V/tp]`` fp32 logit shard
    every token step (tp_decode.py round-2 :331-337) — at b384 / V=50304
    that is a 77 MB collective on the inner loop's critical path. Greedy
    and pure-temperature sampling only need the global *top-1*, which
    distributes: each shard reduces its slice to (max score, local
    argmax), and one ``all_gather`` of ``[tp, B]`` value/index pairs
    (8 bytes per row instead of ``4*V/tp``) picks the winner.

    - **greedy**: bitwise-exact vs argmax over the gathered logits — the
      shard max preserves values, and ``argmax`` over shards resolves
      value ties to the lowest shard index, i.e. the globally-first
      maximum, matching single-device ``jnp.argmax`` tie-breaking.
    - **temperature**: Gumbel-max over per-shard logits (categorical IS
      argmax of logits + Gumbel noise). The noise comes from
      ``fold_in(key, shard)``, so the sampled stream is distributionally
      exact but not bitwise-identical to the single-device
      ``jax.random.categorical`` stream.
    - **top-k / top-p** need a global sort, so they keep the full logits
      gather (the reference demo's sampling surface stays complete).

    ``BT_TP_FULL_GATHER=1`` restores the round-2 full-gather path for
    A/B measurement.
    """
    from block_transformer_tpu.inference.generate import _sample as _samp
    import os as _os
    if top_k or top_p < 1.0 or _os.environ.get("BT_TP_FULL_GATHER") == "1":
        logits = _tp_logits(params, hidden, axis)
        return _samp(logits, greedy, temperature, key, top_k=top_k,
                     top_p=top_p)
    local = apply_linear(hidden, _nobias(params["embed_out"]))
    if "bias" in params["embed_out"]:
        local = local + params["embed_out"]["bias"]
    local = local.astype(jnp.float32)                    # [B, V_local]
    v_local = local.shape[-1]
    if greedy:
        score = local
    else:
        shard = jax.lax.axis_index(axis)
        g = jax.random.gumbel(jax.random.fold_in(key, shard), local.shape,
                              jnp.float32)
        score = local / temperature + g
    val = jnp.max(score, axis=-1)                        # [B]
    idx = jnp.argmax(score, axis=-1).astype(jnp.int32)   # [B]
    vals = jax.lax.all_gather(val, axis)                 # [tp, B]
    idxs = jax.lax.all_gather(idx, axis)                 # [tp, B]
    win = jnp.argmax(vals, axis=0)                       # [B] lowest-shard tie
    tok = jnp.take_along_axis(idxs, win[None], axis=0)[0]
    return (win.astype(jnp.int32) * v_local + tok).astype(jnp.int32)


# ---------------------------------------------------------------------------
# Two-level decode (shard_map body)
# ---------------------------------------------------------------------------

class _StreamState(NamedTuple):
    """Per-stream decode state for the (optionally) interleaved schedule."""
    tokens: jax.Array        # [Bs, max_blocks, L]
    next_embeds: jax.Array   # [Bs, n, ph]
    cache: object
    kv_valid: jax.Array      # [Bs, capacity]
    unfinished: jax.Array    # [Bs] int32


class _Carry(NamedTuple):
    streams: tuple           # tuple[_StreamState, ...]
    n_blocks: jax.Array
    any_unfinished: jax.Array
    key: jax.Array


def _tp_decode_block_tokens(params, cfg: BlockTransformerConfig, tp,
                            block_embeddings, greedy, temperature, key,
                            top_k: int = 0, top_p: float = 1.0):
    """Inner loop on shards: local token-decoder cache, distributed
    top-1 sampling (no logits gather — see _tp_sample_tokens)."""

    def _sample(hidden_last, greedy, temperature, key):
        return _tp_sample_tokens(params["token_decoder"], hidden_last,
                                 greedy, temperature, key,
                                 top_k=top_k, top_p=top_p)
    tcfg = cfg.token_decoder
    L = cfg.block_length
    n_exp = cfg.n_expanded_emb
    B = block_embeddings.shape[0]
    eos, pad = cfg.eos_token_id, cfg.pad_token_id
    lcfg = _local_cfg(tcfg.neox, tp)

    expanded = td.expand_block_embeddings(params["token_decoder"], tcfg,
                                          block_embeddings,
                                          cfg.expansion_ratio)
    cache = neox.KVCache.create(lcfg, B, n_exp + L, dtype=expanded.dtype)
    capacity = cache.k.shape[3]

    def run(x, cache):
        S = x.shape[1]
        mask = masks.decode_mask(cache.length, capacity, S)
        positions = cache.length + jnp.arange(S, dtype=jnp.int32)
        h, cache = _tp_stack(params["token_decoder"], x, cfg=tcfg.neox, tp=tp,
                             mask=mask, positions=positions, cache=cache,
                             write_pos=cache.length)
        return h[:, -1, :], cache

    hidden, cache = run(expanded, cache)
    key, k0 = jax.random.split(key)
    first = _sample(hidden, greedy, temperature, k0)
    alive = first != eos
    first = jnp.where(alive, first, pad)
    tokens0 = jnp.zeros((B, L), jnp.int32).at[:, 0].set(first)

    def body(i, carry):
        tokens, cache, alive, key = carry
        key, kk = jax.random.split(key)
        prev = jnp.where(alive, tokens[:, i - 1], pad)
        x = neox.embed_tokens(params["token_decoder"], prev[:, None])
        hidden, cache = run(x, cache)
        nxt = _sample(hidden, greedy, temperature, kk)
        emit = jnp.where(alive & (nxt != eos), nxt, pad)
        alive = alive & (nxt != eos)
        tokens = tokens.at[:, i].set(emit)
        return tokens, cache, alive, key

    tokens, _, alive, _ = jax.lax.fori_loop(1, L, body,
                                            (tokens0, cache, alive, key))
    return tokens, alive


def make_tp_generate_blocks(mesh, cfg: BlockTransformerConfig, params_tree,
                            *, max_blocks: int, greedy: bool = True,
                            temperature: float = 1.0,
                            kv_cache: str = "bf16",
                            overlap_streams: int = 1):
    """Build a jitted shard_map two-level generator over ``mesh``.

    Returns ``fn(params, input_ids, attention_mask, block_attention_mask,
    key) -> tokens [B, max_blocks, L]`` with batch sharded over every data
    axis and weights sharded over ``model`` per tp_param_specs.

    ``overlap_streams=2`` enables the **collective/compute overlap
    schedule** (the BASELINE.json north-star clause): the local batch is
    split into two independent half-batch streams, and each loop
    iteration runs ``TD(A); TD(B); BD(A); BD(B)`` — the two chains
    ``TD(A)->BD(A)`` and ``TD(B)->BD(B)`` share no data, so XLA's
    latency-hiding scheduler is free to start one stream's per-layer
    ``psum`` / top-1 ``all_gather`` collectives while the other stream's
    matmuls execute, instead of stalling the whole batch on every
    collective. Numerics per stream are exactly the single-stream path
    at half batch (greedy decode is bitwise-identical either way; the
    sampled key schedule differs). ``overlap_streams=1`` is the round-2
    single-chain schedule.
    """
    assert overlap_streams in (1, 2), overlap_streams
    # resolve BT_FRESH_PREFILL at BUILD time (not trace time) so the flag
    # is baked into this program; flipping the env var later requires
    # rebuilding, never silently reuses a stale trace
    from block_transformer_tpu.inference.generate import _fresh_prefill_enabled
    fresh_prefill = _fresh_prefill_enabled()
    tp = int(mesh.shape["model"])
    data_axes = tuple(a for a in mesh.axis_names if a != "model")
    n = cfg.n_embedding_tokens
    ph = cfg.embedder.projection_hidden_size
    L = cfg.block_length
    capacity = max_blocks * n
    if capacity >= 128:
        capacity = -(-capacity // 128) * 128
    cache_cls = neox.QuantKVCache if kv_cache == "int8" else neox.KVCache
    pspecs = tp_param_specs(params_tree)
    data_p = P(data_axes)

    def body(params, input_ids, attention_mask, bam, key):
        B, N, _ = input_ids.shape
        # decorrelate sampling noise across data shards
        for ax in data_axes:
            key = jax.random.fold_in(key, jax.lax.axis_index(ax))

        def block_step(inputs_embeds, cache, kv_valid, new_valid):
            S = inputs_embeds.shape[1]
            kv_valid = jax.lax.dynamic_update_slice(
                kv_valid, new_valid.astype(kv_valid.dtype), (0, cache.length))
            mask = masks.block_decode_mask(cache.length, capacity, S,
                                           kv_valid, n)
            positions = cache.length + jnp.arange(S, dtype=jnp.int32)
            h, cache = _tp_stack(params["block_decoder"], inputs_embeds,
                                 cfg=cfg.block_decoder, tp=tp,
                                 mask=mask, positions=positions, cache=cache,
                                 write_pos=cache.length)
            return h, cache, kv_valid

        def prefill_stream(ids_s, att_s, bam_s) -> _StreamState:
            Bs = ids_s.shape[0]
            block_embeds = emb.embed_blocks(params["embedder"], cfg.embedder,
                                            L, ids_s, attention_mask=att_s)
            x = block_embeds.reshape(Bs, N * n, ph)
            cache = cache_cls.create(_local_cfg(cfg.block_decoder, tp), Bs,
                                     capacity, dtype=x.dtype)
            kv_valid = jnp.zeros((Bs, capacity), jnp.int32)
            prompt_valid = jnp.repeat(bam_s.astype(jnp.int32), n, axis=1)
            if fresh_prefill:
                # fresh-KV prefill — same default + per-head math as the
                # single-device generator, so TP stays token-exact vs it
                S = N * n
                fmask = masks.block_decode_mask(jnp.int32(0), S, S,
                                                prompt_valid, n)
                fpos = jnp.arange(S, dtype=jnp.int32)
                hidden, cache = _tp_stack(
                    params["block_decoder"], x, cfg=cfg.block_decoder,
                    tp=tp, mask=fmask, positions=fpos, cache=cache,
                    write_pos=jnp.int32(0), fresh=True)
                kv_valid = jax.lax.dynamic_update_slice(
                    kv_valid, prompt_valid, (0, 0))
            else:
                hidden, cache, kv_valid = block_step(x, cache, kv_valid,
                                                     prompt_valid)
            tokens = jnp.zeros((Bs, max_blocks, L), jnp.int32)
            tokens = jax.lax.dynamic_update_slice(
                tokens, ids_s.astype(jnp.int32), (0, 0, 0))
            return _StreamState(tokens, hidden[:, -n:, :], cache, kv_valid,
                                jnp.ones((Bs,), jnp.int32))

        def td_stream(st: _StreamState, kb):
            """Token-decode one block for this stream (inner loop)."""
            alive = st.unfinished.astype(bool)
            new_tokens, inner_alive = _tp_decode_block_tokens(
                params, cfg, tp, st.next_embeds, greedy, temperature, kb)
            new_tokens = jnp.where(alive[:, None], new_tokens,
                                   cfg.pad_token_id)
            return new_tokens, st.unfinished * inner_alive.astype(jnp.int32)

        def bd_stream(st: _StreamState, new_tokens, unfinished,
                      n_blocks) -> _StreamState:
            """Embed the new block and advance this stream's block decoder."""
            Bs = new_tokens.shape[0]
            alive = st.unfinished.astype(bool)
            tokens = jax.lax.dynamic_update_slice(
                st.tokens, new_tokens[:, None, :], (0, n_blocks, 0))
            new_be = emb.embed_blocks(params["embedder"], cfg.embedder, L,
                                      new_tokens)
            new_be = jnp.where(alive[:, None, None], new_be, 0.0)
            hidden, cache, kv_valid = block_step(
                new_be.reshape(Bs, n, ph).astype(st.next_embeds.dtype),
                st.cache, st.kv_valid,
                jnp.broadcast_to(unfinished[:, None], (Bs, n)))
            return _StreamState(tokens, hidden[:, -n:, :], cache, kv_valid,
                                unfinished)

        if overlap_streams == 2:
            assert B % 2 == 0, (B, "overlap_streams=2 needs an even "
                                "per-shard batch")
            h = B // 2
            streams = tuple(
                prefill_stream(input_ids[s:s + h], attention_mask[s:s + h],
                               bam[s:s + h]) for s in (0, h))
        else:
            streams = (prefill_stream(input_ids, attention_mask, bam),)
        carry = _Carry(streams, jnp.int32(N), jnp.int32(1), key)

        def cond(c):
            return (c.n_blocks < max_blocks) & (c.any_unfinished > 0)

        def step(c: _Carry) -> _Carry:
            keys = jax.random.split(c.key, 1 + len(c.streams))
            key = keys[0]
            # All token-decoder inner loops first, then all block-decoder
            # steps: the chains TD(s)->BD(s) are mutually independent, so
            # the scheduler can hide stream s's collectives under stream
            # s+1's compute (and vice versa) — nothing in the program
            # orders them.
            tds = [td_stream(st, keys[1 + i])
                   for i, st in enumerate(c.streams)]
            streams = tuple(bd_stream(st, t, u, c.n_blocks)
                            for st, (t, u) in zip(c.streams, tds))
            # replicated stopping flag: sum unfinished over the data axes
            any_unf = sum(jnp.sum(st.unfinished) for st in streams)
            for ax in data_axes:
                any_unf = jax.lax.psum(any_unf, ax)
            return _Carry(streams, c.n_blocks + 1, any_unf, key)

        final = jax.lax.while_loop(cond, step, carry)
        tokens = (final.streams[0].tokens if len(final.streams) == 1 else
                  jnp.concatenate([st.tokens for st in final.streams], 0))
        return tokens, final.n_blocks

    fn = jax.shard_map(
        body, mesh=mesh,
        in_specs=(pspecs, data_p, data_p, data_p, P()),
        out_specs=(data_p, P()),
        check_vma=False,
    )
    return jax.jit(fn)


# ---------------------------------------------------------------------------
# Serving-engine device programs under shard_map
# ---------------------------------------------------------------------------

def engine_state_specs(cache, data_axes=("data",)) -> tuple:
    """(cache_specs, kv_valid, next_embeds, per_slot) PartitionSpecs for the
    engine's persistent state: slots shard over the data axes, K/V heads
    over ``model`` — the same physical layout the GSPMD engine uses, so
    the two mesh implementations are drop-in interchangeable.

    Paged pools: axis 1 of the pool arrays is ``n_pages`` and partitions
    over the data axes (each shard's sub-pool holds its own slots' pages
    at shard-local ids; the engine allocator keeps per-shard free lists);
    the page table shards with its slot rows. Heads shard over ``model``
    like the contiguous cache."""
    dd = tuple(data_axes)

    def cache_spec(x):
        if x.ndim == 5:                     # k/v [L, B|P, H, cap|ps, D]
            return P(None, dd, "model", None, None)
        if x.ndim == 4:                     # scales [L, B|P, H, cap|ps]
            return P(None, dd, "model", None)
        if x.ndim == 2:                     # page_table [n_slots, n_virt]
            return P(dd)
        return P()                          # length scalar
    cache_specs = jax.tree.map(cache_spec, cache)
    return cache_specs, P(dd), P(dd), P(dd)


def _scatter_valid(kv_valid, write_pos, valid_new, n):
    B, cap = kv_valid.shape
    cols = jnp.arange(cap, dtype=jnp.int32)[None]
    in_range = (cols >= write_pos[:, None]) & (cols < write_pos[:, None] + n)
    return jnp.where(in_range, valid_new[:, None], kv_valid)


def make_tp_engine_programs(mesh, cfg: BlockTransformerConfig, params_tree,
                            cache_tmpl, *, n_slots: int, capacity: int,
                            max_window: int, kv_cache: str = "int8",
                            greedy: bool = True, temperature: float = 1.0,
                            top_k: int = 0, top_p: float = 1.0,
                            overlap_streams: int = 1):
    """The serving engine's two device programs (admission prefill +
    adaptive decode window) as ``shard_map`` bodies with explicit
    collectives. Same signatures and numerics as the engine's GSPMD
    programs, but every mesh axis is Manual, so the fused Pallas kernels
    (INT4 dequant matmul, INT8-KV decode attention) run per shard — the
    GSPMD path must gate them off (no pallas_call partitioning rule).

    Params must be ``prepare_tp_params(params, cfg, tp)``-prepared and
    sharded per ``tp_param_specs``. Slots shard over the data axes;
    admission prefill compute is dp-replicated (each data shard runs the
    same G prompt rows, tp-split by heads) and each shard keeps only its
    slots — prefill is the amortized minority cost, decode is where the
    explicit-collective + per-shard-Pallas win lives.

    ``overlap_streams=2`` brings the north-star overlap schedule to the
    SERVING path (VERDICT r3 item 5): each window iteration splits the
    local slots into two independent half-batch token-decoder chains —
    ``TD(A); TD(B)`` share no data, so stream A's per-layer ``psum`` /
    top-1 sampling collectives can run under stream B's matmuls. Unlike
    the batch generator, the block-decoder step stays joint over the
    whole local batch: splitting it would split the persistent KV cache
    carry (a 2x cache copy at every window boundary), and the token
    decoder is where the per-token collectives live anyway (it issues
    ``block_length`` x per-layer psums + a sampling gather per block vs
    the block decoder's single stacked pass). Greedy decode is bitwise
    identical either way (tested); the sampled key schedule differs.
    """
    assert overlap_streams in (1, 2), overlap_streams
    tp = int(mesh.shape["model"])
    data_axes = tuple(a for a in mesh.axis_names if a != "model")
    dp = int(np.prod([mesh.shape[a] for a in data_axes]))
    assert n_slots % dp == 0, (n_slots, dp)
    n = cfg.n_embedding_tokens
    ph = cfg.embedder.projection_hidden_size
    L = cfg.block_length
    cap = capacity
    I = max_window
    lblk = _local_cfg(cfg.block_decoder, tp)
    paged = kv_cache.startswith("paged")
    paged_bits = 4 if kv_cache.endswith("int4") else 8
    pspecs = tp_param_specs(params_tree)
    cache_specs, valid_p, emb_p, slot_p = engine_state_specs(cache_tmpl,
                                                             data_axes)
    data_p = P(data_axes)

    def _shard_offset():
        off = jnp.int32(0)
        for ax in data_axes:
            off = off * mesh.shape[ax] + jax.lax.axis_index(ax)
        return off * (n_slots // dp)

    # -- admission prefill ---------------------------------------------
    def prefill_body(params, cache, kv_valid, next_embeds, slots, true_len,
                     ids, att, bam):
        G = ids.shape[0]
        Bl = n_slots // dp
        be = emb.embed_blocks(params["embedder"], cfg.embedder, L, ids,
                              attention_mask=att)
        x = be.reshape(G, -1, be.shape[-1])
        S = x.shape[1]
        valid = jnp.zeros((G, cap), jnp.int32)
        valid = jax.lax.dynamic_update_slice(
            valid, jnp.repeat(bam.astype(jnp.int32), n, axis=1), (0, 0))
        mask = masks.block_decode_mask(jnp.int32(0), cap, S, valid, n)
        positions = jnp.arange(S, dtype=jnp.int32)
        if paged:
            # contiguous mini-cache for the admitted rows (local heads),
            # then page-granular scatter into this shard's local sub-pool
            row_cache = neox.QuantKVCache.create(lblk, G, cap,
                                                 bits=paged_bits)
        else:
            row_cache = neox.make_kv_cache(lblk, G, cap, kv_cache,
                                           dtype=x.dtype)
        hidden, row_cache = _tp_stack(params["block_decoder"], x,
                                      cfg=cfg.block_decoder, tp=tp, mask=mask,
                                      positions=positions, cache=row_cache,
                                      write_pos=row_cache.length)
        # each shard keeps its own slots: gather formulation (race-free —
        # a scatter with clipped out-of-shard indices could collide with a
        # real in-shard write)
        ls = slots - _shard_offset()                       # [G] local or out
        onehot = ls[:, None] == jnp.arange(Bl)[None]       # [G, Bl]
        sel = onehot.any(axis=0)                           # [Bl]
        src = jnp.argmax(onehot, axis=0)                   # [Bl] row per slot

        def keep(pool, rows, batch_dim):
            take = jnp.take(rows, src, axis=batch_dim)
            shape = [1] * pool.ndim
            shape[batch_dim] = sel.shape[0]
            return jnp.where(sel.reshape(shape), take, pool)

        if paged:
            # out-of-shard rows target null page 0 (their garbage writes
            # collide there harmlessly — page 0 is always kv_valid=0)
            ps = cache.page_size
            nv = cap // ps
            localg = (ls >= 0) & (ls < Bl)
            pt_rows = jnp.where(
                localg[:, None],
                jnp.take(cache.page_table, jnp.clip(ls, 0, Bl - 1), axis=0),
                0)                                         # [G, nv] local ids

            def paged_vals(a):
                if a.ndim == 5:
                    Lx, Gx, Hx, cx, Dx = a.shape
                    return a.reshape(Lx, Gx, Hx, nv, ps, Dx
                                     ).transpose(0, 1, 3, 2, 4, 5)
                Lx, Gx, Hx, cx = a.shape
                return a.reshape(Lx, Gx, Hx, nv, ps).transpose(0, 1, 3, 2, 4)

            new_cache = cache._replace(
                k=cache.k.at[:, pt_rows].set(paged_vals(row_cache.k)),
                v=cache.v.at[:, pt_rows].set(paged_vals(row_cache.v)),
                k_scale=cache.k_scale.at[:, pt_rows].set(
                    paged_vals(row_cache.k_scale)),
                v_scale=cache.v_scale.at[:, pt_rows].set(
                    paged_vals(row_cache.v_scale)))
        else:
            updates = {f: keep(getattr(cache, f), getattr(row_cache, f), 1)
                       for f in cache._fields if f != "length"}
            new_cache = cache._replace(**updates)
        valid = jnp.where(jnp.arange(cap)[None] < true_len[:, None] * n,
                          valid, 0)
        kv_valid = keep(kv_valid, valid, 0)
        idx = (true_len[:, None] - 1) * n + jnp.arange(n)[None]
        last = jnp.take_along_axis(hidden, idx[:, :, None], axis=1)
        next_embeds = keep(next_embeds, last.astype(next_embeds.dtype), 0)
        return new_cache, kv_valid, next_embeds

    prefill = jax.jit(jax.shard_map(
        prefill_body, mesh=mesh,
        in_specs=(pspecs, cache_specs, valid_p, emb_p, P(), P(), P(), P(),
                  P()),
        out_specs=(cache_specs, valid_p, emb_p),
        check_vma=False), donate_argnums=(1, 2, 3))

    # -- adaptive decode window ----------------------------------------
    def window_body(params, cache, kv_valid, next_embeds, slot_len, alive,
                    blocks_left, key, window_len):
        Bl = next_embeds.shape[0]
        for ax in data_axes:                 # decorrelate sampled streams
            key = jax.random.fold_in(key, jax.lax.axis_index(ax))
        tokens_buf = jnp.full((I, Bl, L), cfg.pad_token_id, jnp.int32)
        eos_buf = jnp.zeros((I, Bl), bool)

        def any_live(alive, blocks_left):
            flag = jnp.any(alive & (blocks_left > 0)).astype(jnp.int32)
            for ax in data_axes:             # uniform trip count: the body
                flag = jax.lax.psum(flag, ax)  # runs collectives every step
            return flag

        def one_block(carry):
            (cache, kv_valid, next_embeds, slot_len, alive, blocks_left,
             key, _) = carry
            live = alive & (blocks_left > 0)
            key, kb = jax.random.split(key)
            if overlap_streams == 2 and Bl % 2 == 0:
                # two independent half-batch TD chains (overlap schedule):
                # nothing orders stream A's collectives vs stream B's math
                h = Bl // 2
                kA, kB = jax.random.split(kb)
                tA, aA = _tp_decode_block_tokens(
                    params, cfg, tp, next_embeds[:h], greedy, temperature,
                    kA, top_k, top_p)
                tB, aB = _tp_decode_block_tokens(
                    params, cfg, tp, next_embeds[h:], greedy, temperature,
                    kB, top_k, top_p)
                tokens = jnp.concatenate([tA, tB], 0)
                inner_alive = jnp.concatenate([aA, aB], 0)
            else:
                tokens, inner_alive = _tp_decode_block_tokens(
                    params, cfg, tp, next_embeds, greedy, temperature, kb,
                    top_k, top_p)
            tokens = jnp.where(live[:, None], tokens, cfg.pad_token_id)
            has_eos = live & ~inner_alive
            new_be = emb.embed_blocks(params["embedder"], cfg.embedder, L,
                                      tokens)
            new_be = jnp.where(live[:, None, None], new_be, 0.0)
            q_idx = jnp.broadcast_to(slot_len[:, None], (Bl, n))
            kv_idx = jnp.arange(cap, dtype=jnp.int32) // n
            write_pos = slot_len * n
            valid_new = live.astype(jnp.int32)
            kv_valid2 = _scatter_valid(kv_valid, write_pos, valid_new, n)
            mask = masks.AttnMask(q_idx, kv_idx, kv_valid2)
            positions = (write_pos[:, None]
                         + jnp.arange(n, dtype=jnp.int32)[None])
            stack = _tp_stack_paged if paged else _tp_stack
            hidden, cache2 = stack(
                params["block_decoder"], new_be.astype(next_embeds.dtype),
                cfg=cfg.block_decoder, tp=tp, mask=mask, positions=positions,
                cache=cache, write_pos=write_pos)
            next2 = hidden[:, -n:, :].astype(next_embeds.dtype)
            next2 = jnp.where(live[:, None, None], next2, next_embeds)
            alive2 = alive & inner_alive
            bl2 = blocks_left - valid_new
            return (cache2, kv_valid2, next2, slot_len + valid_new, alive2,
                    bl2, key, any_live(alive2, bl2)), (tokens, has_eos)

        def cond(state):
            i, _, _, c = state
            return (i < window_len) & (c[-1] > 0)

        def body(state):
            i, tok, eos, c = state
            c, (t, he) = one_block(c)
            return i + 1, tok.at[i].set(t), eos.at[i].set(he), c

        carry = (cache, kv_valid, next_embeds, slot_len, alive, blocks_left,
                 key, any_live(alive, blocks_left))
        _, tokens, has_eos, carry = jax.lax.while_loop(
            cond, body, (jnp.int32(0), tokens_buf, eos_buf, carry))
        (cache, kv_valid, next_embeds, slot_len, alive, blocks_left, key,
         _) = carry
        return (tokens.transpose(1, 0, 2), has_eos.T, cache, kv_valid,
                next_embeds, slot_len, alive, blocks_left, key)

    decode = jax.jit(jax.shard_map(
        window_body, mesh=mesh,
        in_specs=(pspecs, cache_specs, valid_p, emb_p, slot_p, slot_p,
                  slot_p, P(), P()),
        out_specs=(data_p, data_p, cache_specs, valid_p, emb_p, slot_p,
                   slot_p, slot_p, P()),
        check_vma=False), donate_argnums=(1, 2, 3, 4, 5, 6, 7))

    return prefill, decode
