"""Functional GPT-NeoX (Pythia) transformer stack in pure JAX.

This is the compute core shared by the block decoder, the token decoder and
the vanilla baseline. Numerics follow HF ``GPTNeoXModel`` (the backend the
reference builds on — model/block_decoder/gpt_neo_x.py,
model/token_decoder/gpt_neo_x.py): partial rotary embeddings (rotary_pct of
the head dim), parallel attention+MLP residual, exact GeLU, fp32 softmax,
LayerNorm with bias.

Design (TPU-first):
- Parameters are plain pytrees with all layers **stacked** on a leading axis
  so the stack runs as one ``lax.scan`` — one compiled layer body regardless
  of depth.
- KV caches are fixed-capacity arrays ``[num_layers, batch, heads, capacity,
  head_dim]`` updated in place with ``dynamic_update_slice`` (donated under
  jit), never concatenated.
- Attention masking is an additive fp32 bias computed once per call by the
  mask library (ops/masks.py); no data-dependent shapes anywhere.

Weight layout: all kernels are ``[in_features, out_features]``. The fused QKV
kernel is ``[hidden, 3*hidden]`` with output columns ordered
``(q|k|v, head, head_dim)`` — i.e. ``jnp.reshape(out, (3, heads, head_dim))``
splits it. (HF stores ``(head, q|k|v, head_dim)``; the checkpoint importer in
utils/torch_import.py permutes.)
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from block_transformer_tpu.config import NeoXConfig
from block_transformer_tpu.ops import attention as attn_ops


# ---------------------------------------------------------------------------
# Parameter init
# ---------------------------------------------------------------------------

def _dense_init(key, shape, std, dtype):
    return (std * jax.random.normal(key, shape, jnp.float32)).astype(dtype)


def init_layer_params(key, cfg: NeoXConfig, dtype=jnp.float32):
    """One transformer layer's parameters (unstacked)."""
    h, m = cfg.hidden_size, cfg.intermediate_size
    std = cfg.initializer_range
    ks = jax.random.split(key, 4)
    return {
        "ln1": {"scale": jnp.ones((h,), dtype), "bias": jnp.zeros((h,), dtype)},
        "ln2": {"scale": jnp.ones((h,), dtype), "bias": jnp.zeros((h,), dtype)},
        "attn": {
            "qkv": {"kernel": _dense_init(ks[0], (h, 3 * h), std, dtype),
                    "bias": jnp.zeros((3 * h,), dtype)},
            "out": {"kernel": _dense_init(ks[1], (h, h), std, dtype),
                    "bias": jnp.zeros((h,), dtype)},
        },
        "mlp": {
            "up": {"kernel": _dense_init(ks[2], (h, m), std, dtype),
                   "bias": jnp.zeros((m,), dtype)},
            "down": {"kernel": _dense_init(ks[3], (m, h), std, dtype),
                     "bias": jnp.zeros((h,), dtype)},
        },
    }


def init_neox_params(key, cfg: NeoXConfig, *, with_embed_in: bool = True,
                     with_lm_head: bool = True, dtype=jnp.float32):
    """Full stack parameters with layers stacked on axis 0."""
    keys = jax.random.split(key, cfg.num_layers + 2)
    layers = [init_layer_params(k, cfg, dtype) for k in keys[:cfg.num_layers]]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs, 0), *layers)
    params = {
        "layers": stacked,
        "final_ln": {"scale": jnp.ones((cfg.hidden_size,), dtype),
                     "bias": jnp.zeros((cfg.hidden_size,), dtype)},
    }
    if with_embed_in:
        params["embed_in"] = {
            "weight": _dense_init(keys[-2], (cfg.vocab_size, cfg.hidden_size),
                                  cfg.initializer_range, dtype)}
    if with_lm_head:
        params["embed_out"] = {
            "kernel": _dense_init(keys[-1], (cfg.hidden_size, cfg.vocab_size),
                                  cfg.initializer_range, dtype)}
    return params


# ---------------------------------------------------------------------------
# Building blocks
# ---------------------------------------------------------------------------

def layer_norm(x, p, eps):
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    return (y * p["scale"].astype(jnp.float32)
            + p["bias"].astype(jnp.float32)).astype(x.dtype)


def dense(x, p):
    # routes through the unified linear op so INT8/INT4-quantized param
    # trees (ops/quant.py) run the fused Pallas dequant-matmul on TPU
    from block_transformer_tpu.ops import linear as linear_ops
    return linear_ops.apply_linear(x, p)


@functools.partial(jax.jit, static_argnums=(0, 1, 2))
def _rope_tables(rotary_dim: int, max_pos: int, theta: float):
    inv_freq = 1.0 / (theta ** (jnp.arange(0, rotary_dim, 2, dtype=jnp.float32)
                                / rotary_dim))
    t = jnp.arange(max_pos, dtype=jnp.float32)
    freqs = jnp.outer(t, inv_freq)                 # [max_pos, rotary_dim/2]
    emb = jnp.concatenate([freqs, freqs], axis=-1)  # [max_pos, rotary_dim]
    return jnp.cos(emb), jnp.sin(emb)


def rope_tables(cfg: NeoXConfig, max_pos: Optional[int] = None):
    return _rope_tables(cfg.rotary_dim, max_pos or cfg.max_position_embeddings,
                        cfg.rope_theta)


def apply_rope(x, cos, sin, positions):
    """Rotate the first ``rotary_dim`` dims of x ([B, H, S, D]) by position.

    positions: [B, S] or [S] int32 absolute positions.
    """
    r = cos.shape[-1]
    x_rot, x_pass = x[..., :r], x[..., r:]
    c = cos[positions].astype(jnp.float32)  # [B, S, r] or [S, r]
    s = sin[positions].astype(jnp.float32)
    if c.ndim == 2:  # [S, r] -> broadcast over batch and heads
        c, s = c[None, None], s[None, None]
    else:            # [B, S, r] -> add head axis
        c, s = c[:, None], s[:, None]
    x1, x2 = jnp.split(x_rot.astype(jnp.float32), 2, axis=-1)
    rotated = jnp.concatenate([-x2, x1], axis=-1)
    x_rot = (x_rot.astype(jnp.float32) * c + rotated * s).astype(x.dtype)
    return jnp.concatenate([x_rot, x_pass], axis=-1)


class KVCache(NamedTuple):
    """Fixed-capacity KV cache for the whole stack.

    k, v: [num_layers, batch, heads, capacity, head_dim]
    length: scalar int32 — number of valid positions (same for every layer).
    """
    k: jax.Array
    v: jax.Array
    length: jax.Array

    @staticmethod
    def create(cfg: NeoXConfig, batch: int, capacity: int, dtype=jnp.bfloat16):
        shape = (cfg.num_layers, batch, cfg.num_heads, capacity, cfg.head_dim)
        return KVCache(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype),
                       jnp.zeros((), jnp.int32))


class QuantKVCache(NamedTuple):
    """Quantized fixed-capacity KV cache (the BASELINE.json hierarchical
    INT8 cache): values int8 — or int4 (``bits=4``), since decode attention
    is measured at the HBM roofline (RESULTS.md) so cache bytes ARE decode
    time — with one fp32 scale per (layer, batch, head, position); halves
    (quarters) cache HBM vs bf16 at <1% metadata overhead.
    """
    k: jax.Array          # int8 / int4 [L, B, H, cap, D]
    v: jax.Array
    k_scale: jax.Array    # f32 [L, B, H, cap]
    v_scale: jax.Array
    length: jax.Array

    @staticmethod
    def create(cfg: NeoXConfig, batch: int, capacity: int, dtype=None,
               bits: int = 8):
        del dtype
        qdt = jnp.int4 if bits == 4 else jnp.int8
        shape = (cfg.num_layers, batch, cfg.num_heads, capacity, cfg.head_dim)
        sshape = shape[:-1]
        return QuantKVCache(jnp.zeros(shape, qdt),
                            jnp.zeros(shape, qdt),
                            jnp.zeros(sshape, jnp.float32),
                            jnp.zeros(sshape, jnp.float32),
                            jnp.zeros((), jnp.int32))


class PagedKVCache(NamedTuple):
    """INT8 paged KV pool (vLLM-style): values live in a shared page pool
    ``[L, n_pages, H, page, D]`` and each batch row maps virtual page
    indices to pool pages through ``page_table`` ``[B, n_virt]``. Page 0 is
    the null page: unallocated virtual pages point there and are masked by
    kv_valid. Attention reads resolve the table inside the Pallas kernel's
    index maps (ops/paged_attention.py) — no gather materialization.
    """
    k: jax.Array          # int8 [L, P, H, ps, D]
    v: jax.Array
    k_scale: jax.Array    # f32 [L, P, H, ps]
    v_scale: jax.Array
    page_table: jax.Array  # int32 [B, n_virt]
    length: jax.Array      # scalar (interface compat; engine tracks per-slot)

    @staticmethod
    def create(cfg: NeoXConfig, batch: int, capacity: int, *,
               n_pages: int, page_size: int = 256, bits: int = 8):
        assert capacity % page_size == 0, (capacity, page_size)
        n_virt = capacity // page_size
        qdt = jnp.int4 if bits == 4 else jnp.int8
        shape = (cfg.num_layers, n_pages, cfg.num_heads, page_size,
                 cfg.head_dim)
        return PagedKVCache(
            jnp.zeros(shape, qdt), jnp.zeros(shape, qdt),
            jnp.zeros(shape[:-1], jnp.float32),
            jnp.zeros(shape[:-1], jnp.float32),
            jnp.zeros((batch, n_virt), jnp.int32),
            jnp.zeros((), jnp.int32))

    @property
    def page_size(self):
        return self.k.shape[3]


def make_kv_cache(cfg: NeoXConfig, batch: int, capacity: int, kind: str,
                  dtype=jnp.bfloat16):
    """kind: 'bf16' | 'int8' | 'int4' (generate/engine/bench --kv values)."""
    if kind == "int8":
        return QuantKVCache.create(cfg, batch, capacity)
    if kind == "int4":
        return QuantKVCache.create(cfg, batch, capacity, bits=4)
    if kind != "bf16":
        raise ValueError(f"unknown kv cache kind {kind!r} "
                         "(expected bf16/int8/int4)")
    return KVCache.create(cfg, batch, capacity, dtype=dtype)


def quantize_kv(x, dtype=jnp.int8):
    """[B, H, S, D] -> (int8/int4 values, f32 scales [B, H, S])."""
    qmax = 7.0 if dtype == jnp.int4 else 127.0
    a = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)
    scale = jnp.maximum(a, 1e-8) / qmax
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale[..., None]),
                 -qmax, qmax).astype(dtype)
    return q, scale


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def _attention(q, k, v, mask, impl: str):
    """q: [B, H, Q, D]; k, v: [B, H, K, D]; mask: masks.AttnMask."""
    return attn_ops.attention(q, k, v, mask, impl=impl)


def layer_qkv(p, x, *, cfg: NeoXConfig, cos, sin, positions):
    """LN1 + fused QKV + RoPE. Returns (q, k, v) each [B, H, S, D]."""
    B, S, H, D = x.shape[0], x.shape[1], cfg.num_heads, cfg.head_dim
    attn_in = layer_norm(x, p["ln1"], cfg.layer_norm_eps)
    qkv = dense(attn_in, p["attn"]["qkv"])                    # [B, S, 3h]
    qkv = qkv.reshape(B, S, 3, H, D).transpose(2, 0, 3, 1, 4)  # [3, B, H, S, D]
    q, k, v = qkv[0], qkv[1], qkv[2]
    q = apply_rope(q, cos, sin, positions)
    k = apply_rope(k, cos, sin, positions)
    return q, k, v


def layer_finish(p, x, attn_heads, *, cfg: NeoXConfig):
    """Output projection + MLP + residual(s). attn_heads: [B, H, S, D]."""
    B, S = x.shape[0], x.shape[1]
    attn_out = attn_heads.transpose(0, 2, 1, 3).reshape(B, S, -1)
    attn_out = dense(attn_out, p["attn"]["out"])
    if cfg.use_parallel_residual:
        mlp_in = layer_norm(x, p["ln2"], cfg.layer_norm_eps)
        mlp_out = dense(jax.nn.gelu(dense(mlp_in, p["mlp"]["up"]),
                                    approximate=False), p["mlp"]["down"])
        return x + attn_out + mlp_out
    x = x + attn_out
    mlp_in = layer_norm(x, p["ln2"], cfg.layer_norm_eps)
    mlp_out = dense(jax.nn.gelu(dense(mlp_in, p["mlp"]["up"]),
                                approximate=False), p["mlp"]["down"])
    return x + mlp_out


def neox_layer(p, x, *, cfg: NeoXConfig, mask, cos, sin, positions,
               cache_kv=None, cache_length=None):
    """One transformer layer (uncached, or explicit per-layer cache slices —
    kept for tests and special callers; the stack's cached path uses the
    carry-based in-place update below)."""
    q, k, v = layer_qkv(p, x, cfg=cfg, cos=cos, sin=sin, positions=positions)
    if cache_kv is not None:
        k_cache, v_cache = cache_kv
        k_full = jax.lax.dynamic_update_slice(
            k_cache, k.astype(k_cache.dtype), (0, 0, cache_length, 0))
        v_full = jax.lax.dynamic_update_slice(
            v_cache, v.astype(v_cache.dtype), (0, 0, cache_length, 0))
        attn_out = _attention(q, k_full.astype(q.dtype), v_full.astype(q.dtype),
                              mask, cfg.attn_impl)
        new_kv = (k_full, v_full)
    else:
        attn_out = _attention(q, k, v, mask, cfg.attn_impl)
        new_kv = None
    return layer_finish(p, x, attn_out, cfg=cfg), new_kv


def layer_view(layers, i):
    """Per-layer view of the stacked ``layers`` pytree.

    Linear nodes become ``StackedLinear`` wrappers (the fused Pallas
    kernels select the layer via scalar prefetch — no materialized weight
    slice; ops/linear.py); small leaves (layer norms, biases inside
    non-linear nodes) are sliced with ``dynamic_index_in_dim``, which XLA
    fuses into their consumers.
    """
    from block_transformer_tpu.ops.linear import StackedLinear

    def walk(node):
        if isinstance(node, dict):
            if any(k.startswith("kernel") for k in node):
                return StackedLinear(node, i)
            return {k: walk(v) for k, v in node.items()}
        return jax.lax.dynamic_index_in_dim(node, i, 0, keepdims=False)

    return walk(layers)


def _write_kv(buf, new, layer, write_pos):
    """Write ``new`` into stacked buffer ``buf[layer]`` at ``write_pos``.

    buf: values ``[L, B, H, cap, D]`` or scales ``[L, B, H, cap]``; new is
    the same minus the layer axis with ``cap -> S``. write_pos: scalar
    (same offset for every row) or ``[B]`` int32 (per-row offsets — the
    engine's per-slot frontier; lowers to an in-place scatter on the
    donated scan carry).
    """
    new = new.astype(buf.dtype)
    values = buf.ndim == 5          # trailing head_dim axis after cap
    tail = (0,) if values else ()
    if getattr(write_pos, "ndim", 0) == 0:
        start = (layer, 0, 0, write_pos) + tail
        return jax.lax.dynamic_update_slice(buf, new[None], start)
    row_buf = jax.lax.dynamic_index_in_dim(buf, layer, 0, keepdims=False)

    def upd(row, val, pos):                 # row [H, cap(, D)], val [H, S(, D)]
        return jax.lax.dynamic_update_slice(row, val, (0, pos) + tail)

    row_buf = jax.vmap(upd)(row_buf, new, write_pos)
    return jax.lax.dynamic_update_index_in_dim(buf, row_buf, layer, axis=0)


def _fused_kv_attn_enabled(S: int, capacity: int = 0) -> bool:
    """Fused Pallas decode attention: decode-sized queries over a LARGE
    cache only. For tiny caches (the token decoder's per-block local cache,
    capacity ~block_length + prefix) a pallas_call per layer is pure grid
    overhead — XLA fuses that attention into adjacent ops for free."""
    import os
    # Opt-in (BT_FUSED_KV_ATTN=1): the retiled kernel reaches 1.27 ms/layer
    # at b128/cap640 int8 but XLA's own fused dequant attention measures
    # 0.90 ms/layer on the same shape (bench.py BT_BENCH_DECOMP stage
    # timings) — XLA fuses the int8->bf16 convert into the attention dots
    # without materializing the cache, and wins end-to-end (10,911 vs
    # 9,371 tok/s at the b256 headline point). See RESULTS.md.
    if os.environ.get("BT_FUSED_KV_ATTN", "0") != "1":
        return False
    from block_transformer_tpu.ops import linear
    if not linear.pallas_allowed():      # sharded program: no GSPMD rule
        return False
    if S > 8 or capacity < 256:
        return False
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def neox_stack(params, x, *, cfg: NeoXConfig, mask, positions,
               cache: Optional[KVCache] = None, remat: bool = False,
               write_pos=None) -> Tuple[jax.Array, Optional[KVCache]]:
    """Run the full stack over hidden states x [B, S, h].

    ``write_pos``: cache write offset — defaults to ``cache.length``
    (scalar); an ``[B]`` int32 vector writes each batch row at its own
    offset (the serving engine's per-slot frontier).
    Returns (final-layer-normed hidden states, updated cache or None).
    """
    max_pos = cfg.max_position_embeddings
    if cache is not None:
        max_pos = max(max_pos, cache.k.shape[3])
    cos, sin = rope_tables(cfg, max_pos)

    if cache is not None and write_pos is None:
        write_pos = cache.length

    if isinstance(cache, PagedKVCache):
        # paged INT8 pool: scatter the new K/V into each row's pages at its
        # own frontier; attention resolves the page table inside the Pallas
        # kernel's index maps (interpret mode off-TPU)
        ps = cache.page_size
        S = x.shape[1]
        pt = cache.page_table
        layers = params["layers"]
        interp = jax.devices()[0].platform != "tpu"
        if write_pos.ndim == 0:
            write_pos = jnp.broadcast_to(write_pos, (x.shape[0],))

        vp = write_pos[:, None] + jnp.arange(S, dtype=jnp.int32)[None]
        page = jnp.take_along_axis(pt, vp // ps, axis=1)          # [B, S]
        off = vp % ps

        kv_dtype = cache.k.dtype

        import os as _os
        # probe-only switch (scripts/paged_stage_probe.py): skip the page
        # write-scatter so its cost can be isolated from the read kernel's
        # on chip. Read at trace time; NEVER set outside the probe.
        nowrite = _os.environ.get("BT_PAGED_PROBE_NOWRITE") == "1"

        # single-position decode steps: the DEFERRED write (default) never
        # writes inside the layer scan — each layer's just-quantized K/V
        # is merged into the attention softmax in-kernel (``fresh``, with
        # q_idx - 1 masking the stale pool slot at the write frontier) and
        # collected as a scan output; ONE batched all-layers Pallas write
        # lands the whole step's K/V after the scan. The per-layer write
        # kernel ("kernel" mode) issued L x B tiny latency-bound RMW DMAs
        # per token step, which measured ~1.9 ms/step of the paged
        # engine's gap to contiguous (BENCH_DETAIL_paged_r4c vs _nowrite);
        # batching the layers amortizes the DMA latency without changing
        # traffic. The XLA advanced-index scatter ("xla") serialized per
        # row and cost ~60% of paged decode. Multi-position writes
        # (prefill-style) keep the XLA scatter — the kernels' scale RMW
        # forbids touching one page twice per launch.
        wmode = _os.environ.get("BT_PAGED_WRITE", "deferred")
        single = S == 1 and kv_dtype == jnp.int8
        deferred = single and wmode == "deferred"
        write_kernel = single and wmode == "kernel"

        from block_transformer_tpu.ops import paged_attention

        if deferred:
            # the pools are INVARIANT during the layer scan (no per-layer
            # write), so they must be closure constants, NOT scan carries:
            # a read-only pool threaded through the carry is not
            # guaranteed to stay in place, and any copy is ~2 GB per
            # occurrence at serving scale
            ck, cv = cache.k, cache.v
            cks, cvs = cache.k_scale, cache.v_scale
            mask_d = mask._replace(q_idx=mask.q_idx - 1)

            def body_d(h, i):
                p = layer_view(layers, i)
                q, k, v = layer_qkv(p, h, cfg=cfg, cos=cos, sin=sin,
                                    positions=positions)
                kq, ks = quantize_kv(k, kv_dtype)
                vq, vs = quantize_kv(v, kv_dtype)
                step_kv = (kq[:, :, 0, :], ks[:, :, 0],
                           vq[:, :, 0, :], vs[:, :, 0])
                # attention sees the DEQUANTIZED fresh pair so its
                # contribution carries the same quantization error a pool
                # read would (token-exact vs the write-first path)
                kf = (step_kv[0].astype(jnp.float32)
                      * step_kv[1][..., None].astype(jnp.float32))
                vf = (step_kv[2].astype(jnp.float32)
                      * step_kv[3][..., None].astype(jnp.float32))
                attn = paged_attention.paged_decode_attention_int8(
                    q, ck, cks, cv, cvs, i, pt, mask_d, fresh=(kf, vf),
                    interpret=interp).astype(q.dtype)
                h = layer_finish(p, h, attn, cfg=cfg)
                return h, step_kv

            if remat:
                body_d = jax.checkpoint(body_d)
            idx = jnp.arange(cfg.num_layers, dtype=jnp.int32)
            h, step_kvs = jax.lax.scan(body_d, x, idx)
            nk, nv, nks, nvs = ck, cv, cks, cvs
            if not nowrite:
                kqs, kss, vqs, vss = step_kvs      # each [L, B, ...]
                nk, nks, nv, nvs = paged_attention.paged_write_layers_int8(
                    ck, cks, cv, cvs, page[:, 0], off[:, 0],
                    kqs, kss, vqs, vss, interpret=interp)
            new_cache = PagedKVCache(nk, nv, nks, nvs, pt,
                                     cache.length + x.shape[1])
        else:
            def body(carry, i):
                h, ck, cv, cks, cvs = carry
                p = layer_view(layers, i)
                q, k, v = layer_qkv(p, h, cfg=cfg, cos=cos, sin=sin,
                                    positions=positions)
                kq, ks = quantize_kv(k, kv_dtype)
                vq, vs = quantize_kv(v, kv_dtype)
                # advanced-index scatter: (page, off) pairs per (b, s);
                # the advanced result group moves to the front -> values
                # [B, S, H, *]
                if nowrite:
                    pass
                elif write_kernel:
                    ck, cks, cv, cvs = paged_attention.paged_write_int8(
                        ck, cks, cv, cvs, i, page[:, 0], off[:, 0],
                        kq[:, :, 0, :], ks[:, :, 0], vq[:, :, 0, :],
                        vs[:, :, 0], interpret=interp)
                else:
                    ck = ck.at[i, page, :, off].set(kq.transpose(0, 2, 1, 3))
                    cv = cv.at[i, page, :, off].set(vq.transpose(0, 2, 1, 3))
                    cks = cks.at[i, page, :, off].set(ks.transpose(0, 2, 1))
                    cvs = cvs.at[i, page, :, off].set(vs.transpose(0, 2, 1))
                attn = paged_attention.paged_decode_attention_int8(
                    q, ck, cks, cv, cvs, i, pt, mask, interpret=interp
                ).astype(q.dtype)
                h = layer_finish(p, h, attn, cfg=cfg)
                return (h, ck, cv, cks, cvs), None

            if remat:
                body = jax.checkpoint(body)
            idx = jnp.arange(cfg.num_layers, dtype=jnp.int32)
            (h, nk, nv, nks, nvs), _ = jax.lax.scan(
                body, (x, cache.k, cache.v, cache.k_scale, cache.v_scale),
                idx)
            new_cache = PagedKVCache(nk, nv, nks, nvs, pt,
                                     cache.length + x.shape[1])
    elif isinstance(cache, QuantKVCache):
        # INT8 cache: quantize the new K/V per position on write. On read,
        # decode-sized queries (S<=8) on TPU go through the fused Pallas
        # int8-KV attention kernel over the full stacked cache (the cache
        # is read once at int8 width — no bf16 materialization); larger
        # S / CPU falls back to dequant + the standard attention path.
        kv_dtype = cache.k.dtype
        use_fused = (_fused_kv_attn_enabled(x.shape[1], cache.k.shape[3])
                     and kv_dtype == jnp.int8)
        layers = params["layers"]
        # Per-row-offset single-position writes (the serving engine's
        # decode: write_pos is the [B] slot-frontier vector): the XLA
        # lowering of vmap(dynamic_update_slice) serializes per row —
        # measured as the engine's ~5,000 tok/s ceiling, FLAT from 128
        # to 256 slots (BENCH_DETAIL_engine_s128/s256: ~72 ms per block
        # step at B=128 where the static b384 step costs 37 ms). The
        # paged pool hit the identical wall and fixed it with a Pallas
        # RMW scatter whose index maps resolve the target row; the
        # contiguous cache IS that layout with page=row — so reuse
        # paged_write_int8 with an identity "page table" (pool [L,B,H,
        # cap,D], page=arange(B), off=write_pos). Sub-tile constraint:
        # cap must divide into the kernel's 32-sublane/128-lane RMW
        # blocks (engine capacities are 128-lane-aligned).
        vec_pos = getattr(write_pos, "ndim", 0) == 1
        cap_ = cache.k.shape[3]
        vsub_ok = cap_ % min(32, cap_) == 0 and cap_ % min(128, cap_) == 0
        use_write_kernel = (vec_pos and x.shape[1] == 1
                            and kv_dtype == jnp.int8 and vsub_ok)
        if use_write_kernel:
            from block_transformer_tpu.ops import paged_attention
            interp_w = jax.devices()[0].platform != "tpu"
            row_ids = jnp.arange(x.shape[0], dtype=jnp.int32)

        def body(carry, i):
            h, ck, cv, cks, cvs = carry
            p = layer_view(layers, i)
            q, k, v = layer_qkv(p, h, cfg=cfg, cos=cos, sin=sin,
                                positions=positions)
            kq, ks = quantize_kv(k, kv_dtype)
            vq, vs = quantize_kv(v, kv_dtype)
            if use_write_kernel:
                ck, cks, cv, cvs = paged_attention.paged_write_int8(
                    ck, cks, cv, cvs, i, row_ids, write_pos,
                    kq[:, :, 0, :], ks[:, :, 0], vq[:, :, 0, :],
                    vs[:, :, 0], interpret=interp_w)
            else:
                ck = _write_kv(ck, kq, i, write_pos)
                cv = _write_kv(cv, vq, i, write_pos)
                cks = _write_kv(cks, ks, i, write_pos)
                cvs = _write_kv(cvs, vs, i, write_pos)
            if use_fused:
                from block_transformer_tpu.ops import decode_attention
                attn = decode_attention.decode_attention_int8_stacked(
                    q, ck, cks, cv, cvs, i, mask)
            else:
                kq_all = jax.lax.dynamic_index_in_dim(ck, i, 0, keepdims=False)
                vq_all = jax.lax.dynamic_index_in_dim(cv, i, 0, keepdims=False)
                ks_all = jax.lax.dynamic_index_in_dim(cks, i, 0, keepdims=False)
                vs_all = jax.lax.dynamic_index_in_dim(cvs, i, 0, keepdims=False)
                k_all = (kq_all.astype(jnp.float32)
                         * ks_all[..., None]).astype(q.dtype)
                v_all = (vq_all.astype(jnp.float32)
                         * vs_all[..., None]).astype(q.dtype)
                attn = _attention(q, k_all, v_all, mask, cfg.attn_impl)
            h = layer_finish(p, h, attn, cfg=cfg)
            return (h, ck, cv, cks, cvs), None

        if remat:
            body = jax.checkpoint(body)
        idx = jnp.arange(cfg.num_layers, dtype=jnp.int32)
        (h, nk, nv, nks, nvs), _ = jax.lax.scan(
            body, (x, cache.k, cache.v, cache.k_scale, cache.v_scale), idx)
        new_cache = QuantKVCache(nk, nv, nks, nvs, cache.length + x.shape[1])
    elif cache is not None:
        # Cache is CARRIED through the layer scan and updated with one small
        # dynamic_update_slice per layer, so XLA keeps it in place (donated
        # carry) — the xs/ys formulation forced full input+output cache
        # copies (observed 4-5x cache footprint on TPU decode).
        use_fused = _fused_kv_attn_enabled(x.shape[1], cache.k.shape[3])
        layers = params["layers"]

        def body(carry, i):
            h, ck, cv = carry
            p = layer_view(layers, i)
            q, k, v = layer_qkv(p, h, cfg=cfg, cos=cos, sin=sin,
                                positions=positions)
            ck = _write_kv(ck, k, i, write_pos)
            cv = _write_kv(cv, v, i, write_pos)
            if use_fused:
                from block_transformer_tpu.ops import decode_attention
                attn = decode_attention.decode_attention_stacked(
                    q, ck, cv, i, mask).astype(q.dtype)
            else:
                k_all = jax.lax.dynamic_index_in_dim(ck, i, 0, keepdims=False)
                v_all = jax.lax.dynamic_index_in_dim(cv, i, 0, keepdims=False)
                attn = _attention(q, k_all.astype(q.dtype),
                                  v_all.astype(q.dtype), mask, cfg.attn_impl)
            h = layer_finish(p, h, attn, cfg=cfg)
            return (h, ck, cv), None

        if remat:
            body = jax.checkpoint(body)
        idx = jnp.arange(cfg.num_layers, dtype=jnp.int32)
        (h, new_k, new_v), _ = jax.lax.scan(body, (x, cache.k, cache.v), idx)
        new_cache = KVCache(new_k, new_v, cache.length + x.shape[1])
    else:
        def body(h, p):
            h, _ = neox_layer(p, h, cfg=cfg, mask=mask, cos=cos, sin=sin,
                              positions=positions)
            return h, None

        if remat:
            body = jax.checkpoint(body)
        h, _ = jax.lax.scan(body, x, params["layers"])
        new_cache = None

    h = layer_norm(h, params["final_ln"], cfg.layer_norm_eps)
    return h, new_cache


def fresh_attn_tiles(mask, S: int, q_tile: int, attn_impl):
    """Build the q-tiled full-K attention closure for fresh prefill.

    Returns ``attn_tiles(q, k, v) -> [B, H, S, D]`` that scans ``q_tile``
    query rows at a time against the full fresh K/V, bounding transient
    score buffers at [B, H, q_tile, S]. Any static S works: when
    ``S % q_tile != 0`` the query rows are padded up to the next q_tile
    multiple (padded rows reuse the last real q_idx mask row and are
    sliced off the output) — never degraded to tiny divisor tiles, which
    for a prime-ish S would silently scan hundreds of few-row attentions
    per layer. Shared by the single-device fresh prefill and the TP
    shard_map fresh branch (attention is per-head independent, so the
    same closure is exact on each shard's local heads).
    """
    from block_transformer_tpu.ops import masks as masks_lib

    tq = min(q_tile, S)
    tiles = -(-S // tq)          # ceil
    pad_q = tiles * tq - S
    q_idx_full = mask.q_idx if mask.q_idx.ndim == 1 else None
    assert q_idx_full is not None, "fresh prefill expects unbatched q_idx"
    q_idx_pad = q_idx_full
    if pad_q:
        q_idx_pad = jnp.concatenate(
            [q_idx_full, jnp.broadcast_to(q_idx_full[-1:], (pad_q,))])

    def attn_tiles(q, k, v):
        if tiles == 1:
            return _attention(q, k, v, mask, attn_impl)
        if pad_q:
            q = jnp.concatenate(
                [q, jnp.zeros((*q.shape[:2], pad_q, q.shape[3]), q.dtype)],
                axis=2)

        def tile_body(_, t):
            q_t = jax.lax.dynamic_slice_in_dim(q, t * tq, tq, axis=2)
            m_t = masks_lib.AttnMask(
                jax.lax.dynamic_slice_in_dim(q_idx_pad, t * tq, tq, 0),
                mask.kv_idx, mask.kv_valid)
            return None, _attention(q_t, k, v, m_t, attn_impl)

        _, out = jax.lax.scan(tile_body, None,
                              jnp.arange(tiles, dtype=jnp.int32))
        # out: [tiles, B, H, tq, D] -> [B, H, tiles*tq, D] -> [:, :, :S]
        out = out.transpose(1, 2, 0, 3, 4).reshape(
            q.shape[0], q.shape[1], tiles * tq, q.shape[3])
        return out[:, :, :S] if pad_q else out

    return attn_tiles


def neox_prefill_fresh(params, x, *, cfg: NeoXConfig, mask, positions,
                       cache, q_tile: int = 512):
    """Prefill an EMPTY cache in one pass, attending to fresh bf16 K/V.

    The streaming prefill (chunked caller around ``neox_stack``) reads the
    whole quantized cache back every layer x chunk and dequantizes it to
    bf16 — at b256 p2048 int8 that re-materialization is ~438 GB of HBM
    traffic, ~1.1 s, i.e. most of the 64% non-matmul prefill share
    measured by scripts/prefill_profile.py. Here each layer's attention
    consumes the K/V it just computed (bf16; the cache is write-only
    during prefill), so prompt attention reads *unquantized* K/V —
    strictly less quantization error than the streaming path — and the
    cache costs one int8/int4 write per layer.

    Queries are tiled (``q_tile`` rows per step, scan) against the full
    fresh K/V so transient attention buffers match the streaming path's;
    K/V themselves are one [B, H, S, D] bf16 transient per layer — the
    same size as the streaming path's dequantized k_all/v_all.

    Any static S works: when ``S % q_tile != 0`` the query rows are padded
    up to the next q_tile multiple (padded rows reuse the last real q_idx
    mask row and are sliced off the output) — never degraded to tiny
    divisor tiles, which for a prime-ish S would silently scan hundreds
    of few-row attentions per layer.
    ``mask`` covers the full [S, S] prompt (block-causal); tiles slice its
    q_idx rows. Returns (hidden [B, S, h] final-normed, filled cache with
    length = S).
    """
    B, S, _ = x.shape
    max_pos = max(cfg.max_position_embeddings, cache.k.shape[3])
    cos, sin = rope_tables(cfg, max_pos)
    layers = params["layers"]
    quant = isinstance(cache, QuantKVCache)
    kv_dtype = cache.k.dtype

    attn_tiles = fresh_attn_tiles(mask, S, q_tile, cfg.attn_impl)

    if quant:
        def body(carry, i):
            h, ck, cv, cks, cvs = carry
            p = layer_view(layers, i)
            q, k, v = layer_qkv(p, h, cfg=cfg, cos=cos, sin=sin,
                                positions=positions)
            kq, ks = quantize_kv(k, kv_dtype)
            vq, vs = quantize_kv(v, kv_dtype)
            ck = _write_kv(ck, kq, i, jnp.int32(0))
            cv = _write_kv(cv, vq, i, jnp.int32(0))
            cks = _write_kv(cks, ks, i, jnp.int32(0))
            cvs = _write_kv(cvs, vs, i, jnp.int32(0))
            attn = attn_tiles(q, k, v)
            h = layer_finish(p, h, attn, cfg=cfg)
            return (h, ck, cv, cks, cvs), None

        idx = jnp.arange(cfg.num_layers, dtype=jnp.int32)
        (h, nk, nv, nks, nvs), _ = jax.lax.scan(
            body, (x, cache.k, cache.v, cache.k_scale, cache.v_scale), idx)
        new_cache = QuantKVCache(nk, nv, nks, nvs, jnp.int32(S))
    else:
        def body(carry, i):
            h, ck, cv = carry
            p = layer_view(layers, i)
            q, k, v = layer_qkv(p, h, cfg=cfg, cos=cos, sin=sin,
                                positions=positions)
            ck = _write_kv(ck, k, i, jnp.int32(0))
            cv = _write_kv(cv, v, i, jnp.int32(0))
            attn = attn_tiles(q, k, v)
            h = layer_finish(p, h, attn, cfg=cfg)
            return (h, ck, cv), None

        idx = jnp.arange(cfg.num_layers, dtype=jnp.int32)
        (h, nk, nv), _ = jax.lax.scan(body, (x, cache.k, cache.v), idx)
        new_cache = KVCache(nk, nv, jnp.int32(S))

    h = layer_norm(h, params["final_ln"], cfg.layer_norm_eps)
    return h, new_cache


def embed_tokens(params, input_ids):
    return params["embed_in"]["weight"][input_ids]


def lm_logits(params, hidden):
    """Untied LM head (GPTNeoX embed_out): [.., h] -> [.., vocab] fp32."""
    from block_transformer_tpu.ops import linear as linear_ops
    return linear_ops.apply_linear(hidden, params["embed_out"]).astype(jnp.float32)
