"""Prefill decomposition: where do the b256 p2048 prefill seconds go?

Stages timed separately (each one jit, synced by host fetch):
  1. embedder            embed_blocks at [B, N, L]
  2. block-decoder scan  the exact chunked _block_decoder_step scan of
                         generate_blocks (int8 KV quantize+write included)
  3. matmul floor        the same 12-layer QKV/O/up/down matmul chain at
                         the same M with the same precision config, no
                         attention / rope / LN / cache
The gap between (2) and (3) is attention + rope + layernorm + cache
quantize/write + scan overhead — the target list for further prefill work.

Usage: python scripts/prefill_profile.py [--batch 256] [--prefill 2048]
       [--kv int8] [--quantize int8]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--prefill", type=int, default=2048)
    ap.add_argument("--kv", default="int8")
    ap.add_argument("--quantize", default="int8")
    ap.add_argument("--chunk_blocks", type=int, default=128)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    from block_transformer_tpu.config import get_config
    from block_transformer_tpu.models import block_transformer as bt
    from block_transformer_tpu.models import embedder as emb
    from block_transformer_tpu.models import neox
    from block_transformer_tpu.inference import generate as gen
    from block_transformer_tpu.ops import quant
    from block_transformer_tpu.ops import linear as linear_ops

    cfg = get_config("block_main_b4_1.2b")
    B, P, L = args.batch, args.prefill, cfg.block_length
    N = P // L
    n = cfg.n_embedding_tokens
    ph = cfg.embedder.projection_hidden_size
    dtype = jnp.bfloat16

    params = jax.jit(lambda k: bt.init_block_transformer_params(
        k, cfg, dtype=dtype))(jax.random.PRNGKey(0))
    if args.quantize != "none":
        params = jax.jit(lambda p: quant.quantize_block_transformer(
            p, bits=8 if args.quantize == "int8" else 4))(params)

    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(1, 50254, size=(B, N, L)), jnp.int32)
    att = jnp.ones((B, N, L), jnp.int32)

    def sync(x):
        leaf = jax.tree.leaves(x)[0]
        _ = np.asarray(leaf.reshape(-1)[:8].astype(jnp.float32))

    def timeit(name, fn, *a):
        out = fn(*a)
        sync(out)
        t0 = time.perf_counter()
        out = fn(*a)
        sync(out)
        print(f"{name:24s} {time.perf_counter() - t0:8.3f} s", flush=True)

    # 1. embedder
    embed_fn = jax.jit(lambda p, i, a: emb.embed_blocks(
        p["embedder"], cfg.embedder, L, i, attention_mask=a))
    timeit("embedder", embed_fn, params, ids, att)

    # 2. block-decoder chunked prefill (the generate_blocks formulation)
    S_total = N * n
    chunk = args.chunk_blocks * n
    n_chunks = -(-S_total // chunk)
    capacity = -(-(S_total + 128) // 128) * 128

    @jax.jit
    def block_prefill(p, x_embeds):
        cache = neox.make_kv_cache(cfg.block_decoder, B, capacity, args.kv,
                                   dtype=dtype)
        kv_valid = jnp.zeros((B, capacity), jnp.int32)
        pv = jnp.ones((B, S_total), jnp.int32)
        x_pad = x_embeds.reshape(B, S_total, ph)
        xc = x_pad.reshape(B, n_chunks, chunk, ph).transpose(1, 0, 2, 3)
        vc = pv.reshape(B, n_chunks, chunk).transpose(1, 0, 2)

        def body(carry, xs):
            cache, kv_valid = carry
            xce, vce = xs
            h, cache, kv_valid = gen._block_decoder_step(
                p, cfg, xce, cache, kv_valid, vce)
            return (cache, kv_valid), h[:, -1, :1]

        (_, _), hs = jax.lax.scan(body, (cache, kv_valid), (xc, vc))
        return hs

    x_embeds = embed_fn(params, ids, att)
    timeit("block prefill (full)", block_prefill, params, x_embeds)

    # 2c. same prefill through the chunked online-softmax attention
    # (the opt-in kernel, raced at this exact probe shape)
    os.environ["BT_CHUNKED_PREFILL_ATTN"] = "1"

    @jax.jit
    def block_prefill_chunked(p, x_embeds):
        return block_prefill.__wrapped__(p, x_embeds)

    timeit("block prefill (chunked)", block_prefill_chunked,
           params, x_embeds)
    del os.environ["BT_CHUNKED_PREFILL_ATTN"]

    # 2d. fresh-KV single-pass prefill (neox_prefill_fresh): attention
    # reads the just-computed bf16 K/V; the cache is write-only.
    from block_transformer_tpu.ops import masks as masks_mod

    @jax.jit
    def block_prefill_fresh(p, x_embeds):
        cache = neox.make_kv_cache(cfg.block_decoder, B, capacity, args.kv,
                                   dtype=dtype)
        x_pad = x_embeds.reshape(B, S_total, ph)
        pv = jnp.ones((B, S_total), jnp.int32)
        mask = masks_mod.block_decode_mask(jnp.int32(0), S_total, S_total,
                                           pv, n)
        positions = jnp.arange(S_total, dtype=jnp.int32)
        h, cache = neox.neox_prefill_fresh(
            p["block_decoder"], x_pad, cfg=cfg.block_decoder, mask=mask,
            positions=positions, cache=cache, q_tile=chunk)
        return h[:, -1, :1]

    timeit("block prefill (fresh)", block_prefill_fresh, params, x_embeds)

    # 2e. fresh prefill + Pallas flash attention: skips masked
    # block-causal K tiles (~half the dots) and avoids XLA's softmax
    # recompute passes.
    import dataclasses
    bd_cfg_pallas = dataclasses.replace(cfg.block_decoder,
                                        attn_impl="pallas")

    @jax.jit
    def block_prefill_fresh_pallas(p, x_embeds):
        cache = neox.make_kv_cache(cfg.block_decoder, B, capacity, args.kv,
                                   dtype=dtype)
        x_pad = x_embeds.reshape(B, S_total, ph)
        pv = jnp.ones((B, S_total), jnp.int32)
        mask = masks_mod.block_decode_mask(jnp.int32(0), S_total, S_total,
                                           pv, n)
        positions = jnp.arange(S_total, dtype=jnp.int32)
        h, cache = neox.neox_prefill_fresh(
            p["block_decoder"], x_pad, cfg=bd_cfg_pallas, mask=mask,
            positions=positions, cache=cache, q_tile=chunk)
        return h[:, -1, :1]

    try:
        timeit("block prefill (fresh+flash)", block_prefill_fresh_pallas,
               params, x_embeds)
    except Exception as e:
        print(f"block prefill (fresh+flash) failed: "
              f"{str(e).splitlines()[0][:120]}")

    # 2b (last — OOMs at b256: the bf16 cache alone is ~15 GB). The
    # int8-vs-bf16-KV delta isolates the cache quantize/dequant cost;
    # measurable at --batch 128.
    if args.kv != "bf16":
        saved_kv, args.kv = args.kv, "bf16"

        @jax.jit
        def block_prefill_bf16(p, x_embeds):
            return block_prefill.__wrapped__(p, x_embeds)

        try:
            timeit("block prefill (bf16 KV)", block_prefill_bf16,
                   params, x_embeds)
        except Exception as e:
            print(f"block prefill (bf16 KV) skipped: "
                  f"{str(e).splitlines()[0][:120]}")
        args.kv = saved_kv

    # 3. matmul floor: same 12 layers x (QKV, O, up, down) at the same M,
    # same quantized weights, chained (no attention / LN / rope / cache)
    bd = params["block_decoder"]["layers"]
    M = B * chunk

    @jax.jit
    def matmul_floor(layers, x2):
        def layer(h, i):
            view = lambda name1, name2: linear_ops.StackedLinear(
                layers[name1][name2], i)
            qkv = linear_ops.apply_linear(h, view("attn", "qkv"))
            h = linear_ops.apply_linear(
                qkv[..., :ph].astype(h.dtype), view("attn", "out")) + h
            up = linear_ops.apply_linear(h, view("mlp", "up"))
            dn = linear_ops.apply_linear(up.astype(h.dtype)[..., :],
                                         view("mlp", "down"))
            return h + dn.astype(h.dtype), None

        def chunk_body(carry, i):
            h, _ = jax.lax.scan(
                layer, carry, jnp.arange(cfg.block_decoder.num_layers))
            return h * 0.5, None

        h, _ = jax.lax.scan(chunk_body, x2, jnp.arange(n_chunks))
        return h

    x2 = jnp.asarray(rng.standard_normal((M, ph)), dtype)
    timeit("matmul floor", matmul_floor, bd, x2)


if __name__ == "__main__":
    main()
