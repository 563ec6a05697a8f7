"""Benchmark driver: decode throughput of the Block Transformer on TPU.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Regime (BASELINE.md / measure_generation_time.py defaults): prefill 128 /
decode 128 greedy, batch as configured, block_main family model, bf16.
``vs_baseline`` is the decode-throughput ratio vs the vanilla GPTNeoX
baseline at matched parameter count measured in the same process — the
reference's headline claim is this ratio (10-20x at scale; README.md:18).
"""

import argparse
import functools
import json
import os
import time

import numpy as np


def _quant_kwargs(quantize: str, skip_head: bool) -> dict:
    """--quantize value -> quantize_block_transformer kwargs.

    mixed48 = block decoder INT8, token decoder INT4 (group scales), LM
    head INT8: at decode the token decoder re-reads its whole stack per
    *token* step (weight-streaming-bound) while the block decoder pays per
    *block* step, so INT4 goes where the bytes are and INT8 stays where
    quality is cheap.
    """
    if quantize == "mixed48":
        return {"bits": 8, "token_decoder_bits": 4,
                "lm_head_bits": None if skip_head else 8,
                "skip_lm_head": skip_head,
                "group_size": int(os.environ.get("BT_INT4_GROUP", "128"))}
    return {"bits": 8 if quantize == "int8" else 4,
            "skip_lm_head": skip_head,
            "group_size": int(os.environ.get("BT_INT4_GROUP", "128"))}


def _enable_compile_cache():
    import jax
    cache_dir = os.environ.get("JAX_CACHE_DIR", "/root/repo/.jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def bench_block(model_name: str, batch, prefill: int, decode: int,
                dtype_str: str = "bfloat16", quantize: str = None,
                kv_cache: str = "bf16", attn_impl: str = None):
    import jax
    import jax.numpy as jnp
    from block_transformer_tpu.config import get_config
    from block_transformer_tpu.models import block_transformer as bt
    from block_transformer_tpu.inference import generate as gen
    from block_transformer_tpu.utils import hbm

    dtype = jnp.bfloat16 if dtype_str == "bfloat16" else jnp.float32
    cfg = get_config(model_name)
    if attn_impl:
        import dataclasses
        cfg = dataclasses.replace(
            cfg,
            block_decoder=dataclasses.replace(cfg.block_decoder,
                                              attn_impl=attn_impl),
            token_decoder=dataclasses.replace(
                cfg.token_decoder,
                neox=dataclasses.replace(cfg.token_decoder.neox,
                                         attn_impl=attn_impl)))
    if quantize and quantize != "none":
        from block_transformer_tpu.ops import quant
    if batch == "auto":
        batch = hbm.auto_batch(
            lambda b: hbm.block_model_bytes(cfg, b, prefill, decode,
                                            kv_cache=kv_cache,
                                            quantize=quantize))
        print(f"[bench] block auto batch -> {batch}", flush=True)
    batch = int(batch)
    params = jax.jit(lambda k: bt.init_block_transformer_params(
        k, cfg, dtype=dtype))(jax.random.PRNGKey(0))
    if quantize and quantize != "none":
        skip_head = os.environ.get("BT_SKIP_QUANT_HEAD", "0") == "1"
        params = jax.jit(lambda p: quant.quantize_block_transformer(
            p, **_quant_kwargs(quantize, skip_head)))(params)
    L = cfg.block_length
    N = prefill // L
    max_blocks = (prefill + decode) // L
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(1, 50254, size=(batch, N, L)), jnp.int32)
    att = jnp.ones((batch, N, L), jnp.int32)
    bam = jnp.ones((batch, N), jnp.int32)

    def run():
        res = gen.generate_blocks(params, cfg, ids, att, bam,
                                  max_blocks=max_blocks, greedy=True,
                                  kv_cache=kv_cache)
        jax.block_until_ready(res.tokens)
        return res

    run()  # warmup + compile
    n_rep = int(os.environ.get("BT_BENCH_REPS", "5"))
    times = []
    for _ in range(n_rep):
        t0 = time.perf_counter()
        run()
        times.append(time.perf_counter() - t0)
    # median, not mean: reps run over the axon tunnel, and a single
    # multi-second dispatch stall (times_s records every rep) would
    # otherwise swing the headline ~25% (observed: [3.43x4, 8.96]).
    # The median is the steady-state rate; std_s still flags the outlier.
    dt = float(np.median(times))
    detail = {
        "median_s": dt, "mean_s": float(np.mean(times)),
        "std_s": float(np.std(times)), "reps": n_rep,
        "ms_per_sample": 1e3 * dt / batch,
        "ms_per_token": 1e3 * dt / (batch * decode),
        "times_s": [round(t, 4) for t in times],
    }
    if os.environ.get("BT_BENCH_DECOMP", "1") != "0":
        # diagnostic stage timings, taken at the HEADLINE batch so the MFU
        # fields describe the actual operating point (VERDICT r3 item 8).
        # Some isolation probes can exceed HBM where the fused real program
        # doesn't (the XLA-dequant block stage once OOMed at b256 with an
        # int8 cache): on failure, halve the probe batch until it fits and
        # record every fallback — per-block-step times scale ~linearly in
        # batch, so a recorded smaller probe stays interpretable.
        dbatch = min(batch, int(os.environ.get("BT_BENCH_DECOMP_BATCH",
                                               str(batch))))
        d = None
        while dbatch >= 16:
            try:
                d = _two_level_decomposition(params, cfg, dbatch, prefill,
                                             decode, dtype, kv_cache)
                break
            except Exception as e:  # diagnostic, not the metric
                detail.setdefault("decomposition_fallbacks", []).append(
                    {"batch": dbatch, "error": str(e)[:160]})
                dbatch //= 2
        if d is not None:
            d["decomposition_batch"] = dbatch
            detail.update(d)
            try:
                from block_transformer_tpu.utils import roofline
                detail.update(roofline.mfu_summary(
                    cfg, batch=dbatch, prefill=prefill, decode=decode,
                    kv_cache=kv_cache, quantize=quantize,
                    bd_ms=d.get("block_decoder_ms_per_block_step"),
                    td_ms=d.get("token_decoder_ms_per_block_step"),
                    prefill_ms=d.get("prefill_ms")))
            except Exception as e:
                detail["decomposition_error"] = str(e)[:200]
        else:
            detail["decomposition_error"] = "all probe batches failed"
    decode_tokens = batch * decode
    tps = decode_tokens / dt
    try:
        # headline MFU: whole-run tok/s x analytic FLOPs/token at the FULL
        # batch vs bf16 peak (includes prefill time in the denominator, so
        # it lower-bounds the decode-stage MFU above)
        from block_transformer_tpu.utils import roofline
        m = roofline.decode_stage_model(cfg, batch, prefill, decode,
                                        kv_cache, quantize)
        detail["mfu_decode_headline"] = (
            tps * m["flops_per_token"]) / roofline.PEAK_BF16_FLOPS
    except Exception:
        pass
    return tps, batch, detail


def _two_level_decomposition(params, cfg, batch, prefill, decode, dtype,
                             kv_cache, iters: int = 32):
    """Block-decoder vs token-decoder time at the decode operating point
    (reference: model/block_transformer.py:345-353 benchmark=True timing).
    Each stage loops ``iters`` times inside one jit with a data dependence
    so dispatch/LICM can't hollow it out."""
    import jax
    import jax.numpy as jnp
    from block_transformer_tpu.inference import generate as gen
    from block_transformer_tpu.models import neox
    from block_transformer_tpu.ops import masks

    n = cfg.n_embedding_tokens
    ph = cfg.embedder.projection_hidden_size
    slots = (prefill + decode) // cfg.block_length * n
    capacity = -(-slots // 128) * 128
    filled = prefill // cfg.block_length * n
    be = jnp.zeros((batch, n, ph), dtype)

    # params must be a jit ARGUMENT, not a closure capture: closed-over
    # arrays ride in the compile payload and break the remote-compile pipe.
    @jax.jit
    def token_stage(params, be):
        def body(i, carry):
            be, acc = carry
            toks, _ = gen.decode_block_tokens(params, cfg,
                                              be + acc * 1e-9, greedy=True)
            return be, acc + jnp.sum(toks)
        _, acc = jax.lax.fori_loop(0, iters, body, (be, jnp.int32(0)))
        return acc

    # the cache is created INSIDE the jit: it never crosses the jit
    # boundary (so the loop carry updates in place with no donation
    # plumbing, and quantized-int4 caches work at all — int4 arrays
    # cannot be transferred across the boundary on this platform)
    @jax.jit
    def block_stage(params, be):
        cache = neox.make_kv_cache(cfg.block_decoder, batch, capacity,
                                   kv_cache, dtype=dtype)
        cache = cache._replace(length=jnp.int32(filled))
        kv_valid = (jnp.arange(capacity)[None] < filled).astype(
            jnp.int32).repeat(batch, 0)

        def body(i, carry):
            be, cache, kv_valid = carry
            h, cache, kv_valid = gen._block_decoder_step(
                params, cfg, be, cache, kv_valid,
                jnp.ones((batch, n), jnp.int32))
            cache = cache._replace(length=cache.length - n)  # stay in place
            return h[:, -n:, :].astype(be.dtype), cache, kv_valid
        be, cache, kv_valid = jax.lax.fori_loop(0, iters, body,
                                                (be, cache, kv_valid))
        return be

    # the in-jit cache creation above zero-fills multi-GB buffers that real
    # decode never pays per step: time a create-only program and subtract
    @jax.jit
    def cache_only(be):
        cache = neox.make_kv_cache(cfg.block_decoder, batch, capacity,
                                   kv_cache, dtype=dtype)
        # scalar data dependence on the zero-fill, valid for any leaf rank
        # (bf16 k is [layers,B,H,S,D]; int4 packs the last axis)
        return be + jax.tree.leaves(cache)[0].astype(be.dtype).ravel()[0]

    # prefill stage: the real chunked prompt pass at this batch (embed ->
    # chunk-scanned block decoder), timed as generate_blocks runs it
    N = max(1, prefill // cfg.block_length)
    rng = np.random.default_rng(0)
    p_ids = jnp.asarray(rng.integers(1, cfg.embedder.vocab_size - 2,
                                     size=(batch, N, cfg.block_length)),
                        jnp.int32)
    p_att = jnp.ones_like(p_ids)
    p_bam = jnp.ones((batch, N), jnp.int32)

    @jax.jit
    def prefill_stage(params, ids, att, bam):
        ne, cache, kv_valid = gen.prefill_blocks(params, cfg, ids, att, bam,
                                                 capacity=capacity,
                                                 kv_cache=kv_cache)
        return ne

    out = {}
    jax.block_until_ready(prefill_stage(params, p_ids, p_att, p_bam))
    pf = []
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(prefill_stage(params, p_ids, p_att, p_bam))
        pf.append(time.perf_counter() - t0)
    out["prefill_ms"] = 1e3 * min(pf)
    jax.block_until_ready(token_stage(params, be))
    t0 = time.perf_counter()
    jax.block_until_ready(token_stage(params, be))
    out["token_decoder_ms_per_block_step"] = \
        1e3 * (time.perf_counter() - t0) / iters
    jax.block_until_ready(cache_only(be))
    t0 = time.perf_counter()
    jax.block_until_ready(cache_only(be))
    fill_s = time.perf_counter() - t0
    jax.block_until_ready(block_stage(params, be))
    t0 = time.perf_counter()
    jax.block_until_ready(block_stage(params, be))
    out["block_decoder_ms_per_block_step"] = \
        1e3 * max(0.0, time.perf_counter() - t0 - fill_s) / iters
    return out


def bench_vanilla(name: str, batch, prefill: int, decode: int,
                  dtype_str: str = "bfloat16", quantize: str = None,
                  kv_cache: str = "bf16"):
    """Vanilla GPTNeoX baseline at the same protocol as bench_block.

    ``quantize``/``kv_cache`` build the precision-matched baseline
    (VERDICT r4 item 1; reference protocol runs both models at ONE
    precision, measure_generation_time.py:164-204): the same
    quantize_model_params INT8/INT4 weights and the same QuantKVCache
    int8 token-level cache the block model gets, auto-batched with the
    same static-HBM model. The vanilla cache is its HBM bound, so
    quantizing it materially raises its feasible batch — the honest
    architecture-only comparison is block-quantized vs vanilla-quantized.
    """
    import jax
    import jax.numpy as jnp
    from block_transformer_tpu.config import get_vanilla_config
    from block_transformer_tpu.models import vanilla, neox
    from block_transformer_tpu.utils import hbm

    dtype = jnp.bfloat16 if dtype_str == "bfloat16" else jnp.float32
    cfg = get_vanilla_config(name)
    if batch == "auto":
        # vanilla decode holds ~2 cache copies through the loop (measured
        # 16.08G at b32/p2048 where the static estimate says 7.9G)
        batch = hbm.auto_batch(
            lambda b: hbm.vanilla_model_bytes(cfg, b, prefill, decode,
                                              kv_cache=kv_cache,
                                              quantize=quantize),
            margin=0.4)
        print(f"[bench] vanilla auto batch -> {batch}", flush=True)
    batch = int(batch)
    params = jax.jit(lambda k: vanilla.init_vanilla_params(
        k, cfg, dtype=dtype))(jax.random.PRNGKey(0))
    if quantize and quantize != "none":
        from block_transformer_tpu.ops import quant
        bits = 8 if quantize == "int8" else 4
        params = jax.jit(lambda p: quant.quantize_model_params(
            p, bits=bits,
            group_size=int(os.environ.get("BT_INT4_GROUP", "128"))))(params)

    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(1, 50254, size=(batch, prefill)), jnp.int32)

    @jax.jit
    def full_generate(params, ids):
        # cache created INSIDE the jit: one executable, XLA owns liveness
        cache = neox.make_kv_cache(cfg, batch, prefill + decode, kv_cache,
                                   dtype=dtype)
        logits, cache = vanilla.vanilla_prefill(params, cfg, ids, cache)
        tok = jnp.argmax(logits, -1).astype(jnp.int32)

        def body(i, carry):
            tok, cache = carry
            logits, cache = vanilla.vanilla_decode_step(params, cfg, tok, cache)
            return jnp.argmax(logits, -1).astype(jnp.int32), cache

        tok, cache = jax.lax.fori_loop(0, decode, body, (tok, cache))
        return tok

    def run():
        jax.block_until_ready(full_generate(params, ids))

    run()
    n_rep = int(os.environ.get("BT_BENCH_REPS", "5"))
    times = []
    for _ in range(n_rep):
        t0 = time.perf_counter()
        run()
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times))          # stall-robust (see bench_decode)
    detail = {"median_s": dt, "mean_s": float(np.mean(times)),
              "std_s": float(np.std(times)), "reps": n_rep,
              "ms_per_sample": 1e3 * dt / batch,
              "ms_per_token": 1e3 * dt / (batch * decode),
              "quantize": quantize or "none", "kv_cache": kv_cache}
    return batch * decode / dt, batch, detail


def bench_engine(model_name: str, n_slots: int, prefill: int, decode: int,
                 dtype_str: str = "bfloat16", quantize: str = None,
                 kv_cache: str = "int8", latency_mode: bool = False):
    """Continuous-batching engine throughput: n_slots concurrent prompts,
    steady-state decode tok/s (target >= 80% of static-batch
    generate_blocks at the same batch). ``latency_mode`` runs the
    TTFT-bounded window ramp (short first window, geometric growth) and
    reports the latency metrics alongside throughput."""
    import jax
    import jax.numpy as jnp
    from block_transformer_tpu.config import get_config
    from block_transformer_tpu.models import block_transformer as bt
    from block_transformer_tpu.inference.engine import ContinuousBatchingEngine

    dtype = jnp.bfloat16 if dtype_str == "bfloat16" else jnp.float32
    cfg = get_config(model_name)
    params = jax.jit(lambda k: bt.init_block_transformer_params(
        k, cfg, dtype=dtype))(jax.random.PRNGKey(0))
    if quantize and quantize != "none":
        from block_transformer_tpu.ops import quant
        params = jax.jit(lambda p: quant.quantize_block_transformer(
            p, **_quant_kwargs(quantize,
                               os.environ.get("BT_SKIP_QUANT_HEAD",
                                              "0") == "1")))(params)
    L = cfg.block_length
    max_blocks = (prefill + decode) // L + 2
    ekw = {}
    if kv_cache.startswith("paged"):
        # The bench workload is paging's degenerate case: every request is
        # max-length, so the memory paging exists to reclaim (short/mixed
        # prompts) is zero by construction. The engine's default pool
        # (half the dense footprint) then admits only half the slots and
        # the waiting queue caps decode windows at sync_blocks — measured
        # 6 dispatches vs 2 and ~half occupancy at d64 (the real cause of
        # the 1,175-1,188 tok/s plateau; BENCH_DETAIL_paged_r4.json).
        # Size the pool to the workload so the race measures paging
        # OVERHEAD (page-table indirection, per-page scatter, kernel) at
        # iso-capacity; pool economics stay a serving-policy default.
        n_emb = cfg.n_embedding_tokens
        cap = max_blocks * n_emb
        cap = -(-cap // 128) * 128 if cap >= 128 else cap
        ps = min(256, cap)
        n_virt = (-(-cap // ps) * ps) // ps
        ekw["pool_pages"] = n_slots * n_virt + 1
    eng = ContinuousBatchingEngine(
        params, cfg, n_slots=n_slots, max_blocks=max_blocks,
        kv_cache=kv_cache, bucket_blocks=prefill // L,
        sync_blocks=int(os.environ.get("BT_ENGINE_SYNC_BLOCKS", "8")),
        latency_mode=latency_mode, **ekw)
    rng = np.random.default_rng(0)

    def submit_all():
        for _ in range(n_slots):
            eng.submit(rng.integers(1, 50254, size=prefill), decode)

    submit_all()
    eng.run()                               # warmup: compiles prefill+decode
    # median-of-reps (see bench_decode): the whole-workload time is a
    # couple of tunnel dispatches, and a single dispatch stall measured
    # 0.26 -> 0.99 s on the SAME admission path across back-to-back runs
    n_rep = int(os.environ.get("BT_BENCH_REPS", "5"))
    runs = []
    for _ in range(n_rep):
        tokens0 = eng.stats.tokens_generated
        steps0 = eng.stats.steps
        waste0 = eng.stats.tokens_wasted
        done0 = len(eng.completed)
        submit_all()
        t0 = time.perf_counter()
        eng._admit()                        # batched prefill of all slots
        jax.block_until_ready(eng.next_embeds)
        t_admit = time.perf_counter() - t0
        eng.run()
        runs.append({"dt": time.perf_counter() - t0, "admit": t_admit,
                     "produced": eng.stats.tokens_generated - tokens0,
                     "steps": eng.stats.steps - steps0,
                     "wasted": eng.stats.tokens_wasted - waste0,
                     # per-rep latency population (ADVICE r4: the median
                     # rep's latency must describe the same requests as
                     # its throughput, not all reps + warmup pooled)
                     "latency": eng.latency_metrics(skip=done0)})
    med = sorted(runs, key=lambda r: r["dt"])[len(runs) // 2]
    produced, dt = med["produced"], med["dt"]
    tps = produced / dt
    out = {"engine_tokens": produced, "engine_time_s": dt,
           "engine_admit_s": med["admit"],
           "engine_times_s": [round(r["dt"], 4) for r in runs],
           "reps": n_rep,
           "n_slots": n_slots,
           "latency_mode": latency_mode,
           "dispatches": med["steps"],
           "tokens_wasted": med["wasted"],
           "latency": med["latency"],
           "latency_all_reps": eng.latency_metrics()}
    try:
        # engine-mode MFU / HBM utilization at the serving operating point
        # (n_slots rows): whole-run tok/s x analytic per-token cost
        from block_transformer_tpu.utils import roofline
        m = roofline.decode_stage_model(cfg, n_slots, prefill, decode,
                                        kv_cache, quantize)
        out["mfu_engine"] = tps * m["flops_per_token"] / roofline.PEAK_BF16_FLOPS
        if m.get("bytes_per_token"):
            out["hbm_util_engine"] = (
                tps * m["bytes_per_token"]) / roofline.PEAK_HBM_GBPS
    except Exception:
        pass
    return tps, out


def main():
    ap = argparse.ArgumentParser()
    # defaults = the BASELINE.json north-star regime: 1.2B, prefill 2048 /
    # decode 128, each model at its max feasible batch (static HBM search)
    ap.add_argument("--model", default="block_main_b4_1.2b")
    ap.add_argument("--vanilla", default="vanilla_410")
    ap.add_argument("--batch", default="auto",
                    help="int or 'auto' (per-model static-HBM batch search)")
    ap.add_argument("--vanilla_batch", default=None,
                    help="vanilla baseline batch (defaults to --batch)")
    ap.add_argument("--vanilla_quantize",
                    choices=["none", "int8", "int4"], default="int8",
                    help="vanilla weight quantization — the precision-"
                    "matched baseline (default int8 = same width as the "
                    "block side; 'none' gives the legacy bf16 baseline)")
    ap.add_argument("--vanilla_kv", choices=["bf16", "int8", "int4"],
                    default="int8",
                    help="vanilla token-level KV cache dtype (default int8 "
                    "to match the block side's quantized-cache treatment; "
                    "its cache is its HBM bound, so this raises its "
                    "feasible batch)")
    ap.add_argument("--prefill", type=int, default=2048)
    ap.add_argument("--decode", type=int, default=128)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--quantize",
                    choices=["int8", "int4", "mixed48", "none"],
                    default="int8",
                    help="weight quantization (BASELINE.json operating "
                    "point: int8 weights + int8 KV)")
    ap.add_argument("--kv", choices=["bf16", "int8", "int4"], default="int8",
                    help="global block-level KV cache dtype. Default int8 "
                         "(round-5 re-derivation): repeating the ONE "
                         "decode-path gate across 3 disjoint prompt seeds "
                         "on the 85M checkpoint shows every int4-KV "
                         "pairing is prompt-set-noise-dominated (headline "
                         "combo 0.48/0.13/1.62%% across seeds, pooled mean "
                         "0.74%% > the 0.5%% bar; "
                         "results/decode_gate_85m_seeds.json) while the "
                         "int8-KV rows pass with margin. int4 is the "
                         "measured max-throughput opt-in (14,384 tok/s at "
                         "b384 vs the int8 default's b256 row): gate your "
                         "own checkpoint with scripts/decode_gate.py "
                         "(QUALITY.md)")
    ap.add_argument("--engine_kv", default=None,
                    help="engine-mode cache override: bf16/int8/int4/paged "
                         "(default: --kv; int4 falls back to int8 here - "
                         "engine state crosses jit boundaries every window "
                         "and int4 transfer trips the axon platform bug)")
    ap.add_argument("--attn_impl", choices=["xla", "pallas"], default=None,
                    help="attention backend override (pallas = flash "
                    "kernel where shapes allow, e.g. prefill chunks)")
    ap.add_argument("--engine", action="store_true",
                    help="also benchmark the continuous-batching engine")
    ap.add_argument("--engine_slots", type=int, default=16)
    ap.add_argument("--engine_only", action="store_true",
                    help="skip the static block/vanilla benches (engine "
                    "slot-scaling rows reuse the committed static numbers)")
    ap.add_argument("--detail_out", default="BENCH_DETAIL.json")
    args = ap.parse_args()

    import sys
    import gc

    _enable_compile_cache()
    block_tps, block_batch, block_detail = 0.0, 0, {}
    if not args.engine_only:
        block_tps, block_batch, block_detail = bench_block(
            args.model, args.batch, args.prefill, args.decode, args.dtype,
            args.quantize, args.kv, args.attn_impl)
        print(f"[bench] block: {block_tps:.1f} tok/s at b{block_batch} "
              f"(std {block_detail['std_s']:.3f}s over {block_detail['reps']}; "
              f"{block_detail['ms_per_token']:.4f} ms/tok; decomposition: "
              f"block {block_detail.get('block_decoder_ms_per_block_step', 0):.2f} "
              f"/ token {block_detail.get('token_decoder_ms_per_block_step', 0):.2f}"
              f" ms per block step)", file=sys.stderr, flush=True)
        gc.collect()

    engine_detail = {}
    if args.engine:
        engine_kv = args.engine_kv or (
            "int8" if args.kv == "int4" else args.kv)
        engine_tps, engine_detail = bench_engine(
            args.model, args.engine_slots, args.prefill, args.decode,
            args.dtype, args.quantize, engine_kv)
        engine_detail["engine_tok_per_s"] = engine_tps
        print(f"[bench] engine: {engine_tps:.1f} tok/s at {args.engine_slots} "
              f"slots", file=sys.stderr, flush=True)
        gc.collect()
        # latency-mode row: TTFT-bounded window ramp (VERDICT r2 #2 —
        # target TTFT p50 within ~2 sync windows at <=10% throughput loss)
        lat_tps, lat_detail = bench_engine(
            args.model, args.engine_slots, args.prefill, args.decode,
            args.dtype, args.quantize, engine_kv, latency_mode=True)
        lat_detail["engine_tok_per_s"] = lat_tps
        lat_detail["throughput_vs_max_mode"] = (
            lat_tps / engine_tps if engine_tps else None)
        engine_detail["latency_mode_row"] = lat_detail
        print(f"[bench] engine latency-mode: {lat_tps:.1f} tok/s "
              f"({100 * lat_tps / max(engine_tps, 1e-9):.0f}% of max mode; "
              f"ttft_p50={lat_detail['latency'].get('ttft_s_p50', -1):.2f}s)",
              file=sys.stderr, flush=True)
        gc.collect()

    if args.engine_only:
        with open(args.detail_out, "w") as f:
            json.dump({"engine": engine_detail, "engine_only": True,
                       "engine_slots": args.engine_slots,
                       "regime": {"prefill": args.prefill,
                                  "decode": args.decode,
                                  "quantize": args.quantize,
                                  "kv": args.kv}}, f, indent=2)
        print(json.dumps({
            "metric": f"engine_tokens_per_sec[{args.model} "
                      f"slots{args.engine_slots} p{args.prefill}/"
                      f"d{args.decode}]",
            "value": round(engine_detail.get("engine_tok_per_s", 0.0), 1),
            "unit": "tok/s", "vs_baseline": None}))
        return

    vanilla_tps, vanilla_batch, van_detail = bench_vanilla(
        args.vanilla, args.vanilla_batch or args.batch, args.prefill,
        args.decode, args.dtype, args.vanilla_quantize, args.vanilla_kv)
    ratio = block_tps / vanilla_tps if vanilla_tps > 0 else 0.0
    with open(args.detail_out, "w") as f:
        json.dump({"block": block_detail, "vanilla": van_detail,
                   "engine": engine_detail,
                   "block_tok_per_s": block_tps,
                   "vanilla_tok_per_s": vanilla_tps,
                   "block_batch": block_batch,
                   "vanilla_batch": vanilla_batch,
                   "regime": {"prefill": args.prefill, "decode": args.decode,
                              "quantize": args.quantize, "kv": args.kv}},
                  f, indent=2)
    vq = ("" if args.vanilla_quantize == "none"
          else f"-{args.vanilla_quantize}")
    vkv = {"int8": "-kv8", "int4": "-kv4"}.get(args.vanilla_kv, "")
    print(json.dumps({
        "metric": f"decode_tokens_per_sec[{args.model}"
                  f"{'-' + args.quantize if args.quantize and args.quantize != 'none' else ''}"
                  f"{ {'int8': '-kv8', 'int4': '-kv4'}.get(args.kv, '') }"
                  f" b{block_batch} "
                  f"p{args.prefill}/d{args.decode} vs {args.vanilla}{vq}{vkv} "
                  f"b{vanilla_batch}]",
        "value": round(block_tps, 1),
        "unit": "tok/s",
        "vs_baseline": round(ratio, 3),
    }))


if __name__ == "__main__":
    main()
