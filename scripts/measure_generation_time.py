"""Generation-time benchmark — analogue of the reference's
measure_generation_time.py (reference §2.5): configurable prefill/decode
regimes, warmup + repeats with mean/std, ms/sample, ms/token, device memory
stats, incremental CSV, optional JAX profiler traces, and automatic
batch-size selection.

TPU-native differences: batch search uses *static HBM accounting* (weights +
KV caches + activation margin against the device's bytes_limit) instead of
the reference's try/except-OOM linear VRAM model
(measure_generation_time.py:252-372), and timing uses
``block_until_ready``-bracketed perf counters instead of CUDA events.

Usage:
  python scripts/measure_generation_time.py --model block_main_b4_5 \
      --prefill 128 --decode 2048 [--batch auto] [--profile]
"""

import argparse
import csv
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _maybe_force_cpu():
    import os, sys
    if os.environ.get("BT_CPU") == "1" or "--cpu" in sys.argv:
        if "--cpu" in sys.argv:
            sys.argv.remove("--cpu")
        import jax
        jax.config.update("jax_platforms", "cpu")


_maybe_force_cpu()


from block_transformer_tpu.utils.hbm import (auto_batch, block_model_bytes,
                                             hbm_bytes_limit,
                                             vanilla_model_bytes)


def measure_block(model_name, batch, prefill, decode, dtype_str, n_rep,
                  profile_dir=None):
    import jax
    import jax.numpy as jnp
    from block_transformer_tpu.config import get_config
    from block_transformer_tpu.models import block_transformer as bt
    from block_transformer_tpu.inference import generate as gen

    dtype = jnp.bfloat16 if dtype_str == "bfloat16" else jnp.float32
    cfg = get_config(model_name)
    if batch == "auto":
        batch = auto_batch(lambda b: block_model_bytes(cfg, b, prefill, decode))
        print(f"auto batch -> {batch}", file=sys.stderr)
    batch = int(batch)
    params = jax.jit(lambda k: bt.init_block_transformer_params(
        k, cfg, dtype=dtype))(jax.random.PRNGKey(0))
    L = cfg.block_length
    N = prefill // L
    max_blocks = (prefill + decode) // L
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(1, 50254, size=(batch, N, L)), jnp.int32)
    att = jnp.ones((batch, N, L), jnp.int32)
    bam = jnp.ones((batch, N), jnp.int32)

    def run():
        res = gen.generate_blocks(params, cfg, ids, att, bam,
                                  max_blocks=max_blocks, greedy=True)
        jax.block_until_ready(res.tokens)

    run()  # compile+warmup
    times = []
    for i in range(n_rep):
        if profile_dir and i == 0:
            with jax.profiler.trace(profile_dir):
                t0 = time.perf_counter()
                run()
                times.append(time.perf_counter() - t0)
        else:
            t0 = time.perf_counter()
            run()
            times.append(time.perf_counter() - t0)
    return batch, times


def measure_vanilla(name, batch, prefill, decode, dtype_str, n_rep):
    import jax
    import jax.numpy as jnp
    import functools
    from block_transformer_tpu.config import get_vanilla_config
    from block_transformer_tpu.models import vanilla, neox

    dtype = jnp.bfloat16 if dtype_str == "bfloat16" else jnp.float32
    cfg = get_vanilla_config(name)
    if batch == "auto":
        batch = auto_batch(
            lambda b: vanilla_model_bytes(cfg, b, prefill, decode))
        print(f"auto batch (vanilla) -> {batch}", file=sys.stderr)
    batch = int(batch)
    params = jax.jit(lambda k: vanilla.init_vanilla_params(
        k, cfg, dtype=dtype))(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(1, 50254, size=(batch, prefill)), jnp.int32)

    @functools.partial(jax.jit, donate_argnums=(1,))
    def decode_all(params, cache, tok):
        def body(i, carry):
            tok, cache = carry
            logits, cache = vanilla.vanilla_decode_step(params, cfg, tok, cache)
            return jnp.argmax(logits, -1).astype(jnp.int32), cache
        return jax.lax.fori_loop(0, decode, body, (tok, cache))

    prefill_fn = jax.jit(vanilla.vanilla_prefill, static_argnums=(1,))

    def run():
        cache = neox.KVCache.create(cfg, batch, prefill + decode, dtype=dtype)
        logits, cache = prefill_fn(params, cfg, ids, cache)
        tok, cache = decode_all(params, cache,
                                jnp.argmax(logits, -1).astype(jnp.int32))
        jax.block_until_ready(tok)

    run()
    times = []
    for _ in range(n_rep):
        t0 = time.perf_counter()
        run()
        times.append(time.perf_counter() - t0)
    return batch, times


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="block_main_b4_5",
                    help="block_main_* name or vanilla_* name")
    ap.add_argument("--batch", default="auto")
    ap.add_argument("--prefill", type=int, default=1)
    ap.add_argument("--decode", type=int, default=2048)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--n_rep", type=int, default=5)
    ap.add_argument("--profile", action="store_true")
    ap.add_argument("--out", default="results")
    args = ap.parse_args()

    os.makedirs(os.path.join(args.out, args.model), exist_ok=True)
    profile_dir = (os.path.join(args.out, args.model, "trace")
                   if args.profile else None)

    if args.model.startswith("vanilla"):
        batch, times = measure_vanilla(args.model, args.batch, args.prefill,
                                       args.decode, args.dtype, args.n_rep)
    else:
        # prefill must cover >= 1 block
        prefill = max(args.prefill, 4)
        batch, times = measure_block(args.model, args.batch, prefill,
                                     args.decode, args.dtype, args.n_rep,
                                     profile_dir)

    mean_ms = statistics.mean(times) * 1e3
    std_ms = statistics.stdev(times) * 1e3 if len(times) > 1 else 0.0
    row = {
        "model": args.model, "batch": batch, "prefill": args.prefill,
        "decode": args.decode, "dtype": args.dtype,
        "mean_ms": round(mean_ms, 2), "std_ms": round(std_ms, 2),
        "ms_per_sample": round(mean_ms / batch, 4),
        "ms_per_token": round(mean_ms / (batch * args.decode), 5),
        "tokens_per_sec": round(batch * args.decode / (mean_ms / 1e3), 1),
    }
    csv_path = os.path.join(args.out, args.model, "generation_time.csv")
    exists = os.path.isfile(csv_path)
    with open(csv_path, "a", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(row))
        if not exists:
            w.writeheader()
        w.writerow(row)
    print(row)


if __name__ == "__main__":
    main()
