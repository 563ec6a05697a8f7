"""Decompose the paged engine's admission fixed cost (VERDICT r4 item 8).

RESULTS.md round 4 bounded the paged-vs-contiguous residual as page-
granular read streaming "plus an unexplained 0.16 s admit-side fixed
cost" — the one guess left in the paged diagnosis chain. This probe
measures the admit path's parts directly on chip, the same way the
writes-disabled probe pinned the decode-write scatter:

  1. contiguous engine admit (baseline): host prep + batched prefill
  2. paged admit, full: + page allocation + page-copy placement
  3. paged admit with BT_PAGED_PROBE_NOCOPY=1: placement kernel excluded
     (trace-time env; pool contents wrong — timing probe only)

  paged_full − paged_nocopy       = page-copy placement kernel cost
  paged_nocopy − contiguous       = page-table alloc + mini-cache resid
  host_prep (measured separately) = preprocess/bucketing before dispatch

Each timing is a fresh engine (fresh jit) warmed once, then N repeat
admits of the same prompt set with block_until_ready brackets; median.

Also fits the per-dispatch window overhead a + b*blocks for paged vs
contiguous decode (windows of 1/2/4/8 blocks) — the latency-mode cost
asymmetry (paged −33% vs contiguous ~0%) is a per-dispatch fixed-cost
story if a_paged >> a_contig.

  python scripts/paged_admit_probe.py --out results/paged_admit_probe.json
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build_engine(kv, n_slots, prefill, decode, params, cfg, sync_blocks=8):
    import jax.numpy as jnp
    from block_transformer_tpu.inference.engine import ContinuousBatchingEngine
    L = cfg.block_length
    max_blocks = (prefill + decode) // L + 2
    ekw = {}
    if kv.startswith("paged"):
        n_emb = cfg.n_embedding_tokens
        cap = max_blocks * n_emb
        cap = -(-cap // 128) * 128 if cap >= 128 else cap
        ps = min(256, cap)
        n_virt = (-(-cap // ps) * ps) // ps
        ekw["pool_pages"] = n_slots * n_virt + 1
    return ContinuousBatchingEngine(
        params, cfg, n_slots=n_slots, max_blocks=max_blocks, kv_cache=kv,
        bucket_blocks=prefill // L, sync_blocks=sync_blocks, **ekw)


def time_admit(eng, prompts, decode, reps):
    """Median admit wall time + host-prep share over ``reps`` rounds.

    Each round submits the same prompts into a drained engine, times
    _admit end-to-end (block_until_ready on the prefill outputs), then
    runs the engine dry so slots free for the next round.
    """
    import jax
    host_t, tot_t = [], []
    orig = eng._prefill
    dev_t = []

    def timed_prefill(*a, **k):
        t0 = time.perf_counter()
        out = orig(*a, **k)
        jax.block_until_ready(out)
        dev_t.append(time.perf_counter() - t0)
        return out

    eng._prefill = timed_prefill
    for r in range(reps + 1):               # +1 warmup (compiles)
        for p in prompts:
            eng.submit(p, decode)
        dev_t.clear()
        t0 = time.perf_counter()
        eng._admit()
        jax.block_until_ready(eng.next_embeds)
        dt = time.perf_counter() - t0
        if r > 0:
            tot_t.append(dt)
            host_t.append(dt - sum(dev_t))
        eng.run()                            # drain so slots free
    eng._prefill = orig
    return {"admit_s_median": float(np.median(tot_t)),
            "admit_s_all": [round(t, 4) for t in tot_t],
            "host_prep_s_median": float(np.median(host_t))}


def window_overhead(eng, prompts, windows=(1, 2, 4, 8)):
    """Per-dispatch decode cost: time one decode window of w blocks for
    each w; fit t = a + b*w. Uses the engine's private window dispatch.
    Budgets are sized so every probed window decodes live slots (the
    decode loop early-exits once all slots die)."""
    import jax
    L = eng.cfg.block_length
    n_prompt_blocks = -(-len(prompts[0]) // L) + 1     # ceil + boundary pad
    budget_blocks = eng.max_blocks - n_prompt_blocks - 2
    need = (len(windows) + 1) * 4 * max(windows)
    assert budget_blocks > need, (budget_blocks, need)
    for p in prompts:
        eng.submit(p, budget_blocks * L)
    eng._admit()
    jax.block_until_ready(eng.next_embeds)
    rows = []
    for w in windows:
        # warmup (compile; window_len is traced so one compile covers all)
        ts = []
        for r in range(4):
            t0 = time.perf_counter()
            eng._dispatch(window_len=w)
            jax.block_until_ready(eng.next_embeds)
            if r:
                ts.append(time.perf_counter() - t0)
        rows.append((w, float(np.median(ts))))
    ws = np.array([r[0] for r in rows], np.float64)
    ts = np.array([r[1] for r in rows], np.float64)
    b, a = np.polyfit(ws, ts, 1)
    return {"windows": rows, "fixed_per_dispatch_s": float(a),
            "per_block_s": float(b)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="block_main_b4_1.2b")
    ap.add_argument("--slots", type=int, default=16)
    ap.add_argument("--prefill", type=int, default=2048)
    ap.add_argument("--decode", type=int, default=64)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--quantize", default="int8")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--out", default="results/paged_admit_probe.json")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from block_transformer_tpu.config import get_config
    from block_transformer_tpu.models import block_transformer as bt
    from block_transformer_tpu.ops import quant

    cfg = get_config(args.model)
    params = jax.jit(lambda k: bt.init_block_transformer_params(
        k, cfg, dtype=jnp.bfloat16))(jax.random.PRNGKey(0))
    if args.quantize != "none":
        params = jax.jit(lambda p: quant.quantize_block_transformer(
            p, bits=8))(params)
    rng = np.random.default_rng(0)
    prompts = [rng.integers(1, 50254, size=args.prefill)
               for _ in range(args.slots)]

    out = {"model": args.model, "slots": args.slots,
           "prefill": args.prefill, "decode": args.decode}

    for name, kv, env in [("contiguous", "int8", None),
                          ("paged", "paged", None),
                          ("paged_nocopy", "paged",
                           ("BT_PAGED_PROBE_NOCOPY", "1"))]:
        if env:
            os.environ[env[0]] = env[1]
        try:
            eng = build_engine(kv, args.slots, args.prefill, args.decode,
                               params, cfg)
            out[name] = time_admit(eng, prompts, args.decode, args.reps)
            print(f"[probe] {name}: admit {out[name]['admit_s_median']:.3f}s "
                  f"(host {out[name]['host_prep_s_median']:.3f}s)",
                  flush=True)
            if name != "paged_nocopy":
                # window probe needs budget for every probed window: size
                # the pool for 1024 decode tokens (256 blocks)
                eng2 = build_engine(kv, args.slots, args.prefill, 1024,
                                    params, cfg)
                out[name]["window_fit"] = window_overhead(eng2, prompts)
                print(f"[probe] {name}: dispatch fixed "
                      f"{out[name]['window_fit']['fixed_per_dispatch_s']:.4f}s"
                      f" + {out[name]['window_fit']['per_block_s']:.4f}s/blk",
                      flush=True)
            del eng
        finally:
            if env:
                os.environ.pop(env[0], None)
        import gc
        gc.collect()

    out["page_copy_s"] = (out["paged"]["admit_s_median"]
                          - out["paged_nocopy"]["admit_s_median"])
    out["paged_residual_vs_contig_s"] = (
        out["paged_nocopy"]["admit_s_median"]
        - out["contiguous"]["admit_s_median"])
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: v for k, v in out.items()
                      if not isinstance(v, dict)}, indent=1))


if __name__ == "__main__":
    main()
