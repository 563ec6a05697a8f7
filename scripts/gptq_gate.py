"""INT4 quality gate with GPTQ calibration (VERDICT r3 item 3).

Round-to-nearest INT4 fails the <=0.5% ppl gate on the sharp 10k-step
TPU-trained checkpoint (QUALITY.md round 3: g128 +2.03%, g32+int8-head
+1.16%, mixed48 +0.88%). This script re-derives the whole INT4 ladder
with GPTQ error-compensated rounding (ops/gptq.py) calibrated on a few
hundred training-corpus samples, evaluates held-out teacher-forced ppl
for each configuration, and writes the gate table.

The packed format is identical to RTN, so a passing config here serves
through the existing Pallas int4 kernel / engine / bench unchanged.

Usage (CPU eval of a TPU-trained checkpoint, as in quality_run):
  python scripts/gptq_gate.py --cpu \
      --model_dir results/quality10k/block_main_b4_5 \
      --corpus /root/corpus/pybytes --out results/gptq_gate.json
"""

import argparse
import importlib.util
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _load_quality_run():
    spec = importlib.util.spec_from_file_location(
        "quality_run",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "quality_run.py"))
    mod = importlib.util.module_from_spec(spec)
    # quality_run resolves --cpu / BT_CPU at import time
    spec.loader.exec_module(mod)
    return mod


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model_dir", default="results/quality10k/block_main_b4_5")
    ap.add_argument("--corpus", default="/root/corpus/pybytes")
    ap.add_argument("--out", default="results/gptq_gate.json")
    ap.add_argument("--max_length", type=int, default=1024)
    ap.add_argument("--calib_samples", type=int, default=64)
    ap.add_argument("--calib_batch", type=int, default=8)
    ap.add_argument("--eval_samples", type=int, default=256)
    ap.add_argument("--eval_batch", type=int, default=16)
    ap.add_argument("--lr", type=float, default=6e-4)
    ap.add_argument("--steps", type=int, default=10000,
                    help="train steps of the checkpointed run (optimizer "
                    "template shape only)")
    ap.add_argument("--damp", type=float, default=0.01)
    ap.add_argument("--act_order", action="store_true",
                    help="process rows by descending Hessian diagonal "
                    "(static group scales; packed layout unchanged)")
    ap.add_argument("--skip_rtn", action="store_true",
                    help="skip the RTN reference rows (already measured)")
    ap.add_argument("--configs", default=None,
                    help="comma-separated subset of GPTQ config names to run")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (eval of TPU-trained "
                    "checkpoints, as in quality_run)")
    args = ap.parse_args()
    if args.cpu:
        os.environ["BT_CPU"] = "1"

    qr = _load_quality_run()

    import jax
    import jax.numpy as jnp
    from block_transformer_tpu.config import get_config
    from block_transformer_tpu.data.packing import make_train_batch
    from block_transformer_tpu.ops import gptq, quant
    from block_transformer_tpu.train import optimizer as opt_mod
    from block_transformer_tpu.train import train_step as ts
    from block_transformer_tpu.utils import checkpoint as ckpt

    print(f"[gptq_gate] devices: {jax.devices()}")
    cfg = get_config("block_main_b4_5", vocab_size=qr.VOCAB,
                     max_length=args.max_length)

    # ---- load the checkpoint (same TrainState restore as quality_run) ----
    from block_transformer_tpu.models.block_transformer import (
        init_block_transformer_params)
    step = ckpt.find_latest_checkpoint(args.model_dir)
    assert step, f"no checkpoint in {args.model_dir}"
    tmpl = jax.eval_shape(
        lambda: init_block_transformer_params(jax.random.PRNGKey(0), cfg))
    tx, _ = opt_mod.make_optimizer(
        peak_lr=args.lr, warmup_steps=max(100, args.steps // 20),
        total_steps=args.steps, weight_decay=0.1, b1=0.9, b2=0.95)
    state_tmpl = ts.TrainState(params=tmpl,
                               opt_state=jax.eval_shape(tx.init, tmpl),
                               step=jax.ShapeDtypeStruct((), jnp.int32))
    params = jax.tree.map(
        jnp.asarray, ckpt.restore_checkpoint(args.model_dir, step,
                                             state_tmpl).params)
    print(f"[gptq_gate] loaded checkpoint step {step}")

    # ---- calibration batches from the TRAIN corpus ----
    train_ds = qr.make_dataset(qr.load_corpus(args.corpus), args.max_length,
                               cfg.block_length, seed=3)
    calib = []
    for s in range(0, args.calib_samples, args.calib_batch):
        idxs = (np.arange(s, s + args.calib_batch) * 17) % len(train_ds)
        b = make_train_batch(train_ds, idxs, cfg.block_length)
        calib.append((b["input_ids"], b["attention_mask"],
                      b["block_attention_mask"]))
    print(f"[gptq_gate] {len(calib)} calibration batches "
          f"x {args.calib_batch} samples")

    holdout = qr.load_corpus(args.corpus + "_holdout")
    ds_hold = qr.make_dataset(holdout, args.max_length, cfg.block_length,
                              seed=7)

    def ppl(tree):
        return qr.heldout_ppl_block(tree, cfg, ds_hold, args.eval_samples,
                                    args.eval_batch)

    t0 = time.time()
    results = {"checkpoint_step": step, "model_dir": args.model_dir,
               "calib_samples": args.calib_samples, "damp": args.damp,
               "configs": {}}
    fp = ppl(params)
    results["fp32_ppl"] = fp
    print(f"[gptq_gate] fp32 ppl {fp:.4f} ({time.time()-t0:.0f}s)")

    def add(name, tree):
        p = ppl(tree)
        d = 100 * (p - fp) / fp
        results["configs"][name] = {
            "ppl": p, "delta_pct": d, "gate": "PASS" if abs(d) <= 0.5
            else "FAIL"}
        print(f"[gptq_gate] {name}: ppl {p:.4f} ({d:+.3f}%) "
              f"{results['configs'][name]['gate']} ({time.time()-t0:.0f}s)")

    if not args.skip_rtn:
        # RTN reference points (re-measured on the same eval slice)
        add("rtn_int4_g128",
            quant.quantize_block_transformer(params, bits=4, group_size=128))
        add("rtn_int4_g32_head8",
            quant.quantize_block_transformer(params, bits=4, lm_head_bits=8,
                                             group_size=32))

    # GPTQ ladder — g128 is the Pallas kernel's native tile
    only = set(args.configs.split(",")) if args.configs else None

    def g(name, **kw):
        if only is not None and name not in only:
            return
        t1 = time.time()
        tree = gptq.gptq_quantize_block_transformer(
            params, cfg, calib, damp=args.damp, act_order=args.act_order,
            **kw)
        print(f"[gptq_gate] {name} quantized in {time.time()-t1:.0f}s")
        add(name, tree)

    g("gptq_int4_g128", bits=4, group_size=128)
    g("gptq_int4_g128_head8", bits=4, group_size=128, lm_head_bits=8)
    g("gptq_int4_g32_head8", bits=4, group_size=32, lm_head_bits=8)
    g("gptq_mixed48", bits=8, token_decoder_bits=4, lm_head_bits=8,
      group_size=128)
    g("gptq_int8", bits=8)

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)
    print(f"[gptq_gate] done -> {args.out}")


if __name__ == "__main__":
    main()
