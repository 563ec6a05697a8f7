"""Held-out ppl gate for QAT-finetuned checkpoints (CPU).

Answers the absolute-quality question the per-model decode gate cannot:
after QAT finetuning (scripts/qat_finetune.py) and real RTN
quantization of the adapted weights, where does held-out ppl land
**vs the ORIGINAL checkpoint's fp32 ppl** (the BASELINE.json <=0.5%
clause baseline)? Also reports the QAT master weights' own fp32 ppl —
finetuning with fake-quant in the loss should not degrade the
full-precision model it started from.

  python scripts/qat_ppl_gate.py --qat_dir results/qat_mixed48 \
      --out results/qat_ppl_mixed48.json
"""

import argparse
import importlib.util
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--qat_dir", default="results/qat_mixed48",
                    help="qat_finetune --out_dir (contains QAT.json + "
                    "<model>/checkpoint-*)")
    ap.add_argument("--baseline_dir",
                    default="results/quality10k/block_main_b4_5")
    ap.add_argument("--corpus", default="/root/corpus/pybytes")
    ap.add_argument("--model", default="block_main_b4_5")
    ap.add_argument("--max_length", type=int, default=1024)
    ap.add_argument("--eval_samples", type=int, default=256)
    ap.add_argument("--eval_batch", type=int, default=16)
    ap.add_argument("--out", default="")
    args = ap.parse_args()
    os.environ.setdefault("BT_CPU", "1")

    spec = importlib.util.spec_from_file_location(
        "quality_run", os.path.join(os.path.dirname(
            os.path.abspath(__file__)), "quality_run.py"))
    qr = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(qr)
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from decode_gate import load_params

    import jax
    from block_transformer_tpu.config import get_config
    from block_transformer_tpu.ops import quant

    meta = json.load(open(os.path.join(args.qat_dir, "QAT.json")))
    cfg = get_config(args.model, vocab_size=qr.VOCAB,
                     max_length=args.max_length)
    ds_hold = qr.make_dataset(qr.load_corpus(args.corpus + "_holdout"),
                              args.max_length, cfg.block_length, seed=7)

    def ppl(tree):
        return qr.heldout_ppl_block(tree, cfg, ds_hold, args.eval_samples,
                                    args.eval_batch)

    base_params, base_step = load_params(args.baseline_dir, cfg, 6e-4, 10000)
    qat_params, qat_step = load_params(
        os.path.join(args.qat_dir, args.model), cfg, meta["lr"],
        meta["steps"])

    fp_base = ppl(base_params)
    print(f"[qat_ppl] baseline fp32 (step {base_step}): {fp_base:.4f}")
    fp_qat = ppl(qat_params)
    print(f"[qat_ppl] QAT master fp32 (+{qat_step} steps): {fp_qat:.4f} "
          f"({100*(fp_qat-fp_base)/fp_base:+.3f}% vs baseline)")
    q_qat = ppl(quant.quantize_block_transformer(
        qat_params, **meta["recipe_kwargs"]))
    q_base = ppl(quant.quantize_block_transformer(
        base_params, **meta["recipe_kwargs"]))

    d_qat = 100 * (q_qat - fp_base) / fp_base
    d_base = 100 * (q_base - fp_base) / fp_base
    report = {
        "recipe": meta["recipe"], "qat_steps": qat_step,
        "baseline_fp32_ppl": fp_base,
        "qat_master_fp32_ppl": fp_qat,
        "qat_master_delta_pct": 100 * (fp_qat - fp_base) / fp_base,
        "quantized_baseline_ppl": q_base,
        "quantized_baseline_delta_pct": d_base,
        "quantized_qat_ppl": q_qat,
        "quantized_qat_delta_pct": d_qat,
        "gate": "PASS" if abs(d_qat) <= 0.5 else "FAIL",
    }
    print(f"[qat_ppl] RTN({meta['recipe']}) of baseline: {q_base:.4f} "
          f"({d_base:+.3f}%)")
    print(f"[qat_ppl] RTN({meta['recipe']}) of QAT:      {q_qat:.4f} "
          f"({d_qat:+.3f}%) -> {report['gate']}")
    out = args.out or os.path.join("results",
                                   f"qat_ppl_{meta['recipe']}.json")
    os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
    with open(out, "w") as f:
        json.dump(report, f, indent=1)
    print(f"[qat_ppl] -> {out}")


if __name__ == "__main__":
    main()
