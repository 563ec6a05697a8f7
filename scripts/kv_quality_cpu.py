"""CPU-only KV-cache quality check on the trained 5M quality model.

Runs only quality_run's decode-agreement phase (greedy token match of
int8/int4 KV caches and mixed48+int4KV weights vs the bf16-KV fp
decode) — small enough for CPU while the TPU tunnel is down.

Usage: python scripts/kv_quality_cpu.py [--out results/quality]
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_platforms", "cpu")

import quality_run as qr  # noqa: E402  (scripts/ on path via __main__ dir)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="results/quality")
    ap.add_argument("--corpus", default="/root/corpus/pybytes")
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--lr", type=float, default=6e-4)
    ap.add_argument("--max_length", type=int, default=1024)
    ap.add_argument("--int4_group", type=int, default=128)
    args = ap.parse_args()

    from block_transformer_tpu.config import get_config
    from block_transformer_tpu.ops import quant
    from block_transformer_tpu.train import train_step as ts
    from block_transformer_tpu.train import optimizer as opt_mod
    from block_transformer_tpu.utils import checkpoint as ckpt
    import jax.numpy as jnp

    cfg = get_config("block_main_b4_5", vocab_size=qr.VOCAB,
                     max_length=args.max_length)
    out_dir = os.path.join(args.out, "block_main_b4_5")
    step = ckpt.find_latest_checkpoint(out_dir)
    assert step, f"no checkpoint in {out_dir}"
    from block_transformer_tpu.models.block_transformer import (
        init_block_transformer_params)
    tmpl = jax.eval_shape(lambda: init_block_transformer_params(
        jax.random.PRNGKey(0), cfg))
    tx, _ = opt_mod.make_optimizer(
        peak_lr=args.lr, warmup_steps=max(100, args.steps // 20),
        total_steps=args.steps, weight_decay=0.1, b1=0.9, b2=0.95)
    state_tmpl = ts.TrainState(
        params=tmpl, opt_state=jax.eval_shape(tx.init, tmpl),
        step=jax.ShapeDtypeStruct((), jnp.int32))
    params = ckpt.restore_checkpoint(out_dir, step, state_tmpl).params
    print(f"[kvq] loaded block@{step}")

    q8 = quant.quantize_block_transformer(params, bits=8)
    qmix = quant.quantize_block_transformer(params, bits=8,
                                            token_decoder_bits=4,
                                            lm_head_bits=8,
                                            group_size=args.int4_group)
    holdout = qr.load_corpus(args.corpus + "_holdout")
    d = qr.decode_agreement(params, q8, cfg, holdout, params_mixed=qmix)
    print(json.dumps(d, indent=1))
    with open(os.path.join(args.out, "kv_agreement_cpu.json"), "w") as f:
        json.dump(d, f, indent=1)


if __name__ == "__main__":
    main()
