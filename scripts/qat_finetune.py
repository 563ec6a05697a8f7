"""Quantization-aware finetuning: make INT4 weights pass the decode gate.

Round-4 state (QUALITY.md): GPTQ gets INT4 weight configs through the
teacher-forced ppl gate (<=0.5%) but NO INT4-weight config passes the
stricter uniform *decode* gate on the 10k checkpoint — generation
compounds per-step error that teacher-forcing resets. The QUALITY.md
analysis concluded further progress "needs different arithmetic, not
better rounding". This is that arithmetic: finetune the checkpoint with
the deployment quantization grid IN the loss (straight-through
fake-quant, ops/quant.fake_quant_block_transformer — bit-identical grid
to quantize_block_transformer) so the weights migrate onto
representable points. Afterwards, plain RTN quantization of the adapted
weights IS the optimized model.

Recipes mirror the serving configs:
  mixed48   block INT8 + token INT4 g128 + head INT8 (the Pallas-native
            serving recipe; what --quantize mixed48 deploys)
  int4g128  whole-model INT4 at g128
  int8      whole-model INT8 (control; should stay at ~0 delta)

Run (TPU, ~4 min for 1000 steps at b64):
  python scripts/qat_finetune.py --recipe mixed48 --steps 1000 \
      --out_dir results/qat_mixed48
Then gate it:
  python scripts/decode_gate.py --model_dir results/qat_mixed48/block_main_b4_5 \
      --only mixed48_int8kv --merge --out results/decode_gate_qat.json
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

RECIPES = {
    "mixed48": dict(bits=8, token_decoder_bits=4, lm_head_bits=8,
                    group_size=128),
    "int4g128": dict(bits=4, group_size=128),
    "int8": dict(bits=8),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="block_main_b4_5")
    ap.add_argument("--model_dir",
                    default="results/quality10k/block_main_b4_5")
    ap.add_argument("--recipe", choices=sorted(RECIPES), default="mixed48")
    ap.add_argument("--corpus", default="/root/corpus/pybytes")
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--max_length", type=int, default=1024)
    ap.add_argument("--steps", type=int, default=1000)
    ap.add_argument("--lr", type=float, default=1e-4,
                    help="finetune peak lr (the 10k run ended a 6e-4 "
                    "cosine; QAT only needs to nudge weights onto the "
                    "grid, not relearn)")
    ap.add_argument("--vocab", type=int, default=512)
    ap.add_argument("--distill", action="store_true",
                    help="QAT-KD: train the fake-quant student against the "
                    "SOURCE checkpoint's fp32 logits (KL) instead of the "
                    "data CE — the direct analogue of the decode gate's "
                    "'does the fp32 model find the quantized output "
                    "likely', and immune to the corpus memorization a "
                    "data-CE finetune drifts into")
    ap.add_argument("--out_dir", default="")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    out_dir = args.out_dir or f"results/qat_{args.recipe}"

    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import functools
    import jax.numpy as jnp
    from block_transformer_tpu.config import get_config
    from block_transformer_tpu.ops import quant
    from block_transformer_tpu.train import optimizer as opt_mod
    from block_transformer_tpu.train import train_step as ts
    from block_transformer_tpu.utils import checkpoint as ckpt
    from block_transformer_tpu.data.packing import make_train_batch

    cfg = get_config(args.model, vocab_size=args.vocab,
                     max_length=args.max_length)
    print(f"[qat] devices: {jax.devices()}")

    # restore the source checkpoint's params into a fresh finetune state
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from decode_gate import load_params
    params, src_step = load_params(args.model_dir, cfg, 6e-4, 10000)
    print(f"[qat] source checkpoint step {src_step} ({args.model_dir})")

    tx, _ = opt_mod.make_optimizer(peak_lr=args.lr,
                                   warmup_steps=max(20, args.steps // 20),
                                   total_steps=args.steps, weight_decay=0.1,
                                   b1=0.9, b2=0.95)
    params = jax.tree.map(jnp.asarray, params)
    state = ts.TrainState(params=params, opt_state=jax.jit(tx.init)(params),
                          step=jnp.zeros((), jnp.int32))

    transform = functools.partial(quant.fake_quant_block_transformer,
                                  **RECIPES[args.recipe])
    if args.distill:
        from block_transformer_tpu.models import block_transformer as bt
        # frozen source weights: an independent COPY (state.params is
        # donated every step, which would delete aliased teacher buffers)
        # passed as a jit ARGUMENT — a closure constant bakes the whole
        # teacher into the HLO, which at 85M exceeded the remote compile
        # service's request size (HTTP 413)
        teacher = jax.tree.map(jnp.copy, params)

        def kd_loss(p, tch, batch):
            ids, am, bam = (batch["input_ids"], batch["attention_mask"],
                            batch["block_attention_mask"])
            ls = bt.block_transformer_forward(
                transform(p), cfg, ids, am, bam, remat=True).logits
            lt = jax.lax.stop_gradient(bt.block_transformer_forward(
                tch, cfg, ids, am, bam, remat=True).logits)
            kl = jnp.sum(jax.nn.softmax(lt, -1)
                         * (jax.nn.log_softmax(lt, -1)
                            - jax.nn.log_softmax(ls, -1)), -1)
            # logits cover blocks 1..N-1; labels carry -100 on padding
            w = (batch["labels"][:, 1:, :] != -100).astype(jnp.float32)
            loss = jnp.sum(kl * w) / jnp.maximum(jnp.sum(w), 1.0)
            return loss, {"loss": loss}

        def step_fn_py(state, tch, batch):
            (loss, metrics), grads = jax.value_and_grad(
                kd_loss, has_aux=True)(state.params, tch, batch)
            updates, opt_state = tx.update(grads, state.opt_state,
                                           state.params)
            new_p = jax.tree.map(lambda a, u: a + u.astype(a.dtype),
                                 state.params, updates)
            return ts.TrainState(new_p, opt_state, state.step + 1), metrics

        _kd_step = jax.jit(step_fn_py, donate_argnums=(0,))
        step_fn = lambda state, batch: _kd_step(state, teacher, batch)
    else:
        step_fn = jax.jit(ts.make_train_step(cfg, tx, remat=True,
                                             param_transform=transform),
                          donate_argnums=(0,))

    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "quality_run", os.path.join(os.path.dirname(
            os.path.abspath(__file__)), "quality_run.py"))
    qr = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(qr)
    L = cfg.block_length
    ds = qr.make_dataset(qr.load_corpus(args.corpus), args.max_length, L,
                         seed=11)

    def batch_at(i):
        idxs = (np.arange(args.batch) + i * args.batch) % len(ds)
        return {k: jnp.asarray(v)
                for k, v in make_train_batch(ds, idxs, L).items()}

    t0 = time.time()
    losses = []
    for i in range(args.steps):
        state, metrics = step_fn(state, batch_at(i))
        if i == 0:
            jax.block_until_ready(state.params)
            print(f"[qat] compile+first step {time.time()-t0:.0f}s")
        if (i + 1) % 100 == 0 or i == 0:
            losses.append(float(metrics["loss"]))
            print(f"[qat] step {i+1}: fake-quant loss {losses[-1]:.4f}",
                  flush=True)
    jax.block_until_ready(state.params)
    dt = time.time() - t0

    model_dir = os.path.join(out_dir, args.model)
    path = ckpt.save_checkpoint(model_dir, args.steps, state)
    meta = {"recipe": args.recipe, "recipe_kwargs": RECIPES[args.recipe],
            "distill": bool(args.distill),
            "source": args.model_dir, "source_step": src_step,
            "steps": args.steps, "lr": args.lr, "batch": args.batch,
            "train_s": dt, "losses_per_100": losses}
    with open(os.path.join(out_dir, "QAT.json"), "w") as f:
        json.dump(meta, f, indent=1)
    print(f"[qat] saved {path} ({dt:.0f}s); deploy with "
          f"quantize_block_transformer(params, **{RECIPES[args.recipe]})")


if __name__ == "__main__":
    main()
