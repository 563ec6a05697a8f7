"""End-to-end quality pipeline: train -> checkpoint -> eval harness -> quant.

Produces the BASELINE.json quality-gate measurement (fp vs INT8 vs INT4
ppl / accuracy deltas, gate <= 0.5%) on models trained with the real
pipeline. The reference's Pile checkpoints are unreachable offline, so the
corpus is local real text at byte level (scripts/build_byte_corpus.py) —
the numbers measure *quantization degradation through this framework's full
pipeline* (trainer -> orbax checkpoint -> eval adapter -> harness -> quant),
the same role as the reference's zero_shot_eval tracking
(conf/trainer/block_main_b4_5.yaml) + eval_zero_shot_task.py sweeps.

Phases (each resumable; state inferred from outputs on disk):
  1. train block_main_b4_5-shaped model (byte vocab) on the corpus
  2. train vanilla_31-shaped baseline on the same corpus
  3. held-out teacher-forced ppl: block @ {fp32, int8, int4}, vanilla @ fp32
  4. harness tasks (byte-level MC + rolling perplexity) @ {fp32, int8, int4}
  5. greedy-decode agreement: bf16 KV vs INT8 KV vs INT8 weights + INT8 KV
  6. write QUALITY.md + quality.json

Usage:
  python scripts/quality_run.py --corpus /root/corpus/pybytes \
      --steps 3000 --batch 32 --max_length 1024 --out results/quality
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _maybe_force_cpu():
    if os.environ.get("BT_CPU") == "1" or "--cpu" in sys.argv:
        if "--cpu" in sys.argv:
            sys.argv.remove("--cpu")
        import jax
        jax.config.update("jax_platforms", "cpu")


_maybe_force_cpu()


def _enable_compile_cache():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


_enable_compile_cache()

VOCAB = 512          # byte vocab (259 used) rounded to a lane multiple
OFFSET = 3


class ByteTokenizer:
    eos_token_id = 0

    def encode(self, s: str):
        return [min(ord(c), 255) + OFFSET for c in s]


def tokens_to_text(toks) -> str:
    return "".join(chr(max(0, int(t) - OFFSET)) for t in toks if t >= OFFSET)


def load_corpus(prefix):
    from block_transformer_tpu.data.mmap_dataset import MMapIndexedDataset
    from block_transformer_tpu.data.packing import TokenizedCorpus
    mm = MMapIndexedDataset(prefix)
    data, lengths, starts = mm.token_view()
    return TokenizedCorpus(data, lengths, starts)


def make_dataset(corpus, max_length, block_length, seed=42):
    from block_transformer_tpu.data.packing import PackedDataset
    return PackedDataset(corpus, max_length, eos_token=0, pad_token=0,
                        block_length=block_length,
                        random_pad_first_block=True,
                        pad_to_block_boundary=True, seed=seed)


# ---------------------------------------------------------------------------
# Phase 1+2: training
# ---------------------------------------------------------------------------

def train_block(args, cfg):
    from block_transformer_tpu.train.trainer import Trainer, TrainerConfig
    out = os.path.join(args.out, "block_main_b4_5")
    tcfg = TrainerConfig(output_dir=out, learning_rate=args.lr,
                         num_train_steps=args.steps,
                         num_warmup_steps=max(100, args.steps // 20),
                         total_batch_size=args.batch,
                         max_length=args.max_length,
                         save_steps=max(1, args.steps // args.n_checkpoints),
                         logging_steps=25, param_dtype="float32")
    ds = make_dataset(load_corpus(args.corpus), args.max_length,
                      cfg.block_length)
    trainer = Trainer(cfg, tcfg, ds)
    state = trainer.train(resume=True)
    return out, state


def train_vanilla(args, vcfg):
    from block_transformer_tpu.train.trainer import TrainerConfig
    from block_transformer_tpu.train.vanilla_trainer import VanillaTrainer
    out = os.path.join(args.out, "vanilla_31")
    tcfg = TrainerConfig(output_dir=out, learning_rate=args.lr,
                         num_train_steps=args.steps,
                         num_warmup_steps=max(100, args.steps // 20),
                         total_batch_size=args.batch,
                         # full-sequence attention residuals are [b,H,S,S]:
                         # keep the vanilla micro batch small (grad accum)
                         micro_batch_size=min(16, args.batch),
                         max_length=args.max_length,
                         save_steps=max(1, args.steps // 2),
                         logging_steps=25, param_dtype="float32")
    ds = make_dataset(load_corpus(args.corpus), args.max_length, 1)
    trainer = VanillaTrainer(vcfg, tcfg, ds)
    state = trainer.train(resume=True)
    return out, state


# ---------------------------------------------------------------------------
# Phase 3: held-out teacher-forced perplexity
# ---------------------------------------------------------------------------

def heldout_ppl_block(params, cfg, ds, n_samples, batch):
    import jax
    import jax.numpy as jnp
    from block_transformer_tpu.data.packing import make_train_batch
    from block_transformer_tpu.train.train_step import make_loss_fn
    loss_fn = jax.jit(lambda p, b: make_loss_fn(cfg, remat=False)(p, b)[0])
    tot, n = 0.0, 0
    for s in range(0, n_samples, batch):
        idxs = np.arange(s, min(s + batch, n_samples)) % len(ds)
        if len(idxs) < batch:  # keep one jit shape
            idxs = np.concatenate([idxs, idxs[: batch - len(idxs)]])
        b = {k: jnp.asarray(v) for k, v in
             make_train_batch(ds, idxs, cfg.block_length).items()}
        tot += float(loss_fn(params, b))
        n += 1
    return float(np.exp(tot / max(n, 1)))


def heldout_ppl_vanilla(params, vcfg, ds, n_samples, batch):
    import jax
    import jax.numpy as jnp
    from block_transformer_tpu.data.packing import add_labels
    from block_transformer_tpu.models import vanilla as vmod

    @jax.jit
    def loss_fn(p, b):
        return vmod.vanilla_loss(p, vcfg, b["input_ids"],
                                 b["attention_mask"], b["labels"])

    tot, n = 0.0, 0
    for s in range(0, n_samples, batch):
        idxs = np.arange(s, min(s + batch, n_samples)) % len(ds)
        if len(idxs) < batch:
            idxs = np.concatenate([idxs, idxs[: batch - len(idxs)]])
        raw = ds.get_batch(idxs)
        b = {"input_ids": jnp.asarray(raw["input_ids"].astype(np.int32)),
             "attention_mask": jnp.asarray(
                 raw["attention_mask"].astype(np.int32)),
             "labels": jnp.asarray(add_labels(
                 raw["input_ids"], raw["attention_mask"]).astype(np.int32))}
        tot += float(loss_fn(params, b))
        n += 1
    return float(np.exp(tot / max(n, 1)))


# ---------------------------------------------------------------------------
# Phase 4: harness tasks over held-out text
# ---------------------------------------------------------------------------

def byte_tasks(holdout, n_mc=200, n_ppl=24, ctx_chars=384, cont_chars=48,
               seed=0):
    """Byte-level analogues of the reference's tracked tasks: a 4-way
    next-chunk multiple-choice task (hellaswag-shaped) and a rolling
    perplexity task (wikitext-shaped), built from held-out documents."""
    from block_transformer_tpu.eval import harness
    rng = np.random.default_rng(seed)
    texts = []
    for i in range(len(holdout.document_lengths)):
        s = int(holdout.document_indices[i])
        l = int(holdout.document_lengths[i])
        if l >= ctx_chars + cont_chars + 1:
            texts.append(tokens_to_text(holdout.token_data[s:s + l]))
    mc_docs = []
    for _ in range(n_mc):
        i = int(rng.integers(len(texts)))
        t = texts[i]
        start = int(rng.integers(0, max(1, len(t) - ctx_chars - cont_chars)))
        ctx = t[start:start + ctx_chars]
        gold = t[start + ctx_chars:start + ctx_chars + cont_chars]
        distract = []
        while len(distract) < 3:
            j = int(rng.integers(len(texts)))
            u = texts[j]
            st = int(rng.integers(0, max(1, len(u) - cont_chars)))
            d = u[st:st + cont_chars]
            if d != gold:
                distract.append(d)
        order = rng.permutation(4)
        choices = [([gold] + distract)[k] for k in order]
        mc_docs.append({"ctx": ctx, "choices": choices,
                        "gold": int(np.argwhere(order == 0)[0][0])})

    class NextChunkMC(harness.MultipleChoiceTask):
        name = "pybytes_nextchunk"

        def docs(self):
            return mc_docs

        def doc_to_text(self, doc):
            return doc["ctx"]

        def doc_to_choices(self, doc):
            return doc["choices"]

        def gold_index(self, doc):
            return doc["gold"]

    ppl_docs = [t[:4096] for t in texts[:n_ppl]]

    class BytePPL(harness.PerplexityTask):
        name = "pybytes_wikitext"

        def docs(self):
            return ppl_docs

        def doc_to_target(self, doc):
            return doc

    return [NextChunkMC(), BytePPL()]


def run_harness(params, cfg, holdout, max_length, batch):
    from block_transformer_tpu.eval import adapters, harness
    lm = adapters.BlockTransformerLM(params, cfg, ByteTokenizer(),
                                     max_length=max_length, batch_size=batch)
    return harness.evaluate(lm, byte_tasks(holdout), verbose=True)["results"]


# ---------------------------------------------------------------------------
# Phase 5: greedy-decode agreement (KV-cache quantization quality)
# ---------------------------------------------------------------------------

def decode_agreement(params_fp, params_q8, cfg, holdout, params_mixed=None,
                     n_prompts=8,
                     prompt_len=256, gen_tokens=64):
    import jax.numpy as jnp
    from block_transformer_tpu.inference import generate as gen
    rng = np.random.default_rng(1)
    prompts = []
    for _ in range(n_prompts):
        i = int(rng.integers(len(holdout.document_lengths)))
        s = int(holdout.document_indices[i])
        l = int(holdout.document_lengths[i])
        if l < prompt_len + 1:
            continue
        st = int(rng.integers(0, l - prompt_len))
        prompts.append(np.asarray(
            holdout.token_data[s + st:s + st + prompt_len], np.int32))
    prompts = np.stack(prompts)

    d = gen.preprocess_inputs(cfg, prompts)
    B, N, L = d["input_ids"].shape
    max_blocks = N + gen_tokens // L

    def run(params, kv_cache):
        res = gen.generate_blocks(
            params, cfg, jnp.asarray(d["input_ids"]),
            jnp.asarray(d["attention_mask"]),
            jnp.asarray(d["block_attention_mask"]),
            max_blocks=max_blocks, greedy=True, kv_cache=kv_cache)
        toks = np.asarray(res.tokens).reshape(B, -1)
        return toks[:, N * L:(N + gen_tokens // L) * L]

    ref = run(params_fp, "bf16")
    out = {}
    out["int8_kv_vs_bf16_kv_match"] = float((run(params_fp, "int8") == ref).mean())
    out["int8_w_int8_kv_vs_fp_match"] = float((run(params_q8, "int8") == ref).mean())
    out["int4_kv_vs_bf16_kv_match"] = float((run(params_fp, "int4") == ref).mean())
    out["int8_w_int4_kv_vs_fp_match"] = float((run(params_q8, "int4") == ref).mean())
    if params_mixed is not None:
        # the full candidate serving default: mixed48 weights + int4 KV
        out["mixed48_int4_kv_vs_fp_match"] = float(
            (run(params_mixed, "int4") == ref).mean())
    return out


# ---------------------------------------------------------------------------

def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", default="/root/corpus/pybytes")
    ap.add_argument("--out", default="results/quality")
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--max_length", type=int, default=1024)
    ap.add_argument("--lr", type=float, default=6e-4)
    ap.add_argument("--n_checkpoints", type=int, default=6)
    ap.add_argument("--eval_samples", type=int, default=256)
    ap.add_argument("--eval_batch", type=int, default=16)
    ap.add_argument("--skip_train", action="store_true")
    ap.add_argument("--train_only", action="store_true",
                    help="run phases 1-2 (training) and exit — e.g. train "
                    "on the TPU, then eval with --skip_train --cpu")
    ap.add_argument("--int4_group", type=int, default=128,
                    help="INT4 group size (input rows per scale)")
    ap.add_argument("--gptq", action="store_true",
                    help="quantize the INT4-bearing configs with GPTQ "
                    "error-compensated rounding (ops/gptq.py; calibrated "
                    "on the training corpus, act-order) instead of RTN — "
                    "the round-4 recipe that passes the 0.5%% gate "
                    "(QUALITY.md). INT8 stays RTN (already in-gate).")
    ap.add_argument("--calib_samples", type=int, default=256,
                    help="GPTQ calibration samples (--gptq)")
    ap.add_argument("--block_only", action="store_true",
                    help="train/eval only the block model (no vanilla "
                    "baseline) — e.g. the pgbytes real-task model")
    args = ap.parse_args()

    import jax
    from block_transformer_tpu.config import get_config, get_vanilla_config
    from block_transformer_tpu.ops import quant
    from block_transformer_tpu.train import train_step as ts
    from block_transformer_tpu.utils import checkpoint as ckpt

    os.makedirs(args.out, exist_ok=True)
    cfg = get_config("block_main_b4_5", vocab_size=VOCAB,
                     max_length=args.max_length)
    vcfg = get_vanilla_config("vanilla_31", vocab_size=VOCAB,
                              max_position_embeddings=args.max_length)

    t0 = time.time()
    print(f"[quality] devices: {jax.devices()}")
    block_dir = os.path.join(args.out, "block_main_b4_5")
    van_dir = os.path.join(args.out, "vanilla_31")
    if not args.skip_train:
        print("[quality] phase 1: train block_main_b4_5")
        train_block(args, cfg)
        print(f"[quality] block trained ({time.time()-t0:.0f}s)")
        if not args.block_only:
            print("[quality] phase 2: train vanilla_31")
            train_vanilla(args, vcfg)
            print(f"[quality] vanilla trained ({time.time()-t0:.0f}s)")
    if args.train_only:
        print("[quality] --train_only: done")
        return

    # load final params from checkpoints (restore the full TrainState shape
    # the trainer saved — same optimizer settings — then keep params)
    from block_transformer_tpu.train import optimizer as opt_mod

    def load_params(out_dir, model_cfg, vanilla=False):
        step = ckpt.find_latest_checkpoint(out_dir)
        assert step, f"no checkpoint in {out_dir}"
        if vanilla:
            from block_transformer_tpu.models.vanilla import init_vanilla_params
            tmpl = jax.eval_shape(
                lambda: init_vanilla_params(jax.random.PRNGKey(0), model_cfg))
        else:
            from block_transformer_tpu.models.block_transformer import (
                init_block_transformer_params)
            tmpl = jax.eval_shape(
                lambda: init_block_transformer_params(jax.random.PRNGKey(0),
                                                      model_cfg))
        tx, _ = opt_mod.make_optimizer(
            peak_lr=args.lr, warmup_steps=max(100, args.steps // 20),
            total_steps=args.steps, weight_decay=0.1, b1=0.9, b2=0.95)
        import jax.numpy as jnp
        state_tmpl = ts.TrainState(
            params=tmpl, opt_state=jax.eval_shape(tx.init, tmpl),
            step=jax.ShapeDtypeStruct((), jnp.int32))
        restored = ckpt.restore_checkpoint(out_dir, step, state_tmpl)
        return jax.tree.map(jnp.asarray, restored.params), step

    block_params, bstep = load_params(block_dir, cfg)
    van_params, vstep = load_params(van_dir, vcfg, vanilla=True)
    print(f"[quality] loaded block@{bstep}, vanilla@{vstep}")

    holdout = load_corpus(args.corpus + "_holdout")
    ds_hold_block = make_dataset(holdout, args.max_length, cfg.block_length,
                                 seed=7)
    ds_hold_van = make_dataset(holdout, args.max_length, 1, seed=7)

    q8 = quant.quantize_block_transformer(block_params, bits=8)
    if args.gptq:
        # GPTQ for the INT4-bearing configs: sequential calibration on the
        # training corpus, act-order static groups (ops/gptq.py) — packed
        # format identical to RTN, so everything downstream is unchanged
        from block_transformer_tpu.data.packing import make_train_batch
        from block_transformer_tpu.ops import gptq
        ds_cal = make_dataset(load_corpus(args.corpus), args.max_length,
                              cfg.block_length, seed=3)
        calib = []
        for s in range(0, args.calib_samples, args.eval_batch):
            idxs = (np.arange(s, s + args.eval_batch) * 17) % len(ds_cal)
            b = make_train_batch(ds_cal, idxs, cfg.block_length)
            calib.append((b["input_ids"], b["attention_mask"],
                          b["block_attention_mask"]))

        def q4_fn(**kw):
            return gptq.gptq_quantize_block_transformer(
                block_params, cfg, calib, act_order=True, **kw)
    else:
        def q4_fn(**kw):
            return quant.quantize_block_transformer(block_params, **kw)
    q4 = q4_fn(bits=4, group_size=args.int4_group)
    # the bench's mixed48 serving config: block INT8 + token INT4 + head INT8
    qmix = q4_fn(bits=8, token_decoder_bits=4, lm_head_bits=8,
                 group_size=args.int4_group)
    # the QUALITY.md gate-passing INT4 recipe: g32 groups + INT8 LM head
    q4_gate = q4_fn(bits=4, lm_head_bits=8, group_size=32)

    results = {"steps": args.steps, "batch": args.batch,
               "max_length": args.max_length,
               "block_checkpoint_step": bstep, "vanilla_checkpoint_step": vstep}

    print("[quality] phase 3: held-out teacher-forced ppl")
    n = args.eval_samples
    results["ppl"] = {
        "block_fp32": heldout_ppl_block(block_params, cfg, ds_hold_block, n,
                                        args.eval_batch),
        "block_int8": heldout_ppl_block(q8, cfg, ds_hold_block, n,
                                        args.eval_batch),
        "block_int4": heldout_ppl_block(q4, cfg, ds_hold_block, n,
                                        args.eval_batch),
        "block_mixed48": heldout_ppl_block(qmix, cfg, ds_hold_block, n,
                                           args.eval_batch),
        "block_int4_gate": heldout_ppl_block(q4_gate, cfg, ds_hold_block, n,
                                             args.eval_batch),
        "vanilla_fp32": heldout_ppl_vanilla(van_params, vcfg, ds_hold_van, n,
                                            args.eval_batch),
    }
    fp = results["ppl"]["block_fp32"]
    results["ppl"]["int8_delta_pct"] = 100 * (results["ppl"]["block_int8"] - fp) / fp
    results["ppl"]["int4_delta_pct"] = 100 * (results["ppl"]["block_int4"] - fp) / fp
    results["ppl"]["mixed48_delta_pct"] = 100 * (
        results["ppl"]["block_mixed48"] - fp) / fp
    results["ppl"]["int4_gate_delta_pct"] = 100 * (
        results["ppl"]["block_int4_gate"] - fp) / fp
    print(json.dumps(results["ppl"], indent=2))

    print("[quality] phase 4: harness tasks")
    results["harness"] = {
        "fp32": run_harness(block_params, cfg, holdout, args.max_length,
                            args.eval_batch),
        "int8": run_harness(q8, cfg, holdout, args.max_length,
                            args.eval_batch),
        "int4": run_harness(q4, cfg, holdout, args.max_length,
                            args.eval_batch),
    }

    print("[quality] phase 5: decode agreement")
    results["decode_agreement"] = decode_agreement(block_params, q8, cfg,
                                                   holdout, params_mixed=qmix)

    with open(os.path.join(args.out, "quality.json"), "w") as f:
        json.dump(results, f, indent=2)

    write_report(args, results)
    print(f"[quality] done in {time.time()-t0:.0f}s -> {args.out}/QUALITY.md")


def write_report(args, r):
    p = r["ppl"]
    h = r["harness"]
    d = r["decode_agreement"]

    def task_row(task, metric):
        f = h["fp32"].get(task, {}).get(metric, float("nan"))
        q8v = h["int8"].get(task, {}).get(metric, float("nan"))
        q4v = h["int4"].get(task, {}).get(metric, float("nan"))
        return (f"| {task} {metric} | {f:.4f} | {q8v:.4f} | {q4v:.4f} | "
                f"{100*(q8v-f)/f if f else 0:+.2f}% | "
                f"{100*(q4v-f)/f if f else 0:+.2f}% |")

    lines = [
        "# QUALITY — end-to-end quantization quality gate",
        "",
        f"Models trained with the full pipeline (trainer -> orbax checkpoint "
        f"-> eval adapter -> harness) on a {args.steps}-step run "
        f"(batch {args.batch} x {args.max_length} tokens, byte-level local "
        f"real-text corpus; scripts/quality_run.py). Gate per BASELINE.json: "
        f"quantized ppl delta <= 0.5%.",
        "",
        "## Held-out teacher-forced perplexity (token-level)",
        "",
        "| Model | ppl | delta vs fp32 |",
        "|---|---|---|",
        f"| block_main_b4_5 fp32 | {p['block_fp32']:.4f} | — |",
        f"| block_main_b4_5 INT8 weights | {p['block_int8']:.4f} | "
        f"{p['int8_delta_pct']:+.3f}% |",
        f"| block_main_b4_5 INT4 weights (g{args.int4_group}) | "
        f"{p['block_int4']:.4f} | {p['int4_delta_pct']:+.3f}% |",
        f"| block_main_b4_5 INT4 gate recipe (g32 + INT8 head) | "
        f"{p.get('block_int4_gate', float('nan')):.4f} | "
        f"{p.get('int4_gate_delta_pct', float('nan')):+.3f}% |",
        f"| block_main_b4_5 mixed48 (block int8 + token int4 + head int8) | "
        f"{p.get('block_mixed48', float('nan')):.4f} | "
        f"{p.get('mixed48_delta_pct', float('nan')):+.3f}% |",
        f"| vanilla_31 fp32 | {p['vanilla_fp32']:.4f} | (baseline pairing) |",
        "",
        f"INT8 gate (<=0.5%): {'PASS' if abs(p['int8_delta_pct']) <= 0.5 else 'FAIL'}; "
        f"INT4 g{args.int4_group}: "
        f"{'PASS' if abs(p['int4_delta_pct']) <= 0.5 else 'FAIL'} "
        f"({p['int4_delta_pct']:+.3f}%); INT4 gate recipe: "
        f"{'PASS' if abs(p.get('int4_gate_delta_pct', 9)) <= 0.5 else 'FAIL'} "
        f"({p.get('int4_gate_delta_pct', float('nan')):+.3f}%).",
        "",
        "## Harness tasks (byte-level analogues, full adapter path)",
        "",
        "| Task / metric | fp32 | int8 | int4 | d8 | d4 |",
        "|---|---|---|---|---|---|",
        task_row("pybytes_nextchunk", "acc"),
        task_row("pybytes_nextchunk", "acc_norm"),
        task_row("pybytes_wikitext", "byte_perplexity"),
        task_row("pybytes_wikitext", "bits_per_byte"),
        "",
        "## Greedy-decode agreement (KV-cache quantization)",
        "",
        f"- INT8 KV vs bf16 KV (fp32 weights): "
        f"{100*d['int8_kv_vs_bf16_kv_match']:.2f}% token match",
        f"- INT8 weights + INT8 KV vs full precision: "
        f"{100*d['int8_w_int8_kv_vs_fp_match']:.2f}% token match",
        f"- INT4 KV vs bf16 KV (fp32 weights): "
        f"{100*d.get('int4_kv_vs_bf16_kv_match', float('nan')):.2f}% token match",
        f"- INT8 weights + INT4 KV vs full precision: "
        f"{100*d.get('int8_w_int4_kv_vs_fp_match', float('nan')):.2f}% token match",
        f"- mixed48 weights + INT4 KV vs full precision: "
        f"{100*d.get('mixed48_int4_kv_vs_fp_match', float('nan')):.2f}% token match",
        "",
        "Training loss curves: `results/quality/*/metrics.jsonl` "
        "(per-component losses + fp64 loss-by-position).",
    ]
    with open(os.path.join(args.out, "QUALITY.md"), "w") as f:
        f.write("\n".join(lines) + "\n")


if __name__ == "__main__":
    main()
