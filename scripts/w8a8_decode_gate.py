"""W8A8-at-decode-M quality gate (VERDICT r2 #3a / ADVICE r2 medium #1).

Round 2 flipped the W8A8 default to BT_W8A8_M_MIN=384 for +5.4% throughput
— which newly quantizes ACTIVATIONS (per-row dynamic int8) on the decode
and engine-prefill paths at 384 <= M < 2048 — without a decode-path
quality measurement (the prefill ppl gate exercises the same per-row math
but not the decode trajectory, where early-token quantization error can
compound through the carried KV cache and block embeddings).

This gate decodes the same prompts through the trained 5M model (INT8
weights + INT8 KV, the headline serving config) at batch 384 (so decode-M
hits the W8A8 window) in two subprocesses — BT_W8A8_M_MIN=384 (on) vs
BT_W8A8_M_MIN=10**9 (off) — and reports:

  - greedy token agreement (bar: >= the 97.7% INT4-KV precedent)
  - fp32-model teacher-forced mean loglikelihood of EACH variant's
    generated continuation (does W8A8 steer generation into text the
    full-precision model finds less likely?)

W8A8 only engages on TPU (_use_w8a8 checks _on_tpu), so this must run on
the chip. Usage:
  python scripts/w8a8_decode_gate.py --model_dir results/quality10k/block_main_b4_5
"""

import argparse
import json
import os
import subprocess
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

WORKER = r"""
import json, os, sys
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp
from block_transformer_tpu.config import get_config
from block_transformer_tpu.inference import generate as gen
from block_transformer_tpu.models.block_transformer import (
    init_block_transformer_params)
from block_transformer_tpu.ops import quant
from block_transformer_tpu.train import optimizer as opt_mod
from block_transformer_tpu.train import train_step as ts
from block_transformer_tpu.utils import checkpoint as ckpt

spec = json.load(open(sys.argv[1]))
cfg = get_config("block_main_b4_5", vocab_size=512,
                 max_length=spec["max_length"])
step = ckpt.find_latest_checkpoint(spec["model_dir"])
tmpl = jax.eval_shape(
    lambda: init_block_transformer_params(jax.random.PRNGKey(0), cfg))
tx, _ = opt_mod.make_optimizer(peak_lr=spec["lr"],
                               warmup_steps=max(100, spec["steps"] // 20),
                               total_steps=spec["steps"], weight_decay=0.1,
                               b1=0.9, b2=0.95)
state_tmpl = ts.TrainState(params=tmpl, opt_state=jax.eval_shape(tx.init, tmpl),
                           step=jax.ShapeDtypeStruct((), jnp.int32))
params = jax.tree.map(
    jnp.asarray, ckpt.restore_checkpoint(spec["model_dir"], step,
                                         state_tmpl).params)
q8 = quant.quantize_block_transformer(params, bits=8)

prompts = np.asarray(spec["prompts"], np.int32)
d = gen.preprocess_inputs(cfg, prompts)
B, N, L = d["input_ids"].shape
max_blocks = N + spec["gen_tokens"] // L
res = gen.generate_blocks(q8, cfg, jnp.asarray(d["input_ids"]),
                          jnp.asarray(d["attention_mask"]),
                          jnp.asarray(d["block_attention_mask"]),
                          max_blocks=max_blocks, greedy=True,
                          kv_cache="int8")
toks = np.asarray(res.tokens).reshape(B, -1)[:, N * L:max_blocks * L]
np.save(spec["out"], toks)
print("done", toks.shape)
"""


def run_variant(spec, m_min):
    env = dict(os.environ)
    env["BT_W8A8_M_MIN"] = str(m_min)
    with tempfile.NamedTemporaryFile("w", suffix=".json",
                                     delete=False) as f:
        json.dump(spec, f)
        path = f.name
    out = subprocess.run([sys.executable, "-c", WORKER, path],
                         env=env, capture_output=True, text=True,
                         timeout=3600)
    if out.returncode != 0:
        raise RuntimeError(out.stderr[-2000:])
    return np.load(spec["out"])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model_dir",
                    default="results/quality10k/block_main_b4_5")
    ap.add_argument("--corpus", default="/root/corpus/pybytes_holdout")
    ap.add_argument("--batch", type=int, default=384)
    ap.add_argument("--prompt_len", type=int, default=256)
    ap.add_argument("--gen_tokens", type=int, default=64)
    ap.add_argument("--max_length", type=int, default=1024)
    ap.add_argument("--lr", type=float, default=6e-4)
    ap.add_argument("--steps", type=int, default=10000)
    ap.add_argument("--out", default="results/w8a8_decode_gate.json")
    args = ap.parse_args()

    from block_transformer_tpu.data.mmap_dataset import MMapIndexedDataset
    mm = MMapIndexedDataset(args.corpus)
    data, lengths, starts = mm.token_view()
    rng = np.random.default_rng(3)
    prompts = []
    while len(prompts) < args.batch:
        i = int(rng.integers(len(lengths)))
        if lengths[i] < args.prompt_len + 1:
            continue
        st = int(rng.integers(0, lengths[i] - args.prompt_len))
        s = int(starts[i])
        prompts.append(np.asarray(data[s + st:s + st + args.prompt_len],
                                  np.int32))
    prompts = np.stack(prompts)

    base = {"model_dir": args.model_dir, "max_length": args.max_length,
            "lr": args.lr, "steps": args.steps,
            "gen_tokens": args.gen_tokens, "prompts": prompts.tolist()}

    spec_on = dict(base, out="/tmp/w8a8_on.npy")
    spec_off = dict(base, out="/tmp/w8a8_off.npy")
    toks_off = run_variant(spec_off, 10 ** 9)
    toks_on = run_variant(spec_on, 384)

    agreement = float((toks_on == toks_off).mean())
    # first disagreement position per row (how early does divergence start)
    diff = toks_on != toks_off
    first = np.where(diff.any(1), diff.argmax(1), toks_on.shape[1])
    report = {
        "batch": args.batch, "gen_tokens": args.gen_tokens,
        "greedy_agreement": agreement,
        "rows_identical": float((~diff.any(1)).mean()),
        "first_divergence_token_mean": float(first.mean()),
        "pass_977": agreement >= 0.977,
    }

    # fp32-model scoring of both variants' continuations
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    import jax.numpy as jnp
    from block_transformer_tpu.config import get_config
    from block_transformer_tpu.models import block_transformer as bt
    from block_transformer_tpu.models.block_transformer import (
        init_block_transformer_params)
    from block_transformer_tpu.train import optimizer as opt_mod
    from block_transformer_tpu.train import train_step as ts
    from block_transformer_tpu.utils import checkpoint as ckpt

    cfg = get_config("block_main_b4_5", vocab_size=512,
                     max_length=args.max_length)
    step = ckpt.find_latest_checkpoint(args.model_dir)
    tmpl = jax.eval_shape(
        lambda: init_block_transformer_params(jax.random.PRNGKey(0), cfg))
    tx, _ = opt_mod.make_optimizer(peak_lr=args.lr,
                                   warmup_steps=max(100, args.steps // 20),
                                   total_steps=args.steps, weight_decay=0.1,
                                   b1=0.9, b2=0.95)
    state_tmpl = ts.TrainState(params=tmpl,
                               opt_state=jax.eval_shape(tx.init, tmpl),
                               step=jax.ShapeDtypeStruct((), jnp.int32))
    params = jax.tree.map(
        jnp.asarray, ckpt.restore_checkpoint(args.model_dir, step,
                                             state_tmpl).params)

    L = cfg.block_length

    @jax.jit
    def score(p, full_ids):
        B = full_ids.shape[0]
        N = full_ids.shape[1] // L
        ids = full_ids.reshape(B, N, L)
        att = jnp.ones_like(ids)
        bam = jnp.ones((B, N), jnp.int32)
        out = bt.block_transformer_forward(p, cfg, ids, att, bam)
        logits = out.logits.reshape(B, (N - 1) * L, -1)
        tgt = full_ids[:, L:]
        lp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
        tok_lp = jnp.take_along_axis(lp, tgt[:, :, None], -1)[..., 0]
        # score only the generated region
        gen_from = prompts.shape[1] - L
        return tok_lp[:, gen_from:].mean()

    pl = prompts.shape[1]
    for name, toks in (("w8a8_on", toks_on), ("w8a8_off", toks_off)):
        full = np.concatenate([prompts, toks[:, :args.gen_tokens]], 1)
        report[f"fp32_mean_logprob_{name}"] = float(
            score(params, jnp.asarray(full, jnp.int32)))
    report["fp32_logprob_delta"] = (report["fp32_mean_logprob_w8a8_on"]
                                    - report["fp32_mean_logprob_w8a8_off"])

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
