"""ONE decode-path quality gate for every quantization (VERDICT r3 item 2).

Round 3 gated different decode-path quantizations by different standards:
W8A8-decode was reverted at 79.3% greedy *agreement*, while the INT4-KV
serving default sat at 80.7% agreement on the same model — indefensible.
Greedy agreement is also a poor gate on sharp models: it counts every
token after the first near-tie trajectory flip as a miss, so it measures
trajectory *stability*, not quality.

This script defines THE gate, applied uniformly:

    fp32-scored continuation quality: decode greedily under the
    quantized configuration, then teacher-force the fp32 model over the
    generated continuation and compare its mean token logprob against
    the reference (fp32 weights + bf16 KV) decode's continuations.
    GATE: |logprob_variant - logprob_ref| / |logprob_ref| <= 0.5%
    (the decode analogue of BASELINE.json's single <=0.5% ppl clause —
    "does the full-precision model find the quantized decode's text
    measurably less likely?").

Greedy agreement / rows-identical / first-divergence are still reported
as *diagnostics* (trajectory stability), but they do not gate.

Variants measured (all on the 10k TPU-trained checkpoint, same prompts):
  ref            fp32 weights + bf16 KV          (reference)
  int8kv         fp32 weights + INT8 KV
  int4kv         fp32 weights + INT4 KV
  int8w_int8kv   INT8 weights + INT8 KV
  int8w_int4kv   INT8 weights + INT4 KV          (serving default)
  mixed48_int4kv mixed48 weights + INT4 KV
  mixed48_int8kv mixed48 weights + INT8 KV
  int4w_int8kv   whole-model INT4 g128 + INT8 KV   (QAT int4g128 recipe)
  gptq_mixed48_int4kv  GPTQ mixed48 + INT4 KV    (--gptq)
  gptq_mixed48_int8kv  GPTQ mixed48 + INT8 KV    (--gptq)
  w8a8_int8w_int8kv    + BT_W8A8_M_MIN=384       (TPU only: --w8a8)

`--only name1,name2 --merge` appends/updates rows in an existing report
(reference decode is deterministic, so merged rows share the protocol).

Each variant decodes in a subprocess (env-controlled W8A8 thresholds,
fresh jit caches); quantized trees are built once in the parent and
passed via npz. Run on the chip at b384 so decode-M hits the W8A8
window; CPU works for everything but the W8A8 row.

Usage:
  python scripts/decode_gate.py --model_dir results/quality10k/block_main_b4_5 \
      --w8a8 --gptq --out results/decode_gate.json
"""

import argparse
import json
import os
import re
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
if os.environ.get("BT_CPU") == "1":
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
from block_transformer_tpu.config import get_config
from block_transformer_tpu.inference import generate as gen

spec = json.load(open(sys.argv[1]))
cfg = get_config(spec.get("model", "block_main_b4_5"), vocab_size=512,
                 max_length=spec["max_length"])

z = np.load(spec["tree_npz"])
params = {}
for key in z.files:
    node = params
    parts = key.split("::")
    for p in parts[:-1]:
        node = node.setdefault(p, {})
    node[parts[-1]] = jnp.asarray(z[key])

prompts = np.asarray(spec["prompts"], np.int32)
d = gen.preprocess_inputs(cfg, prompts)
B, N, L = d["input_ids"].shape
max_blocks = N + spec["gen_tokens"] // L
res = gen.generate_blocks(params, cfg, jnp.asarray(d["input_ids"]),
                          jnp.asarray(d["attention_mask"]),
                          jnp.asarray(d["block_attention_mask"]),
                          max_blocks=max_blocks, greedy=True,
                          kv_cache=spec["kv_cache"])
toks = np.asarray(res.tokens).reshape(B, -1)[:, N * L:max_blocks * L]
np.save(spec["out"], toks)
print("done", toks.shape)
"""


def save_tree_npz(path, tree):
    """Nested-dict param tree -> npz with ::-joined path keys."""
    flat = {}

    def walk(node, prefix):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(v, prefix + [k])
        else:
            flat["::".join(prefix)] = np.asarray(node)

    walk(tree, [])
    np.savez(path, **flat)


def run_variant(spec, env_extra=None):
    env = dict(os.environ)
    env.update(env_extra or {})
    with tempfile.NamedTemporaryFile("w", suffix=".json", delete=False) as f:
        json.dump(spec, f)
        path = f.name
    out = subprocess.run([sys.executable, "-c", WORKER, path],
                         env=env, capture_output=True, text=True,
                         timeout=5400)
    if out.returncode != 0:
        raise RuntimeError(out.stderr[-2000:])
    return np.load(spec["out"])


def load_params(model_dir, cfg, lr, steps):
    import jax
    import jax.numpy as jnp
    from block_transformer_tpu.models.block_transformer import (
        init_block_transformer_params)
    from block_transformer_tpu.train import optimizer as opt_mod
    from block_transformer_tpu.train import train_step as ts
    from block_transformer_tpu.utils import checkpoint as ckpt
    step = ckpt.find_latest_checkpoint(model_dir)
    assert step, f"no checkpoint in {model_dir}"
    tmpl = jax.eval_shape(
        lambda: init_block_transformer_params(jax.random.PRNGKey(0), cfg))
    tx, _ = opt_mod.make_optimizer(peak_lr=lr,
                                   warmup_steps=max(100, steps // 20),
                                   total_steps=steps, weight_decay=0.1,
                                   b1=0.9, b2=0.95)
    state_tmpl = ts.TrainState(params=tmpl,
                               opt_state=jax.eval_shape(tx.init, tmpl),
                               step=jax.ShapeDtypeStruct((), jnp.int32))
    return jax.tree.map(
        jnp.asarray,
        ckpt.restore_checkpoint(model_dir, step, state_tmpl).params), step


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="block_main_b4_5",
                    help="named block config of the checkpoint")
    ap.add_argument("--model_dir",
                    default="results/quality10k/block_main_b4_5")
    ap.add_argument("--variant_model_dir", default=None,
                    help="build the QUANTIZED variant trees from this "
                    "checkpoint while the reference decode + fp32 scorer "
                    "stay on --model_dir. This is the deployment question "
                    "for a QAT checkpoint: 'you served model X in fp32; "
                    "you now serve quantized QAT(X) - does the ORIGINAL "
                    "model find the new decode as likely as its own?'")
    ap.add_argument("--corpus", default="/root/corpus/pybytes_holdout")
    ap.add_argument("--train_corpus", default="/root/corpus/pybytes",
                    help="GPTQ calibration corpus (--gptq)")
    ap.add_argument("--batch", type=int, default=384)
    ap.add_argument("--prompt_len", type=int, default=256)
    ap.add_argument("--gen_tokens", type=int, default=64)
    ap.add_argument("--max_length", type=int, default=1024)
    ap.add_argument("--lr", type=float, default=6e-4)
    ap.add_argument("--steps", type=int, default=10000)
    ap.add_argument("--w8a8", action="store_true",
                    help="include the W8A8-decode row (TPU only)")
    ap.add_argument("--gptq", action="store_true",
                    help="include the GPTQ-mixed48 row (adds ~3 min "
                    "calibration)")
    ap.add_argument("--bar_pct", type=float, default=0.5)
    ap.add_argument("--prompt_seed", type=int, default=3,
                    help="holdout prompt-sampling seed. Repeat the gate "
                    "with disjoint seeds to put error bars on borderline "
                    "verdicts (VERDICT r4 item 4: a gate that flips "
                    "defaults should know its own sigma)")
    ap.add_argument("--only", default=None,
                    help="comma-separated variant names to run (others "
                    "skipped); with --merge this appends rows to an "
                    "existing report")
    ap.add_argument("--merge", action="store_true",
                    help="load an existing --out report and update only "
                    "the variants run this invocation")
    ap.add_argument("--cpu", action="store_true",
                    help="run EVERYTHING on CPU (workers too) — for smoke "
                    "tests; without it the parent still pins itself to CPU "
                    "(eager GPTQ calibration is pathological on the TPU "
                    "tunnel) while decode workers use the TPU")
    ap.add_argument("--out", default="results/decode_gate.json")
    args = ap.parse_args()
    if args.cpu:
        os.environ["BT_CPU"] = "1"

    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    # the parent only loads/quantizes/scores (all CPU-suited, and GPTQ's
    # eager calibration would crawl on the tunnel); decode workers are
    # subprocesses and pick their own platform via BT_CPU
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from block_transformer_tpu.config import get_config
    from block_transformer_tpu.models import block_transformer as bt
    from block_transformer_tpu.ops import quant
    from block_transformer_tpu.data.mmap_dataset import MMapIndexedDataset

    cfg = get_config(args.model, vocab_size=512,
                     max_length=args.max_length)
    params, step = load_params(args.model_dir, cfg, args.lr, args.steps)
    print(f"[decode_gate] checkpoint step {step}")
    vparams = params
    if args.variant_model_dir:
        vparams, vstep = load_params(args.variant_model_dir, cfg,
                                     args.lr, args.steps)
        print(f"[decode_gate] variant checkpoint step {vstep} "
              f"({args.variant_model_dir})")

    # ---- prompts from the holdout corpus ----
    mm = MMapIndexedDataset(args.corpus)
    data, lengths, starts = mm.token_view()
    rng = np.random.default_rng(args.prompt_seed)
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

    # ---- variant trees (built once, shipped to workers via npz) ----
    tmpdir = tempfile.mkdtemp(prefix="decode_gate_")
    q8 = quant.quantize_block_transformer(vparams, bits=8)
    qmix = quant.quantize_block_transformer(vparams, bits=8,
                                            token_decoder_bits=4,
                                            lm_head_bits=8, group_size=128)
    variants = [
        # name, tree, kv_cache, env
        # control row for --variant_model_dir: the variant checkpoint's
        # UNQUANTIZED decode vs the reference — isolates model drift from
        # quantization error (identical to the reference when
        # variant_model_dir is unset)
        ("fp32_bf16kv", vparams, "bf16", {}),
        ("int8kv", vparams, "int8", {}),
        ("int4kv", vparams, "int4", {}),
        ("int8w_int8kv", q8, "int8", {}),
        ("int8w_int4kv", q8, "int4", {}),
        ("mixed48_int4kv", qmix, "int4", {}),
        # the INT4-weight recipes paired with the PASSing KV precision —
        # the serving-relevant combination when INT4-KV fails the gate
        ("mixed48_int8kv", qmix, "int8", {}),
        # whole-model INT4 g128 (the QAT int4g128 recipe's deployment)
        ("int4w_int8kv",
         quant.quantize_block_transformer(vparams, bits=4, group_size=128),
         "int8", {}),
    ]
    if args.gptq:
        from block_transformer_tpu.ops import gptq
        from block_transformer_tpu.data.packing import make_train_batch
        import importlib.util
        spec_m = importlib.util.spec_from_file_location(
            "quality_run", os.path.join(os.path.dirname(
                os.path.abspath(__file__)), "quality_run.py"))
        qr = importlib.util.module_from_spec(spec_m)
        spec_m.loader.exec_module(qr)
        train_ds = qr.make_dataset(qr.load_corpus(args.train_corpus),
                                   args.max_length, cfg.block_length, seed=3)
        calib = []
        for s in range(0, 64, 8):
            idxs = (np.arange(s, s + 8) * 17) % len(train_ds)
            b = make_train_batch(train_ds, idxs, cfg.block_length)
            calib.append((b["input_ids"], b["attention_mask"],
                          b["block_attention_mask"]))
        qg = gptq.gptq_quantize_block_transformer(
            vparams, cfg, calib, bits=8, token_decoder_bits=4, lm_head_bits=8,
            group_size=128, act_order=True)
        variants.append(("gptq_mixed48_int4kv", qg, "int4", {}))
        variants.append(("gptq_mixed48_int8kv", qg, "int8", {}))
    if args.w8a8:
        variants.append(("w8a8_int8w_int8kv", q8, "int8",
                         {"BT_W8A8_M_MIN": "384"}))
        # the max-throughput headline combination (fresh prefill + W8A8
        # decode + INT4 KV)
        variants.append(("w8a8_int8w_int4kv", q8, "int4",
                         {"BT_W8A8_M_MIN": "384"}))
    if args.only:
        keep = {v.strip() for v in args.only.split(",")}
        unknown = keep - {n for n, *_ in variants}
        assert not unknown, f"unknown variants: {sorted(unknown)}"
        variants = [v for v in variants if v[0] in keep]

    base = {"max_length": args.max_length, "gen_tokens": args.gen_tokens,
            "model": args.model, "prompts": prompts.tolist()}

    # reference decode: fp32 weights + bf16 KV
    ref_npz = os.path.join(tmpdir, "ref.npz")
    save_tree_npz(ref_npz, params)
    ref_spec = dict(base, tree_npz=ref_npz,
                    kv_cache="bf16", out=os.path.join(tmpdir, "ref.npy"))
    toks_ref = run_variant(ref_spec, {"BT_W8A8_M_MIN": str(10**9)})
    print("[decode_gate] reference decoded")

    # ---- fp32 scorer over generated continuations ----
    L = cfg.block_length
    pl_len = prompts.shape[1]

    @jax.jit
    def score(full_ids):
        B = full_ids.shape[0]
        N = full_ids.shape[1] // L
        ids = full_ids.reshape(B, N, L)
        att = jnp.ones_like(ids)
        bam = jnp.ones((B, N), jnp.int32)
        out = bt.block_transformer_forward(params, cfg, ids, att, bam)
        logits = out.logits.reshape(B, (N - 1) * L, -1)
        tgt = full_ids[:, L:]
        lp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
        tok_lp = jnp.take_along_axis(lp, tgt[:, :, None], -1)[..., 0]
        return tok_lp[:, pl_len - L:].mean()

    def fp32_lp(toks):
        full = np.concatenate([prompts, toks[:, :args.gen_tokens]], 1)
        return float(score(jnp.asarray(full, jnp.int32)))

    lp_ref = fp32_lp(toks_ref)
    report = {"checkpoint_step": step, "batch": args.batch,
              "prompt_seed": args.prompt_seed,
              "prompt_len": args.prompt_len, "gen_tokens": args.gen_tokens,
              "gate": f"|fp32_logprob_delta| <= {args.bar_pct}% relative",
              "fp32_mean_logprob_ref": lp_ref, "variants": {}}
    if args.merge and os.path.exists(args.out):
        prev = json.load(open(args.out))
        # same protocol check: the merged rows must share the reference
        assert abs(prev["fp32_mean_logprob_ref"] - lp_ref) < 1e-4, \
            "existing report's reference decode differs - refusing to merge"
        report["variants"].update(prev.get("variants", {}))

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    for name, tree, kv, env in variants:
        npz = os.path.join(tmpdir, f"{name}.npz")
        save_tree_npz(npz, tree)
        spec = dict(base, tree_npz=npz, kv_cache=kv,
                    out=os.path.join(tmpdir, f"{name}.npy"))
        env = dict(env)
        env.setdefault("BT_W8A8_M_MIN", str(10**9))
        try:
            toks = run_variant(spec, env)
        except Exception as e:
            # a tunnel flake on one variant must not lose the others:
            # record the error row, write what we have, keep going
            report["variants"][name] = {"error": str(e)[-500:]}
            with open(args.out, "w") as f:
                json.dump(report, f, indent=1)
            print(f"[decode_gate] {name}: ERROR {str(e)[-200:]}")
            os.remove(npz)
            continue
        lp = fp32_lp(toks)
        delta_pct = 100 * abs(lp - lp_ref) / abs(lp_ref)
        diff = toks != toks_ref
        first = np.where(diff.any(1), diff.argmax(1), toks.shape[1])
        report["variants"][name] = {
            "fp32_mean_logprob": lp,
            "fp32_logprob_delta_pct": delta_pct,
            "gate": "PASS" if delta_pct <= args.bar_pct else "FAIL",
            # diagnostics (trajectory stability, NOT the gate)
            "greedy_agreement": float((~diff).mean()),
            "rows_identical": float((~diff.any(1)).mean()),
            "first_divergence_token_mean": float(first.mean()),
        }
        v = report["variants"][name]
        print(f"[decode_gate] {name}: lp {lp:.4f} ({v['fp32_logprob_delta_pct']:+.3f}% "
              f"vs ref) {v['gate']}  [agreement {v['greedy_agreement']:.3f}]",
              flush=True)
        os.remove(npz)
        with open(args.out, "w") as f:     # incremental: survive flakes
            json.dump(report, f, indent=1)

    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(f"[decode_gate] -> {args.out}")


if __name__ == "__main__":
    main()
