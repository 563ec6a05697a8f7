"""Which INT4 KV quantization scheme can pass the decode gate?

Round-4 finding (results/decode_gate.json): symmetric per-(position,head)
INT4 KV fails the uniform decode gate at +1.49% fp32-logprob delta (the
gate is |delta| <= 0.5%; INT8 passes at +0.10%). Before wiring a better
scheme through every cache/dequant site, this probe measures candidate
schemes cheaply by FAKE-QUANTIZING K/V at the layer_qkv output (a
quantize->dequantize roundtrip into the bf16 cache path) — numerically
the same write-time quantization the real QuantKVCache applies, without
needing dequant support for zero-points/groups anywhere else.

Schemes probed (all per (position, head) unless noted):
  sym8       symmetric int8, one scale per D values   (sanity ~= int8kv row)
  sym4       symmetric int4                           (sanity ~= int4kv row)
  asym4      asymmetric int4 (scale + zero-point)
  sym4_g32   symmetric int4, scales over D-groups of 32
  asym4_g32  asymmetric int4, D-groups of 32
  k8v4       K sym8 + V sym4 (K is the attention-logit-critical half)
  k4v8       K sym4 + V sym8
Run (CPU, ~minutes at b64):
  python scripts/kv_scheme_probe.py --out results/kv_scheme_probe.json
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")


def fake_quant(x, bits, asym, group):
    """Quantize->dequantize roundtrip along the last axis in groups."""
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    shp = xf.shape
    D = shp[-1]
    g = group or D
    xg = xf.reshape(shp[:-1] + (D // g, g))
    qmax = float(2 ** (bits - 1) - 1)
    if asym:
        lo = xg.min(-1, keepdims=True)
        hi = xg.max(-1, keepdims=True)
        scale = jnp.maximum(hi - lo, 1e-8) / (2 ** bits - 1)
        q = jnp.clip(jnp.round((xg - lo) / scale), 0, 2 ** bits - 1)
        out = q * scale + lo
    else:
        a = jnp.max(jnp.abs(xg), -1, keepdims=True)
        scale = jnp.maximum(a, 1e-8) / qmax
        q = jnp.clip(jnp.round(xg / scale), -qmax, qmax)
        out = q * scale
    return out.reshape(shp).astype(orig_dtype)


SCHEMES = {
    # name: (k_cfg, v_cfg) with cfg = (bits, asym, group) or None = bf16
    "bf16": (None, None),
    "sym8": ((8, False, None), (8, False, None)),
    "sym4": ((4, False, None), (4, False, None)),
    "asym4": ((4, True, None), (4, True, None)),
    "sym4_g32": ((4, False, 32), (4, False, 32)),
    "asym4_g32": ((4, True, 32), (4, True, 32)),
    "k8v4": ((8, False, None), (4, False, None)),
    "k4v8": ((4, False, None), (8, False, None)),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model_dir", default="results/quality10k/block_main_b4_5")
    ap.add_argument("--corpus", default="/root/corpus/pybytes_holdout")
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--prompt_len", type=int, default=256)
    ap.add_argument("--gen_tokens", type=int, default=48)
    ap.add_argument("--max_length", type=int, default=1024)
    ap.add_argument("--schemes", default=",".join(SCHEMES))
    ap.add_argument("--out", default="results/kv_scheme_probe.json")
    args = ap.parse_args()

    from block_transformer_tpu.config import get_config
    from block_transformer_tpu.models import block_transformer as bt
    from block_transformer_tpu.models import neox
    from block_transformer_tpu.inference import generate as gen
    from block_transformer_tpu.data.mmap_dataset import MMapIndexedDataset
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from decode_gate import load_params

    cfg = get_config("block_main_b4_5", vocab_size=512,
                     max_length=args.max_length)
    params, step = load_params(args.model_dir, cfg, 6e-4, 10000)
    print(f"[kv_scheme_probe] checkpoint step {step}")

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

    d = gen.preprocess_inputs(cfg, prompts)
    B, N, L = d["input_ids"].shape
    max_blocks = N + args.gen_tokens // L
    ids = jnp.asarray(d["input_ids"])
    att = jnp.asarray(d["attention_mask"])
    bam = jnp.asarray(d["block_attention_mask"])

    orig_layer_qkv = neox.layer_qkv

    def decode(scheme):
        k_cfg, v_cfg = SCHEMES[scheme]

        def patched(p, x, *, cfg, cos, sin, positions):
            q, k, v = orig_layer_qkv(p, x, cfg=cfg, cos=cos, sin=sin,
                                     positions=positions)
            if k_cfg is not None:
                k = fake_quant(k, *k_cfg)
            if v_cfg is not None:
                v = fake_quant(v, *v_cfg)
            return q, k, v

        neox.layer_qkv = patched
        try:
            # the jit cache key cannot see the monkeypatch - force retrace
            gen._generate_blocks_jit.clear_cache()
            res = gen.generate_blocks(params, cfg, ids, att, bam,
                                      max_blocks=max_blocks, greedy=True,
                                      kv_cache="bf16")
            jax.block_until_ready(res.tokens)
        finally:
            neox.layer_qkv = orig_layer_qkv
            gen._generate_blocks_jit.clear_cache()
        return np.asarray(res.tokens).reshape(B, -1)[:, N * L:max_blocks * L]

    # fp32 scorer (teacher-forced under the UNQUANTIZED model)
    pl_len = prompts.shape[1]

    @jax.jit
    def score(full_ids):
        Bs = full_ids.shape[0]
        Ns = full_ids.shape[1] // L
        rids = full_ids.reshape(Bs, Ns, L)
        out = bt.block_transformer_forward(
            params, cfg, rids, jnp.ones_like(rids),
            jnp.ones((Bs, Ns), jnp.int32))
        logits = out.logits.reshape(Bs, (Ns - 1) * L, -1)
        tgt = full_ids[:, L:]
        lp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
        tok_lp = jnp.take_along_axis(lp, tgt[:, :, None], -1)[..., 0]
        return tok_lp[:, pl_len - L:].mean()

    def fp32_lp(toks):
        full = np.concatenate([prompts, toks[:, :args.gen_tokens]], 1)
        return float(score(jnp.asarray(full, jnp.int32)))

    report = {"checkpoint_step": step, "batch": args.batch,
              "prompt_len": args.prompt_len, "gen_tokens": args.gen_tokens,
              "note": "fake-quant probe on CPU; deltas are comparable to "
                      "each other and to the decode_gate ordering, not "
                      "bit-exact with the real int4 cache path",
              "schemes": {}}
    toks_ref = None
    lp_ref = None
    for scheme in args.schemes.split(","):
        toks = decode(scheme)
        lp = fp32_lp(toks)
        if scheme == "bf16":
            toks_ref, lp_ref = toks, lp
            report["fp32_mean_logprob_ref"] = lp
            print(f"[kv_scheme_probe] bf16 ref lp {lp:.4f}", flush=True)
            continue
        assert lp_ref is not None, "run bf16 first (it is the reference)"
        delta = 100 * abs(lp - lp_ref) / abs(lp_ref)
        agree = float((toks == toks_ref).mean())
        report["schemes"][scheme] = {
            "fp32_mean_logprob": lp,
            "fp32_logprob_delta_pct": delta,
            "gate_0.5pct": "PASS" if delta <= 0.5 else "FAIL",
            "greedy_agreement": agree,
        }
        print(f"[kv_scheme_probe] {scheme}: lp {lp:.4f} ({delta:+.3f}%) "
              f"{'PASS' if delta <= 0.5 else 'FAIL'} [agree {agree:.3f}]",
              flush=True)
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(report, f, indent=1)

    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(f"[kv_scheme_probe] wrote {args.out}")


if __name__ == "__main__":
    main()
