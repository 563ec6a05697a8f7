"""Long-context instruments at the reference's 8192-token regime on a
non-toy checkpoint (VERDICT r4 item 6).

Runs on chip:
  1. positionwise loss over ``--context`` (default 8192) token chunks —
     the reference's PG19 loss-by-position instrument
     (/root/reference/util/perplexity.py:29-88, context_length default
     8192) — for the trained block checkpoint and (if ``--vanilla_dir``)
     its trained vanilla pairing;
  2. the needle-in-a-haystack suite at the same context with the
     reference's accuracy-by-depth output
     (/root/reference/needle/needle.py:117-141): per-depth retrieval
     accuracy over the full 0..100% grid.

The checkpoints here are byte-level models trained at 1024 tokens, so
8192 is an 8x position extrapolation (the reference's own 8192 runs are
4x over its 2048-token training length) — the loss-by-position curve IS
the instrument for how the architecture degrades there, and needle
accuracy is reported as measured.

  python scripts/longctx_85m.py --model block_main_b4_85 \
      --model_dir results/scale85/block_main_b4_85 --steps 5000 --lr 3e-4 \
      --vanilla vanilla_70 --vanilla_dir results/scale85/vanilla_70 \
      --context 8192 --out results/longctx_85m.json
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def load_ckpt_params(model_dir, tmpl_fn, lr, steps):
    import jax
    import jax.numpy as jnp
    from block_transformer_tpu.train import optimizer as opt_mod
    from block_transformer_tpu.train import train_step as ts
    from block_transformer_tpu.utils import checkpoint as ckpt
    step = ckpt.find_latest_checkpoint(model_dir)
    assert step, f"no checkpoint in {model_dir}"
    tmpl = jax.eval_shape(tmpl_fn)
    tx, _ = opt_mod.make_optimizer(peak_lr=lr,
                                   warmup_steps=max(100, steps // 20),
                                   total_steps=steps, weight_decay=0.1,
                                   b1=0.9, b2=0.95)
    st = ts.TrainState(params=tmpl, opt_state=jax.eval_shape(tx.init, tmpl),
                       step=jax.ShapeDtypeStruct((), jnp.int32))
    params = jax.tree.map(jnp.asarray,
                          ckpt.restore_checkpoint(model_dir, step, st).params)
    return params, step


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="block_main_b4_85")
    ap.add_argument("--model_dir", default="results/scale85/block_main_b4_85")
    ap.add_argument("--steps", type=int, default=5000)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--vanilla", default=None,
                    help="vanilla pairing config name (e.g. vanilla_70)")
    ap.add_argument("--vanilla_dir", default=None)
    ap.add_argument("--vanilla_steps", type=int, default=2500)
    ap.add_argument("--vanilla_lr", type=float, default=3e-4)
    ap.add_argument("--context", type=int, default=8192)
    ap.add_argument("--batch_size", type=int, default=2)
    ap.add_argument("--corpus", default="/root/corpus/pybytes_holdout")
    ap.add_argument("--max_docs", type=int, default=16)
    ap.add_argument("--depths", default="0,10,20,30,40,50,60,70,80,90,100")
    ap.add_argument("--needle_templates", type=int, default=2)
    ap.add_argument("--haystack", default="assets/needle_haystack.txt")
    ap.add_argument("--skip_needle", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--out", default="results/longctx_85m.json")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "quality_run", os.path.join(os.path.dirname(
            os.path.abspath(__file__)), "quality_run.py"))
    qr = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(qr)

    from block_transformer_tpu.config import get_config, get_vanilla_config
    from block_transformer_tpu.eval import longctx
    from block_transformer_tpu.inference import generate as gen
    from block_transformer_tpu.models import block_transformer as bt

    C = args.context
    cfg = get_config(args.model, vocab_size=qr.VOCAB, max_length=C)
    bp, bstep = load_ckpt_params(
        args.model_dir,
        lambda: bt.init_block_transformer_params(jax.random.PRNGKey(0), cfg),
        args.lr, args.steps)
    bp = jax.tree.map(lambda x: x.astype(jnp.bfloat16), bp)
    print(f"[longctx] block checkpoint step {bstep}")

    hold = qr.load_corpus(args.corpus)
    docs = [np.asarray(hold.token_data[int(s):int(s) + int(l)])
            for s, l in zip(hold.document_indices, hold.document_lengths)
            if l >= C + 1][:args.max_docs]
    # byte docs shorter than 8k+1 are common; concatenate the tail to
    # synthesize book-length streams if the per-doc filter found too few
    # (the reference concatenates PG19 books the same way per window)
    if len(docs) < 4:
        all_tok = np.concatenate(
            [np.asarray(hold.token_data[int(s):int(s) + int(l)])
             for s, l in zip(hold.document_indices, hold.document_lengths)])
        n = len(all_tok) // (C + 1)
        docs = [all_tok[i * (C + 1):(i + 1) * (C + 1)]
                for i in range(min(n, args.max_docs))]
    print(f"[longctx] {len(docs)} docs of >= {C + 1} tokens")

    L = cfg.block_length
    res = {"context_length": C, "model": args.model,
           "checkpoint_step": int(bstep), "trained_length": 1024,
           "extrapolation_factor": C / 1024}

    t0 = time.time()

    @jax.jit
    def _block_fwd(ids, att, bam):
        return bt.block_transformer_forward(bp, cfg, ids, att, bam).logits

    def block_logits(chunk):
        d = gen.preprocess_inputs(cfg, chunk)
        return _block_fwd(jnp.asarray(d["input_ids"]),
                          jnp.asarray(d["attention_mask"]),
                          jnp.asarray(d["block_attention_mask"]))

    blk_pos, n1 = longctx.loss_by_position_over_chunks(
        block_logits, docs, C, batch_size=args.batch_size, block_length=L)
    res["n_chunks"] = int(n1)
    res["block_pos_loss_every_256"] = [float(x) for x in blk_pos[::256]]
    res["block_loss_first_256_mean"] = float(np.mean(blk_pos[:256]))
    res["block_loss_last_256_mean"] = float(np.mean(blk_pos[-256:]))
    # in-trained-range vs extrapolated halves
    res["block_loss_first_1024_mean"] = float(np.mean(blk_pos[:1024]))
    res["block_loss_beyond_1024_mean"] = float(np.mean(blk_pos[1024:]))
    print(f"[longctx] block positionwise done in {time.time()-t0:.0f}s: "
          f"first256 {res['block_loss_first_256_mean']:.4f} "
          f"last256 {res['block_loss_last_256_mean']:.4f}")

    if args.vanilla and args.vanilla_dir:
        from block_transformer_tpu.models import vanilla as vmod
        vcfg = get_vanilla_config(args.vanilla, vocab_size=qr.VOCAB,
                                  max_position_embeddings=C)
        vp, vstep = load_ckpt_params(
            args.vanilla_dir,
            lambda: vmod.init_vanilla_params(jax.random.PRNGKey(0), vcfg),
            args.vanilla_lr, args.vanilla_steps)
        vp = jax.tree.map(lambda x: x.astype(jnp.bfloat16), vp)
        print(f"[longctx] vanilla checkpoint step {vstep}")

        @jax.jit
        def van_logits(chunk):
            # remat per layer bounds the [B, H, C, C] score transient
            return vmod.vanilla_forward(vp, vcfg, jnp.asarray(chunk),
                                        jnp.ones_like(chunk), remat=True)

        t0 = time.time()
        van_pos, _ = longctx.loss_by_position_over_chunks(
            van_logits, docs, C, batch_size=1)
        res["vanilla"] = args.vanilla
        res["vanilla_checkpoint_step"] = int(vstep)
        res["vanilla_pos_loss_every_256"] = [float(x) for x in van_pos[::256]]
        res["vanilla_loss_first_256_mean"] = float(np.mean(van_pos[:256]))
        res["vanilla_loss_last_256_mean"] = float(np.mean(van_pos[-256:]))
        res["vanilla_loss_first_1024_mean"] = float(np.mean(van_pos[:1024]))
        res["vanilla_loss_beyond_1024_mean"] = float(np.mean(van_pos[1024:]))
        print(f"[longctx] vanilla positionwise done in {time.time()-t0:.0f}s")

    if not args.skip_needle:
        hay = open(args.haystack).read()

        class Tok(qr.ByteTokenizer):
            def decode(self, ids):
                return qr.tokens_to_text(ids)

        tok = Tok()
        depths = [float(d) for d in args.depths.split(",")]
        samples = longctx.generate_needle_suite(
            hay, tok, context_length=C, depths=depths,
            n_templates=args.needle_templates, seed=3)
        t0 = time.time()
        gens = []
        for s in samples:
            ids = np.asarray(tok.encode(s["prompt"]), np.int32)[None]
            outg = gen.generate(bp, cfg, ids, max_length=ids.shape[1] + 16)
            gens.append(qr.tokens_to_text(np.asarray(outg[0, ids.shape[1]:])))
        res["needle_accuracy_by_depth"] = longctx.score_needle_results(
            samples, gens)
        res["needle_samples"] = len(samples)
        print(f"[longctx] needle done in {time.time()-t0:.0f}s: "
              f"{res['needle_accuracy_by_depth']}")

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(res, f, indent=1)
    print(f"[longctx] -> {args.out}")


if __name__ == "__main__":
    main()
