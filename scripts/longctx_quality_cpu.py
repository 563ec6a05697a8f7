"""Long-context evals on the trained 5M quality model (CPU).

Produces the first non-synthetic long-context artifacts of this repo:
  1. positionwise loss over 1024-token held-out chunks (block vs vanilla)
     — the reference's pg19 loss-by-position instrument
     (util/perplexity.py) run on real trained weights,
  2. the needle suite from the bundled haystack, scored with the byte
     tokenizer (the 5M byte model is far below needle capability — the
     artifact demonstrates the *pipeline* end to end on trained weights;
     accuracy is reported as measured).

Writes results/quality/longctx.json.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_platforms", "cpu")

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__))))
import quality_run as qr  # noqa: E402


def main():
    import jax.numpy as jnp
    from block_transformer_tpu.config import get_config, get_vanilla_config
    from block_transformer_tpu.eval import longctx
    from block_transformer_tpu.models import block_transformer as bt
    from block_transformer_tpu.models import vanilla as vmod
    from block_transformer_tpu.inference import generate as gen
    from block_transformer_tpu.train import optimizer as opt_mod
    from block_transformer_tpu.train import train_step as ts
    from block_transformer_tpu.utils import checkpoint as ckpt

    out_root = "results/quality"
    C = 1024
    cfg = get_config("block_main_b4_5", vocab_size=qr.VOCAB, max_length=C)
    vcfg = get_vanilla_config("vanilla_31", vocab_size=qr.VOCAB,
                              max_position_embeddings=C)

    def load(out_dir, tmpl_fn):
        step = ckpt.find_latest_checkpoint(out_dir)
        tmpl = jax.eval_shape(tmpl_fn)
        tx, _ = opt_mod.make_optimizer(peak_lr=6e-4, warmup_steps=150,
                                       total_steps=3000, weight_decay=0.1,
                                       b1=0.9, b2=0.95)
        st = ts.TrainState(params=tmpl, opt_state=jax.eval_shape(tx.init, tmpl),
                           step=jax.ShapeDtypeStruct((), jnp.int32))
        return ckpt.restore_checkpoint(out_dir, step, st).params

    bp = load(os.path.join(out_root, "block_main_b4_5"),
              lambda: bt.init_block_transformer_params(jax.random.PRNGKey(0),
                                                       cfg))
    vp = load(os.path.join(out_root, "vanilla_31"),
              lambda: vmod.init_vanilla_params(jax.random.PRNGKey(0), vcfg))

    hold = qr.load_corpus("/root/corpus/pybytes_holdout")
    docs = [np.asarray(hold.token_data[int(s):int(s) + int(l)])
            for s, l in zip(hold.document_indices, hold.document_lengths)
            if l >= C][:24]

    L = cfg.block_length

    @jax.jit
    def _block_fwd(ids, att, bam):
        return bt.block_transformer_forward(bp, cfg, ids, att, bam).logits

    def block_logits(chunk):
        d = gen.preprocess_inputs(cfg, chunk)   # host-side numpy reshape
        return _block_fwd(jnp.asarray(d["input_ids"]),
                          jnp.asarray(d["attention_mask"]),
                          jnp.asarray(d["block_attention_mask"]))

    @jax.jit
    def van_logits(chunk):
        return vmod.vanilla_forward(vp, vcfg, jnp.asarray(chunk),
                                    jnp.ones_like(chunk))

    blk_pos, n1 = longctx.loss_by_position_over_chunks(
        block_logits, docs, C, batch_size=4, block_length=L)
    van_pos, n2 = longctx.loss_by_position_over_chunks(
        van_logits, docs, C, batch_size=4)

    # needle: generation through the real decode engine at tiny scale
    hay = open("assets/needle_haystack.txt").read()

    class Tok(qr.ByteTokenizer):
        def decode(self, ids):
            return qr.tokens_to_text(ids)

    tok = Tok()
    samples = longctx.generate_needle_suite(hay, tok, context_length=C,
                                            depths=(0, 50, 100),
                                            n_templates=2, seed=3)
    gens = []
    for s in samples:
        ids = np.asarray(tok.encode(s["prompt"]), np.int32)[None]
        outg = gen.generate(bp, cfg, ids, max_length=ids.shape[1] + 12)
        gens.append(qr.tokens_to_text(np.asarray(outg[0, ids.shape[1]:])))
    needle = longctx.score_needle_results(samples, gens)

    res = {
        "context_length": C,
        "n_chunks": int(n1),
        "block_loss_first_64_mean": float(np.mean(blk_pos[:64])),
        "block_loss_last_64_mean": float(np.mean(blk_pos[-64:])),
        "vanilla_loss_first_64_mean": float(np.mean(van_pos[:64])),
        "vanilla_loss_last_64_mean": float(np.mean(van_pos[-64:])),
        "block_pos_loss_every_64": [float(x) for x in blk_pos[::64]],
        "vanilla_pos_loss_every_64": [float(x) for x in van_pos[::64]],
        "needle": needle,
    }
    with open(os.path.join(out_root, "longctx.json"), "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
