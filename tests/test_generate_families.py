"""Generation for the non-NeoX decoder families (VERDICT round-1 item 8).

Two properties pin correctness:

1. the universal re-run inner loop is token-exact vs the cached GPT-NeoX
   fast path on the main family (same math, different mechanism);
2. greedy generation is **self-consistent** with the teacher-forced
   composite forward for every family: re-scoring the generated sequence
   must reproduce each generated token as the argmax at its position
   (the reference establishes decode correctness the same way — its
   generate delegates to the HF forward).
"""

import numpy as np
import jax
import jax.numpy as jnp

from block_transformer_tpu.config import (BlockTransformerConfig,
                                          EmbedderConfig, NeoXConfig,
                                          TokenDecoderConfig)
from block_transformer_tpu.models import block_transformer as bt
from block_transformer_tpu.inference import generate as gen

V, H, L = 96, 64, 4


def _neox(layers=2):
    return NeoXConfig(vocab_size=V, hidden_size=H, num_layers=layers,
                      num_heads=4, intermediate_size=H * 4,
                      max_position_embeddings=64)


def _emb():
    return EmbedderConfig(vocab_size=V, hidden_size=H // L,
                          projection_hidden_size=H)


def test_rerun_inner_loop_matches_cached_fast_path():
    cfg = BlockTransformerConfig(
        block_length=L, embedder=_emb(), block_decoder=_neox(),
        token_decoder=TokenDecoderConfig(neox=_neox(), expansion_ratio=2))
    params = bt.init_block_transformer_params(jax.random.PRNGKey(0), cfg)
    be = jax.random.normal(jax.random.PRNGKey(1), (3, 1, H), jnp.float32)
    fast, alive_f = gen.decode_block_tokens(params, cfg, be, greedy=True)
    slow, alive_s = gen.decode_block_tokens_rerun(params, cfg, be, greedy=True)
    np.testing.assert_array_equal(np.asarray(fast), np.asarray(slow))
    np.testing.assert_array_equal(np.asarray(alive_f), np.asarray(alive_s))


def _selfconsistency_any_seed(cfg, seeds=(0, 1, 2, 3, 4), **kw):
    """Random tiny models sometimes greedy-emit EOS immediately (1/V per
    position); retry seeds until enough generated positions were checked."""
    last = None
    for s in seeds:
        try:
            return _selfconsistency(cfg, seed=s, **kw)
        except AssertionError as e:
            if "too few generated positions" not in str(e):
                raise
            last = e
    raise last


def _selfconsistency(cfg, seed=0, prompt_len=8, max_length=20):
    params = bt.init_block_transformer_params(jax.random.PRNGKey(seed), cfg)
    rng = np.random.default_rng(seed)
    prompt = rng.integers(2, V, size=(2, prompt_len))
    out = gen.generate(params, cfg, prompt, max_length=max_length,
                       greedy=True)
    B, T = out.shape
    assert T > prompt_len  # generated something (may stop early at EOS)
    # teacher-force the generated stream back through the composite forward
    d = gen.preprocess_inputs(cfg, out)
    fwd = bt.block_transformer_forward(
        params, cfg, jnp.asarray(d["input_ids"]),
        jnp.asarray(d["attention_mask"]),
        jnp.asarray(d["block_attention_mask"]), compute_logits=True)
    logits = np.asarray(fwd.logits)          # [B, N-1, L, V]
    ids = d["input_ids"]                     # [B, N, L]
    pad_blocks = (prompt_len + d["initial_block_padding"]) // L
    N = ids.shape[1]
    checked = 0
    for b in range(B):
        for i in range(pad_blocks, N - 1):
            for j in range(L):
                tok = ids[b, i + 1, j]
                if tok == cfg.eos_token_id:
                    break
                want = int(np.argmax(logits[b, i, j]))
                assert int(tok) == want, (b, i, j, int(tok), want)
                checked += 1
            else:
                continue
            break
    assert checked >= 4, f"too few generated positions checked: {checked}"


def test_generate_gpt_neo_family():
    cfg = BlockTransformerConfig(
        block_length=L, embedder=_emb(), block_decoder=_neox(),
        token_decoder=TokenDecoderConfig(neox=_neox(), expansion_ratio=2,
                                         cls="gpt-neo"),
        block_decoder_cls="gpt-neo", block_decoder_window=4)
    _selfconsistency_any_seed(cfg)


def test_generate_t5_cross_attention_family():
    cfg = BlockTransformerConfig(
        block_length=L, embedder=_emb(), block_decoder=_neox(),
        token_decoder=TokenDecoderConfig(neox=_neox(), expansion_ratio=None,
                                         expansion_method=None,
                                         decoding_strategy="cross_attention",
                                         cls="t5"))
    _selfconsistency_any_seed(cfg)


def test_generate_summation_strategy():
    cfg = BlockTransformerConfig(
        block_length=L, embedder=_emb(), block_decoder=_neox(),
        token_decoder=TokenDecoderConfig(neox=_neox(), expansion_ratio=None,
                                         expansion_method=None,
                                         decoding_strategy="summation"))
    _selfconsistency_any_seed(cfg)
