"""Precision-matched vanilla baseline (VERDICT r4 item 1).

The reference's benchmark protocol runs block and vanilla under ONE
precision (measure_generation_time.py:164-204): these tests pin the
vanilla stack's quantized path — INT8 weights via quantize_model_params
and an int8 QuantKVCache through vanilla_prefill/vanilla_decode_step —
so bench.py's --vanilla_quantize/--vanilla_kv rows measure a working
configuration, and the HBM model prices it (quantizing the vanilla KV
cache must raise its feasible batch: the cache is its HBM bound).
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from block_transformer_tpu.config import get_vanilla_config
from block_transformer_tpu.models import neox, vanilla
from block_transformer_tpu.ops import quant
from block_transformer_tpu.utils import hbm


def _tiny_cfg():
    return dataclasses.replace(
        get_vanilla_config("vanilla_31"), num_layers=2, hidden_size=64,
        intermediate_size=256, num_heads=4, vocab_size=512,
        max_position_embeddings=128)


def _greedy_generate(params, cfg, ids, kv_kind, decode):
    B, P = ids.shape
    cache = neox.make_kv_cache(cfg, B, P + decode, kv_kind,
                               dtype=jnp.bfloat16)
    logits, cache = vanilla.vanilla_prefill(params, cfg, ids, cache)
    tok = jnp.argmax(logits, -1).astype(jnp.int32)
    out = [tok]
    for _ in range(decode - 1):
        logits, cache = vanilla.vanilla_decode_step(params, cfg, tok, cache)
        tok = jnp.argmax(logits, -1).astype(jnp.int32)
        out.append(tok)
    return np.asarray(jnp.stack(out, axis=1))


def test_vanilla_int8_weights_int8_kv_close_to_bf16():
    cfg = _tiny_cfg()
    params = vanilla.init_vanilla_params(jax.random.PRNGKey(0), cfg,
                                         dtype=jnp.bfloat16)
    qp = quant.quantize_model_params(params, bits=8)
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(1, 500, (2, 16)), jnp.int32)

    cache_f = neox.make_kv_cache(cfg, 2, 24, "bf16", dtype=jnp.bfloat16)
    lf, _ = vanilla.vanilla_prefill(params, cfg, ids, cache_f)
    cache_q = neox.make_kv_cache(cfg, 2, 24, "int8", dtype=jnp.bfloat16)
    lq, _ = vanilla.vanilla_prefill(qp, cfg, ids, cache_q)
    # prefill logits should agree to quantization noise (random init,
    # tiny model: ~1e-2 logit scale)
    assert float(jnp.max(jnp.abs(lf - lq))) < 0.05

    # greedy decode runs end-to-end and mostly matches the bf16 path
    toks_f = _greedy_generate(params, cfg, ids, "bf16", 8)
    toks_q = _greedy_generate(qp, cfg, ids, "int8", 8)
    assert toks_f.shape == toks_q.shape == (2, 8)
    assert (toks_f == toks_q).mean() >= 0.75


def test_vanilla_quantized_hbm_raises_feasible_batch():
    cfg = get_vanilla_config("vanilla_410")
    limit = 16 * 2 ** 30

    def auto(quantize, kv):
        return hbm.auto_batch(
            lambda b: hbm.vanilla_model_bytes(cfg, b, 2048, 128,
                                              kv_cache=kv,
                                              quantize=quantize),
            limit=limit, margin=0.4)

    b_bf16 = auto(None, "bf16")
    b_int8 = auto("int8", "int8")
    assert b_int8 > b_bf16, (b_bf16, b_int8)
    # the int8 estimate at the bf16-chosen batch must be smaller
    assert (hbm.vanilla_model_bytes(cfg, b_bf16, 2048, 128,
                                    kv_cache="int8", quantize="int8")
            < hbm.vanilla_model_bytes(cfg, b_bf16, 2048, 128))
