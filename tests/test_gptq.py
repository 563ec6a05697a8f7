"""GPTQ error-compensated rounding (ops/gptq.py).

The contract: (1) same packed format as RTN (split-half nibbles,
contiguous group scales) so the fused kernel is untouched; (2) lower
layer-output error than RTN on correlated inputs — the reason it exists
(RTN INT4 fails the <=0.5% gate on sharp models, QUALITY.md round 3);
(3) the whole-model driver emits a tree the standard forward consumes,
with output closer to fp32 than the RTN tree.
"""

import numpy as np
import jax
import jax.numpy as jnp

from block_transformer_tpu.ops import gptq, quant


def _correlated_inputs(rng, M, K):
    """Inputs with a non-trivial covariance (what GPTQ exploits)."""
    base = rng.standard_normal((M, K // 4))
    mix = rng.standard_normal((K // 4, K))
    return (base @ mix + 0.1 * rng.standard_normal((M, K))).astype(np.float32)


def test_gptq_round_beats_rtn():
    rng = np.random.default_rng(0)
    K, N, M = 256, 128, 2048
    W = rng.standard_normal((K, N)).astype(np.float32)
    X = _correlated_inputs(rng, M, K)
    H = (X.T @ X).astype(np.float64)

    Q, scale = gptq.gptq_round(W, H, bits=4, group_size=128)
    W_gptq = Q * np.repeat(scale, K // scale.shape[0], axis=0)

    packed_rtn, scale_rtn = quant.quantize_int4(jnp.asarray(W), group_size=128)
    W_rtn = np.asarray(quant.dequantize_int4(packed_rtn, scale_rtn,
                                             jnp.float32))

    err_gptq = np.linalg.norm(X @ (W - W_gptq))
    err_rtn = np.linalg.norm(X @ (W - W_rtn))
    # on correlated inputs the compensated rounding must win clearly
    assert err_gptq < 0.9 * err_rtn, (err_gptq, err_rtn)


def test_gptq_pack_matches_kernel_format():
    rng = np.random.default_rng(1)
    K, N = 256, 128
    W = rng.standard_normal((K, N)).astype(np.float32)
    X = _correlated_inputs(rng, 512, K)
    H = (X.T @ X).astype(np.float64)
    leaf = gptq.gptq_quantize_linear_weight(W, H, bits=4, group_size=128)
    packed, scale = leaf["kernel_q4"], leaf["scale"]
    ref_packed, ref_scale = quant.quantize_int4(jnp.asarray(W), group_size=128)
    assert packed.shape == ref_packed.shape and packed.dtype == np.int8
    assert scale.shape == np.asarray(ref_scale).shape
    # unpack through the production path: values on the int4 grid
    vals = np.asarray(quant.unpack_int4(jnp.asarray(packed)))
    assert vals.min() >= -7 and vals.max() <= 7
    # dequant through the production path reproduces Q * scale
    deq = np.asarray(quant.dequantize_int4(jnp.asarray(packed),
                                           jnp.asarray(scale), jnp.float32))
    G = scale.shape[0]
    manual = vals * np.repeat(scale, K // G, axis=0)
    np.testing.assert_allclose(deq, manual, rtol=1e-5, atol=1e-5)


def test_gptq_int8_per_channel():
    rng = np.random.default_rng(2)
    K, N = 128, 64
    W = rng.standard_normal((K, N)).astype(np.float32)
    X = _correlated_inputs(rng, 512, K)
    H = (X.T @ X).astype(np.float64)
    Q, scale = gptq.gptq_round(W, H, bits=8)
    assert scale.shape == (N,)
    assert Q.min() >= -127 and Q.max() <= 127
    err_gptq = np.linalg.norm(X @ (W - Q * scale))
    wq_rtn, s_rtn = quant.quantize_int8(jnp.asarray(W))
    W_rtn = np.asarray(wq_rtn, np.float32) * np.asarray(s_rtn)
    err_rtn = np.linalg.norm(X @ (W - W_rtn))
    assert err_gptq <= err_rtn * 1.001, (err_gptq, err_rtn)


def test_gptq_model_pipeline():
    """Whole-model driver: tree is consumable by the standard forward and
    tracks the fp32 logits closer than the RTN tree."""
    from tests.test_block_parity import make_cfg, VOCAB, L
    from block_transformer_tpu.models import block_transformer as bt

    cfg = make_cfg()
    params = bt.init_block_transformer_params(jax.random.PRNGKey(7), cfg)
    rng = np.random.default_rng(7)
    B, N = 2, 6

    def batch(seed):
        r = np.random.default_rng(seed)
        ids = r.integers(1, VOCAB, size=(B, N, L))
        att = np.ones_like(ids)
        bam = att.any(-1).astype(np.int64)
        return ids, att, bam

    calib = [batch(s) for s in range(4)]
    q_tree = gptq.gptq_quantize_block_transformer(
        params, cfg, calib, bits=4, group_size=128)
    rtn_tree = quant.quantize_block_transformer(params, bits=4,
                                                group_size=128)

    ids, att, bam = batch(99)   # held-out batch
    args = (jnp.asarray(ids), jnp.asarray(att), jnp.asarray(bam))
    ref = bt.block_transformer_forward(params, cfg, *args).logits
    out_gptq = bt.block_transformer_forward(q_tree, cfg, *args).logits
    out_rtn = bt.block_transformer_forward(rtn_tree, cfg, *args).logits

    mse_gptq = float(jnp.mean(jnp.square(out_gptq - ref)))
    mse_rtn = float(jnp.mean(jnp.square(out_rtn - ref)))
    assert np.isfinite(mse_gptq)
    assert mse_gptq < mse_rtn, (mse_gptq, mse_rtn)


def test_gptq_mixed_bits_and_skip_head():
    from tests.test_block_parity import make_cfg, VOCAB, L
    from block_transformer_tpu.models import block_transformer as bt

    cfg = make_cfg()
    params = bt.init_block_transformer_params(jax.random.PRNGKey(8), cfg)
    rng = np.random.default_rng(8)
    ids = rng.integers(1, VOCAB, size=(2, 5, L))
    att = np.ones_like(ids)
    bam = att.any(-1).astype(np.int64)
    calib = [(ids, att, bam)]

    tree = gptq.gptq_quantize_block_transformer(
        params, cfg, calib, bits=8, token_decoder_bits=4, lm_head_bits=8)
    assert "kernel_q8" in tree["block_decoder"]["layers"]["attn"]["qkv"]
    assert "kernel_q4" in tree["token_decoder"]["layers"]["attn"]["qkv"]
    assert "kernel_q8" in tree["token_decoder"]["embed_out"]

    tree2 = gptq.gptq_quantize_block_transformer(
        params, cfg, calib, bits=4, skip_lm_head=True)
    assert "kernel" in tree2["token_decoder"]["embed_out"]

    args = (jnp.asarray(ids), jnp.asarray(att), jnp.asarray(bam))
    out = bt.block_transformer_forward(tree, cfg, *args).logits
    assert np.isfinite(float(jnp.mean(out)))
