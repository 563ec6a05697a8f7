"""Quantization tests: INT8/INT4 round-trips, the Pallas fused dequant
matmul vs its XLA-exact reference (interpret mode on CPU), and end-to-end
quantized model quality (logits close to fp32 at tiny scale)."""

import numpy as np
import jax
import jax.numpy as jnp

from block_transformer_tpu.ops import dequant_matmul, linear, quant


def test_int8_roundtrip():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((64, 48)), jnp.float32)
    w_q, scale = quant.quantize_int8(w)
    back = quant.dequantize_int8(w_q, scale, jnp.float32)
    err = np.abs(np.asarray(back) - np.asarray(w)).max()
    assert err <= float(scale.max()) * 0.51, err  # half-ULP of the grid


def test_int4_roundtrip():
    rng = np.random.default_rng(1)
    w = jnp.asarray(rng.standard_normal((64, 48)), jnp.float32)
    packed, scale = quant.quantize_int4(w)
    assert packed.shape == (32, 48)
    back = quant.dequantize_int4(packed, scale, jnp.float32)
    err = np.abs(np.asarray(back) - np.asarray(w)).max()
    assert err <= float(scale.max()) * 0.51, err


def test_int4_unpack_exact():
    rng = np.random.default_rng(2)
    q = rng.integers(-7, 8, size=(16, 8)).astype(np.int8)
    # split-half packing: byte row i = (row i, row i + K/2)
    lo = q[:8].astype(np.uint8) & 0xF
    hi = (q[8:].astype(np.uint8) & 0xF) << 4
    packed = jnp.asarray((lo | hi).astype(np.int8))
    np.testing.assert_array_equal(np.asarray(quant.unpack_int4(packed)), q)


def test_pallas_int8_matmul_interpret():
    rng = np.random.default_rng(3)
    for (M, K, N) in [(8, 128, 128), (3, 200, 130), (256, 512, 384)]:
        x = jnp.asarray(rng.standard_normal((M, K)), jnp.float32)
        w = jnp.asarray(rng.standard_normal((K, N)), jnp.float32)
        w_q, scale = quant.quantize_int8(w)
        want = np.asarray(
            (jnp.dot(x, w_q.astype(x.dtype)) * scale).astype(x.dtype))
        got = np.asarray(dequant_matmul.int8_matmul(x, w_q, scale,
                                                    interpret=True))
        np.testing.assert_allclose(got, want, atol=1e-3, rtol=1e-3)


def test_apply_linear_dispatch():
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((5, 32)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((32, 16)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((16,)), jnp.float32)
    fp = linear.apply_linear(x, {"kernel": w, "bias": b})
    q8 = linear.apply_linear(x, quant.quantize_linear({"kernel": w, "bias": b}, 8),
                             use_pallas=False)
    q4 = linear.apply_linear(x, quant.quantize_linear({"kernel": w, "bias": b}, 4))
    assert np.abs(np.asarray(fp) - np.asarray(q8)).max() < 0.15
    assert np.abs(np.asarray(fp) - np.asarray(q4)).max() < 2.5


def test_quantized_model_close_to_fp():
    from tests.test_block_parity import make_cfg, make_inputs
    from block_transformer_tpu.models import block_transformer as bt

    cfg = make_cfg()
    params = bt.init_block_transformer_params(jax.random.PRNGKey(0), cfg)
    qparams = quant.quantize_block_transformer(params, bits=8)
    ids, att, bam = make_inputs()
    out_fp = bt.block_transformer_forward(params, cfg, jnp.asarray(ids),
                                          jnp.asarray(att), jnp.asarray(bam))
    out_q = bt.block_transformer_forward(qparams, cfg, jnp.asarray(ids),
                                         jnp.asarray(att), jnp.asarray(bam))
    lp_fp = jax.nn.log_softmax(out_fp.logits, -1)
    lp_q = jax.nn.log_softmax(out_q.logits, -1)
    sel = (att[:, 1:, :] * bam[:, 1:, None]).astype(bool)
    # token-level agreement: quantized argmax matches fp argmax mostly
    agree = (np.asarray(lp_fp.argmax(-1)) == np.asarray(lp_q.argmax(-1)))[sel]
    assert agree.mean() > 0.9, agree.mean()


def test_quantized_generation_end_to_end():
    """INT8-quantized params must run the full two-level decode engine."""
    from tests.test_block_parity import make_cfg, VOCAB
    from block_transformer_tpu.models import block_transformer as bt
    from block_transformer_tpu.inference import generate as gen

    cfg = make_cfg()
    params = bt.init_block_transformer_params(jax.random.PRNGKey(0), cfg)
    qparams = quant.quantize_block_transformer(params, bits=8)
    rng = np.random.default_rng(0)
    prompt = rng.integers(1, VOCAB, size=(1, 8))
    out_fp = gen.generate(params, cfg, prompt, max_length=20)
    out_q = gen.generate(qparams, cfg, prompt, max_length=20)
    assert out_q.shape == out_fp.shape
    # prompts preserved; generated tokens valid ids
    np.testing.assert_array_equal(out_q[:, :8], prompt)
    assert (out_q >= 0).all() and (out_q < VOCAB).all()


def test_int8_kv_cache_generation_close():
    """INT8 global KV cache decode must track the bf16-cache decode."""
    from tests.test_block_parity import make_cfg, VOCAB
    from block_transformer_tpu.models import block_transformer as bt
    from block_transformer_tpu.inference import generate as gen
    import jax.numpy as jnp

    cfg = make_cfg()
    params = bt.init_block_transformer_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    ids = rng.integers(1, VOCAB, size=(2, 4, 4))
    att = np.ones_like(ids)
    bam = att.any(-1).astype(np.int64)
    args = (jnp.asarray(ids), jnp.asarray(att), jnp.asarray(bam))
    ref = gen.generate_blocks(params, cfg, *args, max_blocks=7)
    q = gen.generate_blocks(params, cfg, *args, max_blocks=7, kv_cache="int8")
    a, b = np.asarray(ref.tokens), np.asarray(q.tokens)
    # random-init logits are near-uniform so argmax can flip under tiny
    # perturbations; require the prompt region exact and outputs valid
    np.testing.assert_array_equal(a[:, :4], b[:, :4])
    assert (b >= 0).all() and (b < VOCAB).all()
    # and the first generated block should mostly agree
    agree = (a[:, 4] == b[:, 4]).mean()
    assert agree >= 0.5, agree


def test_int4_model_forward():
    """INT4 weight-only quantized composite forward stays sane."""
    from tests.test_block_parity import make_cfg, make_inputs
    from block_transformer_tpu.models import block_transformer as bt

    cfg = make_cfg()
    params = bt.init_block_transformer_params(jax.random.PRNGKey(0), cfg)
    q4 = quant.quantize_block_transformer(params, bits=4)
    ids, att, bam = make_inputs()
    out_fp = bt.block_transformer_forward(params, cfg, jnp.asarray(ids),
                                          jnp.asarray(att), jnp.asarray(bam))
    out_q = bt.block_transformer_forward(q4, cfg, jnp.asarray(ids),
                                         jnp.asarray(att), jnp.asarray(bam))
    assert np.isfinite(np.asarray(out_q.logits)).all()
    # int4 is lossy but should preserve coarse token ranking on most slots
    sel = (att[:, 1:, :] * bam[:, 1:, None]).astype(bool)
    agree = (np.asarray(out_fp.logits.argmax(-1)) ==
             np.asarray(out_q.logits.argmax(-1)))[sel]
    assert agree.mean() > 0.5, agree.mean()


def test_w8a8_dot_close_to_fp():
    # dynamic per-row activation quant (~7 effective bits) on top of
    # per-channel int8 weights: output must track the fp product closely
    key = jax.random.PRNGKey(11)
    x = jax.random.normal(key, (64, 256), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(12), (256, 128), jnp.float32)
    w_q, s = quant.quantize_int8(w)
    ref = x @ (np.asarray(w_q, np.float32) * np.asarray(s))
    out = np.asarray(linear._w8a8_dot(x, w_q, s), np.float32)
    rel = np.linalg.norm(out - ref) / np.linalg.norm(ref)
    assert rel < 0.02, rel
    # rows with wildly different magnitudes each get their own scale
    x2 = x * jnp.concatenate([jnp.full((32, 1), 100.0), jnp.full((32, 1), 0.01)])
    ref2 = np.asarray(x2) @ (np.asarray(w_q, np.float32) * np.asarray(s))
    out2 = np.asarray(linear._w8a8_dot(x2, w_q, s), np.float32)
    rel2 = np.linalg.norm(out2 - ref2) / np.linalg.norm(ref2)
    assert rel2 < 0.02, rel2


def test_w8a8_gate_off_cpu():
    # the W8A8 dispatch only ever engages on TPU
    assert not linear._use_w8a8(100000)


def test_int4_kv_cache_generation_runs():
    """INT4 global KV cache decode: runs end to end, valid tokens, prompt
    region exact (quality of int4 KV is measured in quality_run, not here)."""
    from tests.test_block_parity import make_cfg, VOCAB
    from block_transformer_tpu.models import block_transformer as bt
    from block_transformer_tpu.inference import generate as gen
    import jax.numpy as jnp

    cfg = make_cfg()
    params = bt.init_block_transformer_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    ids = rng.integers(1, VOCAB, size=(2, 4, 4))
    att = np.ones_like(ids)
    bam = att.any(-1).astype(np.int64)
    args = (jnp.asarray(ids), jnp.asarray(att), jnp.asarray(bam))
    q = gen.generate_blocks(params, cfg, *args, max_blocks=7, kv_cache="int4")
    b = np.asarray(q.tokens)           # [B, max_blocks, L]
    np.testing.assert_array_equal(ids, b[:, :4])
    assert (b >= 0).all() and (b < VOCAB).all()


def test_quantize_kv_int4_roundtrip():
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 4, 8, 16), jnp.float32)
    q, s = __import__("block_transformer_tpu.models.neox",
                      fromlist=["neox"]).quantize_kv(x, jnp.int4)
    assert q.dtype == jnp.int4
    back = np.asarray(q.astype(jnp.float32)) * np.asarray(s)[..., None]
    rel = np.abs(back - np.asarray(x)).max() / np.abs(np.asarray(x)).max()
    assert rel < 0.12, rel  # 4-bit symmetric: step = amax/7


def test_mixed_precision_quantization():
    """block INT8 + token INT4 + head INT8 (bench --quantize mixed48)."""
    from tests.test_block_parity import make_cfg, make_inputs
    from block_transformer_tpu.models import block_transformer as bt

    cfg = make_cfg()
    params = bt.init_block_transformer_params(jax.random.PRNGKey(0), cfg)
    q = quant.quantize_block_transformer(params, bits=8,
                                         token_decoder_bits=4,
                                         lm_head_bits=8, group_size=8)
    assert "kernel_q8" in q["block_decoder"]["layers"]["attn"]["qkv"]
    assert "kernel_q4" in q["token_decoder"]["layers"]["attn"]["qkv"]
    assert "kernel_q8" in q["token_decoder"]["embed_out"]
    ids, att, bam = make_inputs()
    ref = bt.block_transformer_forward(params, cfg, ids, att, bam)
    out = bt.block_transformer_forward(q, cfg, ids, att, bam)
    a = np.asarray(ref.logits, np.float32)
    b = np.asarray(out.logits, np.float32)
    # int4 token decoder dominates the error; logits must stay correlated
    corr = np.corrcoef(a.ravel(), b.ravel())[0, 1]
    assert corr > 0.98, corr


def test_vanilla_decode_quantized_kv():
    """The vanilla family serves from int8/int4 KV caches through the same
    neox_stack dispatch as the block model (reference parity: vanilla
    pretrain/serve is a first-class family, not a baseline-only stub)."""
    from block_transformer_tpu.config import NeoXConfig
    from block_transformer_tpu.models import vanilla, neox

    cfg = NeoXConfig(vocab_size=128, hidden_size=64, num_layers=2,
                     num_heads=2, intermediate_size=128,
                     max_position_embeddings=64)
    params = vanilla.init_vanilla_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(1, 127, size=(2, 8)), jnp.int32)

    outs = {}
    for kind in ("bf16", "int8", "int4"):
        cache = neox.make_kv_cache(cfg, 2, 24, kind, dtype=jnp.float32)
        logits, cache = vanilla.vanilla_prefill(params, cfg, ids, cache)
        toks = [jnp.argmax(logits, -1)]
        for _ in range(4):
            logits, cache = vanilla.vanilla_decode_step(params, cfg,
                                                        toks[-1], cache)
            toks.append(jnp.argmax(logits, -1))
        outs[kind] = np.stack([np.asarray(t) for t in toks])
    np.testing.assert_array_equal(outs["bf16"].shape, outs["int8"].shape)
    # int8 KV tracks bf16 closely at this scale; int4 must at least run
    # and emit valid ids
    agree8 = (outs["bf16"] == outs["int8"]).mean()
    assert agree8 >= 0.6, agree8
    assert (outs["int4"] >= 0).all() and (outs["int4"] < 128).all()


def test_pallas_allowed_contexts():
    """Pallas dispatch gating: on by default, off inside pallas_disabled()
    and under a GSPMD mesh scope (no partitioning rule for pallas_call),
    back ON inside a shard_map body (Manual axes = per-shard lowering)."""
    from jax.sharding import PartitionSpec as P

    assert linear.pallas_allowed()
    with linear.pallas_disabled():
        assert not linear.pallas_allowed()
    assert linear.pallas_allowed()

    mesh = jax.make_mesh((2, 4), ("data", "model"))
    with jax.sharding.set_mesh(mesh):
        assert not linear.pallas_allowed()

    seen = []

    def body(x):
        seen.append(linear.pallas_allowed())
        return x

    jax.jit(jax.shard_map(body, mesh=mesh, in_specs=P("data"),
                          out_specs=P("data")))(jnp.ones((8, 4)))
    assert seen and seen[0] is True
