"""Round-2 kernel tests: stacked scalar-prefetch dequant matmuls, the
head-batched stacked int8-KV decode attention, and per-row cache writes.

The stacked forms consume full [L, ...] weight/cache arrays with the layer
chosen in the kernel index map (no materialized per-layer slice — see
ops/dequant_matmul.py docstring); these tests pin their numerics to the
XLA dequant references in interpret mode.
"""

import jax
import jax.numpy as jnp
import numpy as np

from block_transformer_tpu.ops import decode_attention as da
from block_transformer_tpu.ops import dequant_matmul as dm
from block_transformer_tpu.ops import masks, quant


def test_int8_matmul_stacked_matches_xla():
    rng = np.random.default_rng(0)
    L, M, K, N = 3, 8, 256, 128
    x = jnp.asarray(rng.standard_normal((M, K)), jnp.float32)
    w = jnp.asarray(rng.integers(-127, 127, (L, K, N)).astype(np.int8))
    s = jnp.asarray(rng.uniform(0.01, 0.1, (L, N)).astype(np.float32))
    for l in range(L):
        want = np.asarray((x @ w[l].astype(jnp.float32)) * s[l])
        got = np.asarray(dm.int8_matmul_stacked(x, w, s, l, interpret=True))
        np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_int4_matmul_stacked_matches_dequant():
    rng = np.random.default_rng(1)
    L, M, K, N = 3, 8, 256, 128
    x = jnp.asarray(rng.standard_normal((M, K)), jnp.float32)
    packs = [quant.quantize_int4(
        jnp.asarray(rng.standard_normal((K, N)), jnp.float32))
        for _ in range(L)]
    w_p = jnp.stack([p for p, _ in packs])
    s = jnp.stack([sc for _, sc in packs])
    for l in range(L):
        want = np.asarray(x @ quant.dequantize_int4(w_p[l], s[l], jnp.float32))
        got = np.asarray(dm.int4_matmul_stacked(x, w_p, s, l, interpret=True))
        np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_int4_matmul_stacked_groupwise_scales():
    """Group-wise scales (G > 1): kernel partial-product scaling must match
    the full dequant reference, including when bk must snap down to gs."""
    rng = np.random.default_rng(11)
    L, M, K, N = 2, 8, 512, 128          # gs=128 -> G=4, Kh=256
    x = jnp.asarray(rng.standard_normal((M, K)), jnp.float32)
    packs = [quant.quantize_int4(
        jnp.asarray(rng.standard_normal((K, N)), jnp.float32), group_size=128)
        for _ in range(L)]
    w_p = jnp.stack([p for p, _ in packs])
    s = jnp.stack([sc for _, sc in packs])
    assert s.shape == (L, 4, N)
    for l in range(L):
        want = np.asarray(x @ quant.dequantize_int4(w_p[l], s[l], jnp.float32))
        got = np.asarray(dm.int4_matmul_stacked(x, w_p, s, l, interpret=True))
        np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_int4_groupwise_quantization_more_accurate():
    """Group scales must strictly reduce reconstruction error on weights
    whose magnitude varies along K (the reason for the scheme)."""
    rng = np.random.default_rng(12)
    K, N = 512, 64
    mag = np.repeat(rng.uniform(0.1, 3.0, (K // 128, 1)), 128, 0)
    w = jnp.asarray(rng.standard_normal((K, N)) * mag, jnp.float32)
    p_pc, s_pc = quant.quantize_int4(w, group_size=0)       # per-channel
    p_gw, s_gw = quant.quantize_int4(w, group_size=128)
    err_pc = float(jnp.abs(quant.dequantize_int4(p_pc, s_pc, jnp.float32) - w).mean())
    err_gw = float(jnp.abs(quant.dequantize_int4(p_gw, s_gw, jnp.float32) - w).mean())
    assert err_gw < err_pc * 0.7, (err_gw, err_pc)


def test_int4_matmul_unaligned_padding_path():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((4, 100)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((100, 70)), jnp.float32)
    w_p, s = quant.quantize_int4(w)
    want = np.asarray(x @ quant.dequantize_int4(w_p, s, jnp.float32))
    got = np.asarray(dm.int4_matmul(x, w_p, s, interpret=True))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def _ref_attention(q, k, v, mask):
    D = q.shape[-1]
    s = jnp.einsum("bhsd,bhkd->bhsk", q, k) / (D ** 0.5) + mask.bias()
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhsk,bhkd->bhsd", p, v)


def test_decode_attention_stacked_matches_xla():
    rng = np.random.default_rng(3)
    L, B, H, D, K = 3, 2, 4, 32, 256
    kq = jnp.asarray(rng.integers(-127, 127, (L, B, H, K, D)).astype(np.int8))
    vq = jnp.asarray(rng.integers(-127, 127, (L, B, H, K, D)).astype(np.int8))
    ks = jnp.asarray(rng.uniform(0.005, 0.02, (L, B, H, K)).astype(np.float32))
    vs = jnp.asarray(rng.uniform(0.005, 0.02, (L, B, H, K)).astype(np.float32))
    for S, cache_len in [(1, 100), (4, 97)]:
        q = jnp.asarray(rng.standard_normal((B, H, S, D)), jnp.float32)
        kv_valid = jnp.asarray(
            (np.arange(K)[None] < cache_len).astype(np.int32).repeat(B, 0))
        mask = masks.decode_mask(jnp.int32(cache_len - S), K, S, kv_valid)
        for l in (0, L - 1):
            k = kq[l].astype(jnp.float32) * ks[l][..., None]
            v = vq[l].astype(jnp.float32) * vs[l][..., None]
            want = np.asarray(_ref_attention(q, k, v, mask))
            got = np.asarray(da.decode_attention_int8_stacked(
                q, kq, ks, vq, vs, l, mask, interpret=True))
            np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-4)


def test_write_kv_vector_offsets():
    from block_transformer_tpu.models import neox
    rng = np.random.default_rng(4)
    L, B, H, cap, D, S = 2, 3, 2, 16, 8, 4
    buf = jnp.zeros((L, B, H, cap, D), jnp.float32)
    new = jnp.asarray(rng.standard_normal((B, H, S, D)), jnp.float32)
    pos = jnp.asarray([0, 4, 9], jnp.int32)
    out = np.asarray(neox._write_kv(buf, new, 1, pos))
    for b in range(B):
        np.testing.assert_array_equal(
            out[1, b, :, int(pos[b]):int(pos[b]) + S], np.asarray(new[b]))
    assert np.all(out[0] == 0)
    # scales variant [L, B, H, cap]
    sbuf = jnp.zeros((L, B, H, cap), jnp.float32)
    snew = jnp.asarray(rng.standard_normal((B, H, S)), jnp.float32)
    sout = np.asarray(neox._write_kv(sbuf, snew, 0, pos))
    for b in range(B):
        np.testing.assert_array_equal(
            sout[0, b, :, int(pos[b]):int(pos[b]) + S], np.asarray(snew[b]))


def test_layer_view_matches_sliced_apply():
    """Stacked-view application == slicing the layer params by hand."""
    from block_transformer_tpu.models import neox
    from block_transformer_tpu.ops import linear as lin
    rng = np.random.default_rng(5)
    L, K, N = 3, 16, 8
    node = {"kernel": jnp.asarray(rng.standard_normal((L, K, N)), jnp.float32),
            "bias": jnp.asarray(rng.standard_normal((L, N)), jnp.float32)}
    layers = {"attn": {"qkv": node},
              "ln": {"scale": jnp.ones((L, K)), "bias": jnp.zeros((L, K))}}
    x = jnp.asarray(rng.standard_normal((2, K)), jnp.float32)
    for i in range(L):
        view = neox.layer_view(layers, jnp.int32(i))
        got = np.asarray(lin.apply_linear(x, view["attn"]["qkv"]))
        want = np.asarray(x @ node["kernel"][i] + node["bias"][i])
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
        np.testing.assert_array_equal(np.asarray(view["ln"]["scale"]),
                                      np.asarray(layers["ln"]["scale"][i]))


def test_quantized_stacked_view_int8_int4():
    from block_transformer_tpu.models import neox
    from block_transformer_tpu.ops import linear as lin
    rng = np.random.default_rng(6)
    L, K, N = 2, 32, 16
    kernels = jnp.asarray(rng.standard_normal((L, K, N)), jnp.float32)
    for bits in (8, 4):
        node = quant.quantize_linear({"kernel": kernels}, bits)
        layers = {"mlp": {"up": node}}
        x = jnp.asarray(rng.standard_normal((4, K)), jnp.float32)
        for i in range(L):
            view = neox.layer_view(layers, jnp.int32(i))
            got = np.asarray(lin.apply_linear(x, view["mlp"]["up"]))
            sliced = {k: v[i] for k, v in node.items()}
            want = np.asarray(lin.apply_linear(x, sliced))
            np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_decode_attention_stacked_bf16_matches_xla():
    rng = np.random.default_rng(7)
    L, B, H, D, K = 2, 2, 4, 32, 256
    k = jnp.asarray(rng.standard_normal((L, B, H, K, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((L, B, H, K, D)), jnp.float32)
    for S, cache_len in [(1, 60), (8, 64)]:
        q = jnp.asarray(rng.standard_normal((B, H, S, D)), jnp.float32)
        kv_valid = jnp.asarray(
            (np.arange(K)[None] < cache_len).astype(np.int32).repeat(B, 0))
        mask = masks.decode_mask(jnp.int32(cache_len - S), K, S, kv_valid)
        for l in (0, 1):
            want = np.asarray(_ref_attention(q, k[l], v[l], mask))
            got = np.asarray(da.decode_attention_stacked(
                q, k, v, l, mask, interpret=True))
            np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-4)


def test_int8_stacked_tile_snapping_n768():
    """bn/bk snap to divisors when defaults don't divide (e.g. N=768 QKV of
    a 256-hidden model) — the quality run's crash shape."""
    rng = np.random.default_rng(8)
    L, M, K, N = 2, 4, 256, 768
    x = jnp.asarray(rng.standard_normal((M, K)), jnp.float32)
    w = jnp.asarray(rng.integers(-127, 127, (L, K, N)).astype(np.int8))
    s = jnp.asarray(rng.uniform(0.01, 0.1, (L, N)).astype(np.float32))
    want = np.asarray((x @ w[1].astype(jnp.float32)) * s[1])
    got = np.asarray(dm.int8_matmul_stacked(x, w, s, 1, interpret=True))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)
    got4 = np.asarray(dm.int4_matmul_stacked(
        x, jnp.asarray(rng.integers(-100, 100, (L, K // 2, N)).astype(np.int8)),
        s, 0, interpret=True))
    assert got4.shape == (M, N)
