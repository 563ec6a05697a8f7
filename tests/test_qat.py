"""QAT fake-quant (ops/quant.fake_quant_*): grid exactness + STE grads.

The whole QAT contract is that the training-time fake-quant roundtrip
sits on EXACTLY the grid the deployment quantizer
(quantize_block_transformer with the same arguments) rounds onto —
otherwise the finetune optimizes against the wrong loss. These tests pin
that, plus the straight-through gradient property the finetune relies
on. Reference context: the reference has no quantization at all; QAT
targets BASELINE.json's <=0.5% clause where rounding-based methods
plateaued (QUALITY.md round 4).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from block_transformer_tpu.ops import quant


@pytest.mark.parametrize("shape", [(64, 48), (3, 64, 48)])
def test_fake_quant_int8_matches_real_roundtrip(shape):
    w = jax.random.normal(jax.random.PRNGKey(0), shape, jnp.float32)
    node = {"kernel": w}
    fq = quant.fake_quant_linear(node, bits=8)["kernel"]
    qn = quant.quantize_linear(node, bits=8)
    if w.ndim == 3:
        deq = jax.vmap(lambda q, s: quant.dequantize_int8(q, s, jnp.float32))(
            qn["kernel_q8"], qn["scale"])
    else:
        deq = quant.dequantize_int8(qn["kernel_q8"], qn["scale"], jnp.float32)
    np.testing.assert_allclose(np.asarray(fq), np.asarray(deq),
                               rtol=0, atol=1e-6)


@pytest.mark.parametrize("gs", [32, 128, 0])
def test_fake_quant_int4_matches_real_roundtrip(gs):
    w = jax.random.normal(jax.random.PRNGKey(1), (128, 40), jnp.float32)
    fq = quant.fake_quant_linear({"kernel": w}, bits=4,
                                 group_size=gs)["kernel"]
    qn = quant.quantize_linear({"kernel": w}, bits=4, group_size=gs)
    deq = quant.dequantize_int4(qn["kernel_q4"], qn["scale"], jnp.float32)
    np.testing.assert_allclose(np.asarray(fq), np.asarray(deq),
                               rtol=0, atol=1e-6)


def test_ste_gradient_is_identity():
    w = jax.random.normal(jax.random.PRNGKey(2), (32, 16), jnp.float32)
    cot = jax.random.normal(jax.random.PRNGKey(3), (32, 16), jnp.float32)

    def f(w):
        return jnp.sum(quant.fake_quant_linear({"kernel": w},
                                               bits=4)["kernel"] * cot)

    g = jax.grad(f)(w)
    np.testing.assert_allclose(np.asarray(g), np.asarray(cot), atol=1e-6)


def test_fake_quant_tree_mirrors_real_recipe_paths():
    """mixed48 fake-quant touches exactly the kernels the real mixed48
    quantizer converts, and the fake tree keeps the original structure."""
    from block_transformer_tpu.config import make_block_config
    from block_transformer_tpu.models import init_block_transformer_params

    cfg = make_block_config("t", block_decoder_hidden=64,
                            block_decoder_layers=2, max_length=32,
                            vocab_size=97)
    params = init_block_transformer_params(jax.random.PRNGKey(0), cfg)
    fq = quant.fake_quant_block_transformer(
        params, bits=8, token_decoder_bits=4, lm_head_bits=8, group_size=128)
    rq = quant.quantize_block_transformer(
        params, bits=8, token_decoder_bits=4, lm_head_bits=8, group_size=128)

    # identical treedef to the source params (fake-quant never repacks)
    assert (jax.tree.structure(fq) == jax.tree.structure(params))

    def kernels(node, path=()):
        out = {}
        if isinstance(node, dict):
            if "kernel" in node or any(k.startswith("kernel_q")
                                       for k in node):
                out[path] = node
            for k, v in node.items():
                out.update(kernels(v, path + (k,)))
        return out

    fqk, rqk = kernels(fq), kernels(rq)
    for path, rnode in rqk.items():
        quantized = any(k.startswith("kernel_q") for k in rnode)
        changed = not np.array_equal(
            np.asarray(fqk[path]["kernel"]),
            np.asarray(kernels(params)[path]["kernel"]))
        assert changed == quantized, (path, changed, quantized)
