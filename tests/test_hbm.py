"""Static HBM accounting (utils/hbm.py) — the TPU-native replacement for
the reference's try/except-OOM batch search (measure_generation_time.py:
252-372). Pins the quantize-aware weight model and the 2^k / 3*2^k
candidate search."""

import pytest

from block_transformer_tpu.config import get_config
from block_transformer_tpu.utils import hbm

GIB = 2 ** 30


def test_weight_bytes_modes():
    assert hbm.weight_bytes(None) == 2.0
    assert hbm.weight_bytes("none") == 2.0
    assert hbm.weight_bytes("int8") == 1.0
    assert hbm.weight_bytes("int4", group_size=32) == pytest.approx(0.625)
    with pytest.raises(ValueError):
        hbm.weight_bytes("int2")


def test_quantized_weights_shrink_estimate_monotonically():
    cfg = get_config("block_main_b4_1.2b")
    est = {q: hbm.block_model_bytes(cfg, 256, 2048, 128, kv_cache="int4",
                                    quantize=q)
           for q in (None, "int8", "mixed48", "int4")}
    # bf16 > int8 > mixed48 > int4 storage, activations/cache identical
    assert est[None] > est["int8"] > est["mixed48"] > est["int4"]
    # the 1.2B int8-weight saving is ~1.2 GiB vs bf16
    assert 1.0 * GIB < est[None] - est["int8"] < 1.5 * GIB


def test_auto_batch_considers_3x2k():
    # synthetic linear cost: 1 GiB per sample, 1000 GiB budget, 0.8 margin
    # -> best 2^k is 512, best 3*2^k is 768
    got = hbm.auto_batch(lambda b: b * GIB, limit=1000 * GIB)
    assert got == 768
    assert hbm.auto_batch(lambda b: b * GIB, limit=10 * GIB) == 6


def test_headline_auto_batch_is_384_at_int8w_int4kv():
    """The operating point the bench runs by default: int8 weights + int4
    global KV on a 15.75-GiB chip picks b384 (the INT8-KV-era pick was
    256; the accounting must claim the freed cache+weight bytes)."""
    cfg = get_config("block_main_b4_1.2b")
    lim = int(15.75 * GIB)

    def est(q, kv):
        return hbm.auto_batch(
            lambda b: hbm.block_model_bytes(cfg, b, 2048, 128,
                                            kv_cache=kv, quantize=q),
            limit=lim)

    assert est("int8", "int8") == 256
    assert est("int8", "int4") == 384
