"""The bench two-level decomposition instrument (bench.py) must run for
every KV-cache kind — it broke once when a scalar data dependence indexed
[0,0,0,0] on a 5-D cache leaf (int4 packs the head dim, bf16 is 5-D too).
Runs on the CPU backend at toy shapes; pins the instrument, not timings."""

import sys
import os

import jax.numpy as jnp
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
from block_transformer_tpu.config import make_block_config  # noqa: E402
from block_transformer_tpu.models import block_transformer as bt  # noqa: E402

import jax  # noqa: E402


@pytest.fixture(scope="module")
def small_setup():
    cfg = make_block_config("decomp", block_decoder_hidden=64,
                            block_decoder_layers=2, max_length=64)
    params = bt.init_block_transformer_params(jax.random.PRNGKey(0), cfg,
                                              dtype=jnp.float32)
    return cfg, params


@pytest.mark.parametrize("kv", ["bf16", "int8", "int4"])
def test_decomposition_runs_for_every_cache_kind(small_setup, kv):
    cfg, params = small_setup
    d = bench._two_level_decomposition(params, cfg, batch=2, prefill=32,
                                       decode=16, dtype=jnp.float32,
                                       kv_cache=kv, iters=2)
    assert d["token_decoder_ms_per_block_step"] > 0
    assert d["block_decoder_ms_per_block_step"] >= 0
