"""Fresh-KV single-pass prefill vs the streaming chunked prefill.

The fresh path (models/neox.neox_prefill_fresh, BT_FRESH_PREFILL=1
default) computes prompt attention from the just-computed bf16 K/V and
only *writes* the quantized cache; the streaming path attends to the
(de)quantized cache chunk by chunk. With a bf16 cache the two are the
same math (cache write+read of bf16 K/V is value-preserving), so greedy
decode must agree token-for-token. With int8/int4 caches the fresh path
attends to *unquantized* prompt K/V — strictly less prefill quantization
error — so we check agreement of the decode trajectory and closeness of
the first-block embeddings instead of bitwise equality.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tests.test_block_parity import make_cfg, VOCAB, L
from block_transformer_tpu.models import block_transformer as bt
from block_transformer_tpu.inference import generate as gen


def _run(params, cfg, args, fresh: bool, kv_cache: str, monkeypatch,
         chunk_blocks=4, max_blocks=None):
    # the env var resolves at call time into a static jit argument, so no
    # clear_cache dance is needed — each flag value has its own trace
    monkeypatch.setenv("BT_FRESH_PREFILL", "1" if fresh else "0")
    return gen.generate_blocks(params, cfg, *args,
                               max_blocks=max_blocks,
                               prefill_chunk_blocks=chunk_blocks,
                               kv_cache=kv_cache, greedy=True)


@pytest.fixture(scope="module")
def setup():
    cfg = make_cfg()
    params = bt.init_block_transformer_params(jax.random.PRNGKey(3), cfg)
    rng = np.random.default_rng(3)
    B, N = 2, 12
    ids = rng.integers(1, VOCAB, size=(B, N, L))
    att = np.ones_like(ids)
    att[1, 0, :2] = 0            # padding inside the prompt
    bam = att.any(-1).astype(np.int64)
    args = (jnp.asarray(ids), jnp.asarray(att), jnp.asarray(bam))
    return cfg, params, args, N


def test_fresh_matches_streaming_bf16(setup, monkeypatch):
    cfg, params, args, N = setup
    a = _run(params, cfg, args, True, "bf16", monkeypatch,
             max_blocks=N + 3)
    b = _run(params, cfg, args, False, "bf16", monkeypatch,
             max_blocks=N + 3)
    np.testing.assert_array_equal(np.asarray(a.tokens), np.asarray(b.tokens))


def test_fresh_tiling_matches_single_shot(setup, monkeypatch):
    """q-tiled fresh prefill == untiled fresh prefill (pure reordering of
    independent query rows)."""
    cfg, params, args, N = setup
    a = _run(params, cfg, args, True, "int8", monkeypatch,
             chunk_blocks=512, max_blocks=N + 3)
    b = _run(params, cfg, args, True, "int8", monkeypatch,
             chunk_blocks=5, max_blocks=N + 3)   # non-divisor: pads q rows
    np.testing.assert_array_equal(np.asarray(a.tokens), np.asarray(b.tokens))


@pytest.mark.parametrize("kv", ["int8", "int4"])
def test_fresh_vs_streaming_quantized(setup, monkeypatch, kv):
    """Quantized caches: fresh attends to unquantized prompt K/V, so the
    trajectories may differ slightly — require near-total greedy token
    agreement on this tiny model."""
    cfg, params, args, N = setup
    a = _run(params, cfg, args, True, kv, monkeypatch, max_blocks=N + 3)
    b = _run(params, cfg, args, False, kv, monkeypatch, max_blocks=N + 3)
    ta, tb = np.asarray(a.tokens), np.asarray(b.tokens)
    agree = (ta == tb).mean()
    assert agree >= 0.95, (kv, agree)
