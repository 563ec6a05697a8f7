"""Explicit-collective TP decode (parallel/tp_decode.py) must be
token-exact vs single-device generation — bf16 and INT8 caches, on a
2x4 (data, model) mesh and a 2x2x2 (dcn, data, model) mesh."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from tests.test_block_parity import make_cfg, VOCAB
from block_transformer_tpu.models import block_transformer as bt
from block_transformer_tpu.inference import generate as gen
from block_transformer_tpu.parallel import sharding as sh
from block_transformer_tpu.parallel import tp_decode


def _setup():
    cfg = make_cfg()
    params = bt.init_block_transformer_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    B, N, L = 4, 4, cfg.block_length
    ids = jnp.asarray(rng.integers(1, VOCAB, size=(B, N, L)), jnp.int32)
    att = jnp.ones((B, N, L), jnp.int32)
    bam = jnp.ones((B, N), jnp.int32)
    return cfg, params, ids, att, bam


def _run_tp(mesh, cfg, params, ids, att, bam, kv_cache):
    tp_params = tp_decode.prepare_tp_params(params, cfg,
                                            tp=int(mesh.shape["model"]))
    fn = tp_decode.make_tp_generate_blocks(mesh, cfg, tp_params,
                                           max_blocks=8, kv_cache=kv_cache)
    sp = jax.tree.map(lambda s: NamedSharding(mesh, s),
                      tp_decode.tp_param_specs(tp_params),
                      is_leaf=lambda x: isinstance(x, P))
    p_sh = jax.tree.map(jax.device_put, tp_params, sp)
    data_sh = NamedSharding(mesh, P(sh.data_axes(mesh)))
    toks, nb = fn(p_sh, jax.device_put(ids, data_sh),
                  jax.device_put(att, data_sh), jax.device_put(bam, data_sh),
                  jax.random.PRNGKey(0))
    return np.asarray(toks), int(nb)


def test_tp_decode_exact_bf16_and_int8():
    cfg, params, ids, att, bam = _setup()
    mesh = sh.make_mesh(n_data=2, n_model=4)
    for kv in ("bf16", "int8"):
        ref = gen.generate_blocks(params, cfg, ids, att, bam, max_blocks=8,
                                  greedy=True, kv_cache=kv)
        toks, nb = _run_tp(mesh, cfg, params, ids, att, bam, kv)
        assert nb == int(ref.n_blocks)
        np.testing.assert_array_equal(toks, np.asarray(ref.tokens))


def test_tp_decode_exact_int4_weights():
    """INT4 weight trees through the shard_map TP decode: row-parallel
    packed kernels are repacked per shard (split-half planes must nest
    inside each shard's K rows) and group scales shard with their rows —
    token-exact vs the single-device int4 path, for group-wise and
    per-channel scales."""
    from block_transformer_tpu.ops import quant

    cfg, params, ids, att, bam = _setup()
    mesh = sh.make_mesh(n_data=2, n_model=4)
    for gs in (16, None):     # group-wise (G=K/16) and per-channel (G=1)
        qp = quant.quantize_block_transformer(
            params, bits=4, group_size=gs or 10**9, skip_lm_head=True)
        ref = gen.generate_blocks(qp, cfg, ids, att, bam, max_blocks=8,
                                  greedy=True)
        toks, nb = _run_tp(mesh, cfg, qp, ids, att, bam, "bf16")
        assert nb == int(ref.n_blocks)
        np.testing.assert_array_equal(toks, np.asarray(ref.tokens))


def test_tp_decode_exact_dcn_mesh():
    cfg, params, ids, att, bam = _setup()
    mesh = sh.make_mesh(n_dcn=2, n_data=2, n_model=2)
    assert mesh.axis_names == ("dcn", "data", "model")
    ref = gen.generate_blocks(params, cfg, ids, att, bam, max_blocks=8,
                              greedy=True)
    toks, nb = _run_tp(mesh, cfg, params, ids, att, bam, "bf16")
    assert nb == int(ref.n_blocks)
    np.testing.assert_array_equal(toks, np.asarray(ref.tokens))


def test_gspmd_generate_under_mesh_with_constraints():
    """generate_blocks under an active mesh applies carry constraints and
    still matches the unsharded run exactly."""
    cfg, params, ids, att, bam = _setup()
    ref = gen.generate_blocks(params, cfg, ids, att, bam, max_blocks=8,
                              greedy=True)
    mesh = sh.make_mesh(n_data=2, n_model=4)
    with jax.sharding.set_mesh(mesh):
        p_sh = jax.tree.map(
            jax.device_put, params, sh.param_shardings(mesh, params))
        data_sh = NamedSharding(mesh, P("data"))
        res = gen.generate_blocks(
            p_sh, cfg, jax.device_put(ids, data_sh),
            jax.device_put(att, data_sh), jax.device_put(bam, data_sh),
            max_blocks=8, greedy=True)
    np.testing.assert_array_equal(np.asarray(res.tokens),
                                  np.asarray(ref.tokens))


def test_w8a8_gated_off_under_manual_mesh(monkeypatch):
    """W8A8 dynamic activation quant must never trace inside a shard_map
    body: row-parallel matmuls see only a K-slice of each activation row
    there, so per-row amax scales would diverge from the single-device
    full-row scales and silently break TP token-exactness (ADVICE r2)."""
    from block_transformer_tpu.ops import linear as lin
    monkeypatch.setattr(lin, "_on_tpu", lambda: True)
    monkeypatch.setenv("BT_W8A8", "1")
    monkeypatch.setenv("BT_W8A8_M_MIN", "384")
    assert lin._use_w8a8(512)            # plain single-device trace: on
    mesh = sh.make_mesh(n_data=2, n_model=4)
    seen = {}

    def body(x):
        seen["w8a8"] = lin._use_w8a8(512)
        return x

    jax.jit(jax.shard_map(body, mesh=mesh, in_specs=P("data"),
                          out_specs=P("data")))(np.zeros(8))
    assert seen["w8a8"] is False


def test_tp_decode_overlap_streams_exact():
    """The interleaved two-stream overlap schedule (overlap_streams=2) is
    token-exact vs the single-device greedy decode: each half-batch stream
    runs the identical math, only the program order interleaves."""
    cfg, params, ids, att, bam = _setup()
    ref = gen.generate_blocks(params, cfg, ids, att, bam, max_blocks=8,
                              greedy=True)
    mesh = sh.make_mesh(n_data=2, n_model=4)
    tp_params = tp_decode.prepare_tp_params(params, cfg,
                                            tp=int(mesh.shape["model"]))
    fn = tp_decode.make_tp_generate_blocks(mesh, cfg, tp_params,
                                           max_blocks=8, kv_cache="int8",
                                           overlap_streams=2)
    sp = jax.tree.map(lambda s: NamedSharding(mesh, s),
                      tp_decode.tp_param_specs(tp_params),
                      is_leaf=lambda x: isinstance(x, P))
    p_sh = jax.tree.map(jax.device_put, tp_params, sp)
    data_sh = NamedSharding(mesh, P(sh.data_axes(mesh)))
    toks, nb = fn(p_sh, jax.device_put(ids, data_sh),
                  jax.device_put(att, data_sh), jax.device_put(bam, data_sh),
                  jax.random.PRNGKey(0))
    np.testing.assert_array_equal(
        np.asarray(toks)[:, :int(nb)],
        np.asarray(ref.tokens)[:, :int(ref.n_blocks)])


def test_tp_sampled_decode_runs_and_differs_by_key():
    """Distributed Gumbel-max sampling: valid tokens, and different keys
    give different streams (distributional sanity, not stream equality)."""
    cfg, params, ids, att, bam = _setup()
    mesh = sh.make_mesh(n_data=2, n_model=4)
    tp_params = tp_decode.prepare_tp_params(params, cfg,
                                            tp=int(mesh.shape["model"]))
    fn = tp_decode.make_tp_generate_blocks(mesh, cfg, tp_params,
                                           max_blocks=8, greedy=False,
                                           temperature=1.0)
    sp = jax.tree.map(lambda s: NamedSharding(mesh, s),
                      tp_decode.tp_param_specs(tp_params),
                      is_leaf=lambda x: isinstance(x, P))
    p_sh = jax.tree.map(jax.device_put, tp_params, sp)
    data_sh = NamedSharding(mesh, P(sh.data_axes(mesh)))
    args = (jax.device_put(ids, data_sh), jax.device_put(att, data_sh),
            jax.device_put(bam, data_sh))
    t0, _ = fn(p_sh, *args, jax.random.PRNGKey(0))
    t1, _ = fn(p_sh, *args, jax.random.PRNGKey(1))
    t0, t1 = np.asarray(t0), np.asarray(t1)
    assert (t0 >= 0).all() and (t0 < VOCAB).all()
    assert not np.array_equal(t0[:, 4:], t1[:, 4:])
