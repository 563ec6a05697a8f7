"""Pipeline-parallel block decoder: exactness vs the plain stack, and a
full (dp x pp) train step on the 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from block_transformer_tpu.config import make_block_config
from block_transformer_tpu.models import block_transformer as bt
from block_transformer_tpu.parallel import pipeline as pp
from block_transformer_tpu.train import optimizer as opt
from block_transformer_tpu.train import train_step as ts


def _mesh(n_data=2, n_pipe=4):
    dev = np.asarray(jax.devices()[:n_data * n_pipe]).reshape(n_data, n_pipe)
    return Mesh(dev, ("data", "pipe"))


def _cfg():
    return make_block_config("pp-test", block_decoder_hidden=64,
                             block_decoder_layers=4, max_length=64,
                             vocab_size=512)


def _batch(cfg, B=8, N=6):
    rng = np.random.default_rng(0)
    L = cfg.block_length
    ids = rng.integers(1, cfg.vocab_size - 2, size=(B, N, L)).astype(np.int32)
    return {
        "input_ids": ids,
        "attention_mask": np.ones((B, N, L), np.int32),
        "block_attention_mask": np.ones((B, N), np.int32),
        "labels": ids,
    }


def test_pp_forward_matches_plain():
    mesh = _mesh()
    cfg = _cfg()
    params = bt.init_block_transformer_params(jax.random.PRNGKey(0), cfg)
    batch = _batch(cfg)
    ref = bt.block_transformer_forward(
        params, cfg, batch["input_ids"], batch["attention_mask"],
        batch["block_attention_mask"], labels=batch["labels"],
        compute_logits=False)
    bd_fn = pp.make_pp_block_decoder_forward(mesh, n_micro=4)
    with jax.sharding.set_mesh(mesh):
        out = jax.jit(lambda p, b: bt.block_transformer_forward(
            p, cfg, b["input_ids"], b["attention_mask"],
            b["block_attention_mask"], labels=b["labels"],
            compute_logits=False, block_decoder_fn=bd_fn).loss)(params, batch)
    np.testing.assert_allclose(float(out), float(ref.loss), rtol=2e-5)


def test_pp_grads_match_plain():
    mesh = _mesh(n_data=1, n_pipe=4)
    cfg = _cfg()
    params = bt.init_block_transformer_params(jax.random.PRNGKey(1), cfg)
    batch = _batch(cfg, B=4)

    def loss_plain(p):
        return bt.block_transformer_forward(
            p, cfg, batch["input_ids"], batch["attention_mask"],
            batch["block_attention_mask"], labels=batch["labels"],
            compute_logits=False).loss

    bd_fn = pp.make_pp_block_decoder_forward(mesh, n_micro=2)

    def loss_pp(p):
        return bt.block_transformer_forward(
            p, cfg, batch["input_ids"], batch["attention_mask"],
            batch["block_attention_mask"], labels=batch["labels"],
            compute_logits=False, block_decoder_fn=bd_fn).loss

    g_ref = jax.grad(loss_plain)(params)
    with jax.sharding.set_mesh(mesh):
        g_pp = jax.jit(jax.grad(loss_pp))(params)
    flat_ref = jax.tree.leaves(g_ref)
    flat_pp = jax.tree.leaves(g_pp)
    for a, b in zip(flat_ref, flat_pp):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=5e-4, atol=1e-5)


def test_pp_train_step_runs_and_matches_loss():
    mesh = _mesh()
    cfg = _cfg()
    tx, _ = opt.make_optimizer(peak_lr=1e-3, warmup_steps=10, total_steps=100)
    state = ts.create_train_state(jax.random.PRNGKey(0), cfg, tx)
    batch = _batch(cfg)

    # reference: two plain (unsharded) train steps on the same state
    # (warmup lr at step 0 is zero — step 2 has a real update)
    ref_step = ts.make_train_step(cfg, tx, remat=False)
    ref_state, ref_metrics = jax.jit(ref_step)(state, batch)
    ref_state, ref_metrics = jax.jit(ref_step)(ref_state, batch)

    step_fn, state_spec = pp.make_pp_train_step(mesh, cfg, tx, state.params,
                                                n_micro=4, remat=False)
    with jax.sharding.set_mesh(mesh):
        sharded = jax.tree.map(
            lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
            state, state_spec, is_leaf=lambda x: isinstance(x, P))
        b = {k: jax.device_put(v, NamedSharding(mesh, P("data")))
             for k, v in batch.items()}
        new_state, metrics = step_fn(sharded, b)
        new_state, metrics = step_fn(new_state, b)
        params_out = jax.device_get(new_state.params)
    assert np.isfinite(float(metrics["loss"]))
    np.testing.assert_allclose(float(metrics["loss"]),
                               float(ref_metrics["loss"]), rtol=2e-5)
    # block-decoder params moved under pipelined grads
    moved = jax.tree.map(
        lambda a, b_: float(jnp.max(jnp.abs(a.astype(jnp.float32)
                                            - b_.astype(jnp.float32)))),
        state.params["block_decoder"]["layers"],
        params_out["block_decoder"]["layers"])
    assert max(jax.tree.leaves(moved)) > 0
    # and the pp step's applied updates match the reference step's params
    for a, b_ in zip(jax.tree.leaves(params_out),
                     jax.tree.leaves(ref_state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=5e-4, atol=2e-5)
