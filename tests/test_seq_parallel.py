"""Sequence-parallel training: block axis sharded over a ``seq`` mesh axis
must be semantics-preserving (GSPMD reshards, loss is bit-comparable)."""

import numpy as np
import jax
from jax.sharding import NamedSharding, PartitionSpec as P

from block_transformer_tpu.config import make_block_config
from block_transformer_tpu.models import block_transformer as bt
from block_transformer_tpu.parallel import sharding as sh
from block_transformer_tpu.train import optimizer as opt
from block_transformer_tpu.train import train_step as ts


def test_seq_parallel_train_step_matches():
    mesh = sh.make_mesh(n_data=2, n_seq=2, n_model=2)
    assert mesh.axis_names == ("data", "seq", "model")
    assert sh.data_axes(mesh) == ("data",)
    cfg = make_block_config("sp-test", block_decoder_hidden=64,
                            block_decoder_layers=2, max_length=64,
                            vocab_size=512)
    tx, _ = opt.make_optimizer(peak_lr=1e-3, warmup_steps=10, total_steps=100)
    state = ts.create_train_state(jax.random.PRNGKey(0), cfg, tx)

    rng = np.random.default_rng(0)
    B, N, L = 4, 8, cfg.block_length
    ids = rng.integers(1, cfg.vocab_size - 2, size=(B, N, L)).astype(np.int32)
    batch = {
        "input_ids": ids,
        "attention_mask": np.ones((B, N, L), np.int32),
        "block_attention_mask": np.ones((B, N), np.int32),
        "labels": ids,
    }
    ref = bt.block_transformer_forward(
        state.params, cfg, batch["input_ids"], batch["attention_mask"],
        batch["block_attention_mask"], labels=batch["labels"],
        compute_logits=False)

    with jax.sharding.set_mesh(mesh):
        sharded = ts.shard_state(mesh, tx, state)
        step_fn = ts.make_sharded_train_step(mesh, cfg, tx, state.params,
                                             remat=False)
        bspec = sh.batch_pspec(mesh)
        assert "seq" in str(bspec)
        b = {k: jax.device_put(v, NamedSharding(mesh, bspec))
             for k, v in batch.items()}
        new_state, metrics = step_fn(sharded, b)
        jax.block_until_ready(new_state.params)
    np.testing.assert_allclose(float(metrics["loss"]), float(ref.loss),
                               rtol=2e-5)


def test_seq_constraint_noop_without_mesh():
    x = np.ones((2, 8, 4), np.float32)
    y = sh.seq_constraint(jax.numpy.asarray(x))
    np.testing.assert_array_equal(np.asarray(y), x)
