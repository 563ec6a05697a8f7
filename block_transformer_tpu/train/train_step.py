"""Sharded training step (pjit over the (data, model) mesh).

The TPU-native analogue of the reference's HF Trainer + DeepSpeed ZeRO-2
loop (pretrain_block_transformer.py:98-143): one jitted function computes
loss, grads, optimizer update and the per-component metrics the reference
logs (util/callback.py:21-116) — gradient all-reduce over ``data`` and TP
collectives over ``model`` are inserted by XLA from the shardings.
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from block_transformer_tpu.config import BlockTransformerConfig
from block_transformer_tpu.models import block_transformer as bt
from block_transformer_tpu.parallel import sharding as sh


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jax.Array


def make_loss_fn(cfg: BlockTransformerConfig, remat: bool = True,
                 param_transform=None):
    """``param_transform`` maps the param tree before the forward (e.g.
    ops/quant.fake_quant_block_transformer for QAT: the straight-through
    estimator keeps grads flowing to the master fp weights while the loss
    sees the quantization grid the deployed model will round onto)."""
    def loss_fn(params, batch):
        if param_transform is not None:
            params = param_transform(params)
        out = bt.block_transformer_forward(
            params, cfg, batch["input_ids"], batch["attention_mask"],
            batch["block_attention_mask"], labels=batch["labels"],
            compute_logits=False, remat=remat)
        metrics = {
            "loss": out.loss,
            "token_decoding_loss": out.token_decoding_loss,
            "loss_by_position": out.loss_by_position,
        }
        if out.block_decoding_loss is not None:
            metrics["block_decoding_loss"] = out.block_decoding_loss
        if out.auto_encoding_loss is not None:
            metrics["auto_encoding_loss"] = out.auto_encoding_loss
        return out.loss, metrics

    return loss_fn


def make_train_step(cfg: BlockTransformerConfig, tx, remat: bool = True,
                    param_transform=None):
    loss_fn = make_loss_fn(cfg, remat, param_transform=param_transform)

    def train_step(state: TrainState, batch):
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = jax.tree.map(lambda p, u: p + u.astype(p.dtype),
                              state.params, updates)
        metrics["grad_norm"] = jnp.sqrt(sum(
            jnp.sum(jnp.square(g.astype(jnp.float32)))
            for g in jax.tree.leaves(grads)))
        return TrainState(params, opt_state, state.step + 1), metrics

    return train_step


def make_sharded_train_step(mesh, cfg: BlockTransformerConfig, tx,
                            params, remat: bool = True):
    """Jit the train step with explicit input/output shardings on ``mesh``.

    Optimizer state inherits each parameter's sharding (TP shards stay
    sharded; replicated params replicated — the ZeRO-equivalent partitioning
    over ``model`` comes for free from the param specs).
    """
    train_step = make_train_step(cfg, tx, remat)
    pspecs = sh.param_pspecs(params)
    opt_pspecs = _opt_state_pspecs(tx, params, pspecs, mesh)
    state_spec = TrainState(params=pspecs, opt_state=opt_pspecs, step=P())
    bp = sh.batch_pspec(mesh)
    batch_spec = {k: bp for k in
                  ("input_ids", "attention_mask", "block_attention_mask",
                   "labels")}

    def to_sharding(tree_spec):
        return jax.tree.map(lambda s: NamedSharding(mesh, s), tree_spec,
                            is_leaf=lambda x: isinstance(x, P))

    return jax.jit(
        train_step,
        in_shardings=(to_sharding(state_spec), to_sharding(batch_spec)),
        out_shardings=(to_sharding(state_spec), None),
        donate_argnums=(0,),
    )


def _opt_state_pspecs(tx, params, pspecs, mesh=None):
    """Partition specs for the optimizer state (ZeRO-equivalent).

    A leaf shaped like a parameter inherits that parameter's TP spec; if
    the parameter is fully **replicated** (no ``model`` axis anywhere —
    embedding tables, layer norms, biases), its Adam moments are instead
    sharded over the data axes on the largest divisible dimension — the
    pjit expression of DeepSpeed ZeRO's optimizer-state partitioning
    (reference ds_configs/default_linear_warmup.config, SURVEY.md §7.2
    step 8): XLA reduce-scatters the gradients feeding the update and
    all-gathers the applied deltas. Scalars replicate.
    """
    opt_shape = jax.eval_shape(tx.init, params)
    flat_params, treedef_p = jax.tree_util.tree_flatten(params)
    shape_to_spec = {}
    for leaf, spec in zip(flat_params, jax.tree_util.tree_leaves(pspecs,
                          is_leaf=lambda x: isinstance(x, P))):
        shape_to_spec.setdefault((leaf.shape, leaf.dtype), spec)

    if mesh is not None:
        data_ax = tuple(a for a in mesh.axis_names if a != "model")
        n_data = 1
        for a in data_ax:
            n_data *= mesh.shape[a]
        data_name = data_ax[0] if len(data_ax) == 1 else data_ax
    else:
        n_data = 1
        data_name = None

    def zero_shard(shape, spec):
        """Replicated param -> shard moments over data on one axis."""
        if any(s is not None for s in spec):
            return spec                      # TP-sharded already
        if n_data <= 1 or not shape:
            return spec
        for axis, dim in enumerate(shape):
            if dim % n_data == 0 and dim >= n_data:
                names = [None] * len(shape)
                names[axis] = data_name
                return P(*names)
        return spec

    def spec_for(leaf):
        key = (leaf.shape, leaf.dtype)
        if key in shape_to_spec:
            return zero_shard(leaf.shape, shape_to_spec[key])
        if leaf.shape == ():
            return P()
        # unmatched (e.g. different dtype accumulator): replicate
        return P(*([None] * leaf.ndim))

    return jax.tree.map(spec_for, opt_shape)


def make_sharded_grad_and_apply(mesh, cfg: BlockTransformerConfig, tx,
                                params, remat: bool = True):
    """(grad_fn, apply_fn) for exact gradient accumulation: grad_fn computes
    per-micro-batch grads+metrics; apply_fn applies the mean grad once."""
    loss_fn = make_loss_fn(cfg, remat)
    pspecs = sh.param_pspecs(params)
    opt_pspecs = _opt_state_pspecs(tx, params, pspecs, mesh)
    state_spec = TrainState(params=pspecs, opt_state=opt_pspecs, step=P())
    bp = sh.batch_pspec(mesh)
    batch_spec = {k: bp for k in
                  ("input_ids", "attention_mask", "block_attention_mask",
                   "labels")}

    def to_sh(tree_spec):
        return jax.tree.map(lambda s: NamedSharding(mesh, s), tree_spec,
                            is_leaf=lambda x: isinstance(x, P))

    def grad_step(params, batch, grads_acc):
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch)
        grads_acc = jax.tree.map(lambda a, g: a + g.astype(a.dtype),
                                 grads_acc, grads)
        return grads_acc, metrics

    def apply_step(state: TrainState, grads, n_accum):
        grads = jax.tree.map(lambda g: (g / n_accum).astype(g.dtype), grads)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = jax.tree.map(lambda p, u: p + u.astype(p.dtype),
                                  state.params, updates)
        gn = jnp.sqrt(sum(jnp.sum(jnp.square(g.astype(jnp.float32)))
                          for g in jax.tree.leaves(grads)))
        return TrainState(new_params, opt_state, state.step + 1), gn

    grad_fn = jax.jit(grad_step,
                      in_shardings=(to_sh(pspecs), to_sh(batch_spec),
                                    to_sh(pspecs)),
                      out_shardings=(to_sh(pspecs), None),
                      donate_argnums=(2,))
    apply_fn = jax.jit(apply_step,
                       in_shardings=(to_sh(state_spec), to_sh(pspecs), None),
                       out_shardings=(to_sh(state_spec), None),
                       donate_argnums=(0, 1))
    zeros_fn = jax.jit(lambda p: jax.tree.map(
        lambda x: jnp.zeros(x.shape, jnp.float32), p),
        in_shardings=(to_sh(pspecs),), out_shardings=to_sh(pspecs))
    return grad_fn, apply_fn, zeros_fn


def create_train_state(key, cfg: BlockTransformerConfig, tx,
                       dtype=jnp.float32) -> TrainState:
    params = bt.init_block_transformer_params(key, cfg, dtype=dtype)
    return TrainState(params=params, opt_state=tx.init(params),
                      step=jnp.zeros((), jnp.int32))


def shard_state(mesh, tx, state: TrainState) -> TrainState:
    """Place params + optimizer state on the mesh per the TP specs."""
    pspecs = sh.param_pspecs(state.params)
    opt_pspecs = _opt_state_pspecs(tx, state.params, pspecs, mesh)

    def put(tree, spec_tree):
        shardings = jax.tree.map(
            lambda s: NamedSharding(mesh, s), spec_tree,
            is_leaf=lambda x: isinstance(x, P))
        return jax.tree.map(jax.device_put, tree, shardings)

    return TrainState(params=put(state.params, pspecs),
                      opt_state=put(state.opt_state, opt_pspecs),
                      step=jax.device_put(state.step,
                                          NamedSharding(mesh, P())))
