"""Vanilla GPT-NeoX pretraining loop (pretrain_vanilla_transformer.py
analogue): the baseline-family training path, sharing the optimizer recipe,
grad accumulation, checkpointing and metrics machinery with the block
Trainer but driving ``vanilla_loss`` over flat (unblocked) packed samples.
"""

from __future__ import annotations

import json
import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from block_transformer_tpu.config import NeoXConfig
from block_transformer_tpu.data.packing import PackedDataset, add_labels
from block_transformer_tpu.models import vanilla as vmod
from block_transformer_tpu.parallel import sharding as sh
from block_transformer_tpu.train import optimizer as opt_mod
from block_transformer_tpu.train.train_step import TrainState
from block_transformer_tpu.train.trainer import TrainerConfig
from block_transformer_tpu.utils import checkpoint as ckpt


class VanillaTrainer:
    def __init__(self, model_cfg: NeoXConfig, tcfg: TrainerConfig,
                 dataset: PackedDataset):
        self.model_cfg = model_cfg
        self.tcfg = tcfg
        self.dataset = dataset
        os.makedirs(tcfg.output_dir, exist_ok=True)
        self._metrics_path = os.path.join(tcfg.output_dir, "metrics.jsonl")

        self.mesh = sh.make_mesh(tcfg.n_data, tcfg.n_model)
        self.tx, self.schedule = opt_mod.make_optimizer(
            peak_lr=tcfg.learning_rate, warmup_steps=tcfg.num_warmup_steps,
            total_steps=tcfg.num_train_steps, weight_decay=tcfg.weight_decay,
            b1=tcfg.adam_beta1, b2=tcfg.adam_beta2)
        dtype = jnp.float32 if tcfg.param_dtype == "float32" else jnp.bfloat16

        cfg = model_cfg
        remat = tcfg.remat

        def loss_fn(params, batch):
            return vmod.vanilla_loss(params, cfg, batch["input_ids"],
                                     batch["attention_mask"], batch["labels"],
                                     remat=remat)

        def grad_step(params, batch, grads_acc):
            loss, grads = jax.value_and_grad(loss_fn)(params, batch)
            grads_acc = jax.tree.map(lambda a, g: a + g.astype(a.dtype),
                                     grads_acc, grads)
            return grads_acc, loss

        def apply_step(state: TrainState, grads, n_accum):
            grads = jax.tree.map(lambda g: (g / n_accum).astype(g.dtype), grads)
            updates, opt_state = self.tx.update(grads, state.opt_state,
                                                state.params)
            params = jax.tree.map(lambda p, u: p + u.astype(p.dtype),
                                  state.params, updates)
            return TrainState(params, opt_state, state.step + 1)

        with jax.sharding.set_mesh(self.mesh):
            params = jax.jit(lambda k: vmod.init_vanilla_params(
                k, cfg, dtype=dtype))(jax.random.PRNGKey(tcfg.seed))
            pspecs = sh.param_pspecs(params)
            shardings = jax.tree.map(lambda s: NamedSharding(self.mesh, s),
                                     pspecs, is_leaf=lambda x: isinstance(x, P))
            params = jax.tree.map(jax.device_put, params, shardings)
            from block_transformer_tpu.train.train_step import _opt_state_pspecs
            opt_sh = jax.tree.map(
                lambda s: NamedSharding(self.mesh, s),
                _opt_state_pspecs(self.tx, params, pspecs, self.mesh),
                is_leaf=lambda x: isinstance(x, P))
            opt_state = jax.tree.map(jax.device_put, self.tx.init(params),
                                     opt_sh)
            self.state = TrainState(params=params,
                                    opt_state=opt_state,
                                    step=jnp.zeros((), jnp.int32))
            self.grad_fn = jax.jit(grad_step, donate_argnums=(2,))
            self.apply_fn = jax.jit(apply_step, donate_argnums=(0, 1))
            self.zeros_fn = jax.jit(lambda p: jax.tree.map(
                lambda x: jnp.zeros(x.shape, jnp.float32), p))
        self._batch_sharding = NamedSharding(self.mesh, sh.batch_pspec(self.mesh))
        self.micro_batch = tcfg.micro_batch_size or tcfg.total_batch_size
        if tcfg.total_batch_size % self.micro_batch:
            raise ValueError("total_batch_size must divide by micro_batch_size")
        self.grad_accum = tcfg.total_batch_size // self.micro_batch

    def train(self, resume: bool = False) -> TrainState:
        tcfg = self.tcfg
        start = 0
        if resume:
            latest = ckpt.find_latest_checkpoint(tcfg.output_dir)
            if latest is not None:
                self.state = ckpt.restore_checkpoint(
                    tcfg.output_dir, latest, ckpt.abstract_like(self.state))
                start = latest
        stop = tcfg.stop_steps or tcfg.num_train_steps
        cursor = start * tcfg.total_batch_size
        with jax.sharding.set_mesh(self.mesh):
            for step in range(start, stop):
                t0 = time.perf_counter()
                grads = self.zeros_fn(self.state.params)
                losses = []
                for _ in range(self.grad_accum):
                    idxs = (np.arange(cursor, cursor + self.micro_batch)
                            % len(self.dataset))
                    cursor += self.micro_batch
                    raw = self.dataset.get_batch(idxs)
                    batch = {
                        "input_ids": raw["input_ids"].astype(np.int32),
                        "attention_mask": raw["attention_mask"].astype(np.int32),
                        "labels": add_labels(raw["input_ids"],
                                             raw["attention_mask"]).astype(np.int32),
                    }
                    batch = {k: jax.device_put(v, self._batch_sharding)
                             for k, v in batch.items()}
                    grads, loss = self.grad_fn(self.state.params, batch, grads)
                    losses.append(loss)
                self.state = self.apply_fn(self.state, grads,
                                           float(self.grad_accum))
                loss = jnp.mean(jnp.stack(losses))
                jax.block_until_ready(loss)
                if (step + 1) % tcfg.logging_steps == 0 or step == stop - 1:
                    with open(self._metrics_path, "a") as f:
                        f.write(json.dumps({
                            "step": step + 1, "loss": float(loss),
                            "lr": float(self.schedule(step + 1)),
                            "wall_time_s": time.perf_counter() - t0}) + "\n")
                if (step + 1) % tcfg.save_steps == 0 or step == stop - 1:
                    ckpt.save_checkpoint(tcfg.output_dir, step + 1, self.state)
        return self.state
