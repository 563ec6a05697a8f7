"""Training loop: the TPU-native analogue of the reference's HF Trainer +
DeepSpeed stack (pretrain_block_transformer.py + util/callback.py).

One host loop drives the jitted sharded train step. Reference behaviors
carried over:

- gradient accumulation derived from total_batch_size (util/config.py:42-64)
  via a jitted grad-accumulation scan,
- per-component loss logging incl. loss-by-position curves, accumulated in
  fp64 on host (util/callback.py:21-116, token_decoder/base.py:358-372),
- fixed stopping at ``stop_steps`` with the scheduler horizon kept at
  ``num_train_steps`` (FixedStoppingCallback, util/callback.py:119-132),
- batch-size rampup: half batch for the first ``rampup_steps`` by halving
  accumulation (BatchSizeRampupCallback, util/callback.py:135-180),
- per-step wall time logging (WallTimeMeasurementCallback analogue with
  ``block_until_ready`` brackets),
- periodic checkpointing (save_steps) + resume, and optional in-training
  zero-shot eval hooks (ZeroshotEvalCallback analogue).

Metrics stream to ``<out_dir>/metrics.jsonl`` (wandb is unavailable in this
environment; the record format carries the same fields).
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from block_transformer_tpu.config import BlockTransformerConfig
from block_transformer_tpu.data.packing import PackedDataset, make_train_batch
from block_transformer_tpu.parallel import sharding as sh
from block_transformer_tpu.train import optimizer as opt_mod
from block_transformer_tpu.train import train_step as ts
from block_transformer_tpu.utils import checkpoint as ckpt


@dataclass
class TrainerConfig:
    output_dir: str = "results/run"
    learning_rate: float = 1e-3
    adam_beta1: float = 0.9
    adam_beta2: float = 0.95
    weight_decay: float = 0.1
    num_train_steps: int = 1000
    stop_steps: Optional[int] = None
    num_warmup_steps: int = 100
    total_batch_size: int = 8
    micro_batch_size: Optional[int] = None   # per-step device batch
    batch_size_rampup_steps: Optional[int] = None
    max_length: int = 2048
    save_steps: int = 500
    logging_steps: int = 50
    seed: int = 42
    param_dtype: str = "float32"
    remat: bool = True
    n_data: Optional[int] = None
    n_model: Optional[int] = None
    # variable block lengths (util/data_preprocessing.py:123-154): e.g.
    # "uniform" with {"mean": 4, "radius": 3}; None/"fixed" = reshape path.
    # The model's block_length must equal the distribution max.
    block_split_distribution: Optional[str] = None
    block_split_kwargs: Optional[dict] = None


class Trainer:
    def __init__(self, model_cfg: BlockTransformerConfig, tcfg: TrainerConfig,
                 dataset: PackedDataset,
                 eval_hook: Optional[Callable[[int, dict], dict]] = None):
        self.model_cfg = model_cfg
        self.tcfg = tcfg
        self.dataset = dataset
        self.eval_hook = eval_hook
        os.makedirs(tcfg.output_dir, exist_ok=True)
        self._metrics_path = os.path.join(tcfg.output_dir, "metrics.jsonl")

        self.mesh = sh.make_mesh(tcfg.n_data, tcfg.n_model)
        self.tx, self.schedule = opt_mod.make_optimizer(
            peak_lr=tcfg.learning_rate, warmup_steps=tcfg.num_warmup_steps,
            total_steps=tcfg.num_train_steps, weight_decay=tcfg.weight_decay,
            b1=tcfg.adam_beta1, b2=tcfg.adam_beta2)

        dtype = jnp.float32 if tcfg.param_dtype == "float32" else jnp.bfloat16
        with jax.sharding.set_mesh(self.mesh):
            self.state = ts.create_train_state(
                jax.random.PRNGKey(tcfg.seed), model_cfg, self.tx, dtype=dtype)
            self.state = ts.shard_state(self.mesh, self.tx, self.state)
            self.grad_fn, self.apply_fn, self.zeros_fn = \
                ts.make_sharded_grad_and_apply(
                    self.mesh, model_cfg, self.tx, self.state.params,
                    remat=tcfg.remat)

        self.micro_batch = tcfg.micro_batch_size or tcfg.total_batch_size
        if tcfg.total_batch_size % self.micro_batch:
            raise ValueError("total_batch_size must divide by micro_batch_size")
        self.grad_accum = tcfg.total_batch_size // self.micro_batch
        if tcfg.batch_size_rampup_steps and self.grad_accum == 1:
            raise ValueError("batch_size_rampup_steps requires grad "
                             "accumulation > 1 (set micro_batch_size)")
        # fp64 loss-by-position accumulator (reference semantics)
        self._lbp_sum = None
        self._lbp_count = 0

        self._distribution = None
        if tcfg.block_split_distribution not in (None, "fixed"):
            from block_transformer_tpu.data import block_split as bs
            dist_cls = bs.DISTRIBUTIONS[tcfg.block_split_distribution]
            self._distribution = dist_cls(**(tcfg.block_split_kwargs or {}),
                                          seed=tcfg.seed)
            if self._distribution.max != model_cfg.block_length:
                raise ValueError(
                    f"block_split distribution max {self._distribution.max} "
                    f"!= model block_length {model_cfg.block_length} (blocks "
                    f"are padded to the distribution max)")

    # ------------------------------------------------------------------
    def _effective_accum(self, step: int) -> int:
        # reference rampup halves accumulation, rounding up
        # (util/callback.py:147-180), and the dataloader keeps consuming
        # samples contiguously — we mirror that with a sample cursor
        r = self.tcfg.batch_size_rampup_steps
        if r and step < r:
            return max(1, -(-self.grad_accum // 2))
        return self.grad_accum

    def _samples_consumed_before(self, step: int) -> int:
        r = self.tcfg.batch_size_rampup_steps or 0
        half = max(1, -(-self.grad_accum // 2)) * self.micro_batch
        full = self.grad_accum * self.micro_batch
        ramp_steps = min(step, r)
        return ramp_steps * half + (step - ramp_steps) * full

    def _log(self, record: dict):
        with open(self._metrics_path, "a") as f:
            f.write(json.dumps(record) + "\n")

    # ------------------------------------------------------------------
    def train(self, resume: bool = False) -> ts.TrainState:
        tcfg = self.tcfg
        start_step = 0
        if resume:
            latest = ckpt.find_latest_checkpoint(tcfg.output_dir)
            if latest is not None:
                self.state = ckpt.restore_checkpoint(
                    tcfg.output_dir, latest, ckpt.abstract_like(self.state))
                start_step = latest
        stop = tcfg.stop_steps or tcfg.num_train_steps

        batch_sharding = jax.sharding.NamedSharding(
            self.mesh, sh.batch_pspec(self.mesh))
        cursor = self._samples_consumed_before(start_step)
        with jax.sharding.set_mesh(self.mesh):
            for step in range(start_step, stop):
                t0 = time.perf_counter()
                accum = self._effective_accum(step)
                step_metrics = []
                grads = self.zeros_fn(self.state.params)
                for a in range(accum):
                    idxs = (np.arange(cursor, cursor + self.micro_batch)
                            % len(self.dataset))
                    cursor += self.micro_batch
                    np_batch = make_train_batch(self.dataset, idxs,
                                                self.model_cfg.block_length,
                                                distribution=self._distribution)
                    batch = {k: jax.device_put(v, batch_sharding)
                             for k, v in np_batch.items()}
                    grads, metrics = self.grad_fn(self.state.params, batch,
                                                  grads)
                    step_metrics.append(metrics)
                self.state, grad_norm = self.apply_fn(self.state, grads,
                                                      float(accum))
                jax.block_until_ready(self.state.params)
                dt = time.perf_counter() - t0

                lbp = np.mean([np.asarray(m["loss_by_position"], np.float64)
                               for m in step_metrics], axis=0)
                self._lbp_sum = lbp if self._lbp_sum is None else self._lbp_sum + lbp
                self._lbp_count += 1

                if (step + 1) % tcfg.logging_steps == 0 or step == stop - 1:
                    mean = {k: float(np.mean([float(m[k]) for m in step_metrics]))
                            for k in step_metrics[0] if k != "loss_by_position"}
                    rec = {"step": step + 1,
                           "lr": float(self.schedule(step + 1)),
                           "grad_norm": float(grad_norm),
                           "wall_time_s": dt,
                           "tokens_seen": cursor * tcfg.max_length,
                           "loss_by_position":
                               (self._lbp_sum / self._lbp_count).tolist(),
                           **mean}
                    self._log(rec)
                    self._lbp_sum, self._lbp_count = None, 0

                if (step + 1) % tcfg.save_steps == 0 or step == stop - 1:
                    ckpt.save_checkpoint(tcfg.output_dir, step + 1, self.state)

                if self.eval_hook is not None:
                    self.eval_hook(step + 1, {"params": self.state.params})
        return self.state
