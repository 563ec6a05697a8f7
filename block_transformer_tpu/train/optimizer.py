"""Optimizer + LR schedule matching the reference training recipe.

DeepSpeed config (ds_configs/default_linear_warmup.config): AdamW with
betas (0.9, 0.95), weight decay 0.1, WarmupCosineLR with ``cos_min_ratio
0.1`` (cosine decays to 10% of peak), linear warmup. Expressed in optax.
"""

from __future__ import annotations

import optax


def warmup_cosine_schedule(peak_lr: float, warmup_steps: int,
                           total_steps: int, cos_min_ratio: float = 0.1):
    return optax.join_schedules([
        optax.linear_schedule(0.0, peak_lr, warmup_steps),
        optax.cosine_decay_schedule(peak_lr, max(1, total_steps - warmup_steps),
                                    alpha=cos_min_ratio),
    ], [warmup_steps])


def make_optimizer(peak_lr: float = 1e-3, warmup_steps: int = 3000,
                   total_steps: int = 572000, weight_decay: float = 0.1,
                   b1: float = 0.9, b2: float = 0.95,
                   grad_clip: float = 1.0, cos_min_ratio: float = 0.1):
    schedule = warmup_cosine_schedule(peak_lr, warmup_steps, total_steps,
                                      cos_min_ratio)
    tx = optax.chain(
        optax.clip_by_global_norm(grad_clip),
        optax.adamw(schedule, b1=b1, b2=b2, weight_decay=weight_decay,
                    # no decay on layernorm/bias params (standard; DeepSpeed
                    # applies decay to all, but LN/bias decay is a no-op
                    # direction — keep the standard exemption)
                    mask=lambda params: _decay_mask(params)),
    )
    return tx, schedule


def _decay_mask(params):
    import jax

    def is_decay(path, leaf):
        names = [getattr(k, "key", getattr(k, "name", str(k))) for k in path]
        last = names[-1]
        if last in ("bias", "scale"):
            return False
        if "ln1" in names or "ln2" in names or "final_ln" in names:
            return False
        return True

    return jax.tree_util.tree_map_with_path(is_decay, params)
