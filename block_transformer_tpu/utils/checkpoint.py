"""Checkpoint save/restore (orbax) + checkpoint discovery.

Replaces the reference's HF Trainer checkpoint layout + accelerate
meta-device loading (SURVEY.md §5.4): train state (params, optimizer state,
step) goes to ``<dir>/checkpoint-<step>`` via orbax (sharding-aware on
restore); discovery mirrors the reference's max-step glob
(inference_demo.py:24-41, eval_zero_shot_task.py:330-345).
``utils/torch_import.py`` handles reference safetensors trees.
"""

from __future__ import annotations

import os
import re
from typing import Optional

import jax


def _ckpt_dir(base: str, step: int) -> str:
    return os.path.join(os.path.abspath(base), f"checkpoint-{step}")


def save_checkpoint(base_dir: str, step: int, state) -> str:
    import orbax.checkpoint as ocp
    path = _ckpt_dir(base_dir, step)
    with ocp.StandardCheckpointer() as ck:
        ck.save(path, state, force=True)
    return path


def restore_checkpoint(base_dir: str, step: int, abstract_state):
    """abstract_state: a pytree of jax.ShapeDtypeStruct (or concrete arrays)
    giving shapes/dtypes/shardings for restore."""
    import orbax.checkpoint as ocp
    path = _ckpt_dir(base_dir, step)
    with ocp.StandardCheckpointer() as ck:
        return ck.restore(path, abstract_state)


def find_latest_checkpoint(base_dir: str) -> Optional[int]:
    """Max-step checkpoint-<N> subdirectory, or None."""
    if not os.path.isdir(base_dir):
        return None
    steps = []
    for name in os.listdir(base_dir):
        m = re.fullmatch(r"checkpoint-(\d+)", name)
        if m:
            steps.append(int(m.group(1)))
    return max(steps) if steps else None


def restore_params(base_dir: str, step: int):
    """Restore only the ``params`` sub-tree of a saved TrainState without
    knowing the optimizer that produced it: shapes/dtypes come from the
    checkpoint's own metadata (the multi-checkpoint eval sweep uses this —
    reference eval_zero_shot_task.py:310-391 reads arbitrary run dirs)."""
    import orbax.checkpoint as ocp
    path = _ckpt_dir(base_dir, step)
    with ocp.StandardCheckpointer() as ck:
        md = ck.metadata(path).item_metadata
        tree = md.tree if hasattr(md, "tree") else md
        abstract = jax.tree.map(
            lambda m: jax.ShapeDtypeStruct(tuple(m.shape), m.dtype), tree)
        restored = ck.restore(path, abstract)
    if isinstance(restored, dict) and "params" in restored:
        return restored["params"]
    return restored.params


def abstract_like(state):
    return jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype,
                                       sharding=getattr(x, "sharding", None)),
        state)
