"""Mesh construction and parameter sharding rules.

One mesh ``(data, model)`` (SURVEY.md §5.8): batch on ``data`` (across
hosts/DCN), tensor-parallel weight shards on ``model`` (over ICI). This
replaces the reference's NCCL/DeepSpeed data-parallel-only setup with the
TPU-native recipe: annotate shardings, let XLA insert the collectives.

TP layout is the standard Megatron split expressed as PartitionSpecs:
column-parallel QKV/up (output dim on ``model``), row-parallel out/down
(input dim on ``model``), vocab-sharded LM head. Embedding *tables* stay
replicated (gather locality) — their optimizer state is data-sharded by
the ZeRO-equivalent partitioning in train/train_step._opt_state_pspecs.
The global block-level KV cache shards on heads over ``model``.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: Optional[int] = None, n_model: Optional[int] = None,
              devices=None, n_dcn: Optional[int] = None,
              n_seq: Optional[int] = None) -> Mesh:
    """(data, model) mesh over ICI; pass ``n_dcn`` for a three-axis
    (dcn, data, model) mesh where the leading axis crosses hosts — batch
    shards over (dcn, data) so gradient/batch collectives ride the ICI
    within a slice and only the dcn-axis reduction crosses the datacenter
    network (SURVEY.md §5.8). ``n_seq`` inserts a sequence-parallel axis
    between data and model: training activations shard their block axis
    over ``seq`` (see seq_constraint) and XLA inserts the attention
    all-gathers."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if n_seq:
        assert not n_dcn, "combine seq with dcn by extending this table"
        n_model = n_model or 1
        n_data = n_data or n // (n_seq * n_model)
        assert n_data * n_seq * n_model == n, (n_data, n_seq, n_model, n)
        dev = np.asarray(devices).reshape(n_data, n_seq, n_model)
        return Mesh(dev, ("data", "seq", "model"))
    if n_dcn:
        n_per = n // n_dcn
        assert n_dcn * n_per == n, (n_dcn, n)
        if n_model is None:
            n_model = 1 if n_per == 1 else min(4, n_per)
        if n_data is None:
            n_data = n_per // n_model
        assert n_dcn * n_data * n_model == n, (n_dcn, n_data, n_model, n)
        dev = np.asarray(devices).reshape(n_dcn, n_data, n_model)
        return Mesh(dev, ("dcn", "data", "model"))
    if n_data is None and n_model is None:
        n_model = 1 if n == 1 else min(4, n)
        n_data = n // n_model
    elif n_data is None:
        n_data = n // n_model
    elif n_model is None:
        n_model = n // n_data
    assert n_data * n_model == n, (n_data, n_model, n)
    dev = np.asarray(devices).reshape(n_data, n_model)
    return Mesh(dev, ("data", "model"))


def data_axes(mesh: Mesh) -> tuple:
    """Every mesh axis that shards the batch (all but ``model`` and the
    activation-structure axes ``seq``/``pipe``)."""
    return tuple(a for a in mesh.axis_names
                 if a not in ("model", "seq", "pipe"))


def seq_constraint(x: jax.Array, seq_dim: int = 1) -> jax.Array:
    """Constrain ``x``'s sequence dimension onto the ambient mesh's ``seq``
    axis (no-op when the mesh has none). Called at the block-decoder
    boundaries so sequence-parallel training keeps long activations sharded
    between attention layers instead of letting SPMD replicate them."""
    try:
        mesh = jax.sharding.get_abstract_mesh()
    except Exception:
        return x
    if not mesh or "seq" not in getattr(mesh, "axis_names", ()):
        return x
    spec = [None] * x.ndim
    spec[0] = data_axes(mesh) or None
    spec[seq_dim] = "seq"
    return jax.lax.with_sharding_constraint(
        x, P(*[tuple(s) if isinstance(s, tuple) else s for s in spec]))


# ---------------------------------------------------------------------------
# Parameter partition specs by path pattern
# ---------------------------------------------------------------------------

def _neox_pspec(path_tail: tuple, ndim: int = None) -> P:
    """Rules for one neox stack (leaves have a stacked layer axis first for
    'layers' entries; embed/final entries do not).

    Quantized trees: ``kernel_q8``/``kernel_q4`` follow their fp kernel's
    spec (the packed-int4 halved K keeps the same axis meaning); a
    ``scale`` leaf is per-output-channel — it shards on ``model`` exactly
    when its kernel is column-parallel (spec ends in 'model'), else
    replicates (row-parallel partial sums are scaled after the psum —
    scaling is linear so per-shard scaling commutes)."""
    if path_tail and path_tail[-1] in ("kernel_q8", "kernel_q4"):
        path_tail = path_tail[:-1] + ("kernel",)
    elif path_tail and path_tail[-1] == "scale" and len(path_tail) > 1 \
            and path_tail[-2] in ("qkv", "out", "up", "down", "embed_out",
                                  "expansion"):
        base = _neox_pspec(path_tail[:-1] + ("kernel",))
        n = ndim if ndim is not None else len(base)
        last = "model" if base[-1] == "model" else None
        return P(*([None] * (n - 1) + [last]))
    p = "/".join(path_tail)
    rules = {
        "layers/attn/qkv/kernel": P(None, None, "model"),
        "layers/attn/qkv/bias": P(None, "model"),
        "layers/attn/out/kernel": P(None, "model", None),
        "layers/attn/out/bias": P(None),
        "layers/mlp/up/kernel": P(None, None, "model"),
        "layers/mlp/up/bias": P(None, "model"),
        "layers/mlp/down/kernel": P(None, "model", None),
        "layers/mlp/down/bias": P(None),
        "layers/ln1/scale": P(None), "layers/ln1/bias": P(None),
        "layers/ln2/scale": P(None), "layers/ln2/bias": P(None),
        "final_ln/scale": P(None), "final_ln/bias": P(None),
        "embed_in/weight": P(None, None),
        "embed_out/kernel": P(None, "model"),
        "expansion/kernel": P(None, "model"),
        "expansion/bias": P("model"),
    }
    return rules[p]


def _path_names(path) -> tuple:
    names = []
    for k in path:
        if hasattr(k, "key"):
            names.append(k.key)
        elif hasattr(k, "name"):
            names.append(k.name)
        else:
            names.append(str(k))
    return tuple(names)


def param_pspecs(params) -> dict:
    """PartitionSpec pytree for a block-transformer or vanilla param tree."""

    def spec(path, leaf):
        names = _path_names(path)
        if names[0] in ("embedder",):
            if names[-2:] == ("embeddings", "weight"):
                return P(None, None)
            if names[-2:] == ("projection", "kernel"):
                return P(None, None, None)
            return P(None)
        if names[0] in ("block_decoder", "token_decoder"):
            names = names[1:]
        return _neox_pspec(names, ndim=getattr(leaf, "ndim", None))

    return jax.tree_util.tree_map_with_path(spec, params)


def param_shardings(mesh: Mesh, params):
    return jax.tree.map(lambda s: NamedSharding(mesh, s), param_pspecs(params))


def batch_pspec(mesh: Optional[Mesh] = None) -> P:
    """Spec for [B, N, ...] batch tensors: B over the data axes, and — when
    the mesh carries a ``seq`` axis — the block axis N over ``seq``."""
    if mesh is not None and "seq" in mesh.axis_names:
        return P(data_axes(mesh), "seq")
    if mesh is not None and "dcn" in mesh.axis_names:
        return P(("dcn", "data"))
    return P("data")


def shard_params(mesh: Mesh, params):
    """Place a (host-resident) param tree onto the mesh with TP shardings."""
    sh = param_shardings(mesh, params)
    return jax.tree.map(jax.device_put, params, sh)


def kv_cache_pspec() -> P:
    """[layers, batch, heads, capacity, head_dim]: batch on data, heads on
    model — the tensor-sharded global KV cache of BASELINE.json."""
    return P(None, "data", "model", None, None)
