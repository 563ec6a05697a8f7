"""Pipeline parallelism for the block-decoder stack (GPipe schedule).

The reference scales with DeepSpeed ZeRO-2 data parallelism only; this is
the TPU-native pipeline axis on top of the (data, model) mesh: the block
decoder's layer-stacked parameters ``[L, ...]`` shard their leading axis
over a ``pipe`` mesh axis, and the stack runs under ``shard_map`` with the
classic GPipe schedule — at tick ``t`` stage ``p`` processes microbatch
``t - p``, activations hop stage-to-stage with a single
``lax.ppermute`` per tick over ICI. The whole schedule is one
``lax.scan``, so it is jit-compiled once and **differentiable**: the
backward pass reverses the ppermute ring automatically, giving 1F1B-style
communication without hand-written backward plumbing.

Scope: BOTH decoder trunks pipeline over the same ``pipe`` axis — the
block decoder via ``make_pp_block_decoder_forward`` and the token
decoder's NeoX stack via ``make_pp_token_decoder_stack`` (substituted
through ``token_decoder_train_forward(stack_fn=...)``); the embedder and
LM head stay data-parallel. Each trunk's output leaves the shard_map
stacked per-stage (sharded over ``pipe``) and the last stage's entry is
sliced outside — GSPMD lowers that to a one-to-all broadcast from the
last stage, replacing the round-2 zero-padded ring ``psum``.

Bubble fraction is the usual (P-1)/(m+P-1) for P stages and m
microbatches; pick ``n_micro`` >= 4*P to keep it under ~20%.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from block_transformer_tpu.models import neox
from block_transformer_tpu.ops import masks as masks_lib


def _batch_axes(mesh: Mesh) -> tuple:
    from block_transformer_tpu.parallel import sharding as sh
    return sh.data_axes(mesh)


def make_pp_neox_layers(mesh: Mesh, cfg, n_micro: int, remat: bool = False):
    """Build the pipelined layer-stack forward.

    Returns ``fn(layers, x, q_idx, kv_idx, kv_valid) -> hidden`` where
    ``layers`` is the stacked ``[L, ...]`` param node (leading axis sharded
    over ``pipe``), ``x`` is ``[B, S, h]`` (batch sharded over data axes),
    and the mask triple is ops.masks.AttnMask's components.

    Output distribution (round-3 fix of the docstring's own last-stage
    psum note): the shard_map returns the PER-STAGE output stacked on a
    leading ``pipe``-sharded axis — spec-accurate, no collective inside
    the body — and the wrapper slices the last stage's entry outside.
    GSPMD lowers that slice-of-a-sharded-axis to a one-to-all broadcast
    from the last stage (1x payload on each link) instead of the round-2
    zero-padded ring ``psum`` (which moved the full payload through every
    stage and summed P-1 zero tensors).
    """
    assert "pipe" in mesh.axis_names, mesh.axis_names
    n_stages = int(mesh.shape["pipe"])
    assert cfg.num_layers % n_stages == 0, (cfg.num_layers, n_stages)
    bspec = P(_batch_axes(mesh))
    last = n_stages - 1
    m = n_micro

    def stage_layers(layers_local, x, kv_valid, cos, sin, positions,
                     q_idx, kv_idx):
        mask = masks_lib.AttnMask(q_idx, kv_idx, kv_valid)

        def body(h, p):
            h, _ = neox.neox_layer(p, h, cfg=cfg, mask=mask, cos=cos,
                                   sin=sin, positions=positions)
            return h, None

        if remat:
            body = jax.checkpoint(body)
        h, _ = jax.lax.scan(body, x, layers_local)
        return h

    def pipelined(layers_local, x, q_idx, kv_idx, kv_valid):
        stage = jax.lax.axis_index("pipe")
        B_loc, S, H = x.shape
        assert B_loc % m == 0, (B_loc, m)
        mb = B_loc // m
        cos, sin = neox.rope_tables(
            cfg, max(cfg.max_position_embeddings, S))
        positions = jnp.arange(S, dtype=jnp.int32)
        x_mb = x.reshape(m, mb, S, H)
        kv_mb = kv_valid.reshape(m, mb, S)

        def tick(state, t):
            # stage p works on microbatch t-p; before its first / after its
            # last microbatch it runs on don't-care data whose outputs are
            # never selected into ys[last:last+m]
            my_mb = jnp.clip(t - stage, 0, m - 1)
            x0 = jax.lax.dynamic_index_in_dim(x_mb, my_mb, 0, keepdims=False)
            x_in = jnp.where(stage == 0, x0, state)
            kv_in = jax.lax.dynamic_index_in_dim(kv_mb, my_mb, 0,
                                                 keepdims=False)
            y = stage_layers(layers_local, x_in, kv_in, cos, sin, positions,
                             q_idx, kv_idx)
            nxt = jax.lax.ppermute(
                y, "pipe", [(i, i + 1) for i in range(n_stages - 1)])
            return nxt, y

        ticks = jnp.arange(m + n_stages - 1, dtype=jnp.int32)
        _, ys = jax.lax.scan(tick, jnp.zeros((mb, S, H), x.dtype), ticks)
        # microbatch i leaves the last stage at tick i + (P-1); every stage
        # contributes its own slice to the stacked output and only the last
        # stage's entry is read — no in-body collective needed
        return ys[last:last + m].reshape(1, B_loc, S, H)

    stacked = shard_map(
        pipelined, mesh=mesh,
        in_specs=(P("pipe"), bspec + P(None, None), P(None), P(None),
                  bspec + P(None)),
        out_specs=P("pipe") + bspec + P(None, None),
        check_vma=False)

    def fn(layers, x, q_idx, kv_idx, kv_valid):
        out = stacked(layers, x, q_idx, kv_idx, kv_valid)
        # slice of the pipe-sharded axis -> one-to-all broadcast from the
        # last stage under GSPMD
        return out[n_stages - 1]

    return fn


def make_pp_block_decoder_forward(mesh: Mesh, n_micro: int):
    """A drop-in for models.block_decoder.block_decoder_forward that runs
    the layer stack pipelined over ``pipe`` (gpt-neo-x family only)."""

    def forward(params, cfg, inputs_embeds, block_attention_mask,
                n_embedding_tokens: int, remat: bool = False,
                cls: str = "gpt-neo-x", window: int = 256):
        assert cls == "gpt-neo-x", "pipeline parallel supports the NeoX block decoder"
        fn = make_pp_neox_layers(mesh, cfg, n_micro, remat=remat)
        mask = masks_lib.block_decoder_train_mask(block_attention_mask,
                                                  n_embedding_tokens)
        h = fn(params["layers"], inputs_embeds, mask.q_idx, mask.kv_idx,
               mask.kv_valid)
        return neox.layer_norm(h, params["final_ln"], cfg.layer_norm_eps)

    return forward


def make_pp_token_decoder_stack(mesh: Mesh, td_cfg, n_micro: int,
                                remat: bool = False):
    """``stack_fn`` for models.token_decoder.token_decoder_train_forward:
    the token-decoder NeoX stack runs GPipe-pipelined over ``pipe`` (same
    schedule as the block decoder — both trunks share the axis, so a
    (data, pipe) mesh pipelines the whole model's depth)."""
    fn = make_pp_neox_layers(mesh, td_cfg.neox, n_micro, remat=remat)

    def stack(params, x, mask, positions):
        del positions      # the pipelined stack uses arange(S), identical
        h = fn(params["layers"], x, mask.q_idx, mask.kv_idx, mask.kv_valid)
        return neox.layer_norm(h, params["final_ln"],
                               td_cfg.neox.layer_norm_eps)

    return stack


def pp_param_pspecs(params, mesh: Mesh,
                    pipe_token_decoder: bool = False) -> dict:
    """param_pspecs with the decoder layer stacks sharded over ``pipe`` on
    their leading (layer) axis (token decoder only when its stack actually
    runs pipelined). Axes the mesh doesn't have (e.g. ``model`` on a pure
    (data, pipe) mesh) fall back to replicated."""
    from block_transformer_tpu.parallel import sharding as sh
    pspecs = sh.param_pspecs(params)
    have = set(mesh.axis_names)
    piped = ("block_decoder", "token_decoder") if pipe_token_decoder \
        else ("block_decoder",)

    def scrub(entry):
        if entry is None:
            return None
        if isinstance(entry, tuple):
            kept = tuple(a for a in entry if a in have)
            return kept or None
        return entry if entry in have else None

    def reshard(path, spec):
        names = sh._path_names(path)
        parts = [scrub(e) for e in spec]
        if names[0] in piped and "layers" in names:
            parts[0] = "pipe"
        return P(*parts)

    return jax.tree_util.tree_map_with_path(
        reshard, pspecs, is_leaf=lambda x: isinstance(x, P))


def make_pp_train_step(mesh: Mesh, cfg, tx, params, n_micro: int,
                       remat: bool = True):
    """Jitted (dp x pp) training step: block decoder pipelined over
    ``pipe``, everything else data-parallel, optimizer state ZeRO-sharded
    (train_step._opt_state_pspecs) exactly as in the plain sharded step."""
    from block_transformer_tpu.models import block_transformer as bt
    from block_transformer_tpu.train import train_step as ts

    bd_fn = make_pp_block_decoder_forward(mesh, n_micro)
    td_fn = (make_pp_token_decoder_stack(mesh, cfg.token_decoder, n_micro,
                                         remat=remat)
             if cfg.token_decoder.cls == "gpt-neo-x"
             and cfg.token_decoder.decoding_strategy != "cross_attention"
             and cfg.token_decoder.neox.num_layers % mesh.shape["pipe"] == 0
             else None)

    def loss_fn(p, batch):
        out = bt.block_transformer_forward(
            p, cfg, batch["input_ids"], batch["attention_mask"],
            batch["block_attention_mask"], labels=batch["labels"],
            compute_logits=False, remat=remat, block_decoder_fn=bd_fn,
            token_decoder_stack_fn=td_fn)
        return out.loss, {"loss": out.loss}

    def train_step(state, batch):
        (loss, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, batch)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = jax.tree.map(lambda p, u: p + u.astype(p.dtype),
                                  state.params, updates)
        return ts.TrainState(new_params, opt_state, state.step + 1), metrics

    pspecs = pp_param_pspecs(params, mesh,
                             pipe_token_decoder=td_fn is not None)
    opt_pspecs = ts._opt_state_pspecs(tx, params, pspecs, mesh)
    state_spec = ts.TrainState(params=pspecs, opt_state=opt_pspecs, step=P())
    bp = P(_batch_axes(mesh))
    batch_spec = {k: bp for k in
                  ("input_ids", "attention_mask", "block_attention_mask",
                   "labels")}

    def to_sh(tree_spec):
        return jax.tree.map(lambda s: NamedSharding(mesh, s), tree_spec,
                            is_leaf=lambda x: isinstance(x, P))

    return jax.jit(train_step,
                   in_shardings=(to_sh(state_spec), to_sh(batch_spec)),
                   out_shardings=(to_sh(state_spec), None),
                   donate_argnums=(0,)), state_spec
