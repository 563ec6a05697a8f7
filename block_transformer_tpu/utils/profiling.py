"""Tracing/profiling utilities — TPU counterpart of the reference's CUDA
events + torch.profiler machinery (SURVEY.md §5.1).

- ``trace(dir)``: JAX profiler trace (xplane/Perfetto) context.
- ``timed(fn)``: block_until_ready-bracketed wall time.
- ``decompose_generation``: per-phase timing of the two-level decode
  (block-decoder vs token-decoder split, the reference's
  ``generate(benchmark=True)`` decomposition — block_transformer.py:345-353)
  measured by running the separately-jitted phases outside the fused loop.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def trace(log_dir: str):
    with jax.profiler.trace(log_dir):
        yield


def timed(fn: Callable, *args, n_rep: int = 1, **kwargs):
    """Returns (result, mean_seconds). Blocks on all output leaves."""
    result = fn(*args, **kwargs)
    jax.block_until_ready(result)
    t0 = time.perf_counter()
    for _ in range(n_rep):
        result = fn(*args, **kwargs)
        jax.block_until_ready(result)
    return result, (time.perf_counter() - t0) / n_rep


def device_memory_stats() -> Dict[str, int]:
    return dict(jax.local_devices()[0].memory_stats() or {})


def decompose_generation(params, cfg, batch: int = 8, n_blocks: int = 32,
                         n_rep: int = 3) -> Dict[str, float]:
    """Time the decode phases separately: block-decoder step, token-decoder
    block decode (prefix + inner loop), embedder re-embed. Returns seconds
    per phase per block (mirrors the reference's benchmark=True printout)."""
    import numpy as np
    from block_transformer_tpu.inference import generate as gen
    from block_transformer_tpu.models import embedder as emb
    from block_transformer_tpu.models import neox

    n = cfg.n_embedding_tokens
    ph = cfg.embedder.projection_hidden_size
    dtype = params["embedder"]["embeddings"]["weight"].dtype
    cap = n_blocks * n

    cache = neox.KVCache.create(cfg.block_decoder, batch, cap, dtype=dtype)
    kv_valid = jnp.ones((batch, cap), jnp.int32)
    embeds = jnp.zeros((batch, n, ph), dtype)

    bd_step = jax.jit(lambda p, e, c, v: gen._block_decoder_step(
        p, cfg, e, c, v, jnp.ones((batch, n), jnp.int32)))
    td_block = jax.jit(lambda p, e: gen.decode_block_tokens(p, cfg, e))
    embed_fn = jax.jit(lambda p, t: emb.embed_blocks(
        p["embedder"], cfg.embedder, cfg.block_length, t))

    tokens = jnp.ones((batch, cfg.block_length), jnp.int32)
    _, t_bd = timed(bd_step, params, embeds, cache, kv_valid, n_rep=n_rep)
    _, t_td = timed(td_block, params, embeds, n_rep=n_rep)
    _, t_emb = timed(embed_fn, params, tokens, n_rep=n_rep)
    total = t_bd + t_td + t_emb
    return {
        "block_decoder_s": t_bd,
        "token_decoder_s": t_td,
        "embedder_s": t_emb,
        "total_per_block_s": total,
        "tokens_per_sec_est": batch * cfg.block_length / total,
    }
