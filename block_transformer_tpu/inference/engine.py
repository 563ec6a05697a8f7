"""Continuous-batching serving engine (slot-based, block-synchronous).

The batch-serving layer of the build plan (SURVEY.md §7.2 step 5): a fixed
pool of ``n_slots`` sequence slots decodes **block-synchronously** — every
engine step produces one block (``block_length`` tokens) for every active
slot, the TPU-friendly generalization of the reference's
``unfinished_sequences`` bookkeeping (model/block_transformer.py:360-426).
Prompts are admitted into free slots between steps; a slot's region of the
global block-level KV cache is reset and re-prefilled on admission, while
other slots' caches persist — the two-level cache makes this cheap (the
global cache holds ONE vector per block, so even a 2048-token prompt is a
512-position prefill).

Round-2 design:

- The decode step runs the **same carried-cache stack as static-batch
  generation** (models/neox.neox_stack) with a per-slot ``write_pos``
  vector — each slot's K/V append scatters at its own frontier, in place
  on the donated scan carry. (The round-1 engine's xs/ys scan + full
  ``jnp.where`` copies were the exact formulation RESULTS.md measured at
  4-5x cache HBM.)
- ``kv_cache="int8"`` serves from the hierarchical INT8 ``QuantKVCache``
  (the BASELINE.json north star) through the fused Pallas decode-attention
  kernel; ``"bf16"`` uses the plain cache.
- **Prompt-length bucketing**: admission pads the prompt to the next
  ``bucket_blocks`` multiple, so the prefill jit compiles once per bucket
  instead of once per novel prompt length (compiles are minutes on this
  platform).
- Full sampling surface (greedy / temperature / top-k / top-p) threads to
  the shared ``decode_block_tokens``.
- **Adaptive decode windows**: the window length is a *traced* argument
  of one ``lax.while_loop`` program (single compile, device-side early
  exit when every slot is dead), so the host sizes each window to the
  next scheduling event — short (``sync_blocks``) while prompts wait for
  a slot, up to ``max_window`` (the earliest budget exhaustion among
  live slots) when the queue is empty. Fixed per-dispatch tunnel latency
  (~34 ms measured) amortizes over the largest window the schedule
  allows instead of a constant 8 blocks.

All device work happens in two jitted functions; the scheduler is
host-side Python, matching the design where XLA owns the math and the
runtime owns admission/eviction.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field
from typing import Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from block_transformer_tpu.config import BlockTransformerConfig
from block_transformer_tpu.inference import generate as gen
from block_transformer_tpu.models import embedder as emb
from block_transformer_tpu.models import neox
from block_transformer_tpu.ops import linear as ops_linear
from block_transformer_tpu.ops import masks

import contextlib


@dataclass
class Request:
    uid: int
    prompt: np.ndarray              # [T] token ids
    max_new_tokens: int
    generated: List[int] = field(default_factory=list)
    done: bool = False
    error: Optional[str] = None
    stream: Optional[Callable[[int, List[int]], None]] = None
    # host-wall latency stamps (perf_counter): queue wait = admitted -
    # submitted; TTFT = first_token - submitted; TPOT = (done -
    # first_token) / max(1, tokens - 1)
    submitted_at: float = 0.0
    admitted_at: float = 0.0
    first_token_at: float = 0.0
    done_at: float = 0.0


@dataclass
class EngineStats:
    steps: int = 0
    tokens_generated: int = 0
    prompts_admitted: int = 0
    prompts_finished: int = 0
    # block-synchronous overhead: positions decoded past a request's EOS /
    # max_new_tokens inside its final block (paid but not emitted)
    tokens_wasted: int = 0


def _round_up(x, m):
    return -(-x // m) * m


def _leaf_names(tree):
    import jax.tree_util as jtu
    for path, _ in jtu.tree_flatten_with_path(tree)[0]:
        yield "/".join(getattr(k, "key", str(k)) for k in path)


class ContinuousBatchingEngine:
    def __init__(self, params, cfg: BlockTransformerConfig, *, n_slots: int = 8,
                 max_blocks: int = 512, greedy: bool = True,
                 temperature: float = 1.0, top_k: int = 0, top_p: float = 1.0,
                 kv_cache: str = "bf16", bucket_blocks: int = 64,
                 sync_blocks: int = 4, max_window: int = 64, seed: int = 0,
                 page_size: int = 256, pool_pages: Optional[int] = None,
                 mesh=None, mesh_impl: str = "gspmd",
                 latency_mode: bool = False, window_growth: float = 2.0,
                 overlap_streams: int = 1, admit_chunk: int = 64):
        self.params = params
        self.cfg = cfg
        self.n_slots = n_slots
        self.max_blocks = max_blocks
        self.greedy = greedy
        self.temperature = temperature
        self.top_k = top_k
        self.top_p = top_p
        self.bucket_blocks = max(1, bucket_blocks)
        # blocks decoded per host sync UNDER QUEUE PRESSURE: admission
        # latency granularity vs device->host roundtrips (the tunnel's
        # per-sync latency dominated the per-block engine at 17% of static
        # throughput). With an empty queue windows grow adaptively up to
        # max_window (the decode program takes the window length as a
        # traced argument — one compile covers every size).
        self.sync_blocks = max(1, sync_blocks)
        self.max_window = max(self.sync_blocks, max_window)
        # Latency policy (round-3): pure adaptive windows maximize
        # throughput by collapsing a request lifetime into ~2 dispatches,
        # but then EVERY token arrives at the end — measured TTFT p50 of
        # 14.3 s on a 0.54 s decode (BENCH_DETAIL_engine_b16 r2). In
        # latency mode the first window after any admission is capped at
        # ``sync_blocks`` (first tokens stream one window into decode) and
        # subsequent windows grow by ``window_growth`` per dispatch, so
        # the dispatch count stays O(log(budget/sync_blocks)) — bounded
        # throughput cost — while TTFT collapses to the window cadence.
        self.latency_mode = latency_mode
        self.window_growth = max(1.0, window_growth)
        self._window_cap = self.sync_blocks if latency_mode else self.max_window
        # Admission-prefill chunking (VERDICT r4 item 5): one batched
        # prefill over ALL admitted prompts is a G-row program where G is
        # whatever happened to be admissible — at 128-384 slots that is
        # both an unbounded compile-shape family (every distinct G
        # retraces) and a multi-second single dispatch (TTFT floor).
        # Groups are split into chunks of <= admit_chunk rows, each padded
        # up to the next power of two by duplicating its last row
        # (duplicate scatter indices write identical values, so the
        # result is deterministic) — compile shapes are the fixed family
        # {1, 2, 4, ..., admit_chunk} x buckets.
        self.admit_chunk = max(1, admit_chunk)
        n = cfg.n_embedding_tokens
        ph = cfg.embedder.projection_hidden_size
        # activation dtype: follow a (never-quantized) embedder table — the
        # lookup table or an encoder-embedder's word embeddings (quantized
        # trees carry int8 kernels, so "first leaf" would be wrong)
        e = params["embedder"]
        table = (e.get("embeddings") or e.get("roberta", {}).get("word_embeddings")
                 or e.get("t5", {}).get("embed"))
        dtype = table["weight"].dtype
        # lane-aligned capacity so the fused kernels tile cleanly
        cap = max_blocks * n
        self.cap = cap = _round_up(cap, 128) if cap >= 128 else cap
        self.kv_kind = kv_cache

        # persistent device state (global cache + per-slot bookkeeping).
        # creation happens under jit: eager int4 allocation trips an axon
        # platform bug, and jit is cheaper on the tunnel anyway
        if kv_cache.startswith("paged"):
            # INT8 (or INT4: "paged-int4") page pool: HBM scales with
            # resident tokens, not n_slots x max capacity. Admission
            # allocates pages from a free list; page 0 is the null page.
            # Over a shard_map mesh the pool PARTITIONS across the data
            # shards (each shard's sub-pool serves its own slots; page
            # ids in the table are shard-local, every shard's local page
            # 0 is its null page) — per-shard free lists below.
            bits = 4 if kv_cache.endswith("int4") else 8
            self.page_size = ps = min(page_size, cap)
            self.cap = cap = _round_up(cap, ps)
            self.n_virt = cap // ps
            self._paged_dp = 1
            if mesh is not None and mesh_impl == "shard_map":
                from block_transformer_tpu.parallel import sharding as sh
                self._paged_dp = int(np.prod(
                    [mesh.shape[a] for a in sh.data_axes(mesh)]))
            dp = self._paged_dp
            # default pool: half the fully-dense footprint, min 1 slot's worth
            self.pool_pages = pool_pages or max(
                self.n_virt + 1, n_slots * self.n_virt // 2 + 1)
            # per-shard sub-pools need equal page counts (>= nv+1 each so
            # one max-length request always fits a shard)
            per_shard = max(self.n_virt + 1, -(-self.pool_pages // dp))
            self.pool_pages = per_shard * dp
            self.cache = jax.jit(lambda: neox.PagedKVCache.create(
                cfg.block_decoder, n_slots, cap, n_pages=self.pool_pages,
                page_size=ps, bits=bits))()
            # shard-local ids 1..per_shard-1 (0 = the shard's null page)
            self._pages_per_shard = per_shard
            self._free_pages = [list(range(1, per_shard)) for _ in range(dp)]
            self._slot_pages: Dict[int, list] = {}
            # admission prefill still runs a contiguous mini-cache and then
            # scatters its pages into the pool
            self._make_cache = lambda b: neox.QuantKVCache.create(
                cfg.block_decoder, b, cap, bits=bits)
        else:
            self._make_cache = lambda b: neox.make_kv_cache(
                cfg.block_decoder, b, cap, kv_cache, dtype=dtype)
            self.cache = jax.jit(lambda: self._make_cache(n_slots))()
        # per-slot cache write positions differ -> carry per-slot lengths and
        # use position-indexed masks
        self.slot_len = jnp.zeros((n_slots,), jnp.int32)     # blocks used
        self.kv_valid = jnp.zeros((n_slots, cap), jnp.int32)
        self.next_embeds = jnp.zeros((n_slots, n, ph), dtype)
        # device-authoritative liveness: EOS clears alive and budgets hit
        # zero ON DEVICE, so decode windows stay correct even when the host
        # consumes their tokens a window late (pipelined run loop)
        self.alive = jnp.zeros((n_slots,), bool)
        self.blocks_left = jnp.zeros((n_slots,), jnp.int32)
        self.key = jax.random.PRNGKey(seed)

        # host-side bookkeeping
        self.active: Dict[int, Request] = {}   # slot -> request
        self._dispatched: Dict[int, int] = {}  # slot -> blocks dispatched
        self.waiting: List[Request] = []
        self.completed: List[Request] = []
        self.stats = EngineStats()
        self._uid = 0

        # Mesh serving comes in two implementations:
        # - "gspmd": annotate shardings and jit; every quantized matmul
        #   must dispatch to XLA at trace time (pallas_call has no GSPMD
        #   partitioning rule — the XLA dequant+dot partitions like any
        #   dot).
        # - "shard_map": the two device programs are explicit-collective
        #   shard_map bodies (parallel/tp_decode.py) — every mesh axis is
        #   Manual, so the fused Pallas kernels (INT4 dequant matmul,
        #   fused INT8-KV attention) run per shard at their single-device
        #   numerics.
        self.mesh_impl = mesh_impl if mesh is not None else "single"
        # trace context for every device dispatch: declares the KV mode
        # (pairing-aware W8A8, ops/linear._use_w8a8) and, for GSPMD mesh
        # serving, routes quantized matmuls to partitionable XLA paths
        kvm = "int8" if kv_cache.startswith("paged") else kv_cache

        @contextlib.contextmanager
        def _ctx():
            with ops_linear.kv_mode(kvm):
                if self.mesh_impl == "gspmd" and mesh is not None:
                    with ops_linear.pallas_disabled():
                        yield
                else:
                    yield

        self._trace_ctx = _ctx
        if mesh is not None:
            self._shard_over(mesh)

        if self.mesh_impl == "shard_map":
            from block_transformer_tpu.parallel import tp_decode
            self._prefill, self._decode = tp_decode.make_tp_engine_programs(
                mesh, cfg, self.params, self.cache, n_slots=n_slots,
                capacity=self.cap, max_window=self.max_window,
                kv_cache=self.kv_kind, greedy=greedy,
                temperature=temperature, top_k=top_k, top_p=top_p,
                overlap_streams=overlap_streams)
        else:
            self._prefill = self._make_prefill()  # retraces once per bucket
            self._decode = self._make_decode()

    def _slot_shard(self, slot: int) -> int:
        """Data shard owning ``slot`` (paged allocator routing; 0 when
        single-device)."""
        dp = getattr(self, "_paged_dp", 1)
        return slot // (self.n_slots // dp)

    def _shard_over(self, mesh):
        """Serve over a (data, model) mesh: slots shard over the data axes,
        attention heads / TP weight shards over ``model`` — the sharded
        generate_blocks layout (tests/test_sharded_decode.py) applied to
        the persistent engine state. GSPMD propagates these shardings
        through the jitted prefill/decode-window programs, so the same
        engine code serves one chip or a pod slice.

        Paged pools serve over a mesh through ``mesh_impl='shard_map'``
        only: pool pages PARTITION across the data shards (axis 1 of the
        pool arrays; each shard's sub-pool holds its own slots' pages at
        shard-local ids) and heads shard over ``model``, so the fused
        page-table Pallas kernel runs per shard and pool HBM scales
        1/(dp*tp). The GSPMD route stays unsupported by design:
        ``pallas_call`` has no GSPMD partitioning rule, and the only XLA
        fallback for page-table attention is a gather that materializes
        a full copy of the active cache per decode step — the exact cost
        the paged kernel exists to avoid."""
        from jax.sharding import NamedSharding, PartitionSpec as P
        from block_transformer_tpu.parallel import sharding as sh
        assert self.n_slots % np.prod(
            [mesh.shape[a] for a in sh.data_axes(mesh)]) == 0, \
            (self.n_slots, dict(mesh.shape))
        self.mesh = mesh
        d = sh.data_axes(mesh)
        put = lambda x, spec: jax.device_put(x, NamedSharding(mesh, spec))
        if self.mesh_impl == "shard_map":
            # explicit-collective programs: head-major QKV layout (+ int4
            # per-shard repacking) and the manual-mode TP specs
            from block_transformer_tpu.parallel import tp_decode
            assert self.kv_kind in ("bf16", "int8", "paged",
                                    "paged-int4"), self.kv_kind
            self.params = tp_decode.prepare_tp_params(
                self.params, self.cfg, tp=int(mesh.shape["model"]))
            shardings = jax.tree.map(lambda s: NamedSharding(mesh, s),
                                     tp_decode.tp_param_specs(self.params),
                                     is_leaf=lambda x: isinstance(x, P))
            self.params = jax.tree.map(jax.device_put, self.params, shardings)
        else:
            assert not self.kv_kind.startswith("paged"), \
                "paged + mesh requires mesh_impl='shard_map' (see docstring)"
            self.params = jax.tree.map(
                jax.device_put, self.params,
                sh.param_shardings(mesh, self.params))
        self.cache = jax.tree.map(
            lambda x: put(x, sh.kv_cache_pspec()) if x.ndim == 5 else
            (put(x, P(None, d, "model", None)) if x.ndim == 4    # scales
             else (put(x, P(d)) if x.ndim == 2                   # page table
                   else put(x, P()))), self.cache)
        self.kv_valid = put(self.kv_valid, P(d))
        self.next_embeds = put(self.next_embeds, P(d))
        self.slot_len = put(self.slot_len, P(d))
        self.alive = put(self.alive, P(d))
        self.blocks_left = put(self.blocks_left, P(d))
        self.key = put(self.key, P())

    # ------------------------------------------------------------------
    def submit(self, prompt, max_new_tokens: int,
               stream: Optional[Callable] = None) -> int:
        import time
        self._uid += 1
        self.waiting.append(Request(self._uid, np.asarray(prompt, np.int32),
                                    max_new_tokens, stream=stream,
                                    submitted_at=time.perf_counter()))
        return self._uid

    def has_work(self) -> bool:
        return bool(self.waiting or self.active)

    def latency_metrics(self, skip: int = 0) -> dict:
        """Serving latency aggregates over completed requests (host wall
        clock): queue wait (submit -> admit), TTFT (submit -> first token)
        and TPOT (per-output-token time after the first). Block-synchronous
        decode emits tokens a window at a time, so TTFT is quantized to
        the window cadence — these are the honest user-visible numbers.

        ``skip``: ignore the first ``skip`` completed requests — callers
        that benchmark in reps snapshot ``len(eng.completed)`` at rep
        start so the reported latency describes the same population as
        the rep's throughput (ADVICE r4)."""
        done = [r for r in self.completed[skip:]
                if not r.error and r.generated and r.first_token_at]
        if not done:
            return {"completed": 0}

        def pct(xs, q):
            xs = sorted(xs)
            return float(xs[min(len(xs) - 1, int(q * len(xs)))])

        queue = [r.admitted_at - r.submitted_at for r in done]
        ttft = [r.first_token_at - r.submitted_at for r in done]
        tpot = [(r.done_at - r.first_token_at) / max(1, len(r.generated) - 1)
                for r in done]
        return {
            "completed": len(done),
            "queue_wait_s_mean": float(np.mean(queue)),
            "ttft_s_mean": float(np.mean(ttft)),
            "ttft_s_p50": pct(ttft, 0.50), "ttft_s_p95": pct(ttft, 0.95),
            "tpot_s_mean": float(np.mean(tpot)),
            "tpot_s_p95": pct(tpot, 0.95),
        }

    # ------------------------------------------------------------------
    def _make_prefill(self):
        cfg = self.cfg
        n = cfg.n_embedding_tokens
        cap = self.cap

        @functools.partial(jax.jit, donate_argnums=(1, 2, 3))
        def prefill(params, cache, kv_valid, next_embeds, slots, true_len,
                    ids, att, bam):
            """Reset G slots and prefill their cache regions in ONE batched
            run (the serial batch-1 admission loop measured the engine at
            ~55% of static throughput — G prompts of the same length
            bucket prefill together at batch G).

            ids/att: [G, Nb, L] right-padded to the bucket; bam: [G, Nb];
            slots, true_len (real prompt blocks): [G] int32. The G cache
            rows run as a standalone mini-cache, then scatter into the
            pooled cache along the slot axis; padded-tail positions stay
            kv_valid=0 and are overwritten as decode advances.
            """
            G = ids.shape[0]
            be = emb.embed_blocks(params["embedder"], cfg.embedder,
                                  cfg.block_length, ids,
                                  attention_mask=att)          # [G, Nb, n, ph]
            x = be.reshape(G, -1, be.shape[-1])
            S = x.shape[1]
            valid = jnp.zeros((G, cap), jnp.int32)
            valid = jax.lax.dynamic_update_slice(
                valid, jnp.repeat(bam.astype(jnp.int32), n, axis=1), (0, 0))
            mask = masks.block_decode_mask(jnp.int32(0), cap, S, valid, n)
            positions = jnp.arange(S, dtype=jnp.int32)
            row_cache = self._make_cache(G)
            hidden, row_cache = neox.neox_stack(
                params["block_decoder"], x.astype(x.dtype),
                cfg=cfg.block_decoder, mask=mask, positions=positions,
                cache=row_cache)
            # scatter the G rows back into the pooled cache/state
            if isinstance(cache, neox.PagedKVCache):
                # page-granular scatter into the pool: each row's virtual
                # pages land at its allocated pool pages (unallocated tail
                # pages target the null page 0 — masked, contents don't
                # matter)
                ps = cache.page_size
                nv = cap // ps
                pt_rows = cache.page_table[slots]            # [G, nv]
                if cache.k.dtype == jnp.int8:
                    # page-granular Pallas copy: index maps place each
                    # row's pages directly, pool aliased in place — the
                    # XLA gather-indexed scatter serialized per page
                    # (paged admit measured 0.29 s vs 0.13 s contiguous).
                    # BT_PAGED_PROBE_NOCOPY=1 (probe only, trace-time,
                    # scripts/paged_admit_probe.py) skips the placement
                    # so its cost can be isolated on chip — the pool is
                    # then WRONG; never set outside the probe.
                    import os as _os
                    from block_transformer_tpu.ops import paged_attention
                    interp = jax.devices()[0].platform != "tpu"
                    if _os.environ.get("BT_PAGED_PROBE_NOCOPY") == "1":
                        new_cache = cache
                    else:
                        nk, nks, nv_, nvs = \
                            paged_attention.paged_page_copy_int8(
                                cache.k, cache.k_scale, cache.v,
                                cache.v_scale, pt_rows, row_cache.k,
                                row_cache.k_scale, row_cache.v,
                                row_cache.v_scale, interpret=interp)
                        new_cache = cache._replace(k=nk, v=nv_, k_scale=nks,
                                                   v_scale=nvs)
                else:
                    def paged_vals(a):
                        if a.ndim == 5:
                            Lx, Gx, Hx, cx, Dx = a.shape
                            return a.reshape(Lx, Gx, Hx, nv, ps, Dx
                                             ).transpose(0, 1, 3, 2, 4, 5)
                        Lx, Gx, Hx, cx = a.shape
                        return a.reshape(Lx, Gx, Hx, nv, ps
                                         ).transpose(0, 1, 3, 2, 4)

                    new_cache = cache._replace(
                        k=cache.k.at[:, pt_rows].set(paged_vals(row_cache.k)),
                        v=cache.v.at[:, pt_rows].set(paged_vals(row_cache.v)),
                        k_scale=cache.k_scale.at[:, pt_rows].set(
                            paged_vals(row_cache.k_scale)),
                        v_scale=cache.v_scale.at[:, pt_rows].set(
                            paged_vals(row_cache.v_scale)))
            else:
                updates = {
                    f: getattr(cache, f).at[:, slots].set(getattr(row_cache, f))
                    for f in cache._fields if f != "length"}
                new_cache = cache._replace(**updates)
            # zero validity beyond each true prompt (padded bucket tail)
            valid = jnp.where(jnp.arange(cap)[None] < true_len[:, None] * n,
                              valid, 0)
            kv_valid = kv_valid.at[slots].set(valid)
            # block-decoder output at each LAST REAL prompt block
            idx = (true_len[:, None] - 1) * n + jnp.arange(n)[None]  # [G, n]
            last = jnp.take_along_axis(hidden, idx[:, :, None], axis=1)
            next_embeds = next_embeds.at[slots].set(
                last.astype(next_embeds.dtype))
            return new_cache, kv_valid, next_embeds

        return prefill

    def _make_decode(self):
        cfg = self.cfg
        n = cfg.n_embedding_tokens
        L = cfg.block_length
        cap = self.cap
        I = self.max_window

        def one_block(params, carry, _):
            """One block for every live slot. Per-slot write offsets feed
            ``neox_stack(write_pos=...)`` — in-place scatter on the carried
            cache, same numerics as static-batch decode."""
            (cache, kv_valid, next_embeds, slot_len, alive,
             blocks_left, key) = carry
            B = next_embeds.shape[0]
            live = alive & (blocks_left > 0)
            key, kb = jax.random.split(key)
            tokens, inner_alive = gen.decode_block_tokens(
                params, cfg, next_embeds, greedy=self.greedy,
                temperature=self.temperature, top_k=self.top_k,
                top_p=self.top_p, key=kb)
            tokens = jnp.where(live[:, None], tokens, cfg.pad_token_id)
            has_eos = live & ~inner_alive

            # embed the new block and run the block decoder one step per slot
            new_be = emb.embed_blocks(params["embedder"], cfg.embedder,
                                      L, tokens)                 # [B, n, ph]
            new_be = jnp.where(live[:, None, None], new_be, 0.0)

            # per-slot positions: q position = slot_len (in blocks)
            q_idx = jnp.broadcast_to(slot_len[:, None], (B, n))  # block ids
            kv_idx = (jnp.arange(cap, dtype=jnp.int32) // n)
            write_pos = slot_len * n
            valid_new = live.astype(jnp.int32)
            kv_valid2 = _scatter_valid(kv_valid, write_pos, valid_new, n)
            mask = masks.AttnMask(q_idx, kv_idx, kv_valid2)
            positions = write_pos[:, None] + jnp.arange(n, dtype=jnp.int32)[None]

            hidden, cache2 = neox.neox_stack(
                params["block_decoder"], new_be.astype(next_embeds.dtype),
                cfg=cfg.block_decoder, mask=mask, positions=positions,
                cache=cache, write_pos=write_pos)
            next_embeds2 = hidden[:, -n:, :].astype(next_embeds.dtype)
            next_embeds2 = jnp.where(live[:, None, None],
                                     next_embeds2, next_embeds)
            carry = (cache2, kv_valid2, next_embeds2,
                     slot_len + valid_new, alive & inner_alive,
                     blocks_left - valid_new, key)
            return carry, (tokens, has_eos)

        @functools.partial(jax.jit, donate_argnums=(1, 2, 3, 4, 5, 6, 7))
        def decode_window(params, cache, kv_valid, next_embeds, slot_len,
                          alive, blocks_left, key, window_len):
            """Up to ``max_window`` block steps in ONE dispatch. The host
            syncs (device->host token copy over the tunnel, ~tens of ms of
            latency) once per window instead of once per block — the
            per-block sync measured the engine at 17% of static-batch
            throughput. ``window_len`` is a *traced* scalar: one compile
            serves every window size the scheduler picks, and the
            while_loop exits early when every slot is dead, so oversized
            windows never pay for dead blocks. EOS and per-slot token
            budgets live ON DEVICE (``alive``/``blocks_left`` thread
            through and come back), so a finished slot stops paying even
            if the host consumes results a window late (the pipelined
            ``run`` loop). Buffer rows past the executed prefix keep their
            pad/False init — the host trims to the window_len it chose.
            """
            B = next_embeds.shape[0]
            tokens_buf = jnp.full((I, B, L), cfg.pad_token_id, jnp.int32)
            eos_buf = jnp.zeros((I, B), bool)
            carry = (cache, kv_valid, next_embeds, slot_len,
                     alive, blocks_left, key)

            def cond(state):
                i, _, _, c = state
                return (i < window_len) & jnp.any(c[4] & (c[5] > 0))

            def body(state):
                i, tok, eos, c = state
                c, (t, he) = one_block(params, c, None)
                return i + 1, tok.at[i].set(t), eos.at[i].set(he), c

            _, tokens, has_eos, carry = jax.lax.while_loop(
                cond, body, (jnp.int32(0), tokens_buf, eos_buf, carry))
            (cache, kv_valid, next_embeds, slot_len, alive, blocks_left,
             key) = carry
            # tokens: [I, B, L] -> [B, I, L]; has_eos: [I, B] -> [B, I]
            return (tokens.transpose(1, 0, 2), has_eos.T, cache, kv_valid,
                    next_embeds, slot_len, alive, blocks_left, key)

        return decode_window

    # ------------------------------------------------------------------
    def _admit(self):
        free = [s for s in range(self.n_slots) if s not in self.active]
        L = self.cfg.block_length
        # preprocess + bucket every admissible prompt, grouping by bucket so
        # same-length-bucket prompts prefill together in ONE batched call
        groups: Dict[int, list] = {}
        skipped: List[Request] = []          # didn't fit the page pool now
        while free and self.waiting:
            slot = free.pop(0)
            req = self.waiting.pop(0)
            d = gen.preprocess_inputs(self.cfg, req.prompt[None])
            N = d["input_ids"].shape[1]
            if N + (req.max_new_tokens + L - 1) // L > self.max_blocks:
                # too long for this pool: surface as completed-with-error
                # instead of vanishing (callers poll run()/completed)
                req.done = True
                req.error = (f"prompt needs {N} blocks + "
                             f"{(req.max_new_tokens + L - 1) // L} generated "
                             f"> pool max_blocks={self.max_blocks}")
                self.completed.append(req)
                free.insert(0, slot)
                continue
            if self.kv_kind.startswith("paged"):
                # allocate this request's pages now (prompt + full budget,
                # so decode never needs a mid-flight grow); first-fit when
                # the pool is tight — a large head request doesn't convoy
                # smaller ones behind it (skipped requests keep queue order
                # and retry next admission as pages free). Pages come from
                # the slot's data-shard sub-pool (shard-local ids; dp=1
                # single-device degenerates to one global list).
                blocks_budget = (req.max_new_tokens + L - 1) // L
                n_emb = self.cfg.n_embedding_tokens
                need = min(self.n_virt,
                           -(-((N + blocks_budget) * n_emb) // self.page_size))
                shard_free = self._free_pages[self._slot_shard(slot)]
                if len(shard_free) < need:
                    skipped.append(req)
                    free.insert(0, slot)
                    continue
                pgs = [shard_free.pop() for _ in range(need)]
                self._slot_pages[slot] = pgs
                row = np.zeros((self.n_virt,), np.int32)
                row[:len(pgs)] = pgs
                self.cache = self.cache._replace(
                    page_table=self.cache.page_table.at[slot].set(
                        jnp.asarray(row)))
            Nb = min(_round_up(N, self.bucket_blocks), self.max_blocks)
            groups.setdefault(Nb, []).append((slot, req, d, N))
        if skipped:
            self.waiting = skipped + self.waiting
        for Nb, batch in groups.items():
            for c0 in range(0, len(batch), self.admit_chunk):
                self._prefill_chunk(Nb, batch[c0:c0 + self.admit_chunk])

    def _prefill_chunk(self, Nb: int, batch) -> None:
        """Batched prefill of one admission chunk (same Nb bucket), padded
        to the next power of two by duplicating the last row (identical
        duplicate scatter writes — deterministic result, fixed compile-
        shape family)."""
        L = self.cfg.block_length
        G = len(batch)
        Gp = 1 << (G - 1).bit_length()           # next power of two
        padded = batch + [batch[-1]] * (Gp - G)
        ids = np.concatenate([
            np.pad(d["input_ids"], ((0, 0), (0, Nb - N), (0, 0)),
                   constant_values=self.cfg.pad_token_id)
            for _, _, d, N in padded])
        att = np.concatenate([
            np.pad(d["attention_mask"], ((0, 0), (0, Nb - N), (0, 0)))
            for _, _, d, N in padded])
        bam = np.concatenate([
            np.pad(d["block_attention_mask"], ((0, 0), (0, Nb - N)))
            for _, _, d, N in padded])
        slots = np.asarray([s for s, _, _, _ in padded], np.int32)
        lens = np.asarray([N for _, _, _, N in padded], np.int32)
        with self._trace_ctx():
            self.cache, self.kv_valid, self.next_embeds = self._prefill(
                self.params, self.cache, self.kv_valid, self.next_embeds,
                jnp.asarray(slots), jnp.asarray(lens), jnp.asarray(ids),
                jnp.asarray(att), jnp.asarray(bam))
        sl = jnp.asarray(slots[:G])
        self.slot_len = self.slot_len.at[sl].set(jnp.asarray(lens[:G]))
        self.alive = self.alive.at[sl].set(True)
        self.blocks_left = self.blocks_left.at[sl].set(jnp.asarray(
            [-(-r.max_new_tokens // L) for _, r, _, _ in batch], np.int32))
        import time
        now = time.perf_counter()
        for slot, req, _, _ in batch:
            self.active[slot] = req
            self._dispatched[slot] = 0
            req.admitted_at = now
            self.stats.prompts_admitted += 1
        if self.latency_mode:
            # fresh admissions restart the window ramp so their first
            # tokens arrive one sync_blocks window into decode
            self._window_cap = self.sync_blocks

    def _target_window(self) -> int:
        """Blocks until the next scheduling event the host can foresee:
        the earliest budget exhaustion among active slots (a slot can only
        free at EOS — unpredictable, device-masked — or budget end, which
        the host tracks exactly via dispatched-block counts). Capped at
        ``sync_blocks`` while prompts wait for a slot, so admission
        latency stays bounded under queue pressure; 0 when every active
        slot's budget is already fully covered by in-flight windows."""
        L = self.cfg.block_length
        rem = []
        for s, req in self.active.items():
            r = -(-req.max_new_tokens // L) - self._dispatched.get(s, 0)
            if r > 0:
                rem.append(r)
        if not rem:
            return 0
        wl = min(min(rem), self.max_window)
        if self.waiting:
            wl = min(wl, self.sync_blocks)
        if self.latency_mode:
            wl = min(wl, int(self._window_cap))
        return max(1, wl)

    def _dispatch(self, window_len: Optional[int] = None):
        """Queue one decode window on the device (non-blocking) and return
        the device token/eos handles with the slot snapshot they cover."""
        wl = window_len or self.sync_blocks
        with self._trace_ctx():
            (tokens, has_eos, self.cache, self.kv_valid, self.next_embeds,
             self.slot_len, self.alive, self.blocks_left, self.key) = \
                self._decode(self.params, self.cache, self.kv_valid,
                             self.next_embeds, self.slot_len, self.alive,
                             self.blocks_left, self.key, np.int32(wl))
        for s in self.active:
            self._dispatched[s] = self._dispatched.get(s, 0) + wl
        self.stats.steps += 1
        if self.latency_mode:
            self._window_cap = min(self.max_window,
                                   self._window_cap * self.window_growth)
        # start the device->host copies NOW: transfers are stream-ordered,
        # so a copy first requested at consume time would queue BEHIND the
        # next window's compute and re-serialize the pipeline (measured
        # ~42ms of fixed cost per window without this)
        for a in (tokens, has_eos):
            try:
                a.copy_to_host_async()
            except (AttributeError, RuntimeError):
                break                          # backend without async copy
        # snapshot slot->request AT DISPATCH: under the pipelined run loop a
        # slot freed by an earlier window may be re-admitted to a NEW
        # request before this window is consumed — its tokens must still be
        # attributed to the request that was live when it was dispatched
        return tokens, has_eos, dict(self.active), wl

    def _consume(self, window):
        """Host-side trim of one window's tokens ([B, max_window, L]).
        Only the first ``wl`` blocks were (possibly) executed — rows past
        that keep their pad init and must not be read as output.
        ``np.asarray`` here is the one device->host sync per window."""
        import time
        tokens_d, eos_d, snapshot, wl = window
        tokens = np.asarray(tokens_d)
        has_eos = np.asarray(eos_d)
        now = time.perf_counter()
        finished = []
        for s, req in snapshot.items():
            if req.done:
                continue
            eos = False
            for i in range(min(wl, tokens.shape[1])):
                if eos or len(req.generated) >= req.max_new_tokens:
                    break
                block = [int(t) for t in tokens[s, i]]
                remaining = req.max_new_tokens - len(req.generated)
                emit = []
                for t in block[:remaining]:
                    if t == self.cfg.pad_token_id and has_eos[s, i]:
                        break
                    emit.append(t)
                req.generated.extend(emit)
                if emit and not req.first_token_at:
                    req.first_token_at = now
                self.stats.tokens_generated += len(emit)
                self.stats.tokens_wasted += len(block) - len(emit)
                if req.stream:
                    req.stream(req.uid, emit)
                eos = bool(has_eos[s, i])
            if eos or len(req.generated) >= req.max_new_tokens:
                req.done = True
                req.done_at = now
                finished.append(s)
        for s in finished:
            req = snapshot[s]
            self.completed.append(req)
            if self.active.get(s) is req:
                del self.active[s]
                self._dispatched.pop(s, None)
                if self.kv_kind.startswith("paged"):
                    self._free_pages[self._slot_shard(s)].extend(
                        self._slot_pages.pop(s, []))
                    # point the dead slot at the null page: decode windows
                    # run for EVERY slot (liveness only masks tokens), so a
                    # stale row would keep scattering K/V into pages that
                    # may since belong to another request
                    self.cache = self.cache._replace(
                        page_table=self.cache.page_table.at[s].set(0))
            self.stats.prompts_finished += 1

    def step(self):
        """Admit waiting prompts, then decode one adaptively-sized window
        with ONE device dispatch + ONE host sync (unpipelined)."""
        self._admit()
        if not self.active:
            return
        self._consume(self._dispatch(self._target_window() or 1))

    def run(self, max_steps: int = 10_000) -> List[Request]:
        """Drive windows until all submitted work finishes (or max_steps);
        returns the completed requests.

        The loop is PIPELINED one window deep: window i+1 is dispatched
        before window i's tokens are pulled to the host, so the
        device->host roundtrip (tens of ms over this platform's tunnel)
        overlaps the next window's compute. Device-side ``alive``/
        ``blocks_left`` keep EOS'd and budget-exhausted slots masked even
        though the host's view lags a window; the cost is that slot
        turnover (finish -> readmit) also lags one window. Window sizes
        come from ``_target_window`` — full remaining budgets when the
        queue is empty, ``sync_blocks`` under queue pressure — so the
        per-dispatch tunnel latency amortizes over the largest window the
        schedule allows."""
        pending = None
        for _ in range(max_steps):
            self._admit()
            wl = self._target_window() if self.active else 0
            if wl > 0:
                nxt = self._dispatch(wl)
            elif pending is None:
                break
            else:
                nxt = None
            if pending is not None:
                self._consume(pending)
            pending = nxt
        if pending is not None:
            self._consume(pending)
        return self.completed


def _scatter_valid(kv_valid, write_pos, valid_new, n):
    """Set kv_valid[b, write_pos[b] + j] = valid_new[b] for j < n."""
    B, cap = kv_valid.shape
    cols = jnp.arange(cap, dtype=jnp.int32)[None]
    in_range = (cols >= write_pos[:, None]) & (cols < write_pos[:, None] + n)
    return jnp.where(in_range, valid_new[:, None], kv_valid)
