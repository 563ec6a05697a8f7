"""Continuous-batching engine tests: results must match single-sequence
``generate`` exactly (greedy), across staggered admission and slot reuse."""

import numpy as np
import jax
import jax.numpy as jnp

from tests.test_block_parity import make_cfg, VOCAB, L
from block_transformer_tpu.models import block_transformer as bt
from block_transformer_tpu.inference import generate as gen
from block_transformer_tpu.inference.engine import ContinuousBatchingEngine


def _setup(seed=0):
    cfg = make_cfg()
    params = bt.init_block_transformer_params(jax.random.PRNGKey(seed), cfg)
    return cfg, params


def _reference_generation(params, cfg, prompt, max_new):
    out = gen.generate(params, cfg, prompt[None], max_length=len(prompt) + max_new)
    return [int(t) for t in out[0, len(prompt):]]


def test_engine_matches_generate():
    cfg, params = _setup()
    rng = np.random.default_rng(0)
    prompts = [rng.integers(1, VOCAB, size=n) for n in (8, 12, 4)]
    max_new = 8

    eng = ContinuousBatchingEngine(params, cfg, n_slots=2, max_blocks=16)
    reqs = [eng.submit(p, max_new) for p in prompts]
    all_reqs = {r.uid: r for r in (eng.waiting + list(eng.active.values()))}
    eng.run(max_steps=50)
    assert not eng.has_work()
    assert eng.stats.prompts_finished == 3

    for p, uid in zip(prompts, reqs):
        req = all_reqs[uid]
        want = _reference_generation(params, cfg, p, max_new)
        got = req.generated
        # engine may stop at EOS earlier than max_new; compare the overlap
        # up to the first EOS-pad in the reference
        m = min(len(got), len(want))
        assert m > 0
        assert got[:m] == want[:m], (got, want)


def test_engine_slot_reuse_isolation():
    cfg, params = _setup(seed=3)
    rng = np.random.default_rng(3)
    # 4 prompts through 1 slot: later prompts must not see earlier KV state
    prompts = [rng.integers(1, VOCAB, size=8) for _ in range(4)]
    eng = ContinuousBatchingEngine(params, cfg, n_slots=1, max_blocks=12)
    all_reqs = []
    for p in prompts:
        eng.submit(p, 4)
    all_reqs = list(eng.waiting)
    eng.run(max_steps=100)
    for p, req in zip(prompts, all_reqs):
        want = _reference_generation(params, cfg, p, 4)
        m = min(len(req.generated), len(want))
        assert req.generated[:m] == want[:m]


def test_engine_streaming_and_stats():
    cfg, params = _setup(seed=4)
    rng = np.random.default_rng(4)
    chunks = []
    eng = ContinuousBatchingEngine(params, cfg, n_slots=2, max_blocks=12)
    eng.submit(rng.integers(1, VOCAB, size=8), 6,
               stream=lambda uid, toks: chunks.append((uid, list(toks))))
    eng.run(max_steps=20)
    got = [t for _, ts in chunks for t in ts]
    assert 0 < len(got) <= 6
    assert eng.stats.tokens_generated == len(got)


def test_engine_run_returns_completed():
    cfg, params = _setup(seed=7)
    rng = np.random.default_rng(7)
    eng = ContinuousBatchingEngine(params, cfg, n_slots=2, max_blocks=12)
    u1 = eng.submit(rng.integers(1, VOCAB, size=8), 4)
    u2 = eng.submit(rng.integers(1, VOCAB, size=4), 4)
    done = eng.run(max_steps=40)
    assert {r.uid for r in done} == {u1, u2}
    assert all(r.done for r in done)


def test_engine_int8_cache_matches_int8_generate():
    """INT8-cache serving must be token-exact vs static-batch generation
    with the same INT8 global cache (greedy)."""
    cfg, params = _setup(3)
    rng = np.random.default_rng(5)
    prompts = [rng.integers(1, VOCAB, size=n) for n in (8, 6)]
    max_new = 8

    def ref_int8(prompt):
        d = gen.preprocess_inputs(cfg, prompt[None])
        N = d["input_ids"].shape[1]
        res = gen.generate_blocks(
            params, cfg, jnp.asarray(d["input_ids"]),
            jnp.asarray(d["attention_mask"]),
            jnp.asarray(d["block_attention_mask"]),
            max_blocks=N + max_new // L, kv_cache="int8")
        toks = np.asarray(res.tokens).reshape(1, -1)
        pad = d["initial_block_padding"]
        return [int(t) for t in toks[0, pad + len(prompt):
                                     pad + len(prompt) + max_new]]

    eng = ContinuousBatchingEngine(params, cfg, n_slots=2, max_blocks=16,
                                   kv_cache="int8", bucket_blocks=4)
    reqs = [eng.submit(p, max_new) for p in prompts]
    all_reqs = {r.uid: r for r in (eng.waiting + list(eng.active.values()))}
    eng.run(max_steps=50)
    for p, uid in zip(prompts, reqs):
        got = all_reqs[uid].generated
        want = ref_int8(p)[: len(got)]
        assert got == want, (got, want)


def test_engine_bucketing_matches_generate():
    """Different prompt lengths land in one bucket; outputs must still be
    exact (padded tail is masked + overwritten)."""
    cfg, params = _setup(4)
    rng = np.random.default_rng(6)
    prompts = [rng.integers(1, VOCAB, size=n) for n in (4, 9, 14)]
    max_new = 8
    eng = ContinuousBatchingEngine(params, cfg, n_slots=3, max_blocks=16,
                                   bucket_blocks=4)
    reqs = [eng.submit(p, max_new) for p in prompts]
    all_reqs = {r.uid: r for r in (eng.waiting + list(eng.active.values()))}
    eng.run(max_steps=50)
    for p, uid in zip(prompts, reqs):
        got = all_reqs[uid].generated
        want = _reference_generation(params, cfg, p, max_new)[: len(got)]
        assert got == want, (got, want)


def test_engine_uneven_budgets_and_windows():
    """max_new_tokens not aligned to sync windows or block boundaries:
    device-side blocks_left must stop each slot at its own budget, and the
    pipelined run must attribute every token to the right request."""
    cfg, params = _setup(seed=5)
    rng = np.random.default_rng(5)
    prompts = [rng.integers(1, VOCAB, size=n) for n in (8, 4, 12, 8)]
    budgets = [3, 9, 5, 14]          # none a multiple of block_length=4
    eng = ContinuousBatchingEngine(params, cfg, n_slots=2, max_blocks=16,
                                   sync_blocks=3)
    for p, m in zip(prompts, budgets):
        eng.submit(p, m)
    all_reqs = list(eng.waiting)
    eng.run(max_steps=100)
    assert not eng.has_work()
    assert eng.stats.prompts_finished == 4
    for p, m, req in zip(prompts, budgets, all_reqs):
        want = _reference_generation(params, cfg, p, m)
        got = req.generated
        assert len(got) <= m
        k = min(len(got), len(want))
        assert k > 0 and got[:k] == want[:k], (m, got, want)


def test_engine_int4_kv_serves():
    """The engine serves from an INT4 global cache (created under jit) and
    produces valid generations for every request."""
    cfg, params = _setup(seed=5)
    rng = np.random.default_rng(5)
    prompts = [rng.integers(1, VOCAB, size=n) for n in (8, 12)]
    eng = ContinuousBatchingEngine(params, cfg, n_slots=2, max_blocks=12,
                                   kv_cache="int4")
    for p in prompts:
        eng.submit(p, 4)
    reqs = list(eng.waiting)
    eng.run(max_steps=60)
    assert not eng.has_work()
    for req in reqs:
        assert len(req.generated) > 0
        assert all(0 <= t < VOCAB for t in req.generated)


def test_engine_paged_matches_int8():
    """Paged-pool serving must produce the same generations as the
    contiguous INT8 cache at matched numerics, including slot reuse through
    page free/realloc cycles."""
    cfg, params = _setup(seed=7)
    rng = np.random.default_rng(7)
    prompts = [rng.integers(1, VOCAB, size=n) for n in (8, 12, 4, 9)]

    def run_engine(**kw):
        eng = ContinuousBatchingEngine(params, cfg, n_slots=2, max_blocks=12,
                                       **kw)
        for p in prompts:
            eng.submit(p, 6)
        reqs = list(eng.waiting)
        eng.run(max_steps=100)
        assert not eng.has_work()
        return [r.generated for r in reqs]

    want = run_engine(kv_cache="int8")
    # pool sized so the 4 requests cannot all hold pages at once
    got = run_engine(kv_cache="paged", page_size=4, pool_pages=9)
    assert got == want, (got, want)


def test_engine_sharded_matches_single():
    """The engine over a (data, model) mesh must generate token-for-token
    what the single-device engine generates."""
    from block_transformer_tpu.parallel import sharding as sh

    cfg, params = _setup(seed=9)
    rng = np.random.default_rng(9)
    prompts = [rng.integers(1, VOCAB, size=n) for n in (8, 12, 6, 10)]

    def run_engine(**kw):
        eng = ContinuousBatchingEngine(params, cfg, n_slots=4, max_blocks=12,
                                       kv_cache="int8", **kw)
        for p in prompts:
            eng.submit(p, 6)
        reqs = list(eng.waiting)
        eng.run(max_steps=100)
        assert not eng.has_work()
        return [r.generated for r in reqs]

    want = run_engine()
    mesh = sh.make_mesh(n_data=2, n_model=4)
    got = run_engine(mesh=mesh)
    assert got == want, (got, want)


def test_engine_state_stays_sharded():
    """GSPMD must keep the engine cache sharded across decode windows (a
    silently replicated cache would still pass the parity test)."""
    from block_transformer_tpu.parallel import sharding as sh

    cfg, params = _setup(seed=9)
    rng = np.random.default_rng(9)
    mesh = sh.make_mesh(n_data=2, n_model=4)
    eng = ContinuousBatchingEngine(params, cfg, n_slots=4, max_blocks=12,
                                   kv_cache="int8", mesh=mesh)
    for n in (8, 12):
        eng.submit(rng.integers(1, VOCAB, size=n), 6)
    eng.run(max_steps=50)
    spec = eng.cache.k.sharding.spec
    assert "data" in str(spec) and "model" in str(spec), spec


def test_engine_paged_int4_serves():
    cfg, params = _setup(seed=11)
    rng = np.random.default_rng(11)
    eng = ContinuousBatchingEngine(params, cfg, n_slots=2, max_blocks=12,
                                   kv_cache="paged-int4", page_size=4)
    for n in (8, 10):
        eng.submit(rng.integers(1, VOCAB, size=n), 4)
    reqs = list(eng.waiting)
    eng.run(max_steps=60)
    assert not eng.has_work()
    import jax.numpy as jnp
    assert eng.cache.k.dtype == jnp.int4
    for r in reqs:
        assert len(r.generated) > 0
        assert all(0 <= t < VOCAB for t in r.generated)


def test_engine_paged_frees_page_table_rows():
    """Freed slots must point at the null page: decode windows run for
    every slot, so a stale page_table row would scatter a dead slot's K/V
    into pages since reallocated to another request."""
    cfg, params = _setup(seed=13)
    rng = np.random.default_rng(13)
    eng = ContinuousBatchingEngine(params, cfg, n_slots=2, max_blocks=12,
                                   kv_cache="paged", page_size=4)
    for n in (8, 12, 6):
        eng.submit(rng.integers(1, VOCAB, size=n), 4)
    eng.run(max_steps=80)
    assert not eng.has_work()
    assert (np.asarray(eng.cache.page_table) == 0).all()
    # free lists are per data shard (shard-local ids); dp=1 here
    flat = sorted(p for lst in eng._free_pages for p in lst)
    assert flat == list(range(1, eng._pages_per_shard)) and \
        eng._pages_per_shard * eng._paged_dp == eng.pool_pages


def test_engine_sharded_quantized():
    """Mesh-sharded serving with quantized weights (the headline numbers'
    config): param specs must cover kernel_q8/scale leaves, and the
    generations must match the single-device quantized engine."""
    from block_transformer_tpu.parallel import sharding as sh
    from block_transformer_tpu.ops import quant

    cfg, params = _setup(seed=15)
    qparams = quant.quantize_block_transformer(params, bits=8)
    rng = np.random.default_rng(15)
    prompts = [rng.integers(1, VOCAB, size=n) for n in (8, 10)]

    def run_engine(**kw):
        eng = ContinuousBatchingEngine(qparams, cfg, n_slots=2, max_blocks=12,
                                       kv_cache="int8", **kw)
        for p in prompts:
            eng.submit(p, 4)
        reqs = list(eng.waiting)
        eng.run(max_steps=60)
        return [r.generated for r in reqs]

    want = run_engine()
    got = run_engine(mesh=sh.make_mesh(n_data=2, n_model=4))
    assert got == want, (got, want)


def test_engine_sharded_int4_weights():
    """INT4 (and mixed48-style) weight trees must serve on a mesh: the
    engine trace-gates every quantized matmul to the XLA dequant+dot
    (pallas_call has no GSPMD partitioning rule), and generations must
    match the single-device int4 engine token-for-token."""
    from block_transformer_tpu.parallel import sharding as sh
    from block_transformer_tpu.ops import quant

    cfg, params = _setup(seed=21)
    qparams = quant.quantize_block_transformer(params, bits=4,
                                               skip_lm_head=True)
    rng = np.random.default_rng(21)
    prompts = [rng.integers(1, VOCAB, size=n) for n in (8, 10)]

    def run_engine(**kw):
        eng = ContinuousBatchingEngine(qparams, cfg, n_slots=2, max_blocks=12,
                                       kv_cache="int8", **kw)
        for p in prompts:
            eng.submit(p, 4)
        reqs = list(eng.waiting)
        eng.run(max_steps=60)
        return [r.generated for r in reqs]

    want = run_engine()
    got = run_engine(mesh=sh.make_mesh(n_data=2, n_model=4))
    assert got == want, (got, want)


def test_engine_shard_map_matches_single():
    """mesh_impl='shard_map' (explicit-collective device programs,
    per-shard Pallas legal) must generate token-for-token what the
    single-device engine generates — fp weights and int4 weights (the
    kernels the GSPMD mesh path must gate off)."""
    from block_transformer_tpu.parallel import sharding as sh
    from block_transformer_tpu.ops import quant

    cfg, params = _setup(seed=27)
    rng = np.random.default_rng(27)
    prompts = [rng.integers(1, VOCAB, size=n) for n in (8, 12, 6, 10)]

    for qp in (params,
               quant.quantize_block_transformer(params, bits=4,
                                                group_size=16,
                                                skip_lm_head=True),
               # mixed48: int8 block decoder + int4 token decoder + int8 head
               quant.quantize_block_transformer(params, bits=8,
                                                group_size=16,
                                                token_decoder_bits=4)):
        def run_engine(**kw):
            eng = ContinuousBatchingEngine(qp, cfg, n_slots=4, max_blocks=12,
                                           kv_cache="int8", **kw)
            for p in prompts:
                eng.submit(p, 6)
            reqs = list(eng.waiting)
            eng.run(max_steps=100)
            assert not eng.has_work()
            return [r.generated for r in reqs]

        want = run_engine()
        got = run_engine(mesh=sh.make_mesh(n_data=2, n_model=4),
                         mesh_impl="shard_map")
        assert got == want, (got, want)


def test_engine_shard_map_paged_matches_single():
    """Paged pool over a (data, model) mesh (mesh_impl='shard_map'): pool
    pages partition across the data shards (shard-local page ids, per-
    shard free lists), heads shard over model — must generate token-for-
    token what the single-device paged engine generates, through page
    free/realloc cycles (4 requests over 2 slots)."""
    from block_transformer_tpu.parallel import sharding as sh

    cfg, params = _setup(seed=29)
    rng = np.random.default_rng(29)
    prompts = [rng.integers(1, VOCAB, size=n) for n in (8, 12, 6, 10)]

    def run_engine(**kw):
        eng = ContinuousBatchingEngine(params, cfg, n_slots=4, max_blocks=12,
                                       kv_cache="paged", page_size=4,
                                       pool_pages=20, **kw)
        for p in prompts:
            eng.submit(p, 6)
        reqs = list(eng.waiting)
        eng.run(max_steps=100)
        assert not eng.has_work()
        return [r.generated for r in reqs]

    want = run_engine()
    got = run_engine(mesh=sh.make_mesh(n_data=2, n_model=4),
                     mesh_impl="shard_map")
    assert got == want, (got, want)


def test_engine_shard_map_overlap_streams_exact():
    """The two-stream token-decoder interleave in the serving window
    (overlap_streams=2, the north-star overlap schedule on the SERVING
    path) is a pure reordering for greedy decode: token-for-token
    identical to the single-chain window."""
    from block_transformer_tpu.parallel import sharding as sh

    cfg, params = _setup(seed=31)
    rng = np.random.default_rng(31)
    prompts = [rng.integers(1, VOCAB, size=n) for n in (8, 12, 6, 10)]

    def run_engine(streams):
        eng = ContinuousBatchingEngine(
            params, cfg, n_slots=4, max_blocks=12, kv_cache="int8",
            mesh=sh.make_mesh(n_data=2, n_model=4), mesh_impl="shard_map",
            overlap_streams=streams)
        for p in prompts:
            eng.submit(p, 6)
        reqs = list(eng.waiting)
        eng.run(max_steps=100)
        assert not eng.has_work()
        return [r.generated for r in reqs]

    assert run_engine(2) == run_engine(1)


def test_engine_shard_map_state_stays_sharded():
    from block_transformer_tpu.parallel import sharding as sh

    cfg, params = _setup(seed=27)
    rng = np.random.default_rng(27)
    eng = ContinuousBatchingEngine(
        params, cfg, n_slots=4, max_blocks=12, kv_cache="int8",
        mesh=sh.make_mesh(n_data=2, n_model=4), mesh_impl="shard_map")
    for n in (8, 12):
        eng.submit(rng.integers(1, VOCAB, size=n), 6)
    eng.run(max_steps=50)
    spec = eng.cache.k.sharding.spec
    assert "data" in str(spec) and "model" in str(spec), spec


def test_engine_adaptive_window_dispatch_counts():
    """With an empty admission queue the host must cover a request's whole
    remaining budget in ONE dispatch (the window length is a traced arg of
    a single while_loop program); under queue pressure windows cap at
    sync_blocks so admission latency stays bounded."""
    cfg, params = _setup(seed=23)
    rng = np.random.default_rng(23)

    # no queue: 2 slots, 2 requests, 6-block budgets -> exactly 1 window
    eng = ContinuousBatchingEngine(params, cfg, n_slots=2, max_blocks=16,
                                   sync_blocks=2)
    for _ in range(2):
        eng.submit(rng.integers(1, VOCAB, size=8), 6 * L)
    eng.run(max_steps=50)
    assert not eng.has_work()
    assert eng.stats.steps == 1, eng.stats

    # queue pressure: 4 requests on 2 slots, 4-block budgets. Without EOS
    # this is 3 windows (two sync_blocks=2 waves + one 4-block wave); early
    # EOS staggers slot turnover and can add admission waves, but the count
    # must stay well under the 8 block-rounds a fixed per-sync_blocks
    # scheduler pays when waves stagger
    eng = ContinuousBatchingEngine(params, cfg, n_slots=2, max_blocks=16,
                                   sync_blocks=2)
    for _ in range(4):
        eng.submit(rng.integers(1, VOCAB, size=8), 4 * L)
    eng.run(max_steps=50)
    assert not eng.has_work()
    assert eng.stats.steps <= 6, eng.stats
    assert eng.stats.prompts_finished == 4


def test_engine_latency_metrics():
    """Completed requests carry monotone latency stamps and the aggregate
    metrics are well-formed (queue wait <= TTFT, positive TPOT)."""
    cfg, params = _setup(seed=25)
    rng = np.random.default_rng(25)
    eng = ContinuousBatchingEngine(params, cfg, n_slots=2, max_blocks=12)
    for n in (8, 10, 6):
        eng.submit(rng.integers(1, VOCAB, size=n), 8)
    done = eng.run(max_steps=60)
    assert not eng.has_work()
    for r in done:
        assert r.submitted_at <= r.admitted_at <= r.first_token_at \
            <= r.done_at, r
    m = eng.latency_metrics()
    assert m["completed"] == 3
    assert 0 <= m["queue_wait_s_mean"] <= m["ttft_s_mean"]
    assert m["tpot_s_mean"] >= 0 and m["ttft_s_p95"] >= m["ttft_s_p50"]


def test_engine_paged_first_fit_admission():
    """A large request that can't get pages must not convoy smaller ones:
    first-fit admits the small request now, the large one when pages free."""
    cfg, params = _setup(seed=17)
    rng = np.random.default_rng(17)
    big = rng.integers(1, VOCAB, size=28)          # 7 blocks + budget
    small = rng.integers(1, VOCAB, size=4)         # 1 block + budget
    # 3 usable pages of 4 block-positions each: occupant holds 1 page
    # (2 prompt + 1 budget blocks), big needs 3 (7 + 2 blocks) and cannot
    # coexist; small needs 1 (1 + 1 blocks) and can
    eng = ContinuousBatchingEngine(params, cfg, n_slots=3, max_blocks=12,
                                   kv_cache="paged", page_size=4,
                                   pool_pages=4)
    occupant = rng.integers(1, VOCAB, size=8)
    eng.submit(occupant, 4)
    eng._admit()
    assert len(eng.active) == 1
    uid_big = eng.submit(big, 8)
    uid_small = eng.submit(small, 4)
    reqs = {r.uid: r for r in eng.waiting}
    eng._admit()
    admitted = {r.uid for r in eng.active.values()}
    assert uid_small in admitted and uid_big not in admitted
    # queue order preserved: big retries at the front
    assert eng.waiting and eng.waiting[0].uid == uid_big
    eng.run(max_steps=100)
    assert not eng.has_work()
    assert reqs[uid_big].generated and reqs[uid_small].generated


def test_engine_chunked_admission_matches_unchunked():
    """Admission chunking (admit_chunk + power-of-2 duplicate padding)
    must be invisible in results: 5 same-bucket prompts admitted as
    chunks of 2 (2+2+2-with-dup-pad) produce exactly the tokens the
    one-shot admission produces."""
    cfg, params = _setup(seed=5)
    rng = np.random.default_rng(5)
    prompts = [rng.integers(1, VOCAB, size=8) for _ in range(5)]

    def run(admit_chunk):
        eng = ContinuousBatchingEngine(params, cfg, n_slots=5, max_blocks=12,
                                       admit_chunk=admit_chunk)
        for p in prompts:
            eng.submit(p, 8)
        reqs = list(eng.waiting)
        eng.run(max_steps=100)
        assert not eng.has_work()
        return [r.generated for r in reqs]

    chunked = run(2)
    oneshot = run(64)
    assert chunked == oneshot
