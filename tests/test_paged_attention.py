"""Paged decode attention: parity with the contiguous formulation when the
pool pages are a permutation of a contiguous cache."""

import numpy as np
import jax
import jax.numpy as jnp

from block_transformer_tpu.ops import masks as masks_lib
from block_transformer_tpu.ops import paged_attention


def _reference(q, k, v, kv_idx, kv_valid, q_idx):
    # plain masked softmax attention in f32
    B, H, S, D = q.shape
    s = np.einsum("bhsd,bhkd->bhsk", np.asarray(q, np.float32),
                  np.asarray(k, np.float32)) / np.sqrt(D)
    ok = (np.asarray(kv_idx)[None, None, None, :]
          <= np.asarray(q_idx)[:, None, :, None])
    ok = ok & (np.asarray(kv_valid)[:, None, None, :] != 0)
    s = np.where(ok, s, -1e30)
    p = np.exp(s - s.max(-1, keepdims=True))
    p = p / p.sum(-1, keepdims=True)
    return np.einsum("bhsk,bhkd->bhsd", p, np.asarray(v, np.float32))


def test_paged_matches_contiguous():
    rng = np.random.default_rng(0)
    L, B, H, D = 3, 4, 2, 128
    ps, n_virt = 128, 4                     # page size, pages per slot
    cap = ps * n_virt
    n_pool = B * n_virt + 2                 # pool bigger than needed

    # per-(layer, pool-page, head, pos) int8 values + scales
    k_q = rng.integers(-127, 128, size=(L, n_pool, H, ps, D)).astype(np.int8)
    v_q = rng.integers(-127, 128, size=(L, n_pool, H, ps, D)).astype(np.int8)
    k_s = rng.uniform(0.01, 0.02, size=(L, n_pool, H, ps)).astype(np.float32)
    v_s = rng.uniform(0.01, 0.02, size=(L, n_pool, H, ps)).astype(np.float32)

    # each slot's virtual pages -> a random distinct pool page (page 0 kept
    # as the null page)
    perm = rng.permutation(np.arange(1, n_pool - 1))[:B * n_virt]
    page_table = perm.reshape(B, n_virt).astype(np.int32)

    q = rng.standard_normal((B, H, 1, D)).astype(np.float32)
    layer = 1
    lengths = np.asarray([cap, ps + 3, 2 * ps, 5])  # per-slot valid lengths
    kv_valid = (np.arange(cap)[None] < lengths[:, None]).astype(np.int32)
    kv_idx = np.arange(cap, dtype=np.int32)
    q_idx = np.full((B, 1), cap, np.int32)          # attend to all valid

    mask = masks_lib.AttnMask(jnp.asarray(q_idx), jnp.asarray(kv_idx),
                              jnp.asarray(kv_valid))
    out = paged_attention.paged_decode_attention_int8(
        jnp.asarray(q), jnp.asarray(k_q), jnp.asarray(k_s), jnp.asarray(v_q),
        jnp.asarray(v_s), layer, jnp.asarray(page_table), mask,
        interpret=True)

    # gather the contiguous equivalent on the host and compare
    kc = (k_q[layer][page_table].astype(np.float32)
          * k_s[layer][page_table][..., None])      # [B, nv, H, ps, D]
    vc = (v_q[layer][page_table].astype(np.float32)
          * v_s[layer][page_table][..., None])
    kc = kc.transpose(0, 2, 1, 3, 4).reshape(B, H, cap, D)
    vc = vc.transpose(0, 2, 1, 3, 4).reshape(B, H, cap, D)
    want = _reference(q, kc, vc, kv_idx, kv_valid, q_idx)
    np.testing.assert_allclose(np.asarray(out), want, atol=2e-2, rtol=2e-2)


def test_paged_null_page_is_masked():
    """Unallocated virtual pages point at pool page 0; kv_valid masks them
    so their (arbitrary) contents never affect the output."""
    rng = np.random.default_rng(1)
    L, B, H, D = 1, 2, 2, 128
    ps, n_virt = 128, 2
    cap = ps * n_virt
    n_pool = 4
    k_q = rng.integers(-127, 128, size=(L, n_pool, H, ps, D)).astype(np.int8)
    v_q = rng.integers(-127, 128, size=(L, n_pool, H, ps, D)).astype(np.int8)
    k_s = np.full((L, n_pool, H, ps), 0.01, np.float32)
    v_s = np.full((L, n_pool, H, ps), 0.01, np.float32)
    q = rng.standard_normal((B, H, 1, D)).astype(np.float32)

    # slot 0 uses pages [1, 2]; slot 1 uses page [3] + null page 0
    pt = np.asarray([[1, 2], [3, 0]], np.int32)
    kv_valid = (np.arange(cap)[None]
                < np.asarray([[cap], [ps]])).astype(np.int32)
    kv_idx = np.arange(cap, dtype=np.int32)
    q_idx = np.full((B, 1), cap, np.int32)
    mask = masks_lib.AttnMask(jnp.asarray(q_idx), jnp.asarray(kv_idx),
                              jnp.asarray(kv_valid))

    out1 = paged_attention.paged_decode_attention_int8(
        jnp.asarray(q), jnp.asarray(k_q), jnp.asarray(k_s), jnp.asarray(v_q),
        jnp.asarray(v_s), 0, jnp.asarray(pt), mask, interpret=True)
    # scribble over the null page: output must not change
    k_q2 = k_q.copy(); k_q2[:, 0] = 99
    v_q2 = v_q.copy(); v_q2[:, 0] = -99
    out2 = paged_attention.paged_decode_attention_int8(
        jnp.asarray(q), jnp.asarray(k_q2), jnp.asarray(k_s), jnp.asarray(v_q2),
        jnp.asarray(v_s), 0, jnp.asarray(pt), mask, interpret=True)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2),
                               atol=1e-6)


def test_paged_multi_group_online_softmax(monkeypatch):
    """Force npp=2 with n_virt=4 so the grid runs 2 page GROUPS per slot:
    exercises the cross-group online-softmax accumulation of the round-3
    retile (one fused DMA + dot per npp pages)."""
    monkeypatch.setenv("BT_PAGED_NPP", "2")
    test_paged_matches_contiguous()


def test_paged_row_batched(monkeypatch):
    """Round-4 row batching: 2 slot rows x 2 pages per grid step — each
    slot resolves its own page-table entries inside one step, the dot is
    batched over (slot, head), and the cross-group online softmax still
    accumulates per slot."""
    monkeypatch.setenv("BT_PAGED_NBT", "2")
    monkeypatch.setenv("BT_PAGED_NPP", "2")
    test_paged_matches_contiguous()


def test_paged_full_tile(monkeypatch):
    """Degenerate single-step grid: the whole batch in one row tile and
    all virtual pages in one group (no online-softmax passes at all)."""
    monkeypatch.setenv("BT_PAGED_NBT", "4")
    monkeypatch.setenv("BT_PAGED_NPP", "4")
    test_paged_matches_contiguous()


def test_paged_write_kernel_matches_xla_scatter():
    """paged_write_int8 (interpret) == the XLA advanced-index scatter."""
    import numpy as np
    from block_transformer_tpu.ops import paged_attention

    rng = np.random.default_rng(0)
    L, P, H, ps, D = 3, 9, 4, 16, 128
    B = 5
    k_pool = jnp.asarray(rng.integers(-7, 8, (L, P, H, ps, D)), jnp.int8)
    v_pool = jnp.asarray(rng.integers(-7, 8, (L, P, H, ps, D)), jnp.int8)
    ks_pool = jnp.asarray(rng.normal(size=(L, P, H, ps)), jnp.float32)
    vs_pool = jnp.asarray(rng.normal(size=(L, P, H, ps)), jnp.float32)
    # distinct pages: engine slots own disjoint pages (the kernel's scale
    # RMW contract; only dead slots share the masked null page 0)
    page = jnp.asarray(rng.permutation(np.arange(1, P))[:B], jnp.int32)
    off = jnp.asarray(rng.integers(0, ps, B), jnp.int32)
    kq = jnp.asarray(rng.integers(-7, 8, (B, H, D)), jnp.int8)
    vq = jnp.asarray(rng.integers(-7, 8, (B, H, D)), jnp.int8)
    ks = jnp.asarray(rng.normal(size=(B, H)), jnp.float32)
    vs = jnp.asarray(rng.normal(size=(B, H)), jnp.float32)
    layer = 1

    nk, nks, nv, nvs = paged_attention.paged_write_int8(
        k_pool, ks_pool, v_pool, vs_pool, layer, page, off,
        kq, ks, vq, vs, interpret=True)

    rk = k_pool.at[layer, page, :, off].set(kq)
    rv = v_pool.at[layer, page, :, off].set(vq)
    rks = ks_pool.at[layer, page, :, off].set(ks)
    rvs = vs_pool.at[layer, page, :, off].set(vs)
    np.testing.assert_array_equal(np.asarray(nk), np.asarray(rk))
    np.testing.assert_array_equal(np.asarray(nv), np.asarray(rv))
    np.testing.assert_allclose(np.asarray(nks), np.asarray(rks), atol=0)
    np.testing.assert_allclose(np.asarray(nvs), np.asarray(rvs), atol=0)


def test_paged_page_copy_matches_xla_scatter():
    """paged_page_copy_int8 (interpret) == the page-granular XLA scatter
    it replaces in engine admission prefill."""
    import numpy as np
    from block_transformer_tpu.ops import paged_attention

    rng = np.random.default_rng(1)
    L, P, H, ps, D = 2, 11, 4, 16, 128
    G, nv = 3, 2
    cap = nv * ps
    kp = jnp.asarray(rng.integers(-7, 8, (L, P, H, ps, D)), jnp.int8)
    vp = jnp.asarray(rng.integers(-7, 8, (L, P, H, ps, D)), jnp.int8)
    ksp = jnp.asarray(rng.normal(size=(L, P, H, ps)), jnp.float32)
    vsp = jnp.asarray(rng.normal(size=(L, P, H, ps)), jnp.float32)
    # distinct real pages per (row, virtual page); one row's tail at null 0
    pt = jnp.asarray([[1, 2], [3, 4], [5, 0]], jnp.int32)
    rk = jnp.asarray(rng.integers(-7, 8, (L, G, H, cap, D)), jnp.int8)
    rv = jnp.asarray(rng.integers(-7, 8, (L, G, H, cap, D)), jnp.int8)
    rks = jnp.asarray(rng.normal(size=(L, G, H, cap)), jnp.float32)
    rvs = jnp.asarray(rng.normal(size=(L, G, H, cap)), jnp.float32)

    nk, nks, nv_, nvs = paged_attention.paged_page_copy_int8(
        kp, ksp, vp, vsp, pt, rk, rks, rv, rvs, interpret=True)

    # simpler reference: direct loop assignment
    def ref_pool(pool, row, is_val):
        pool = np.asarray(pool).copy()
        row = np.asarray(row)
        for g in range(G):
            for j in range(nv):
                sl = row[:, g, :, j * ps:(j + 1) * ps]
                pool[:, int(pt[g, j])] = sl
        return pool

    np.testing.assert_array_equal(np.asarray(nk), ref_pool(kp, rk, True))
    np.testing.assert_array_equal(np.asarray(nv_), ref_pool(vp, rv, True))
    np.testing.assert_allclose(np.asarray(nks), ref_pool(ksp, rks, False))
    np.testing.assert_allclose(np.asarray(nvs), ref_pool(vsp, rvs, False))


def test_paged_write_layers_kernel_matches_xla_scatter():
    """paged_write_layers_int8 (interpret) == per-layer XLA scatters: the
    deferred-write path's single post-scan call writes every layer of a
    slot at its shared (page, off) target."""
    import numpy as np
    from block_transformer_tpu.ops import paged_attention

    rng = np.random.default_rng(2)
    L, P, H, ps, D = 4, 9, 4, 16, 128
    B = 5
    k_pool = jnp.asarray(rng.integers(-7, 8, (L, P, H, ps, D)), jnp.int8)
    v_pool = jnp.asarray(rng.integers(-7, 8, (L, P, H, ps, D)), jnp.int8)
    ks_pool = jnp.asarray(rng.normal(size=(L, P, H, ps)), jnp.float32)
    vs_pool = jnp.asarray(rng.normal(size=(L, P, H, ps)), jnp.float32)
    page = jnp.asarray(rng.permutation(np.arange(1, P))[:B], jnp.int32)
    off = jnp.asarray(rng.integers(0, ps, B), jnp.int32)
    kq = jnp.asarray(rng.integers(-7, 8, (L, B, H, D)), jnp.int8)
    vq = jnp.asarray(rng.integers(-7, 8, (L, B, H, D)), jnp.int8)
    ks = jnp.asarray(rng.normal(size=(L, B, H)), jnp.float32)
    vs = jnp.asarray(rng.normal(size=(L, B, H)), jnp.float32)

    nk, nks, nv, nvs = paged_attention.paged_write_layers_int8(
        k_pool, ks_pool, v_pool, vs_pool, page, off,
        kq, ks, vq, vs, interpret=True)

    rk, rv, rks, rvs = k_pool, v_pool, ks_pool, vs_pool
    for layer in range(L):
        rk = rk.at[layer, page, :, off].set(kq[layer])
        rv = rv.at[layer, page, :, off].set(vq[layer])
        rks = rks.at[layer, page, :, off].set(ks[layer])
        rvs = rvs.at[layer, page, :, off].set(vs[layer])
    np.testing.assert_array_equal(np.asarray(nk), np.asarray(rk))
    np.testing.assert_array_equal(np.asarray(nv), np.asarray(rv))
    np.testing.assert_allclose(np.asarray(nks), np.asarray(rks), atol=0)
    np.testing.assert_allclose(np.asarray(nvs), np.asarray(rvs), atol=0)


def test_paged_fresh_tail_matches_write_then_attend(monkeypatch):
    """Deferred-write attention (fresh K/V merged in-kernel, q_idx - 1
    masking the stale frontier slot) == write-the-token-first then attend
    over the pool, including across online-softmax page groups."""
    import numpy as np
    from block_transformer_tpu.ops import paged_attention

    for npp_force in (None, "1"):           # single group / multi group
        if npp_force:
            monkeypatch.setenv("BT_PAGED_NPP", npp_force)
        else:
            monkeypatch.delenv("BT_PAGED_NPP", raising=False)
        rng = np.random.default_rng(3)
        L, B, H, D = 2, 4, 2, 128
        ps, n_virt = 128, 2
        cap = ps * n_virt
        n_pool = B * n_virt + 2
        k_q = jnp.asarray(rng.integers(-7, 8, (L, n_pool, H, ps, D)),
                          jnp.int8)
        v_q = jnp.asarray(rng.integers(-7, 8, (L, n_pool, H, ps, D)),
                          jnp.int8)
        k_s = jnp.asarray(rng.uniform(0.01, 0.02, (L, n_pool, H, ps)),
                          jnp.float32)
        v_s = jnp.asarray(rng.uniform(0.01, 0.02, (L, n_pool, H, ps)),
                          jnp.float32)
        perm = rng.permutation(np.arange(1, n_pool))[:B * n_virt]
        pt = jnp.asarray(perm.reshape(B, n_virt), jnp.int32)
        layer = 1
        q = jnp.asarray(rng.standard_normal((B, H, 1, D)), jnp.float32)
        kf = jnp.asarray(rng.integers(-7, 8, (B, H, D)), jnp.int8)
        vf = jnp.asarray(rng.integers(-7, 8, (B, H, D)), jnp.int8)
        kfs = jnp.asarray(rng.uniform(0.01, 0.02, (B, H)), jnp.float32)
        vfs = jnp.asarray(rng.uniform(0.01, 0.02, (B, H)), jnp.float32)

        # per-slot write frontier (varied; slot 3 writes position 0 of an
        # otherwise-empty cache)
        lengths = np.asarray([cap - 1, ps + 3, ps - 1, 0])
        page = jnp.take_along_axis(pt, jnp.asarray(lengths[:, None] // ps,
                                                   jnp.int32), axis=1)[:, 0]
        off = jnp.asarray(lengths % ps, jnp.int32)
        kv_valid = jnp.asarray(
            (np.arange(cap)[None] <= lengths[:, None]).astype(np.int32))
        kv_idx = jnp.arange(cap, dtype=jnp.int32)
        q_idx = jnp.asarray(lengths[:, None], jnp.int32)   # query AT frontier

        # reference: write the fresh token at the frontier, then attend
        wk, wks, wv, wvs = paged_attention.paged_write_int8(
            k_q, k_s, v_q, v_s, layer, page, off, kf, kfs, vf, vfs,
            interpret=True)
        mask = masks_lib.AttnMask(q_idx, kv_idx, kv_valid)
        want = paged_attention.paged_decode_attention_int8(
            q, wk, wks, wv, wvs, layer, pt, mask, interpret=True)

        # deferred: unwritten pool + dequantized fresh merge, frontier
        # slot masked
        mask_d = masks_lib.AttnMask(q_idx - 1, kv_idx, kv_valid)
        kf_deq = kf.astype(jnp.float32) * kfs[..., None]
        vf_deq = vf.astype(jnp.float32) * vfs[..., None]
        out = paged_attention.paged_decode_attention_int8(
            q, k_q, k_s, v_q, v_s, layer, pt, mask_d,
            fresh=(kf_deq, vf_deq), interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                                   atol=2e-3, rtol=2e-3)
