"""Pallas segment-tile unstructured CSR SpMV (interpret mode) vs SciPy.

The kernel re-implements the reference's ``smvm`` hot loop
(compressed.fut:134-146) as a VMEM-resident-operand sublane gather; these
tests pin its semantics to the SciPy oracle across shapes that exercise
tile spill, window padding, multi-chunk splits, and empty rows.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp

from sparse_tpu.formats.csr import CSR
from sparse_tpu.ops.pallas_csr import (
    build_seg_tiles,
    csr_smvm_auto,
    csr_smvm_segtile,
)


def random_csr(n, m, nnz, seed, dtype=np.float32):
    rng = np.random.default_rng(seed)
    r = rng.integers(0, n, nnz)
    c = rng.integers(0, m, nnz)
    v = rng.standard_normal(nnz)
    A = sp.coo_matrix((v, (r, c)), shape=(n, m)).tocsr()
    A.sum_duplicates()
    a = CSR(
        data=jnp.asarray(A.data, dtype),
        indices=jnp.asarray(A.indices.astype(np.int32)),
        indptr=jnp.asarray(A.indptr.astype(np.int32)),
        shape=(n, m),
    )
    return a, A


@pytest.mark.parametrize(
    "n,m,nnz",
    [
        (50, 70, 300),       # dense-ish rows, heavy lane spill
        (300, 1100, 4000),   # two operand segments
        (8, 8, 8),           # single tile
        (257, 2500, 5000),   # window-padding edge (nb8 not multiple of 16)
        (5, 2049, 40),       # wide + short: one row block, 3 segments
    ],
)
def test_segtile_matches_scipy(n, m, nnz):
    a, A = random_csr(n, m, nnz, seed=n + m)
    x = np.random.default_rng(nnz).standard_normal(m).astype(np.float32)
    plan = build_seg_tiles(a)
    got = np.asarray(csr_smvm_segtile(a, jnp.asarray(x), plan, interpret=True))
    ref = A @ x
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)


def test_segtile_duplicate_lane_spill():
    # many entries in one row sharing c % 128 forces spill tiers; the spill
    # tiles must sum back to the exact row total
    n, m = 8, 1024
    r = np.zeros(16, np.int64)
    c = (np.arange(16) * 128) % 1024 + 5  # all lane 5+... same lane mod 128
    c = np.arange(16) % 8 * 128 + 5       # lanes equal, sublanes 0..7 twice
    v = np.ones(16)
    A = sp.coo_matrix((v, (r, c)), shape=(n, m)).tocsr()
    A.sum_duplicates()
    a = CSR(
        data=jnp.asarray(A.data, jnp.float32),
        indices=jnp.asarray(A.indices.astype(np.int32)),
        indptr=jnp.asarray(A.indptr.astype(np.int32)),
        shape=(n, m),
    )
    x = np.random.default_rng(0).standard_normal(m).astype(np.float32)
    plan = build_seg_tiles(a)
    got = np.asarray(csr_smvm_segtile(a, jnp.asarray(x), plan, interpret=True))
    np.testing.assert_allclose(got, A @ x, rtol=2e-5, atol=2e-5)


def test_segtile_empty_rows_and_matrix():
    # rows with no entries stay exactly zero
    n, m = 64, 200
    A = sp.csr_matrix((n, m), dtype=np.float32)
    A[3, 7] = 2.5
    A = A.tocsr()
    a = CSR(
        data=jnp.asarray(A.data, jnp.float32),
        indices=jnp.asarray(A.indices.astype(np.int32)),
        indptr=jnp.asarray(A.indptr.astype(np.int32)),
        shape=(n, m),
    )
    x = np.ones(m, np.float32)
    plan = build_seg_tiles(a)
    got = np.asarray(csr_smvm_segtile(a, jnp.asarray(x), plan, interpret=True))
    ref = np.zeros(n, np.float32)
    ref[3] = 2.5
    np.testing.assert_allclose(got, ref)


def test_auto_falls_back_off_tpu():
    # on CPU the auto path must dispatch to the XLA row-binned kernel and
    # still match
    a, A = random_csr(40, 60, 200, seed=1)
    x = np.random.default_rng(2).standard_normal(60).astype(np.float32)
    got = np.asarray(csr_smvm_auto(a, jnp.asarray(x)))
    np.testing.assert_allclose(got, A @ x, rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("wsub", [
    16,
    pytest.param(32, marks=pytest.mark.slow),  # breadth
])
def test_segtile_wide_windows_match(wsub):
    # wider operand windows (wsub sublanes = wsub*128 columns) must agree
    # with the oracle and pack banded blocks into fewer tiles than wsub=8
    rng = np.random.default_rng(61)
    n = m = 2048
    per_row = 12
    rows = np.repeat(np.arange(n, dtype=np.int64), per_row)
    cols = np.clip(rows + rng.integers(-900, 900, rows.size), 0, m - 1)
    v = rng.standard_normal(rows.size)
    A = sp.coo_matrix((v, (rows, cols)), shape=(n, m)).tocsr()
    A.sum_duplicates()
    a = CSR(
        data=jnp.asarray(A.data, np.float32),
        indices=jnp.asarray(A.indices.astype(np.int32)),
        indptr=jnp.asarray(A.indptr.astype(np.int32)),
        shape=(n, m),
    )
    x = rng.standard_normal(m).astype(np.float32)
    p8 = build_seg_tiles(a)
    pw = build_seg_tiles(a, wsub=wsub)
    assert pw.wsub == wsub and pw.fill > p8.fill
    got = np.asarray(csr_smvm_segtile(a, jnp.asarray(x), pw, interpret=True))
    np.testing.assert_allclose(got, A @ x, rtol=2e-5, atol=2e-5)
    with pytest.raises(ValueError):
        build_seg_tiles(a, wsub=7)


def test_segtile_wide_window_lowers_for_tpu():
    # Mosaic's dynamic gather requires indices.shape == src.shape; the
    # wide-window kernel decomposes into per-8-sublane gathers + selects.
    # jax.export lowers for the TPU platform without a device, so a broken
    # decomposition fails HERE instead of on the chip.
    a, A = random_csr(64, 2048, 600, seed=3)
    x = jnp.asarray(np.random.default_rng(0).standard_normal(2048)
                    .astype(np.float32))
    plan = build_seg_tiles(a, wsub=16)
    # x32 scope (jax.enable_x64 context): under the suite x64 mode,
    # take_along_axis's internal iota
    # is int64, which Mosaic rejects; the TPU bench path runs x32
    with jax.enable_x64(False):
        exported = jax.export.export(
            jax.jit(lambda a, v: csr_smvm_segtile(a, v, plan)),
            platforms=["tpu"],
        )(a, x)
    assert "tpu_custom_call" in exported.mlir_module()


def test_segtile_fused_key_sort_matches_lexsort():
    # the fused-u64-key radix path must order exactly like the 5-key lexsort
    # (incl. duplicate coordinates): compare whole plans
    from unittest import mock

    a, A = random_csr(300, 1100, 4000, seed=8)
    p_fused = build_seg_tiles(a)
    with mock.patch("sparse_tpu.native.plansort._lib", None), \
         mock.patch("sparse_tpu.native.plansort._tried", True):
        p_np = build_seg_tiles(a)
    for f in ("vals", "q", "seg_of", "rb"):
        np.testing.assert_array_equal(
            np.asarray(getattr(p_fused, f)), np.asarray(getattr(p_np, f))
        )
    assert p_fused.n_tiles == p_np.n_tiles and p_fused.chunks == p_np.chunks


def test_segtile_auto_window_height():
    # very wide band (blocks span ~16k columns): each doubling of the window
    # cuts tiles ~2x, so auto widens; moderate/narrow bands stay at 8
    rng = np.random.default_rng(71)
    # sized so the wide band spans many windows but the interpret-mode
    # kernel (cost ~ tile count) stays cheap
    n = m = 8192
    rows = np.repeat(np.arange(n, dtype=np.int64), 10)
    cols = np.clip(rows + rng.integers(-4000, 4000, rows.size), 0, m - 1)
    A = sp.coo_matrix((rng.standard_normal(rows.size), (rows, cols)),
                      shape=(n, m)).tocsr()
    A.sum_duplicates()
    a = CSR(data=jnp.asarray(A.data, np.float32),
            indices=jnp.asarray(A.indices.astype(np.int32)),
            indptr=jnp.asarray(A.indptr.astype(np.int32)), shape=(n, m))
    pa = build_seg_tiles(a, wsub="auto")
    p8 = build_seg_tiles(a, wsub=8)
    assert pa.wsub > 8 and pa.n_tiles < p8.n_tiles
    # kernel execution at wide windows is covered by
    # test_segtile_wide_windows_match — interpret-mode cost scales with
    # tile count and would dominate the suite here
    # narrow band: widening saves < 1.2x per doubling, stay at 8
    cols2 = np.clip(rows + rng.integers(-400, 400, rows.size), 0, m - 1)
    B = sp.coo_matrix((rng.standard_normal(rows.size), (rows, cols2)),
                      shape=(n, m)).tocsr()
    B.sum_duplicates()
    b = CSR(data=jnp.asarray(B.data, np.float32),
            indices=jnp.asarray(B.indices.astype(np.int32)),
            indptr=jnp.asarray(B.indptr.astype(np.int32)), shape=(n, m))
    assert build_seg_tiles(b, wsub="auto").wsub == 8


@pytest.mark.parametrize("wsub", [8, 16])
def test_segtile_32row_superblock_matches(wsub):
    """rows=32 packs 4 vreg-rows per tile (one window slice + one RMW); must
    agree with the oracle and the rows=8 kernel."""
    rng = np.random.default_rng(91)
    n = m = 4096
    per_row = 9
    rows = np.repeat(np.arange(n, dtype=np.int64), per_row)
    cols = np.clip(rows + rng.integers(-700, 700, rows.size), 0, m - 1)
    A = sp.coo_matrix((rng.standard_normal(rows.size), (rows, cols)),
                      shape=(n, m)).tocsr()
    A.sum_duplicates()
    a = CSR(data=jnp.asarray(A.data, np.float32),
            indices=jnp.asarray(A.indices.astype(np.int32)),
            indptr=jnp.asarray(A.indptr.astype(np.int32)), shape=(n, m))
    x = rng.standard_normal(m).astype(np.float32)
    p32 = build_seg_tiles(a, wsub=wsub, rows=32)
    assert p32.rows == 32 and p32.vals.shape[1:] == (32, 128)
    got = np.asarray(csr_smvm_segtile(a, jnp.asarray(x), p32, interpret=True))
    np.testing.assert_allclose(got, A @ x, rtol=2e-5, atol=2e-5)
    with pytest.raises(ValueError):
        build_seg_tiles(a, rows=16)


def test_segtile_32row_native_matches_numpy():
    """rows=32 plan: native sweep bit-identical to the NumPy fallback."""
    from unittest import mock

    a, A = random_csr(300, 1100, 4000, seed=8)
    p_fused = build_seg_tiles(a, rows=32)
    with mock.patch("sparse_tpu.native.plansort._lib", None), \
         mock.patch("sparse_tpu.native.plansort._tried", True):
        p_np = build_seg_tiles(a, rows=32)
    for f in ("vals", "q", "seg_of", "rb"):
        np.testing.assert_array_equal(
            np.asarray(getattr(p_fused, f)), np.asarray(getattr(p_np, f))
        )
    assert p_fused.n_tiles == p_np.n_tiles and p_fused.chunks == p_np.chunks


def test_segtile_32row_lowers_for_tpu():
    a, A = random_csr(64, 2048, 600, seed=3)
    x = jnp.asarray(np.random.default_rng(0).standard_normal(2048)
                    .astype(np.float32))
    plan = build_seg_tiles(a, wsub=16, rows=32)
    with jax.enable_x64(False):
        exported = jax.export.export(
            jax.jit(lambda a, v: csr_smvm_segtile(a, v, plan)),
            platforms=["tpu"],
        )(a, x)
    assert "tpu_custom_call" in exported.mlir_module()


def test_segtile_first_fit_native_matches_python():
    """First-fit layout: native sweep bit-identical to the pure-Python
    reference; fewer or equal tiles vs the rigid layout; kernel agrees."""
    from sparse_tpu.native import plansort

    a, A = random_csr(300, 2600, 2500, seed=12)
    indptr = np.asarray(a.indptr)
    cols = np.asarray(a.indices)[: int(indptr[-1])]
    for wsub in (8, 16):
        nat = plansort.seg_tile_layout_ff(indptr, cols, wsub)
        py = plansort.seg_tile_layout_ff_py(indptr, cols, wsub)
        if nat is None:
            pytest.skip("native plan core unavailable")
        for got, want in zip(nat, py):
            np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    pf = build_seg_tiles(a, wsub=16, layout="ff")
    pr = build_seg_tiles(a, wsub=16, layout="rigid")
    assert pf.n_tiles <= pr.n_tiles
    x = np.random.default_rng(0).standard_normal(2600).astype(np.float32)
    got = np.asarray(csr_smvm_segtile(a, jnp.asarray(x), pf, interpret=True))
    np.testing.assert_allclose(got, A @ x, rtol=2e-5, atol=2e-5)


def test_smvm_auto_falls_back_on_tile_overflow(monkeypatch):
    """A pattern whose tile count overflows int32 slot positions must fall
    back to the XLA path inside csr_smvm_auto (1M-row scrambled power-law
    class), not raise."""
    import sparse_tpu.ops.pallas_csr as pc

    a, A = random_csr(64, 2048, 600, seed=4)
    x = jnp.asarray(np.random.default_rng(1).standard_normal(2048)
                    .astype(np.float32))

    def boom(*args, **kw):
        raise ValueError("build_seg_tiles: tiles overflow int32")

    monkeypatch.setattr(pc, "build_seg_tiles", boom)
    monkeypatch.setattr(pc.jax, "default_backend", lambda: "tpu")
    got = pc.csr_smvm_auto(a, x)
    np.testing.assert_allclose(np.asarray(got), A @ np.asarray(x),
                               rtol=2e-4, atol=2e-4)


def test_hub_split_matches_oracle():
    """Hub/tail split SpMV (ops/hub_split.py): exact vs csr_smvm on a
    power-law fixture; the hub strip takes a meaningful entry share and
    the compact hub space is degree-ordered."""
    import sys

    from sparse_tpu.ops.hub_split import hub_split_prepare, hub_split_smvm

    rng = np.random.default_rng(0)
    n = 1000
    # heavy-tailed column distribution (zipf-ish)
    per_row = 5
    rows = np.repeat(np.arange(n, dtype=np.int64), per_row)
    cols = (np.minimum(rng.zipf(1.3, rows.size), n) - 1).astype(np.int64)
    import scipy.sparse as sp

    s = sp.coo_matrix(
        (rng.standard_normal(rows.size).astype(np.float32), (rows, cols)),
        shape=(n, n),
    ).tocsr()
    s.sum_duplicates()
    from sparse_tpu import CSR

    a = CSR(data=jnp.asarray(s.data), indices=jnp.asarray(s.indices),
            indptr=jnp.asarray(s.indptr.astype(np.int64)), shape=(n, n))
    split = hub_split_prepare(a, max_hub_cols=128, wsub=8)
    assert 0.05 < split.hub_fraction < 1.0
    # degree-ordered compact space: hub col 0 has the max degree
    deg = np.bincount(np.asarray(s.indices), minlength=n)
    assert deg[int(split.hub_cols[0])] == deg.max()
    v = rng.standard_normal(n).astype(np.float32)
    y = hub_split_smvm(split, jnp.asarray(v), interpret=True)
    np.testing.assert_allclose(np.asarray(y), s @ v, rtol=2e-4, atol=2e-4)
    with pytest.raises(ValueError, match="shape"):
        hub_split_smvm(split, jnp.zeros(5))


def test_seg_tiles_refresh_matches_rebuild():
    """Value refresh (one device gather) equals a full plan rebuild."""
    from sparse_tpu.ops.pallas_csr import (
        build_seg_tiles,
        csr_smvm_segtile,
        seg_tiles_refresh,
    )

    from sparse_tpu import csr_from_dense

    rng = np.random.default_rng(0)
    n = 96
    x = np.zeros((n, n), np.float32)
    for i in range(n):
        js = np.clip(i + rng.integers(-6, 7, size=4), 0, n - 1)
        x[i, js] = rng.standard_normal(js.size)
    a = csr_from_dense(jnp.asarray(x))
    plan = build_seg_tiles(a, refreshable=True)
    new_data = a.data * 3.25
    a2 = CSR(data=new_data, indices=a.indices, indptr=a.indptr,
             shape=a.shape)
    plan2 = seg_tiles_refresh(plan, new_data)
    ref = build_seg_tiles(a2)
    np.testing.assert_array_equal(np.asarray(plan2.vals), np.asarray(ref.vals))
    v = rng.standard_normal(n).astype(np.float32)
    y = csr_smvm_segtile(a2, jnp.asarray(v), plan2, interpret=True)
    np.testing.assert_allclose(np.asarray(y), (x * 3.25) @ v, rtol=2e-5,
                               atol=2e-5)
    # non-refreshable plans refuse loudly
    with pytest.raises(ValueError, match="refreshable"):
        seg_tiles_refresh(build_seg_tiles(a), new_data)
