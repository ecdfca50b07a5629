"""Fast (ELL / row-binned) SpMV and SpMM paths vs the segment-sum oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sparse_tpu import csr_from_dense, csr_smvm, spmm
from sparse_tpu.ops.spmv import (
    build_spmv_plan,
    csr_smvm_ell,
    csr_smvm_fast,
    csr_spmm_ell,
    csr_spmm_fast,
    row_capacity,
)


def random_csr(n, m, density, seed):
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((n, m)) * (rng.random((n, m)) < density)
    return csr_from_dense(jnp.asarray(x)), x


@pytest.mark.parametrize("n,m,density", [
    pytest.param(40, 50, 0.1, marks=pytest.mark.slow),  # breadth
    pytest.param(64, 64, 0.5, marks=pytest.mark.slow),  # breadth (suite budget)
    (7, 100, 0.9),
])
def test_ell_matches_oracle(n, m, density):
    a, xa = random_csr(n, m, density, seed=n)
    v = jnp.asarray(np.random.default_rng(0).standard_normal(m))
    L = row_capacity(a)
    got = csr_smvm_ell(a, v, L)
    np.testing.assert_allclose(np.asarray(got), xa @ np.asarray(v), rtol=1e-10)
    # overshooting the capacity must not change the result
    got2 = csr_smvm_ell(a, v, L + 7)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(got), rtol=1e-12)


def test_ell_spmm_matches_oracle():
    a, xa = random_csr(32, 48, 0.2, seed=1)
    b = jnp.asarray(np.random.default_rng(1).standard_normal((48, 16)))
    got = csr_spmm_ell(a, b, row_capacity(a))
    np.testing.assert_allclose(np.asarray(got), xa @ np.asarray(b), rtol=1e-10)


@pytest.mark.slow  # breadth: plan-shape coverage (suite budget, round 5)
def test_skewed_rows_binned_plan():
    # one dense row + many short rows: binning keeps per-bin padding tight
    n, m = 100, 200
    rng = np.random.default_rng(3)
    x = rng.standard_normal((n, m)) * (rng.random((n, m)) < 0.02)
    x[17] = rng.standard_normal(m)  # dense row
    x[50] = 0.0  # empty row
    a = csr_from_dense(jnp.asarray(x))
    plan = build_spmv_plan(a)
    assert len(plan.bin_sizes) >= 2
    assert sum(plan.bin_sizes) <= n  # empty rows skipped
    v = jnp.asarray(rng.standard_normal(m))
    np.testing.assert_allclose(
        np.asarray(csr_smvm_fast(a, v, plan)), x @ np.asarray(v), rtol=1e-10
    )
    # csr_spmm_fast on a binned plan is covered (with chunking) by
    # test_row_chunked_matches_unchunked — a second compile here bought
    # nothing


def test_fast_path_under_jit():
    a, xa = random_csr(60, 60, 0.15, seed=5)
    v = jnp.asarray(np.random.default_rng(5).standard_normal(60))
    plan = build_spmv_plan(a)
    f = jax.jit(lambda a, v: csr_smvm_fast(a, v, plan))
    np.testing.assert_allclose(np.asarray(f(a, v)), xa @ np.asarray(v), rtol=1e-10)
    # consistency with the segment-sum baseline
    np.testing.assert_allclose(
        np.asarray(f(a, v)), np.asarray(csr_smvm(a, v)), rtol=1e-10
    )


def test_empty_and_degenerate():
    a, _ = random_csr(10, 10, 0.0, seed=6)
    v = jnp.zeros(10)
    assert csr_smvm_fast(a, v).shape == (10,)
    assert np.all(np.asarray(csr_smvm_fast(a, v)) == 0)


@pytest.mark.slow  # breadth: chunking equivalence (suite budget, round 5)
def test_row_chunked_matches_unchunked():
    a, xa = random_csr(101, 64, 0.2, seed=13)
    v = jnp.asarray(np.random.default_rng(13).standard_normal(64))
    b = jnp.asarray(np.random.default_rng(14).standard_normal((64, 8)))
    plan = build_spmv_plan(a)
    np.testing.assert_allclose(
        np.asarray(csr_smvm_fast(a, v, plan, row_chunk=16)),
        np.asarray(csr_smvm_fast(a, v, plan)),
        rtol=1e-12,
    )
    np.testing.assert_allclose(
        np.asarray(csr_spmm_fast(a, b, plan, row_chunk=7)),
        xa @ np.asarray(b),
        rtol=1e-10,
    )
    f = jax.jit(lambda a, b: csr_spmm_fast(a, b, plan, row_chunk=10))
    np.testing.assert_allclose(np.asarray(f(a, b)), xa @ np.asarray(b), rtol=1e-10)
