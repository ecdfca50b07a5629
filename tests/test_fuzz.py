"""Randomized cross-format consistency sweep: for random shapes/densities,
every format's round-trips and products must agree with the dense oracle.
Seeded (deterministic); complements the golden-vector suites with breadth."""

import jax.numpy as jnp
import numpy as np
import pytest

from sparse_tpu import (
    bsr_from_dense,
    bsr_smsmm,
    bsr_smvm,
    bsr_todense,
    csr_from_dense,
    csr_smvm,
    csr_todense,
    csr_transpose,
    csc_todense,
    spgemm,
    spmm,
)
from sparse_tpu.formats.bell import bell_from_bsr, bell_smvm, bell_todense
from sparse_tpu.ops.spmv import build_spmv_plan, csr_smvm_fast


# quick cases cover the regimes (degenerate, rectangular, sparse and
# dense fill); the rest are breadth-only and run with -m slow (each
# distinct shape-set costs ~10-25 s of XLA compiles on this host)
CASES = [(1, 1, 1.0), (13, 13, 0.08)]
SLOW_CASES = [(31, 17, 0.33), (64, 64, 0.02), (5, 40, 0.9), (2, 7, 0.5),
              (40, 5, 0.15)]


@pytest.mark.parametrize(
    "n,m,density",
    CASES + [pytest.param(*c, marks=pytest.mark.slow) for c in SLOW_CASES],
)
def test_csr_consistency(n, m, density):
    rng = np.random.default_rng(hash((n, m, int(density * 100))) % 2**32)
    x = rng.standard_normal((n, m)) * (rng.random((n, m)) < density)
    a = csr_from_dense(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(csr_todense(a)), x, rtol=1e-12)
    np.testing.assert_allclose(
        np.asarray(csc_todense(csr_transpose(a))), x.T, rtol=1e-12
    )
    v = rng.standard_normal(m)
    np.testing.assert_allclose(
        np.asarray(csr_smvm(a, jnp.asarray(v))), x @ v, rtol=1e-10, atol=1e-12
    )
    plan = build_spmv_plan(a)
    np.testing.assert_allclose(
        np.asarray(csr_smvm_fast(a, jnp.asarray(v), plan)), x @ v,
        rtol=1e-10, atol=1e-12,
    )
    b = rng.standard_normal((m, 3))
    np.testing.assert_allclose(
        np.asarray(spmm(a, jnp.asarray(b))), x @ b, rtol=1e-10, atol=1e-12
    )
    y = rng.standard_normal((m, n)) * (rng.random((m, n)) < density)
    c = spgemm(a, csr_from_dense(jnp.asarray(y)))
    np.testing.assert_allclose(
        np.asarray(csr_todense(c)), x @ y, rtol=1e-10, atol=1e-10
    )


@pytest.mark.parametrize("nb,bsz,density", [
    (1, 2, 1.0),
    pytest.param(3, 4, 0.6, marks=pytest.mark.slow),  # breadth
    pytest.param(7, 3, 0.2, marks=pytest.mark.slow),  # breadth
    (5, 8, 0.1),
])
def test_bsr_bell_consistency(nb, bsz, density):
    n = nb * bsz
    rng = np.random.default_rng(hash((nb, bsz)) % 2**32)
    mask = np.kron(rng.random((nb, nb)) < density, np.ones((bsz, bsz)))
    x = rng.standard_normal((n, n)) * mask
    a = bsr_from_dense(jnp.asarray(x), bsz)
    np.testing.assert_allclose(np.asarray(bsr_todense(a)), x, rtol=1e-12)
    e = bell_from_bsr(a)
    np.testing.assert_allclose(np.asarray(bell_todense(e)), x, rtol=1e-12)
    v = rng.standard_normal(n)
    np.testing.assert_allclose(
        np.asarray(bsr_smvm(a, jnp.asarray(v))), x @ v, rtol=1e-10, atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(bell_smvm(e, jnp.asarray(v))), x @ v, rtol=1e-10, atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(bsr_todense(bsr_smsmm(a, a))), x @ x, rtol=1e-9, atol=1e-9
    )


@pytest.mark.parametrize("n,m,k,da,db", [
    pytest.param(17, 23, 11, 0.25, 0.2, marks=pytest.mark.slow),
    pytest.param(40, 8, 31, 0.1, 0.5, marks=pytest.mark.slow),
    (9, 9, 9, 0.6, 0.6),
])
def test_spgemm_plan_consistency(n, m, k, da, db):
    # prepare/apply vs eager spgemm vs dense oracle, plus one value update
    import dataclasses as dc

    from sparse_tpu import spgemm_apply, spgemm_prepare

    rng = np.random.default_rng(hash((n, m, k)) % 2**32)
    xa = rng.standard_normal((n, m)) * (rng.random((n, m)) < da)
    xb = rng.standard_normal((m, k)) * (rng.random((m, k)) < db)
    a = csr_from_dense(jnp.asarray(xa))
    b = csr_from_dense(jnp.asarray(xb))
    plan = spgemm_prepare(a, b)
    c = spgemm_apply(plan, a, b)
    np.testing.assert_allclose(
        np.asarray(csr_todense(c)), xa @ xb, rtol=1e-10, atol=1e-12
    )
    a2 = dc.replace(a, data=a.data * -0.5)
    c2 = spgemm_apply(plan, a2, b)
    np.testing.assert_allclose(
        np.asarray(csr_todense(c2)), -0.5 * (xa @ xb), rtol=1e-10, atol=1e-12
    )
