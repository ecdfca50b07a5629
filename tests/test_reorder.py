"""RCM reordering + CSR permutation (ops/reorder.py).

Oracles: SciPy's reverse_cuthill_mckee for ordering quality, dense NumPy
for permutation semantics.  The native C++ core and the NumPy fallback are
pinned bit-identical (same policy as the other plan-core tests in
test_native.py)."""

import numpy as np
import pytest
import scipy.sparse as sp
from scipy.sparse.csgraph import reverse_cuthill_mckee

import jax
import jax.numpy as jnp

from sparse_tpu import (
    CSR,
    csr_bandwidth,
    csr_from_dense,
    csr_permute,
    csr_smvm,
    permute_apply,
    permute_prepare,
    permute_vector,
    rcm_order,
    reorder_for_locality,
    unpermute_vector,
)
from sparse_tpu.native import plansort
from sparse_tpu.ops.reorder import _rcm_numpy


def _random_csr(rng, n, m, density=0.05, symmetric=False):
    d = (rng.random((n, m)) < density).astype(np.float64)
    d *= rng.standard_normal((n, m))
    if symmetric:
        d = d + d.T
    return csr_from_dense(jnp.asarray(d)), d


def _host_structure(a: CSR):
    indptr = np.asarray(a.indptr, np.int64)
    k = int(indptr[-1])
    return indptr, np.asarray(a.indices[:k], np.int64)


# -- RCM core ---------------------------------------------------------------------


def test_rcm_is_permutation_and_reduces_bandwidth():
    rng = np.random.default_rng(0)
    n = 200
    # banded matrix, rows/cols shuffled: RCM must recover (near-)banded form
    band = np.zeros((n, n))
    for off in (-3, -1, 0, 1, 3):
        band += np.diag(rng.standard_normal(n - abs(off)), off)
    sh = rng.permutation(n)
    shuffled = band[sh][:, sh]
    a = csr_from_dense(jnp.asarray(shuffled))
    perm = rcm_order(a)
    assert sorted(perm) == list(range(n))
    ap = csr_permute(a, perm, perm)
    assert csr_bandwidth(ap) <= 10  # original band half-width is 3
    assert csr_bandwidth(ap) < csr_bandwidth(a)


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_rcm_quality_matches_scipy(seed):
    rng = np.random.default_rng(seed)
    a, d = _random_csr(rng, 150, 150, density=0.03, symmetric=True)
    perm = rcm_order(a)
    sperm = np.asarray(
        reverse_cuthill_mckee(sp.csr_matrix(d), symmetric_mode=True),
        np.int64,
    )
    ours = csr_bandwidth(csr_permute(a, perm, perm))
    theirs = csr_bandwidth(csr_permute(a, sperm, sperm))
    # same algorithm, possibly different tie-breaks: equal-quality orderings
    assert ours <= max(int(theirs * 1.2), theirs + 5)


def test_rcm_native_matches_numpy_fallback():
    rng = np.random.default_rng(7)
    for n, density, symmetric in [
        (1, 1.0, False),
        (17, 0.2, False),       # asymmetric pattern: symmetrization path
        (64, 0.05, True),
        (120, 0.02, False),     # sparse enough for several components
        (40, 0.0, False),       # empty: every node its own component
    ]:
        # host-only structure (the test compares two HOST implementations;
        # a device CSR build would pay one XLA compile per shape)
        d = (rng.random((n, n)) < density)
        if symmetric:
            d = d | d.T
        s = sp.csr_matrix(d)
        indptr = s.indptr.astype(np.int32)
        cols = s.indices.astype(np.int32)
        native = plansort.rcm_order(indptr, cols)
        if native is None:
            pytest.skip("native plan core unavailable")
        ref = _rcm_numpy(indptr, cols, n)
        np.testing.assert_array_equal(native, ref)


def test_rcm_self_loops_and_empty():
    # self-loops must not create edges; empty matrix is identity-orderable
    d = np.diag(np.arange(1.0, 6.0))
    a = csr_from_dense(jnp.asarray(d))
    perm = rcm_order(a)
    assert sorted(perm) == list(range(5))
    a0 = csr_from_dense(jnp.zeros((0, 0)))
    assert rcm_order(a0).size == 0


def test_rcm_rejects_nonsquare():
    a = csr_from_dense(jnp.ones((2, 3)))
    with pytest.raises(ValueError, match="square"):
        rcm_order(a)


# -- permutation ------------------------------------------------------------------


@pytest.mark.parametrize("seed", [0, 5])
def test_csr_permute_matches_dense(seed):
    rng = np.random.default_rng(seed)
    n, m = 37, 23
    a, d = _random_csr(rng, n, m, density=0.15)
    rperm = rng.permutation(n)
    cperm = rng.permutation(m)
    got = np.asarray(csr_permute(a, rperm, cperm).todense())
    np.testing.assert_allclose(got, d[rperm][:, cperm], rtol=1e-12)
    # rows only
    got = np.asarray(csr_permute(a, rperm).todense())
    np.testing.assert_allclose(got, d[rperm], rtol=1e-12)


def test_csr_permute_preserves_canonical_structure():
    rng = np.random.default_rng(3)
    a, _ = _random_csr(rng, 29, 31, density=0.2)
    ap = csr_permute(a, rng.permutation(29), rng.permutation(31))
    indptr, cols = _host_structure(ap)
    for r in range(29):
        rc = cols[indptr[r]:indptr[r + 1]]
        assert (np.diff(rc) > 0).all()  # sorted, unique within each row


def test_permute_plan_reuse_and_jit():
    rng = np.random.default_rng(11)
    a, d = _random_csr(rng, 20, 20, density=0.3)
    # padded capacity: element-wise add doubles capacity with a padding tail
    apad = a + a
    assert apad.nse > int(np.asarray(apad.indptr)[-1])
    rperm, cperm = rng.permutation(20), rng.permutation(20)
    plan = permute_prepare(apad, rperm, cperm)
    out = jax.jit(permute_apply)(plan, apad)
    np.testing.assert_allclose(
        np.asarray(out.todense()), (2 * d)[rperm][:, cperm], rtol=1e-12
    )
    # same pattern, new values: apply without re-preparing
    import dataclasses

    a2 = dataclasses.replace(apad, data=apad.data * 3)
    out2 = permute_apply(plan, a2)
    np.testing.assert_allclose(
        np.asarray(out2.todense()), (6 * d)[rperm][:, cperm], rtol=1e-12
    )


@pytest.mark.slow  # breadth: validation messages (suite budget, round 5)
def test_permute_rejects_bad_perms():
    a = csr_from_dense(jnp.ones((3, 3)))
    with pytest.raises(ValueError, match="rperm"):
        permute_prepare(a, np.array([0, 1, 1]))
    with pytest.raises(ValueError, match="rperm"):
        permute_prepare(a, np.array([0, 1, 5]))
    with pytest.raises(ValueError, match="cperm"):
        permute_prepare(a, np.arange(3), np.array([2, 2, 0]))
    plan = permute_prepare(a, np.arange(3))
    b = csr_from_dense(jnp.ones((3, 4)))
    with pytest.raises(ValueError, match="does not match"):
        permute_apply(plan, b)


# -- end-to-end reorder around SpMV ------------------------------------------------


def test_reorder_for_locality_spmv_roundtrip():
    rng = np.random.default_rng(21)
    n = 300
    band = np.zeros((n, n))
    for off in (-2, 0, 2):
        band += np.diag(rng.standard_normal(n - abs(off)), off)
    sh = rng.permutation(n)
    a = csr_from_dense(jnp.asarray(band[sh][:, sh]))
    ap, perm = reorder_for_locality(a)
    assert csr_bandwidth(ap) < csr_bandwidth(a) // 4
    x = jnp.asarray(rng.standard_normal(n))
    y_direct = csr_smvm(a, x)
    y_perm = unpermute_vector(csr_smvm(ap, permute_vector(x, perm)), perm)
    np.testing.assert_allclose(
        np.asarray(y_perm), np.asarray(y_direct), rtol=1e-10, atol=1e-12
    )
