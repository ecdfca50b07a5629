"""Packed triangular format: conformance against the reference's golden
vectors (triangular_test.fut) plus property tests against NumPy oracles.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sparse_tpu import (
    Triangular,
    tri_add,
    tri_diag,
    tri_elements,
    tri_eye,
    tri_from_dense,
    tri_idx,
    tri_map,
    tri_nnz,
    tri_scale,
    tri_smm,
    tri_sub,
    tri_todense,
    tri_transpose,
    tri_zero,
)


def dense(a):
    return np.asarray(tri_todense(a))


# -- golden vectors (triangular_test.fut) -------------------------------------


@pytest.mark.parametrize("n", [0, 2, 4])
@pytest.mark.parametrize("lower", [True, False])
def test_eye(n, lower):
    # triangular_test.fut:9-19, 43-53
    np.testing.assert_array_equal(
        dense(tri_eye(n, lower=lower, dtype=jnp.int32)), np.eye(n, dtype=np.int32)
    )


@pytest.mark.parametrize(
    "x, expect",
    [
        ([[1, 2, 3], [0, 4, 5], [0, 0, 6]], 6),
        (np.zeros((0, 0), np.int32), 0),
        ([[0, 0, 0], [0, 0, 0], [0, 0, 0]], 0),
    ],
)
def test_upper_nnz(x, expect):
    # triangular_test.fut:21-31
    a = tri_from_dense(jnp.asarray(x, jnp.int32), lower=False)
    assert int(tri_nnz(a)) == expect


def test_triangular_from_dense():
    # triangular_test.fut:33-39, 55-61: zero side ignored
    x = jnp.asarray([[1, 2, 3], [4, 5, 6], [7, 8, 9]], jnp.int32)
    np.testing.assert_array_equal(
        dense(tri_from_dense(x, lower=False)),
        [[1, 2, 3], [0, 5, 6], [0, 0, 9]],
    )
    np.testing.assert_array_equal(
        dense(tri_from_dense(x, lower=True)),
        [[1, 0, 0], [4, 5, 0], [7, 8, 9]],
    )


@pytest.mark.parametrize("n", [0, 3])
def test_transpose_roundtrip(n):
    # triangular_test.fut:63-94
    rng = np.random.default_rng(0)
    x = np.triu(rng.integers(1, 9, (n, n))).astype(np.int32)
    u = tri_from_dense(jnp.asarray(x), lower=False)
    l = tri_transpose(u)
    assert l.lower
    np.testing.assert_array_equal(dense(l), x.T)
    np.testing.assert_array_equal(dense(tri_transpose(l)), x)


def test_transpose_f64():
    # triangular_test.fut:87-94
    x = jnp.asarray([[1.0, 2, 3], [0, 4, 5], [0, 0, 6]], jnp.float64)
    got = dense(tri_transpose(tri_from_dense(x, lower=False)))
    np.testing.assert_array_equal(got, np.asarray(x).T)


@pytest.mark.parametrize(
    "a, b, expect",
    [
        ([[1, 0], [0, 1]], [[1, 0], [0, 1]], [[1, 0], [0, 1]]),
        ([[1, 0], [3, 4]], [[1, 0], [3, 4]], [[1, 0], [15, 16]]),
    ],
)
def test_lower_smm(a, b, expect):
    # triangular_test.fut:96-103
    got = tri_smm(
        tri_from_dense(jnp.asarray(a, jnp.int32)),
        tri_from_dense(jnp.asarray(b, jnp.int32)),
    )
    assert got.lower
    np.testing.assert_array_equal(dense(got), expect)


@pytest.mark.parametrize(
    "a, b, expect",
    [
        ([[1, 0], [0, 1]], [[1, 0], [0, 1]], [[1, 0], [0, 1]]),
        ([[1, 2], [0, 4]], [[10, 20], [0, 40]], [[10, 100], [0, 160]]),
    ],
)
def test_upper_smm(a, b, expect):
    # triangular_test.fut:105-112
    got = tri_smm(
        tri_from_dense(jnp.asarray(a, jnp.int32), lower=False),
        tri_from_dense(jnp.asarray(b, jnp.int32), lower=False),
    )
    assert not got.lower
    np.testing.assert_array_equal(dense(got), expect)


# -- property tests (NumPy oracle, house style per SURVEY.md §4) ---------------


@pytest.mark.parametrize("n", [1, 5, 17, 64])
@pytest.mark.parametrize("lower", [True, False])
def test_smm_matches_dense_oracle(n, lower):
    rng = np.random.default_rng(n)
    mask = np.tril if lower else np.triu
    xa = mask(rng.standard_normal((n, n)))
    xb = mask(rng.standard_normal((n, n)))
    got = tri_smm(
        tri_from_dense(jnp.asarray(xa), lower=lower),
        tri_from_dense(jnp.asarray(xb), lower=lower),
    )
    np.testing.assert_allclose(dense(got), xa @ xb, rtol=1e-12, atol=1e-12)


@pytest.mark.parametrize("lower", [True, False])
def test_elementwise_ops(lower):
    rng = np.random.default_rng(3)
    n = 6
    mask = np.tril if lower else np.triu
    xa = mask(rng.standard_normal((n, n)))
    xb = mask(rng.standard_normal((n, n)))
    a = tri_from_dense(jnp.asarray(xa), lower=lower)
    b = tri_from_dense(jnp.asarray(xb), lower=lower)
    np.testing.assert_allclose(dense(tri_add(a, b)), xa + xb, rtol=1e-12)
    np.testing.assert_allclose(dense(tri_sub(a, b)), xa - xb, rtol=1e-12)
    np.testing.assert_allclose(dense(tri_scale(2.0, a)), 2 * xa, rtol=1e-12)
    np.testing.assert_allclose(dense(tri_map(jnp.exp, a)), mask(np.exp(xa)))


def test_zero_diag_idx():
    z = tri_zero(4)
    assert z.data.shape == (tri_elements(4),)
    np.testing.assert_array_equal(dense(z), np.zeros((4, 4), np.float32))
    v = jnp.asarray([1.0, 2.0, 3.0])
    np.testing.assert_array_equal(dense(tri_diag(v)), np.diag([1, 2, 3]))
    a = tri_from_dense(jnp.asarray([[1.0, 0], [2, 3]]))
    assert float(tri_idx(a, 1, 0)) == 2.0
    assert float(tri_idx(a, 0, 1)) == 0.0  # zero side
    u = tri_transpose(a)
    assert float(tri_idx(u, 0, 1)) == 2.0
    assert float(tri_idx(u, 1, 0)) == 0.0


def test_ops_under_jit():
    n = 8
    rng = np.random.default_rng(7)
    xa = np.tril(rng.standard_normal((n, n)))
    xb = np.tril(rng.standard_normal((n, n)))
    a = tri_from_dense(jnp.asarray(xa))
    b = tri_from_dense(jnp.asarray(xb))

    @jax.jit
    def f(a, b):
        return tri_todense(tri_smm(tri_add(a, b), tri_transpose(tri_transpose(b))))

    np.testing.assert_allclose(np.asarray(f(a, b)), (xa + xb) @ xb, rtol=1e-12)


def test_unrank_large():
    # closed-form row finder must be exact at large packed indices
    from sparse_tpu.formats.triangular import _unrank_rows

    n = 3000
    P = tri_elements(n)
    p = jnp.asarray([0, 1, 2, P - 1, P - n, 12345678], jnp.int32)
    rows = np.asarray(_unrank_rows(p))
    for pi, ri in zip(np.asarray(p), rows):
        assert ri * (ri + 1) // 2 <= pi < (ri + 1) * (ri + 2) // 2


def test_tri_smm_blocked_matches_densify():
    # force the blocked packed path at a small size and check it against
    # the densify path and the dense oracle, both orientations
    from sparse_tpu.formats import triangular as tri_mod

    rng = np.random.default_rng(9)
    n = 333
    for lower in (True, False):
        x = np.tril(rng.standard_normal((n, n)))
        if not lower:
            x = x.T
        y = np.tril(rng.standard_normal((n, n)))
        if not lower:
            y = y.T
        a = tri_mod.tri_from_dense(jnp.asarray(x, jnp.float32), lower=lower)
        b = tri_mod.tri_from_dense(jnp.asarray(y, jnp.float32), lower=lower)
        dense_ref = tri_mod.tri_todense(tri_mod.tri_smm(a, b))
        ad, bd = (a.data, b.data) if lower else (b.data, a.data)
        blocked = tri_mod._tri_smm_blocked(
            ad, bd, n, jnp.float32, B=64
        )
        c_blocked = tri_mod.Triangular(data=blocked, n=n, lower=lower)
        np.testing.assert_allclose(
            np.asarray(tri_mod.tri_todense(c_blocked)),
            np.asarray(dense_ref),
            rtol=2e-4, atol=2e-4,
        )
        np.testing.assert_allclose(
            np.asarray(dense_ref), x @ y, rtol=2e-4, atol=2e-4
        )


def test_tri_smm_large_dispatches_blocked(monkeypatch):
    # shrink the dispatch threshold so the public entry point exercises the
    # blocked path end-to-end
    from sparse_tpu.formats import triangular as tri_mod

    monkeypatch.setattr(tri_mod, "_TRI_DENSE_MAX", 100)
    monkeypatch.setattr(tri_mod, "_TRI_BLOCK", 64)
    rng = np.random.default_rng(10)
    n = 150
    x = np.tril(rng.standard_normal((n, n)))
    y = np.tril(rng.standard_normal((n, n)))
    a = tri_mod.tri_from_dense(jnp.asarray(x, jnp.float32), lower=True)
    b = tri_mod.tri_from_dense(jnp.asarray(y, jnp.float32), lower=True)
    c = tri_mod.tri_smm(a, b)
    np.testing.assert_allclose(
        np.asarray(tri_mod.tri_todense(c)), x @ y, rtol=2e-4, atol=2e-4
    )
