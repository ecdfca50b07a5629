"""Packed trapezoidal format: conformance against the reference's golden
vectors (trapezoidal_test.fut) plus NumPy-oracle property tests.

The reference comments out its zero-size cases (trapezoidal_test.fut:16-17,
29-30 — a known hole); we cover them anyway.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sparse_tpu import (
    trap_add,
    trap_diag,
    trap_elements,
    trap_eye,
    trap_from_dense,
    trap_idx,
    trap_map,
    trap_nnz,
    trap_scale,
    trap_smm,
    trap_sub,
    trap_todense,
    trap_transpose,
    trap_zero,
)


def dense(a):
    return np.asarray(trap_todense(a))


def tril(n, m, x):
    return np.tril(np.asarray(x)[:n, :m])


# -- golden vectors (trapezoidal_test.fut) ------------------------------------


@pytest.mark.parametrize("n", [0, 2, 4])
@pytest.mark.parametrize("lower", [True, False])
def test_eye_square(n, lower):
    # trapezoidal_test.fut:9-20, 45-56 (incl. the commented-out n=0 hole)
    np.testing.assert_array_equal(
        dense(trap_eye(n, n, lower=lower, dtype=jnp.int32)), np.eye(n, dtype=np.int32)
    )


@pytest.mark.parametrize("n,m", [(4, 2), (2, 4), (3, 5), (5, 3), (0, 3), (3, 0)])
@pytest.mark.parametrize("lower", [True, False])
def test_eye_rect(n, m, lower):
    np.testing.assert_array_equal(
        dense(trap_eye(n, m, lower=lower, dtype=jnp.int32)),
        np.eye(n, m, dtype=np.int32),
    )


@pytest.mark.parametrize(
    "x, expect",
    [([[1, 2, 3], [0, 4, 5], [0, 0, 6]], 6), ([[0, 0, 0], [0, 0, 0], [0, 0, 0]], 0)],
)
def test_upper_nnz(x, expect):
    # trapezoidal_test.fut:22-33
    a = trap_from_dense(jnp.asarray(x, jnp.int32), lower=False)
    assert int(trap_nnz(a)) == expect


@pytest.mark.parametrize(
    "x, expect",
    [
        ([[1, 2, 3], [4, 5, 6], [7, 8, 9]], [[1, 0, 0], [4, 5, 0], [7, 8, 9]]),
        ([[1, 0], [3, 4], [5, 6], [7, 8]], [[1, 0], [3, 4], [5, 6], [7, 8]]),
        ([[1, 0, 0], [4, 5, 0]], [[1, 0, 0], [4, 5, 0]]),
    ],
)
def test_lower_trapezoidal(x, expect):
    # trapezoidal_test.fut:58-67: tall matrices keep full rows below the triangle
    got = dense(trap_from_dense(jnp.asarray(x, jnp.int32), lower=True))
    np.testing.assert_array_equal(got, expect)


def test_upper_trapezoidal():
    # trapezoidal_test.fut:35-41
    x = jnp.asarray([[1, 2, 3], [4, 5, 6], [7, 8, 9]], jnp.int32)
    np.testing.assert_array_equal(
        dense(trap_from_dense(x, lower=False)), [[1, 2, 3], [0, 5, 6], [0, 0, 9]]
    )


def test_transpose():
    # trapezoidal_test.fut:73-93
    x = jnp.asarray([[1, 2, 3], [0, 4, 5], [0, 0, 6]], jnp.int32)
    u = trap_from_dense(x, lower=False)
    l = trap_transpose(u)
    assert l.lower and l.shape == (3, 3)
    np.testing.assert_array_equal(dense(l), np.asarray(x).T)
    np.testing.assert_array_equal(dense(trap_transpose(l)), x)


def test_transpose_rect_o1():
    x = np.tril(np.arange(1, 13).reshape(4, 3)).astype(np.int32)
    a = trap_from_dense(jnp.asarray(x))
    t = trap_transpose(a)
    assert t.shape == (3, 4) and not t.lower
    assert t.data is a.data  # zero data movement
    np.testing.assert_array_equal(dense(t), x.T)


@pytest.mark.parametrize(
    "a, b, expect",
    [
        ([[1, 0], [0, 1]], [[1, 0], [0, 1]], [[1, 0], [0, 1]]),
        ([[1, 0], [3, 4]], [[1, 0], [3, 4]], [[1, 0], [15, 16]]),
        (
            [[1, 0], [3, 4], [5, 6], [7, 8]],
            [[1, 0, 0], [4, 5, 0]],
            [[1, 0, 0], [19, 20, 0], [29, 30, 0], [39, 40, 0]],
        ),
        (
            [[1, 0, 0], [4, 5, 0], [7, 8, 9]],
            [[1, 0], [3, 4], [5, 6]],
            [[1, 0], [19, 20], [76, 86]],
        ),
    ],
)
def test_lower_smm(a, b, expect):
    # trapezoidal_test.fut:95-107 incl. rectangular cases
    got = trap_smm(
        trap_from_dense(jnp.asarray(a, jnp.int32)),
        trap_from_dense(jnp.asarray(b, jnp.int32)),
    )
    assert got.lower and got.shape == (len(a), len(b[0]))
    np.testing.assert_array_equal(dense(got), expect)


@pytest.mark.parametrize(
    "a, b, expect",
    [
        ([[1, 0], [0, 1]], [[1, 0], [0, 1]], [[1, 0], [0, 1]]),
        ([[1, 2], [0, 4]], [[10, 20], [0, 40]], [[10, 100], [0, 160]]),
    ],
)
def test_upper_smm(a, b, expect):
    # trapezoidal_test.fut:109-116
    got = trap_smm(
        trap_from_dense(jnp.asarray(a, jnp.int32), lower=False),
        trap_from_dense(jnp.asarray(b, jnp.int32), lower=False),
    )
    assert not got.lower
    np.testing.assert_array_equal(dense(got), expect)


# -- property tests -----------------------------------------------------------


@pytest.mark.parametrize("n,m,k", [(5, 3, 4), (3, 5, 2), (8, 8, 8), (1, 7, 1)])
@pytest.mark.parametrize("lower", [True, False])
def test_smm_matches_dense_oracle(n, m, k, lower):
    rng = np.random.default_rng(n * 100 + m * 10 + k)
    mask = np.tril if lower else np.triu
    xa = mask(rng.standard_normal((n, m)))
    xb = mask(rng.standard_normal((m, k)))
    got = trap_smm(
        trap_from_dense(jnp.asarray(xa), lower=lower),
        trap_from_dense(jnp.asarray(xb), lower=lower),
    )
    np.testing.assert_allclose(dense(got), xa @ xb, rtol=1e-12, atol=1e-12)


@pytest.mark.parametrize("n,m", [(4, 2), (2, 4), (5, 5)])
def test_elementwise_and_capacity(n, m):
    rng = np.random.default_rng(1)
    xa = np.tril(rng.standard_normal((n, m)))
    xb = np.tril(rng.standard_normal((n, m)))
    a = trap_from_dense(jnp.asarray(xa))
    b = trap_from_dense(jnp.asarray(xb))
    assert a.data.shape == (trap_elements(n, m),)
    np.testing.assert_allclose(dense(trap_add(a, b)), xa + xb, rtol=1e-12)
    np.testing.assert_allclose(dense(trap_sub(a, b)), xa - xb, rtol=1e-12)
    np.testing.assert_allclose(dense(trap_scale(3.0, a)), 3 * xa, rtol=1e-12)
    np.testing.assert_allclose(dense(trap_map(lambda d: d * d, a)), xa * xa)


def test_zero_diag_idx():
    np.testing.assert_array_equal(
        dense(trap_zero(3, 2)), np.zeros((3, 2), np.float32)
    )
    np.testing.assert_array_equal(
        dense(trap_diag(jnp.asarray([1.0, 2.0]))), np.diag([1.0, 2.0])
    )
    x = jnp.asarray([[1.0, 0], [2, 3], [4, 5]])
    a = trap_from_dense(x)
    assert float(trap_idx(a, 2, 1)) == 5.0
    assert float(trap_idx(a, 0, 1)) == 0.0  # zero side
    u = trap_transpose(a)  # (2, 3) upper
    assert float(trap_idx(u, 1, 2)) == 5.0
    assert float(trap_idx(u, 1, 0)) == 0.0


def test_ops_under_jit():
    n, m, k = 6, 4, 5
    rng = np.random.default_rng(9)
    xa = np.tril(rng.standard_normal((n, m)))
    xb = np.tril(rng.standard_normal((m, k)))
    a = trap_from_dense(jnp.asarray(xa))
    b = trap_from_dense(jnp.asarray(xb))

    @jax.jit
    def f(a, b):
        return trap_todense(trap_smm(trap_scale(2.0, a), b))

    np.testing.assert_allclose(np.asarray(f(a, b)), 2 * xa @ xb, rtol=1e-12)


@pytest.mark.slow  # breadth: blocked path equivalence (suite budget)
def test_trap_smm_blocked_matches_densify():
    # force the blocked packed path at small sizes and check it against the
    # densify path and the dense oracle: tall, wide, and square shape mixes,
    # both orientations
    from sparse_tpu.formats import trapezoidal as trap_mod

    rng = np.random.default_rng(11)
    # one shape per orientation still covers both clamping regimes (tall
    # lower, wide upper); each extra combo costs a ~10 s fresh compile of
    # the blocked fori_loop pipeline
    for (n, m, k), lower in [((200, 130, 170), True), ((90, 260, 140), False)]:
        xa = np.tril(rng.standard_normal((n, m)))
        xb = np.tril(rng.standard_normal((m, k)))
        if not lower:
            xa, xb = np.triu(rng.standard_normal((n, m))), \
                np.triu(rng.standard_normal((m, k)))
        a = trap_mod.trap_from_dense(jnp.asarray(xa, jnp.float32),
                                     lower=lower)
        b = trap_mod.trap_from_dense(jnp.asarray(xb, jnp.float32),
                                     lower=lower)
        dense_ref = trap_mod.trap_todense(trap_mod.trap_smm(a, b))
        if lower:
            blocked = trap_mod._trap_smm_blocked(
                a.data, b.data, n, m, k, jnp.float32, B=64
            )
        else:
            blocked = trap_mod._trap_smm_blocked(
                b.data, a.data, k, m, n, jnp.float32, B=64
            )
        c_blocked = trap_mod.Trapezoidal(data=blocked, n=n, m=k,
                                         lower=lower)
        np.testing.assert_allclose(
            np.asarray(trap_mod.trap_todense(c_blocked)),
            np.asarray(dense_ref),
            rtol=2e-4, atol=2e-4,
        )
        np.testing.assert_allclose(
            np.asarray(dense_ref), xa @ xb, rtol=2e-4, atol=2e-4
        )


def test_trap_smm_large_dispatches_blocked(monkeypatch):
    # shrink the dispatch threshold so the public entry point exercises the
    # blocked path end-to-end, including under jit
    from sparse_tpu.formats import trapezoidal as trap_mod

    monkeypatch.setattr(trap_mod, "_TRAP_DENSE_MAX", 100)
    monkeypatch.setattr(trap_mod, "_TRAP_BLOCK", 64)
    rng = np.random.default_rng(12)
    n, m, k = 180, 120, 150
    xa = np.tril(rng.standard_normal((n, m)))
    xb = np.tril(rng.standard_normal((m, k)))
    a = trap_mod.trap_from_dense(jnp.asarray(xa, jnp.float32), lower=True)
    b = trap_mod.trap_from_dense(jnp.asarray(xb, jnp.float32), lower=True)
    c = trap_mod.trap_smm(a, b)
    np.testing.assert_allclose(
        np.asarray(trap_mod.trap_todense(c)), xa @ xb, rtol=2e-4, atol=2e-4
    )
    c_jit = jax.jit(trap_mod.trap_smm)(a, b)
    np.testing.assert_allclose(
        np.asarray(trap_mod.trap_todense(c_jit)), xa @ xb,
        rtol=2e-4, atol=2e-4,
    )
