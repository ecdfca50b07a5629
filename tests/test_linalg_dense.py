"""Dense within-block LU / triangular-solve layer, validated with the
reference test-suite's property style (P.A = L.U reconstruction, residuals;
blocked_square_regular_test.fut:239-258)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sparse_tpu.linalg import (
    backsolve_dense,
    forsolve_dense,
    lu_dense,
    lup_dense,
    perm_compose,
    perm_id,
    perm_inverse,
    perm_to_matrix,
    permute,
    rowsolve_upper,
)


def split_lu(lu):
    lu = np.asarray(lu)
    L = np.tril(lu, -1) + np.eye(lu.shape[0])
    U = np.triu(lu)
    return L, U


@pytest.mark.parametrize("n", [1, 2, 3, 4, 8, 17])
def test_lup_reconstruction(n):
    rng = np.random.default_rng(n)
    a = rng.standard_normal((n, n))
    lu, p = lup_dense(jnp.asarray(a))
    L, U = split_lu(lu)
    np.testing.assert_allclose(a[np.asarray(p)], L @ U, rtol=1e-10, atol=1e-10)
    # multipliers bounded by 1 under partial pivoting
    assert np.max(np.abs(np.tril(np.asarray(lu), -1))) <= 1.0 + 1e-12


def test_lup_needs_pivoting():
    # zero leading pivot: without pivoting this would blow up
    a = np.array([[0.0, 1.0], [2.0, 3.0]])
    lu, p = lup_dense(jnp.asarray(a))
    L, U = split_lu(lu)
    np.testing.assert_allclose(a[np.asarray(p)], L @ U, rtol=1e-12)
    assert list(np.asarray(p)) == [1, 0]


@pytest.mark.parametrize("n", [1, 3, 8])
def test_lu_nopivot(n):
    rng = np.random.default_rng(n + 100)
    # diagonally dominant so no pivoting needed
    a = rng.standard_normal((n, n)) + n * np.eye(n)
    lu = lu_dense(jnp.asarray(a))
    L, U = split_lu(lu)
    np.testing.assert_allclose(a, L @ U, rtol=1e-10, atol=1e-10)


def test_solves_match_numpy():
    rng = np.random.default_rng(5)
    n = 9
    a = rng.standard_normal((n, n)) + n * np.eye(n)
    L = np.tril(a, -1) + np.eye(n)
    U = np.triu(a)
    b = rng.standard_normal(n)
    np.testing.assert_allclose(
        np.asarray(forsolve_dense(jnp.asarray(a), jnp.asarray(b))),
        np.linalg.solve(L, b),
        rtol=1e-10,
    )
    np.testing.assert_allclose(
        np.asarray(backsolve_dense(jnp.asarray(a), jnp.asarray(b))),
        np.linalg.solve(U, b),
        rtol=1e-10,
    )
    # row solve x U = y
    x = np.asarray(rowsolve_upper(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(x @ U, b, rtol=1e-9)
    # matrix right-hand sides
    B = rng.standard_normal((n, 4))
    np.testing.assert_allclose(
        np.asarray(forsolve_dense(jnp.asarray(a), jnp.asarray(B))),
        np.linalg.solve(L, B),
        rtol=1e-10,
    )
    X = np.asarray(rowsolve_upper(jnp.asarray(a), jnp.asarray(B.T)))
    np.testing.assert_allclose(X @ U, B.T, rtol=1e-9)


def test_full_solve_pipeline():
    # the dense 4x4 fixture solved by the reference's ols path
    # (blocked_square_regular_test.fut:193-225 solves to [3, 4, -6, -1])
    a = np.array(
        [
            [2.0, 1.0, 1.0, 0.0],
            [4.0, 3.0, 3.0, 1.0],
            [8.0, 7.0, 9.0, 5.0],
            [6.0, 7.0, 9.0, 8.0],
        ]
    )
    x_true = np.array([3.0, 4.0, -6.0, -1.0])
    b = a @ x_true
    lu, p = lup_dense(jnp.asarray(a))
    y = forsolve_dense(lu, permute(p, jnp.asarray(b)))
    x = backsolve_dense(lu, y)
    np.testing.assert_allclose(np.asarray(x), x_true, rtol=1e-10)


def test_perm_utilities():
    p = jnp.asarray([2, 0, 1], jnp.int32)
    x = jnp.asarray([10.0, 20.0, 30.0])
    np.testing.assert_array_equal(np.asarray(permute(p, x)), [30.0, 10.0, 20.0])
    np.testing.assert_array_equal(
        np.asarray(permute(perm_inverse(p), permute(p, x))), np.asarray(x)
    )
    np.testing.assert_array_equal(np.asarray(perm_to_matrix(p) @ x), [30.0, 10.0, 20.0])
    q = perm_compose(perm_id(2), p)
    np.testing.assert_array_equal(np.asarray(q), [0, 1, 4, 2, 3])


def test_vmap_jit_batched_lup():
    rng = np.random.default_rng(11)
    blocks = rng.standard_normal((6, 4, 4))
    lus, ps = jax.jit(jax.vmap(lup_dense))(jnp.asarray(blocks))
    for i in range(6):
        L, U = split_lu(lus[i])
        np.testing.assert_allclose(
            blocks[i][np.asarray(ps[i])], L @ U, rtol=1e-10, atol=1e-10
        )


def test_singular_column_no_nan_poisoning():
    # a singular block: entirely zero column; factorization must not produce
    # NaNs in unrelated entries
    a = np.array([[0.0, 1.0], [0.0, 2.0]])
    lu, p = lup_dense(jnp.asarray(a))
    L, U = split_lu(lu)
    np.testing.assert_allclose(a[np.asarray(p)], L @ U, rtol=1e-12)
