"""BSR LU solver stack: conformance against the reference's property tests
(blocked_square_regular_test.fut:193-349): P.A = L.U reconstruction, golden
solves, fill-in discovery, forward/backward block solves, and ols residuals."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sparse_tpu import (
    bsr_add,
    bsr_backsolve,
    bsr_diag,
    bsr_forsolve,
    bsr_from_dense,
    bsr_lower,
    bsr_lu,
    bsr_lu_find_fills,
    bsr_lu_nofill,
    bsr_lup,
    bsr_lup_nofill,
    bsr_make,
    bsr_ols,
    bsr_smsmm,
    bsr_smvm,
    bsr_todense,
    bsr_transpose,
    bsr_upper,
)

BSZ = 2
EPS = 6e-5  # the reference's tolerance (blocked_square_regular_test.fut:250)


def dense(a):
    return np.asarray(bsr_todense(a))


def mk_blkdiag(nblk, bsz=BSZ):
    # reference generator (blocked_square_regular_test.fut:234-237)
    blocks = []
    for i in range(nblk):
        a = np.arange(bsz * bsz, dtype=np.float64)
        blocks.append(
            (i, i, (np.sqrt(i + 1) + 28.0 * np.sin(a + i)).reshape(bsz, bsz))
        )
    return bsr_make(nblk * bsz, bsz, blocks)


def with_offdiag(n):
    m = bsr_add(mk_blkdiag(n), bsr_transpose(mk_blkdiag(n)))
    if n >= 5:
        m = bsr_add(
            m, bsr_make(n * BSZ, BSZ, [(3, 4, [[3.0, 2.0], [7.0, -1.0]])])
        )
    return m


def split_lower_upper(lu_dense_mat):
    n = lu_dense_mat.shape[0]
    L = np.tril(lu_dense_mat, -1) + np.eye(n)
    U = np.triu(lu_dense_mat)
    return L, U


def test_simple_lup_nofill():
    # blocked_square_regular_test.fut:40-53
    a = bsr_make(
        4, BSZ, [(0, 0, [[1.0, 2], [3, 4]]), (1, 1, [[1.0, 2], [3, 4]])]
    )
    lu, p = bsr_lup_nofill(a)
    L, U = split_lower_upper(dense(lu))
    np.testing.assert_allclose(dense(a)[np.asarray(p)], L @ U, rtol=1e-12)


def test_solve_full_golden():
    # blocked_square_regular_test.fut:193-209: x = [3, 4, -6, -1]
    a = bsr_make(
        4,
        BSZ,
        [
            (0, 0, [[3.0, -7], [-3.0, 5]]),
            (0, 1, [[-2.0, 2], [1.0, 0]]),
            (1, 0, [[6.0, -4], [-9.0, 5]]),
            (1, 1, [[0.0, -5], [-5.0, 12]]),
        ],
    )
    b = jnp.asarray([-9.0, 5, 7, 11])
    x = bsr_ols(a, b)
    np.testing.assert_allclose(np.asarray(x), [3.0, 4, -6, -1], rtol=1e-10)


@pytest.mark.parametrize("n", [
    3, 4, 5,
    pytest.param(8, marks=pytest.mark.slow),  # breadth (budget r5)
])
def test_solve_sparse_reconstruction(n):
    # blocked_square_regular_test.fut:239-257
    m = mk_blkdiag(n)
    if n >= 5:
        m = bsr_add(m, bsr_make(n * BSZ, BSZ, [(3, 4, [[3.0, 2], [7.0, -1]])]))
    md = dense(m)
    lu, p = bsr_lup(m)
    LU = bsr_smsmm(bsr_lower(lu), bsr_upper(lu))
    assert np.max(np.abs(md[np.asarray(p)] - dense(LU))) < EPS


@pytest.mark.parametrize("n", [
    3, 4, 5,
    pytest.param(8, marks=pytest.mark.slow),  # breadth (budget r5)
])
def test_solve_sparse2_reconstruction(n):
    # blocked_square_regular_test.fut:259-279 (pattern with fills)
    m = with_offdiag(n)
    md = dense(m)
    lu, p = bsr_lup(m)
    LU = bsr_smsmm(bsr_lower(lu), bsr_upper(lu))
    assert np.max(np.abs(md[np.asarray(p)] - dense(LU))) < EPS


@pytest.mark.parametrize("n", [
    3, 4, 5,
    pytest.param(8, marks=pytest.mark.slow),  # breadth (budget r5)
])
def test_ols_residual(n):
    # blocked_square_regular_test.fut:281-298
    m = with_offdiag(n)
    b = jnp.asarray(np.arange(n * BSZ) + 2.0)
    x = bsr_ols(m, b)
    np.testing.assert_allclose(
        np.asarray(bsr_smvm(m, x)), np.asarray(b), atol=EPS
    )


@pytest.mark.parametrize("n", [
    3, 4, 5,
    pytest.param(8, marks=pytest.mark.slow),  # breadth (budget r5)
])
def test_lu_nopivot_reconstruction(n):
    # blocked_square_regular_test.fut:300-317
    m = bsr_add(mk_blkdiag(n), bsr_transpose(mk_blkdiag(n)))
    md = dense(m)
    lu = bsr_lu(m)
    LU = bsr_smsmm(bsr_lower(lu), bsr_upper(lu))
    assert np.max(np.abs(md - dense(LU))) < EPS


def test_forsolve_golden():
    # blocked_square_regular_test.fut:319-329: y = [8, -9, 26, -26]
    m = bsr_make(
        4,
        BSZ,
        [
            (0, 0, [[1.0, 0], [2.0, 1]]),
            (1, 0, [[3.0, 4], [-1.0, -3]]),
            (1, 1, [[1.0, 0], [0.0, 1]]),
        ],
    )
    y = bsr_forsolve(m, jnp.asarray([8.0, 7, 14, -7]))
    np.testing.assert_allclose(np.asarray(y), [8.0, -9, 26, -26], rtol=1e-12)


def test_backsolve_golden():
    # blocked_square_regular_test.fut:331-341: x = [3, -1, 0, 2]
    m = bsr_make(
        4,
        BSZ,
        [
            (0, 0, [[1.0, 1], [0.0, -1]]),
            (0, 1, [[0.0, 3], [-1.0, -5]]),
            (1, 1, [[3.0, 13], [0.0, -13]]),
        ],
    )
    x = bsr_backsolve(m, jnp.asarray([8.0, -9, 26, -26]))
    np.testing.assert_allclose(np.asarray(x), [3.0, -1, 0, 2], rtol=1e-12)


def test_lu_find_fills_golden():
    # g14 fixture (blocked_square_regular_test.fut:227-232, 343-349):
    # fills = rows [4,4,4,5], cols [2,5,6,3]
    blk = np.arange(1.0, 5.0).reshape(2, 2)
    d = bsr_diag(jnp.asarray(np.arange(14.0)), BSZ)
    u = bsr_make(14, BSZ, [(0, 2, blk), (0, 5, blk), (1, 3, blk), (0, 6, blk)])
    l = bsr_make(14, BSZ, [(3, 1, blk), (4, 0, blk), (5, 1, blk)])
    a = bsr_add(d, bsr_add(u, l))
    fills = bsr_lu_find_fills(a)
    np.testing.assert_array_equal(fills[:, 0], [4, 4, 4, 5])
    np.testing.assert_array_equal(fills[:, 1], [2, 5, 6, 3])


def test_missing_diagonal_block_raises():
    # mirrors ERROR_diagonal_block_must_be_nonempty (blocked:429)
    a = bsr_make(4, BSZ, [(1, 0, [[1.0, 0], [0, 1]]), (1, 1, np.eye(2))])
    with pytest.raises(ValueError):
        bsr_lu_nofill(a)


def test_random_dense_oracle():
    rng = np.random.default_rng(42)
    n, bsz = 12, 3
    nb = n // bsz
    mask = np.kron(
        (rng.random((nb, nb)) < 0.4) | np.eye(nb, dtype=bool), np.ones((bsz, bsz))
    )
    xa = rng.standard_normal((n, n)) * mask + 4 * np.eye(n)
    a = bsr_from_dense(jnp.asarray(xa), bsz)
    x_true = rng.standard_normal(n)
    b = xa @ x_true
    x = bsr_ols(a, jnp.asarray(b))
    np.testing.assert_allclose(np.asarray(x), x_true, rtol=1e-8, atol=1e-8)


def test_multi_rhs_solve():
    rng = np.random.default_rng(77)
    n, bsz, k = 12, 3, 5
    nb = n // bsz
    mask = np.kron(
        (rng.random((nb, nb)) < 0.5) | np.eye(nb, dtype=bool), np.ones((bsz, bsz))
    )
    xa = rng.standard_normal((n, n)) * mask + 4 * np.eye(n)
    a = bsr_from_dense(jnp.asarray(xa), bsz)
    X_true = rng.standard_normal((n, k))
    B = xa @ X_true
    X = bsr_ols(a, jnp.asarray(B))
    np.testing.assert_allclose(np.asarray(X), X_true, rtol=1e-8, atol=1e-8)


def test_forsolve_jit_with_plan():
    # the plan-carrying path traces under jit (zero per-step host syncs)
    m = bsr_make(
        4,
        BSZ,
        [
            (0, 0, [[1.0, 0], [2.0, 1]]),
            (1, 0, [[3.0, 4], [-1.0, -3]]),
            (1, 1, [[1.0, 0], [0.0, 1]]),
        ],
    )
    from sparse_tpu.solve.bsr_lu import bsr_tri_plan

    plan = bsr_tri_plan(m, lower=True)
    f = jax.jit(bsr_forsolve)
    y = f(m, jnp.asarray([8.0, 7, 14, -7]), plan)
    np.testing.assert_allclose(np.asarray(y), [8.0, -9, 26, -26], rtol=1e-12)


def test_backsolve_jit_with_plan():
    m = bsr_make(
        4,
        BSZ,
        [
            (0, 0, [[1.0, 1], [0.0, -1]]),
            (0, 1, [[0.0, 3], [-1.0, -5]]),
            (1, 1, [[3.0, 13], [0.0, -13]]),
        ],
    )
    from sparse_tpu.solve.bsr_lu import bsr_tri_plan

    plan = bsr_tri_plan(m, lower=False)
    x = jax.jit(bsr_backsolve)(m, jnp.asarray([8.0, -9, 26, -26]), plan)
    np.testing.assert_allclose(np.asarray(x), [3.0, -1, 0, 2], rtol=1e-12)


def test_backsolve_missing_diagonal_raises():
    m = bsr_make(4, BSZ, [(0, 1, [[1.0, 2], [3.0, 4]])])
    with pytest.raises(ValueError, match="diagonal"):
        bsr_backsolve(m, jnp.arange(4.0))


def test_factorize_solve_many():
    # factor once, solve twice (incl. multi-RHS); jit-compatible carrier
    from sparse_tpu.solve.bsr_lu import bsr_factorize

    m = with_offdiag(5)
    fact = bsr_factorize(m)
    b1 = jnp.asarray(np.arange(5 * BSZ) + 2.0)
    b2 = jnp.asarray(np.arange(5 * BSZ)[::-1] * 1.5 + 1.0)
    solve = jax.jit(lambda f, b: f.solve(b))
    for b in (b1, b2):
        x = solve(fact, b)
        np.testing.assert_allclose(
            np.asarray(bsr_smvm(m, x)), np.asarray(b), atol=EPS
        )
    # multi-RHS
    B = jnp.stack([b1, b2], axis=1)
    X = fact.solve(B)
    np.testing.assert_allclose(
        np.asarray(bsr_smvm(m, X[:, 0])), np.asarray(b1), atol=EPS
    )
    np.testing.assert_allclose(
        np.asarray(bsr_smvm(m, X[:, 1])), np.asarray(b2), atol=EPS
    )
