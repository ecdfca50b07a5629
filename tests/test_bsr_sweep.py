"""BSR functor-parameterised sweep, mirroring the reference's
blocked_square_regular_mktest.fut: re-run the whole op battery for bsz in
{2, 3, 4} and block counts 0..8, aggregated per configuration."""

import jax.numpy as jnp
import numpy as np
import pytest

from sparse_tpu import (
    bsr_add,
    bsr_diag,
    bsr_eye,
    bsr_from_dense,
    bsr_lower,
    bsr_lup,
    bsr_make,
    bsr_mul,
    bsr_ols,
    bsr_smsmm,
    bsr_smvm,
    bsr_sub,
    bsr_todense,
    bsr_transpose,
    bsr_upper,
)

EPS = 6e-5  # reference tolerance (mktest eq_eps usage)


def dense(a):
    return np.asarray(bsr_todense(a))


def ref_diag_blk(nb, bsz):
    """The mktest generator (blocked_square_regular_mktest.fut:70-75)."""
    blocks = []
    for i in range(nb):
        blk = np.array(
            [
                [c + 1 + 2 * i + r * (c * (r % 2)) - r for c in range(bsz)]
                for r in range(bsz)
            ],
            np.float64,
        )
        blocks.append((i, i, blk))
    return bsr_make(nb * bsz, bsz, blocks)


@pytest.mark.parametrize("bsz", [2, 3, 4])
@pytest.mark.parametrize("nb", [0, 1, 2, 5, 8])
def test_structure_sweep(bsz, nb):
    n = nb * bsz
    np.testing.assert_array_equal(dense(bsr_eye(n, bsz, jnp.float64)), np.eye(n))
    v = np.arange(1.0, n + 1)
    d = bsr_diag(jnp.asarray(v), bsz)
    np.testing.assert_array_equal(dense(d), np.diag(v))
    np.testing.assert_array_equal(dense(bsr_transpose(d)), np.diag(v))


@pytest.mark.parametrize("bsz", [2, 3, 4])
@pytest.mark.parametrize("nb", [1, 2, 5, 8])
def test_ops_sweep(bsz, nb):
    n = nb * bsz
    d = ref_diag_blk(nb, bsz)
    blk = np.arange(1.0, bsz * bsz + 1).reshape(bsz, bsz)
    c = bsr_make(n, bsz, [(nb - 1, 0, blk)])
    dd, dc = dense(d), dense(c)
    np.testing.assert_allclose(dense(bsr_add(c, d)), dc + dd, rtol=1e-12)
    np.testing.assert_allclose(dense(bsr_sub(c, d)), dc - dd, rtol=1e-12)
    # block-level Hadamard (patterns disjoint unless nb == 1)
    got = dense(bsr_mul(c, d))
    expect = dc * dd if nb == 1 else np.zeros((n, n))
    np.testing.assert_allclose(got, expect, rtol=1e-12)
    np.testing.assert_allclose(dense(bsr_smsmm(c, d)), dc @ dd, rtol=1e-12)
    v = np.arange(n) + 2.0
    np.testing.assert_allclose(
        np.asarray(bsr_smvm(c, jnp.asarray(v))), dc @ v, rtol=1e-12
    )


def mk_blkdiag(nb, bsz):
    blocks = []
    for i in range(nb):
        a = np.arange(bsz * bsz, dtype=np.float64)
        blocks.append(
            (i, i, (np.sqrt(i + 1) + 28.0 * np.sin(a + i)).reshape(bsz, bsz))
        )
    return bsr_make(nb * bsz, bsz, blocks)


@pytest.mark.parametrize("bsz", [2, 3, 4])
@pytest.mark.parametrize("nb", [
    3,
    pytest.param(5, marks=pytest.mark.slow),  # breadth (suite budget r5)
    pytest.param(8, marks=pytest.mark.slow),
])
def test_solver_sweep(bsz, nb):
    n = nb * bsz
    m = bsr_add(mk_blkdiag(nb, bsz), bsr_transpose(mk_blkdiag(nb, bsz)))
    if nb >= 5:
        blk = np.arange(1.0, bsz * bsz + 1).reshape(bsz, bsz)
        m = bsr_add(m, bsr_make(n, bsz, [(3, 4, blk)]))
    md = dense(m)
    lu, p = bsr_lup(m)
    LU = bsr_smsmm(bsr_lower(lu), bsr_upper(lu))
    assert np.max(np.abs(md[np.asarray(p)] - dense(LU))) < EPS
    b = jnp.asarray(np.arange(n) + 2.0)
    x = bsr_ols(m, b)
    np.testing.assert_allclose(np.asarray(bsr_smvm(m, x)), np.asarray(b), atol=EPS)
