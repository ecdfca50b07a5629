"""Blocked-ELL BSR fast paths vs the bsr_smvm/dense oracles."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sparse_tpu import bsr_from_dense, bsr_smvm
from sparse_tpu.ops.bsr_ell import bsr_row_capacity, bsr_smvm_ell, bsr_spmm_ell


def random_bsr(n, bsz, density, seed):
    rng = np.random.default_rng(seed)
    nb = n // bsz
    mask = np.kron(rng.random((nb, nb)) < density, np.ones((bsz, bsz)))
    x = rng.standard_normal((n, n)) * mask
    return bsr_from_dense(jnp.asarray(x), bsz), x


@pytest.mark.parametrize("n,bsz,density", [
    (16, 2, 0.5),
    (32, 8, 0.3),
    pytest.param(64, 4, 0.1, marks=pytest.mark.slow),  # breadth (budget)
])
def test_smvm_ell_matches(n, bsz, density):
    a, xa = random_bsr(n, bsz, density, seed=n + bsz)
    v = jnp.asarray(np.random.default_rng(0).standard_normal(n))
    Lb = bsr_row_capacity(a)
    got = bsr_smvm_ell(a, v, Lb)
    np.testing.assert_allclose(np.asarray(got), xa @ np.asarray(v), rtol=1e-10,
                               atol=1e-12)
    # consistency with the segment-sum baseline and capacity overshoot
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(bsr_smvm(a, v)), rtol=1e-12
    )
    got2 = bsr_smvm_ell(a, v, Lb + 3)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(got), rtol=1e-12)


@pytest.mark.parametrize("k", [1, 8, 64])
def test_spmm_ell_matches(k):
    a, xa = random_bsr(32, 4, 0.4, seed=k)
    b = jnp.asarray(np.random.default_rng(k).standard_normal((32, k)))
    got = bsr_spmm_ell(a, b, bsr_row_capacity(a))
    np.testing.assert_allclose(np.asarray(got), xa @ np.asarray(b), rtol=1e-10,
                               atol=1e-12)


def test_under_jit():
    a, xa = random_bsr(24, 4, 0.5, seed=9)
    v = jnp.asarray(np.random.default_rng(9).standard_normal(24))
    Lb = bsr_row_capacity(a)
    f = jax.jit(lambda a, v: bsr_smvm_ell(a, v, Lb))
    np.testing.assert_allclose(np.asarray(f(a, v)), xa @ np.asarray(v), rtol=1e-10)


def test_empty():
    a, _ = random_bsr(8, 2, 0.0, seed=1)
    v = jnp.ones(8)
    assert bsr_row_capacity(a) == 0
    assert np.all(np.asarray(bsr_smvm_ell(a, v, 0)) == 0)
