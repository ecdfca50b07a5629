"""Determinism guarantees (SURVEY.md §5.2): the reference's only
nondeterminism risk is scatter/reduce combining order; our reductions are
deterministic by construction — repeated runs must agree bit-for-bit."""

import jax
import jax.numpy as jnp
import numpy as np

from sparse_tpu import (
    bsr_from_dense,
    bsr_smvm,
    coo_make,
    csr_from_coo,
    csr_smvm,
    csr_todense,
    spgemm,
)


def test_smvm_bitwise_repeatable():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((64, 64)) * (rng.random((64, 64)) < 0.3)
    from sparse_tpu import csr_from_dense

    a = csr_from_dense(jnp.asarray(x))
    v = jnp.asarray(rng.standard_normal(64))
    outs = [np.asarray(csr_smvm(a, v)) for _ in range(3)]
    assert all(np.array_equal(outs[0], o) for o in outs[1:])
    f = jax.jit(csr_smvm)
    outs_j = [np.asarray(f(a, v)) for _ in range(3)]
    assert all(np.array_equal(outs_j[0], o) for o in outs_j[1:])


def test_duplicate_summation_order_independent():
    # many duplicates of the same coordinate, shuffled differently: the
    # normalized result must be identical (deterministic combine)
    rng = np.random.default_rng(1)
    vals = rng.standard_normal(100)
    rows = np.zeros(100, np.int64)
    cols = np.zeros(100, np.int64)
    base = None
    for trial in range(3):
        perm = rng.permutation(100)
        a = csr_from_coo(
            coo_make((2, 2), rows[perm], cols[perm], jnp.asarray(vals[perm]))
        )
        d = np.asarray(csr_todense(a))
        if base is None:
            base = d
        else:
            # summation order differs across shuffles, so exact equality is
            # not promised — but each shuffle must itself be repeatable and
            # numerically tight
            np.testing.assert_allclose(d, base, rtol=1e-12)
        d2 = np.asarray(
            csr_todense(
                csr_from_coo(
                    coo_make((2, 2), rows[perm], cols[perm], jnp.asarray(vals[perm]))
                )
            )
        )
        assert np.array_equal(d, d2)


def test_spgemm_and_bsr_repeatable():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((32, 32)) * (rng.random((32, 32)) < 0.2)
    from sparse_tpu import csr_from_dense

    a = csr_from_dense(jnp.asarray(x))
    c1 = np.asarray(csr_todense(spgemm(a, a)))
    c2 = np.asarray(csr_todense(spgemm(a, a)))
    assert np.array_equal(c1, c2)
    b = bsr_from_dense(jnp.asarray(x), 4)
    v = jnp.asarray(rng.standard_normal(32))
    assert np.array_equal(
        np.asarray(bsr_smvm(b, v)), np.asarray(bsr_smvm(b, v))
    )
