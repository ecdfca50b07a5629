"""Invariant validators: every constructor output validates; corrupted
structures are rejected with precise messages."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from sparse_tpu import (
    bsr_from_dense,
    coo_from_triples,
    csr_add,
    csr_eye,
    csr_from_dense,
    csr_transpose,
    msr_from_triples,
)
from sparse_tpu.utils.validate import (
    SparseInvariantError,
    validate_bsr,
    validate_coo,
    validate_csc,
    validate_csr,
    validate_msr,
)


def rand_dense(n, m, d, seed):
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n, m)) * (rng.random((n, m)) < d)


def test_constructors_validate():
    x = rand_dense(8, 6, 0.4, 0)
    a = csr_from_dense(jnp.asarray(x))
    validate_csr(a)
    validate_csc(csr_transpose(a))
    validate_coo(coo_from_triples(3, 3, [(0, 0, 1.0), (2, 1, 2.0)]))
    validate_csr(csr_add(a, csr_eye(8, 6, a.dtype)))
    validate_bsr(bsr_from_dense(jnp.asarray(rand_dense(8, 8, 0.3, 1)), 2))
    validate_msr(msr_from_triples(4, 5, [(0, 2, 1.0), (3, 1, 2.0)]))


def test_corrupt_csr_rejected():
    a = csr_from_dense(jnp.asarray(rand_dense(5, 5, 0.5, 2)))
    bad = dataclasses.replace(a, indptr=a.indptr.at[2].set(a.indptr[3] + 1))
    with pytest.raises(SparseInvariantError):
        validate_csr(bad)
    bad2 = dataclasses.replace(a, indices=a.indices.at[0].set(99))
    with pytest.raises(SparseInvariantError):
        validate_csr(bad2)


def test_corrupt_coo_rejected():
    a = coo_from_triples(3, 3, [(0, 0, 1.0)])
    bad = dataclasses.replace(a, col=a.col.at[0].set(7))
    with pytest.raises(SparseInvariantError):
        validate_coo(bad)


def test_corrupt_bsr_rejected():
    a = bsr_from_dense(jnp.asarray(rand_dense(8, 8, 0.5, 3)), 2)
    bad = dataclasses.replace(
        a, indices=jnp.sort(a.indices)[::-1]
    )
    with pytest.raises(SparseInvariantError):
        validate_bsr(bad)


def test_corrupt_msr_rejected():
    a = msr_from_triples(3, 4, [(0, 1, 1.0)])
    bad = dataclasses.replace(a, col_idx=a.col_idx.at[0].set(9))
    with pytest.raises(SparseInvariantError):
        validate_msr(bad)


def test_validate_bell_and_corruption():
    from sparse_tpu.formats.bell import bell_from_bsr
    from sparse_tpu.utils.validate import validate_bell

    a = bell_from_bsr(bsr_from_dense(jnp.asarray(rand_dense(8, 8, 0.5, 5)), 2))
    validate_bell(a)  # healthy layout passes
    bad = dataclasses.replace(a, cols=a.cols.at[0, 0].set(99))
    with pytest.raises(SparseInvariantError):
        validate_bell(bad)
    # a padding slot (zero block) must not carry a nonzero column id
    zero_slot = np.argwhere(~np.any(np.asarray(a.blocks) != 0, axis=(2, 3)))
    if zero_slot.size:
        r, l = zero_slot[0]
        bad2 = dataclasses.replace(
            a, cols=a.cols.at[int(r), int(l)].set(1)
        )
        with pytest.raises(SparseInvariantError):
            validate_bell(bad2)
