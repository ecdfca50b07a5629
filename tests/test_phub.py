"""Distributed hub/tail SpMV (parallel/phub.py) on the 8-device CPU mesh:
oracle exactness and the O(H) hub-operand comm bound."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp

from sparse_tpu import CSR
from sparse_tpu.parallel import make_1d_mesh, pcsr_from_csr
from sparse_tpu.parallel.pcsr import shard_vector
from sparse_tpu.parallel.phub import phub_partition, phub_spmv


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "expected 8 virtual CPU devices"
    return make_1d_mesh(8)


def _powerlaw(n, seed, per_row=5):
    rng = np.random.default_rng(seed)
    rows = np.repeat(np.arange(n, dtype=np.int64), per_row)
    cols = (np.minimum(rng.zipf(1.3, rows.size), n) - 1).astype(np.int64)
    # scramble column ids so hub ownership spreads across shards
    sc = rng.permutation(n)
    cols = sc[cols]
    s = sp.coo_matrix(
        (rng.standard_normal(rows.size).astype(np.float32), (rows, cols)),
        shape=(n, n)).tocsr()
    s.sum_duplicates()
    return s


def test_phub_matches_oracle_and_comm_bound(mesh):
    n = 2048
    s = _powerlaw(n, seed=0)
    a = CSR(data=jnp.asarray(s.data), indices=jnp.asarray(s.indices),
            indptr=jnp.asarray(s.indptr.astype(np.int64)), shape=(n, n))
    H = 128
    ph = phub_partition(a, mesh, max_hub_cols=H)
    # O(H) hub assembly: with scrambled hub ids the per-shard padding is
    # bounded — payload stays well below the O(m) all-gather
    assert ph.hub_comm_entries_per_device <= 3 * H
    assert ph.hub_comm_entries_per_device < n // 2
    pa = pcsr_from_csr(a, mesh)
    rng = np.random.default_rng(1)
    v = rng.standard_normal(n).astype(np.float32)
    vsh = shard_vector(jnp.asarray(v), pa, mesh)
    y = np.asarray(phub_spmv(ph, vsh, mesh))[:n]
    np.testing.assert_allclose(y, s @ v, rtol=2e-4, atol=2e-4)


def test_phub_hub_mass_routed(mesh):
    """The hub strip actually carries mass: zeroing the tail reproduces
    the hub-only product (split correctness, not just the sum)."""
    n = 1024
    s = _powerlaw(n, seed=3)
    a = CSR(data=jnp.asarray(s.data), indices=jnp.asarray(s.indices),
            indptr=jnp.asarray(s.indptr.astype(np.int64)), shape=(n, n))
    ph = phub_partition(a, mesh, max_hub_cols=64)
    hub_nnz = int((np.asarray(ph.hub_rows) <
                   ph.rows_per_shard).sum())
    tail_nnz = int((np.asarray(ph.tail_rows) < ph.rows_per_shard).sum())
    assert hub_nnz + tail_nnz == s.nnz
    assert hub_nnz > 0.05 * s.nnz  # heavy tail -> hubs carry real mass
