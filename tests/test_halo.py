"""Halo-exchange distributed SpMV vs the all-gather baseline and dense
oracle, on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sparse_tpu import csr_from_dense
from sparse_tpu.parallel import make_1d_mesh, pcsr_from_csr, pcsr_spmv
from sparse_tpu.parallel.halo import halo_partition, halo_spmv
from sparse_tpu.parallel.pcsr import shard_vector


@pytest.fixture(scope="module")
def mesh():
    return make_1d_mesh(8)


def banded(n, bw, seed):
    rng = np.random.default_rng(seed)
    x = np.zeros((n, n))
    for off in range(-bw, bw + 1):
        x += np.diag(rng.standard_normal(n - abs(off)), off)
    return x


@pytest.mark.parametrize("n,bw", [
    pytest.param(64, 3, marks=pytest.mark.slow),  # breadth (budget r5)
    pytest.param(100, 5, marks=pytest.mark.slow),  # breadth
    (17, 2),
])
def test_halo_matches_oracle(mesh, n, bw):
    x = banded(n, bw, seed=n)
    a = csr_from_dense(jnp.asarray(x))
    ha = halo_partition(a, mesh)
    # banded matrices have small halos: far less than a full slab broadcast
    assert ha.halo <= ha.cols_per_shard + 2 * bw
    v = jnp.asarray(np.random.default_rng(1).standard_normal(n))
    pa = pcsr_from_csr(a, mesh)
    vs = shard_vector(v, pa, mesh)
    got = halo_spmv(ha, vs, mesh)[:n]
    np.testing.assert_allclose(np.asarray(got), x @ np.asarray(v), rtol=1e-10,
                               atol=1e-12)
    # agrees with the all-gather baseline bit-for-bit semantics
    base = pcsr_spmv(pa, vs, mesh)[:n]
    np.testing.assert_allclose(np.asarray(got), np.asarray(base), rtol=1e-12)


def test_halo_dense_random(mesh):
    rng = np.random.default_rng(3)
    n, m = 48, 72
    x = rng.standard_normal((n, m)) * (rng.random((n, m)) < 0.3)
    a = csr_from_dense(jnp.asarray(x))
    ha = halo_partition(a, mesh)
    v = jnp.asarray(rng.standard_normal(m))
    vs = shard_vector(v, pcsr_from_csr(a, mesh), mesh)
    got = halo_spmv(ha, vs, mesh)[:n]
    np.testing.assert_allclose(np.asarray(got), x @ np.asarray(v), rtol=1e-10,
                               atol=1e-12)


def test_halo_under_jit(mesh):
    x = banded(40, 2, seed=7)
    a = csr_from_dense(jnp.asarray(x))
    ha = halo_partition(a, mesh)
    v = jnp.asarray(np.ones(40))
    vs = shard_vector(v, pcsr_from_csr(a, mesh), mesh)
    f = jax.jit(lambda ha, vs: halo_spmv(ha, vs, mesh))
    np.testing.assert_allclose(np.asarray(f(ha, vs))[:40], x @ np.ones(40),
                               rtol=1e-10)


@pytest.mark.slow  # breadth: overlapped==plain also asserted by
# test_halo_overlapped_random_and_jit and the driver dryrun
def test_halo_overlapped_matches_oracle(mesh):
    from sparse_tpu.parallel.halo import (
        halo_partition_overlapped,
        halo_spmv_overlapped,
    )

    # two shapes (one even, one odd/ragged): each distinct n compiles the
    # whole overlapped shard_map pipeline (~8 s on this host)
    for n, bw, seed in [(100, 5, 1), (17, 2, 2)]:
        x = banded(n, bw, seed=seed)
        a = csr_from_dense(jnp.asarray(x))
        ha = halo_partition_overlapped(a, mesh)
        # only frontier columns travel: for a banded matrix the payload is
        # O(bw), far below a slab broadcast
        assert ha.halo <= 2 * bw + 1
        v = jnp.asarray(np.random.default_rng(seed).standard_normal(n))
        pa = pcsr_from_csr(a, mesh)
        vs = shard_vector(v, pa, mesh)
        got = halo_spmv_overlapped(ha, vs, mesh)[:n]
        np.testing.assert_allclose(
            np.asarray(got), x @ np.asarray(v), rtol=1e-10, atol=1e-12
        )


def test_halo_overlapped_random_and_jit(mesh):
    from sparse_tpu.parallel.halo import (
        halo_partition_overlapped,
        halo_spmv_overlapped,
    )

    rng = np.random.default_rng(11)
    n, m = 48, 72
    x = rng.standard_normal((n, m)) * (rng.random((n, m)) < 0.3)
    a = csr_from_dense(jnp.asarray(x))
    ha = halo_partition_overlapped(a, mesh)
    v = jnp.asarray(rng.standard_normal(m))
    vs = shard_vector(v, pcsr_from_csr(a, mesh), mesh)
    f = jax.jit(lambda h, w: halo_spmv_overlapped(h, w, mesh))
    got = f(ha, vs)[:n]
    np.testing.assert_allclose(
        np.asarray(got), x @ np.asarray(v), rtol=1e-10, atol=1e-12
    )


def test_halo_overlapped_empty_rows_and_uneven(mesh):
    from sparse_tpu.parallel.halo import (
        halo_partition_overlapped,
        halo_spmv_overlapped,
    )

    # n not divisible by 8 shards + rows with no entries at all
    n = 21
    x = np.zeros((n, n))
    x[0, 20] = 2.0
    x[13, 0] = -1.5
    x[20, 20] = 4.0
    a = csr_from_dense(jnp.asarray(x))
    ha = halo_partition_overlapped(a, mesh)
    v = jnp.asarray(np.arange(1.0, n + 1.0))
    vs = shard_vector(v, pcsr_from_csr(a, mesh), mesh)
    got = halo_spmv_overlapped(ha, vs, mesh)[:n]
    np.testing.assert_allclose(np.asarray(got), x @ np.asarray(v))


def test_halo_spmm_matches_oracle_and_jit(mesh):
    from sparse_tpu.parallel import (
        halo_partition_overlapped,
        halo_spmm,
        halo_spmm_overlapped,
    )

    n, bw, k = 48, 4, 8
    x = banded(n, bw, seed=77)
    a = csr_from_dense(jnp.asarray(x))
    ha = halo_partition(a, mesh)
    ho = halo_partition_overlapped(a, mesh)
    b = np.random.default_rng(7).standard_normal((n, k))
    pa = pcsr_from_csr(a, mesh)
    bs = shard_vector(jnp.asarray(b), pa, mesh)
    want = x @ b
    got = halo_spmm(ha, bs, mesh)[:n]
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-10, atol=1e-12)
    got_o = halo_spmm_overlapped(ho, bs, mesh)[:n]
    np.testing.assert_allclose(np.asarray(got_o), want, rtol=1e-10, atol=1e-12)
    f = jax.jit(lambda ho, bs: halo_spmm_overlapped(ho, bs, mesh))
    np.testing.assert_allclose(np.asarray(f(ho, bs))[:n], want, rtol=1e-10)
