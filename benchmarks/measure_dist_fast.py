"""Chip measurement: fast kernels inside shard_map on a 1-device mesh.

The round-5 claim "partitioned matrices inherit the single-chip kernel
rates" needs a number: this measures the segment-tile SpMV and the DMA-slab
block SpGEMM both BARE (the single-device entry points) and through the
distributed pipelines (`halo_spmv_segtile` / `pbsr_smsmm_pallas`) on a
1-device mesh — the only mesh the chip tunnel offers — where the exchange
degenerates to a 1-entry dummy and any remaining gap is pipeline overhead.
Chained protocol (docs/performance.md).

Usage: python measure_dist_fast.py spmv|spgemm
"""
from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import scipy.sparse as sp

K_CHAIN = 5


def timed(fn, *args):
    @jax.jit
    def chain(x, *ops):
        def body(_, x):
            w = fn(x, *ops)
            return w / (jnp.max(jnp.abs(w)) + 1.0)

        return jnp.sum(jax.lax.fori_loop(0, K_CHAIN, body, x))

    t0 = time.perf_counter()
    r = float(chain(*args))
    print(f"  compile+run {time.perf_counter()-t0:.1f}s r={r:.5f}",
          file=sys.stderr, flush=True)
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        float(chain(*args))
        best = min(best, time.perf_counter() - t0)
    return best / K_CHAIN


def main_spmv():
    from sparse_tpu.formats.csr import CSR
    from sparse_tpu.ops.pallas_csr import build_seg_tiles, csr_smvm_segtile
    from sparse_tpu.parallel import halo_partition_segtile, halo_spmv_segtile
    from sparse_tpu.parallel.pcsr import make_1d_mesh

    N, NNZ_ROW = 500_000, 20
    rng = np.random.default_rng(0)
    r = np.repeat(np.arange(N, dtype=np.int64), NNZ_ROW)
    c = np.clip(r + rng.integers(-1000, 1001, r.size), 0, N - 1)
    v = rng.standard_normal(r.size).astype(np.float32) * 0.01
    A = sp.coo_matrix((v, (r, c)), shape=(N, N)).tocsr()
    A.sum_duplicates()
    print(f"nnz={A.nnz}", file=sys.stderr, flush=True)
    a = CSR(data=jnp.asarray(A.data),
            indices=jnp.asarray(A.indices.astype(np.int32)),
            indptr=jnp.asarray(A.indptr.astype(np.int32)), shape=(N, N))
    x = jnp.asarray(
        np.random.default_rng(1).standard_normal(N).astype(np.float32))

    t0 = time.perf_counter()
    plan = build_seg_tiles(a, wsub=8)
    print(f"bare plan: {plan.n_tiles} tiles fill={plan.fill:.4f} "
          f"({time.perf_counter()-t0:.1f}s)", file=sys.stderr, flush=True)
    t = timed(lambda x, a, p: csr_smvm_segtile(a, x, p), x, a, plan)
    print(f"bare segtile: {t*1e3:.2f} ms  {A.nnz/t/1e9:.3f} Gnnz/s",
          flush=True)

    mesh = make_1d_mesh(1)
    t0 = time.perf_counter()
    hs = halo_partition_segtile(a, mesh)
    print(f"dist plan: {hs.n_tiles} tiles fill={hs.fill:.4f} halo={hs.halo} "
          f"({time.perf_counter()-t0:.1f}s)", file=sys.stderr, flush=True)
    t = timed(lambda x, hs: halo_spmv_segtile(hs, x, mesh)[:N], x, hs)
    print(f"halo_spmv_segtile[1dev]: {t*1e3:.2f} ms  {A.nnz/t/1e9:.3f} Gnnz/s",
          flush=True)


def main_spgemm():
    from sparse_tpu.formats.bsr import BSR, bsr_smsmm_prepare
    from sparse_tpu.ops.pallas_bsr import (
        bsr_smsmm_apply_pallas,
        bsr_smsmm_pallas_prepare,
    )
    from sparse_tpu.ops.segmented import INDEX_DTYPE
    from sparse_tpu.parallel import (
        build_pbsr_smsmm_plan_pallas,
        pbsr_from_bsr,
        pbsr_smsmm_pallas,
    )
    from sparse_tpu.parallel.pcsr import make_1d_mesh

    BSZ, nb = 32, 2_000
    rng = np.random.default_rng(9)
    per_row = 10
    rows = np.repeat(np.arange(nb, dtype=np.int64), per_row)
    cols = np.clip(rows + rng.integers(-50, 50, rows.size), 0, nb - 1)
    order = np.lexsort((cols, rows))
    rows, cols = rows[order], cols[order]
    keep = np.ones(rows.size, bool)
    keep[1:] = (rows[1:] != rows[:-1]) | (cols[1:] != cols[:-1])
    rows, cols = rows[keep], cols[keep]
    pool = rng.standard_normal((257, BSZ, BSZ)).astype(np.float32) * 0.01
    a = BSR(indices=jnp.asarray(rows * nb + cols, INDEX_DTYPE),
            blocks=jnp.asarray(pool[np.arange(rows.size) % 257]),
            n=nb * BSZ, bsz=BSZ)

    plan = bsr_smsmm_prepare(a, a)
    F = plan.n_products
    flops = 2 * F * BSZ ** 3
    pp = bsr_smsmm_pallas_prepare(plan, a.nbz, a.nbz)
    print(f"F={F} g={pp.g} p={pp.p}", file=sys.stderr, flush=True)
    t = timed(
        lambda blocks, pp, a: blocks * (1.0 + 1e-30 * jnp.sum(
            bsr_smsmm_apply_pallas(
                pp, BSR(indices=a.indices, blocks=blocks, n=a.n, bsz=a.bsz),
                BSR(indices=a.indices, blocks=blocks, n=a.n, bsz=a.bsz),
            ).blocks)),
        a.blocks, pp, a,
    )
    print(f"bare pallas apply: {t*1e3:.2f} ms ({flops/t/1e9:.1f} GFLOP/s)",
          flush=True)

    mesh = make_1d_mesh(1)
    pa = pbsr_from_bsr(a, mesh)
    dp = build_pbsr_smsmm_plan_pallas(pa, pa, mesh)
    print(f"dist: g={dp.g} p={dp.p} nbz_out={dp.nbz_out} exch={dp.exch}",
          file=sys.stderr, flush=True)

    def step(blocks, dp, pa):
        m = type(pa)(indices=pa.indices, blocks=blocks, n=pa.n, bsz=pa.bsz,
                     axis=pa.axis, rows_per_shard=pa.rows_per_shard)
        return blocks * (
            1.0 + 1e-30 * jnp.sum(pbsr_smsmm_pallas(m, m, mesh, dp).blocks))

    t = timed(step, pa.blocks, dp, pa)
    print(f"pbsr_smsmm_pallas[1dev]: {t*1e3:.2f} ms ({flops/t/1e9:.1f} "
          f"GFLOP/s)", flush=True)


if __name__ == "__main__":
    if sys.argv[1] == "spmv":
        main_spmv()
    else:
        main_spgemm()
