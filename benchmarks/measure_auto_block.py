"""Chip measurement: auto-routed SpGEMM reaches the Pallas slab rate.

Round-4 verdict: `_BLOCK_ROUTE_CANDIDATES` stopped at 8 and `_spgemm_block`
always used the XLA apply, so the measured-best path (DMA-slab kernel,
~350 GFLOP/s) was unreachable via `spgemm(method="auto")`.  This builds a
scalar CSR whose pattern is fully dense 32x32 blocks (the bench SpGEMM
fixture's block structure, ~181k block products), confirms the route picks
(block, 32), runs the routed pipeline end-to-end once (host re-block +
symbolic + apply), and then times the numeric apply that routing selected
(chained protocol) — the rate a caller re-multiplying the same pattern
pays.

Usage: python measure_auto_block.py
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
BSZ, NB = 32, 2_000


def main():
    rng = np.random.default_rng(9)
    per_row = 10
    rows = np.repeat(np.arange(NB, dtype=np.int64), per_row)
    cols = np.clip(rows + rng.integers(-50, 50, rows.size), 0, NB - 1)
    order = np.lexsort((cols, rows))
    rows, cols = rows[order], cols[order]
    keep = np.ones(rows.size, bool)
    keep[1:] = (rows[1:] != rows[:-1]) | (cols[1:] != cols[:-1])
    rows, cols = rows[keep], cols[keep]
    nbz = rows.size
    # scalar CSR with every block position fully dense
    n = NB * BSZ
    bvals = (rng.standard_normal((nbz, BSZ, BSZ)).astype(np.float32) * 0.01)
    bvals[bvals == 0] = 0.01
    A = sp.bsr_matrix(
        (bvals, cols, np.searchsorted(rows, np.arange(NB + 1))),
        shape=(n, n),
    ).tocsr()
    A.sum_duplicates()
    print(f"n={n} nnz={A.nnz} nbz={nbz}", file=sys.stderr, flush=True)

    from sparse_tpu.formats.csr import CSR
    from sparse_tpu.ops.spgemm import _spgemm_route, spgemm

    a = CSR(data=jnp.asarray(A.data),
            indices=jnp.asarray(A.indices.astype(np.int32)),
            indptr=jnp.asarray(A.indptr.astype(np.int32)), shape=(n, n))

    t0 = time.perf_counter()
    route = _spgemm_route(a, a)
    print(f"route: {route} ({time.perf_counter()-t0:.1f}s)", flush=True)
    assert route == ("block", 32), route

    t0 = time.perf_counter()
    c = spgemm(a, a, method="auto")
    jax.block_until_ready(c.data)
    t_e2e = time.perf_counter() - t0
    print(f"auto spgemm end-to-end (one-shot): {t_e2e:.1f}s "
          f"(host re-block + symbolic + pallas apply)", flush=True)

    # the apply the route selected, amortized (pattern reuse)
    from sparse_tpu.formats.bsr import BSR, bsr_smsmm_prepare, csr_to_bsr
    from sparse_tpu.ops.pallas_bsr import (
        bsr_smsmm_apply_pallas,
        bsr_smsmm_pallas_prepare,
    )

    ab = csr_to_bsr(a, 32, compact=True)
    plan = bsr_smsmm_prepare(ab, ab)
    pp = bsr_smsmm_pallas_prepare(plan, ab.nbz, ab.nbz)
    F = plan.n_products
    flops = 2 * F * BSZ ** 3

    @jax.jit
    def chain(blocks, pp, ab):
        def body(_, blocks):
            m = BSR(indices=ab.indices, blocks=blocks, n=ab.n, bsz=ab.bsz)
            out = bsr_smsmm_apply_pallas(pp, m, m).blocks
            return blocks * (1.0 + 1e-30 * jnp.sum(out))

        return jnp.sum(jax.lax.fori_loop(0, K_CHAIN, body, blocks))

    float(chain(ab.blocks, pp, ab))
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        float(chain(ab.blocks, pp, ab))
        best = min(best, time.perf_counter() - t0)
    t = best / K_CHAIN
    print(f"routed apply (F={F}): {t*1e3:.2f} ms ({flops/t/1e9:.1f} GFLOP/s)",
          flush=True)


if __name__ == "__main__":
    main()
