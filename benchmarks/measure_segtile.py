"""Chip measurement: unstructured CSR SpMV (BASELINE config 2).

Matrix: bcsstk-shaped scalar band (no block structure exposed to the
kernel), n=500k, ~10M nnz, plus a uniformly random variant.  Chained
protocol.  Usage: python measure_segtile.py seg|xla [band|rand] [rows] [wsub]
(rows in {8, 32}, wsub in {8, 16, 32, auto} — segment-tile variants).
"""
from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import scipy.sparse as sp

from sparse_tpu.formats.csr import CSR
from sparse_tpu.ops.pallas_csr import build_seg_tiles, csr_smvm_segtile
from sparse_tpu.ops.spmv import build_spmv_plan, csr_smvm_fast

K_CHAIN = 5
N = 500_000
NNZ_ROW = 20


def build(style):
    rng = np.random.default_rng(0)
    if style == "band":
        # scalar band of half-width 1000, ~20 random nnz per row inside it
        r = np.repeat(np.arange(N, dtype=np.int64), NNZ_ROW)
        c = r + rng.integers(-1000, 1001, r.size)
        c = np.clip(c, 0, N - 1)
    else:
        r = np.repeat(np.arange(N, dtype=np.int64), NNZ_ROW)
        c = rng.integers(0, N, r.size)
    v = rng.standard_normal(r.size).astype(np.float32) * 0.01
    A = sp.coo_matrix((v, (r, c)), shape=(N, N)).tocsr()
    A.sum_duplicates()
    return A


def main():
    which = sys.argv[1]
    style = sys.argv[2] if len(sys.argv) > 2 else "band"
    A = build(style)
    print(f"nnz={A.nnz}", file=sys.stderr)
    a = CSR(data=jnp.asarray(A.data), indices=jnp.asarray(A.indices.astype(np.int32)),
            indptr=jnp.asarray(A.indptr.astype(np.int32)), shape=(N, N))
    v = jnp.asarray(np.random.default_rng(1).standard_normal(N).astype(np.float32))

    if which == "seg":
        rows = int(sys.argv[3]) if len(sys.argv) > 3 else 8
        wsub = sys.argv[4] if len(sys.argv) > 4 else 8
        if wsub != "auto":
            wsub = int(wsub)
        t0 = time.perf_counter()
        plan = build_seg_tiles(a, wsub=wsub, rows=rows)
        print(f"plan: rows={plan.rows} wsub={plan.wsub} {plan.n_tiles} tiles "
              f"fill={plan.fill:.4f} ({time.perf_counter()-t0:.1f}s) "
              f"traffic={plan.n_tiles*plan.rows*128*5/1e9:.3f} GB",
              file=sys.stderr)
        red = sys.argv[5] if len(sys.argv) > 5 else "vpu"
        bat = int(sys.argv[6]) if len(sys.argv) > 6 else 64
        print(f"reduce={red} batch={bat}", file=sys.stderr)
        op = lambda a, x, p: csr_smvm_segtile(a, x, p, reduce=red, batch=bat)
        extra = (plan,)
    else:
        plan = build_spmv_plan(a)
        op = lambda a, x, p: csr_smvm_fast(a, x, p)
        extra = (plan,)

    @jax.jit
    def chain(a, x, *extra):
        def body(_, x):
            w = op(a, x, *extra)
            return w / (jnp.max(jnp.abs(w)) + 1.0)

        return jnp.sum(jax.lax.fori_loop(0, K_CHAIN, body, x))

    t0 = time.perf_counter()
    r = float(chain(a, v, *extra))
    print(f"compile+run {time.perf_counter()-t0:.1f}s r={r:.5f}", file=sys.stderr)
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        float(chain(a, v, *extra))
        best = min(best, time.perf_counter() - t0)
    t = best / K_CHAIN
    print(f"{which} {style}: {t*1e3:.2f} ms/iter  {A.nnz/t/1e9:.3f} Gnnz/s")


if __name__ == "__main__":
    main()
