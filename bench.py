"""Headline benchmark: CSR SpMV throughput on the default JAX backend (the
real TPU chip under the driver; falls back to CPU elsewhere).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

``value`` is effective memory throughput (GB/s) of the f32 CSR SpMV hot path
(bytes = nnz * (val 4B + col-index 4B + gathered operand 4B) + row pointers +
output), the roofline currency from BASELINE.md.  ``vs_baseline`` is the
speedup over SciPy's native CSR matvec on this host — the NumPy/SciPy
re-execution of the reference's semantics that BASELINE.md names as the
baseline (the Futhark reference itself publishes no numbers and is not
runnable here).
"""

from __future__ import annotations

import json
import time

import numpy as np


def build_problem(n=200_000, m=200_000, nnz_per_row=50, seed=0):
    rng = np.random.default_rng(seed)
    nnz = n * nnz_per_row
    rows = np.repeat(np.arange(n, dtype=np.int32), nnz_per_row)
    cols = rng.integers(0, m, size=nnz, dtype=np.int32)
    # sort columns within rows for CSR validity
    order = np.lexsort((cols, rows))
    rows, cols = rows[order], cols[order]
    vals = rng.standard_normal(nnz).astype(np.float32)
    indptr = np.zeros(n + 1, np.int64)
    np.cumsum(np.bincount(rows, minlength=n), out=indptr[1:])
    v = rng.standard_normal(m).astype(np.float32)
    return n, m, indptr, cols, vals, v


def scipy_baseline(n, m, indptr, cols, vals, v, iters=10):
    import scipy.sparse as sp

    a = sp.csr_matrix((vals, cols, indptr), shape=(n, m))
    a @ v  # warm
    best = np.inf
    for _ in range(iters):
        t0 = time.perf_counter()
        a @ v
        best = min(best, time.perf_counter() - t0)
    return best


def jax_time(n, m, indptr, cols, vals, v, iters=20):
    import jax
    import jax.numpy as jnp

    from sparse_tpu import CSR
    from sparse_tpu.ops.spmv import build_spmv_plan, csr_smvm_fast

    a = CSR(
        data=jnp.asarray(vals),
        indices=jnp.asarray(cols),
        indptr=jnp.asarray(indptr.astype(np.int32)),
        shape=(n, m),
    )
    vj = jnp.asarray(v)
    plan = build_spmv_plan(a)  # eager symbolic pass, once per pattern
    f = jax.jit(lambda a, v: csr_smvm_fast(a, v, plan))
    f(a, vj).block_until_ready()  # compile
    best = np.inf
    for _ in range(iters):
        t0 = time.perf_counter()
        f(a, vj).block_until_ready()
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    n, m, indptr, cols, vals, v = build_problem()
    nnz = len(vals)
    t_ref = scipy_baseline(n, m, indptr, cols, vals, v)
    t_jax = jax_time(n, m, indptr, cols, vals, v)
    bytes_moved = nnz * (4 + 4 + 4) + (n + 1) * 4 + n * 4
    gbps = bytes_moved / t_jax / 1e9
    print(
        json.dumps(
            {
                "metric": "csr_spmv_f32_effective_bw",
                "value": round(gbps, 3),
                "unit": "GB/s",
                "vs_baseline": round(t_ref / t_jax, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
