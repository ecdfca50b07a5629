"""Headline benchmark: SpMV throughput on the default JAX backend (the real
TPU chip under the driver; CPU elsewhere).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Config (BASELINE.md config 2): SpMV on a SuiteSparse-like matrix.  The
SuiteSparse suite itself is not downloadable here (no egress), so the matrix
is a synthetic FEM-style block-banded operator (bcsstk-shaped: dense 32x32
blocks on a 5-block band), 500k rows, ~80M nnz — the structure class the
suite's headline matrices (bcsstk*, ct20stif, pwtk) share.  The measured op
is the blocked-ELL SpMV (`formats/bell.py`), the framework's
speed-of-light path for block-structured matrices.

``value`` is effective memory throughput (GB/s): minimum bytes = blocks +
block column ids + gathered operand chunks + output.  ``vs_baseline`` is the
speedup over SciPy's native BSR matvec on this host (BASELINE.md names the
SciPy re-execution of the reference's semantics as the baseline; the Futhark
reference publishes no numbers and is not runnable here).

Timing is dependency-chained inside one jit (iterate v <- normalize(A v)) so
nothing can be hoisted or overlapped away; the remote-TPU tunnel's async
dispatch makes naive per-call timing report impossible numbers.
"""

from __future__ import annotations

import json
import time

import numpy as np

BSZ = 32
HALF_BAND = 2  # blocks each side of the diagonal
NB = 15_625  # block rows -> n = 500k
K_CHAIN = 10


def build_block_band(nb=NB, bsz=BSZ, half_band=HALF_BAND, seed=0):
    """FEM-style block-banded pattern: block row i holds blocks at columns
    [i-half_band, i+half_band] clamped to [0, nb)."""
    rng = np.random.default_rng(seed)
    rows = []
    cols = []
    for off in range(-half_band, half_band + 1):
        r = np.arange(max(0, -off), min(nb, nb - off), dtype=np.int64)
        rows.append(r)
        cols.append(r + off)
    rows = np.concatenate(rows)
    cols = np.concatenate(cols)
    order = np.lexsort((cols, rows))
    rows, cols = rows[order], cols[order]
    blocks = rng.standard_normal((rows.size, bsz, bsz)).astype(np.float32) * 0.01
    v = rng.standard_normal(nb * bsz).astype(np.float32)
    return rows, cols, blocks, v


def scipy_time(rows, cols, blocks, v, iters=5):
    import scipy.sparse as sp

    nb = NB
    indptr = np.zeros(nb + 1, np.int64)
    np.cumsum(np.bincount(rows, minlength=nb), out=indptr[1:])
    a = sp.bsr_matrix((blocks, cols, indptr), shape=(nb * BSZ, nb * BSZ))
    x = v.copy()
    a @ x  # warm
    best = np.inf
    for _ in range(iters):
        t0 = time.perf_counter()
        for _ in range(K_CHAIN):
            w = a @ x
            x = w / (np.abs(w).max() + 1.0)
        best = min(best, (time.perf_counter() - t0) / K_CHAIN)
    return best


def tpu_time(rows, cols, blocks, v, iters=3):
    import jax
    import jax.numpy as jnp

    from sparse_tpu.formats.bell import bell_from_bsr, bell_smvm
    from sparse_tpu.formats.bsr import BSR
    from sparse_tpu.ops.segmented import INDEX_DTYPE

    nb = NB
    a = bell_from_bsr(
        BSR(
            indices=jnp.asarray(rows * nb + cols, INDEX_DTYPE),
            blocks=jnp.asarray(blocks),
            n=nb * BSZ,
            bsz=BSZ,
        )
    )
    vj = jnp.asarray(v)

    @jax.jit
    def chain(a, v):
        def body(_, v):
            w = bell_smvm(a, v)
            return w / (jnp.max(jnp.abs(w)) + 1.0)

        return jnp.sum(jax.lax.fori_loop(0, K_CHAIN, body, v))

    float(chain(a, vj))  # compile + execute
    best = np.inf
    for _ in range(iters):
        t0 = time.perf_counter()
        float(chain(a, vj))
        best = min(best, (time.perf_counter() - t0) / K_CHAIN)
    return best


def main():
    rows, cols, blocks, v = build_block_band()
    t_ref = scipy_time(rows, cols, blocks, v)
    t_tpu = tpu_time(rows, cols, blocks, v)
    nbz = rows.size
    n = NB * BSZ
    # blocks + block col ids + gathered operand chunks + output vector
    bytes_moved = nbz * (BSZ * BSZ * 4 + 4 + BSZ * 4) + n * 4
    gbps = bytes_moved / t_tpu / 1e9
    print(
        json.dumps(
            {
                "metric": "bsr_spmv_f32_block_banded_500k",
                "value": round(gbps, 2),
                "unit": "GB/s",
                "vs_baseline": round(t_ref / t_tpu, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
