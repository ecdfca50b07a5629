"""Headline benchmark: blocked SpMM throughput on the default JAX backend
(the real TPU chip under the driver; CPU elsewhere).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Config (BASELINE.md config 3: sparse x dense tall-skinny, k=32..256): SpMM
with k=128 on a SuiteSparse-like matrix.  The SuiteSparse suite is not
downloadable here (no egress), so the matrix is a synthetic FEM-style
block-banded operator (bcsstk-shaped: dense 32x32 blocks on a 5-block band),
500k rows, ~80M nnz.  The measured op is the fused Pallas blocked-ELL SpMM
(`ops/pallas_bell.py`) — scalar-prefetch DMA gathering straight into the
MXU, no materialized gather intermediate (the pure-XLA formulation needs a
41 GB temporary at this size and cannot run at all).

``value`` is the **measured-traffic** memory throughput (GB/s): actual HBM
bytes the banded kernel moves (plan-derived: densified tiles + one shared
operand window per super-step + output — the kernel's CostEstimate), so the
headline cannot exceed the chip's measured streaming ceiling by
construction.  ``model_gbps`` (extra field) is the min-traffic model
(blocks + block column ids + one gathered (bsz x k) operand panel per
stored block + output) kept for cross-round/cross-format comparability —
it can exceed the ceiling because band overlap means the kernel re-reads
window panels the model charges once.  ``vs_baseline`` is the speedup over
SciPy's native BSR sparse x dense product on this host (BASELINE.md names
the SciPy re-execution of the reference's semantics as the baseline; the
Futhark reference publishes no numbers and is not runnable here).
``roofline_frac`` = value / 207 GB/s (the chained-axpy ceiling measured on
this chip, docs/performance.md).

Timing is dependency-chained inside one jit (iterate B <- A B; the operator
is 0.01-scaled so a 5-step chain stays numerically tame) so nothing can be
hoisted or overlapped away; the remote-TPU tunnel's async dispatch makes
naive per-call timing report impossible numbers.  All device operands are
passed as jit arguments — closure constants get embedded in the compile
payload and overflow the tunnel's upload limit.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

_T0 = time.time()


def _mark(stage: str) -> None:
    """Stage timestamps on stderr: the driver captures them, so a timeout or
    tunnel stall is attributable to a stage instead of silent."""
    print(f"[bench {time.time() - _T0:7.1f}s] {stage}", file=sys.stderr,
          flush=True)

BSZ = 32
HALF_BAND = 2  # blocks each side of the diagonal
NB = 15_625  # block rows -> n = 500k
K = 128  # dense operand width
K_CHAIN = 5


def build_block_band(nb=NB, bsz=BSZ, half_band=HALF_BAND, seed=0):
    """FEM-style block-banded pattern: block row i holds blocks at columns
    [i-half_band, i+half_band] clamped to [0, nb).

    Values are drawn from a ~1M-sample normal pool and index-tiled up to the
    80M-element operand: this host draws normals at ~2M/s, so sampling every
    element would cost minutes of pure RNG (measured 146 s for the block
    array alone) without changing what the bench measures.  The pool period
    (a prime) is coprime to the block count, so no two adjacent block rows
    repeat the same block."""
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
    pool = (rng.standard_normal(1021 * bsz * bsz).astype(np.float32) * 0.01)
    pool = pool.reshape(1021, bsz, bsz)
    blocks = pool[np.arange(rows.size) % 1021]
    bpool = (rng.standard_normal(8191 * K).astype(np.float32) * 0.01)
    bpool = bpool.reshape(8191, K)
    b = bpool[np.arange(nb * bsz) % 8191]
    return rows, cols, blocks, b


def scipy_time(rows, cols, blocks, b, iters=2):
    import scipy.sparse as sp

    nb = NB
    indptr = np.zeros(nb + 1, np.int64)
    np.cumsum(np.bincount(rows, minlength=nb), out=indptr[1:])
    a = sp.bsr_matrix((blocks, cols, indptr), shape=(nb * BSZ, nb * BSZ))
    a @ b  # warm
    best = np.inf
    for _ in range(iters):
        t0 = time.perf_counter()
        a @ b
        best = min(best, time.perf_counter() - t0)
    return best


def tpu_time(rows, cols, blocks, b, iters=3):
    import jax
    import jax.numpy as jnp

    from sparse_tpu.formats.bell import BELL, bell_spmm
    from sparse_tpu.ops.pallas_bell import bell_banded_prepare
    from sparse_tpu.ops.segmented import INDEX_DTYPE

    nb = NB
    # build the BELL layout directly: the PATTERN (cols, slot validity) on
    # the host (tiny), the VALUES on device from the same N(0, 0.01^2) pool
    # distribution — nothing large crosses the device tunnel (a 320 MB block
    # upload takes minutes when the tunnel is congested).  Values differ
    # from the SciPy baseline's draw, which is fine: vs_baseline is a time
    # ratio and SpMM time is value-independent.
    lens = np.bincount(rows, minlength=nb)
    Lb = int(lens.max())
    starts = np.zeros(nb + 1, np.int64)
    np.cumsum(lens, out=starts[1:])
    slot = np.arange(rows.size) - starts[rows]
    cols_np = np.zeros((nb, Lb), np.int32)
    cols_np[rows, slot] = cols
    slot_valid = np.arange(Lb)[None, :] < lens[:, None]

    key = jax.random.PRNGKey(0)
    pool = jax.random.normal(key, (1021, BSZ, BSZ), jnp.float32) * 0.01
    idx = jnp.asarray((np.arange(nb * Lb) % 1021).astype(np.int32))
    dev_blocks = (
        pool[idx].reshape(nb, Lb, BSZ, BSZ)
        * jnp.asarray(slot_valid, jnp.float32)[:, :, None, None]
    )
    a = BELL(cols=jnp.asarray(cols_np, INDEX_DTYPE), blocks=dev_blocks,
             n=nb * BSZ, bsz=BSZ)
    _mark("bell layout on device (values device-generated)")
    # banded kit (plan + densified tiles, eager, once per matrix): rt=5
    # divides nb so the kernel output needs no tail slice; None falls back
    # to the fused kernel.  slot_valid from the host pattern (row lengths)
    # keeps the planner from pulling the block array back off the device.
    plan = None
    if jax.default_backend() == "tpu":
        try:
            # two explicit stages so the bench log attributes the prepare
            # cost (the round-3 log lumped ~190 s into one line): the host
            # symbolic plan is O(nb*Lb) numpy; the tiles are ONE device-side
            # jitted gather whose wall time through the tunnel is dominated
            # by its XLA compile (docs/performance.md prepare-cost table)
            from sparse_tpu.ops.pallas_bell import build_banded_plan

            build_banded_plan(a, row_tile=5, slot_valid=slot_valid)
            _mark("banded plan built (host symbolic pass)")
            plan = bell_banded_prepare(a, row_tile=5, slot_valid=slot_valid)
            jax.block_until_ready(plan.tiles)
        except Exception as e:  # fused kernel still posts a valid headline
            _mark(f"banded prepare failed ({type(e).__name__}: {e}); "
                  "falling back to the fused kernel")
    _mark("banded tiles densified on device (jit compile + one gather)")
    bj = (jax.random.normal(jax.random.PRNGKey(1), (nb * BSZ, K), jnp.float32)
          * 0.01)

    @jax.jit
    def chain(a, b, plan):
        # raw output fed back: each iteration depends on the previous one
        # (nothing hoistable), and the 0.01-scaled operator keeps a 5-step
        # chain numerically tame (|w| ~ 0.13 |b| per step).  An elementwise
        # normalize here would add ~2.5 ms/iter of protocol-only HBM traffic
        # (read+write 256 MB) that is not part of the measured op.
        return jnp.sum(
            jax.lax.fori_loop(0, K_CHAIN, lambda _, b: bell_spmm(a, b, plan=plan), b)
        )

    float(chain(a, bj, plan))  # compile + execute
    _mark("chain compiled + first run")
    best = np.inf
    for i in range(iters):
        t0 = time.perf_counter()
        float(chain(a, bj, plan))
        best = min(best, time.perf_counter() - t0)
        _mark(f"timed run {i}")
    hbm_bytes = None
    if plan is not None:
        from sparse_tpu.ops.pallas_bell import banded_spmm_hbm_bytes

        hbm_bytes = banded_spmm_hbm_bytes(plan, BSZ, nb * BSZ, K)
    return best / K_CHAIN, hbm_bytes


def main():
    rows, cols, blocks, b = build_block_band()
    _mark("matrix built (host)")
    t_ref = scipy_time(rows, cols, blocks, b)
    _mark(f"scipy baseline done ({t_ref * 1000:.1f} ms/iter)")
    t_tpu, hbm_bytes = tpu_time(rows, cols, blocks, b)
    nbz = rows.size
    n = NB * BSZ
    nnz = nbz * BSZ * BSZ
    # min-traffic model: blocks + block col ids + one gathered operand panel
    # per block + output (comparability across rounds/formats; NOT a
    # roofline denominator — see module docstring)
    model_bytes = nbz * (BSZ * BSZ * 4 + 4 + BSZ * K * 4) + n * K * 4
    if hbm_bytes is None:
        # fused-kernel fallback: its real traffic IS the model
        hbm_bytes = model_bytes
    gbps = hbm_bytes / t_tpu / 1e9
    # nnz/s roofline model (utils/stats.nnz_roofline): intrinsic min bytes
    # (blocks + each operand entry once + output) -> pattern ceiling;
    # structural_frac = intrinsic/plan traffic — the densified-tile overhead
    from sparse_tpu.utils.stats import (
        HBM_CEILING_GBPS,
        blocked_min_bytes,
        nnz_roofline,
    )

    rl = nnz_roofline(
        nnz, k=K, min_bytes=blocked_min_bytes(nbz, BSZ, n, K),
        plan_bytes=hbm_bytes, seconds=t_tpu,
    )
    print(
        json.dumps(
            {
                "metric": "bell_spmm_k128_f32_block_banded_500k_hbm",
                "value": round(gbps, 2),
                "unit": "GB/s",
                "vs_baseline": round(t_ref / t_tpu, 2),
                "model_gbps": round(model_bytes / t_tpu / 1e9, 2),
                "roofline_frac": round(gbps / HBM_CEILING_GBPS, 3),
                "frac_of_nnz_roofline": round(rl["frac_of_nnz_roofline"], 3),
                "structural_frac": round(rl["structural_frac"], 3),
                "gflops": round(2 * nnz * K / t_tpu / 1e9, 1),
                "ms_per_spmm": round(t_tpu * 1e3, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
