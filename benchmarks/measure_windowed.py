"""Chip measurement: fused kernel vs windowed v3 at the bench size.

Chained-timing protocol (see docs/performance.md): iterate B <- normalize(
kernel(A, B)) inside one jit, fetch a scalar.  Run ONE variant per process
invocation (tunnel congestion rule): `python measure_windowed.py fused|win8|win16|win4`.
"""
from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from bench import BSZ, K, NB, build_block_band
from sparse_tpu.formats.bell import BELL, bell_from_bsr
from sparse_tpu.formats.bsr import BSR
from sparse_tpu.ops.segmented import INDEX_DTYPE
from sparse_tpu.ops.pallas_bell import (
    bell_spmm_pallas_banded,
    bell_spmm_pallas_fused,
    bell_spmm_pallas_windowed,
    build_banded_plan,
    build_window_plan,
)

K_CHAIN = 5


def main(which: str):
    rows, cols, blocks, b = build_block_band()
    a = bell_from_bsr(
        BSR(
            indices=jnp.asarray(rows * NB + cols, INDEX_DTYPE),
            blocks=jnp.asarray(blocks),
            n=NB * BSZ,
            bsz=BSZ,
        )
    )
    bj = jnp.asarray(b)
    nbz = rows.size
    n = NB * BSZ

    if which == "fused":
        op = bell_spmm_pallas_fused
        extra = ()
    elif which.startswith("band"):
        spec = which[4:]
        bf16 = spec.endswith("h")
        rt = int(spec.rstrip("h"))
        plan = build_banded_plan(a, row_tile=rt, max_window=96)
        assert plan is not None, "banded plan failed"
        print(f"plan W={plan.W} rt={plan.rt}", file=sys.stderr)
        import jax.numpy as _jnp
        if bf16:
            op = lambda a, b, p: bell_spmm_pallas_banded(
                a, b, p, compute_dtype=_jnp.bfloat16)
        else:
            op = bell_spmm_pallas_banded
        extra = (plan,)
    elif which.startswith("win"):
        rt = int(which[3:])
        plan = build_window_plan(a, row_tile=rt, max_window=64)
        assert plan is not None, "window plan failed"
        print(f"plan U={plan.U} rt={plan.rt} n_gran={plan.n_gran}", file=sys.stderr)
        op = bell_spmm_pallas_windowed
        extra = (plan,)
    else:
        raise SystemExit(f"unknown variant {which}")

    @jax.jit
    def chain(a, b, *extra):
        def body(_, b):
            w = op(a, b, *extra)
            return w / (jnp.max(jnp.abs(w)) + 1.0)

        return jnp.sum(jax.lax.fori_loop(0, K_CHAIN, body, b))

    t0 = time.perf_counter()
    r = float(chain(a, bj, *extra))
    print(f"compile+run: {time.perf_counter()-t0:.1f}s result={r:.4f}",
          file=sys.stderr)
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        float(chain(a, bj, *extra))
        best = min(best, time.perf_counter() - t0)
    t = best / K_CHAIN
    bytes_moved = nbz * (BSZ * BSZ * 4 + 4 + BSZ * K * 4) + n * K * 4
    print(f"{which}: {t*1e3:.2f} ms/iter  effective {bytes_moved/t/1e9:.1f} GB/s")


if __name__ == "__main__":
    main(sys.argv[1])
