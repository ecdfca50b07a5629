"""Chip measurement: small-k BELL SpMM — standard banded kernel vs the
k-transposed variant (BASELINE config 3, k=32/64).

Same 80M-nnz block-band as bench_bell (nb=15625, bsz=32, 5 blocks/row).
Chained protocol; the transposed variant chains in transposed space (the
iterative-SpMM idiom it is designed for).

Usage: python measure_bell_kt.py std|kt [k]
"""
from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from sparse_tpu.formats.bell import bell_from_bsr, bell_spmm
from sparse_tpu.formats.bsr import BSR
from sparse_tpu.ops.segmented import INDEX_DTYPE

K_CHAIN = 5


def build():
    rng = np.random.default_rng(1)
    bsz, half = 32, 2
    nb = 15_625
    n = nb * bsz
    rows, cols = [], []
    for off in range(-half, half + 1):
        r = np.arange(max(0, -off), min(nb, nb - off), dtype=np.int64)
        rows.append(r)
        cols.append(r + off)
    rows = np.concatenate(rows)
    cols = np.concatenate(cols)
    order = np.lexsort((cols, rows))
    rows, cols = rows[order], cols[order]
    pool = rng.standard_normal(1021 * bsz * bsz).astype(np.float32) * 0.01
    blocks = pool.reshape(1021, bsz, bsz)[np.arange(rows.size) % 1021]
    a = bell_from_bsr(
        BSR(indices=(rows * nb + cols).astype(INDEX_DTYPE), blocks=blocks,
            n=n, bsz=bsz)
    )
    lens = np.bincount(rows, minlength=nb)
    slot_valid = np.arange(a.Lb)[None, :] < lens[:, None]
    return a, slot_valid, rows.size * bsz * bsz


def main():
    which = sys.argv[1]
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    a, slot_valid, nnz = build()
    n, bsz = a.n, a.bsz
    rng = np.random.default_rng(2)

    if which == "kt":
        from sparse_tpu.ops.pallas_bell import (
            banded_spmm_t_hbm_bytes,
            bell_banded_prepare_t,
            bell_spmm_pallas_banded_t,
        )

        t0 = time.perf_counter()
        kit = bell_banded_prepare_t(a, slot_valid=slot_valid)
        jax.block_until_ready(kit.tiles_t)
        print(f"prepare_t: rt={kit.plan.rt} W={kit.plan.W} "
              f"({time.perf_counter()-t0:.1f}s)", file=sys.stderr)
        print(f"  S={kit.plan.S} SW={kit.plan.SW}", file=sys.stderr)
        n_pad = int(kit.plan.offs.shape[0]) * bsz
        # chain in PADDED transposed space: (k, n_pad) feeds back directly
        bt0 = jnp.asarray(
            np.pad(rng.standard_normal((k, n)).astype(np.float32) * 0.01,
                   ((0, 0), (0, n_pad - n))))

        @jax.jit
        def chain(a, bt, kit):
            def body(_, bt):
                ct = bell_spmm_pallas_banded_t(a, bt, kit)
                return ct / (jnp.max(jnp.abs(ct)) + 1.0)

            return jnp.sum(jax.lax.fori_loop(0, K_CHAIN, body, bt))

        args = (a, bt0, kit)
        hbm_bytes = banded_spmm_t_hbm_bytes(kit, bsz, n, k)
    else:
        from sparse_tpu.ops.pallas_bell import (
            banded_spmm_hbm_bytes,
            bell_banded_prepare,
        )

        t0 = time.perf_counter()
        kit = bell_banded_prepare(a, row_tile=5, slot_valid=slot_valid)
        jax.block_until_ready(kit.tiles)
        print(f"prepare: rt={kit.plan.rt} W={kit.plan.W} S={kit.plan.S} "
              f"({time.perf_counter()-t0:.1f}s)", file=sys.stderr)
        b0 = jnp.asarray(rng.standard_normal((n, k)).astype(np.float32) * 0.01)

        @jax.jit
        def chain(a, b, kit):
            def body(_, b):
                c = bell_spmm(a, b, plan=kit)
                return c / (jnp.max(jnp.abs(c)) + 1.0)

            return jnp.sum(jax.lax.fori_loop(0, K_CHAIN, body, b))

        args = (a, b0, kit)
        hbm_bytes = banded_spmm_hbm_bytes(kit, bsz, n, k)

    t0 = time.perf_counter()
    r = float(chain(*args))
    print(f"compile+run {time.perf_counter()-t0:.1f}s r={r:.5f}",
          file=sys.stderr)
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        float(chain(*args))
        best = min(best, time.perf_counter() - t0)
    t = best / K_CHAIN
    print(f"{which} k={k}: {t*1e3:.2f} ms/iter  {2*nnz*k/t/1e9:.0f} GFLOP/s  "
          f"hbm {hbm_bytes/t/1e9:.1f} GB/s ({hbm_bytes/t/1e9/207:.2f} of ceiling)")


if __name__ == "__main__":
    main()
