"""Experiment: dense-banded-tile SpMM — one wide MXU matmul per row tile.

Per tile of rt block rows, the band blocks are densified (host/XLA, once)
into a (rt*bsz, W*bsz) tile; the kernel fetches the W-panel operand window
with one pl.Element DMA and does a single matmul.  Usage:
  python measure_dband.py rt [bf16]
"""
from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bench import BSZ, K, NB, build_block_band
from sparse_tpu.formats.bell import bell_from_bsr
from sparse_tpu.formats.bsr import BSR
from sparse_tpu.ops.segmented import INDEX_DTYPE
from sparse_tpu.ops.pallas_bell import build_banded_plan

K_CHAIN = 5


def densify_tiles(a, plan, stream_dtype):
    """(ntiles, rt*bsz, W*bsz) banded tiles from BELL blocks (eager)."""
    nb, bsz, Lb = a.nb, a.bsz, a.Lb
    W, rt = plan.W, plan.rt
    nb_pad = -(-nb // rt) * rt
    wide = jnp.swapaxes(a.blocks, 1, 2).reshape(nb, bsz, Lb * bsz)
    if nb_pad != nb:
        wide = jnp.concatenate(
            [wide, jnp.zeros((nb_pad - nb, bsz, Lb * bsz), wide.dtype)]
        )
    offs = plan.offs.astype(jnp.int32)  # (nb_pad,)
    c = jnp.arange(W * bsz, dtype=jnp.int32)[None, :]  # dest cols
    src = c - offs[:, None] * bsz
    ok = (src >= 0) & (src < Lb * bsz)
    srcc = jnp.clip(src, 0, Lb * bsz - 1)
    dense = jnp.where(
        ok[:, None, :],
        jnp.take_along_axis(
            wide, jnp.broadcast_to(srcc[:, None, :], (nb_pad, bsz, W * bsz)),
            axis=2,
        ),
        0,
    )
    return dense.reshape(nb_pad // rt, rt * bsz, W * bsz).astype(stream_dtype)


def dband_spmm(tiles, start, b3, nb, bsz, k, W, rt, out_dtype):
    ntiles = tiles.shape[0]

    def kernel(start_ref, t_ref, win_ref, o_ref):
        o_ref[0] = jax.lax.dot_general(
            t_ref[0],
            win_ref[...].reshape(W * bsz, k),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=o_ref.dtype,
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(ntiles,),
        in_specs=[
            pl.BlockSpec((1, rt * bsz, W * bsz),
                         lambda t, start: (t, 0, 0)),
            pl.BlockSpec(
                (pl.Element(W), pl.Element(bsz), pl.Element(k)),
                lambda t, start: (start[t], 0, 0),
            ),
        ],
        out_specs=pl.BlockSpec((1, rt * bsz, k), lambda t, start: (t, 0, 0)),
    )
    bytes_el = tiles.dtype.itemsize
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((ntiles, rt * bsz, k), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * ntiles * rt * bsz * W * bsz * k,
            bytes_accessed=ntiles * (rt * bsz * W * bsz + W * bsz * k) * bytes_el
            + ntiles * rt * bsz * k * 4,
            transcendentals=0,
        ),
    )(start, tiles, b3)
    return out.reshape(ntiles * rt * bsz, k)[: nb * bsz]


def main():
    rt = int(sys.argv[1])
    stream_dtype = jnp.bfloat16 if (len(sys.argv) > 2 and sys.argv[2] == "bf16") else jnp.float32
    rows, cols, blocks, b = build_block_band()
    a = bell_from_bsr(
        BSR(indices=jnp.asarray(rows * NB + cols, INDEX_DTYPE),
            blocks=jnp.asarray(blocks), n=NB * BSZ, bsz=BSZ)
    )
    plan = build_banded_plan(a, row_tile=rt, max_window=96)
    assert plan is not None
    W = plan.W
    print(f"W={W} rt={rt} stream={stream_dtype.__name__}", file=sys.stderr)
    tiles = jax.jit(densify_tiles, static_argnums=(2,))(a, plan, stream_dtype)
    tiles.block_until_ready()
    nb = NB
    b3 = jnp.asarray(b).reshape(nb, BSZ, K)
    b3 = jnp.concatenate([b3, jnp.zeros((W, BSZ, K), b3.dtype)])

    @jax.jit
    def chain(tiles, start, b3):
        def body(_, b3):
            w = dband_spmm(tiles, start, b3.astype(stream_dtype), nb, BSZ, K,
                           W, rt, jnp.float32)
            w = w / (jnp.max(jnp.abs(w)) + 1.0)
            return jnp.concatenate(
                [w.reshape(nb, BSZ, K), jnp.zeros((W, BSZ, K), w.dtype)]
            )

        return jnp.sum(jax.lax.fori_loop(0, K_CHAIN, body, b3))

    t0 = time.perf_counter()
    r = float(chain(tiles, plan.start, b3))
    print(f"compile+run {time.perf_counter()-t0:.1f}s result={r:.4f}", file=sys.stderr)
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        float(chain(tiles, plan.start, b3))
        best = min(best, time.perf_counter() - t0)
    t = best / K_CHAIN
    nbz = rows.size
    n = NB * BSZ
    bytes_moved = nbz * (BSZ * BSZ * 4 + 4 + BSZ * K * 4) + n * K * 4
    print(f"dband rt={rt}: {t*1e3:.2f} ms/iter  effective {bytes_moved/t/1e9:.1f} GB/s")


if __name__ == "__main__":
    main()
