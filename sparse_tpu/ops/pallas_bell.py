"""Pallas blocked-ELL SpMM kernel: scalar-prefetch-driven operand DMA.

The XLA BELL SpMM path (formats/bell.py) gathers operand panels into a
materialized (nb, Lb, bsz, k) intermediate — written once and read once,
i.e. 2x nnz*k*4 bytes of avoidable HBM traffic.  This kernel removes it:
``pltpu.PrefetchScalarGridSpec`` prefetches the block-column ids, the
operand BlockSpec's index_map uses them to DMA exactly the needed
``(bsz, k)`` panel of B per grid step, and the MXU consumes it straight from
VMEM while Mosaic pipelines the next step's DMA.  The output block stays
resident in VMEM across the ``l`` (window) axis and accumulates in place.

This is the canonical TPU sparse-dense kernel shape (the DMA engine does the
gathering).  Correctness is tested in interpreter mode on CPU; use real
hardware for performance.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import dataclasses as _wp_dc
from functools import partial as _wp_partial

from ..formats.bell import BELL

_wp_dataclass = _wp_dc.dataclass
_wp_register = _wp_partial(
    jax.tree_util.register_dataclass,
    data_fields=["offs", "gran"],
    meta_fields=["U", "rt", "n_gran"],
)

__all__ = ["bell_spmm_pallas", "bell_spmm_pallas_fused",
           "build_window_plan", "WindowPlan",
           "bell_spmm_pallas_windowed", "bell_smvm_pallas"]


def _kernel(cols_ref, blk_ref, panel_ref, o_ref):
    @pl.when(pl.program_id(1) == 0)
    def _():
        o_ref[...] = jnp.zeros_like(o_ref)

    o_ref[...] += jax.lax.dot_general(
        blk_ref[0, 0],
        panel_ref[0],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=o_ref.dtype,
    )[None]


def bell_spmm_pallas(a: BELL, b: jax.Array, *, interpret: bool = False) -> jax.Array:
    """C[n, k] = A @ B with A blocked-ELL; one grid step per stored block.

    ``b`` must have k >= 128-friendly width for best MXU utilization; any k
    works.  jit-compatible (shapes static per BELL layout).
    """
    b = jnp.asarray(b)
    if b.ndim != 2 or b.shape[0] != a.n:
        raise ValueError(f"bell_spmm_pallas: operand shape {b.shape} != ({a.n}, k)")
    k = b.shape[1]
    nb, bsz, Lb = a.nb, a.bsz, a.Lb
    out_dtype = jnp.result_type(a.dtype, b.dtype)
    if a.n == 0 or Lb == 0 or k == 0:
        return jnp.zeros((a.n, k), out_dtype)
    b3 = b.reshape(nb, bsz, k).astype(out_dtype)
    blocks = a.blocks.astype(out_dtype)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb, Lb),
        in_specs=[
            pl.BlockSpec(
                (1, 1, bsz, bsz), lambda r, l, cols: (r, l, 0, 0)
            ),
            pl.BlockSpec(
                (1, bsz, k), lambda r, l, cols: (cols[r * Lb + l], 0, 0)
            ),
        ],
        out_specs=pl.BlockSpec((1, bsz, k), lambda r, l, cols: (r, 0, 0)),
    )
    out = pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nb, bsz, k), out_dtype),
        interpret=interpret,
    )(a.cols.reshape(-1), blocks, b3)
    return out.reshape(a.n, k)


def bell_spmm_pallas_fused(a: BELL, b: jax.Array, *,
                           compute_dtype=None,
                           interpret: bool = False) -> jax.Array:
    """Fused variant: ONE grid step per block *row* — all Lb window panels
    arrive via Lb scalar-prefetch-driven DMAs and feed a single
    (bsz, Lb*bsz) @ (Lb*bsz, k) MXU matmul, amortizing per-step overhead Lb
    times over :func:`bell_spmm_pallas` (measured: both the XLA gather path
    and the one-block-per-step kernel sit at ~1 us/grid-step)."""
    b = jnp.asarray(b)
    if b.ndim != 2 or b.shape[0] != a.n:
        raise ValueError(
            f"bell_spmm_pallas_fused: operand shape {b.shape} != ({a.n}, k)"
        )
    k = b.shape[1]
    nb, bsz, Lb = a.nb, a.bsz, a.Lb
    out_dtype = jnp.result_type(a.dtype, b.dtype)
    if a.n == 0 or Lb == 0 or k == 0:
        return jnp.zeros((a.n, k), out_dtype)
    # compute_dtype (e.g. bf16) streams blocks+panels at reduced width while
    # accumulating in out_dtype on the MXU — the mixed-precision mode
    stream_dtype = compute_dtype or out_dtype
    b3 = b.reshape(nb, bsz, k).astype(stream_dtype)
    # kernel-friendly matrix layout: row r holds [A_0 | A_1 | ...] as one
    # (bsz, Lb*bsz) tile so the contraction is a single wide matmul
    lhs = jnp.swapaxes(a.blocks, 1, 2).reshape(nb, bsz, Lb * bsz).astype(
        stream_dtype
    )

    def kernel(cols_ref, lhs_ref, *rest):
        panel_refs, o_ref = rest[:-1], rest[-1]
        acc = jax.lax.dot_general(
            lhs_ref[0, :, 0:bsz],
            panel_refs[0][0],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=o_ref.dtype,
        )
        for l in range(1, len(panel_refs)):
            acc += jax.lax.dot_general(
                lhs_ref[0, :, l * bsz : (l + 1) * bsz],
                panel_refs[l][0],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=o_ref.dtype,
            )
        o_ref[...] = acc[None]

    def panel_spec(l):
        # NOTE: the prefetch array is flattened 1-D — 2-D SMEM operands are
        # lane-padded to 128 columns and overflow the ~1MB SMEM budget at
        # large nb (measured: (15625, 5) i32 allocates 8MB padded)
        return pl.BlockSpec(
            (1, bsz, k), lambda r, cols, l=l: (cols[r * Lb + l], 0, 0)
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=[pl.BlockSpec((1, bsz, Lb * bsz), lambda r, cols: (r, 0, 0))]
        + [panel_spec(l) for l in range(Lb)],
        out_specs=pl.BlockSpec((1, bsz, k), lambda r, cols: (r, 0, 0)),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nb, bsz, k), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * nb * Lb * bsz * bsz * k,
            bytes_accessed=nb * (bsz * Lb * bsz + Lb * bsz * k + bsz * k) * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(a.cols.reshape(-1), lhs, *([b3] * Lb))
    return out.reshape(a.n, k)


def bell_smvm_pallas(a: BELL, v: jax.Array, *, row_tile: int = 4,
                     interpret: bool = False) -> jax.Array:
    """Pallas blocked-ELL SpMV: ``row_tile`` block rows per grid step, each
    window's operand chunk DMA'd via scalar-prefetched column ids; blocks
    stream in their stored layout (the XLA einsum path pays a full
    layout-transpose copy of the block array).  In-step math is a
    lane-reduced broadcast multiply per (row, window).

    Status: correctness-validated (interpreter mode); hardware profiling
    pending — the per-step DMA count (row_tile * Lb chunks of bsz floats)
    may be latency-bound at small bsz; prefer ``bell_smvm`` until measured.
    """
    v = jnp.asarray(v)
    if v.shape != (a.n,):
        raise ValueError(f"bell_smvm_pallas: vector shape {v.shape} != ({a.n},)")
    nb, bsz, Lb = a.nb, a.bsz, a.Lb
    out_dtype = jnp.result_type(a.dtype, v.dtype)
    if a.n == 0 or Lb == 0:
        return jnp.zeros((a.n,), out_dtype)
    rt = max(1, row_tile)
    nb_pad = -(-nb // rt) * rt
    cols = a.cols
    blocks = a.blocks.astype(out_dtype)
    if nb_pad != nb:
        cols = jnp.concatenate(
            [cols, jnp.zeros((nb_pad - nb, Lb), cols.dtype)]
        )
        blocks = jnp.concatenate(
            [blocks, jnp.zeros((nb_pad - nb, Lb, bsz, bsz), blocks.dtype)]
        )
    # unit middle axis so the chunk block's trailing dims equal the array's
    # (Mosaic requires trailing block dims divisible by (8, 128) OR equal to
    # the full array dims)
    v2 = v.reshape(nb, 1, bsz).astype(out_dtype)

    def kernel(cols_ref, blk_ref, *rest):
        chunk_refs, o_ref = rest[:-1], rest[-1]
        for i in range(rt):
            acc = jnp.zeros((bsz,), o_ref.dtype)
            for l in range(Lb):
                c = chunk_refs[i * Lb + l][0, 0]  # (bsz,)
                acc = acc + jnp.sum(blk_ref[i, l] * c[None, :], axis=1)
            o_ref[i, :] = acc

    def chunk_spec(i, l):
        return pl.BlockSpec(
            (1, 1, bsz),
            lambda r, cols, i=i, l=l: (cols[(r * rt + i) * Lb + l], 0, 0),
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb_pad // rt,),
        in_specs=[
            pl.BlockSpec((rt, Lb, bsz, bsz), lambda r, cols: (r, 0, 0, 0))
        ]
        + [chunk_spec(i, l) for i in range(rt) for l in range(Lb)],
        out_specs=pl.BlockSpec((rt, bsz), lambda r, cols: (r, 0)),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nb_pad, bsz), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * nb_pad * Lb * bsz * bsz,
            bytes_accessed=nb_pad * Lb * (bsz * bsz + bsz) * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(cols.reshape(-1), blocks, *([v2] * (rt * Lb)))
    return out[:nb].reshape(a.n)


def build_window_plan(a: BELL, row_tile: int = 8, max_window: int = 64):
    """Eager plan for :func:`bell_spmm_pallas_windowed`: per-tile operand
    granule ids + per-slot local offsets.  Returns None when some row tile's
    block-column span exceeds ``max_window`` (fall back to the fused kernel).
    """
    import dataclasses as _dc

    import numpy as np

    nb, Lb = a.nb, a.Lb
    rt = max(1, row_tile)
    nb_pad = -(-max(nb, 1) // rt) * rt
    ntiles = nb_pad // rt
    cols_h = np.zeros((nb_pad, Lb), np.int64)
    cols_h[:nb] = np.asarray(a.cols)
    blocks_h = np.asarray(a.blocks)
    slot_valid = np.zeros((nb_pad, Lb), bool)
    slot_valid[:nb] = np.any(blocks_h != 0, axis=(2, 3))
    U = 1
    lo_t = np.zeros(ntiles, np.int64)
    for t in range(ntiles):
        v = slot_valid[t * rt : (t + 1) * rt]
        c = cols_h[t * rt : (t + 1) * rt][v]
        if c.size:
            lo_t[t] = int(c.min())
            U = max(U, int(c.max()) - int(c.min()) + 1)
    if U > max_window:
        return None
    n_gran = -(-max(nb, 1) // U)
    gran = np.minimum(lo_t // U, max(n_gran - 2, 0)).astype(np.int32)
    offs = np.where(
        slot_valid, cols_h - (gran.astype(np.int64) * U).repeat(rt)[:, None], 0
    ).astype(np.int32)
    offs = np.clip(offs, 0, 2 * U - 1)
    return WindowPlan(
        offs=jnp.asarray(offs.reshape(-1)),
        gran=jnp.asarray(gran),
        U=U,
        rt=rt,
        n_gran=n_gran,
    )


@_wp_register
@_wp_dataclass(frozen=True)
class WindowPlan:
    """Static window plan (pytree: offs/gran are data, sizes are meta)."""

    offs: jax.Array
    gran: jax.Array
    U: int
    rt: int
    n_gran: int


def bell_spmm_pallas_windowed(a: BELL, b: jax.Array, plan: "WindowPlan",
                              *, interpret: bool = False) -> jax.Array:
    """Window-fused SpMM for matrices with column locality (banded/FEM).

    Per grid step (``plan.rt`` block rows), TWO aligned DMAs bring the
    contiguous granule range of operand panels covering every block column
    the tile touches (BlockSpec indices are block-granular, so the window is
    realized as two consecutive U-panel granules); blocks then select their
    panel by a scalar-prefetched local offset.  For a band of half-width h
    this cuts operand traffic from ``rt * Lb`` panels per tile to
    ``2U ~ 2(rt + 2h)`` — approaching pure streaming.

    Build ``plan`` once per pattern with :func:`build_window_plan`;
    jit-compatible with the plan passed/captured (its sizes are static).

    Status: correctness-validated (interpreter mode).  Earlier variants
    (per-slot small matmuls) measured 15.5-15.9 ms at 80M nnz — tied with
    the fused kernel, bound by small serial MXU issues; this version does
    one wide matmul per block row, with on-chip measurement still pending
    (remote-chip congestion at round end).  The fused kernel remains the
    default inside ``bell_spmm``.
    """
    b = jnp.asarray(b)
    if b.ndim != 2 or b.shape[0] != a.n:
        raise ValueError(
            f"bell_spmm_pallas_windowed: operand shape {b.shape} != ({a.n}, k)"
        )
    k = b.shape[1]
    nb, bsz, Lb = a.nb, a.bsz, a.Lb
    out_dtype = jnp.result_type(a.dtype, b.dtype)
    if a.n == 0 or Lb == 0 or k == 0:
        return jnp.zeros((a.n, k), out_dtype)
    U, rt, n_gran = plan.U, plan.rt, plan.n_gran
    nb_pad = -(-nb // rt) * rt
    ntiles = nb_pad // rt

    # row-major wide layout [A_0 | A_1 | ...] per block row: one
    # (bsz, Lb*bsz) @ (Lb*bsz, k) matmul per row instead of Lb small ones
    # (small serial MXU issues dominate the per-step time, measured)
    lhs = jnp.swapaxes(a.blocks, 1, 2).reshape(nb, bsz, Lb * bsz).astype(
        out_dtype
    )
    if nb_pad != nb:
        lhs = jnp.concatenate(
            [lhs, jnp.zeros((nb_pad - nb, bsz, Lb * bsz), lhs.dtype)]
        )
    # pad the operand so granules g and g+1 always exist
    nb_gran_pad = (n_gran + 1) * U
    b3 = b.reshape(nb, bsz, k).astype(out_dtype)
    b3 = jnp.concatenate(
        [b3, jnp.zeros((nb_gran_pad - nb, bsz, k), b3.dtype)]
    )

    def kernel(offs_ref, gran_ref, blk_ref, p0_ref, p1_ref, o_ref, scr_ref):
        # stage the two granules into one contiguous VMEM window so each
        # slot needs a single dynamic slice
        t = pl.program_id(0)
        scr_ref[0:U] = p0_ref[...]
        scr_ref[U : 2 * U] = p1_ref[...]
        for i in range(rt):
            rhs = jnp.concatenate(
                [
                    scr_ref[offs_ref[(t * rt + i) * Lb + l]]
                    for l in range(Lb)
                ],
                axis=0,
            )  # (Lb*bsz, k)
            o_ref[i] = jax.lax.dot_general(
                blk_ref[i],
                rhs,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=o_ref.dtype,
            )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(ntiles,),
        in_specs=[
            pl.BlockSpec(
                (rt, bsz, Lb * bsz), lambda t, offs, gran: (t, 0, 0)
            ),
            pl.BlockSpec((U, bsz, k), lambda t, offs, gran: (gran[t], 0, 0)),
            pl.BlockSpec(
                (U, bsz, k), lambda t, offs, gran: (gran[t] + 1, 0, 0)
            ),
        ],
        out_specs=pl.BlockSpec((rt, bsz, k), lambda t, offs, gran: (t, 0, 0)),
        scratch_shapes=[pltpu.VMEM((2 * U, bsz, k), out_dtype)],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nb_pad, bsz, k), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * nb_pad * Lb * bsz * bsz * k,
            bytes_accessed=nb_pad * (Lb * bsz * bsz + bsz * k) * 4
            + ntiles * 2 * U * bsz * k * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(plan.offs, plan.gran, lhs, b3, b3)
    return out[:nb].reshape(a.n, k)
