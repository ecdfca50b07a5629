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
from .segmented import IDXMAP_ZERO as _Z



_wp_dataclass = _wp_dc.dataclass

__all__ = ["bell_spmm_pallas", "bell_spmm_pallas_fused",
           "build_banded_plan", "BandedPlan", "bell_spmm_pallas_banded",
           "banded_spmm_hbm_bytes", "BandedKitT", "bell_banded_prepare_t",
           "bell_spmm_pallas_banded_t", "banded_spmm_t_hbm_bytes",
           "bell_banded_refresh"]


def _make_kernel(prec):
    def _kernel(cols_ref, blk_ref, panel_ref, o_ref):
        @pl.when(pl.program_id(1) == 0)
        def _():
            o_ref[...] = jnp.zeros_like(o_ref)

        o_ref[...] += jax.lax.dot_general(
            blk_ref[0, 0],
            panel_ref[0],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=o_ref.dtype,
            precision=prec,
        )[None]

    return _kernel


def bell_spmm_pallas(a: BELL, b: jax.Array, *, precision=None,
                     interpret: bool = False) -> jax.Array:
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
                (1, 1, bsz, bsz), lambda r, l, cols: (r, l, _Z, _Z)
            ),
            pl.BlockSpec(
                (1, bsz, k), lambda r, l, cols: (cols[r * Lb + l], _Z, _Z)
            ),
        ],
        out_specs=pl.BlockSpec((1, bsz, k), lambda r, l, cols: (r, _Z, _Z)),
    )
    out = pl.pallas_call(
        _make_kernel(_resolve_precision(precision, out_dtype)),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nb, bsz, k), out_dtype),
        interpret=interpret,
    )(a.cols.reshape(-1), blocks, b3)
    return out.reshape(a.n, k)


def _resolve_precision(precision, stream_dtype):
    """Correct-by-default MXU precision: full f32 passes for f32 streams
    (the MXU's default single bf16 pass loses ~3 decimal digits — measured
    1.2e-2 relative on the bench matrix, far outside the library's f32
    contract); explicit ``compute_dtype=bf16`` or ``precision=`` opts into
    the fast path.  ``precision="bf16x3"`` selects the in-kernel 3-pass
    split (:func:`_dot_bf16x3`) — Mosaic implements neither
    ``Precision.HIGH`` nor the ``DotAlgorithmPreset`` spellings, so the
    split is done by hand."""
    if precision is not None:
        return precision
    if jnp.dtype(stream_dtype) == jnp.float32:
        return jax.lax.Precision.HIGHEST
    return None


def _dot_bf16x3(x, w, out_dtype):
    """3-pass bf16 emulation of an f32 matmul (~HIGH precision): split each
    operand into a bf16 high part and a bf16 residual, drop the lo@lo term.
    Relative error ~2^-21 vs HIGHEST's ~2^-24; 3 MXU passes vs 6."""
    xh = x.astype(jnp.bfloat16)
    xl = (x - xh.astype(jnp.float32)).astype(jnp.bfloat16)
    wh = w.astype(jnp.bfloat16)
    wl = (w - wh.astype(jnp.float32)).astype(jnp.bfloat16)
    dn = (((1,), (0,)), ((), ()))
    dot = lambda p, q: jax.lax.dot_general(
        p, q, dimension_numbers=dn, preferred_element_type=out_dtype
    )
    return dot(xh, wh) + dot(xh, wl) + dot(xl, wh)


def _tile_dot(x, w, out_dtype, prec):
    if prec == "bf16x3":
        return _dot_bf16x3(x, w, out_dtype)
    return jax.lax.dot_general(
        x,
        w,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=out_dtype,
        precision=prec,
    )


def bell_spmm_pallas_fused(a: BELL, b: jax.Array, *,
                           compute_dtype=None, precision=None,
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

    prec = _resolve_precision(precision, stream_dtype)

    def kernel(cols_ref, lhs_ref, *rest):
        panel_refs, o_ref = rest[:-1], rest[-1]
        acc = jax.lax.dot_general(
            lhs_ref[0, :, 0:bsz],
            panel_refs[0][0],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=o_ref.dtype,
            precision=prec,
        )
        for l in range(1, len(panel_refs)):
            acc += jax.lax.dot_general(
                lhs_ref[0, :, l * bsz : (l + 1) * bsz],
                panel_refs[l][0],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=o_ref.dtype,
                precision=prec,
            )
        o_ref[...] = acc[None]

    def panel_spec(l):
        # NOTE: the prefetch array is flattened 1-D — 2-D SMEM operands are
        # lane-padded to 128 columns and overflow the ~1MB SMEM budget at
        # large nb (measured: (15625, 5) i32 allocates 8MB padded)
        return pl.BlockSpec(
            (1, bsz, k), lambda r, cols, l=l: (cols[r * Lb + l], _Z, _Z)
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=[pl.BlockSpec((1, bsz, Lb * bsz), lambda r, cols: (r, _Z, _Z))]
        + [panel_spec(l) for l in range(Lb)],
        out_specs=pl.BlockSpec((1, bsz, k), lambda r, cols: (r, _Z, _Z)),
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


_bp_register = _wp_partial(
    jax.tree_util.register_dataclass,
    data_fields=["offs", "start", "rel", "sup"],
    meta_fields=["W", "rt", "S", "SW"],
)


@_bp_register
@_wp_dataclass(frozen=True)
class BandedPlan:
    """Static plan for :func:`bell_spmm_pallas_banded` (pytree: offs/start/
    rel/sup are data, sizes are meta).

    The super-tile fields (``S > 1``) group ``S`` consecutive row tiles into
    one grid step sharing a single ``SW``-panel operand window: band overlap
    means adjacent tiles' windows are mostly the same panels, so one wide
    window DMA replaces ``S`` overlapping ones (~40%% less operand traffic at
    the bench band) and the per-step overhead amortizes ``S``x further.
    Each tile's ``W``-panel slice starts ``rel[i]`` panels into its group's
    window (a cheap dynamic *sublane* slice in VMEM)."""

    offs: jax.Array  # (nb_pad,) int32: row's window offset (first col - start)
    start: jax.Array  # (ntiles,) int32: first operand panel of each tile
    rel: jax.Array  # (ntiles,) int32: tile window offset within super-window
    sup: jax.Array  # (ntiles//S,) int32: super-window start panel
    W: int  # window width in panels
    rt: int  # block rows per grid step
    S: int  # row tiles per grid step (1 = per-tile kernel)
    SW: int  # super-window width in panels


def build_banded_plan(a: BELL, row_tile: int = 8,
                      max_window: int = 64,
                      max_super_window: int = 128,
                      slot_valid=None,
                      align_start: bool = False) -> "BandedPlan | None":
    """Plan for matrices whose rows store *consecutive* block columns
    (bands / FEM meshes after BELL layout, where slots are col-sorted with
    zero-padding at the end).  Returns None when some row's valid slots are
    not a consecutive ascending run, or the per-tile window would exceed
    ``max_window`` panels — callers fall back to the fused kernel.

    ``slot_valid`` (optional, host ``(nb, Lb)`` bool): marks the stored
    (non-padding) slots.  Without it the planner derives validity from
    ``a.blocks != 0`` — which pulls the whole block array back to the host
    (320 MB at the bench size, a multi-minute stall through a remote-device
    tunnel).  Callers that know the layout (e.g. they just built the BELL
    from host data) should pass it.
    """
    import numpy as np

    nb, Lb, bsz = a.nb, a.Lb, a.bsz
    rt = max(1, row_tile)
    if nb == 0 or Lb == 0:
        return None
    # aligned plans pad the tile count to a multiple of 8 so the super-tile
    # grouping always has a dividing candidate (e.g. rt=4 on the bench band
    # gives a prime 3907 tiles otherwise); pad tiles are empty rows
    nb_pad = (-(-nb // (rt * 8)) * (rt * 8) if align_start
              else -(-nb // rt) * rt)
    ntiles = nb_pad // rt
    cols_h = np.zeros((nb_pad, Lb), np.int64)
    cols_h[:nb] = np.asarray(a.cols)
    if slot_valid is None:
        blocks_h = np.asarray(a.blocks)
        slot_valid_in = np.any(blocks_h != 0, axis=(2, 3))
    else:
        slot_valid_in = np.asarray(slot_valid, bool)
        if slot_valid_in.shape != (nb, Lb):
            raise ValueError(
                f"build_banded_plan: slot_valid shape {slot_valid_in.shape}"
                f" != ({nb}, {Lb})"
            )
    slot_valid = np.zeros((nb_pad, Lb), bool)
    slot_valid[:nb] = slot_valid_in
    # valid slots must be a prefix (padding at the end) with cols c0, c0+1, ...
    nvalid = slot_valid.sum(axis=1)
    idx = np.arange(Lb)[None, :]
    if np.any(slot_valid & (idx >= nvalid[:, None])):
        return None  # valid slots are not a prefix
    first = cols_h[:, 0].copy()
    first[nvalid == 0] = 0
    expect = first[:, None] + idx
    if np.any(slot_valid & (cols_h != expect)):
        return None  # not consecutive ascending
    # tile start = min first over rows that store anything (empty rows —
    # incl. the nb_pad tail — follow their tile's start with offset 0)
    big = np.where(nvalid > 0, first, np.iinfo(np.int64).max).reshape(
        ntiles, rt
    )
    start = big.min(axis=1)
    empty = start == np.iinfo(np.int64).max
    if empty.any():
        if empty.all():
            start[:] = 0
        else:
            # empty tiles (padding, empty row blocks) follow their nearest
            # non-empty neighbour instead of 0: a 0 start in the tail group
            # blows the super-tile window span to ~nb (observed: pad tiles
            # forced S=1 on the bench band)
            nz = np.flatnonzero(~empty)
            idx = np.searchsorted(nz, np.arange(ntiles), side="right") - 1
            start = start[nz[np.clip(idx, 0, nz.size - 1)]]
    import math

    lane_q = 128 // math.gcd(bsz, 128)
    if align_start:
        # the transposed kernel's operand window offset is start*bsz LANES;
        # Mosaic requires lane-dim Element offsets divisible by 128, i.e.
        # start divisible by lane_q (real-compile requirement — jax.export
        # lowering does NOT catch a violation)
        start = (start // lane_q) * lane_q
    first[nvalid == 0] = start.repeat(rt)[nvalid == 0]
    W = int((first.reshape(ntiles, rt) - start[:, None]).max()) + Lb
    # lane alignment: the densified tile's trailing dim is W*bsz — keep it a
    # multiple of 128 or Mosaic pads/relayouts every step (measured: W*bsz =
    # 288 ran ~20x slower than 384)
    W = -(-W // lane_q) * lane_q
    if align_start:
        # aligned starts cannot in general satisfy start + W <= nb when nb
        # is not lane_q-aligned (start = nb - W would be unaligned), so the
        # transposed kernel reads a PADDED operand of nb_pad panels —
        # nb_pad = ntiles*rt is a lane_q multiple (rt*bsz % 128 == 0
        # implies lane_q | rt) and equals the kernel's padded OUTPUT
        # length, so chained calls feed C^T straight back.  Clamping to
        # nb_pad - W keeps coverage exact: start_c + W = nb_pad >= nb for
        # every clamped tile, and offs + Lb <= W always.
        if W > nb_pad:
            W = nb_pad  # tiny matrix: one whole-operand window
        if W > max_window:
            return None
        start = np.minimum(start, nb_pad - W)
    else:
        if W > max_window or W > nb:
            return None
        # clamp each window into [0, nb - W]: the operand is then read
        # unpadded (no per-call pad copy).  Safe: every VALID block's column
        # c satisfies c <= nb - 1, so its densified position (c - start)*bsz
        # stays inside the W-panel window after clamping.
        start = np.minimum(start, nb - W)
    offs = (first - start.repeat(rt)).astype(np.int32)
    # super-tile grouping: largest S with the group window within budget.
    # Correctness invariant (kernel slices rel*bsz .. rel*bsz + W*bsz of the
    # super-window): rel = start - sup with sup = min(group min, nb - SW),
    # so 0 <= rel and rel + W <= SW (start <= nb - W from the clamp above).
    S, SW = 1, W
    sup = start.copy()
    rel = np.zeros(ntiles, np.int64)
    # aligned plans clamp into the rt-padded panel range (see above); sup
    # and rel stay lane_q multiples automatically (min/differences of
    # aligned values), which the transposed kernel's lane slices require
    limit = nb_pad if align_start else nb
    for cand in (8, 5, 4, 3, 2):
        if ntiles % cand:
            continue
        g = start.reshape(ntiles // cand, cand)
        sup_c = g.min(axis=1)
        span = int((g - sup_c[:, None]).max()) + W
        SW_c = -(-span // lane_q) * lane_q
        if SW_c > max_super_window or SW_c > limit:
            continue
        S, SW = cand, SW_c
        sup = np.minimum(sup_c, limit - SW)
        rel = start - sup.repeat(cand)
        break
    return BandedPlan(
        offs=jnp.asarray(offs),
        start=jnp.asarray(start.astype(np.int32)),
        rel=jnp.asarray(rel.astype(np.int32)),
        sup=jnp.asarray(sup.astype(np.int32)),
        W=W,
        rt=rt,
        S=S,
        SW=SW,
    )


def _densify_band_tiles(a: BELL, plan: "BandedPlan", stream_dtype):
    """(ntiles, rt*bsz, W*bsz) dense banded tiles from BELL blocks.

    Each block row's wide panel [A_0 | A_1 | ...] lands at column offset
    ``offs[r]*bsz`` of its tile — the block-Toeplitz band densified so the
    whole tile is ONE MXU matmul.  Pure XLA (gather + mask): under a jit
    whose loop reuses ``a`` this is computed once (loop-invariant hoisting);
    for repeated calls across jits, pass the result via
    :func:`bell_spmm_pallas_banded`'s ``tiles=`` argument.
    """
    nb, bsz, Lb = a.nb, a.bsz, a.Lb
    W, rt = plan.W, plan.rt
    nb_pad = plan.offs.shape[0]  # rt- (and, for aligned plans, S-) padded
    wide = jnp.swapaxes(a.blocks, 1, 2).reshape(nb, bsz, Lb * bsz)
    if nb_pad != nb:
        wide = jnp.concatenate(
            [wide, jnp.zeros((nb_pad - nb, bsz, Lb * bsz), wide.dtype)]
        )
    c = jnp.arange(W * bsz, dtype=jnp.int32)[None, :]
    src = c - plan.offs[:, None] * bsz
    ok = (src >= 0) & (src < Lb * bsz)
    srcc = jnp.clip(src, 0, Lb * bsz - 1)
    dense = jnp.where(
        ok[:, None, :],
        jnp.take_along_axis(
            wide,
            jnp.broadcast_to(srcc[:, None, :], (nb_pad, bsz, W * bsz)),
            axis=2,
        ),
        0,
    )
    return dense.reshape(nb_pad // rt, rt * bsz, W * bsz).astype(stream_dtype)


def bell_spmm_pallas_banded(a: BELL, b: jax.Array, plan: "BandedPlan", *,
                            compute_dtype=None, tiles: jax.Array | None = None,
                            precision=None,
                            interpret: bool = False) -> jax.Array:
    """Banded/consecutive-column SpMM: one wide MXU matmul per row tile.

    Per grid step (``plan.rt`` block rows), ONE element-offset window DMA
    (``pl.Element``) brings the ``W`` consecutive operand panels the tile
    touches, and the densified banded tile multiplies it in a single
    ``(rt*bsz, W*bsz) @ (W*bsz, k)`` matmul.  vs the fused kernel:
    ``nb/rt`` grid steps instead of ``nb`` (amortizing the ~1 us/step
    floor), full-height MXU issues, and each operand panel is fetched ~once
    (``W ~ rt + band``) instead of once per stored block — streaming-bound.
    The densified tiles cost ``W/Lb``x the packed block bytes; pass
    ``compute_dtype=jnp.bfloat16`` to stream them (and the operand) at half
    width with f32 MXU accumulation.

    Build ``plan`` with :func:`build_banded_plan` (None -> use the fused
    kernel); precompute ``tiles=_densify_band_tiles(a, plan, dt)`` to reuse
    across separately-jitted calls.
    """
    b = jnp.asarray(b)
    if b.ndim != 2 or b.shape[0] != a.n:
        raise ValueError(
            f"bell_spmm_pallas_banded: operand shape {b.shape} != ({a.n}, k)"
        )
    k = b.shape[1]
    nb, bsz, Lb = a.nb, a.bsz, a.Lb
    out_dtype = jnp.result_type(a.dtype, b.dtype)
    if a.n == 0 or Lb == 0 or k == 0:
        return jnp.zeros((a.n, k), out_dtype)
    W, rt = plan.W, plan.rt
    nb_pad = plan.offs.shape[0]
    ntiles = nb_pad // rt
    stream_dtype = jnp.dtype(compute_dtype) if compute_dtype else out_dtype
    if tiles is None:
        tiles = _densify_band_tiles(a, plan, stream_dtype)
    b3 = b.reshape(nb, bsz, k).astype(stream_dtype)

    prec = _resolve_precision(precision, stream_dtype)
    esz = jnp.dtype(stream_dtype).itemsize

    S, SW = plan.S, plan.SW
    # super-tile path: one grid step = S row tiles sharing one SW-panel
    # operand window (band overlap makes adjacent tiles' windows mostly
    # identical panels).  Guarded by a VMEM budget on the shared window.
    if S > 1 and SW * bsz * k * esz <= 6 * 1024 * 1024 and not (ntiles % S):

        def kernel_super(rel_ref, sup_ref, t_ref, win_ref, o_ref):
            t = pl.program_id(0)
            for s in range(S):
                off = rel_ref[t * S + s]
                # ref-level dynamic slice (Mosaic lowers pl.ds on refs; a
                # value-level lax.dynamic_slice does not lower for TC
                # kernels), offset in panels: rel + W <= SW by construction
                w = win_ref[pl.ds(off, W)].reshape(W * bsz, k)
                o_ref[s] = _tile_dot(t_ref[s], w, o_ref.dtype, prec)

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(ntiles // S,),
            in_specs=[
                pl.BlockSpec(
                    (S, rt * bsz, W * bsz), lambda t, rel, sup: (t, _Z, _Z)
                ),
                pl.BlockSpec(
                    (pl.Element(SW), pl.Element(bsz), pl.Element(k)),
                    lambda t, rel, sup: (sup[t], _Z, _Z),
                ),
            ],
            out_specs=pl.BlockSpec(
                (S, rt * bsz, k), lambda t, rel, sup: (t, _Z, _Z)
            ),
        )
        out = pl.pallas_call(
            kernel_super,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((ntiles, rt * bsz, k), out_dtype),
            cost_estimate=pl.CostEstimate(
                flops=2 * ntiles * rt * bsz * W * bsz * k,
                bytes_accessed=ntiles * rt * bsz * W * bsz * esz
                + (ntiles // S) * SW * bsz * k * esz
                + ntiles * rt * bsz * k * 4,
                transcendentals=0,
            ),
            interpret=interpret,
        )(plan.rel, plan.sup, tiles, b3)
        out = out.reshape(nb_pad * bsz, k)
        return out if nb_pad == nb else out[: a.n]

    def kernel(start_ref, t_ref, win_ref, o_ref):
        o_ref[0] = _tile_dot(
            t_ref[0], win_ref[...].reshape(W * bsz, k), o_ref.dtype, prec
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(ntiles,),
        in_specs=[
            pl.BlockSpec((1, rt * bsz, W * bsz), lambda t, start: (t, _Z, _Z)),
            # all dims Element (Mosaic: mixing Element/Blocked dims is
            # unsupported); axis-0 offset is in panels = elements of b3,
            # always within [0, nb - W] by plan construction
            pl.BlockSpec(
                (pl.Element(W), pl.Element(bsz), pl.Element(k)),
                lambda t, start: (start[t], _Z, _Z),
            ),
        ],
        out_specs=pl.BlockSpec((1, rt * bsz, k), lambda t, start: (t, _Z, _Z)),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((ntiles, rt * bsz, k), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * ntiles * rt * bsz * W * bsz * k,
            bytes_accessed=ntiles * (rt * bsz * W * bsz + W * bsz * k) * esz
            + ntiles * rt * bsz * k * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(plan.start, tiles, b3)
    out = out.reshape(nb_pad * bsz, k)
    return out if nb_pad == nb else out[: a.n]


_bk_register = _wp_partial(
    jax.tree_util.register_dataclass,
    data_fields=["plan", "tiles"],
    meta_fields=[],
)


@_bk_register
@_wp_dataclass(frozen=True)
class BandedKit:
    """Plan + densified tiles, prepared once per (pattern, values) with
    :func:`bell_banded_prepare` and passed to ``bell_spmm(..., plan=kit)``.

    The tiles are bound to the matrix VALUES (not just the pattern):
    re-prepare after updating ``a.blocks``.  Kept separate from the in-jit
    densify fallback because XLA compiles the densifying gather to
    scalar-gather rate (~0.14 G elem/s) when it is fused inside a loop —
    measured 4.7 s/iter vs 9.8 ms/iter at the 80M-nnz bench size."""

    plan: BandedPlan
    tiles: jax.Array


def banded_spmm_hbm_bytes(kit: "BandedKit", bsz: int, n: int, k: int,
                          out_itemsize: int = 4) -> int:
    """Actual HBM bytes one banded SpMM moves, derived from the plan: the
    densified tiles once, ONE ``SW``-panel operand window per super-step
    (the kernel's real read pattern — band overlap between adjacent tiles is
    re-read, unlike the min-traffic model's one panel per stored block), and
    the output once.  Matches the kernel's ``CostEstimate``.  Use this for
    roofline fractions; the min-traffic model stays for cross-format
    comparability but can exceed the streaming ceiling when windows overlap
    (docs/performance.md)."""
    plan = kit.plan
    esz = jnp.dtype(kit.tiles.dtype).itemsize
    ntiles = kit.tiles.shape[0]
    window_bytes = (ntiles // plan.S) * plan.SW * bsz * k * esz
    return kit.tiles.size * esz + window_bytes + n * k * out_itemsize


# -- transposed-operand banded SpMM (small k) ---------------------------------
#
# At k < 128 the standard banded kernel's operand panels (bsz, k) and output
# tiles (rt*bsz, k) have a minor dimension below the 128-lane vreg width, so
# Mosaic pads every load/store to 128 lanes: measured on the 80M-nnz bench
# band, k=32, 64, and 128 ALL take ~7.7-7.9 ms — k<128 pays k=128's traffic.
# This variant keeps n on the minor dimension instead: the operand is B^T
# (k, n), the output C^T (k, n), and each grid step computes
#   C^T[:, tile] = window(k, W*bsz) @ tile_T(W*bsz, rt*bsz)
# — every array's minor dim is a multiple of 128 (rt*bsz is forced to one),
# so k=32 moves k=32's bytes.  Callers chain in transposed space (iterative
# SpMM feeds C^T straight back as the next B^T); the one-shot wrapper pays
# two n*k transposes.


_bkt_register = _wp_partial(
    jax.tree_util.register_dataclass,
    data_fields=["plan", "tiles_t"],
    meta_fields=[],
)


@_bkt_register
@_wp_dataclass(frozen=True)
class BandedKitT:
    """Plan + TRANSPOSED densified tiles (ntiles, W*bsz, rt*bsz) for
    :func:`bell_spmm_pallas_banded_t`, from :func:`bell_banded_prepare_t`.
    Value-bound like :class:`BandedKit`."""

    plan: BandedPlan
    tiles_t: jax.Array


def bell_banded_prepare_t(a: BELL, row_tile: int | None = None,
                          max_window: int = 64,
                          compute_dtype=None,
                          slot_valid=None) -> "BandedKitT | None":
    """Eager prepare for the transposed small-k banded kernel.

    ``row_tile=None`` picks the SMALLEST rt with ``rt*bsz`` a multiple of
    128 (the kernel's output minor dim must be 128-aligned; rt need not
    divide nb — a non-dividing rt just pads the plan).  Smallest wins
    because the window width W, and with it the densified-tile traffic,
    grows ~linearly with rt (see the inline note below).  Returns None when
    the explicit rt is misaligned or the pattern is not banded."""
    import math

    nb, bsz = a.nb, a.bsz
    if row_tile is None:
        # rt*bsz must be a 128 multiple (the kernel's output minor dim); a
        # non-dividing rt just pads the plan (tail rows sliced off).  The
        # SMALLEST such rt wins: the window width W grows ~linearly with rt
        # (more rows per tile -> wider band span) and the densified tiles —
        # nb*bsz x W*bsz values, the dominant traffic — scale with W
        # (measured: rt=8 ballooned W 12 -> 20 on the bench band).
        row_tile = 128 // math.gcd(bsz, 128)
    if (row_tile * bsz) % 128:
        return None
    plan = build_banded_plan(a, row_tile=row_tile, max_window=max_window,
                             slot_valid=slot_valid, align_start=True)
    if plan is None:
        return None
    dt = jnp.dtype(compute_dtype) if compute_dtype else a.dtype
    tiles = jax.jit(_densify_band_tiles, static_argnums=(2,))(a, plan, dt)
    return BandedKitT(plan=plan, tiles_t=jnp.swapaxes(tiles, 1, 2))


def banded_spmm_t_hbm_bytes(kit: "BandedKitT", bsz: int, n: int, k: int,
                            out_itemsize: int = 4) -> int:
    """Actual HBM bytes of one transposed-banded SpMM: tiles once, one
    shared (k, SW*bsz) window per super-step (or (k, W*bsz) per tile when
    S == 1), C^T once."""
    plan = kit.plan
    esz = jnp.dtype(kit.tiles_t.dtype).itemsize
    ntiles = kit.tiles_t.shape[0]
    window_bytes = (ntiles // plan.S) * k * plan.SW * bsz * esz
    return kit.tiles_t.size * esz + window_bytes + n * k * out_itemsize


def bell_spmm_pallas_banded_t(a: BELL, bt: jax.Array, kit: "BandedKitT", *,
                              precision=None,
                              interpret: bool = False) -> jax.Array:
    """C^T = (A @ B)^T with B passed TRANSPOSED as ``bt`` (k, n); returns
    (k, n).  One (k, W*bsz) element-offset window DMA + one
    (k, W*bsz) @ (W*bsz, rt*bsz) MXU matmul per grid step.  Chain in
    transposed space to amortize the layout; ``bell_spmm`` wraps the
    transposes for one-shot calls."""
    bt = jnp.asarray(bt)
    nb, bsz = a.nb, a.bsz
    plan, tiles_t = kit.plan, kit.tiles_t
    W, rt = plan.W, plan.rt
    nb_pad = plan.offs.shape[0]
    n_pad = nb_pad * bsz
    if bt.ndim != 2 or bt.shape[1] not in (a.n, n_pad):
        raise ValueError(
            f"bell_spmm_pallas_banded_t: operand shape {bt.shape} != "
            f"(k, {a.n}) or (k, {n_pad})"
        )
    k = bt.shape[0]
    out_dtype = jnp.result_type(a.dtype, bt.dtype)
    if a.n == 0 or a.Lb == 0 or k == 0:
        return jnp.zeros((k, n_pad), out_dtype)
    stream_dtype = tiles_t.dtype
    btt = bt.astype(stream_dtype)
    if btt.shape[1] != n_pad:
        # windows are clamped into the rt-padded panel range; the padded
        # output (k, n_pad) feeds back directly in chained calls
        btt = jnp.pad(btt, ((0, 0), (0, n_pad - btt.shape[1])))
        padded_in = False
    else:
        padded_in = bt.shape[1] == n_pad
    ntiles = nb_pad // rt
    prec = _resolve_precision(precision, stream_dtype)
    esz = jnp.dtype(stream_dtype).itemsize

    S, SW = plan.S, plan.SW
    # super-tile path: S row tiles per grid step share one SW-panel operand
    # window — without it the per-tile window re-reads scale with k and the
    # kernel loses to the standard super-tile kernel at k >= 64 (measured)
    if S > 1 and SW * bsz * k * esz <= 6 * 1024 * 1024 and not (ntiles % S):

        def kernel_super(rel_ref, sup_ref, t_ref, win_ref, o_ref):
            t = pl.program_id(0)
            for s in range(S):
                # rel is a lane_q multiple by plan construction; multiple_of
                # makes the 128-divisibility provable to Mosaic
                off = pl.multiple_of(rel_ref[t * S + s] * bsz, 128)
                w = win_ref[:, pl.ds(off, W * bsz)]
                o_ref[:, s * rt * bsz:(s + 1) * rt * bsz] = _tile_dot(
                    w, t_ref[s], o_ref.dtype, prec
                )

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(ntiles // S,),
            in_specs=[
                pl.BlockSpec(
                    (S, W * bsz, rt * bsz), lambda t, rel, sup: (t, _Z, _Z)
                ),
                pl.BlockSpec(
                    (pl.Element(k), pl.Element(SW * bsz)),
                    lambda t, rel, sup: (
                        _Z, pl.multiple_of(sup[t] * bsz, 128)
                    ),
                ),
            ],
            out_specs=pl.BlockSpec(
                (k, S * rt * bsz), lambda t, rel, sup: (_Z, t)
            ),
        )
        out = pl.pallas_call(
            kernel_super,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((k, nb_pad * bsz), out_dtype),
            cost_estimate=pl.CostEstimate(
                flops=2 * ntiles * k * W * bsz * rt * bsz,
                bytes_accessed=ntiles * W * bsz * rt * bsz * esz
                + (ntiles // S) * k * SW * bsz * esz
                + nb_pad * bsz * k * 4,
                transcendentals=0,
            ),
            interpret=interpret,
        )(plan.rel, plan.sup, tiles_t, btt)
        return out if padded_in else out[:, : a.n]

    def kernel(start_ref, t_ref, win_ref, o_ref):
        o_ref[...] = _tile_dot(win_ref[...], t_ref[0], o_ref.dtype, prec)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(ntiles,),
        in_specs=[
            pl.BlockSpec((1, W * bsz, rt * bsz), lambda t, start: (t, _Z, _Z)),
            # element-offset window: lane offset start[t]*bsz into B^T.
            # starts are lane_q-aligned by the planner (align_start=True),
            # but Mosaic's window-param check needs the 128-divisibility
            # PROVABLE in the index expression itself — hence multiple_of
            # (without it: "Couldn't prove that tiling (128) divides index"
            # at real compile; jax.export lowering does not catch it)
            pl.BlockSpec(
                (pl.Element(k), pl.Element(W * bsz)),
                lambda t, start: (_Z, pl.multiple_of(start[t] * bsz, 128)),
            ),
        ],
        out_specs=pl.BlockSpec((k, rt * bsz), lambda t, start: (_Z, t)),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((k, nb_pad * bsz), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * ntiles * k * W * bsz * rt * bsz,
            bytes_accessed=ntiles * (W * bsz * rt * bsz + k * W * bsz) * esz
            + nb_pad * bsz * k * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(plan.start, tiles_t, btt)
    # a padded operand gets the padded output back (chain idiom); an
    # unpadded one gets (k, n)
    return out if padded_in else out[:, : a.n]


def bell_banded_refresh(kit: "BandedKit", a: BELL) -> "BandedKit":
    """Re-densify a banded kit's tiles from NEW block values of the SAME
    pattern (one jitted device gather; the host plan is reused) — the
    value-update companion of :func:`bell_banded_prepare`."""
    dt = kit.tiles.dtype
    tiles = jax.jit(_densify_band_tiles, static_argnums=(2,))(a, kit.plan, dt)
    return BandedKit(plan=kit.plan, tiles=tiles)


def bell_banded_prepare(a: BELL, row_tile: int | None = None,
                        max_window: int = 64,
                        compute_dtype=None,
                        slot_valid=None) -> "BandedKit | None":
    """Eagerly build the banded plan and densified tiles for ``a``.

    Returns None when the pattern is not consecutive-column (use the fused
    kernel).  ``row_tile=None`` picks the largest rt <= 8 dividing nb (a
    non-dividing rt pads the output and pays a tail-slice copy).
    ``compute_dtype=jnp.bfloat16`` stores tiles at half width (the kernel
    then also streams the operand as bf16, accumulating f32).
    ``slot_valid``: optional host (nb, Lb) bool of stored slots — see
    :func:`build_banded_plan`."""
    if row_tile is None:
        nb = a.nb
        row_tile = next((rt for rt in (8, 7, 6, 5, 4, 3, 2)
                         if nb % rt == 0), 1) if nb else 8
    plan = build_banded_plan(a, row_tile=row_tile, max_window=max_window,
                             slot_valid=slot_valid)
    if plan is None:
        return None
    dt = jnp.dtype(compute_dtype) if compute_dtype else a.dtype
    tiles = jax.jit(_densify_band_tiles, static_argnums=(2,))(a, plan, dt)
    return BandedKit(plan=plan, tiles=tiles)
