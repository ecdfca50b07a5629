"""Pallas unstructured CSR SpMV: VMEM-resident operand + sublane gather.

The reference's ``smvm`` hot loop is one scalar gather + FMA per stored
entry (``v[col_idx[...]]``, compressed.fut:134-146).  XLA executes scalar
gathers from HBM at ~7 ns each (~0.14 Gnnz/s, docs/performance.md) — far
from roofline.  This kernel keeps the WHOLE operand vector *and* the whole
output resident in VMEM and turns the per-entry gather into one Mosaic
``tpu.dynamic_gather`` (``jnp.take_along_axis`` along sublanes) per 1024
entries:

* nnz are tiled host-side by ``(8-row block, 1024-column window)``
  (:func:`build_seg_tiles`).  Windows are lane-aligned (multiples of 128)
  but start at each row block's first column, so banded/clustered patterns
  get dense tiles.  Within a tile, the entry for column ``c`` sits at lane
  ``c % 128`` carrying a sublane pointer ``q = c//128 - window_base`` in
  [0, 8); the gathered value at lane ``l`` is ``window[q[i, l], l]``.
* Tiles stream ``vals``/``q`` in (8, 128) blocks, ``_K`` tiles per grid
  step; the operand window is a dynamic 8-sublane slice of the resident
  vector; products lane-reduce to the 8 row sums, accumulated straight
  into the VMEM-resident output — no scatter, no output windows.
* Lane conflicts (two entries of one row with equal ``c % 128`` inside the
  same window) spill into extra tiles for the same (row block, window).

Cost: ~46-60 ns per (8,128) slot vreg (measured — the per-vreg issue cost
is the wall; slices, RMWs, selects and the lane-reduce all measured as
non-bottlenecks individually) and 5 B/slot of HBM traffic, paying the
tile fill ratio (pattern-dependent, reported as ``plan.fill``) over the
ideal 4 B/nnz — vs 7 ns/nnz flat for XLA.  The plan (:class:`SegTilePlan`)
is static per pattern; apply is fully jit-compatible.  Capacity: operand +
output must fit VMEM (n + m <= ~2M f32); larger problems fall back to the
XLA path in :func:`csr_smvm_auto`, as do patterns whose fill is so low
that tile streaming would lose to scalar gathers.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..formats.csr import CSR
from .segmented import IDXMAP_ZERO as _Z



__all__ = [
    "SegTilePlan",
    "build_seg_tiles",
    "csr_smvm_segtile",
    "seg_tiles_refresh",
    "segtile_apply",
    "csr_smvm_auto",
    "segtile_hbm_bytes",
    "segtile_issue_seconds",
]

# Measured per-vreg issue cost of the segment-tile kernel on the v5e
# (docs/performance.md, rounds 2-4): ~46 ns per (8, 128) slot vreg at
# wsub=8, +~8.7 ns per extra 8-sublane gather chunk of wider windows.
# These feed utils.stats.nnz_roofline's issue_s floor — the kernel is
# ISSUE-bound, not bandwidth-bound, so its plan ceiling is vregs * cost.
SEGTILE_NS_PER_VREG = 46.0
SEGTILE_NS_PER_EXTRA_CHUNK = 8.7

_LANES = 128
_TILE_CAP = 102_400  # tiles per pallas_call (SMEM prefetch budget: 2 tables)
_K = 512  # 8-row tiles per grid step at production sizes (see _k_step)


def _k_step(rows: int, n_real: int = 1 << 30) -> int:
    """Tiles per grid step.  Bigger steps give the batched two-phase kernel
    body longer independent-op runs for Mosaic to schedule: measured on the
    10M-nnz band, 64 -> 128 -> 256 -> 512 tiles/step ran 8.99 -> 8.79 ->
    8.40 -> 8.24 ms (1024 blows the unrolled-body compile budget).  Small
    plans keep a 64-tile step so tiny matrices don't pad to 512 inert
    tiles, and TINY plans (< 64 real tiles — test fixtures, trivial
    matrices) a 16-tile step: the unrolled body compiles ~4x faster and
    the extra grid steps cost ~a microsecond where performance is moot."""
    base = _K if n_real >= 4 * _K else (64 if n_real >= 64 else 16)
    return max(base * 8 // rows, 1)


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["vals", "q", "seg_of", "rb", "pos", "eidx"],
    meta_fields=["n", "m", "n_tiles", "fill", "chunks", "wsub", "rows",
                 "kstep"],
)
@dataclasses.dataclass(frozen=True)
class SegTilePlan:
    """Static segment-tile layout of a CSR pattern (+ values).

    ``vals``: (n_tiles, rows, 128) slot values; ``q``: int8 sublane pointers
    in [0, wsub); ``seg_of``: (n_tiles,) window base sublane into the
    resident operand; ``rb``: (n_tiles,) global output row block;
    ``chunks``: static (group0, group1) ranges per pallas_call (SMEM
    prefetch budget); ``wsub``: operand window height in sublanes (the
    window covers ``wsub * 128`` operand columns); ``rows``: row-block
    height (8 = one VPU vreg of rows per tile; 32 = the super-block kernel,
    4 vregs sharing one window slice and one output RMW).  ``fill`` is the
    nnz / slot occupancy ratio (diagnostic + dispatch)."""

    vals: jax.Array
    q: jax.Array
    seg_of: jax.Array
    rb: jax.Array
    n: int
    m: int
    n_tiles: int
    fill: float
    chunks: tuple
    wsub: int = 8
    rows: int = 8
    kstep: int = 64  # tiles per grid step (baked into chunks/padding)
    # retained by build_seg_tiles(refreshable=True): sorted slot positions
    # + source entry ids, so seg_tiles_refresh re-binds VALUES in one
    # device gather instead of re-running the host layout pass
    pos: jax.Array | None = None
    eidx: jax.Array | None = None


def build_seg_tiles(a: CSR, wsub: int = 8, rows: int = 8,
                    layout: str = "ff",
                    refreshable: bool = False) -> SegTilePlan:
    """Host-side tiling of a CSR matrix (eager, once per pattern+values).

    Entries of each ``rows``-row block are bucketed by ``wsub*128``-column
    window anchored at the block's first column (lane-aligned); within a
    bucket, entry (r, c) occupies slot (r % rows, c % 128) of the bucket's
    current tile, spilling to a fresh tile when the slot is taken (same
    row+lane, different sublane) — the sum over spill tiles restores the
    exact per-row total.  The tile count is padded to a multiple of the
    grid-step tile count with inert zero tiles.  The padded slot arrays are
    assembled on device (one scatter) — shipping them pre-built from the
    host costs ~30x more transfer.

    ``wsub`` (8, 16, or 32) trades per-tile gather cost for tile count:
    wider windows pack patterns whose row blocks span more than
    ``wsub*128`` columns into fewer, fuller tiles (e.g. a +-1000 band at 20
    nnz/row measures fill 0.045 at wsub=8 under first-fit; the block's
    ~2000-column span fits one wsub=16 window at fill 0.066).
    ``wsub="auto"`` runs the cheap symbolic sweep for all three widths
    and picks the argmin of ``tiles * (1 + 0.05 * extra_chunk_pairs)`` —
    re-measured in round 5: a wider window at equal tile count costs only
    ~1-5%% on the two-phase kernel, so widening pays for nearly any tile
    cut (docs/performance.md "Auto-widening retune").

    ``rows`` (8 or 32): row-block height.  32 packs 4 VPU vregs per tile
    sharing one window slice and one output RMW; measured on the 10M-nnz
    band it LOSES to 8 (same ~47-55 ns per vreg — slices/RMWs are fully
    pipelined — but worse fill from the wider column span), so 8 is the
    production height.

    ``layout``: ``"ff"`` (default, round 4) — greedy first-fit packing:
    per block, entries visit open tiles in (column, row) order and land in
    the first whose window covers them and whose slot is free; straddle
    windows merge and spills pool, measured ~25%% fewer tiles than
    ``"rigid"`` (the round-2/3 anchor-partitioned windows + spill tiers,
    kept for A/B).
    """
    if rows not in (8, 32):
        raise ValueError(f"build_seg_tiles: rows must be 8 or 32, got {rows}")
    if layout not in ("ff", "rigid"):
        raise ValueError(
            f"build_seg_tiles: layout must be 'ff' or 'rigid', got {layout}"
        )
    if wsub == "auto":
        from ..native.plansort import seg_tile_layout as _stl
        from ..native.plansort import seg_tile_layout_ff as _stl_ff

        _sweep = _stl if layout == "rigid" else _stl_ff
        indptr_a = np.asarray(a.indptr)
        cols_a = np.asarray(a.indices)[: int(indptr_a[-1])]
        # relative cost model, re-measured round 5: at EQUAL tile counts a
        # wider window costs only ~1-5% per extra 8-sublane chunk pair
        # (band 16->32 same tiles: +1.4%; poisson 8->32 per-tile: +13% over
        # 3 chunks) — the round-4 8.7 ns/chunk surcharge predates the
        # two-phase emission and over-penalized widening (it left poisson
        # at wsub=8: 14.84 ms vs 13.19 at 32).  Pick the argmin of
        # tiles * (1 + 0.05 * chunk_pairs); ties keep the narrower window.
        best, best_cost = 8, None
        for cand in (8, 16, 32):
            res = _sweep(indptr_a, cols_a, cand, rows=rows)
            if res is None:
                continue
            cost = res[2].size * (1 + 0.05 * (cand // 8 - 1))
            if best_cost is None or cost < best_cost:
                best, best_cost = cand, cost
        wsub = best
    if wsub not in (8, 16, 32):
        raise ValueError(f"build_seg_tiles: wsub must be 8, 16, or 32, got {wsub}")
    n, m = a.shape
    R = rows
    indptr = np.asarray(a.indptr)
    cols = np.asarray(a.indices).astype(np.int64)
    nnz = int(indptr[-1])
    nbR = -(-max(n, 1) // R)
    cols = cols[:nnz]

    if layout == "ff":
        from ..native.plansort import seg_tile_layout_ff, seg_tile_layout_ff_py

        res = seg_tile_layout_ff(indptr, cols, wsub, rows=R) if nnz else None
        if res is None:
            res = seg_tile_layout_ff_py(indptr, cols, wsub, rows=R)
        pos_src, sub_src, t_base, t_rb = res
        return _finish_plan(a, n, m, nnz, wsub, R, pos_src, sub_src, None,
                            t_base, t_rb, t_base.size, full_sort=True,
                            refreshable=refreshable)

    # fast path: the whole bucketing sweep in native code (one O(nnz) pass;
    # bit-identical tile numbering, pinned by tests).  This host's NumPy
    # runs the ~30-array-pass fallback below at ~60 s per 2M nnz.
    from ..native.plansort import seg_tile_layout

    native = seg_tile_layout(indptr, cols, wsub, rows=R) if nnz else None
    if native is not None:
        pos_src, sub_src, t_base, t_rb = native
        n_real = t_base.size
        return _finish_plan(a, n, m, nnz, wsub, R, pos_src, sub_src, None,
                            t_base, t_rb, n_real, refreshable=refreshable)

    row_ids = np.repeat(np.arange(n, dtype=np.int64), np.diff(indptr))
    rsh = R.bit_length() - 1  # log2(R)
    rb = row_ids >> rsh

    # window anchor: each row block's first (lane-aligned) column
    minc = np.full(nbR, np.iinfo(np.int64).max)
    np.minimum.at(minc, rb, cols)
    anchor_sub = np.where(minc == np.iinfo(np.int64).max, 0, minc >> 7)
    win = ((cols >> 7) - anchor_sub[rb]) // wsub  # wsub*128-col window index
    base = anchor_sub[rb] + win * wsub  # window base sublane
    sub = (cols >> 7) - base  # in [0, wsub)
    lane = cols & (_LANES - 1)

    # sort by (rb, win, row, lane, sub): one fused-u64-key radix argsort
    # (native, sparse_tpu.native.plansort) when the key fits, else lexsort.
    # rows within a block differ only in ri = row & (R-1), so (rb, row) ==
    # (rb, ri) under the rb-major order.
    nwin = int(win.max()) + 1 if nnz else 1
    if nnz and nbR * nwin * R * 128 * wsub < (1 << 62):
        from ..native.plansort import argsort_u64

        key = ((((rb * nwin + win) * R + (row_ids & (R - 1))) * 128 + lane)
               * wsub + sub).astype(np.uint64)
        order = argsort_u64(key)
    else:
        order = np.lexsort((sub, lane, row_ids, win, rb))
    rb_o, win_o, lane_o = rb[order], win[order], lane[order]
    rows_o, sub_o = row_ids[order], sub[order]
    base_o = base[order]
    ri = rows_o & (R - 1)

    # spill tiers: k-th entry of a (rb, win, row, lane) group -> tile k
    ne = rb_o.size
    if ne:
        grp = np.empty(ne, np.bool_)
        grp[0] = True
        grp[1:] = (
            (rb_o[1:] != rb_o[:-1]) | (win_o[1:] != win_o[:-1])
            | (rows_o[1:] != rows_o[:-1]) | (lane_o[1:] != lane_o[:-1])
        )
        tier = np.arange(ne) - np.maximum.accumulate(
            np.where(grp, np.arange(ne), -1)
        )
        # number tiles in (rb, win, tier) order
        T = int(tier.max()) + 1
        if nbR * nwin * T < (1 << 62):
            from ..native.plansort import argsort_u64

            order2 = argsort_u64(
                ((rb_o * nwin + win_o) * T + tier).astype(np.uint64)
            )
        else:
            order2 = np.lexsort((tier, win_o, rb_o))
        key_change = np.empty(ne, np.bool_)
        key_change[0] = True
        key_change[1:] = (
            (rb_o[order2][1:] != rb_o[order2][:-1])
            | (win_o[order2][1:] != win_o[order2][:-1])
            | (tier[order2][1:] != tier[order2][:-1])
        )
        tile_id_sorted = np.cumsum(key_change) - 1
        tile_of = np.empty(ne, np.int64)
        tile_of[order2] = tile_id_sorted
        n_real = int(tile_id_sorted[-1]) + 1
        t_base = np.zeros(n_real, np.int64)
        t_rb = np.zeros(n_real, np.int64)
        t_base[tile_of] = base_o
        t_rb[tile_of] = rb_o
    else:
        n_real = 0
        tile_of = np.zeros(0, np.int64)
        t_base = np.zeros(0, np.int64)
        t_rb = np.zeros(0, np.int64)

    pos_src = tile_of * (R * _LANES) + ri * _LANES + lane_o
    return _finish_plan(a, n, m, nnz, wsub, R, pos_src, sub_o, order,
                        t_base, t_rb, n_real, refreshable=refreshable)


@partial(jax.jit, static_argnums=2)
def _fill_slots(pos, vals, size):
    """Dense slot array from (sorted unique positions, values)."""
    return (
        jnp.zeros((size,), vals.dtype)
        .at[pos]
        .set(vals, unique_indices=True, indices_are_sorted=True)
    )


@partial(jax.jit, static_argnums=3)
def _fill_gather(pos, src, data, size):
    """Dense slot array gathering values straight from the device-resident
    data array (skips pulling it to the host and re-uploading)."""
    return (
        jnp.zeros((size,), data.dtype)
        .at[pos]
        .set(data[src], unique_indices=True, indices_are_sorted=True)
    )


def _finish_plan(a, n, m, nnz, wsub, R, pos_src, sub_src, src_index,
                 t_base, t_rb, n_real, full_sort: bool = False,
                 refreshable: bool = False) -> SegTilePlan:
    """Shared plan tail: tile padding, SMEM chunking, and the device-side
    fill of the padded slot arrays.

    Entries are counting-sorted by tile id host-side — within a tile both
    layout paths emit entries in (ri, lane)-ascending order, so sorting by
    tile alone fully sorts the slot positions, and the device fill can
    assert ``indices_are_sorted`` (XLA compiles that scatter ~10x faster
    than the general one).  Values never leave the device: ``_fill_gather``
    reads ``a.data`` through the sorted entry permutation (``src_index``
    maps pos positions to original entry ids; None = identity).  Ships pos
    + entry ids as int32 (8 B/nnz)."""
    kstep = _k_step(R, n_real)
    slots = R * _LANES
    n_tiles = max(-(-max(n_real, 1) // kstep) * kstep, kstep)
    seg_of = np.zeros(n_tiles, np.int32)
    t_rb_pad = np.zeros(n_tiles, np.int32)
    seg_of[:n_real] = t_base
    t_rb_pad[:n_real] = t_rb

    # chunk the grid so per-call SMEM tables stay within budget
    n_groups = n_tiles // kstep
    cap_groups = max(_TILE_CAP // _K, 1)  # budget counts grid STEPS
    chunks = tuple(
        (g0, min(g0 + cap_groups, n_groups))
        for g0 in range(0, n_groups, cap_groups)
    )

    if n_tiles * slots > np.iinfo(np.int32).max:
        raise ValueError(
            f"build_seg_tiles: {n_tiles} tiles overflows int32 slot "
            "positions (8 GB of slot storage — use the XLA path)"
        )
    from ..native.plansort import argsort_u64, counting_argsort

    shift = slots.bit_length() - 1  # slots is a power of two
    pos_np = np.asarray(pos_src)
    # rigid layouts emit within-tile entries already (ri, lane)-ascending,
    # so a counting sort by tile id fully sorts slot positions; first-fit
    # emits column-major within a tile and needs the full radix argsort
    if not nnz:
        order = np.zeros(0, np.int64)
    elif full_sort:
        order = argsort_u64(pos_np.astype(np.uint64))
    else:
        order = counting_argsort(pos_np >> shift, max(n_real, 1))
    pos = jnp.asarray(pos_np[order].astype(np.int32))
    entry = np.asarray(src_index)[order] if src_index is not None else order
    eidx = jnp.asarray(entry.astype(np.int32))
    tvals = _fill_gather(
        pos, eidx, a.data, n_tiles * slots
    ).reshape(n_tiles, R, _LANES)
    # q scatters as f32 (values 0..31, exact) so this reuses the f32
    # executable _fill_slots just compiled — the int8 scatter costs its own
    # ~9 s XLA compile; the device-side cast is negligible
    tq = (
        _fill_slots(
            pos, jnp.asarray(np.asarray(sub_src)[order].astype(np.float32)),
            n_tiles * slots,
        )
        .astype(jnp.int8)
        .reshape(n_tiles, R, _LANES)
    )
    return SegTilePlan(
        vals=tvals,
        q=tq,
        seg_of=jnp.asarray(seg_of),
        rb=jnp.asarray(t_rb_pad),
        n=n,
        m=m,
        n_tiles=n_tiles,
        fill=nnz / max(n_tiles * slots, 1),
        chunks=chunks,
        wsub=wsub,
        rows=R,
        kstep=kstep,
        pos=pos if refreshable else None,
        eidx=eidx if refreshable else None,
    )


def seg_tiles_refresh(plan: SegTilePlan, data: jax.Array) -> SegTilePlan:
    """Re-bind a plan to NEW values of the SAME pattern in one device
    gather (the pattern-static layout is reused; milliseconds vs the
    tens-of-seconds host rebuild — the Newton/time-stepping idiom, same
    contract as every *_apply).  Requires ``build_seg_tiles(...,
    refreshable=True)``; ``data`` is the updated CSR ``.data`` array.
    jit-compatible given the plan."""
    if plan.pos is None:
        raise ValueError(
            "seg_tiles_refresh: plan was not built with refreshable=True")
    slots = plan.rows * _LANES
    tvals = _fill_gather(
        plan.pos, plan.eidx, jnp.asarray(data), plan.n_tiles * slots
    ).reshape(plan.n_tiles, plan.rows, _LANES)
    return dataclasses.replace(plan, vals=tvals)


def _take_sublane(src, idx):
    """int32-safe ``take_along_axis(src, idx, axis=0)`` on (8, 128) tiles.
    ``jnp.take_along_axis`` hard-casts indices to int64 under jax x64 (its
    negative-index fixup), which Mosaic cannot lower; this emits the
    identical gather with the int32 indices as-is (the plan guarantees
    0 <= idx < 8, so the fixup is dead code)."""
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(), collapsed_slice_dims=(0,), start_index_map=(0,),
        operand_batching_dims=(1,), start_indices_batching_dims=(1,),
    )
    return jax.lax.gather(
        src, idx[..., None], dnums, (1, 1),
        mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
    )


def _gather_window(seg, qg, wsub):
    """One (8, 128) operand vreg: window values selected by the sublane
    pointers ``qg``.  Mosaic's dynamic gather requires indices.shape ==
    src.shape: gather each 8-sublane chunk of the window with the SHARED
    masked index ``qg & 7`` and select by the chunk bits (``qg >> 3``) —
    out-of-chunk gathers read in-bounds junk that the select discards
    (wsub=8 stays one native gather with no masking at all, since the plan
    guarantees q < 8)."""
    if wsub == 8:
        return _take_sublane(seg[0:8], qg)
    qm = qg & 7
    gx = _take_sublane(seg[0:8], qm)
    for c in range(1, wsub // 8):
        gc = _take_sublane(seg[c * 8:(c + 1) * 8], qm)
        gx = jnp.where(qg >= c * 8, gc, gx)
    return gx


def csr_smvm_segtile(a: CSR, v: jax.Array, plan: SegTilePlan,
                     *, reduce: str = "vpu", batch: int | None = None,
                     interpret: bool = False) -> jax.Array:
    """SpMV via the segment-tile kernel; matches ``csr_smvm`` up to float
    summation order.  ``plan`` from :func:`build_seg_tiles` (value-bound:
    refresh via :func:`seg_tiles_refresh` after updating ``a.data``).

    ``reduce``: how per-tile products become row sums.
    ``"vpu"`` (default, production): the per-vreg ``jnp.sum`` lane reduce —
    measured 8.24 ms on the 10M-nnz bench band.  ``"mxu"``: products
    accumulate into a per-step VMEM scratch and ONE ``(kstep*R, 128) @
    (128, 8)`` all-ones matmul (f32 HIGHEST — exact) reduces every tile's
    lanes in a single MXU issue; measured 11.3 ms at the same size
    (REJECTED for production, kept for A/B — docs/performance.md)."""
    v = jnp.asarray(v)
    n, m = a.shape
    if v.shape != (m,):
        raise ValueError(f"csr_smvm_segtile: vector shape {v.shape} != ({m},)")
    out_dtype = jnp.result_type(a.dtype, v.dtype)
    if n == 0:
        return jnp.zeros((0,), out_dtype)
    y = segtile_apply(
        plan.vals, plan.q, plan.seg_of, plan.rb, v,
        n=n, wsub=plan.wsub, rows=plan.rows, kstep=plan.kstep,
        chunks=plan.chunks, reduce=reduce, batch=batch,
        interpret=interpret, out_dtype=out_dtype,
    )
    return y[:n]


def segtile_apply(vals, q, seg_of, rb, v, *, n: int, wsub: int, rows: int,
                  kstep: int, chunks: tuple, reduce: str = "vpu",
                  batch: int | None = None, interpret: bool = False,
                  out_dtype=None) -> jax.Array:
    """Raw-array segment-tile SpMV core: the pallas_call pipeline of
    :func:`csr_smvm_segtile` operating directly on the plan's slot arrays.

    This split exists so the SAME kernel runs inside ``shard_map`` bodies —
    the distributed layer (parallel/halo.py, parallel/pcsr.py) stacks
    per-shard plan arrays on a leading device axis and calls this per shard
    after the operand collective, inheriting the measured single-chip rate.
    ``v`` is the operand *in the plan's column space* (the halo buffer for
    halo plans); returns the padded ``(ceil(n/rows)*rows,)`` output — the
    caller slices to its logical row count."""
    v = jnp.asarray(v)
    m = v.shape[0]
    if out_dtype is None:
        out_dtype = jnp.result_type(vals.dtype, v.dtype)
    R = rows
    if batch is None:
        batch = kstep  # full two-phase split (measured best)
    # resident operand: whole vector as sublane rows, +wsub zero rows so any
    # in-range window base reads without clamping
    s_rows = -(-max(m, 1) // _LANES) + wsub
    v2 = jnp.zeros((s_rows, _LANES), out_dtype)
    v2 = jax.lax.dynamic_update_slice(
        v2.reshape(-1), v.astype(out_dtype), (0,)
    ).reshape(s_rows, _LANES)
    nbR = -(-n // R)

    # Measured variants at 10M nnz band (v5e, chained): R=8 per-tile
    # reduce+RMW as below: 13.9 ms; q packed into (32,128) int8 native
    # tiles: 14.8 ms; scratch accumulator drained once per row-block run
    # (per-tile conditionals): 20.0 ms — the conditionals defeat Mosaic
    # pipelining.  R=32 shares one window slice + one output RMW across 4
    # vreg-rows of slots (round 4).
    def _gathered(seg, q, gi):
        return _gather_window(seg, q[gi * 8:(gi + 1) * 8], wsub)

    def kernel_vpu(seg_of, rb, vals_ref, q_ref, v_ref, o_ref):
        g = pl.program_id(0)

        @pl.when(g == 0)
        def _():
            o_ref[...] = jnp.zeros_like(o_ref)

        # batched two-phase emission: a batch of tiles' gather->mul->reduce
        # chains first, their RMWs after — consecutive tiles of one row
        # block would otherwise serialize on the same output row's
        # read-after-write (measured 9.5 -> 9.0 ms at the bench size);
        # batching bounds live accumulator registers
        for b0 in range(0, kstep, batch):
            accs = []
            for j in range(b0, min(b0 + batch, kstep)):
                t = g * kstep + j
                seg = v_ref[pl.ds(seg_of[t], wsub), :]
                q = q_ref[j].astype(jnp.int32)  # (R, 128)
                parts = []
                for gi in range(R // 8):
                    gx = _gathered(seg, q, gi)
                    parts.append(
                        jnp.sum(vals_ref[j, gi * 8:(gi + 1) * 8] * gx,
                                axis=1)
                    )
                accs.append(parts[0] if R == 8 else jnp.concatenate(parts))
            for i, j in enumerate(range(b0, min(b0 + batch, kstep))):
                t = g * kstep + j
                o_ref[pl.ds(rb[t], 1)] += accs[i][None]

    # product-scratch rows per grid step: 4096 at the production kstep=512,
    # R=8 (a 2 MB f32 VMEM scratch; 512 rows only at the small-plan kstep=64)
    rows_step = kstep * R

    def kernel_mxu(seg_of, rb, vals_ref, q_ref, v_ref, o_ref, scratch):
        g = pl.program_id(0)

        @pl.when(g == 0)
        def _():
            o_ref[...] = jnp.zeros_like(o_ref)

        for j in range(kstep):
            t = g * kstep + j
            seg = v_ref[pl.ds(seg_of[t], wsub), :]
            q = q_ref[j].astype(jnp.int32)  # (R, 128)
            for gi in range(R // 8):
                gx = _gathered(seg, q, gi)
                scratch[j * R + gi * 8:j * R + (gi + 1) * 8, :] = (
                    vals_ref[j, gi * 8:(gi + 1) * 8] * gx
                )
        # one MXU issue reduces every tile's lanes: rowsums land in every
        # output lane (all-ones rhs), HIGHEST keeps the sum exact in f32
        ones = jnp.ones((_LANES, 8), out_dtype)
        mm = jax.lax.dot_general(
            scratch[...], ones,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=out_dtype,
            precision=jax.lax.Precision.HIGHEST,
        )  # (rows_step, 8)
        mmt = mm.T  # (8, rows_step): tile sums now lane-major
        for j in range(kstep):
            t = g * kstep + j
            # (1, R) static lane slice of the transposed sums -> one
            # sublane-dynamic RMW per tile, no cross-lane shuffles anywhere
            o_ref[pl.ds(rb[t], 1)] += mmt[0:1, j * R:(j + 1) * R]

    kernel = kernel_vpu if reduce == "vpu" else kernel_mxu
    scratch_shapes = (
        [] if reduce == "vpu"
        else [pltpu.VMEM((rows_step, _LANES), out_dtype)]
    )

    pieces = []
    vals_all = vals.astype(out_dtype)
    for (g0, g1) in chunks:
        ng = g1 - g0
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(ng,),
            in_specs=[
                pl.BlockSpec((kstep, R, _LANES), lambda g, so, rbl: (g, _Z, _Z)),
                pl.BlockSpec((kstep, R, _LANES), lambda g, so, rbl: (g, _Z, _Z)),
                pl.BlockSpec(v2.shape, lambda g, so, rbl: (_Z, _Z)),
            ],
            out_specs=pl.BlockSpec((nbR, R), lambda g, so, rbl: (_Z, _Z)),
            scratch_shapes=scratch_shapes,
        )
        out = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((nbR, R), out_dtype),
            cost_estimate=pl.CostEstimate(
                flops=2 * ng * kstep * R * _LANES,
                bytes_accessed=ng * kstep * R * _LANES * 5 + m * 4
                + nbR * R * 4,
                transcendentals=0,
            ),
            # the resident output + per-tile RMW temporaries exceed the
            # 16 MB default scoped-vmem budget at bench sizes; v5e has 128 MB
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024
            ),
            interpret=interpret,
        )(
            jax.lax.dynamic_slice(seg_of, (g0 * kstep,), (ng * kstep,)),
            jax.lax.dynamic_slice(rb, (g0 * kstep,), (ng * kstep,)),
            jax.lax.dynamic_slice(
                vals_all, (g0 * kstep, 0, 0), (ng * kstep, R, _LANES)
            ),
            jax.lax.dynamic_slice(
                q, (g0 * kstep, 0, 0), (ng * kstep, R, _LANES)
            ),
            v2,
        )
        pieces.append(out)
    y = pieces[0]
    for p in pieces[1:]:
        y = y + p
    return y.reshape(nbR * R)


def segtile_hbm_bytes(plan: SegTilePlan) -> int:
    """HBM bytes one segment-tile SpMV actually moves (the kernel's
    CostEstimate): 5 B per slot (f32 value + int8 pointer) + the resident
    operand + the output.  The ``plan_bytes`` term of
    :func:`~sparse_tpu.utils.stats.nnz_roofline`."""
    slots = plan.n_tiles * plan.rows * _LANES
    nbR = -(-plan.n // plan.rows)
    return slots * 5 + plan.m * 4 + nbR * plan.rows * 4


def segtile_issue_seconds(plan: SegTilePlan) -> float:
    """Modeled issue-bound floor of one segment-tile SpMV: vreg count x the
    measured per-vreg cost (``SEGTILE_NS_PER_VREG`` + the wider-window
    chunk surcharge).  The ``issue_s`` term of
    :func:`~sparse_tpu.utils.stats.nnz_roofline` — for this kernel the
    issue floor, not traffic, is binding (measured, docs/performance.md)."""
    vregs = plan.n_tiles * (plan.rows // 8)
    per = (SEGTILE_NS_PER_VREG
           + SEGTILE_NS_PER_EXTRA_CHUNK * (plan.wsub // 8 - 1))
    return vregs * per * 1e-9


# resident budget: operand (m) + output (n) f32 rows in VMEM; keep the two
# well under ~16 MB.  Below _MIN_FILL the slot stream costs more than XLA's
# flat 7 ns/nnz scalar-gather rate (5 B/slot at ~100 GB/s vs 7 ns * fill).
_MAX_RESIDENT = 2_000_000
_MIN_FILL = 0.007

# BELL block-SpMV route: only at block sizes whose operand-gather granule
# (bsz * 4 B) clearly beats the ~88 M gathers/s scalar wall, and whose block
# fill keeps the bsz^2/fill storage blow-up small.  bell_smvm streams blocks
# at ~64 GB/s (bsz=32), so predicted nnz/s ~ 16 G * fill — >> the 0.14 G
# scalar ceiling whenever this routing fires (docs/performance.md).
_BLOCK_SPMV_MIN_BSZ = 8
_BLOCK_SPMV_MIN_FILL = 0.5


def _smvm_block_bsz(a: CSR) -> int:
    """Detected BELL-route block size for SpMV, or 0 (host-side, eager)."""
    from ..utils.stats import detect_block_size

    if a.shape[0] != a.shape[1]:
        return 0  # BELL/BSR storage is square-only (bsr_from_coo asserts)
    bsz, _ = detect_block_size(
        a, candidates=(32, 16, 8), min_fill=_BLOCK_SPMV_MIN_FILL
    )
    return bsz if bsz >= _BLOCK_SPMV_MIN_BSZ else 0


def csr_smvm_auto(a: CSR, v: jax.Array,
                  plan: SegTilePlan | None = None,
                  wsub: int = 8) -> jax.Array:
    """Unstructured SpMV dispatch, in measured-preference order on TPU:

    1. the Pallas segment-tile kernel (operand + output fit VMEM, tile fill
       high enough — column-clustered patterns; plan built eagerly when not
       supplied, with window height ``wsub``);
    2. the BELL block path (``bell_from_csr`` -> ``bell_smvm``) when the
       pattern has dense natural blocks at bsz >= 8 but no column locality
       the segment tiler can use (e.g. scattered block positions) — blocked
       storage beats the ~88 M gathers/s scalar wall by moving bsz-wide
       granules (docs/performance.md);
    3. the XLA row-binned ELL path (everything else, incl. inside jit
       without a plan — routes 1-2 need eager host-side pattern analysis).

    Hot paths should do the analysis once per pattern themselves
    (``build_seg_tiles`` / ``bell_from_csr``) and call the specific kernel.
    """
    from .spmv import csr_smvm_fast

    on_tpu = jax.default_backend() == "tpu"
    eager = True
    if on_tpu and a.shape[0] + a.shape[1] <= _MAX_RESIDENT:
        if plan is None:
            try:
                nse = a.data.shape[0]
                if nse > 1_000_000:
                    import warnings

                    warnings.warn(
                        f"csr_smvm_auto: building a segment-tile plan for "
                        f"{nse} stored entries (~{nse / 1e6:.0f} s host-side"
                        " at this host's rate); build it once with "
                        "build_seg_tiles(a) and pass plan= if you call this "
                        "more than once per pattern",
                        stacklevel=2,
                    )
                plan = build_seg_tiles(a, wsub=wsub)
            except jax.errors.TracerArrayConversionError:
                plan = None  # inside jit without a plan: use the XLA path
                eager = False
            except ValueError:
                # pattern so dispersed the tile count overflows int32 slot
                # positions (e.g. a scrambled 1M-row power-law graph): the
                # fill would be far below the floor anyway — XLA path
                plan = None
        if plan is not None and plan.fill >= _MIN_FILL:
            return csr_smvm_segtile(a, v, plan)
    if on_tpu and eager:
        try:
            bsz = _smvm_block_bsz(a)
        except jax.errors.TracerArrayConversionError:
            bsz = 0
        if bsz:
            import warnings

            from ..formats.bell import bell_from_csr, bell_smvm

            warnings.warn(
                f"csr_smvm_auto: dense {bsz}x{bsz} block structure detected"
                " — re-blocking to BELL per call; convert once with "
                f"bell_from_csr(a, {bsz}) and call bell_smvm on hot paths",
                stacklevel=2,
            )
            return bell_smvm(bell_from_csr(a, bsz), v)
    return csr_smvm_fast(a, v)
