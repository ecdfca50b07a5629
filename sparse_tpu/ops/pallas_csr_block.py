"""Block-granule segment-tile SpMV: one slot = one bsz x bsz block.

The scalar segment-tile kernel (ops/pallas_csr.py) is bound by per-vreg
ISSUE cost (~46 ns per (8, 128) slot vreg — measured, docs/performance.md),
so tile count is the only lever.  Matrices with natural dense blocks
(vector-valued FEM: 2 dof per mesh node -> fully dense 2x2 blocks) let one
slot carry a whole block: the tile layout is built over the BLOCK pattern
(nnz/bsz^2 entries, block-column lanes), each slot holds the bsz^2 values
of its block as separate value planes sharing ONE sublane pointer, the
operand resides as bsz interleaved planes (v[bsz*c + i] for plane i), and
each tile issues bsz gathers + bsz^2 multiplies + bsz reduces + bsz output
RMWs covering bsz^2 x 1024 nnz — at bsz=2 that is ~2.2x the per-vreg work
of the scalar kernel for 4x the entries, and the block-space layout also
packs tighter (half the column span per window).  The round-4 verdict's
"block-granule slot" experiment, built and measured in round 5.

The symmetric reorder that preserves blocks is :func:`~sparse_tpu.ops.
reorder.rcm_order_blocked` — scalar RCM would interleave dof pairs and
destroy the block structure.  Reference semantics: the result matches
``csr_smvm`` (compressed.fut:134-146) up to float summation order.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..formats.bsr import BSR
from .pallas_csr import (
    _K,
    _LANES,
    _TILE_CAP,
    _fill_slots,
    _gather_window,
    _k_step,
)
from .segmented import IDXMAP_ZERO as _Z

__all__ = [
    "BlockSegTilePlan",
    "build_seg_tiles_block",
    "block_seg_tiles_refresh",
    "bsr_smvm_segtile_block",
    "block_segtile_hbm_bytes",
    "block_segtile_issue_seconds",
]

#: Measured per-tile issue cost of the block kernel at bsz=2 relative to
#: the scalar kernel's per-vreg cost (bsz gathers + bsz^2 value streams +
#: bsz reduces + bsz RMWs vs 1 of each): elasticity-400k, wsub=16, 62464
#: tiles in 6.41 ms = 102.6 ns/tile = 1.88x the scalar 54.7 ns/vreg.
_BLOCK_VREG_FACTOR = {2: 1.88}


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["vals", "q", "seg_of", "rb", "pos", "eidx"],
    meta_fields=["n", "nb", "bsz", "n_tiles", "fill", "chunks", "wsub",
                 "kstep"],
)
@dataclasses.dataclass(frozen=True)
class BlockSegTilePlan:
    """Static block-granule segment-tile layout (+ values) of a BSR matrix.

    ``vals``: (n_tiles, bsz*bsz, 8, 128) slot value planes (plane i*bsz+j
    holds block element (i, j)); ``q``: int8 sublane pointers shared by all
    planes of a slot; ``seg_of``/``rb``: per-tile window base (in block
    sublanes of the interleaved operand planes) / output block-row block.
    ``fill`` is block-slot occupancy: nnz / (n_tiles * 1024 * bsz^2)."""

    vals: jax.Array
    q: jax.Array
    seg_of: jax.Array
    rb: jax.Array
    n: int
    nb: int
    bsz: int
    n_tiles: int
    fill: float
    chunks: tuple
    wsub: int
    kstep: int
    # retained by build_seg_tiles_block(refreshable=True): see
    # block_seg_tiles_refresh
    pos: jax.Array | None = None
    eidx: jax.Array | None = None


def build_seg_tiles_block(ab: BSR, wsub: int = 8,
                          refreshable: bool = False) -> BlockSegTilePlan:
    """Host-side block-granule tiling of a BSR matrix (eager, once per
    pattern + values; value-bound like :class:`~.pallas_csr.SegTilePlan`).

    The layout pass is the scalar tiler run on the BLOCK pattern (same
    native first-fit core); the value fill gathers the bsz^2 planes from
    ``ab.blocks`` on device.  bsz=2 only for now (the elasticity class);
    wider blocks multiply the value-plane VMEM stream bsz^2-fold and
    belong to the BELL block paths instead."""
    bsz = ab.bsz
    if bsz != 2:
        raise ValueError(
            f"build_seg_tiles_block: bsz=2 only (got {bsz}); bsz >= 8 "
            "routes to the BELL block paths"
        )
    nb = ab.nb
    R = 8
    idx = np.asarray(ab.indices).astype(np.int64)
    store = np.flatnonzero(idx < nb * nb)
    bi = idx[store]
    order0 = np.argsort(bi, kind="stable")  # defensive: sorted block coords
    store = store[order0]
    bi = bi[order0]
    rows_b = bi // nb
    cols_b = bi % nb
    nnz_b = rows_b.size
    indptr_b = np.zeros(nb + 1, np.int64)
    np.cumsum(np.bincount(rows_b, minlength=nb), out=indptr_b[1:])

    from ..native.plansort import (
        argsort_u64,
        seg_tile_layout_ff,
        seg_tile_layout_ff_py,
    )

    res = seg_tile_layout_ff(indptr_b, cols_b, wsub, rows=R) if nnz_b else None
    if res is None:
        res = seg_tile_layout_ff_py(indptr_b, cols_b, wsub, rows=R)
    pos_src, sub_src, t_base, t_rb = res
    n_real = t_base.size

    kstep = _k_step(R, n_real)
    slots = R * _LANES
    n_tiles = max(-(-max(n_real, 1) // kstep) * kstep, kstep)
    seg_of = np.zeros(n_tiles, np.int32)
    rb_pad = np.zeros(n_tiles, np.int32)
    seg_of[:n_real] = t_base
    rb_pad[:n_real] = t_rb
    n_groups = n_tiles // kstep
    cap_groups = max(_TILE_CAP // _K, 1)
    chunks = tuple(
        (g0, min(g0 + cap_groups, n_groups))
        for g0 in range(0, n_groups, cap_groups)
    )
    if n_tiles * slots > np.iinfo(np.int32).max:
        raise ValueError(
            "build_seg_tiles_block: tile count overflows int32 slot "
            "positions — use the scalar paths"
        )

    order = argsort_u64(np.asarray(pos_src).astype(np.uint64)) if nnz_b \
        else np.zeros(0, np.int64)
    pos = jnp.asarray(np.asarray(pos_src)[order].astype(np.int32))
    entry = jnp.asarray(store[order].astype(np.int32))
    q = (
        _fill_slots(
            pos, jnp.asarray(np.asarray(sub_src)[order].astype(np.float32)),
            n_tiles * slots,
        )
        .astype(jnp.int8)
        .reshape(n_tiles, R, _LANES)
    )
    planes = []
    for i in range(bsz):
        for j in range(bsz):
            planes.append(
                _fill_gather_plane(pos, entry, ab.blocks[:, i, j],
                                   n_tiles * slots)
            )
    vals = jnp.stack(planes, axis=1).reshape(n_tiles, bsz * bsz, R, _LANES)
    return BlockSegTilePlan(
        pos=pos if refreshable else None,
        eidx=entry if refreshable else None,
        vals=vals,
        q=q,
        seg_of=jnp.asarray(seg_of),
        rb=jnp.asarray(rb_pad),
        n=ab.n,
        nb=nb,
        bsz=bsz,
        n_tiles=n_tiles,
        fill=nnz_b / max(n_tiles * slots, 1),
        chunks=chunks,
        wsub=wsub,
        kstep=kstep,
    )


@partial(jax.jit, static_argnums=3)
def _fill_gather_plane(pos, src, plane, size):
    """Dense slot plane from sorted positions + block-storage gather, then
    reshaped per tile by the caller."""
    return (
        jnp.zeros((size,), plane.dtype)
        .at[pos]
        .set(plane[src], unique_indices=True, indices_are_sorted=True)
        .reshape(size // (8 * _LANES), 8, _LANES)
    )


def block_seg_tiles_refresh(plan: BlockSegTilePlan,
                            blocks: jax.Array) -> BlockSegTilePlan:
    """Re-bind a block-granule plan to NEW block values of the SAME
    pattern (bsz^2 device gathers; the host layout pass is reused).
    Requires ``build_seg_tiles_block(..., refreshable=True)``; ``blocks``
    is the updated BSR ``.blocks`` array.  jit-compatible given the
    plan."""
    if plan.pos is None:
        raise ValueError(
            "block_seg_tiles_refresh: plan was not built with "
            "refreshable=True")
    bsz = plan.bsz
    planes = []
    for i in range(bsz):
        for j in range(bsz):
            planes.append(_fill_gather_plane(
                plan.pos, plan.eidx, blocks[:, i, j],
                plan.n_tiles * 8 * _LANES))
    vals = jnp.stack(planes, axis=1).reshape(
        plan.n_tiles, bsz * bsz, 8, _LANES)
    return dataclasses.replace(plan, vals=vals)


def bsr_smvm_segtile_block(ab: BSR, v: jax.Array, plan: BlockSegTilePlan,
                           *, batch: int | None = None,
                           interpret: bool = False) -> jax.Array:
    """SpMV through the block-granule segment-tile kernel; matches
    ``csr_smvm`` of the scalar expansion up to float summation order.
    Value-bound plan (rebuild after updating ``ab.blocks``)."""
    v = jnp.asarray(v)
    n = ab.n
    if v.shape != (n,):
        raise ValueError(
            f"bsr_smvm_segtile_block: vector shape {v.shape} != ({n},)")
    out_dtype = jnp.result_type(ab.dtype, v.dtype)
    if n == 0:
        return jnp.zeros((0,), out_dtype)
    bsz, nb, R = plan.bsz, plan.nb, 8
    wsub, kstep = plan.wsub, plan.kstep
    if batch is None:
        batch = kstep
    b2 = bsz * bsz
    # interleaved operand planes: plane i holds v[bsz*c + i] at block col c,
    # laid out as (s_rows, 128) sublane rows + wsub zero guard rows
    s_rows = -(-max(nb, 1) // _LANES) + wsub
    v2d = v.astype(out_dtype).reshape(nb, bsz)
    vplanes = []
    for i in range(bsz):
        p = jnp.zeros((s_rows * _LANES,), out_dtype)
        p = jax.lax.dynamic_update_slice(p, v2d[:, i], (0,))
        vplanes.append(p.reshape(s_rows, _LANES))
    nbRb = -(-nb // R)

    def kernel(seg_of, rb, vals_ref, q_ref, v0_ref, v1_ref, o0_ref, o1_ref):
        g = pl.program_id(0)

        @pl.when(g == 0)
        def _():
            o0_ref[...] = jnp.zeros_like(o0_ref)
            o1_ref[...] = jnp.zeros_like(o1_ref)

        # batched two-phase emission (same pipeline shape as the scalar
        # kernel: all gather->mul->reduce chains of a batch, then the RMWs)
        for b0 in range(0, kstep, batch):
            accs = []
            for j in range(b0, min(b0 + batch, kstep)):
                t = g * kstep + j
                q = q_ref[j].astype(jnp.int32)  # (R, 128)
                seg0 = v0_ref[pl.ds(seg_of[t], wsub), :]
                seg1 = v1_ref[pl.ds(seg_of[t], wsub), :]
                x0 = _gather_window(seg0, q, wsub)
                x1 = _gather_window(seg1, q, wsub)
                acc0 = jnp.sum(
                    vals_ref[j, 0] * x0 + vals_ref[j, 1] * x1, axis=1)
                acc1 = jnp.sum(
                    vals_ref[j, 2] * x0 + vals_ref[j, 3] * x1, axis=1)
                accs.append((acc0, acc1))
            for i, j in enumerate(range(b0, min(b0 + batch, kstep))):
                t = g * kstep + j
                o0_ref[pl.ds(rb[t], 1)] += accs[i][0][None]
                o1_ref[pl.ds(rb[t], 1)] += accs[i][1][None]

    pieces = []
    vals_all = plan.vals.astype(out_dtype)
    for (g0, g1) in plan.chunks:
        ng = g1 - g0
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(ng,),
            in_specs=[
                pl.BlockSpec((kstep, b2, R, _LANES),
                             lambda g, so, rbl: (g, _Z, _Z, _Z)),
                pl.BlockSpec((kstep, R, _LANES),
                             lambda g, so, rbl: (g, _Z, _Z)),
                pl.BlockSpec(vplanes[0].shape, lambda g, so, rbl: (_Z, _Z)),
                pl.BlockSpec(vplanes[1].shape, lambda g, so, rbl: (_Z, _Z)),
            ],
            out_specs=[
                pl.BlockSpec((nbRb, R), lambda g, so, rbl: (_Z, _Z)),
                pl.BlockSpec((nbRb, R), lambda g, so, rbl: (_Z, _Z)),
            ],
            scratch_shapes=[],
        )
        out = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((nbRb, R), out_dtype),
                jax.ShapeDtypeStruct((nbRb, R), out_dtype),
            ],
            cost_estimate=pl.CostEstimate(
                flops=2 * ng * kstep * b2 * R * _LANES,
                bytes_accessed=ng * kstep * R * _LANES * (4 * b2 + 1)
                + nb * bsz * 4 + nbRb * R * bsz * 4,
                transcendentals=0,
            ),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024
            ),
            interpret=interpret,
        )(
            jax.lax.dynamic_slice(plan.seg_of, (g0 * kstep,), (ng * kstep,)),
            jax.lax.dynamic_slice(plan.rb, (g0 * kstep,), (ng * kstep,)),
            jax.lax.dynamic_slice(
                vals_all, (g0 * kstep, 0, 0, 0), (ng * kstep, b2, R, _LANES)
            ),
            jax.lax.dynamic_slice(
                plan.q, (g0 * kstep, 0, 0), (ng * kstep, R, _LANES)
            ),
            vplanes[0],
            vplanes[1],
        )
        pieces.append(out)
    y0 = pieces[0][0]
    y1 = pieces[0][1]
    for p in pieces[1:]:
        y0 = y0 + p[0]
        y1 = y1 + p[1]
    y = jnp.stack(
        [y0.reshape(nbRb * R)[:nb], y1.reshape(nbRb * R)[:nb]], axis=1
    )
    return y.reshape(nb * bsz)


def block_segtile_hbm_bytes(plan: BlockSegTilePlan) -> int:
    """HBM bytes one block-granule SpMV moves: bsz^2 value planes (4 B) +
    one shared pointer plane (1 B) per slot, the interleaved operand, and
    the output."""
    slots = plan.n_tiles * 8 * _LANES
    return (slots * (4 * plan.bsz * plan.bsz + 1) + plan.nb * plan.bsz * 4
            + (-(-plan.nb // 8)) * 8 * plan.bsz * 4)


def block_segtile_issue_seconds(plan: BlockSegTilePlan) -> float:
    """Issue-floor model: scalar per-vreg cost x the calibrated per-tile
    factor for the extra gathers/planes (see ``_BLOCK_VREG_FACTOR``)."""
    from .pallas_csr import (
        SEGTILE_NS_PER_EXTRA_CHUNK,
        SEGTILE_NS_PER_VREG,
    )

    per = (SEGTILE_NS_PER_VREG
           + SEGTILE_NS_PER_EXTRA_CHUNK * (plan.wsub // 8 - 1))
    return plan.n_tiles * per * _BLOCK_VREG_FACTOR[plan.bsz] * 1e-9
