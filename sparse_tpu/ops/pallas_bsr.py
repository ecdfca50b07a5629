"""Pallas block-SpGEMM numeric pass: DMA-gathered factor blocks.

`bsr_smsmm_apply` (formats/bsr.py) is gather-bound: XLA's 3-D gather moves
4 KB blocks at only ~3.1 M granules/s (~318 ns each, 12.9 GB/s), while the
batched block einsum alone runs 1.2 TFLOP/s (measured stage attribution,
docs/performance.md).  This kernel replaces the gathers AND the
segment-sum: per grid step, ``G`` product pairs arrive via
scalar-prefetch-driven DMAs (the DMA engine does the gathering — the
fused-BELL pattern applied to SpGEMM), multiply as ONE batched in-kernel
einsum, and accumulate into a VMEM-resident slab of ``P`` consecutive
output blocks via per-product sublane-dynamic RMWs.

Why slabs instead of one output per step: real product runs are SHORT
(measured avg 1.3 products per output block on the suite matrix), so an
output-stationary grid pays ~1 us of step floor per output.  Products are
already output-sorted in :class:`~sparse_tpu.formats.bsr.BsrSmsmmPlan`,
so a slab's products form one contiguous range; tail slots pad to an
appended all-zero block aimed at slab row 0 (adds exact zeros).

The same kernel runs the BACKWARD pass of the differentiable variant
(:func:`bsr_smsmm_apply_pallas_ad`): dC/dA[f] = dC[seg_f] @ B[b_pos_f]^T
accumulated by ``a_pos`` and dC/dB[f] = A[a_pos_f]^T @ dC[seg_f]
accumulated by ``b_pos`` are the identical gather-einsum-slab shape with
permuted schedules, so gradients run at forward speed instead of falling
back to the XLA gather wall.

Reference semantics: blocked_square_regular.fut:336-363 (same contract as
``bsr_smsmm_apply``; values agree up to summation order).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..formats.bsr import BSR, BsrSmsmmPlan
from .segmented import IDXMAP_ZERO as _Z

__all__ = [
    "BsrPallasPlan",
    "BsrPallasPlanAD",
    "bsr_smsmm_pallas_prepare",
    "bsr_smsmm_pallas_prepare_ad",
    "bsr_smsmm_apply_pallas",
    "bsr_smsmm_apply_pallas_ad",
]

_G = 24  # product pairs per grid step (chip sweep: 338 GFLOP/s at g=24)
_SLAB_BYTES = 512 * 1024  # target output-slab footprint -> default p
_SMEM_BUDGET = 700_000  # bytes of scalar-prefetch tables per pallas_call



@partial(
    jax.tree_util.register_dataclass,
    data_fields=["a_idx", "b_idx", "oloc", "slab", "first", "indices"],
    meta_fields=["chunks", "n", "bsz", "g", "p", "nbz_out", "paired"],
)
@dataclasses.dataclass(frozen=True)
class BsrPallasPlan:
    """DMA schedule for :func:`bsr_smsmm_apply_pallas`.

    ``a_idx``/``b_idx``: (S*g,) int32 factor-block slots (the slot one
    past the stored capacity is the appended zero block); ``oloc``:
    (S*g,) int32 output row within the step's slab; ``slab``: (S,) int32
    slab id RELATIVE to the chunk's slab range; ``first``: (S,) int32 1 at
    each slab's first step; ``chunks``: static (step0, step1, slab0,
    slab1) per pallas_call; ``indices``: the output BSR's sorted block
    coordinates.

    ``paired=True`` (the descriptor-coalesced variant, round 5): the A
    stream is fetched as g/2 two-block DMAs — ``a_idx`` has (S*g/2,)
    pair-base slots and product 2i+1 implicitly uses slot
    ``a_idx[...]+1`` (the scheduler pairs products with adjacent A slots;
    unpaired products get a zero-B partner).  Stream capacities must then
    leave TWO trailing zero slots on the A side."""

    a_idx: jax.Array
    b_idx: jax.Array
    oloc: jax.Array
    slab: jax.Array
    first: jax.Array
    indices: jax.Array
    chunks: tuple
    n: int
    bsz: int
    g: int
    p: int
    nbz_out: int
    paired: bool = False


def _default_gp(bsz: int, g: int | None, p: int | None) -> tuple[int, int]:
    if g is None:
        g = _G
    if p is None:
        p = min(max(_SLAB_BYTES // (bsz * bsz * 4), 8), 128)
    return g, p


def _schedule(out_pos, s1_pos, s2_pos, pad1, pad2, n_out, indices,
              g, p, n, bsz) -> BsrPallasPlan:
    """Generic slab schedule: for product f, fetch stream-1 slot
    ``s1_pos[f]`` and stream-2 slot ``s2_pos[f]`` and accumulate their
    block product into output slot ``out_pos[f]`` (capacity ``n_out``).
    ``pad1``/``pad2`` are the streams' appended-zero slots.  Products are
    stably sorted by output slot; empty slabs still get one zeroing step."""
    out_pos = np.asarray(out_pos, np.int64)
    order = np.argsort(out_pos, kind="stable")
    out_s = out_pos[order]
    s1_s = np.asarray(s1_pos, np.int64)[order]
    s2_s = np.asarray(s2_pos, np.int64)[order]
    F = out_s.size
    step_cap = max(_SMEM_BUDGET // ((3 * g + 2) * 4), 256)
    while True:
        nslabs = max(-(-n_out // p), 1)
        slab_of_prod = out_s // p if F else np.zeros(0, np.int64)
        counts = np.bincount(slab_of_prod, minlength=nslabs) if F else \
            np.zeros(nslabs, np.int64)
        steps_per = -(-np.maximum(counts, 1) // g)
        # chunks split only on slab boundaries (each pallas_call owns a
        # contiguous output range), so no single slab may exceed the
        # SMEM-budgeted steps-per-call cap: shrink the slab size until it
        # fits (denser patterns -> fewer outputs per slab)
        if int(steps_per.max(initial=1)) <= step_cap:
            break
        if p == 1:
            raise ValueError(
                f"bsr_smsmm_pallas_prepare: one output block has "
                f"{int(counts.max())} products — more than the "
                f"{step_cap * g} a single pallas_call's scalar-prefetch "
                f"SMEM budget covers even at p=1; use bsr_smsmm_apply "
                f"for this pattern"
            )
        p = max(p // 2, 1)
    sstarts = np.zeros(nslabs + 1, np.int64)
    np.cumsum(steps_per, out=sstarts[1:])
    S = int(sstarts[-1])
    a_idx = np.full(S * g, pad1, np.int32)  # zero-block slot (pad)
    b_idx = np.full(S * g, pad2, np.int32)
    oloc = np.zeros(S * g, np.int32)  # pads aim at slab row 0 (add 0)
    if F:
        pstart = np.zeros(nslabs + 1, np.int64)
        np.cumsum(counts, out=pstart[1:])
        rank = np.arange(F) - pstart[slab_of_prod]
        pos = sstarts[slab_of_prod] * g + rank
        a_idx[pos] = s1_s
        b_idx[pos] = s2_s
        oloc[pos] = (out_s - slab_of_prod * p).astype(np.int32)
    slab_of_step = np.repeat(np.arange(nslabs, dtype=np.int64), steps_per)
    first = np.zeros(S, np.int32)
    first[sstarts[:-1]] = 1

    # chunk on slab boundaries so each call owns a contiguous output range;
    # chunk length is SMEM-budgeted: the prefetch tables cost (3g+2)*4 B/step
    chunks, slab_rel = _chunk_slabs(sstarts, slab_of_step, S, step_cap)

    return BsrPallasPlan(
        a_idx=jnp.asarray(a_idx),
        b_idx=jnp.asarray(b_idx),
        oloc=jnp.asarray(oloc),
        slab=jnp.asarray(slab_rel),
        first=jnp.asarray(first),
        indices=indices,
        chunks=tuple(chunks),
        n=n,
        bsz=bsz,
        g=g,
        p=p,
        nbz_out=n_out,
    )


def _schedule_paired(out_pos, s1_pos, s2_pos, pad1, pad2, n_out, indices,
                     g, p, n, bsz) -> BsrPallasPlan:
    """:func:`_schedule` with the A stream coalesced into two-block DMAs.

    Products within each slab are grouped by even-aligned A-slot WINDOW
    (slots {2w, 2w+1}) and any two products of one window share a single
    (2, bsz, bsz) fetch — a per-product row bit (packed into ``oloc``'s
    second-lowest bits, see below) selects which half each product reads,
    so (s, s), (s, s+1) and (s+1, s+1) combinations all pair (windowed
    pairing efficiency 0.95+ on the bench fixture: each A block is fetched
    ~9.5x).  Per step: g/2 A descriptors + g B descriptors instead of 2g —
    the ~25%-fewer-descriptors lever on a kernel measured
    descriptor-bound (~90 ns/fetch).  Reordering changes the
    within-slab-row accumulation order (still deterministic: fixed plan).
    Table encoding: ``a_idx`` is (S*g/2,) WINDOW indices (directly the
    (2, bsz, bsz) block index); ``oloc`` is (S*g,) ``row_in_slab * 2 +
    a_row_bit``.  ``pad1`` must be an even slot whose pair is zero blocks
    (callers append 2-3 zero blocks to reach even alignment)."""
    assert g % 2 == 0, "paired schedule needs an even g"
    assert pad1 % 2 == 0, "paired schedule needs an even-aligned zero pair"
    gp = g // 2
    out_pos = np.asarray(out_pos, np.int64)
    order = np.argsort(out_pos, kind="stable")
    out_s = out_pos[order]
    s1_s = np.asarray(s1_pos, np.int64)[order]
    s2_s = np.asarray(s2_pos, np.int64)[order]
    F = out_s.size
    step_cap = max(_SMEM_BUDGET // ((3 * g + gp + 2) * 4), 256)
    while True:
        nslabs = max(-(-n_out // p), 1)
        slab_of_prod = out_s // p if F else np.zeros(0, np.int64)
        counts = np.bincount(slab_of_prod, minlength=nslabs) if F else \
            np.zeros(nslabs, np.int64)
        # worst-case pair-slot need per slab (every product unpaired)
        if int((-(-np.maximum(counts, 1) // gp)).max(initial=1)) <= step_cap:
            break
        if p == 1:
            raise ValueError(
                "bsr_smsmm_pallas_prepare(paired): one output block "
                "exceeds the SMEM budget even at p=1; use the unpaired "
                "schedule"
            )
        p = max(p // 2, 1)

    pstart = np.zeros(nslabs + 1, np.int64)
    np.cumsum(counts, out=pstart[1:])
    # per slab: windowed pairing (order products by window, then chunk in
    # twos — equal windows are adjacent, so every full window pair shares
    # a fetch; the odd leftover of each window may still pair with the
    # next window's first product IF both land in one window... they
    # don't, so it emits as a single)
    slab_pairs = []  # (win, f1, f2) with f2 = -1 for singles
    steps_per = np.zeros(nslabs, np.int64)
    for sl in range(nslabs):
        lo, hi = int(pstart[sl]), int(pstart[sl + 1])
        if lo == hi:
            slab_pairs.append([])
            steps_per[sl] = 1
            continue
        win = s1_s[lo:hi] >> 1
        ordw = np.argsort(win, kind="stable")
        entries = []
        k = 0
        while k < ordw.size:
            f1 = lo + int(ordw[k])
            w = int(win[ordw[k]])
            if k + 1 < ordw.size and int(win[ordw[k + 1]]) == w:
                entries.append((w, f1, lo + int(ordw[k + 1])))
                k += 2
            else:
                entries.append((w, f1, -1))
                k += 1
        slab_pairs.append(entries)
        steps_per[sl] = -(-len(entries) // gp)

    sstarts = np.zeros(nslabs + 1, np.int64)
    np.cumsum(steps_per, out=sstarts[1:])
    S = int(sstarts[-1])
    a_idx = np.full(S * gp, pad1 >> 1, np.int32)  # pad window: zero pair
    b_idx = np.full(S * g, pad2, np.int32)
    oloc = np.zeros(S * g, np.int32)

    def put(ps, half, f):
        b_idx[2 * ps + half] = s2_s[f]
        sl = int(out_s[f]) // p
        oloc[2 * ps + half] = ((int(out_s[f]) - sl * p) << 1) | (
            int(s1_s[f]) & 1)

    for sl in range(nslabs):
        base = int(sstarts[sl])
        for k, (w, f1, f2) in enumerate(slab_pairs[sl]):
            ps = base * gp + k
            a_idx[ps] = w
            put(ps, 0, f1)
            if f2 >= 0:
                put(ps, 1, f2)
    slab_of_step = np.repeat(np.arange(nslabs, dtype=np.int64), steps_per)
    first_step = np.zeros(S, np.int32)
    first_step[sstarts[:-1]] = 1
    chunks, slab_rel = _chunk_slabs(sstarts, slab_of_step, S, step_cap)
    return BsrPallasPlan(
        a_idx=jnp.asarray(a_idx),
        b_idx=jnp.asarray(b_idx),
        oloc=jnp.asarray(oloc),
        slab=jnp.asarray(slab_rel),
        first=jnp.asarray(first_step),
        indices=indices,
        chunks=chunks,
        n=n,
        bsz=bsz,
        g=g,
        p=p,
        nbz_out=n_out,
        paired=True,
    )


def _chunk_slabs(sstarts, slab_of_step, S, step_cap):
    """Chunk the step range on slab boundaries (each pallas_call owns a
    contiguous output range) under the SMEM-budgeted per-call step cap.
    Returns (chunks, slab_rel) as in :class:`BsrPallasPlan`."""
    chunks = []
    s0 = 0
    while s0 < S:
        s1 = min(s0 + step_cap, S)
        if s1 < S:
            sl = slab_of_step[s1]
            s1 = int(sstarts[sl])
            if s1 <= s0:
                s1 = int(sstarts[sl + 1])
        sl0 = int(slab_of_step[s0])
        sl1 = int(slab_of_step[s1 - 1]) + 1
        chunks.append((s0, s1, sl0, sl1))
        s0 = s1
    slab_rel = (slab_of_step - np.repeat(
        np.asarray([c[2] for c in chunks], np.int64),
        np.asarray([c[1] - c[0] for c in chunks], np.int64),
    )).astype(np.int32) if S else np.zeros(0, np.int32)
    return tuple(chunks), slab_rel


def schedule_stacked(out_pos_list, s1_list, s2_list, pad1, pad2,
                     n_out: int, g: int | None, p: int | None, bsz: int):
    """Multi-shard slab schedule with a SHARED step/slab layout.

    For ``shard_map``: every shard must trace the same kernel, so the
    per-slab step count is equalized across shards (max over shards) and
    ``slab``/``first``/``chunks`` are shared; only the per-shard
    ``a_idx``/``b_idx``/``oloc`` tables differ.  Returns
    ``(a_idx, b_idx, oloc, first, slab, chunks, g, p)`` with the first
    three stacked ``(D, S*g)`` and ``first``/``slab`` shared ``(S,)``.
    Empty shards still zero their slabs (one inert step per slab)."""
    g, p = _default_gp(bsz, g, p)
    D = len(out_pos_list)
    step_cap = max(_SMEM_BUDGET // ((3 * g + 2) * 4), 256)
    srt = []
    for t in range(D):
        op = np.asarray(out_pos_list[t], np.int64)
        order = np.argsort(op, kind="stable")
        srt.append((op[order], np.asarray(s1_list[t], np.int64)[order],
                    np.asarray(s2_list[t], np.int64)[order]))
    while True:
        nslabs = max(-(-n_out // p), 1)
        counts = np.zeros((D, nslabs), np.int64)
        for t in range(D):
            if srt[t][0].size:
                counts[t] = np.bincount(srt[t][0] // p, minlength=nslabs)
        steps_per = -(-np.maximum(counts.max(axis=0), 1) // g)
        if int(steps_per.max(initial=1)) <= step_cap:
            break
        if p == 1:
            raise ValueError(
                "schedule_stacked: one output block exceeds a single "
                "pallas_call's scalar-prefetch SMEM budget even at p=1; "
                "use the XLA apply for this pattern"
            )
        p = max(p // 2, 1)
    sstarts = np.zeros(nslabs + 1, np.int64)
    np.cumsum(steps_per, out=sstarts[1:])
    S = int(sstarts[-1])
    a_idx = np.full((D, S * g), pad1, np.int32)
    b_idx = np.full((D, S * g), pad2, np.int32)
    oloc = np.zeros((D, S * g), np.int32)
    for t in range(D):
        out_s, s1_s, s2_s = srt[t]
        F = out_s.size
        if not F:
            continue
        slab_of_prod = out_s // p
        pstart = np.zeros(nslabs + 1, np.int64)
        np.cumsum(counts[t], out=pstart[1:])
        rank = np.arange(F) - pstart[slab_of_prod]
        pos = sstarts[slab_of_prod] * g + rank
        a_idx[t, pos] = s1_s
        b_idx[t, pos] = s2_s
        oloc[t, pos] = (out_s - slab_of_prod * p).astype(np.int32)
    slab_of_step = np.repeat(np.arange(nslabs, dtype=np.int64), steps_per)
    first = np.zeros(S, np.int32)
    first[sstarts[:-1]] = 1
    chunks, slab_rel = _chunk_slabs(sstarts, slab_of_step, S, step_cap)
    return a_idx, b_idx, oloc, first, slab_rel, chunks, g, p


def bsr_smsmm_pallas_prepare(plan: BsrSmsmmPlan, nbz_a: int, nbz_b: int,
                             g: int | None = None,
                             p: int | None = None,
                             paired: bool = False) -> BsrPallasPlan:
    """Host-side DMA schedule from a block-product plan (eager, once per
    pattern pair).  ``nbz_a``/``nbz_b``: the factor matrices' stored block
    capacities (the appended zero block lands at that slot).  Defaults from
    the chip sweep (docs/performance.md): ``g=24`` product pairs per grid
    step, slab size ``p`` targeting ~512 KB of VMEM.  ``paired=True``
    coalesces the A stream into two-block DMAs (:func:`_schedule_paired`)."""
    g, p = _default_gp(plan.bsz, g, p)
    sched = _schedule_paired if paired else _schedule
    # paired: the zero PAIR must start even-aligned — an odd capacity gets
    # one extra zero block (apply appends 2 + (nbz & 1) zeros to match)
    pad_a = nbz_a + (nbz_a & 1) if paired else nbz_a
    return sched(
        np.asarray(plan.seg), np.asarray(plan.a_pos), np.asarray(plan.b_pos),
        pad_a, nbz_b, plan.nbz_out, plan.indices,
        g, p, plan.n, plan.bsz,
    )


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["fwd", "da", "db"],
    meta_fields=[],
)
@dataclasses.dataclass(frozen=True)
class BsrPallasPlanAD:
    """Forward + two backward DMA schedules for the differentiable apply.

    ``da`` accumulates dC[seg] @ B[b_pos]^T into A's block slots; ``db``
    accumulates A[a_pos]^T @ dC[seg] into B's block slots (both the same
    kernel as ``fwd`` with permuted schedules)."""

    fwd: BsrPallasPlan
    da: BsrPallasPlan
    db: BsrPallasPlan


def bsr_smsmm_pallas_prepare_ad(plan: BsrSmsmmPlan, nbz_a: int, nbz_b: int,
                                g: int | None = None,
                                p: int | None = None) -> BsrPallasPlanAD:
    """Like :func:`bsr_smsmm_pallas_prepare`, plus the two gradient
    schedules consumed by :func:`bsr_smsmm_apply_pallas_ad`."""
    g, p = _default_gp(plan.bsz, g, p)
    seg = np.asarray(plan.seg)
    a_pos = np.asarray(plan.a_pos)
    b_pos = np.asarray(plan.b_pos)
    from ..ops.segmented import INDEX_DTYPE

    fwd = _schedule(seg, a_pos, b_pos, nbz_a, nbz_b, plan.nbz_out,
                    plan.indices, g, p, plan.n, plan.bsz)
    da = _schedule(a_pos, seg, b_pos, plan.nbz_out, nbz_b, nbz_a,
                   jnp.arange(nbz_a, dtype=INDEX_DTYPE),
                   g, p, plan.n, plan.bsz)
    db = _schedule(b_pos, a_pos, seg, nbz_a, plan.nbz_out, nbz_b,
                   jnp.arange(nbz_b, dtype=INDEX_DTYPE),
                   g, p, plan.n, plan.bsz)
    return BsrPallasPlanAD(fwd=fwd, da=da, db=db)


def _append_zero(blocks: jax.Array, dtype, k: int = 1) -> jax.Array:
    bsz = blocks.shape[-1]
    return jnp.concatenate(
        [blocks.astype(dtype), jnp.zeros((k, bsz, bsz), dtype)])


def _run_slabs(pplan: BsrPallasPlan, z1: jax.Array, z2: jax.Array,
               out_dtype, precision, interpret: bool) -> jax.Array:
    """Run the slab kernel over the plan's chunks.  ``z1``/``z2`` carry
    the appended zero block at the plan's pad slots.  Returns the
    (nbz_out, bsz, bsz) accumulated blocks."""
    return run_slabs_arrays(
        pplan.a_idx, pplan.b_idx, pplan.oloc, pplan.first, pplan.slab,
        z1, z2, chunks=pplan.chunks, bsz=pplan.bsz, g=pplan.g, p=pplan.p,
        nbz_out=pplan.nbz_out, out_dtype=out_dtype, precision=precision,
        interpret=interpret, paired=pplan.paired,
    )


@partial(jax.jit, static_argnames=("chunks", "bsz", "g", "p", "nbz_out",
                                   "out_dtype", "precision", "interpret",
                                   "paired"))
def run_slabs_arrays(p_a_idx, p_b_idx, p_oloc, p_first, p_slab,
                     z1: jax.Array, z2: jax.Array, *, chunks, bsz: int,
                     g: int, p: int, nbz_out: int, out_dtype, precision,
                     interpret: bool, paired: bool = False) -> jax.Array:
    """Raw-array slab-kernel core: :func:`_run_slabs` operating directly on
    the schedule arrays.  Split out so the SAME DMA-gathered kernel runs
    inside ``shard_map`` bodies — parallel/pbsr.py stacks per-shard
    schedules (slab/step layout equalized across shards) and calls this per
    shard after the block exchange.

    Module-level jit: each pallas_call receives ``z1``/``z2`` g times (one
    BlockSpec per DMA stream); under jit the 2g references CSE into two
    parameters, while an EAGER dispatch would give the executable 2g
    distinct parameters and layout assignment would materialize 2g padded
    copies of the factor storage — measured 18 GB of HBM (4x lane padding
    at bsz=32, 48 copies) on the 181k-product fixture, an instant OOM."""

    na = g // 2 if paired else g  # A-stream ref count

    def kernel(a_idx, b_idx, oloc, first, slab, *refs):
        arefs = refs[:na]
        brefs = refs[na:na + g]
        o_ref = refs[na + g]
        t = pl.program_id(0)

        @pl.when(first[t] == 1)
        def _():
            o_ref[...] = jnp.zeros_like(o_ref)

        # one batched MXU einsum for the step's G products (XLA's batched
        # matmul sustains 1.2 TFLOP/s on (F,32,32) operands — G tiny
        # sequential dots measured ~4x slower)
        if paired:
            # each (2, bsz, bsz) fetch feeds two products of its window;
            # the packed row bit selects which half each product reads
            ga = jnp.stack([
                jnp.where((oloc[t * g + i] & 1) == 1,
                          arefs[i // 2][1], arefs[i // 2][0])
                for i in range(g)
            ])
        else:
            ga = jnp.stack([arefs[i][0] for i in range(g)])
        gb = jnp.stack([brefs[i][0] for i in range(g)])
        prods = jax.lax.dot_general(
            ga, gb,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=o_ref.dtype,
            precision=precision,
        )
        shift = 1 if paired else 0
        for i in range(g):
            o_ref[pl.ds(oloc[t * g + i] >> shift, 1)] += prods[i][None]

    if nbz_out == 0:
        return jnp.zeros((0, bsz, bsz), out_dtype)

    pieces = []
    for (s0, s1, sl0, sl1) in chunks:
        ns = s1 - s0
        nsl = sl1 - sl0

        if paired:
            def aspec(i):
                # (2, bsz, bsz) block over the A stream: a_idx holds the
                # even-aligned WINDOW index (block units) — one DMA fetches
                # both slots of the window
                return pl.BlockSpec(
                    (2, bsz, bsz),
                    lambda t, ai, bi, ol, fr, sl, i=i: (
                        ai[t * na + i], _Z, _Z),
                )
        else:
            def aspec(i):
                return pl.BlockSpec(
                    (1, bsz, bsz),
                    lambda t, ai, bi, ol, fr, sl, i=i: (
                        ai[t * g + i], _Z, _Z),
                )

        def bspec(i):
            return pl.BlockSpec(
                (1, bsz, bsz),
                lambda t, ai, bi, ol, fr, sl, i=i: (bi[t * g + i], _Z, _Z),
            )

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=5,
            grid=(ns,),
            in_specs=[aspec(i) for i in range(na)]
            + [bspec(i) for i in range(g)],
            out_specs=pl.BlockSpec(
                (p, bsz, bsz),
                lambda t, ai, bi, ol, fr, sl: (sl[t], _Z, _Z),
            ),
        )
        out = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((nsl * p, bsz, bsz), out_dtype),
            cost_estimate=pl.CostEstimate(
                flops=2 * ns * g * bsz ** 3,
                bytes_accessed=ns * g * 2 * bsz * bsz * 4
                + nsl * p * bsz * bsz * 4,
                transcendentals=0,
            ),
            interpret=interpret,
        )(
            jax.lax.dynamic_slice(p_a_idx, (s0 * na,), (ns * na,)),
            jax.lax.dynamic_slice(p_b_idx, (s0 * g,), (ns * g,)),
            jax.lax.dynamic_slice(p_oloc, (s0 * g,), (ns * g,)),
            jax.lax.dynamic_slice(p_first, (s0,), (ns,)),
            jax.lax.dynamic_slice(p_slab, (s0,), (ns,)),
            *([z1] * na),
            *([z2] * g),
        )
        pieces.append(out)
    blocks = pieces[0] if len(pieces) == 1 else jnp.concatenate(pieces)
    return blocks[:nbz_out]


def _resolve_precision(precision, out_dtype):
    if precision is None and jnp.dtype(out_dtype) == jnp.float32:
        return jax.lax.Precision.HIGHEST
    return precision


def bsr_smsmm_apply_pallas(pplan: BsrPallasPlan, a: BSR, b: BSR, *,
                           precision=None,
                           interpret: bool = False) -> BSR:
    """Numeric block-SpGEMM via DMA-gathered factor blocks (values may
    change, block structure must not).  jit-compatible, deterministic
    (products accumulate in plan order within each slab row).  Not
    differentiable — use :func:`bsr_smsmm_apply_pallas_ad` for autodiff."""
    out_dtype = jnp.result_type(a.dtype, b.dtype)
    precision = _resolve_precision(precision, out_dtype)
    ka = 2 + (a.blocks.shape[0] & 1) if pplan.paired else 1
    blocks = _run_slabs(
        pplan,
        _append_zero(a.blocks, out_dtype, ka),
        _append_zero(b.blocks, out_dtype),
        out_dtype, precision, interpret,
    )
    return BSR(indices=pplan.indices, blocks=blocks, n=pplan.n, bsz=pplan.bsz)


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def _apply_ad(static, plans: BsrPallasPlanAD, a_blocks, b_blocks):
    precision, interpret = static
    out_dtype = jnp.result_type(a_blocks.dtype, b_blocks.dtype)
    prec = _resolve_precision(precision, out_dtype)
    return _run_slabs(
        plans.fwd,
        _append_zero(a_blocks, out_dtype),
        _append_zero(b_blocks, out_dtype),
        out_dtype, prec, interpret,
    )


def _apply_ad_fwd(static, plans, a_blocks, b_blocks):
    return _apply_ad(static, plans, a_blocks, b_blocks), \
        (plans, a_blocks, b_blocks)


def _apply_ad_bwd(static, res, ct):
    precision, interpret = static
    plans, a_blocks, b_blocks = res
    out_dtype = jnp.result_type(a_blocks.dtype, b_blocks.dtype)
    prec = _resolve_precision(precision, out_dtype)
    zc = _append_zero(ct, out_dtype)
    # dA[a_pos] += dC[seg] @ B[b_pos]^T
    da = _run_slabs(
        plans.da, zc,
        _append_zero(b_blocks.transpose(0, 2, 1), out_dtype),
        out_dtype, prec, interpret,
    ).astype(a_blocks.dtype)
    # dB[b_pos] += A[a_pos]^T @ dC[seg]
    db = _run_slabs(
        plans.db,
        _append_zero(a_blocks.transpose(0, 2, 1), out_dtype),
        zc,
        out_dtype, prec, interpret,
    ).astype(b_blocks.dtype)
    plans_ct = jax.tree_util.tree_map(
        lambda x: np.zeros(x.shape, jax.dtypes.float0), plans)
    return plans_ct, da, db


_apply_ad.defvjp(_apply_ad_fwd, _apply_ad_bwd)


def bsr_smsmm_apply_pallas_ad(plans: BsrPallasPlanAD, a: BSR, b: BSR, *,
                              precision=None,
                              interpret: bool = False) -> BSR:
    """Differentiable :func:`bsr_smsmm_apply_pallas`: the custom VJP runs
    both gradient products through the SAME DMA-gathered slab kernel
    (permuted schedules from :func:`bsr_smsmm_pallas_prepare_ad`), so
    backward runs at forward speed instead of the XLA gather wall."""
    blocks = _apply_ad((precision, interpret), plans, a.blocks, b.blocks)
    return BSR(indices=plans.fwd.indices, blocks=blocks,
               n=plans.fwd.n, bsz=plans.fwd.bsz)
