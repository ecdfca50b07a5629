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

__all__ = ["BsrPallasPlan", "bsr_smsmm_pallas_prepare", "bsr_smsmm_apply_pallas"]

_G = 24  # product pairs per grid step (chip sweep: 338 GFLOP/s at g=24)
_SLAB_BYTES = 512 * 1024  # target output-slab footprint -> default p
_SMEM_BUDGET = 700_000  # bytes of scalar-prefetch tables per pallas_call


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["a_idx", "b_idx", "oloc", "slab", "first", "indices"],
    meta_fields=["chunks", "n", "bsz", "g", "p", "nbz_out"],
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
    coordinates."""

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


def bsr_smsmm_pallas_prepare(plan: BsrSmsmmPlan, nbz_a: int, nbz_b: int,
                             g: int | None = None,
                             p: int | None = None) -> BsrPallasPlan:
    """Host-side DMA schedule from a block-product plan (eager, once per
    pattern pair).  ``nbz_a``/``nbz_b``: the factor matrices' stored block
    capacities (the appended zero block lands at that slot).  Defaults from
    the chip sweep (docs/performance.md): ``g=24`` product pairs per grid
    step, slab size ``p`` targeting ~512 KB of VMEM."""
    if g is None:
        g = _G
    if p is None:
        p = min(max(_SLAB_BYTES // (plan.bsz * plan.bsz * 4), 8), 128)
    seg = np.asarray(plan.seg)
    a_pos = np.asarray(plan.a_pos)
    b_pos = np.asarray(plan.b_pos)
    nse_out = plan.nbz_out
    nslabs = max(-(-nse_out // p), 1)
    # products of slab s = the contiguous seg range [p0, p1) (seg sorted)
    slab_of_prod = seg // p if seg.size else np.zeros(0, np.int64)
    counts = np.bincount(slab_of_prod, minlength=nslabs) if seg.size else \
        np.zeros(nslabs, np.int64)
    steps_per = -(-np.maximum(counts, 1) // g)
    sstarts = np.zeros(nslabs + 1, np.int64)
    np.cumsum(steps_per, out=sstarts[1:])
    S = int(sstarts[-1])
    a_idx = np.full(S * g, nbz_a, np.int32)  # zero-block slot (pad)
    b_idx = np.full(S * g, nbz_b, np.int32)
    oloc = np.zeros(S * g, np.int32)  # pads aim at slab row 0 (add 0)
    if seg.size:
        pstart = np.zeros(nslabs + 1, np.int64)
        np.cumsum(counts, out=pstart[1:])
        rank = np.arange(seg.size) - pstart[slab_of_prod]
        pos = sstarts[slab_of_prod] * g + rank
        a_idx[pos] = a_pos
        b_idx[pos] = b_pos
        oloc[pos] = (seg - slab_of_prod * p).astype(np.int32)
    slab_of_step = np.repeat(np.arange(nslabs, dtype=np.int64), steps_per)
    first = np.zeros(S, np.int32)
    first[sstarts[:-1]] = 1

    # chunk on slab boundaries so each call owns a contiguous output range;
    # chunk length is SMEM-budgeted: the prefetch tables cost (3g+2)*4 B/step
    step_cap = max(_SMEM_BUDGET // ((3 * g + 2) * 4), 256)
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

    return BsrPallasPlan(
        a_idx=jnp.asarray(a_idx),
        b_idx=jnp.asarray(b_idx),
        oloc=jnp.asarray(oloc),
        slab=jnp.asarray(slab_rel),
        first=jnp.asarray(first),
        indices=plan.indices,
        chunks=tuple(chunks),
        n=plan.n,
        bsz=plan.bsz,
        g=g,
        p=p,
        nbz_out=nse_out,
    )


def bsr_smsmm_apply_pallas(pplan: BsrPallasPlan, a: BSR, b: BSR, *,
                           precision=None,
                           interpret: bool = False) -> BSR:
    """Numeric block-SpGEMM via DMA-gathered factor blocks (values may
    change, block structure must not).  jit-compatible, deterministic
    (products accumulate in plan order within each slab row)."""
    bsz, g, p = pplan.bsz, pplan.g, pplan.p
    out_dtype = jnp.result_type(a.dtype, b.dtype)
    nbz_out = pplan.nbz_out
    if nbz_out == 0:
        return BSR(indices=pplan.indices,
                   blocks=jnp.zeros((0, bsz, bsz), out_dtype),
                   n=pplan.n, bsz=bsz)
    # appended zero block = the padding target of short steps
    za = jnp.concatenate(
        [a.blocks.astype(out_dtype), jnp.zeros((1, bsz, bsz), out_dtype)])
    zb = jnp.concatenate(
        [b.blocks.astype(out_dtype), jnp.zeros((1, bsz, bsz), out_dtype)])
    if precision is None:
        precision = (jax.lax.Precision.HIGHEST
                     if jnp.dtype(out_dtype) == jnp.float32 else None)

    def kernel(a_idx, b_idx, oloc, first, slab, *refs):
        arefs = refs[:g]
        brefs = refs[g:2 * g]
        o_ref = refs[2 * g]
        t = pl.program_id(0)

        @pl.when(first[t] == 1)
        def _():
            o_ref[...] = jnp.zeros_like(o_ref)

        # one batched MXU einsum for the step's G products (XLA's batched
        # matmul sustains 1.2 TFLOP/s on (F,32,32) operands — G tiny
        # sequential dots measured ~4x slower)
        ga = jnp.stack([arefs[i][0] for i in range(g)])
        gb = jnp.stack([brefs[i][0] for i in range(g)])
        prods = jax.lax.dot_general(
            ga, gb,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=o_ref.dtype,
            precision=precision,
        )
        for i in range(g):
            o_ref[pl.ds(oloc[t * g + i], 1)] += prods[i][None]

    pieces = []
    for (s0, s1, sl0, sl1) in pplan.chunks:
        ns = s1 - s0
        nsl = sl1 - sl0

        def aspec(i):
            return pl.BlockSpec(
                (1, bsz, bsz),
                lambda t, ai, bi, ol, fr, sl, i=i: (ai[t * g + i], 0, 0),
            )

        def bspec(i):
            return pl.BlockSpec(
                (1, bsz, bsz),
                lambda t, ai, bi, ol, fr, sl, i=i: (bi[t * g + i], 0, 0),
            )

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=5,
            grid=(ns,),
            in_specs=[aspec(i) for i in range(g)]
            + [bspec(i) for i in range(g)],
            out_specs=pl.BlockSpec(
                (p, bsz, bsz),
                lambda t, ai, bi, ol, fr, sl: (sl[t], 0, 0),
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
            jax.lax.dynamic_slice(pplan.a_idx, (s0 * g,), (ns * g,)),
            jax.lax.dynamic_slice(pplan.b_idx, (s0 * g,), (ns * g,)),
            jax.lax.dynamic_slice(pplan.oloc, (s0 * g,), (ns * g,)),
            jax.lax.dynamic_slice(pplan.first, (s0,), (ns,)),
            jax.lax.dynamic_slice(pplan.slab, (s0,), (ns,)),
            *([za] * g),
            *([zb] * g),
        )
        pieces.append(out)
    blocks = pieces[0] if len(pieces) == 1 else jnp.concatenate(pieces)
    return BSR(indices=pplan.indices, blocks=blocks[:nbz_out],
               n=pplan.n, bsz=bsz)
