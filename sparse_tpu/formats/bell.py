"""BELL: blocked-ELL — the TPU speed-of-light storage for block-sparse SpMV.

Where BSR keeps a compressed list of blocks (``formats/bsr.py``), BELL lays
blocks out *pre-windowed* per block row: ``blocks[r, l]`` is the l-th stored
block of block row ``r`` (padded with zero blocks), with its block-column id
in ``cols[r, l]``.  SpMV/SpMM then touch the matrix purely by streaming —
no gather on the matrix side at all; the only gather is the operand chunk
``v[cols]`` at ``bsz``-granularity, which amortizes TPU per-gather cost.
Measured on v5e this removes the materialized window intermediate that keeps
the BSR fast path at ~1/3 of streaming bandwidth.

No reference counterpart (the reference's only block format is BSR,
blocked_square_regular.fut:179-183); semantics of ``bell_smvm`` match
``bsr_smvm`` exactly.  The padding cost is bounded by the block-row length
skew; convert from BSR once per pattern (``bell_from_bsr``).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.segmented import INDEX_DTYPE
from .bsr import BSR
from ..utils.precision import matmul_precision

__all__ = [
    "BELL",
    "bell_from_bsr",
    "bell_from_csr",
    "bell_smvm",
    "bell_spmm",
    "bell_todense",
]


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["cols", "blocks"],
    meta_fields=["n", "bsz"],
)
@dataclasses.dataclass(frozen=True)
class BELL:
    """Blocked-ELL matrix: ``blocks``: [nb, Lb, bsz, bsz]; ``cols``: [nb, Lb]
    block-column ids (0 for padding slots, whose blocks are all-zero)."""

    cols: jax.Array
    blocks: jax.Array
    n: int
    bsz: int

    @property
    def nb(self) -> int:
        return self.n // self.bsz

    @property
    def Lb(self) -> int:
        return self.cols.shape[1]

    @property
    def dtype(self):
        return self.blocks.dtype

    def __matmul__(self, other):
        other = jnp.asarray(other)
        if other.ndim == 1:
            return bell_smvm(self, other)
        if other.ndim == 2:
            return bell_spmm(self, other)
        return NotImplemented

    def todense(self) -> jax.Array:
        return bell_todense(self)


def bell_from_bsr(a: BSR, Lb: int | None = None) -> BELL:
    """Lay a BSR out as blocked-ELL (eager, once per sparsity pattern)."""
    nb, bsz = a.nb, a.bsz
    idxs = np.asarray(a.indices)
    blocks = np.asarray(a.blocks)
    valid = idxs < nb * nb
    rs = (idxs[valid] // nb).astype(np.int64)
    cs = (idxs[valid] % nb).astype(np.int64)
    vals = blocks[valid]
    lens = np.bincount(rs, minlength=nb)
    if Lb is None:
        Lb = int(lens.max()) if lens.size else 0
    out_blocks = np.zeros((nb, Lb, bsz, bsz), blocks.dtype)
    out_cols = np.zeros((nb, Lb), np.int32)
    # entries are sorted by (r, c); slot position = rank within the row
    starts = np.zeros(nb + 1, np.int64)
    np.cumsum(lens, out=starts[1:])
    slot = np.arange(rs.size) - starts[rs]
    keep = slot < Lb
    out_blocks[rs[keep], slot[keep]] = vals[keep]
    out_cols[rs[keep], slot[keep]] = cs[keep]
    return BELL(cols=jnp.asarray(out_cols), blocks=jnp.asarray(out_blocks),
                n=a.n, bsz=bsz)


def bell_from_csr(a, bsz: int, Lb: int | None = None) -> BELL:
    """Re-block a CSR into blocked-ELL (eager).  Fills explicit zeros inside
    touched blocks; worthwhile whenever the pattern has block locality."""
    from ..formats.bsr import bsr_compact, bsr_from_coo
    from ..formats.csr import csr_to_coo

    return bell_from_bsr(bsr_compact(bsr_from_coo(csr_to_coo(a), bsz)), Lb=Lb)


#: Fitted per-stored-block wall of :func:`bell_smvm` at bsz=32, k=1 on the
#: v5e: measured 5.2 ms / 78.1k blocks at the bench size = ~67 ns per block
#: of gather-index + (32, 32) x (32,) contraction issue, pipelined with the
#: block stream.  Feeds utils.stats.nnz_roofline's issue_s floor (the
#: kernel's 332 MB of traffic alone would take 1.6 ms at the 207 GB/s
#: ceiling — the contraction issue rate, not traffic, is binding).  Fitted,
#: not first-principles: falsifiable at other block counts via the suite's
#: frac_of_plan_ceiling row.
BELL_SPMV_NS_PER_BLOCK = 67.0


def bell_smvm_hbm_bytes(a: BELL) -> int:
    """HBM bytes one :func:`bell_smvm` moves: the block stream + block col
    ids + one gathered bsz-chunk per slot + the output (the plan_bytes term
    of utils.stats.nnz_roofline)."""
    slots = a.nb * a.Lb
    return slots * (a.bsz * a.bsz * 4 + 4 + a.bsz * 4) + a.n * 4


def bell_smvm(a: BELL, v: jax.Array) -> jax.Array:
    """Scatter-free, matrix-gather-free SpMV: stream blocks, gather operand
    chunks, contract on the VPU.

    This is the single production BELL SpMV path.  Measured bound on v5e at
    bsz=32 (honest jit-argument protocol, bench size): ~64 GB/s min-traffic
    effective — ~30% of the streaming ceiling.  The bound is the fitted
    per-block contraction-issue wall (``BELL_SPMV_NS_PER_BLOCK``, ~67 ns
    per stored block: bsz-wide VPU issues with k=1 amortize nothing), not
    traffic — the nnz/s roofline model reports the resulting structural
    fraction machine-checkably (suite ``bell_spmv_frac_of_nnz_roofline``).
    Two alternatives were built, measured, and deleted per the
    losing-kernel policy (docs/performance.md): a Pallas SpMV kernel
    (DMA-latency-bound at 37 GB/s — rt*Lb tiny 128 B chunk DMAs/step) and a
    pre-transposed prepare split (61.4 GB/s — no better than this path).
    Unstructured SpMV at higher rates goes through the CSR segment-tile
    kernel (ops/pallas_csr.py); SpMM amortizes the block stream over k
    columns and reaches 83-94% of ceiling (ops/pallas_bell.py)."""
    v = jnp.asarray(v)
    if v.shape != (a.n,):
        raise ValueError(f"bell_smvm: vector shape {v.shape} != ({a.n},)")
    out_dtype = jnp.result_type(a.dtype, v.dtype)
    if a.n == 0 or a.Lb == 0:
        return jnp.zeros((a.n,), out_dtype)
    vb = v.reshape(a.nb, a.bsz)[a.cols.reshape(-1)].reshape(
        a.nb, a.Lb, a.bsz
    )
    out = jnp.einsum("rlij,rlj->ri", a.blocks, vb,
                     precision=matmul_precision(a.dtype, vb.dtype))
    return out.reshape(a.n).astype(out_dtype)


def bell_spmm(a: BELL, b: jax.Array, *, prefer_pallas: bool | None = None,
              plan=None, compute_dtype=None, precision=None) -> jax.Array:
    """Blocked-ELL SpMM: batched (bsz x bsz) @ (bsz x k) on the MXU.

    On TPU backends this dispatches to a Pallas kernel by default: with a
    ``plan`` from ``ops.pallas_bell.build_banded_plan`` (matrices whose rows
    store consecutive block columns — bands/FEM), the dense-tile banded
    kernel (one wide MXU matmul + one window DMA per row tile, streaming-
    bound); otherwise the fused kernel (one block row per step, no
    materialized gather intermediate — the XLA path needs an (nb, Lb, bsz,
    k) temporary that caps its feasible size).  ``prefer_pallas=False``
    forces the XLA gather-einsum path.  ``compute_dtype=jnp.bfloat16``
    streams matrix+operand at half width with f32 accumulation (banded
    kernel only)."""
    b = jnp.asarray(b)
    if b.ndim != 2 or b.shape[0] != a.n:
        raise ValueError(f"bell_spmm: operand shape {b.shape} != ({a.n}, k)")
    k = b.shape[1]
    out_dtype = jnp.result_type(a.dtype, b.dtype)
    if a.n == 0 or a.Lb == 0 or k == 0:
        return jnp.zeros((a.n, k), out_dtype)
    if prefer_pallas is None:
        prefer_pallas = jax.default_backend() == "tpu"
    if prefer_pallas:
        if plan is not None:
            from ..ops.pallas_bell import (
                BandedKit,
                BandedKitT,
                bell_spmm_pallas_banded,
                bell_spmm_pallas_banded_t,
            )

            if isinstance(plan, BandedKitT):
                # small-k transposed kernel (k < 128 stops paying 128-lane
                # padding); this one-shot wrapper pays two n*k transposes —
                # iterative callers should chain bell_spmm_pallas_banded_t
                # in transposed space directly
                ct = bell_spmm_pallas_banded_t(
                    a, b.T, plan, precision=precision
                )
                return ct.T.astype(out_dtype)
            if isinstance(plan, BandedKit):
                return bell_spmm_pallas_banded(
                    a, b, plan.plan, tiles=plan.tiles,
                    compute_dtype=plan.tiles.dtype, precision=precision,
                )
            return bell_spmm_pallas_banded(
                a, b, plan, compute_dtype=compute_dtype, precision=precision,
            )
        from ..ops.pallas_bell import bell_spmm_pallas_fused

        return bell_spmm_pallas_fused(
            a, b, compute_dtype=compute_dtype, precision=precision
        )
    # XLA fallback honors compute_dtype the same way the kernels do: stream
    # both operands at the reduced width, accumulate in out_dtype.
    blocks = a.blocks if compute_dtype is None else a.blocks.astype(compute_dtype)
    panels = b.reshape(a.nb, a.bsz, k)[a.cols.reshape(-1)].reshape(
        a.nb, a.Lb, a.bsz, k
    )
    if compute_dtype is not None:
        panels = panels.astype(compute_dtype)
    out = jnp.einsum(
        "rlij,rljk->rik", blocks, panels,
        preferred_element_type=out_dtype,
        precision=(precision if precision is not None
                   else matmul_precision(blocks.dtype, panels.dtype)),
    )
    return out.reshape(a.n, k).astype(out_dtype)


def bell_todense(a: BELL) -> jax.Array:
    nb, bsz, Lb = a.nb, a.bsz, a.Lb
    out = jnp.zeros((nb, nb, bsz, bsz), a.dtype)
    r = jnp.repeat(jnp.arange(nb, dtype=INDEX_DTYPE), Lb)
    out = out.at[r, a.cols.reshape(-1)].add(
        a.blocks.reshape(nb * Lb, bsz, bsz)
    )
    return out.transpose(0, 2, 1, 3).reshape(a.n, a.n)
