"""Invariant validation: the debug-mode mirror of the reference's hard
``assert`` scheme (SURVEY.md §5.3).

The reference aborts on violated invariants (COO bounds compressed.fut:156,
one-per-row mono.fut:122-125, named asserts blocked_square_regular.fut:
175-177).  Our constructors validate eagerly where cheap; this module adds
explicit whole-structure checkers usable in tests/debug sessions — host-side,
with precise error messages — so the jit hot paths stay assertion-free.
"""

from __future__ import annotations

import numpy as np

from ..formats.bsr import BSR
from ..formats.coo import COO
from ..formats.csr import CSC, CSR, _csc_as_csr_t
from ..formats.mono import MSR

__all__ = ["validate_coo", "validate_csr", "validate_csc", "validate_bsr",
           "validate_msr", "validate_bell"]


class SparseInvariantError(AssertionError):
    pass


def _fail(msg: str):
    raise SparseInvariantError(msg)


def validate_coo(a: COO) -> None:
    """Entries in-bounds or exact padding sentinels; padding data zero."""
    n, m = a.shape
    row = np.asarray(a.row)
    col = np.asarray(a.col)
    data = np.asarray(a.data)
    pad = row == n
    if np.any((row < 0) | (row > n)):
        _fail(f"COO row ids outside [0, {n}]")
    if np.any(~pad & ((col < 0) | (col >= m))):
        _fail(f"COO column ids outside [0, {m}) on valid entries")
    if np.any(pad & (col != m)):
        _fail("COO padding entries must carry the column sentinel")
    if np.any(pad & (data != 0)):
        _fail("COO padding entries must carry zero data")


def validate_csr(a: CSR) -> None:
    """indptr monotone exclusive prefix; indices in-bounds, sorted & unique
    within rows on valid entries; padding zeroed."""
    n, m = a.shape
    indptr = np.asarray(a.indptr)
    indices = np.asarray(a.indices)
    data = np.asarray(a.data)
    if indptr.shape != (n + 1,):
        _fail(f"CSR indptr shape {indptr.shape} != ({n + 1},)")
    if n >= 0 and (indptr[0] != 0 or np.any(np.diff(indptr) < 0)):
        _fail("CSR indptr must be a monotone exclusive prefix starting at 0")
    k = int(indptr[-1]) if indptr.size else 0
    if k > a.nse:
        _fail(f"CSR valid count {k} exceeds capacity {a.nse}")
    if k and (indices[:k].min() < 0 or indices[:k].max() >= m):
        _fail(f"CSR column ids outside [0, {m})")
    for r in range(n):
        s, e = indptr[r], indptr[r + 1]
        if e - s > 1 and np.any(np.diff(indices[s:e]) <= 0):
            _fail(f"CSR row {r}: columns not strictly increasing")
    if np.any(indices[k:] != 0) or np.any(data[k:] != 0):
        _fail("CSR padding tail must be zeroed")


def validate_csc(a: CSC) -> None:
    validate_csr(_csc_as_csr_t(a))


def validate_msr(a: MSR) -> None:
    """One stored element per row, in-bounds (mono.fut:122-125 contract)."""
    n, m = a.shape
    col = np.asarray(a.col_idx)
    if col.shape != (n,) or np.asarray(a.vals).shape != (n,):
        _fail(f"MSR arrays must have one slot per row ({n})")
    if n and m == 0 and np.any(np.asarray(a.vals) != 0):
        _fail("MSR with zero columns must be all-zero")
    if n and m > 0 and (col.min() < 0 or col.max() >= m):
        _fail(f"MSR column ids outside [0, {m})")


def validate_bsr(a: BSR) -> None:
    """Indices sorted, unique, in-bounds or sentinel; padding blocks zero;
    bsz | n (blocked_square_regular.fut:175, 185)."""
    if a.n % a.bsz != 0:
        _fail(f"BSR block size {a.bsz} must divide n={a.n}")
    idxs = np.asarray(a.indices)
    blocks = np.asarray(a.blocks)
    sent = a.sentinel
    valid = idxs < sent
    if np.any(idxs < 0) or np.any(idxs > sent):
        _fail(f"BSR indices outside [0, {sent}]")
    vi = idxs[valid]
    if vi.size and np.any(np.diff(idxs.astype(np.int64)) < 0):
        _fail("BSR indices must be sorted ascending (sentinels last)")
    if vi.size != np.unique(vi).size:
        _fail("BSR valid block indices must be unique")
    if np.any(blocks[~valid] != 0):
        _fail("BSR padding blocks must be zero")


def validate_bell(a) -> None:
    """BELL invariants: bsz | n, block-column ids in [0, nb), padding slots
    (all-zero blocks) carry column id 0 (formats/bell.py layout contract)."""
    from ..formats.bell import BELL

    if not isinstance(a, BELL):
        _fail(f"validate_bell: expected BELL, got {type(a)}")
    if a.bsz <= 0 or a.n % a.bsz != 0:
        _fail(f"BELL block size {a.bsz} must divide n={a.n}")
    cols = np.asarray(a.cols)
    blocks = np.asarray(a.blocks)
    nb = a.nb
    if cols.shape != (nb, a.Lb) or blocks.shape != (nb, a.Lb, a.bsz, a.bsz):
        _fail("BELL cols/blocks shapes inconsistent with (nb, Lb, bsz)")
    if cols.size and (cols.min() < 0 or (nb and cols.max() >= nb)):
        _fail(f"BELL block-column ids outside [0, {nb})")
    stored = np.any(blocks != 0, axis=(2, 3))
    if np.any(~stored & (cols != 0)):
        _fail("BELL padding slots (all-zero blocks) must carry column id 0")
    # within a row, stored slots must not repeat a block column
    for r in range(nb):
        c = cols[r][stored[r]]
        if c.size != np.unique(c).size:
            _fail(f"BELL block row {r}: duplicate stored block columns")
