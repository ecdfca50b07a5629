"""SpGEMM: sparse x sparse matrix multiplication.

Semantics follow the reference's ``smsmm : sr[n][m] -> sc[m][k] -> sr[n][k]``
(compressed.fut:268-331): exact product with duplicate summation, stored
zeros preserved (cancellation produces explicit stored zeros, which ``nnz``
does not count).

The *algorithm* is deliberately different (per SURVEY.md §3.2 the reference's
all-targets expansion is Θ((nnzA·k + nnzB·n)·log) and was chosen for Futhark's
flat parallelism): we use the ESC (expand-sort-compress) row-wise Gustavson
formulation, which expands only *actual* multiply pairs — Θ(F log F) where F
= number of scalar products = sum over A entries of the matching B row length.

Static-shape protocol: the expansion size F is data-dependent, so the
jit-compatible core takes it as a static capacity.  The convenience wrapper
computes it eagerly (one host sync), mirroring how real sparse libraries do a
symbolic pass before the numeric pass.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..formats.coo import COO
from ..formats.csr import CSC, CSR, csr_from_coo, csr_to_coo, _csc_as_csr_t
from .segmented import INDEX_DTYPE, expand, row_ids_from_indptr


def _csc_to_csr(b: CSC) -> CSR:
    """Re-compress a CSC by rows (one device sort of nse entries)."""
    # The CSC's storage is the CSR of b^T; re-sorting its COO with axes
    # swapped yields the row-compressed form of b.
    t = _csc_as_csr_t(b)  # CSR of b^T, shape (k, m)
    coo_t = csr_to_coo(t)
    n_t, m_t = coo_t.shape
    pad = coo_t.row >= n_t
    swapped = COO(
        row=jnp.where(pad, jnp.asarray(m_t, INDEX_DTYPE), coo_t.col),
        col=jnp.where(pad, jnp.asarray(n_t, INDEX_DTYPE), coo_t.row),
        data=coo_t.data,
        shape=(m_t, n_t),
    )
    return csr_from_coo(swapped)


def spgemm_flops(a: CSR, b_rows: CSR) -> jax.Array:
    """Number of scalar products in A @ B (the expansion size F).

    This is the symbolic pass; eager callers concretize it to size the
    jit-compatible numeric pass.
    """
    sizes = _expansion_sizes(a, b_rows)
    return jnp.sum(sizes)


def _expansion_sizes(a: CSR, b_rows: CSR) -> jax.Array:
    """Per-A-entry count of partner entries in the matching B row."""
    n, m = a.shape
    if a.nse == 0:
        return jnp.zeros((0,), INDEX_DTYPE)
    a_rows = row_ids_from_indptr(a.indptr, a.nse)
    valid = a_rows < n
    b_row_len = (b_rows.indptr[1:] - b_rows.indptr[:-1]).astype(INDEX_DTYPE)
    safe_s = jnp.where(valid, a.indices, 0)
    if m == 0:
        return jnp.zeros((a.nse,), INDEX_DTYPE)
    return jnp.where(valid, b_row_len[safe_s], 0).astype(INDEX_DTYPE)


def spgemm_products(a: CSR, b_data, b_indices, b_starts, b_lens, k: int,
                    expansion_nse: int) -> COO:
    """ESC product expansion against a *generalized* row-compressed B given
    as (data, indices, per-row starts, per-row lengths) — rows need only be
    internally contiguous, which lets multi-shard gathered storage with
    per-shard padding gaps feed the same core (parallel/pspgemm.py).

    Returns the raw product COO (duplicates unmerged) with capacity
    ``expansion_nse``."""
    n, m = a.shape
    out_dtype = jnp.result_type(a.dtype, b_data.dtype)
    a_rows = row_ids_from_indptr(a.indptr, a.nse)
    valid = a_rows < n
    safe_s = jnp.where(valid, a.indices, 0)
    sizes = jnp.where(valid, b_lens[jnp.minimum(safe_s, max(m - 1, 0))], 0).astype(
        INDEX_DTYPE
    )
    elem_ids, inner_ids = expand(sizes, expansion_nse)
    live = elem_ids < a.nse
    e = jnp.where(live, elem_ids, 0)

    r = a_rows[e]  # target row (may be sentinel n for A padding)
    s = a.indices[e]  # shared index
    va = a.data[e]

    nse_b = b_data.shape[0]
    b_pos = b_starts[jnp.minimum(s, max(m - 1, 0))].astype(INDEX_DTYPE) + inner_ids
    b_pos = jnp.minimum(b_pos, max(nse_b - 1, 0))
    c = b_indices[b_pos]
    vb = b_data[b_pos]

    row = jnp.where(live & (r < n), r, jnp.asarray(n, INDEX_DTYPE))
    col = jnp.where(live & (r < n), c, jnp.asarray(k, INDEX_DTYPE))
    val = jnp.where(live & (r < n), va * vb, jnp.zeros((), out_dtype))
    return COO(row=row, col=col, data=val.astype(out_dtype), shape=(n, k))


@partial(jax.jit, static_argnames=("expansion_nse",))
def spgemm_csr_csr(a: CSR, b: CSR, expansion_nse: int) -> CSR:
    """jit-compatible ESC SpGEMM core: C = A @ B, both row-compressed.

    ``expansion_nse`` must be a static bound >= the true number of scalar
    products (see :func:`spgemm_flops`).  The result CSR has capacity
    ``expansion_nse`` with unique (row, col) entries packed at the front.
    Jitted at module level so eager calls hit the compile cache instead of
    dispatching the expand-sort-compress pipeline op-by-op.
    """
    n, m = a.shape
    m2, k = b.shape
    if m != m2:
        raise ValueError(f"spgemm: inner dims {a.shape} @ {b.shape}")
    out_dtype = jnp.result_type(a.dtype, b.dtype)
    if expansion_nse == 0 or a.nse == 0 or b.nse == 0:
        from ..formats.csr import csr_empty

        return csr_empty(n, k, expansion_nse, out_dtype)

    prods = spgemm_products(
        a,
        b.data,
        b.indices,
        b.indptr[:-1],
        (b.indptr[1:] - b.indptr[:-1]).astype(INDEX_DTYPE),
        k,
        expansion_nse,
    )
    return csr_from_coo(prods)


def spgemm(a: CSR, b, *, expansion_nse: int | None = None, compact: bool = True) -> CSR:
    """C = A @ B for sparse A (CSR) and sparse B (CSC or CSR).

    Matches the reference's ``smsmm`` contract (CSR x CSC -> CSR,
    compressed.fut:268-331).  With ``expansion_nse=None`` the symbolic pass
    runs eagerly (host sync) to size the numeric pass exactly; pass a static
    bound to stay fully jit-compatible.  ``compact`` (eager only) trims the
    result capacity to the exact stored-entry count.
    """
    b_rows = _csc_to_csr(b) if isinstance(b, CSC) else b
    if not isinstance(b_rows, CSR):
        raise TypeError(f"spgemm: expected CSR/CSC operand, got {type(b)}")
    if expansion_nse is None:
        f = int(spgemm_flops(a, b_rows))  # host sync (symbolic pass)
        out = spgemm_csr_csr(a, b_rows, f)
        if compact:
            from ..formats.csr import csr_compact

            out = csr_compact(out)
        return out
    return spgemm_csr_csr(a, b_rows, expansion_nse)
