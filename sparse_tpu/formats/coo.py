"""COO (coordinate) format: the construction/interchange format.

Mirrors the role of the reference's ``coo`` type (compressed.fut:66) and its
normalization pipeline ``sort_coo``/``merge_coo``/``norm_coo``
(compressed.fut:72-87), re-designed for XLA: every array has a *static* stored
capacity ``nse``; entries beyond the valid count are padding with the
row sentinel ``shape[0]`` (column sentinel ``shape[1]``, value 0).  Sorting
pushes padding to the end; scatter drops it.  All ops are jit-compatible.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.segmented import INDEX_DTYPE, asindex


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["row", "col", "data"],
    meta_fields=["shape"],
)
@dataclasses.dataclass(frozen=True)
class COO:
    """Padded COO matrix.

    Invariants:
      * ``row``/``col``/``data`` all have static length ``nse``.
      * Valid entries have ``0 <= row < n`` and ``0 <= col < m``.
      * Padding entries have ``row == n``, ``col == m``, ``data == 0``.
      * No ordering or uniqueness is implied; see :func:`coo_normalize`.
    """

    row: jax.Array
    col: jax.Array
    data: jax.Array
    shape: tuple[int, int]

    @property
    def nse(self) -> int:
        return self.data.shape[0]

    @property
    def dtype(self):
        return self.data.dtype

    # -- convenience wrappers -------------------------------------------------
    def todense(self) -> jax.Array:
        return coo_todense(self)

    def normalize(self) -> "COO":
        return coo_normalize(self)

    def valid_count(self) -> jax.Array:
        return jnp.sum(self.row < self.shape[0]).astype(INDEX_DTYPE)


def coo_make(shape, row, col, data) -> COO:
    """Build a COO from index/value arrays (all valid entries, no padding)."""
    return COO(
        row=asindex(row), col=asindex(col), data=jnp.asarray(data), shape=tuple(shape)
    )


def coo_from_triples(n: int, m: int, triples, dtype=None) -> COO:
    """Eager construction from ``[(r, c, v), ...]`` with bounds validation.

    Mirrors the reference constructor's bounds assert (compressed.fut:156) by
    raising ``ValueError`` host-side.  For jit-compatible construction from
    device arrays use :func:`coo_make` (out-of-bounds entries are dropped by
    scatter semantics there).
    """
    triples = list(triples)
    if triples:
        rows, cols, vals = zip(*triples)
    else:
        rows, cols, vals = (), (), ()
    rows = np.asarray(rows, dtype=np.int64)
    cols = np.asarray(cols, dtype=np.int64)
    vals = np.asarray(vals, dtype=dtype)
    if rows.size and (
        rows.min() < 0 or rows.max() >= n or cols.min() < 0 or cols.max() >= m
    ):
        raise ValueError(f"coordinate out of bounds for {n}x{m} matrix")
    return coo_make((n, m), rows, cols, vals)


def coo_pad_to(a: COO, nse: int) -> COO:
    """Pad (or error on shrink) to capacity ``nse`` with sentinel entries."""
    cur = a.nse
    if nse < cur:
        raise ValueError(f"cannot shrink COO capacity {cur} -> {nse}; use coo_compact")
    if nse == cur:
        return a
    n, m = a.shape
    extra = nse - cur
    return COO(
        row=jnp.concatenate([a.row, jnp.full((extra,), n, INDEX_DTYPE)]),
        col=jnp.concatenate([a.col, jnp.full((extra,), m, INDEX_DTYPE)]),
        data=jnp.concatenate([a.data, jnp.zeros((extra,), a.dtype)]),
        shape=a.shape,
    )


def coo_concatenate(a: COO, b: COO) -> COO:
    if a.shape != b.shape:
        raise ValueError(f"shape mismatch: {a.shape} vs {b.shape}")
    return COO(
        row=jnp.concatenate([a.row, b.row]),
        col=jnp.concatenate([a.col, b.col]),
        data=jnp.concatenate([a.data, b.data]),
        shape=a.shape,
    )


def coo_sort(a: COO) -> COO:
    """Sort entries by (row, col), padding (sentinel row n) last.

    Device-side equivalent of the reference's ``sort_coo`` merge sort
    (compressed.fut:72-74).  When the fused key ``row * (m+1) + col`` fits the
    index dtype, sort ONE key instead of two (roughly half the comparator
    work per sorting-network stage); padding ``(n, m)`` fuses to the maximum
    key, so it still sorts last.  Relies on the documented invariant
    ``0 <= col <= m`` — out-of-range columns would alias into other rows.
    """
    n, m = a.shape
    if (n + 1) * (m + 1) - 1 <= jnp.iinfo(INDEX_DTYPE).max:
        w = m + 1
        key = a.row * w + a.col
        key, data = jax.lax.sort((key, a.data), num_keys=1)
        return COO(
            row=(key // w).astype(INDEX_DTYPE),
            col=(key % w).astype(INDEX_DTYPE),
            data=data,
            shape=a.shape,
        )
    row, col, data = jax.lax.sort((a.row, a.col, a.data), num_keys=2)
    return COO(row=row, col=col, data=data, shape=a.shape)


def coo_normalize(a: COO) -> COO:
    """Sort by (row, col) and sum duplicates (reference ``norm_coo``,
    compressed.fut:86-87).  Output has the same static capacity; unique
    entries are packed at the front, the rest is padding.

    Duplicate summation is the mechanism behind sparse ``+``/``-``
    (compressed.fut:179-183); entries summing to zero stay *stored* (they
    count 0 in ``nnz`` but occupy a slot), matching reference semantics.
    """
    nse = a.nse
    n, m = a.shape
    if nse == 0:
        return a
    s = coo_sort(a)
    valid = s.row < n
    prev_row = jnp.roll(s.row, 1)
    prev_col = jnp.roll(s.col, 1)
    is_head = jnp.concatenate(
        [
            jnp.ones((1,), bool),
            (s.row[1:] != prev_row[1:]) | (s.col[1:] != prev_col[1:]),
        ]
    )
    is_head = is_head & valid
    # position of each entry's group in the packed output
    group = jnp.cumsum(is_head.astype(INDEX_DTYPE)) - 1
    # invalid entries scatter to the sentinel slot (dropped)
    target = jnp.where(valid, group, nse)
    out_data = jnp.zeros((nse,), a.dtype).at[target].add(s.data, mode="drop")
    out_row = jnp.full((nse,), n, INDEX_DTYPE).at[jnp.where(is_head, group, nse)].set(
        s.row, mode="drop"
    )
    out_col = jnp.full((nse,), m, INDEX_DTYPE).at[jnp.where(is_head, group, nse)].set(
        s.col, mode="drop"
    )
    # zero out padding values (slots never written stay 0 already)
    k = jnp.sum(is_head.astype(INDEX_DTYPE))
    pos = jnp.arange(nse, dtype=INDEX_DTYPE)
    out_data = jnp.where(pos < k, out_data, jnp.zeros((), a.dtype))
    return COO(row=out_row, col=out_col, data=out_data, shape=a.shape)


def coo_todense(a: COO) -> jax.Array:
    n, m = a.shape
    out = jnp.zeros((n, m), a.dtype)
    if a.nse == 0:
        return out
    return out.at[a.row, a.col].add(a.data, mode="drop")


def coo_from_dense(x: jax.Array, nse: int | None = None) -> COO:
    """Extract stored entries from a dense matrix.  With ``nse=None`` this is
    eager (concretizes the nonzero count); pass a static ``nse`` capacity to
    stay jit-compatible."""
    n, m = x.shape
    flat = x.reshape(-1)
    nz = flat != 0
    if nse is None:
        nse = int(jnp.sum(nz))  # host sync; eager only
    total = n * m
    # stable ordering: row-major positions of nonzeros first
    order = jnp.argsort(~nz, stable=True)
    idx = order[:nse] if nse <= total else jnp.concatenate(
        [order, jnp.zeros((nse - total,), order.dtype)]
    )
    taken_valid = (
        nz[idx]
        if nse <= total
        else jnp.concatenate([nz[order], jnp.zeros((nse - total,), bool)])
    )
    row = jnp.where(taken_valid, (idx // m).astype(INDEX_DTYPE), n)
    col = jnp.where(taken_valid, (idx % m).astype(INDEX_DTYPE), m)
    data = jnp.where(taken_valid, flat[idx], jnp.zeros((), x.dtype))
    return COO(row=row, col=col, data=data, shape=(n, m))


def coo_compact(a: COO) -> COO:
    """Eager: trim padding to the exact valid count (host sync)."""
    a = coo_normalize(a)
    k = int(a.valid_count())
    return COO(row=a.row[:k], col=a.col[:k], data=a.data[:k], shape=a.shape)


def coo_scale(v, a: COO) -> COO:
    return dataclasses.replace(a, data=a.data * v)


def coo_transpose(a: COO) -> COO:
    n, m = a.shape
    # swap roles; padding sentinels change from (n, m) to (m, n)
    pad = a.row >= n
    new_row = jnp.where(pad, jnp.asarray(m, INDEX_DTYPE), a.col)
    new_col = jnp.where(pad, jnp.asarray(n, INDEX_DTYPE), a.row)
    return COO(row=new_row, col=new_col, data=a.data, shape=(m, n))


def coo_nnz(a: COO) -> jax.Array:
    """Count stored values that are non-zero (reference nnz semantics,
    compressed.fut:162-164: explicit stored zeros do not count)."""
    n, _ = a.shape
    return jnp.sum((a.row < n) & (a.data != 0)).astype(INDEX_DTYPE)
