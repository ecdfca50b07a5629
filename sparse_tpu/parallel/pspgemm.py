"""Distributed SpGEMM and transpose for row-partitioned CSR.

SURVEY.md §2.3(3): distributed SpGEMM via operand redistribution.  1-D
row-partition algebra: ``C_i = A_i @ B`` — each shard's output row slab needs
*all* of B, so the communication step is an all-gather of B's (padded,
per-shard) CSR arrays over ICI; the compute step is the same jit ESC core as
single-device SpGEMM (``ops/spgemm.spgemm_products``), fed the gathered
storage through its generalized (starts, lengths) row interface so per-shard
padding gaps need no repacking.  Output stays row-partitioned — chained
multiplies never leave the devices.

``pcsr_transpose`` repartitions A^T by rows (= A by columns); the current
implementation is the eager host-side repartition (construction-time
operation); the device-side variant is the halo-style padded ``all_to_all``
of COO triples (parallel/halo.py demonstrates the plan machinery).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..formats.coo import COO
from ..formats.csr import CSR, csr_from_coo
from ..ops.segmented import INDEX_DTYPE
from ..ops.spgemm import spgemm_products
from .pcsr import PCSR, pcsr_from_csr

__all__ = ["pcsr_spgemm", "pcsr_transpose"]


def _local_csr(data, indices, indptr, rows_p, m):
    return CSR(data=data, indices=indices, indptr=indptr, shape=(rows_p, m))


def pcsr_spgemm(a: PCSR, b: PCSR, mesh: Mesh,
                expansion_nse: int | None = None) -> PCSR:
    """C = A @ B, both row-partitioned over the same mesh axis; returns C
    row-partitioned with per-shard capacity ``expansion_nse`` (computed
    eagerly as the max per-shard product count when None)."""
    n, m = a.shape
    m2, k = b.shape
    if m != m2:
        raise ValueError(f"pcsr_spgemm: inner dims {a.shape} @ {b.shape}")
    if a.axis != b.axis or a.n_shards != b.n_shards:
        raise ValueError("pcsr_spgemm: operands must share the mesh axis")
    ax = a.axis
    d = a.n_shards
    rows_p = a.rows_per_shard
    b_rows_p = b.rows_per_shard

    if expansion_nse is None:
        # symbolic sizing pass (host): per-shard product counts
        b_ptr = np.asarray(b.indptr)
        b_lens_global = np.concatenate(
            [b_ptr[s, 1:] - b_ptr[s, :-1] for s in range(d)]
        )[:m]
        a_ptr = np.asarray(a.indptr)
        a_idx = np.asarray(a.indices)
        f = 0
        for s in range(d):
            valid = a_ptr[s, -1]
            f = max(f, int(b_lens_global[a_idx[s, :valid]].sum()))
        expansion_nse = max(f, 1)

    def body(a_data, a_idx, a_ptr, b_data, b_idx, b_ptr):
        # gather B's padded shard storage: rows stay contiguous per shard
        bd = jax.lax.all_gather(b_data[0], ax)  # (D, nse_p)
        bi = jax.lax.all_gather(b_idx[0], ax)
        bp = jax.lax.all_gather(b_ptr[0], ax)  # (D, b_rows_p+1)
        nse_p = bd.shape[1]
        starts = (
            bp[:, :-1] + (jnp.arange(d, dtype=bp.dtype) * nse_p)[:, None]
        ).reshape(-1)[:m]
        lens = (bp[:, 1:] - bp[:, :-1]).reshape(-1)[:m].astype(INDEX_DTYPE)
        local_a = _local_csr(a_data[0], a_idx[0], a_ptr[0], rows_p, m)
        prods = spgemm_products(
            local_a, bd.reshape(-1), bi.reshape(-1), starts, lens, k,
            expansion_nse,
        )
        c = csr_from_coo(
            COO(row=prods.row, col=prods.col, data=prods.data, shape=(rows_p, k))
        )
        return c.data[None], c.indices[None], c.indptr[None]

    f = shard_map(
        body,
        mesh=mesh,
        in_specs=(P(ax),) * 6,
        out_specs=(P(ax), P(ax), P(ax)),
    )
    cd, ci, cp = f(a.data, a.indices, a.indptr, b.data, b.indices, b.indptr)
    return PCSR(
        data=cd,
        indices=ci,
        indptr=cp,
        shape=(n, k),
        axis=ax,
        rows_per_shard=rows_p,
    )


def pcsr_transpose(a: PCSR, mesh: Mesh) -> PCSR:
    """A^T row-partitioned (eager repartition; see module docstring)."""
    n, m = a.shape
    # host-side: rebuild global CSR, transpose via COO, repartition
    ptrs = np.asarray(a.indptr)
    idxs = np.asarray(a.indices)
    vals = np.asarray(a.data)
    rows = []
    cols = []
    data = []
    for s in range(a.n_shards):
        for r in range(a.rows_per_shard):
            lo, hi = ptrs[s, r], ptrs[s, r + 1]
            gr = s * a.rows_per_shard + r
            if gr >= n:
                break
            rows.append(np.full(hi - lo, gr, np.int64))
            cols.append(idxs[s, lo:hi])
            data.append(vals[s, lo:hi])
    rows = np.concatenate(rows) if rows else np.zeros(0, np.int64)
    cols = np.concatenate(cols) if cols else np.zeros(0, np.int64)
    data = np.concatenate(data) if data else np.zeros(0, vals.dtype)
    at = csr_from_coo(
        COO(
            row=jnp.asarray(cols, INDEX_DTYPE),
            col=jnp.asarray(rows, INDEX_DTYPE),
            data=jnp.asarray(data),
            shape=(m, n),
        )
    )
    return pcsr_from_csr(at, mesh, axis=a.axis)
