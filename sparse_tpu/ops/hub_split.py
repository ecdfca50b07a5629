"""Hub/tail split SpMV for power-law (webbase-class) patterns.

Scrambled power-law graphs defeat every locality layout at scale: an
8-row block's columns span the whole column space, so segment-tile fill
collapses (~0.0013 at 1M rows — rejected by dispatch) and the XLA
scalar-gather path's ~0.05 Gnnz/s wall is all that remains
(docs/performance.md "Graph / power-law class").  What the class DOES
have is a heavy-tailed degree distribution: a thin strip of hub columns
carries a disproportionate share of the mass.  This module routes that
strip through the segment-tile kernel and the tail through the XLA path:

* hubs = the top-degree columns, remapped to a COMPACT space ordered by
  descending degree so entry mass concentrates in the first operand
  window(s) — window locality MANUFACTURED from degree skew, no matter
  how scattered the original columns are;
* tail = everything else, on the row-binned XLA path.

``y = hub_tiles(v[hub_cols]) + tail_xla(v)`` — exact, deterministic.
Measured on the 1M-row/16M-edge webbase-class fixture (round 5): the
degree mass is flatter than the early estimate (top 4096 columns carry
6.7%, top 16384 carry 13.4%), and the realized end-to-end factor vs the
XLA fallback is **1.36x at H=16384** (1.29x at 4096, 1.33x at 65536 —
bigger strips dilute hub fill faster than they drain the tail); the
suite pins the factor.  Reference semantics: the split is invisible
(smvm contract, compressed.fut:134-146).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..formats.csr import CSR
from .pallas_csr import SegTilePlan, build_seg_tiles, csr_smvm_segtile
from .spmv import SpmvPlan, build_spmv_plan, csr_smvm_fast

__all__ = ["HubSplit", "hub_split_prepare", "hub_split_smvm",
           "hub_mass_fraction", "DEFAULT_HUB_COLS"]

#: Default hub-strip width: four wsub=32 operand windows — the measured
#: sweet spot of the chip sweep (module docstring).
DEFAULT_HUB_COLS = 32 * 128 * 4


def hub_mass_fraction(a: CSR, max_hub_cols: int | None = None) -> float:
    """Fraction of stored entries carried by the top-degree column strip
    (the strip :func:`hub_split_prepare` would take) — a pure degree-
    histogram computation, cheap enough to GATE the full split build
    (ops/dispatch.py uses it before paying the two CSR extractions)."""
    n, m = a.shape
    H = min(max_hub_cols if max_hub_cols is not None else DEFAULT_HUB_COLS,
            m)
    k = int(np.asarray(a.indptr)[-1])
    if k == 0 or H == 0:
        return 0.0
    deg = np.bincount(np.asarray(a.indices[:k], np.int64), minlength=m)
    top = np.partition(deg, m - H)[m - H:].sum() if H < m else k
    return float(top / k)


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["hub_csr", "hub_plan", "tail_csr", "tail_plan", "hub_cols"],
    meta_fields=["shape", "hub_nnz", "tail_nnz"],
)
@dataclasses.dataclass(frozen=True)
class HubSplit:
    """Prepared hub/tail split (pattern + value bound, like every plan)."""

    hub_csr: CSR
    hub_plan: SegTilePlan
    tail_csr: CSR
    tail_plan: SpmvPlan
    hub_cols: jax.Array  # (H,) original column ids of the hub strip
    shape: tuple[int, int]
    hub_nnz: int
    tail_nnz: int

    @property
    def hub_fraction(self) -> float:
        """Fraction of stored entries routed through the tile kernel."""
        tot = self.hub_nnz + self.tail_nnz
        return self.hub_nnz / tot if tot else 0.0


def hub_split_prepare(a: CSR, max_hub_cols: int | None = None,
                      wsub: int = 32) -> HubSplit:
    """Host-side split (eager, once per pattern + values).

    ``max_hub_cols`` defaults to ``DEFAULT_HUB_COLS`` (= 16384: four
    operand windows — the measured sweet spot of the chip sweep, see
    module docstring); hubs are the highest-degree columns.  Works for any
    square/rectangular CSR; only worth it when the degree distribution is
    heavy-tailed (check ``HubSplit.hub_fraction``)."""
    n, m = a.shape
    H = min(max_hub_cols if max_hub_cols is not None else DEFAULT_HUB_COLS,
            m)
    indptr = np.asarray(a.indptr, np.int64)
    k = int(indptr[-1])
    cols = np.asarray(a.indices[:k], np.int64)
    data = np.asarray(a.data[:k])
    deg = np.bincount(cols, minlength=m)
    hub_ids = np.argpartition(deg, m - H)[m - H:] if H < m \
        else np.arange(m, dtype=np.int64)
    # compact space ordered by DESCENDING degree: the heaviest columns own
    # the lowest compact ids, so entry mass concentrates at the window
    # anchored near 0 and larger hub strips (several windows) still tile
    # densely — measured necessary once the strip exceeds one window
    hub_ids = hub_ids[np.argsort(-deg[hub_ids], kind="stable")]
    is_hub = np.zeros(m, bool)
    is_hub[hub_ids] = True
    compact = np.zeros(m, np.int64)
    compact[hub_ids] = np.arange(hub_ids.size)

    sel = is_hub[cols]
    rows = np.repeat(np.arange(n, dtype=np.int64), np.diff(indptr))

    def build(mask, ncols, remap):
        r = rows[mask]
        c = cols[mask]
        d = data[mask]
        ptr = np.zeros(n + 1, np.int64)
        np.cumsum(np.bincount(r, minlength=n), out=ptr[1:])
        return CSR(
            data=jnp.asarray(d),
            indices=jnp.asarray((remap[c] if remap is not None else c)
                                .astype(np.int32)),
            indptr=jnp.asarray(ptr.astype(np.int64)),
            shape=(n, ncols),
        )

    hub_csr = build(sel, hub_ids.size, compact)
    tail_csr = build(~sel, m, None)
    return HubSplit(
        hub_csr=hub_csr,
        hub_plan=build_seg_tiles(hub_csr, wsub=wsub),
        tail_csr=tail_csr,
        tail_plan=build_spmv_plan(tail_csr),
        hub_cols=jnp.asarray(hub_ids.astype(np.int32)),
        shape=(n, m),
        hub_nnz=int(sel.sum()),
        tail_nnz=int(k - sel.sum()),
    )


def hub_split_smvm(split: HubSplit, v: jax.Array, *,
                   interpret: bool = False) -> jax.Array:
    """SpMV through the split: hub strip on the segment-tile kernel (its
    whole compact operand is one VMEM window), tail on the row-binned XLA
    path.  jit-compatible given the plan; matches ``csr_smvm`` up to float
    summation order."""
    v = jnp.asarray(v)
    n, m = split.shape
    if v.shape != (m,):
        raise ValueError(f"hub_split_smvm: vector shape {v.shape} != ({m},)")
    y_hub = csr_smvm_segtile(split.hub_csr, v[split.hub_cols],
                             split.hub_plan, interpret=interpret)
    y_tail = csr_smvm_fast(split.tail_csr, v, split.tail_plan)
    return y_hub + y_tail
