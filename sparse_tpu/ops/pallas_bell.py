"""Pallas blocked-ELL SpMM kernel: scalar-prefetch-driven operand DMA.

The XLA BELL SpMM path (formats/bell.py) gathers operand panels into a
materialized (nb, Lb, bsz, k) intermediate — written once and read once,
i.e. 2x nnz*k*4 bytes of avoidable HBM traffic.  This kernel removes it:
``pltpu.PrefetchScalarGridSpec`` prefetches the block-column ids, the
operand BlockSpec's index_map uses them to DMA exactly the needed
``(bsz, k)`` panel of B per grid step, and the MXU consumes it straight from
VMEM while Mosaic pipelines the next step's DMA.  The output block stays
resident in VMEM across the ``l`` (window) axis and accumulates in place.

This is the canonical TPU sparse-dense kernel shape (the DMA engine does the
gathering).  Correctness is tested in interpreter mode on CPU; use real
hardware for performance.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..formats.bell import BELL

__all__ = ["bell_spmm_pallas"]


def _kernel(cols_ref, blk_ref, panel_ref, o_ref):
    @pl.when(pl.program_id(1) == 0)
    def _():
        o_ref[...] = jnp.zeros_like(o_ref)

    o_ref[...] += jax.lax.dot_general(
        blk_ref[0, 0],
        panel_ref[0],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=o_ref.dtype,
    )[None]


def bell_spmm_pallas(a: BELL, b: jax.Array, *, interpret: bool = False) -> jax.Array:
    """C[n, k] = A @ B with A blocked-ELL; one grid step per stored block.

    ``b`` must have k >= 128-friendly width for best MXU utilization; any k
    works.  jit-compatible (shapes static per BELL layout).
    """
    b = jnp.asarray(b)
    if b.ndim != 2 or b.shape[0] != a.n:
        raise ValueError(f"bell_spmm_pallas: operand shape {b.shape} != ({a.n}, k)")
    k = b.shape[1]
    nb, bsz, Lb = a.nb, a.bsz, a.Lb
    out_dtype = jnp.result_type(a.dtype, b.dtype)
    if a.n == 0 or Lb == 0 or k == 0:
        return jnp.zeros((a.n, k), out_dtype)
    b3 = b.reshape(nb, bsz, k).astype(out_dtype)
    blocks = a.blocks.astype(out_dtype)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb, Lb),
        in_specs=[
            pl.BlockSpec(
                (1, 1, bsz, bsz), lambda r, l, cols: (r, l, 0, 0)
            ),
            pl.BlockSpec(
                (1, bsz, k), lambda r, l, cols: (cols[r, l], 0, 0)
            ),
        ],
        out_specs=pl.BlockSpec((1, bsz, k), lambda r, l, cols: (r, 0, 0)),
    )
    out = pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nb, bsz, k), out_dtype),
        interpret=interpret,
    )(a.cols, blocks, b3)
    return out.reshape(a.n, k)
