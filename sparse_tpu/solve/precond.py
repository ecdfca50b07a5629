"""Preconditioners for the iterative solvers.

Block-Jacobi is the TPU-natural step up from elementwise Jacobi: setup is
one scatter into batched dense diagonal blocks plus a batched inverse (MXU
work), and application is a batched (bs, bs) matvec — no sparse triangular
solve on the critical path, fully jit-compatible, and GSPMD partitions the
batched apply cleanly when blocks align with shard boundaries (choose ``bs``
dividing the padded rows-per-shard).

No reference counterpart (the reference has no iterative solvers); the
direct-solver analogue is the BSR LU stack (solve/bsr_lu.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..formats.csr import CSR
from ..ops.segmented import INDEX_DTYPE, row_ids_from_indptr

__all__ = ["block_jacobi_prepare", "block_jacobi_apply"]


@partial(jax.jit, static_argnames=("bs", "padded_n"))
def block_jacobi_prepare(a: CSR, bs: int, padded_n: int | None = None
                         ) -> jax.Array:
    """Inverses of the ``bs x bs`` diagonal blocks of a square CSR.

    Returns ``(padded_n // bs, bs, bs)`` with ``padded_n`` rounded up to a
    multiple of ``bs`` (default: the matrix size).  Blocks beyond ``n`` and
    zero diagonal entries are patched to identity, so padding slots pass
    through unchanged and a singular stored block cannot poison the solve.
    jit-compatible (value-dependent only through ``a.data``).
    """
    n, m = a.shape
    if n != m:
        raise ValueError(f"block_jacobi_prepare: square matrix required, got {a.shape}")
    L = padded_n if padded_n is not None else n
    L = -(-max(L, 1) // bs) * bs
    if L < n:
        raise ValueError(f"block_jacobi_prepare: padded_n {L} < n {n}")
    nbk = L // bs
    rows = row_ids_from_indptr(a.indptr, a.nse)
    cols = a.indices
    valid = rows < n
    in_diag = valid & (rows // bs == cols // bs)
    flat = jnp.where(
        in_diag,
        (rows // bs) * (bs * bs) + (rows % bs) * bs + (cols % bs),
        jnp.asarray(nbk * bs * bs, INDEX_DTYPE),
    )
    blocks = (
        jnp.zeros((nbk * bs * bs + 1,), a.dtype)
        .at[flat].add(a.data, mode="drop")[:-1]
        .reshape(nbk, bs, bs)
    )
    # patch zero diagonal entries (incl. all-padding blocks) to 1
    d = jnp.diagonal(blocks, axis1=1, axis2=2)
    blocks = blocks + jnp.eye(bs, dtype=a.dtype)[None] * (d == 0)[:, :, None]
    return jnp.linalg.inv(blocks)


def block_jacobi_apply(inv_blocks: jax.Array, v: jax.Array) -> jax.Array:
    """Apply the block-Jacobi preconditioner: ``z = diag(B_i^{-1}) v``.

    ``v`` has length ``nbk * bs`` (the padded length the blocks were
    prepared for)."""
    nbk, bs, _ = inv_blocks.shape
    if v.shape != (nbk * bs,):
        raise ValueError(
            f"block_jacobi_apply: vector shape {v.shape} != ({nbk * bs},)"
        )
    return jnp.einsum("bij,bj->bi", inv_blocks, v.reshape(nbk, bs)).reshape(-1)
