"""sparse_tpu: a TPU-native sparse linear-algebra framework.

A from-scratch JAX/XLA/Pallas re-design of the capability surface of
diku-dk/sparse (a Futhark sparse-matrix package): COO/CSR/CSC, mono (MSR/MSC),
packed triangular & trapezoidal, and blocked (BSR) formats with SpMV, SpMM,
SpGEMM, element-wise algebra, and a block-sparse LU direct-solver stack --
plus TPU-first additions: Pallas row-binned kernels, multi-chip row
partitioning with halo exchange over ICI, MatrixMarket I/O, and roofline
instrumentation.

All formats are pytree dataclasses with static stored capacity, so every op
flows through ``jit`` / ``vmap`` / ``shard_map``.
"""

from .formats.coo import (  # noqa: F401
    COO,
    coo_compact,
    coo_concatenate,
    coo_from_dense,
    coo_from_triples,
    coo_make,
    coo_nnz,
    coo_normalize,
    coo_pad_to,
    coo_scale,
    coo_sort,
    coo_todense,
    coo_transpose,
)
from .formats.csr import (  # noqa: F401
    CSC,
    CSR,
    csc_add,
    csc_diag,
    csc_empty,
    csc_eye,
    csc_from_coo,
    csc_from_dense,
    csc_from_triples,
    csc_nnz,
    csc_scale,
    csc_sub,
    csc_to_coo,
    csc_todense,
    csc_transpose,
    csc_vsmm,
    csr_add,
    csr_compact,
    csr_diag,
    csr_empty,
    csr_eye,
    csr_from_coo,
    csr_from_dense,
    csr_from_triples,
    csr_nnz,
    csr_scale,
    csr_smvm,
    csr_sub,
    csr_to_coo,
    csr_todense,
    csr_transpose,
)

from .formats.mono import (  # noqa: F401
    MSC,
    MSR,
    msc_add,
    msc_diag,
    msc_empty,
    msc_eye,
    msc_from_coo,
    msc_from_triples,
    msc_nnz,
    msc_scale,
    msc_sub,
    msc_to_coo,
    msc_todense,
    msc_transpose,
    msc_vsmm,
    msr_add,
    msr_diag,
    msr_dmsmm,
    msr_empty,
    msr_eye,
    msr_from_coo,
    msr_from_triples,
    msr_nnz,
    msr_scale,
    msr_smvm,
    msr_sub,
    msr_to_coo,
    msr_todense,
    msr_transpose,
    msr_vsmm,
)
from .formats.triangular import (  # noqa: F401
    Triangular,
    tri_add,
    tri_diag,
    tri_elements,
    tri_eye,
    tri_from_dense,
    tri_idx,
    tri_map,
    tri_nnz,
    tri_scale,
    tri_smm,
    tri_sub,
    tri_todense,
    tri_transpose,
    tri_zero,
)
from .formats.trapezoidal import (  # noqa: F401
    Trapezoidal,
    trap_add,
    trap_diag,
    trap_elements,
    trap_eye,
    trap_from_dense,
    trap_idx,
    trap_map,
    trap_nnz,
    trap_scale,
    trap_smm,
    trap_sub,
    trap_todense,
    trap_transpose,
    trap_zero,
)
from .ops.spgemm import spgemm, spgemm_csr_csr, spgemm_flops  # noqa: F401
from .ops.spmm import dsmm, spmm  # noqa: F401

__version__ = "0.1.0"
