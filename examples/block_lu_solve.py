"""Direct solve of a block-sparse FEM-style system with the BSR LU stack.

Run: JAX_PLATFORMS=cpu python examples/block_lu_solve.py
"""

import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main():
    import jax

    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from sparse_tpu import (
        bsr_from_dense,
        bsr_lower,
        bsr_lu_find_fills,
        bsr_lup,
        bsr_ols,
        bsr_smsmm,
        bsr_smvm,
        bsr_todense,
        bsr_upper,
    )

    rng = np.random.default_rng(7)
    bsz, nb = 4, 12
    n = bsz * nb
    # block-tridiagonal stiffness-like matrix
    mask = np.zeros((nb, nb), bool)
    for off in (-1, 0, 1):
        mask |= np.eye(nb, k=off, dtype=bool)
    dense = rng.standard_normal((n, n)) * np.kron(mask, np.ones((bsz, bsz)))
    dense += 6 * np.eye(n)
    a = bsr_from_dense(jnp.asarray(dense), bsz)

    fills = bsr_lu_find_fills(a)
    print(f"{nb}x{nb} blocks (bsz={bsz}), fill-in blocks: {len(fills)}")

    lu, p = bsr_lup(a)
    recon = np.asarray(bsr_todense(bsr_smsmm(bsr_lower(lu), bsr_upper(lu))))
    print("max |P.A - L.U| =", np.abs(dense[np.asarray(p)] - recon).max())

    x_true = rng.standard_normal(n)
    x = bsr_ols(a, jnp.asarray(dense @ x_true))
    resid = np.abs(np.asarray(bsr_smvm(a, x)) - dense @ x_true).max()
    print("ols residual:", resid)
    assert resid < 1e-8


if __name__ == "__main__":
    main()
