"""AMG-style Galerkin triple product R A P with pattern reuse.

Multigrid setup recomputes the coarse operator A_c = R A P every time the
fine operator's VALUES change (time-dependent coefficients, Newton
linearization) while all three sparsity patterns stay fixed.  That is
exactly the contract of ``spgemm_prepare``/``spgemm_apply``: the symbolic
pass (the sort) runs once per pattern, and each update is two sort-free,
jit-compiled numeric passes.

Run (CPU):
  JAX_PLATFORMS=cpu python examples/galerkin_reuse.py
"""

import pathlib
import sys
import time

import numpy as np
import scipy.sparse as sp

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def fine_operator(n, coeff):
    """1-D variable-coefficient Laplacian: pattern fixed, values = coeff."""
    main = coeff[:-1] + coeff[1:]
    return sp.diags([-coeff[1:-1], main, -coeff[1:-1]], [-1, 0, 1],
                    shape=(n, n), format="csr")


def main():
    import jax.numpy as jnp

    from sparse_tpu import CSR, spgemm_apply, spgemm_prepare

    n = 256
    nc = n // 2
    rng = np.random.default_rng(0)

    # linear interpolation P (n x nc) and restriction R = P^T (nc x n)
    rows = np.repeat(np.arange(nc), 3)
    cols = np.stack([2 * np.arange(nc) - 1, 2 * np.arange(nc),
                     2 * np.arange(nc) + 1], 1).reshape(-1)
    vals = np.tile([0.5, 1.0, 0.5], nc)
    keep = (cols >= 0) & (cols < n)
    P = sp.coo_matrix((vals[keep], (cols[keep], rows[keep])),
                      shape=(n, nc)).tocsr()
    R = P.T.tocsr()

    def to_csr(s):
        s = s.tocsr()
        return CSR(data=jnp.asarray(s.data), indices=jnp.asarray(
            s.indices.astype(np.int32)),
            indptr=jnp.asarray(s.indptr.astype(np.int32)), shape=s.shape)

    coeff0 = 1.0 + rng.random(n + 1)
    A0 = fine_operator(n, coeff0)
    a = to_csr(A0)
    r = to_csr(R)
    p = to_csr(P)

    # symbolic passes, once per pattern pair
    plan_ap = spgemm_prepare(a, p)
    ap0 = spgemm_apply(plan_ap, a, p)
    plan_rap = spgemm_prepare(r, ap0)

    steps = 20
    t0 = time.perf_counter()
    for s in range(steps):
        coeff = 1.0 + rng.random(n + 1)  # fresh values, same pattern
        a_s = to_csr(fine_operator(n, coeff))
        ap = spgemm_apply(plan_ap, a_s, p)
        ac = spgemm_apply(plan_rap, r, ap)
        ac.data.block_until_ready()
        if s == 0:
            ref = (R @ fine_operator(n, coeff) @ P).toarray()
            got = np.zeros_like(ref)
            rows_c = np.repeat(np.arange(nc),
                               np.diff(np.asarray(ac.indptr)))
            np.add.at(got, (rows_c, np.asarray(ac.indices)[: rows_c.size]),
                      np.asarray(ac.data)[: rows_c.size])
            assert np.allclose(got, ref), "Galerkin product mismatch"
    t_plan = (time.perf_counter() - t0) / steps
    print(f"coarse operator update via plans: {t_plan * 1e3:.2f} ms/step "
          f"(A_c is {nc}x{nc}, {int(np.asarray(ac.indptr)[-1])} stored)")


if __name__ == "__main__":
    main()
