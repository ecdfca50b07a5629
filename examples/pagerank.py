"""PageRank by power iteration on a sparse link matrix (CSR fast path).

Run: JAX_PLATFORMS=cpu python examples/pagerank.py
"""

import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main():
    import jax
    import jax.numpy as jnp

    from sparse_tpu import csr_from_dense
    from sparse_tpu.ops.spmv import build_spmv_plan, csr_smvm_fast

    rng = np.random.default_rng(0)
    n, avg_out = 2000, 12
    adj = (rng.random((n, n)) < avg_out / n).astype(np.float64)
    np.fill_diagonal(adj, 0)
    out_deg = np.maximum(adj.sum(axis=1, keepdims=True), 1)
    # column-stochastic transition matrix
    p_mat = (adj / out_deg).T
    a = csr_from_dense(jnp.asarray(p_mat))
    plan = build_spmv_plan(a)
    damping = 0.85

    @jax.jit
    def step(r):
        return damping * csr_smvm_fast(a, r, plan) + (1 - damping) / n

    r = jnp.full((n,), 1.0 / n)
    for _ in range(60):
        r = step(r)
    ranks = np.asarray(r)
    oracle = np.full(n, 1.0 / n)
    for _ in range(60):
        oracle = damping * (p_mat @ oracle) + (1 - damping) / n
    np.testing.assert_allclose(ranks, oracle, rtol=1e-5)  # f32 iteration vs f64 oracle
    top = np.argsort(ranks)[::-1][:5]
    print("top-5 pages:", top.tolist(), "ranks:", np.round(ranks[top], 5).tolist())


if __name__ == "__main__":
    main()
