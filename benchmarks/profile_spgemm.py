"""Stage-level TPU profile of the SpGEMM pipeline (BASELINE config 4).

Times each pipeline stage separately with the chained protocol so we know
where A@A time actually goes: product expansion, sort, duplicate merge,
host-sync overhead of the eager wrapper.  Run ONE at a time on the tunnel.
"""

from __future__ import annotations

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from sparse_tpu import csr_from_dense, spgemm
    from sparse_tpu.formats.coo import COO, coo_normalize, coo_sort
    from sparse_tpu.ops.spgemm import spgemm_csr_csr, spgemm_flops, spgemm_products
    from sparse_tpu.ops.segmented import INDEX_DTYPE

    print(f"backend: {jax.default_backend()}", flush=True)
    rng = np.random.default_rng(2)
    n = 2_000
    x = (rng.standard_normal((n, n)) * (rng.random((n, n)) < 0.01)).astype(
        np.float32
    )
    t0 = time.perf_counter()
    a = csr_from_dense(jnp.asarray(x))
    a.data.block_until_ready()
    print(f"csr_from_dense: {time.perf_counter() - t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    f = int(spgemm_flops(a, a))
    print(f"symbolic pass: {time.perf_counter() - t0:.1f}s", flush=True)
    print(f"n={n} nnz={int((x != 0).sum())} F={f}", flush=True)
    flops = 2.0 * float((x != 0).sum(0) @ (x != 0).sum(1))

    def timeit(label, fn, reps=3):
        fn()  # warm
        best = np.inf
        for _ in range(reps):
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
        print(f"{label:32s} {best * 1e3:9.3f} ms", flush=True)
        return best

    # 1. full eager wrapper (what the suite measures today)
    timeit("eager spgemm(a,a)+compact",
           lambda: spgemm(a, a).data.block_until_ready())

    # 2. jit core only, chained through data so it can't be hoisted
    @jax.jit
    def core_chain(a_data, a_idx, a_ptr, iters=8):
        from sparse_tpu.formats.csr import CSR

        def body(_, d):
            aa = CSR(data=d, indices=a_idx, indptr=a_ptr, shape=(n, n))
            c = spgemm_csr_csr(aa, aa, f)
            # fold result back into a same-shaped data vector
            s = jnp.sum(c.data) / (jnp.max(jnp.abs(c.data)) + 1.0)
            return d * (1.0 + 0.0 * s) + 0.0 * s
        return jnp.sum(jax.lax.fori_loop(0, iters, body, a_data))

    t_core = timeit("jit core x8 (chained)",
                    lambda: float(core_chain(a.data, a.indices, a.indptr)))
    print(f"  -> core per call ~ {t_core / 8 * 1e3:.3f} ms "
          f"= {flops / (t_core / 8) / 1e9:.3f} GFLOP/s", flush=True)

    # 3. product expansion alone (chained)
    b_starts = a.indptr[:-1]
    b_lens = (a.indptr[1:] - a.indptr[:-1]).astype(INDEX_DTYPE)

    @jax.jit
    def prod_chain(a_data, a_idx, a_ptr, iters=8):
        from sparse_tpu.formats.csr import CSR

        def body(_, d):
            aa = CSR(data=d, indices=a_idx, indptr=a_ptr, shape=(n, n))
            p = spgemm_products(aa, d, a_idx, a_ptr[:-1],
                                (a_ptr[1:] - a_ptr[:-1]).astype(INDEX_DTYPE),
                                n, f)
            s = jnp.sum(p.data) / (jnp.max(jnp.abs(p.data)) + 1.0)
            return d * (1.0 + 0.0 * s)
        return jnp.sum(jax.lax.fori_loop(0, iters, body, a_data))

    t_prod = timeit("expansion x8 (chained)",
                    lambda: float(prod_chain(a.data, a.indices, a.indptr)))
    print(f"  -> expansion per call ~ {t_prod / 8 * 1e3:.3f} ms", flush=True)

    # 4. sort alone on an F-sized COO (chained)
    rr = jnp.asarray(rng.integers(0, n, f), INDEX_DTYPE)
    cc = jnp.asarray(rng.integers(0, n, f), INDEX_DTYPE)
    dd = jnp.asarray(rng.standard_normal(f), jnp.float32)

    @jax.jit
    def sort_chain(row, col, d, iters=8):
        def body(_, carry):
            row, col, d = carry
            s = coo_sort(COO(row=row, col=col, data=d, shape=(n, n)))
            return (s.row, s.col, s.data * 0.999 + 0.001)
        r2, c2, d2 = jax.lax.fori_loop(0, iters, body, (row, col, d))
        return jnp.sum(d2) + jnp.sum(r2) + jnp.sum(c2)

    t_sort = timeit("coo_sort(F) x8 (chained)",
                    lambda: float(sort_chain(rr, cc, dd)))
    print(f"  -> sort per call ~ {t_sort / 8 * 1e3:.3f} ms", flush=True)

    # 5. normalize (sort + merge) alone
    @jax.jit
    def norm_chain(row, col, d, iters=8):
        def body(_, carry):
            row, col, d = carry
            s = coo_normalize(COO(row=row, col=col, data=d, shape=(n, n)))
            return (jnp.maximum(s.row, row * 0), jnp.maximum(s.col, col * 0),
                    s.data * 0.999 + 0.001)
        r2, c2, d2 = jax.lax.fori_loop(0, iters, body, (row, col, d))
        return jnp.sum(d2) + jnp.sum(r2) + jnp.sum(c2)

    t_norm = timeit("coo_normalize(F) x8 (chained)",
                    lambda: float(norm_chain(rr, cc, dd)))
    print(f"  -> normalize per call ~ {t_norm / 8 * 1e3:.3f} ms", flush=True)


if __name__ == "__main__":
    main()
