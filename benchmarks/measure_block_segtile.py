"""Chip measurement: block-granule segment tiles on the elasticity class.

Round-4 verdict #3: elasticity's natural 2x2 blocks suggest a bsz-wide
slot granule (4x fewer vregs at equal nnz) — the one fill lever not yet
measured — plus block-granular permutes (half the gather ops).  This
measures, on fem_elasticity_400k (node-scrambled):

  scalar path: scalar RCM -> build_seg_tiles(auto) -> kernel + end-to-end
  block path: block RCM -> csr_to_bsr(2) -> block-granule kernel + e2e

Usage: python measure_block_segtile.py [scalar|block|both]
"""
from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/benchmarks")

import jax
import jax.numpy as jnp

K_CHAIN = 5


def timed(fn, *args):
    @jax.jit
    def chain(x, *ops):
        def body(_, x):
            w = fn(x, *ops)
            return w / (jnp.max(jnp.abs(w)) + 1.0)

        return jnp.sum(jax.lax.fori_loop(0, K_CHAIN, body, x))

    t0 = time.perf_counter()
    r = float(chain(*args))
    print(f"  compile+run {time.perf_counter()-t0:.1f}s r={r:.5f}",
          file=sys.stderr, flush=True)
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        float(chain(*args))
        best = min(best, time.perf_counter() - t0)
    return best / K_CHAIN


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    from gen_fixtures import elasticity_fem

    from sparse_tpu import CSR

    t0 = time.perf_counter()
    s = elasticity_fem(n_points=200_000, seed=7)
    nnz = s.nnz
    a = CSR(data=jnp.asarray(s.data.astype(np.float32)),
            indices=jnp.asarray(s.indices.astype(np.int32)),
            indptr=jnp.asarray(s.indptr.astype(np.int32)), shape=s.shape)
    n = s.shape[0]
    print(f"n={n} nnz={nnz} (gen {time.perf_counter()-t0:.1f}s)",
          file=sys.stderr, flush=True)
    rng = np.random.default_rng(1)
    v = jnp.asarray(rng.standard_normal(n).astype(np.float32))

    if which in ("scalar", "both"):
        from sparse_tpu.ops.pallas_csr import build_seg_tiles, csr_smvm_segtile
        from sparse_tpu.ops.reorder import csr_bandwidth, reorder_for_locality

        t0 = time.perf_counter()
        ap, perm = reorder_for_locality(a)
        print(f"scalar RCM: bw {csr_bandwidth(ap)} "
              f"({time.perf_counter()-t0:.1f}s)", file=sys.stderr, flush=True)
        t0 = time.perf_counter()
        plan = build_seg_tiles(ap, wsub="auto")
        print(f"scalar plan: {plan.n_tiles} tiles wsub={plan.wsub} "
              f"fill={plan.fill:.4f} ({time.perf_counter()-t0:.1f}s)",
              file=sys.stderr, flush=True)
        t = timed(lambda x, ap, plan: csr_smvm_segtile(ap, x, plan),
                  v, ap, plan)
        print(f"scalar kernel: {t*1e3:.2f} ms  {nnz/t/1e9:.3f} Gnnz/s",
              flush=True)
        pj = jnp.asarray(perm)

        def e2e(x, ap, plan, pj):
            y = csr_smvm_segtile(ap, x[pj], plan)
            return jnp.zeros_like(y).at[pj].set(y)

        t = timed(e2e, v, ap, plan, pj)
        print(f"scalar e2e:  {t*1e3:.2f} ms  {nnz/t/1e9:.3f} Gnnz/s",
              flush=True)

    if which in ("block", "both"):
        # nb=200k exceeds the int32 block-coordinate range: wide (int64)
        # BSR indices need x64 (kernels are x64-hardened, round 4)
        x64 = jax.enable_x64()
        x64.__enter__()
        from sparse_tpu.formats.bsr import csr_to_bsr
        from sparse_tpu.ops.pallas_csr_block import (
            build_seg_tiles_block,
            bsr_smvm_segtile_block,
        )
        from sparse_tpu.ops.reorder import (
            csr_bandwidth,
            csr_permute,
            rcm_order_blocked,
        )

        t0 = time.perf_counter()
        perm = rcm_order_blocked(a, 2)
        apb = csr_permute(a, perm, perm)
        print(f"block RCM: bw {csr_bandwidth(apb)} "
              f"({time.perf_counter()-t0:.1f}s)", file=sys.stderr, flush=True)
        t0 = time.perf_counter()
        ab = csr_to_bsr(apb, 2)
        print(f"csr_to_bsr: {ab.nbz} blocks ({time.perf_counter()-t0:.1f}s)",
              file=sys.stderr, flush=True)
        for wsub in (8, 16):
            t0 = time.perf_counter()
            bplan = build_seg_tiles_block(ab, wsub=wsub)
            print(f"block plan wsub={wsub}: {bplan.n_tiles} tiles "
                  f"fill={bplan.fill:.4f} ({time.perf_counter()-t0:.1f}s)",
                  file=sys.stderr, flush=True)
            t = timed(
                lambda x, ab, bplan: bsr_smvm_segtile_block(ab, x, bplan),
                v, ab, bplan,
            )
            print(f"block kernel wsub={wsub}: {t*1e3:.2f} ms  "
                  f"{nnz/t/1e9:.3f} Gnnz/s", flush=True)
        # both ends as block-granule GATHERS (the inverse-permutation
        # gather measured 7.71 ms vs 9.49 for scatter-unpermute; a bitcast
        # i64 variant measured 12.83 and was dropped)
        from sparse_tpu.ops.reorder import block_perm_pair

        pbn, invn = block_perm_pair(perm, 2)
        pbj, ibj = jnp.asarray(pbn), jnp.asarray(invn)

        def e2e_b(x, ab, bplan, pbj, ibj):
            xb = x.reshape(-1, 2)[pbj].reshape(-1)
            y = bsr_smvm_segtile_block(ab, xb, bplan)
            return y.reshape(-1, 2)[ibj].reshape(-1)

        t = timed(e2e_b, v, ab, bplan, pbj, ibj)
        print(f"block e2e:  {t*1e3:.2f} ms  {nnz/t/1e9:.3f} Gnnz/s",
              flush=True)


if __name__ == "__main__":
    main()
