"""Extended benchmark suite (one JSON line per metric; the driver's headline
lives in /bench.py).

Run: python benchmarks/suite.py [--quick]

Covers BASELINE.md configs beyond the headline: CSR SpMV (unstructured XLA
path + the Pallas segment-tile kernel on TPU), CSR SpMM tall-skinny, a
blocked-ELL SpMM k-sweep (32..256), SpGEMM, and distributed SpMV
weak-scaling on the virtual CPU mesh.  All timings dependency-chained inside
jit (see docs/performance.md for why).  ``vs_baseline`` on roofline-tracked
metrics is the fraction of the chip's *measured* streaming ceiling
(chained 256 MB axpy: 207 GB/s on the v5e, docs/performance.md).
"""

from __future__ import annotations

import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

K_CHAIN = 5
# the single source of truth for the measured streaming ceiling lives in
# utils.stats (the roofline model bakes it into every emitted fraction)
from sparse_tpu.utils.stats import HBM_CEILING_GBPS as MEASURED_CEILING_GBPS  # noqa: E402


def timed_chain(step, v0, *operands, iters=3):
    """Seconds per application of ``step(v, *operands)``, dependency-chained.

    ``operands`` (the sparse matrix, plans, ...) are passed as jit
    *arguments* — closure constants get embedded in the remote-compile
    payload and overflow the tunnel's upload limit (HTTP 413) or stretch
    compiles to minutes (docs/performance.md)."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(v, *ops):
        # raw output fed back (no elementwise normalize): iterations stay
        # data-dependent, and all suite operators are 0.01-scaled so a
        # 5-step chain neither overflows nor denormalizes.  The normalize
        # pass cost ~2.5 ms/iter of protocol-only traffic at SpMM sizes.
        return jnp.sum(jax.lax.fori_loop(0, K_CHAIN, lambda _, v: step(v, *ops), v))

    float(run(v0, *operands))
    best = np.inf
    for _ in range(iters):
        t0 = time.perf_counter()
        float(run(v0, *operands))
        best = min(best, (time.perf_counter() - t0) / K_CHAIN)
    return best


def emit(metric, value, unit, vs=None):
    # 4 significant digits (fixed decimals would zero out rel-err metrics)
    rec = {"metric": metric, "value": float(f"{value:.4g}"), "unit": unit}
    if vs is not None:
        rec["vs_baseline"] = float(f"{vs:.4g}")
    print(json.dumps(rec), flush=True)


def bench_csr(quick):
    import jax.numpy as jnp
    import scipy.sparse as sp

    from sparse_tpu import CSR
    from sparse_tpu.ops.spmv import build_spmv_plan, csr_smvm_fast, csr_spmm_fast
    from sparse_tpu.ops.segmented import INDEX_DTYPE

    rng = np.random.default_rng(0)
    n = m = 100_000 if quick else 200_000
    per_row = 32
    nnz = n * per_row
    cols = rng.integers(0, m, nnz, dtype=np.int32).reshape(n, per_row)
    cols.sort(axis=1)
    vals = (rng.standard_normal(nnz) * 0.01).astype(np.float32)
    indptr = np.arange(0, nnz + 1, per_row, dtype=np.int32)
    a = CSR(
        data=jnp.asarray(vals),
        indices=jnp.asarray(cols.reshape(-1)),
        indptr=jnp.asarray(indptr),
        shape=(n, m),
    )
    plan = build_spmv_plan(a)
    v0 = jnp.asarray(rng.standard_normal(m).astype(np.float32))
    t = timed_chain(lambda v, a, plan: csr_smvm_fast(a, v, plan), v0, a, plan)
    s = sp.csr_matrix((vals, cols.reshape(-1), indptr), shape=(n, m))
    x = np.asarray(v0)
    s @ x
    t0 = time.perf_counter()
    for _ in range(K_CHAIN):
        w = s @ x
        x = w / (np.abs(w).max() + 1.0)
    t_ref = (time.perf_counter() - t0) / K_CHAIN
    emit("csr_spmv_unstructured_nnzps", nnz / t / 1e9, "Gnnz/s", t_ref / t)

    k = 64
    b0 = jnp.asarray(rng.standard_normal((m, k)).astype(np.float32) * 0.01)
    t = timed_chain(lambda b, a, plan: csr_spmm_fast(a, b, plan), b0, a, plan)
    eff = (nnz * (4 + 4 + 4 * k) + n * k * 4) / t / 1e9
    emit(f"csr_spmm_k{k}_eff_bw", eff, "GB/s", eff / MEASURED_CEILING_GBPS)


def bench_csr_segtile(quick):
    """Pallas segment-tile SpMV on a clustered (banded) pattern — the
    kernel's target case (BASELINE config 2's fast path).  TPU only."""
    import jax
    import jax.numpy as jnp

    if jax.default_backend() != "tpu":
        return
    from sparse_tpu import CSR
    from sparse_tpu.ops.pallas_csr import build_seg_tiles, csr_smvm_segtile

    # same config as docs/performance.md's segtile table: 500k rows,
    # ~10M nnz band of half-width 1000, no block structure
    rng = np.random.default_rng(4)
    n = m = 250_000 if quick else 500_000
    per_row = 20
    rows = np.repeat(np.arange(n, dtype=np.int64), per_row)
    cols = np.clip(rows + rng.integers(-1000, 1000, rows.size), 0, m - 1)
    order = np.lexsort((cols, rows))
    rows, cols = rows[order], cols[order]
    keep = np.ones(rows.size, bool)
    keep[1:] = (rows[1:] != rows[:-1]) | (cols[1:] != cols[:-1])
    rows, cols = rows[keep], cols[keep]
    nnz = rows.size
    vals = (rng.standard_normal(nnz) * 0.01).astype(np.float32)
    indptr = np.zeros(n + 1, np.int64)
    np.cumsum(np.bincount(rows, minlength=n), out=indptr[1:])
    a = CSR(
        data=jnp.asarray(vals),
        indices=jnp.asarray(cols.astype(np.int32)),
        indptr=jnp.asarray(indptr.astype(np.int32)),
        shape=(n, m),
    )
    # production config (round 4): first-fit packing + auto window width
    plan = build_seg_tiles(a, wsub="auto")
    emit("csr_spmv_segtile_fill", plan.fill, "ratio")
    v0 = jnp.asarray(rng.standard_normal(m).astype(np.float32))
    t = timed_chain(lambda v, a, plan: csr_smvm_segtile(a, v, plan), v0, a, plan)
    emit("csr_spmv_segtile_banded_nnzps", nnz / t / 1e9, "Gnnz/s")
    # slot traffic (5 B/slot) + operand + output is what the kernel streams.
    # NOTE: better packing (round 4's first-fit) CUTS this number while
    # LIFTING nnz/s — fewer slots read per nnz; nnz/s is the target metric
    # (BASELINE config 2), the traffic fraction only says how far the
    # per-vreg VPU cost sits from pure streaming
    slots = plan.n_tiles * plan.rows * 128
    eff = (slots * 5 + m * 4 + n * 4) / t / 1e9
    emit("csr_spmv_segtile_banded_eff_bw", eff, "GB/s",
         eff / MEASURED_CEILING_GBPS)
    # the nnz/s roofline model (utils/stats.nnz_roofline): intrinsic
    # pattern ceiling from min bytes; plan ceiling = max(traffic floor,
    # measured per-vreg issue floor); structural_frac is the checkable
    # "how much of the pattern roofline THIS plan can reach"
    from sparse_tpu.ops.pallas_csr import (
        segtile_hbm_bytes,
        segtile_issue_seconds,
    )
    from sparse_tpu.utils.stats import csr_min_bytes, nnz_roofline

    rl = nnz_roofline(
        nnz, min_bytes=csr_min_bytes(a), plan_bytes=segtile_hbm_bytes(plan),
        issue_s=segtile_issue_seconds(plan), seconds=t,
    )
    emit("csr_spmv_segtile_frac_of_nnz_roofline",
         rl["frac_of_nnz_roofline"], "frac", rl["structural_frac"])
    emit("csr_spmv_segtile_frac_of_plan_ceiling",
         rl["frac_of_plan_ceiling"], "frac")


def bench_reorder(quick):
    """RCM locality recovery (BASELINE config 2, scrambled ordering): the
    same band as bench_csr_segtile but with rows/columns shuffled by a
    random permutation — structure present, input ordering hides it (the
    typical state of SuiteSparse/FEM inputs).  Measures the end-to-end
    reordered SpMV (permute operand -> segtile kernel -> unpermute result)
    against the XLA path on the scrambled matrix.  TPU only."""
    import jax
    import jax.numpy as jnp

    if jax.default_backend() != "tpu":
        return
    from sparse_tpu import CSR, csr_bandwidth, permute_vector, \
        reorder_for_locality, unpermute_vector
    from sparse_tpu.native import plansort
    from sparse_tpu.ops.pallas_csr import build_seg_tiles, csr_smvm_segtile
    from sparse_tpu.ops.spmv import build_spmv_plan, csr_smvm_fast

    rng = np.random.default_rng(8)
    n = m = 250_000 if quick else 500_000
    per_row = 20
    rows = np.repeat(np.arange(n, dtype=np.int64), per_row)
    cols = np.clip(rows + rng.integers(-1000, 1000, rows.size), 0, m - 1)
    p = rng.permutation(n).astype(np.int64)
    rows, cols = p[rows], p[cols]
    order = plansort.argsort_u64(rows * (m + 1) + cols)
    rows, cols = rows[order], cols[order]
    keep = np.ones(rows.size, bool)
    keep[1:] = (rows[1:] != rows[:-1]) | (cols[1:] != cols[:-1])
    rows, cols = rows[keep], cols[keep]
    nnz = rows.size
    vals = (rng.standard_normal(nnz) * 0.01).astype(np.float32)
    indptr = np.zeros(n + 1, np.int64)
    np.cumsum(np.bincount(rows, minlength=n), out=indptr[1:])
    a = CSR(
        data=jnp.asarray(vals),
        indices=jnp.asarray(cols.astype(np.int32)),
        indptr=jnp.asarray(indptr.astype(np.int32)),
        shape=(n, m),
    )
    v0 = jnp.asarray(rng.standard_normal(m).astype(np.float32))

    # scrambled baseline: the XLA row-binned path (the segtile kernel
    # refuses this pattern — fill collapses below its dispatch floor)
    plan_x = build_spmv_plan(a)
    t = timed_chain(lambda v, a, plan: csr_smvm_fast(a, v, plan),
                    v0, a, plan_x, iters=1)
    emit("csr_spmv_scrambled_band_nnzps", nnz / t / 1e9, "Gnnz/s")

    t0 = time.perf_counter()
    ap, perm = reorder_for_locality(a)
    emit("rcm_reorder_seconds", time.perf_counter() - t0, "s")
    emit("rcm_bandwidth_reduction", csr_bandwidth(a) / max(csr_bandwidth(ap), 1),
         "x")
    plan = build_seg_tiles(ap, wsub="auto")
    pj = jnp.asarray(perm)

    def step(v, ap, plan, pj):
        y = csr_smvm_segtile(ap, v[pj], plan)
        return jnp.zeros_like(y).at[pj].set(y)

    t = timed_chain(step, v0, ap, plan, pj)
    emit("csr_spmv_rcm_segtile_nnzps", nnz / t / 1e9, "Gnnz/s")


def bench_real_matrices(quick):
    """Real-structure matrices (BASELINE configs 2-4's SuiteSparse stand-ins;
    zero egress, so benchmarks/gen_fixtures.py assembles the same matrix
    classes from first principles): committed .mtx fixtures are parsed by
    the library's own reader, pushed through reorder -> segtile -> SpMV, and
    large in-process FEM instances (1M-row poisson, 400k-row elasticity)
    give the roofline-relevant rates.

    Per matrix: nnz, RCM bandwidth reduction, segment-tile fill (the
    dispatch statistic), the reordered-kernel vs XLA-path SpMV rates, and
    the measured-traffic roofline fraction (plan slots * 5 B + operand +
    output over the 207 GB/s ceiling).  Matrices with natural dense blocks
    (elasticity: 2x2 dof blocks intact under any node numbering)
    additionally run the round-4 BLOCK-ROUTED SpGEMM — the auto dispatcher
    must pick it (asserted) — against the scalar prepared path."""
    import jax
    import jax.numpy as jnp

    from sparse_tpu import csr_bandwidth, reorder_for_locality
    from sparse_tpu.io.matrix_market import mm_read
    from sparse_tpu.ops.pallas_csr import build_seg_tiles, csr_smvm_segtile
    from sparse_tpu.ops.spmv import build_spmv_plan, csr_smvm_fast
    from sparse_tpu.utils.stats import detect_block_size

    on_tpu = jax.default_backend() == "tpu"
    rng = np.random.default_rng(11)

    def run_one(tag, a):
        n, m = a.shape
        nnz = int(np.asarray(a.indptr)[-1])
        emit(f"{tag}_nnz", nnz / 1e6, "Mnnz")
        bw0 = csr_bandwidth(a)
        ap, perm = reorder_for_locality(a)
        emit(f"{tag}_rcm_bw_reduction", bw0 / max(csr_bandwidth(ap), 1), "x")
        try:
            plan = build_seg_tiles(ap, wsub="auto")
            emit(f"{tag}_segtile_fill", plan.fill, "ratio")
        except ValueError:
            # tile count overflows int32 slot positions: the dispatcher's
            # documented XLA fallback (fill would be << the floor)
            plan = None
            emit(f"{tag}_segtile_fill", 0, "rejected: tile overflow")
        if not on_tpu:
            return
        v0 = jnp.asarray(rng.standard_normal(m).astype(np.float32))
        px = build_spmv_plan(a)
        t = timed_chain(lambda v, a, p: csr_smvm_fast(a, v, p), v0, a, px)
        emit(f"{tag}_spmv_xla_nnzps", nnz / t / 1e9, "Gnnz/s")
        if plan is None:
            return
        # the segtile kernel only wins above its fill floor (pallas_csr
        # dispatch); report it regardless so off-family threshold checks
        # have data, flagged by the fill metric above
        pj = jnp.asarray(perm)

        def step(v, ap, plan, pj):
            y = csr_smvm_segtile(ap, v[pj], plan)
            return jnp.zeros_like(y).at[pj].set(y)

        t = timed_chain(step, v0, ap, plan, pj)
        emit(f"{tag}_spmv_rcm_segtile_nnzps", nnz / t / 1e9, "Gnnz/s")
        # measured-traffic roofline for the kernel itself (without the
        # permute/unpermute wrapper): what the plan's slots stream
        tk = timed_chain(lambda v, ap, plan: csr_smvm_segtile(ap, v, plan),
                         v0, ap, plan)
        traffic = plan.n_tiles * plan.rows * 128 * 5 + m * 4 + n * 4
        emit(f"{tag}_segtile_kernel_nnzps", nnz / tk / 1e9, "Gnnz/s")
        emit(f"{tag}_segtile_traffic_frac",
             traffic / tk / 1e9 / MEASURED_CEILING_GBPS, "frac")
        from sparse_tpu.ops.pallas_csr import (
            segtile_hbm_bytes,
            segtile_issue_seconds,
        )
        from sparse_tpu.utils.stats import csr_min_bytes, nnz_roofline

        rl = nnz_roofline(
            nnz, min_bytes=csr_min_bytes(ap),
            plan_bytes=segtile_hbm_bytes(plan),
            issue_s=segtile_issue_seconds(plan), seconds=tk,
        )
        emit(f"{tag}_segtile_frac_of_nnz_roofline",
             rl["frac_of_nnz_roofline"], "frac", rl["structural_frac"])

    def run_block_spgemm(tag, a):
        """Block-routed SpGEMM on a natural-block matrix vs the scalar
        prepared path (the round-3 measured ~900x win at bsz=32 was never
        reachable without hand-routing; round 4's dispatcher must find the
        block route on its own)."""
        import contextlib

        import jax

        from sparse_tpu.formats.bsr import BSR_MAX_NB
        from sparse_tpu.ops.spgemm import _spgemm_route

        bsz, fill = detect_block_size(a)
        emit(f"{tag}_detected_bsz", bsz, "bsz")
        wide = bsz >= 2 and a.shape[0] // bsz > BSR_MAX_NB
        # round 4: beyond nb=46340 BSR switches to wide (int64) block
        # coordinates instead of refusing (round-3 bound removed); x64 is
        # scoped to this block so every other section measures untouched
        ctx = jax.enable_x64() if wide else contextlib.nullcontext()
        with ctx:
            route, rbsz = _spgemm_route(a, a)
            assert route == "block" and rbsz == bsz, (
                f"{tag}: expected the auto dispatcher to pick the block "
                f"route, got {route}"
            )
            emit(f"{tag}_block_route", 1,
                 "auto (wide int64)" if wide else "auto")
            if not on_tpu:
                return
            _run_block_spgemm_timed(tag, a, bsz)

    def _run_block_spgemm_timed(tag, a, bsz):
        from sparse_tpu.formats.bsr import (
            bsr_smsmm_apply,
            bsr_smsmm_prepare,
            csr_to_bsr,
        )

        t0 = time.perf_counter()
        ab = csr_to_bsr(a, bsz)
        emit(f"{tag}_csr_to_bsr_s", time.perf_counter() - t0, "s")
        t0 = time.perf_counter()
        bplan = bsr_smsmm_prepare(ab, ab)
        emit(f"{tag}_block_spgemm_prepare_s", time.perf_counter() - t0, "s")
        flops = 2 * bplan.n_products * bsz ** 3

        def bstep(blocks, plan, a):
            a2 = BSR(indices=a.indices, blocks=blocks, n=a.n, bsz=a.bsz)
            c = bsr_smsmm_apply(plan, a2, a2)
            return blocks * (1.0 + 1e-30 * jnp.sum(c.blocks))

        t = timed_chain(bstep, ab.blocks, bplan, ab)
        emit(f"{tag}_block_spgemm_apply_gflops", flops / t / 1e9, "GFLOP/s")
        # scalar prepared baseline on the same pattern — only at fixture
        # size: at 5.6M nnz the scalar symbolic pass alone costs ~8 min
        # (78M scalar products; the measured 6k ratio is the evidence)
        if a.data.shape[0] > 1_000_000:
            return
        from sparse_tpu.ops.spgemm import spgemm_apply, spgemm_prepare

        t0 = time.perf_counter()
        splan = spgemm_prepare(a, a)
        emit(f"{tag}_scalar_spgemm_prepare_s", time.perf_counter() - t0, "s")
        sflops = 2 * splan.n_products

        def sstep(data, plan, a):
            a2 = CSR(data=data, indices=a.indices, indptr=a.indptr,
                     shape=a.shape)
            c = spgemm_apply(plan, a2, a2)
            return data * (1.0 + 1e-30 * jnp.sum(c.data))

        t = timed_chain(sstep, a.data, splan, a)
        emit(f"{tag}_scalar_spgemm_apply_gflops", sflops / t / 1e9,
             "GFLOP/s")

    def run_block_granule(tag, a):
        """Natural-2x2-block matrices (elasticity class): the block-granule
        segment-tile kernel — one slot = one block, block-preserving RCM,
        block-granule permutes (round 5, ops/pallas_csr_block.py)."""
        import contextlib

        import jax

        from sparse_tpu.formats.bsr import BSR_MAX_NB, csr_to_bsr
        from sparse_tpu.ops.pallas_csr_block import (
            block_segtile_hbm_bytes,
            block_segtile_issue_seconds,
            bsr_smvm_segtile_block,
            build_seg_tiles_block,
        )
        from sparse_tpu.ops.reorder import csr_permute, rcm_order_blocked
        from sparse_tpu.utils.stats import csr_min_bytes, nnz_roofline

        if not on_tpu:
            return
        n = a.shape[0]
        nnz = int(np.asarray(a.indptr)[-1])
        wide = n // 2 > BSR_MAX_NB
        ctx = jax.enable_x64() if wide else contextlib.nullcontext()
        with ctx:
            perm = rcm_order_blocked(a, 2)
            apb = csr_permute(a, perm, perm)
            ab = csr_to_bsr(apb, 2)
            # wsub=16 measured best on elasticity-400k (8: 7.91 ms,
            # 16: 6.41, 32: 6.44 — docs/performance.md round 5)
            bplan = build_seg_tiles_block(ab, wsub=16)
            emit(f"{tag}_blockseg_fill", bplan.fill, "ratio")
            v0 = jnp.asarray(rng.standard_normal(n).astype(np.float32))
            tk = timed_chain(
                lambda x, ab, p: bsr_smvm_segtile_block(ab, x, p),
                v0, ab, bplan,
            )
            emit(f"{tag}_blockseg_kernel_nnzps", nnz / tk / 1e9, "Gnnz/s")
            rl = nnz_roofline(
                nnz, min_bytes=csr_min_bytes(apb),
                plan_bytes=block_segtile_hbm_bytes(bplan),
                issue_s=block_segtile_issue_seconds(bplan), seconds=tk,
            )
            emit(f"{tag}_blockseg_frac_of_nnz_roofline",
                 rl["frac_of_nnz_roofline"], "frac", rl["structural_frac"])
            # end-to-end: both permute ends as block-granule gathers (the
            # scatter-unpermute measured 9.49 vs 7.71 ms; docs round 5)
            from sparse_tpu.ops.reorder import block_perm_pair

            pbn, invn = block_perm_pair(perm, 2)
            pbj, ibj = jnp.asarray(pbn), jnp.asarray(invn)

            def e2e(x, ab, p, pbj, ibj):
                xb = x.reshape(-1, 2)[pbj].reshape(-1)
                y = bsr_smvm_segtile_block(ab, xb, p)
                return y.reshape(-1, 2)[ibj].reshape(-1)

            t = timed_chain(e2e, v0, ab, bplan, pbj, ibj)
            emit(f"{tag}_blockseg_e2e_nnzps", nnz / t / 1e9, "Gnnz/s")

    from sparse_tpu import CSR
    from sparse_tpu.formats.bsr import BSR

    fixtures = pathlib.Path(__file__).parent / "matrices"
    for path in sorted(fixtures.glob("*.mtx")):
        a = mm_read(str(path), dtype=np.float32)
        run_one(path.stem, a)
        if "elasticity" in path.stem:
            run_block_spgemm(path.stem, a)
            run_block_granule(path.stem, a)

    if not quick:
        # large FEM instances, generated in-process (roofline-relevant
        # sizes; nothing big is committed)
        sys.path.insert(0, str(pathlib.Path(__file__).parent))
        from gen_fixtures import elasticity_fem, poisson_fem

        def to_csr(s):
            return CSR(
                data=jnp.asarray(s.data.astype(np.float32)),
                indices=jnp.asarray(s.indices.astype(np.int32)),
                indptr=jnp.asarray(s.indptr.astype(np.int32)),
                shape=s.shape,
            )

        run_one("fem_poisson_1m", to_csr(poisson_fem(n_points=1_000_000,
                                                     seed=6)))
        ela = to_csr(elasticity_fem(n_points=200_000, seed=7))
        run_one("fem_elasticity_400k", ela)
        run_block_spgemm("fem_elasticity_400k", ela)
        run_block_granule("fem_elasticity_400k", ela)
        # webbase class at scale: round 4's first-fit packing lifts
        # power-law fill above the dispatch floor (0.030 vs round 3's
        # 0.012), so the graph class now takes the segtile kernel too
        from gen_fixtures import powerlaw_graph

        pg = to_csr(powerlaw_graph(n=1_000_000, seed=8))
        run_one("graph_powerlaw_1m", pg)
        if on_tpu:
            # hub/tail split (round 5): top-degree strip through segment
            # tiles (degree-ordered compact space), tail on the XLA path
            from sparse_tpu.ops.hub_split import (
                hub_split_prepare,
                hub_split_smvm,
            )
            from sparse_tpu.ops.spmv import build_spmv_plan, csr_smvm_fast

            nnz = int(np.asarray(pg.indptr)[-1])
            v0 = jnp.asarray(
                rng.standard_normal(pg.shape[1]).astype(np.float32))
            px = build_spmv_plan(pg)
            t_xla = timed_chain(lambda v, a, p: csr_smvm_fast(a, v, p),
                                v0, pg, px)
            split = hub_split_prepare(pg)
            emit("graph_powerlaw_1m_hub_fraction", split.hub_fraction,
                 "frac")
            t = timed_chain(lambda v, sp: hub_split_smvm(sp, v), v0, split)
            emit("graph_powerlaw_1m_hubsplit_nnzps", nnz / t / 1e9,
                 "Gnnz/s", t_xla / t)


def bench_bell(quick):
    import jax.numpy as jnp

    from sparse_tpu.formats.bell import bell_from_bsr, bell_smvm, bell_spmm
    from sparse_tpu.formats.bsr import BSR
    from sparse_tpu.ops.segmented import INDEX_DTYPE

    rng = np.random.default_rng(1)
    bsz, half = 32, 2
    nb = 7_800 if quick else 15_625
    n = nb * bsz
    rows, cols = [], []
    for off in range(-half, half + 1):
        r = np.arange(max(0, -off), min(nb, nb - off), dtype=np.int64)
        rows.append(r)
        cols.append(r + off)
    rows = np.concatenate(rows)
    cols = np.concatenate(cols)
    order = np.lexsort((cols, rows))
    rows, cols = rows[order], cols[order]
    # pooled values (this host draws normals at ~2M/s; see bench.py), and
    # host-side construction so the matrix crosses the tunnel exactly once
    pool = (rng.standard_normal(1021 * bsz * bsz).astype(np.float32) * 0.01)
    blocks = pool.reshape(1021, bsz, bsz)[np.arange(rows.size) % 1021]
    a = bell_from_bsr(
        BSR(
            indices=(rows * nb + cols).astype(INDEX_DTYPE),
            blocks=blocks,
            n=n,
            bsz=bsz,
        )
    )
    nnz = rows.size * bsz * bsz
    v0 = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    t = timed_chain(lambda v, a: bell_smvm(a, v), v0, a)
    spmv_bytes = rows.size * (bsz * bsz * 4 + 4 + bsz * 4) + n * 4
    emit("bell_spmv_block_banded_eff_bw", spmv_bytes / t / 1e9, "GB/s")

    # (the prepare split measured no better than this path — 61.4 vs 63.8
    # GB/s at bench size, round 3 — and was deleted per the losing-kernel
    # policy; ~30% of ceiling is the documented structural bound at bsz=32)
    emit("bell_spmv_roofline_frac", spmv_bytes / t / 1e9 /
         MEASURED_CEILING_GBPS, "frac")
    # nnz/s roofline model: the bound is the fitted ~67 ns/block contraction
    # issue wall (BELL_SPMV_NS_PER_BLOCK), not traffic — structural_frac is
    # the derived, checkable version of the "structural bound" claim
    from sparse_tpu.formats.bell import (
        BELL_SPMV_NS_PER_BLOCK,
        bell_smvm_hbm_bytes,
    )
    from sparse_tpu.utils.stats import blocked_min_bytes, nnz_roofline

    rl = nnz_roofline(
        nnz, min_bytes=blocked_min_bytes(rows.size, bsz, n),
        plan_bytes=bell_smvm_hbm_bytes(a),
        issue_s=rows.size * BELL_SPMV_NS_PER_BLOCK * 1e-9, seconds=t,
    )
    emit("bell_spmv_frac_of_nnz_roofline", rl["frac_of_nnz_roofline"],
         "frac", rl["structural_frac"])
    emit("bell_spmv_frac_of_plan_ceiling", rl["frac_of_plan_ceiling"],
         "frac")

    # k-sweep (BASELINE config 3: SpMM k=32..256), production dispatch:
    # banded-plan kernel on TPU (same path as the headline bench)
    import jax

    from sparse_tpu.ops.pallas_bell import bell_banded_prepare

    lens = np.bincount(rows, minlength=nb)
    slot_valid = np.arange(a.Lb)[None, :] < lens[:, None]
    plan = (bell_banded_prepare(a, row_tile=5, slot_valid=slot_valid)
            if jax.default_backend() == "tpu" and nb % 5 == 0 else None)
    from sparse_tpu.ops.pallas_bell import banded_spmm_hbm_bytes

    for k in (32, 64, 128, 256):
        b0 = jnp.asarray(rng.standard_normal((n, k)).astype(np.float32) * 0.01)
        t = timed_chain(lambda b, a, plan: bell_spmm(a, b, plan=plan), b0, a, plan)
        # min-traffic model (cross-format comparability): blocks + block col
        # ids + one gathered (bsz, k) operand panel per block + output
        eff = (rows.size * (bsz * bsz * 4 + 4 + bsz * k * 4) + n * k * 4) / t / 1e9
        emit(f"bell_spmm_k{k}_gflops", 2 * nnz * k / t / 1e9, "GFLOP/s")
        emit(f"bell_spmm_k{k}_eff_bw", eff, "GB/s")
        if plan is not None:
            # measured-traffic roofline: actual plan-derived HBM bytes —
            # this is the number held against the 207 GB/s ceiling
            pbytes = banded_spmm_hbm_bytes(plan, bsz, n, k)
            hbm = pbytes / t / 1e9
            emit(f"bell_spmm_k{k}_hbm_bw", hbm, "GB/s",
                 hbm / MEASURED_CEILING_GBPS)
            # nnz/s roofline: structural_frac = intrinsic/plan traffic is
            # the COMPUTED version of the "~74-77% densified-tile bound"
            rl = nnz_roofline(
                nnz, k=k, min_bytes=blocked_min_bytes(rows.size, bsz, n, k),
                plan_bytes=pbytes, seconds=t,
            )
            emit(f"bell_spmm_k{k}_frac_of_nnz_roofline",
                 rl["frac_of_nnz_roofline"], "frac", rl["structural_frac"])

    # small-k production path (round 4): the transposed super-tiled kernel —
    # at k < 128 the standard kernel's sub-128 minor dims get lane-padded
    # and k=32/64 pay k=128's time; the kt kernel keeps n on the minor dim
    # and chains in transposed space (docs/performance.md)
    if jax.default_backend() == "tpu":
        from sparse_tpu.ops.pallas_bell import (
            banded_spmm_t_hbm_bytes,
            bell_banded_prepare_t,
            bell_spmm_pallas_banded_t,
        )

        kit_t = bell_banded_prepare_t(a, slot_valid=slot_valid)
        if kit_t is not None:
            n_pad = int(kit_t.plan.offs.shape[0]) * bsz
            for k in (32, 64):
                bt0 = jnp.asarray(np.pad(
                    (rng.standard_normal((k, n)) * 0.01).astype(np.float32),
                    ((0, 0), (0, n_pad - n))))
                t = timed_chain(
                    lambda bt, a, kit: bell_spmm_pallas_banded_t(a, bt, kit),
                    bt0, a, kit_t,
                )
                hbm = banded_spmm_t_hbm_bytes(kit_t, bsz, n, k) / t / 1e9
                emit(f"bell_spmm_k{k}_kt_gflops", 2 * nnz * k / t / 1e9,
                     "GFLOP/s")
                emit(f"bell_spmm_k{k}_kt_hbm_bw", hbm, "GB/s",
                     hbm / MEASURED_CEILING_GBPS)

    # precision ladder at k=128: the f32 default (HIGHEST = 6-pass bf16 on
    # the MXU) pays ~half the iteration in matmul passes at this size;
    # bf16x3 (manual 3-pass split; Mosaic implements neither Precision.HIGH
    # nor DotAlgorithmPreset) and bf16 streaming (1-pass + half the
    # matrix/operand bytes) trade documented accuracy for rate.  The
    # accuracy ladder vs an f64 oracle is bench_bell_accuracy below.
    if plan is not None:
        k = 128
        b0 = jnp.asarray(rng.standard_normal((n, k)).astype(np.float32) * 0.01)
        t = timed_chain(
            lambda b, a, plan: bell_spmm(a, b, plan=plan, precision="bf16x3"),
            b0, a, plan,
        )
        hbm = banded_spmm_hbm_bytes(plan, bsz, n, k) / t / 1e9
        emit("bell_spmm_k128_bf16x3_gflops", 2 * nnz * k / t / 1e9, "GFLOP/s")
        emit("bell_spmm_k128_bf16x3_hbm_bw", hbm, "GB/s",
             hbm / MEASURED_CEILING_GBPS)
        kit16 = bell_banded_prepare(a, row_tile=5, slot_valid=slot_valid,
                                    compute_dtype=jnp.bfloat16)
        t = timed_chain(lambda b, a, kit: bell_spmm(a, b, plan=kit),
                        b0, a, kit16)
        hbm = banded_spmm_hbm_bytes(kit16, bsz, n, k) / t / 1e9
        emit("bell_spmm_k128_bf16_gflops", 2 * nnz * k / t / 1e9, "GFLOP/s")
        emit("bell_spmm_k128_bf16_hbm_bw", hbm, "GB/s",
             hbm / MEASURED_CEILING_GBPS)


def bench_bell_accuracy(quick):
    """Precision-ladder accuracy vs an f64 oracle (small instance of the
    bench band): max relative error of the banded kernel at HIGHEST (f32
    default), bf16x3, and bf16 streaming.  Documents what each rung of the
    ladder costs in digits before anyone trades accuracy for rate."""
    import jax
    import jax.numpy as jnp

    if jax.default_backend() != "tpu":
        return
    from sparse_tpu.formats.bell import BELL, bell_spmm
    from sparse_tpu.ops.pallas_bell import bell_banded_prepare
    from sparse_tpu.ops.segmented import INDEX_DTYPE

    rng = np.random.default_rng(7)
    bsz, half, nb, k = 32, 2, 320, 128
    n = nb * bsz
    rows, cols = [], []
    for off in range(-half, half + 1):
        r = np.arange(max(0, -off), min(nb, nb - off), dtype=np.int64)
        rows.append(r)
        cols.append(r + off)
    rows = np.concatenate(rows)
    cols = np.concatenate(cols)
    order = np.lexsort((cols, rows))
    rows, cols = rows[order], cols[order]
    lens = np.bincount(rows, minlength=nb)
    Lb = int(lens.max())
    starts = np.zeros(nb + 1, np.int64)
    np.cumsum(lens, out=starts[1:])
    slot = np.arange(rows.size) - starts[rows]
    cols_np = np.zeros((nb, Lb), np.int64)
    cols_np[rows, slot] = cols
    blocks_np = np.zeros((nb, Lb, bsz, bsz), np.float32)
    blocks_np[rows, slot] = rng.standard_normal(
        (rows.size, bsz, bsz)).astype(np.float32)
    slot_valid = np.arange(Lb)[None, :] < lens[:, None]
    b_np = rng.standard_normal((n, k)).astype(np.float32)

    # f64 oracle on the host
    dense = np.zeros((n, n), np.float64)
    for (r, c, blk) in zip(rows, cols, blocks_np[rows, slot]):
        dense[r * bsz:(r + 1) * bsz, c * bsz:(c + 1) * bsz] = blk
    oracle = dense @ b_np.astype(np.float64)
    scale = np.abs(oracle).max()

    a = BELL(cols=jnp.asarray(cols_np, INDEX_DTYPE),
             blocks=jnp.asarray(blocks_np), n=n, bsz=bsz)
    bj = jnp.asarray(b_np)
    for name, kit_kw, prec in (
        ("f32_highest", {}, None),
        ("bf16x3", {}, "bf16x3"),
        ("bf16", {"compute_dtype": jnp.bfloat16}, None),
    ):
        kit = bell_banded_prepare(a, row_tile=8, slot_valid=slot_valid,
                                  **kit_kw)
        out = np.asarray(bell_spmm(a, bj, plan=kit, precision=prec))
        err = np.abs(out.astype(np.float64) - oracle).max() / scale
        emit(f"bell_spmm_k128_{name}_relerr", err, "rel")


def bench_spgemm(quick):
    import jax.numpy as jnp

    from sparse_tpu import csr_from_dense, spgemm

    rng = np.random.default_rng(2)
    n = 1_000 if quick else 2_000
    x = (rng.standard_normal((n, n)) * (rng.random((n, n)) < 0.01)).astype(
        np.float32
    )
    a = csr_from_dense(jnp.asarray(x))
    flops = 2.0 * float((x != 0).sum(0) @ (x != 0).sum(1))
    for method in ("mxu", "esc"):
        # scalar fetch each call: block_until_ready does not force execution
        # over the axon tunnel (docs/performance.md)
        float(jnp.sum(spgemm(a, a, method=method).data))  # warm
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            float(jnp.sum(spgemm(a, a, method=method).data))
            best = min(best, time.perf_counter() - t0)
        suffix = "" if method == "mxu" else "_esc"
        emit(f"spgemm_aa{suffix}_gflops", flops / best / 1e9, "GFLOP/s")


def bench_spgemm_prepared(quick):
    """Prepared SpGEMM (the solver idiom: one symbolic pass per pattern
    pair, many numeric passes as values change — FEM Jacobians, AMG Galerkin
    products).  Records the host prepare cost and the on-chip
    ``spgemm_apply`` numeric rate (sort-free: two gathers + one pre-sorted
    segment-sum)."""
    import jax.numpy as jnp

    from sparse_tpu import CSR
    from sparse_tpu.ops.spgemm import spgemm_apply, spgemm_prepare

    rng = np.random.default_rng(5)
    n = 20_000 if quick else 50_000
    per_row = 10
    rows = np.repeat(np.arange(n, dtype=np.int64), per_row)
    cols = rng.integers(0, n, rows.size, dtype=np.int64)
    order = np.lexsort((cols, rows))
    rows, cols = rows[order], cols[order]
    keep = np.ones(rows.size, bool)
    keep[1:] = (rows[1:] != rows[:-1]) | (cols[1:] != cols[:-1])
    rows, cols = rows[keep], cols[keep]
    vals = (rng.standard_normal(rows.size) * 0.01).astype(np.float32)
    indptr = np.zeros(n + 1, np.int64)
    np.cumsum(np.bincount(rows, minlength=n), out=indptr[1:])
    a = CSR(
        data=jnp.asarray(vals),
        indices=jnp.asarray(cols.astype(np.int32)),
        indptr=jnp.asarray(indptr.astype(np.int32)),
        shape=(n, n),
    )
    t0 = time.perf_counter()
    plan = spgemm_prepare(a, a)
    emit("spgemm_prepare_seconds", time.perf_counter() - t0, "s")
    emit("spgemm_prepare_products", plan.n_products / 1e6, "M")

    def step(adata, plan, a):
        a2 = CSR(data=adata, indices=a.indices, indptr=a.indptr,
                 shape=a.shape)
        c = spgemm_apply(plan, a2, a2)
        # data-dependent feedback without changing magnitudes
        return adata * (1.0 + 1e-30 * jnp.sum(c.data))

    t = timed_chain(step, a.data, plan, a)
    emit("spgemm_apply_gflops", 2 * plan.n_products / t / 1e9, "GFLOP/s")
    emit("spgemm_apply_ms", t * 1e3, "ms")


def bench_bsr_spgemm(quick):
    """Block SpGEMM (the TPU-native sparse x sparse path).  Measured fact
    (docs/performance.md): XLA's element gather runs at a flat ~88 M
    elements/s on the v5e regardless of index locality — an op-rate wall
    that caps any scalar-gather SpGEMM near 0.1 GFLOP/s.  The blocked
    formulation moves 4 KB blocks per gather and multiplies on the MXU,
    so the same machinery runs ~3 orders of magnitude faster.  Reference
    semantics: blocked_square_regular.fut:336-363."""
    import jax.numpy as jnp

    from sparse_tpu.formats.bsr import (
        BSR, bsr_smsmm, bsr_smsmm_apply, bsr_smsmm_prepare,
    )
    from sparse_tpu.ops.segmented import INDEX_DTYPE

    rng = np.random.default_rng(9)
    bsz = 32

    def build(nb):
        per_row = 10
        rows = np.repeat(np.arange(nb, dtype=np.int64), per_row)
        cols = np.clip(rows + rng.integers(-50, 50, rows.size), 0, nb - 1)
        order = np.lexsort((cols, rows))
        rows, cols = rows[order], cols[order]
        keep = np.ones(rows.size, bool)
        keep[1:] = (rows[1:] != rows[:-1]) | (cols[1:] != cols[:-1])
        rows, cols = rows[keep], cols[keep]
        nbz = rows.size
        pool = rng.standard_normal((257, bsz, bsz)).astype(np.float32) * 0.01
        return BSR(
            indices=jnp.asarray(rows * nb + cols, INDEX_DTYPE),
            blocks=jnp.asarray(pool[np.arange(nbz) % 257]),
            n=nb * bsz,
            bsz=bsz,
        )

    def step(blocks, plan, a):
        a2 = BSR(indices=a.indices, blocks=blocks, n=a.n, bsz=a.bsz)
        c = bsr_smsmm_apply(plan, a2, a2)
        return blocks * (1.0 + 1e-30 * jnp.sum(c.blocks))

    # the remote tunnel compiler has congestion windows where the larger
    # instance's compile 500s (docs/performance.md); degrade to the quick
    # size rather than losing the section
    for nb in ((2_000,) if quick else (4_000, 2_000)):
        a = build(nb)
        t0 = time.perf_counter()
        plan = bsr_smsmm_prepare(a, a)
        prep_s = time.perf_counter() - t0
        flops = 2.0 * plan.n_products * bsz**3
        try:
            t = timed_chain(step, a.blocks, plan, a)
        except Exception as e:
            if nb == 2_000:
                raise
            emit("bsr_spgemm_full_size_error", 0,
                 f"{type(e).__name__} at nb={nb}; retrying nb=2000")
            continue
        break
    emit("bsr_spgemm_prepare_seconds", prep_s, "s")
    emit("bsr_spgemm_products", plan.n_products / 1e6, "M blk")
    emit("bsr_spgemm_apply_gflops", flops / t / 1e9, "GFLOP/s")
    # HBM traffic of the numeric pass: two gathered block operands + the
    # product stream into the segment-sum + the output blocks
    bytes_ = (2 * plan.n_products + plan.nbz_out) * bsz * bsz * 4
    emit("bsr_spgemm_apply_hbm_bw", bytes_ / t / 1e9, "GB/s",
         bytes_ / t / 1e9 / MEASURED_CEILING_GBPS)

    # Pallas DMA-gathered apply (round 4): the DMA engine does the block
    # gathering, one batched MXU einsum per grid step, VMEM slab
    # accumulation — removes both the XLA gather wall (~318 ns/4KB block)
    # and the segment-sum pass.  Always at the full size: the XLA apply
    # OOMs HBM at 364k products (three 4x-tile-padded product-stream
    # temps of 5.5 GB each — the real cause of the "remote-compiler 500s"
    # of rounds 3-4; docs/performance.md), while the Pallas kernel never
    # materializes the product stream.
    from sparse_tpu.ops.pallas_bsr import (
        bsr_smsmm_apply_pallas,
        bsr_smsmm_pallas_prepare,
    )

    if not quick and a.nb != 4_000:
        ap = build(4_000)
        pplan = bsr_smsmm_prepare(ap, ap)
        emit("bsr_spgemm_pallas_products", pplan.n_products / 1e6, "M blk")
    else:
        ap, pplan = a, plan
    pflops = 2.0 * pplan.n_products * bsz**3

    t0 = time.perf_counter()
    pp = bsr_smsmm_pallas_prepare(pplan, ap.nbz, ap.nbz)
    emit("bsr_spgemm_pallas_prepare_seconds", time.perf_counter() - t0, "s")

    def step_pallas(blocks, pp, ap):
        a2 = BSR(indices=ap.indices, blocks=blocks, n=ap.n, bsz=ap.bsz)
        c = bsr_smsmm_apply_pallas(pp, a2, a2)
        return blocks * (1.0 + 1e-30 * jnp.sum(c.blocks))

    t = timed_chain(step_pallas, ap.blocks, pp, ap)
    emit("bsr_spgemm_pallas_apply_gflops", pflops / t / 1e9, "GFLOP/s")
    S = int(pp.first.shape[0])
    pbytes = (2 * S * pp.g + pplan.nbz_out) * bsz * bsz * 4
    emit("bsr_spgemm_pallas_apply_dma_bw", pbytes / t / 1e9, "GB/s")
    del ap, pplan, pp

    # one-shot (symbolic pass on device, sort included)
    import jax

    f = jax.jit(lambda a: jnp.sum(bsr_smsmm(a, a, expansion_nbz=plan.n_products,
                                            compact=False).blocks))
    float(f(a))
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        float(f(a))
        best = min(best, time.perf_counter() - t0)
    emit("bsr_spgemm_oneshot_gflops", flops / best / 1e9, "GFLOP/s")


def bench_distributed():
    import jax

    if len(jax.devices()) < 2:
        return
    import jax.numpy as jnp

    from sparse_tpu import csr_from_dense
    from sparse_tpu.parallel import make_1d_mesh, pcsr_from_csr, pcsr_spmv
    from sparse_tpu.parallel.pcsr import shard_vector

    rng = np.random.default_rng(3)
    n = 4096
    x = (rng.standard_normal((n, n)) * (rng.random((n, n)) < 0.02)).astype(
        np.float32
    )
    a = csr_from_dense(jnp.asarray(x))
    mesh = make_1d_mesh()
    pa = pcsr_from_csr(a, mesh)
    v0 = shard_vector(jnp.asarray(rng.standard_normal(n).astype(np.float32)), pa, mesh)
    t = timed_chain(lambda v, pa: pcsr_spmv(pa, v, mesh), v0, pa)
    emit(
        f"pcsr_spmv_{len(jax.devices())}dev_nnzps",
        float((x != 0).sum()) / t / 1e9,
        "Gnnz/s",
    )


def _banded_csr(n, per_row, half_width, seed):
    import jax.numpy as jnp

    from sparse_tpu import CSR

    rng = np.random.default_rng(seed)
    rows = np.repeat(np.arange(n, dtype=np.int64), per_row)
    cols = np.clip(rows + rng.integers(-half_width, half_width, rows.size),
                   0, n - 1)
    order = np.lexsort((cols, rows))
    rows, cols = rows[order], cols[order]
    keep = np.ones(rows.size, bool)
    keep[1:] = (rows[1:] != rows[:-1]) | (cols[1:] != cols[:-1])
    rows, cols = rows[keep], cols[keep]
    vals = (rng.standard_normal(rows.size) * 0.01).astype(np.float32)
    indptr = np.zeros(n + 1, np.int64)
    np.cumsum(np.bincount(rows, minlength=n), out=indptr[1:])
    return CSR(
        data=jnp.asarray(vals),
        indices=jnp.asarray(cols.astype(np.int32)),
        indptr=jnp.asarray(indptr.astype(np.int32)),
        shape=(n, n),
    ), rows.size


def bench_weak_scaling(quick):
    """BASELINE config 5: fixed rows/device, time pcsr_spmv at growing
    device counts; efficiency(d) = t(1) / t(d) (flat time = 1.0).

    Caveat: on the virtual CPU mesh the d "devices" oversubscribe the
    host's physical cores, so efficiency here is bounded by core count,
    not by the communication pattern — treat CPU numbers as a structural
    regression check, not a scaling result.  Real weak scaling needs a
    multi-chip TPU slice (ICI collectives)."""
    import jax

    ndev = len(jax.devices())
    if ndev < 2:
        return
    import jax.numpy as jnp

    from sparse_tpu.parallel import make_1d_mesh, pcsr_from_csr, pcsr_spmv
    from sparse_tpu.parallel.pcsr import shard_vector

    rows_per_dev = 16_384 if quick else 65_536
    per_row = 16
    t1 = None
    d = 1
    while d <= ndev:
        n = rows_per_dev * d
        a, nnz = _banded_csr(n, per_row, 2048, seed=100 + d)
        mesh = make_1d_mesh(d)
        pa = pcsr_from_csr(a, mesh)
        v0 = shard_vector(
            jnp.asarray(
                np.random.default_rng(d).standard_normal(n).astype(np.float32)
            ),
            pa, mesh,
        )
        t = timed_chain(lambda v, pa: pcsr_spmv(pa, v, mesh), v0, pa)
        if d == 1:
            t1 = t
        emit(
            f"pcsr_spmv_weak_{d}dev_nnzps", nnz / t / 1e9, "Gnnz/s",
            t1 / t,
        )
        d *= 2


def bench_route_boundary(quick):
    """The SpGEMM dispatch boundary, measured (round-5 verdict item): a
    matrix with DETECTABLE 32-block clusters at ~0.6 internal fill.  The
    dispatcher must decline the block route — full fill is the
    precondition for exact reference stored-structure semantics
    (compressed.fut:268-331: every stored C position is a realized
    product) — and the row quantifies what the decline costs: the forced
    block path runs orders faster but stores explicit zeros the reference
    contract says don't exist.  Correctness beats rate at the boundary;
    the block path remains one `csr_to_bsr` away for callers who accept
    padded-block semantics.  TPU only."""
    import jax
    import jax.numpy as jnp

    if jax.default_backend() != "tpu":
        return
    from sparse_tpu import CSR
    from sparse_tpu.ops.spgemm import _spgemm_route
    from sparse_tpu.utils.stats import csr_block_fill

    # sized so the scalar ESC pass stays feasible (~7M scalar products —
    # at 0.6 fill the scalar product count grows with nnz^2/n, which is
    # itself part of the boundary story)
    bsz, nbk = 32, 96
    rng = np.random.default_rng(31)
    br, bc = np.nonzero(rng.random((nbk, nbk)) < 0.016)
    keep_diag = np.unique(np.concatenate([br * nbk + bc,
                                          np.arange(nbk) * (nbk + 1)]))
    br, bc = keep_diag // nbk, keep_diag % nbk
    n = nbk * bsz
    # ~60% internal fill: blocks are clusters, not dense
    sub = rng.random((br.size, bsz, bsz)) < 0.6
    rows = (br[:, None, None] * bsz
            + np.arange(bsz)[None, :, None]) * np.ones(
        (1, 1, bsz), np.int64)
    cols = (bc[:, None, None] * bsz
            + np.arange(bsz)[None, None, :]) * np.ones(
        (1, bsz, 1), np.int64)
    r = rows[sub].astype(np.int64)
    c = cols[sub].astype(np.int64)
    order = np.lexsort((c, r))
    r, c = r[order], c[order]
    vals = (rng.standard_normal(r.size) * 0.01).astype(np.float32)
    indptr = np.zeros(n + 1, np.int64)
    np.cumsum(np.bincount(r, minlength=n), out=indptr[1:])
    a = CSR(data=jnp.asarray(vals), indices=jnp.asarray(c.astype(np.int32)),
            indptr=jnp.asarray(indptr.astype(np.int64)), shape=(n, n))
    fill = csr_block_fill(a, bsz)
    route, _ = _spgemm_route(a, a, mxu_budget=10)
    emit("route_boundary_block_fill", fill, "ratio", 1.0 if route == "esc"
         else 0.0)
    assert route == "esc", route

    # the chosen path: prepared scalar apply (exact reference structure)
    from sparse_tpu.ops.spgemm import spgemm_apply, spgemm_prepare

    splan = spgemm_prepare(a, a)

    def sstep(data, plan, a):
        a2 = CSR(data=data, indices=a.indices, indptr=a.indptr,
                 shape=a.shape)
        return data * (1.0 + 1e-30 * jnp.sum(spgemm_apply(plan, a2, a2).data))

    t = timed_chain(sstep, a.data, splan, a)
    emit("route_boundary_scalar_gflops", 2 * splan.n_products / t / 1e9,
         "GFLOP/s")

    # the declined path, forced: faster, but its stored structure departs
    # from the reference contract (explicit zeros inside padded blocks)
    from sparse_tpu.formats.bsr import BSR, bsr_smsmm_prepare, csr_to_bsr
    from sparse_tpu.ops.pallas_bsr import (
        bsr_smsmm_apply_pallas,
        bsr_smsmm_pallas_prepare,
    )

    ab = csr_to_bsr(a, bsz)
    bplan = bsr_smsmm_prepare(ab, ab)
    pp = bsr_smsmm_pallas_prepare(bplan, ab.nbz, ab.nbz)
    flops = 2 * bplan.n_products * bsz ** 3

    def bstep(blocks, pp, ab):
        m = BSR(indices=ab.indices, blocks=blocks, n=ab.n, bsz=ab.bsz)
        return blocks * (
            1.0 + 1e-30 * jnp.sum(bsr_smsmm_apply_pallas(pp, m, m).blocks))

    t = timed_chain(bstep, ab.blocks, pp, ab)
    emit("route_boundary_forced_block_gflops", flops / t / 1e9, "GFLOP/s",
         1.0 / max(fill, 1e-9))  # vs_baseline = storage blow-up factor


def bench_solvers(quick):
    """Solver-stack on-chip rates (the C8 critical path,
    blocked_square_regular.fut:414-464 lup_nofill, :556-599 for/backsolve,
    :601-603 ols): factorization and triangular-sweep cost vs block-column
    count (the sequential fori_loop critical path), and preconditioned CG
    end-to-end — ILU(0) (sequential sweeps) vs block-Jacobi (batched) vs
    plain.  TPU only."""
    import jax
    import jax.numpy as jnp

    if jax.default_backend() != "tpu":
        return
    from sparse_tpu.formats.bsr import BSR, bsr_to_csr
    from sparse_tpu.ops.segmented import INDEX_DTYPE
    from sparse_tpu.solve.bsr_lu import (
        bsr_forsolve,
        bsr_lu_numeric_apply,
        bsr_lu_numeric_prepare,
        bsr_tri_plan,
    )

    bsz, half = 32, 2
    rng = np.random.default_rng(21)

    def block_band(nb, spd=False):
        rows, cols = [], []
        for off in range(-half, half + 1):
            r = np.arange(max(0, -off), min(nb, nb - off), dtype=np.int64)
            rows.append(r)
            cols.append(r + off)
        rows = np.concatenate(rows)
        cols = np.concatenate(cols)
        order = np.lexsort((cols, rows))
        rows, cols = rows[order], cols[order]
        pool = (rng.standard_normal(521 * bsz * bsz).astype(np.float32) * 0.05)
        blocks = pool.reshape(521, bsz, bsz)[np.arange(rows.size) % 521].copy()
        if spd:
            # symmetric values + strong block-diagonal dominance
            mirror = {(int(r), int(c)): i for i, (r, c) in
                      enumerate(zip(rows, cols))}
            for i, (r, c) in enumerate(zip(rows, cols)):
                if r < c:
                    blocks[mirror[(int(c), int(r))]] = blocks[i].T
                elif r == c:
                    blocks[i] = (blocks[i] + blocks[i].T) / 2 \
                        + np.eye(bsz, dtype=np.float32) * 4.0
        else:
            diag = rows == cols
            blocks[diag] += np.eye(bsz, dtype=np.float32) * 4.0
        return BSR(
            indices=jnp.asarray(rows * nb + cols, INDEX_DTYPE),
            blocks=jnp.asarray(blocks),
            n=nb * bsz,
            bsz=bsz,
        )

    # -- factorization + triangular sweeps vs block-column count -----------
    for nb in ((256, 1024) if quick else (256, 1024, 4096)):
        a = block_band(nb)
        plan = bsr_lu_numeric_prepare(a)  # full band: no fill
        nnz = a.nbz * bsz * bsz

        def fact_step(blocks, idxs, plan):
            m = BSR(indices=idxs, blocks=blocks, n=nb * bsz, bsz=bsz)
            lu = bsr_lu_numeric_apply(plan, m, pivot=True)[0].blocks
            return lu / (jnp.max(jnp.abs(lu)) + 1.0)

        t = timed_chain(fact_step, a.blocks, a.indices, plan)
        emit(f"bsr_lup_nofill_nb{nb}_ms", t * 1e3, "ms",
             t / nb * 1e6)  # vs_baseline = us per block column
        emit(f"bsr_lup_nofill_nb{nb}_mnnzps", nnz / t / 1e6, "Mnnz/s")

        lu, _ = bsr_lu_numeric_apply(plan, a, pivot=True)
        fplan = bsr_tri_plan(lu, lower=True)
        b0 = jnp.asarray(
            rng.standard_normal(nb * bsz).astype(np.float32) * 0.01)

        def sweep_step(v, lu, fplan):
            y = bsr_forsolve(lu, v, fplan)
            return y / (jnp.max(jnp.abs(y)) + 1.0)

        t = timed_chain(sweep_step, b0, lu, fplan)
        emit(f"bsr_forsolve_nb{nb}_ms", t * 1e3, "ms", t / nb * 1e6)
        emit(f"bsr_forsolve_nb{nb}_mnnzps",
             a.nbz * bsz * bsz / 2 / t / 1e6, "Mnnz/s")

    # -- preconditioned CG end-to-end (1-device mesh) ----------------------
    from sparse_tpu.parallel import cg_solve, make_1d_mesh, pcg_solve, pcsr_from_csr
    from sparse_tpu.parallel.pcsr import shard_vector
    from sparse_tpu.solve.precond import (
        block_jacobi_prepare,
        bsr_ilu0_preconditioner,
    )

    nb = 500 if quick else 2000
    a_bsr = block_band(nb, spd=True)
    n = nb * bsz
    a_csr = bsr_to_csr(a_bsr)
    mesh = make_1d_mesh(1)
    pa = pcsr_from_csr(a_csr, mesh)
    b_np = rng.standard_normal(n).astype(np.float32)
    b = shard_vector(jnp.asarray(b_np), pa, mesh)
    L = pa.rows_per_shard * pa.n_shards
    # full size: the PCSR baseline runs ~1.65 s/iter (scalar-gather class)
    # and a single device program faults past ~60 s on this tunnel — cap
    # the iteration count so every variant's program stays under the limit
    # (ms/iter is the metric; residuals are comparable at equal iters)
    iters = 40 if quick else 15
    an = np.asarray(a_csr.data)  # noqa: F841  (warm the host transfer)

    def resid(x):
        from sparse_tpu.formats.csr import csr_smvm

        r = np.asarray(csr_smvm(a_csr, jnp.asarray(np.asarray(x)[:n]))) - b_np
        return float(np.linalg.norm(r) / np.linalg.norm(b_np))

    import time as _time

    def timed_solve(jfn, *args):
        # jit the WHOLE solve once per variant: an un-jitted call would
        # rebuild the fori_loop closure (and recompile) every invocation
        x = jfn(*args)
        jax.block_until_ready(x)
        best = np.inf
        for _ in range(2):
            t0 = _time.perf_counter()
            jax.block_until_ready(jfn(*args))
            best = min(best, _time.perf_counter() - t0)
        return x, best

    cg_j = jax.jit(lambda pa, b: cg_solve(pa, b, mesh, iters=iters))
    x, t = timed_solve(cg_j, pa, b)
    emit("solver_cg_ms_per_iter", t / iters * 1e3, "ms", resid(x))

    inv_bj = block_jacobi_prepare(a_csr, bsz, padded_n=L)
    bj_j = jax.jit(
        lambda pa, b, inv: pcg_solve(pa, b, inv, mesh, iters=iters))
    x, t = timed_solve(bj_j, pa, b, inv_bj)
    emit("solver_pcg_blockjacobi_ms_per_iter", t / iters * 1e3, "ms",
         resid(x))

    M = bsr_ilu0_preconditioner(a_bsr, padded_n=L)
    ilu_j = jax.jit(lambda pa, b: pcg_solve(pa, b, M, mesh, iters=iters))
    x, t = timed_solve(ilu_j, pa, b)
    emit("solver_pcg_ilu0_ms_per_iter", t / iters * 1e3, "ms", resid(x))

    # the same CG through the fast segment-tile halo matvec (round 5):
    # the solver stack inherits the distributed fast path via dist_spmv
    from sparse_tpu.parallel import halo_partition_segtile

    hs = halo_partition_segtile(a_csr, mesh)
    cg_seg_j = jax.jit(lambda hs, b: cg_solve(hs, b, mesh, iters=iters))
    x, t = timed_solve(cg_seg_j, hs, b)
    emit("solver_cg_segtile_ms_per_iter", t / iters * 1e3, "ms", resid(x))

    # ILU(0) against the FAST matvec: isolates what the two sequential
    # triangular sweeps cost per iteration relative to a ~sub-ms matvec
    ilu_seg_j = jax.jit(lambda hs, b: pcg_solve(hs, b, M, mesh, iters=iters))
    x, t = timed_solve(ilu_seg_j, hs, b)
    emit("solver_pcg_ilu0_segtile_ms_per_iter", t / iters * 1e3, "ms",
         resid(x))
    bj_seg_j = jax.jit(
        lambda hs, b, inv: pcg_solve(hs, b, inv, mesh, iters=iters))
    x, t = timed_solve(bj_seg_j, hs, b, inv_bj)
    emit("solver_pcg_blockjacobi_segtile_ms_per_iter", t / iters * 1e3,
         "ms", resid(x))


if __name__ == "__main__":
    quick = "--quick" in sys.argv
    only = [a.split("=", 1)[1] for a in sys.argv if a.startswith("--only=")]
    # sections are independent: a failure (tunnel hiccup, compile error)
    # reports and moves on instead of killing the remaining metrics
    for section in (bench_csr, bench_csr_segtile, bench_reorder,
                    bench_real_matrices, bench_bell, bench_bell_accuracy,
                    bench_spgemm, bench_spgemm_prepared, bench_bsr_spgemm,
                    bench_route_boundary, bench_solvers, bench_distributed,
                    bench_weak_scaling):
        if only and not any(o in section.__name__ for o in only):
            continue
        try:
            if section in (bench_distributed,):
                section()
            else:
                section(quick)
        except Exception as e:
            print(json.dumps({
                "metric": f"{section.__name__}_error",
                "value": 0,
                "unit": f"{type(e).__name__}: {str(e)[:160]}",
            }), flush=True)
