"""Chip measurement: what bounds `bsr_smsmm_apply`?

The numeric block-SpGEMM pass is three stages: gather both factors'
blocks, batched (bsz,bsz,bsz) einsum on the MXU, pre-sorted segment-sum
into the output blocks.  This times each stage in isolation (chained
protocol) at the suite's 181k-block-product size so the roofline
statement in docs/performance.md is measured, not guessed.

Usage: python measure_bsr_spgemm_parts.py
"""
from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from sparse_tpu.formats.bsr import BSR, bsr_smsmm_prepare
from sparse_tpu.ops.segmented import INDEX_DTYPE, segment_sum
from sparse_tpu.utils.precision import matmul_precision

K_CHAIN = 5
BSZ = 32


def build(nb=2_000):
    rng = np.random.default_rng(9)
    per_row = 10
    rows = np.repeat(np.arange(nb, dtype=np.int64), per_row)
    cols = np.clip(rows + rng.integers(-50, 50, rows.size), 0, nb - 1)
    order = np.lexsort((cols, rows))
    rows, cols = rows[order], cols[order]
    keep = np.ones(rows.size, bool)
    keep[1:] = (rows[1:] != rows[:-1]) | (cols[1:] != cols[:-1])
    rows, cols = rows[keep], cols[keep]
    pool = rng.standard_normal((257, BSZ, BSZ)).astype(np.float32) * 0.01
    return BSR(
        indices=jnp.asarray(rows * nb + cols, INDEX_DTYPE),
        blocks=jnp.asarray(pool[np.arange(rows.size) % 257]),
        n=nb * BSZ,
        bsz=BSZ,
    )


def timed(fn, *args):
    @jax.jit
    def chain(x, *ops):
        def body(_, x):
            return fn(x, *ops)

        return jnp.sum(jax.lax.fori_loop(0, K_CHAIN, body, x))

    float(chain(*args))
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        float(chain(*args))
        best = min(best, time.perf_counter() - t0)
    return best / K_CHAIN


def main():
    a = build()
    plan = bsr_smsmm_prepare(a, a)
    F = plan.n_products
    nbz_out = plan.nbz_out
    print(f"F={F} block products, nbz_out={nbz_out}", file=sys.stderr)
    flops = 2 * F * BSZ ** 3
    prec = matmul_precision(a.dtype, a.dtype)

    # (1) gathers only: both factor streams, summed to keep them live
    t = timed(
        lambda blocks, ap, bp: blocks
        * (1.0 + 1e-30 * (jnp.sum(blocks[ap]) + jnp.sum(blocks[bp]))),
        a.blocks, plan.a_pos, plan.b_pos,
    )
    print(f"gathers only: {t*1e3:.2f} ms "
          f"({2*F*BSZ*BSZ*4/t/1e9:.1f} GB/s gathered)")

    # (2) einsum only on PRE-gathered contiguous streams (no gather)
    ga = a.blocks[plan.a_pos]
    gb = a.blocks[plan.b_pos]
    jax.block_until_ready(gb)
    t = timed(
        lambda ga, gb: ga * (1.0 + 1e-30 * jnp.sum(jnp.einsum(
            "fij,fjk->fik", ga, gb, preferred_element_type=jnp.float32,
            precision=prec))),
        ga, gb,
    )
    print(f"einsum only: {t*1e3:.2f} ms ({flops/t/1e9:.1f} GFLOP/s)")

    # (3) segment-sum only on a precomputed product stream
    prods = jnp.einsum("fij,fjk->fik", ga, gb,
                       preferred_element_type=jnp.float32, precision=prec)
    jax.block_until_ready(prods)
    t = timed(
        lambda prods, seg: prods * (1.0 + 1e-30 * jnp.sum(segment_sum(
            prods, seg, nbz_out, indices_are_sorted=True))),
        prods, plan.seg,
    )
    print(f"segment-sum only: {t*1e3:.2f} ms")


if __name__ == "__main__" and len(sys.argv) == 1:
    main()


def main_pallas(g=8, p=16, check=False, nb=2_000):
    """Measure the Pallas DMA-gathered apply vs the XLA apply."""
    from sparse_tpu.formats.bsr import bsr_smsmm_apply
    from sparse_tpu.ops.pallas_bsr import (
        bsr_smsmm_apply_pallas,
        bsr_smsmm_pallas_prepare,
    )

    a = build(nb)
    plan = bsr_smsmm_prepare(a, a)
    t0 = time.time()
    pp = bsr_smsmm_pallas_prepare(plan, a.nbz, a.nbz, g=g, p=p)
    F = plan.n_products
    S = int(pp.first.shape[0])
    print(f"F={F} S={S} g={g} p={p} chunks={len(pp.chunks)} "
          f"(prep {time.time()-t0:.1f}s)", file=sys.stderr)
    flops = 2 * F * BSZ ** 3

    if check:
        ref = bsr_smsmm_apply(plan, a, a)
        out = jax.jit(lambda pp, a: bsr_smsmm_apply_pallas(pp, a, a))(pp, a)
        err = float(jnp.max(jnp.abs(out.blocks - ref.blocks))
                    / (jnp.max(jnp.abs(ref.blocks)) + 1e-30))
        print(f"full-size rel err vs XLA apply: {err:.2e}")
        assert err < 1e-5, err

    t = timed(
        lambda blocks, pp, a: blocks * (1.0 + 1e-30 * jnp.sum(
            bsr_smsmm_apply_pallas(
                pp, BSR(indices=a.indices, blocks=blocks, n=a.n, bsz=a.bsz),
                BSR(indices=a.indices, blocks=blocks, n=a.n, bsz=a.bsz),
            ).blocks)),
        a.blocks, pp, a,
    )
    print(f"pallas apply g={g} p={p}: {t*1e3:.2f} ms "
          f"({flops/t/1e9:.1f} GFLOP/s, "
          f"{(2*S*g+int(pp.indices.shape[0]))*BSZ*BSZ*4/t/1e9:.1f} GB/s)")


def main_grad(nb=2_000):
    """Measure forward+backward through the differentiable Pallas apply."""
    from sparse_tpu.ops.pallas_bsr import (
        bsr_smsmm_apply_pallas_ad,
        bsr_smsmm_pallas_prepare_ad,
    )

    a = build(nb)
    plan = bsr_smsmm_prepare(a, a)
    t0 = time.time()
    plans = bsr_smsmm_pallas_prepare_ad(plan, a.nbz, a.nbz)
    F = plan.n_products
    print(f"F={F} (ad prep {time.time()-t0:.1f}s)", file=sys.stderr)
    flops = 3 * 2 * F * BSZ ** 3  # fwd + two bwd products

    def value_grad(blocks, plans, a):
        def loss(bl):
            m = BSR(indices=a.indices, blocks=bl, n=a.n, bsz=a.bsz)
            return jnp.sum(bsr_smsmm_apply_pallas_ad(plans, m, m).blocks)

        # value_and_grad + using BOTH outputs keeps the forward kernel
        # live (plain grad() lets XLA DCE it: the residuals are just the
        # inputs, so the forward pallas_call's output is otherwise unused)
        v, gr = jax.value_and_grad(loss)(blocks)
        return v + jnp.sum(gr)

    t = timed(
        lambda blocks, plans, a: blocks
        * (1.0 + 1e-30 * value_grad(blocks, plans, a)),
        a.blocks, plans, a,
    )
    print(f"value+grad (fwd+2 bwd) nb={nb}: {t*1e3:.2f} ms "
          f"({flops/t/1e9:.1f} GFLOP/s equivalent)")


if __name__ == "__main__" and len(sys.argv) > 1 and sys.argv[1] == "grad":
    _nb = [int(x[3:]) for x in sys.argv[2:] if x.startswith("nb=")]
    main_grad(nb=_nb[0] if _nb else 2_000)


if __name__ == "__main__" and len(sys.argv) > 1 and sys.argv[1] == "pallas":
    _nb = [int(x[3:]) for x in sys.argv[2:] if x.startswith("nb=")]
    _pos = [x for x in sys.argv[2:] if not x.startswith("nb=") and x != "check"]
    main_pallas(
        int(_pos[0]) if _pos else 8,
        int(_pos[1]) if len(_pos) > 1 else 16,
        check="check" in sys.argv[2:],
        nb=_nb[0] if _nb else 2_000,
    )
