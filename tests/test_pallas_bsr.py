"""Pallas DMA-gathered block-SpGEMM apply (interpret mode) vs oracles.

``bsr_smsmm_apply_pallas`` must agree with ``bsr_smsmm_apply`` (same
plan, same block structure; reference contract
blocked_square_regular.fut:336-363) across slab/step/chunk boundaries,
value updates, and mixed dtypes.  Sizes stay tiny: interpret-mode Pallas
costs ~1 ms per traced op per grid step.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sparse_tpu.formats.bsr import (
    BSR,
    bsr_todense,
    bsr_smsmm_apply,
    bsr_smsmm_prepare,
)
from sparse_tpu.ops.pallas_bsr import (
    bsr_smsmm_apply_pallas,
    bsr_smsmm_pallas_prepare,
)
from sparse_tpu.ops.segmented import INDEX_DTYPE


def random_bsr(nb, bsz, density, seed, dtype=np.float32):
    rng = np.random.default_rng(seed)
    mask = rng.random((nb, nb)) < density
    r, c = np.nonzero(mask)
    blocks = rng.standard_normal((r.size, bsz, bsz)).astype(dtype)
    return BSR(
        indices=jnp.asarray(r * nb + c, INDEX_DTYPE),
        blocks=jnp.asarray(blocks),
        n=nb * bsz,
        bsz=bsz,
    )


@pytest.mark.parametrize(
    "nb,bsz,density,g,p",
    [
        (6, 8, 0.4, 4, 4),    # multi-product runs, several slabs
        (10, 8, 0.15, 2, 8),  # sparse: mostly 1-product outputs
        (4, 16, 0.9, 8, 2),   # dense-ish: long runs, multi-step slabs
        (5, 8, 0.3, 16, 16),  # g and p larger than most runs (heavy pad)
    ],
)
def test_matches_xla_apply(nb, bsz, density, g, p):
    a = random_bsr(nb, bsz, density, seed=nb + bsz)
    b = random_bsr(nb, bsz, density, seed=3 * nb)
    plan = bsr_smsmm_prepare(a, b)
    pp = bsr_smsmm_pallas_prepare(plan, a.nbz, b.nbz, g=g, p=p)
    ref = bsr_smsmm_apply(plan, a, b)
    got = bsr_smsmm_apply_pallas(pp, a, b, interpret=True)
    assert np.array_equal(np.asarray(got.indices), np.asarray(ref.indices))
    np.testing.assert_allclose(
        np.asarray(got.blocks), np.asarray(ref.blocks), rtol=2e-5, atol=2e-5
    )
    # and against the dense oracle
    da = np.asarray(bsr_todense(a))
    db = np.asarray(bsr_todense(b))
    np.testing.assert_allclose(
        np.asarray(bsr_todense(got)), da @ db, rtol=2e-4, atol=2e-4
    )


def test_chunk_boundaries():
    # force several pallas_calls by shrinking the SMEM budget via a large g
    # on a plan whose step count exceeds the derived cap
    from sparse_tpu.ops import pallas_bsr as pb

    a = random_bsr(12, 8, 0.3, seed=7)
    plan = bsr_smsmm_prepare(a, a)
    pp = bsr_smsmm_pallas_prepare(plan, a.nbz, a.nbz, g=2, p=2)
    # rebuild with a tiny step cap to exercise the chunk loop
    old = pb._SMEM_BUDGET
    try:
        pb._SMEM_BUDGET = (3 * 2 + 2) * 4 * 256  # -> cap = 256 steps
        pp_small = bsr_smsmm_pallas_prepare(plan, a.nbz, a.nbz, g=2, p=2)
    finally:
        pb._SMEM_BUDGET = old
    ref = bsr_smsmm_apply(plan, a, a)
    for plan_v in (pp, pp_small):
        got = bsr_smsmm_apply_pallas(plan_v, a, a, interpret=True)
        np.testing.assert_allclose(
            np.asarray(got.blocks), np.asarray(ref.blocks), rtol=2e-5,
            atol=2e-5,
        )


def test_oversized_slab_shrinks_p_or_raises():
    # a dense block-row x dense block-column pair concentrates every
    # product on ONE output block; with a tiny SMEM budget the scheduler
    # must shrink p so no slab exceeds a single call's step cap, and
    # raise a clear error when even p=1 cannot fit
    from sparse_tpu.ops import pallas_bsr as pb

    bsz, nb = 8, 40
    # A: one stored block row 0 (all columns); B: one stored column 0
    a = BSR(
        indices=jnp.asarray(np.arange(nb), INDEX_DTYPE),
        blocks=jnp.asarray(
            np.random.default_rng(0).standard_normal((nb, bsz, bsz))
            .astype(np.float32)),
        n=nb * bsz, bsz=bsz,
    )
    b = BSR(
        indices=jnp.asarray(np.arange(nb) * nb, INDEX_DTYPE),
        blocks=jnp.asarray(
            np.random.default_rng(1).standard_normal((nb, bsz, bsz))
            .astype(np.float32)),
        n=nb * bsz, bsz=bsz,
    )
    plan = bsr_smsmm_prepare(a, b)
    assert plan.n_products == nb and plan.nbz_out == 1
    pp = bsr_smsmm_pallas_prepare(plan, a.nbz, b.nbz, g=2, p=16)
    ref = bsr_smsmm_apply(plan, a, b)
    got = bsr_smsmm_apply_pallas(pp, a, b, interpret=True)
    np.testing.assert_allclose(np.asarray(got.blocks),
                               np.asarray(ref.blocks), rtol=2e-5, atol=2e-5)
    # force the 256-step cap floor (default budget caps at 21875 for g=2)
    old = pb._SMEM_BUDGET
    try:
        pb._SMEM_BUDGET = 1
        # shrink: 4 outputs x 200 products in one p=16 slab = 400 steps
        # at g=2 > the 256-step cap -> p must halve until each slab fits
        sched = pb._schedule(
            np.repeat(np.arange(4, dtype=np.int64), 200),
            np.zeros(800, np.int64), np.zeros(800, np.int64),
            1, 1, 4, jnp.zeros(4, jnp.int32), 2, 16, bsz, bsz,
        )
        assert sched.p < 16
        assert max(c[1] - c[0] for c in sched.chunks) <= 256
        # impossible: one output with more products than cap*g even at p=1
        with pytest.raises(ValueError, match="use bsr_smsmm_apply"):
            pb._schedule(
                np.zeros(600, np.int64),  # 600 products, one output
                np.zeros(600, np.int64), np.zeros(600, np.int64),
                1, 1, 1, jnp.zeros(1, jnp.int32), 2, 16, bsz, bsz,
            )
    finally:
        pb._SMEM_BUDGET = old


def test_value_update_under_jit():
    # prepare once, apply twice with different values (the prepare/apply
    # contract: block structure static, values free)
    a = random_bsr(6, 8, 0.5, seed=1)
    plan = bsr_smsmm_prepare(a, a)
    pp = bsr_smsmm_pallas_prepare(plan, a.nbz, a.nbz, g=4, p=4)
    f = jax.jit(
        lambda pp, a, b: bsr_smsmm_apply_pallas(pp, a, b, interpret=True)
    )
    ref1 = bsr_smsmm_apply(plan, a, a)
    got1 = f(pp, a, a)
    np.testing.assert_allclose(
        np.asarray(got1.blocks), np.asarray(ref1.blocks), rtol=2e-5, atol=2e-5
    )
    a2 = dataclasses.replace(a, blocks=a.blocks * 2.0 + 1.0)
    ref2 = bsr_smsmm_apply(plan, a2, a2)
    got2 = f(pp, a2, a2)
    np.testing.assert_allclose(
        np.asarray(got2.blocks), np.asarray(ref2.blocks), rtol=2e-5, atol=2e-5
    )


def test_empty_product_set():
    # disjoint structures: A only in top-right, B only in top-right too ->
    # no (A.col == B.row) pairs, empty output
    bsz = 8
    a = BSR(
        indices=jnp.asarray([0 * 2 + 1], INDEX_DTYPE),
        blocks=jnp.ones((1, bsz, bsz), jnp.float32),
        n=2 * bsz,
        bsz=bsz,
    )
    plan = bsr_smsmm_prepare(a, a)
    pp = bsr_smsmm_pallas_prepare(plan, a.nbz, a.nbz, g=2, p=2)
    got = bsr_smsmm_apply_pallas(pp, a, a, interpret=True)
    assert got.blocks.shape[0] == 0


def test_grad_matches_xla_apply_grad():
    # the custom VJP (same DMA kernel, permuted schedules) must agree
    # with autodiff through the XLA apply for both factors
    from sparse_tpu.ops.pallas_bsr import (
        bsr_smsmm_apply_pallas_ad,
        bsr_smsmm_pallas_prepare_ad,
    )

    a = random_bsr(6, 8, 0.4, seed=2)
    b = random_bsr(6, 8, 0.4, seed=5)
    plan = bsr_smsmm_prepare(a, b)
    plans = bsr_smsmm_pallas_prepare_ad(plan, a.nbz, b.nbz, g=4, p=8)
    w = np.random.default_rng(0).standard_normal(
        (plan.nbz_out, a.bsz, a.bsz)).astype(np.float32)
    w = jnp.asarray(w)  # non-uniform cotangent

    def loss_pallas(ab, bb):
        c = bsr_smsmm_apply_pallas_ad(
            plans,
            dataclasses.replace(a, blocks=ab),
            dataclasses.replace(b, blocks=bb),
            interpret=True,
        )
        return jnp.sum(c.blocks * w)

    def loss_xla(ab, bb):
        c = bsr_smsmm_apply(
            plan,
            dataclasses.replace(a, blocks=ab),
            dataclasses.replace(b, blocks=bb),
        )
        return jnp.sum(c.blocks * w)

    va, ga = jax.value_and_grad(loss_pallas, argnums=(0, 1))(
        a.blocks, b.blocks)
    vx, gx = jax.value_and_grad(loss_xla, argnums=(0, 1))(a.blocks, b.blocks)
    np.testing.assert_allclose(float(va), float(vx), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(ga[0]), np.asarray(gx[0]),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(ga[1]), np.asarray(gx[1]),
                               rtol=2e-5, atol=2e-5)
    # under jit too
    gj = jax.jit(jax.grad(loss_pallas))(a.blocks, b.blocks)
    np.testing.assert_allclose(np.asarray(gj), np.asarray(gx[0]),
                               rtol=2e-5, atol=2e-5)


def test_ad_forward_equals_plain():
    from sparse_tpu.ops.pallas_bsr import (
        bsr_smsmm_apply_pallas_ad,
        bsr_smsmm_pallas_prepare_ad,
    )

    a = random_bsr(5, 8, 0.5, seed=11)
    plan = bsr_smsmm_prepare(a, a)
    pp = bsr_smsmm_pallas_prepare(plan, a.nbz, a.nbz, g=4, p=4)
    plans = bsr_smsmm_pallas_prepare_ad(plan, a.nbz, a.nbz, g=4, p=4)
    ref = bsr_smsmm_apply_pallas(pp, a, a, interpret=True)
    got = bsr_smsmm_apply_pallas_ad(plans, a, a, interpret=True)
    np.testing.assert_array_equal(np.asarray(got.blocks),
                                  np.asarray(ref.blocks))


def test_bf16_inputs_f32_accum():
    # bf16 inputs must accumulate the shared-k sum in f32 and round ONCE
    # (the MXU einsum contract): the result must sit within bf16 rounding
    # (~2^-8) of the f32 oracle, not within bsz accumulated roundings
    a = random_bsr(5, 8, 0.5, seed=4)
    ab = dataclasses.replace(a, blocks=a.blocks.astype(jnp.bfloat16))
    plan = bsr_smsmm_prepare(ab, ab)
    pp = bsr_smsmm_pallas_prepare(plan, ab.nbz, ab.nbz, g=4, p=4)
    got = bsr_smsmm_apply_pallas(pp, ab, ab, interpret=True)
    assert got.blocks.dtype == jnp.bfloat16
    a32 = dataclasses.replace(
        ab, blocks=ab.blocks.astype(jnp.float32))  # exact bf16 values
    oracle = bsr_smsmm_apply(plan, a32, a32)
    scale = float(jnp.max(jnp.abs(oracle.blocks))) + 1e-30
    for path in (got, bsr_smsmm_apply(plan, ab, ab)):
        err = float(jnp.max(jnp.abs(
            np.asarray(path.blocks, np.float32) - np.asarray(oracle.blocks)
        ))) / scale
        assert err < 2e-2, err  # single bf16 rounding + segment-sum


@pytest.mark.parametrize("nb,density,seed", [(12, 0.3, 0), (9, 0.5, 1)])
def test_paired_schedule_matches_unpaired(nb, density, seed):
    """The descriptor-coalesced (paired) schedule — round-5 probe of the
    round-4 verdict's ~25%-fewer-descriptors lever — produces the XLA
    apply's values exactly, for even and odd stored-block counts (the
    zero pair must land even-aligned).  Chip verdict: the kernel is
    STEP-bound, not descriptor-bound (34.8 vs 35.0 ms at g=24; +2% at
    g=48 — within tunnel noise), so paired stays opt-in."""
    bsz = 8
    rng = np.random.default_rng(seed)
    rr, cc = np.nonzero(rng.random((nb, nb)) < density)
    a = BSR(indices=jnp.asarray(rr * nb + cc, INDEX_DTYPE),
            blocks=jnp.asarray(
                rng.standard_normal((rr.size, bsz, bsz)).astype(np.float32)),
            n=nb * bsz, bsz=bsz)
    rr2, cc2 = np.nonzero(rng.random((nb, nb)) < density)
    b = BSR(indices=jnp.asarray(rr2 * nb + cc2, INDEX_DTYPE),
            blocks=jnp.asarray(
                rng.standard_normal((rr2.size, bsz, bsz)).astype(np.float32)),
            n=nb * bsz, bsz=bsz)
    plan = bsr_smsmm_prepare(a, b)
    ref = bsr_smsmm_apply(plan, a, b)
    pp = bsr_smsmm_pallas_prepare(plan, a.nbz, b.nbz, paired=True)
    assert pp.paired and pp.a_idx.shape[0] * 2 == pp.b_idx.shape[0]
    out = bsr_smsmm_apply_pallas(pp, a, b, interpret=True)
    np.testing.assert_allclose(
        np.asarray(bsr_todense(out)), np.asarray(bsr_todense(ref)),
        rtol=1e-4, atol=1e-5,
    )
