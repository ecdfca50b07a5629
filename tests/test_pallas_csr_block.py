"""Block-granule segment-tile SpMV (ops/pallas_csr_block.py) + the
block-preserving RCM (interpret-mode kernel on CPU; rates pinned on-chip
by the benchmark suite).  Oracle: dense matmul / csr_smvm, house style."""

import jax.numpy as jnp
import numpy as np
import pytest

import sparse_tpu as st
from sparse_tpu.formats.bsr import csr_to_bsr
from sparse_tpu.ops.pallas_csr_block import (
    block_segtile_hbm_bytes,
    block_segtile_issue_seconds,
    bsr_smvm_segtile_block,
    build_seg_tiles_block,
)
from sparse_tpu.ops.reorder import (
    csr_bandwidth,
    csr_permute,
    rcm_order_blocked,
)


def _block_matrix(nb, bsz, seed, per_row=4, bw=6, scramble=True):
    """Fully-dense-block banded pattern, optionally node-scrambled."""
    rng = np.random.default_rng(seed)
    mask = np.zeros((nb, nb), bool)
    for i in range(nb):
        js = np.clip(i + rng.integers(-bw, bw + 1, size=per_row), 0, nb - 1)
        mask[i, js] = True
    x = np.kron(mask, np.ones((bsz, bsz))) * rng.standard_normal(
        (nb * bsz, nb * bsz))
    x = np.where(np.kron(mask, np.ones((bsz, bsz), bool)) & (x == 0), 0.5, x)
    if scramble:
        pb = rng.permutation(nb)
        ps = (pb[:, None] * bsz + np.arange(bsz)).reshape(-1)
        x = x[np.ix_(ps, ps)]
    return x.astype(np.float32)


def test_rcm_order_blocked_preserves_blocks():
    x = _block_matrix(48, 2, seed=0)
    a = st.csr_from_dense(jnp.asarray(x))
    perm = rcm_order_blocked(a, 2)
    # valid permutation that keeps each 2-block contiguous and in order
    assert np.array_equal(np.sort(perm), np.arange(96))
    pairs = perm.reshape(-1, 2)
    assert np.array_equal(pairs[:, 1], pairs[:, 0] + 1)
    assert np.all(pairs[:, 0] % 2 == 0)
    # and it recovers bandedness the scalar scramble hid
    ap = csr_permute(a, perm, perm)
    assert csr_bandwidth(ap) < csr_bandwidth(a) / 3
    with pytest.raises(ValueError, match="divide"):
        rcm_order_blocked(a, 5)


@pytest.mark.parametrize("wsub", [
    pytest.param(8, marks=pytest.mark.slow),  # breadth; 16 is production
    16,
])
def test_block_segtile_matches_oracle(wsub):
    x = _block_matrix(64, 2, seed=1)
    a = st.csr_from_dense(jnp.asarray(x))
    perm = rcm_order_blocked(a, 2)
    ap = csr_permute(a, perm, perm)
    ab = csr_to_bsr(ap, 2)
    plan = build_seg_tiles_block(ab, wsub=wsub)
    assert plan.fill > 0
    rng = np.random.default_rng(2)
    v = rng.standard_normal(128).astype(np.float32)
    y = bsr_smvm_segtile_block(ab, jnp.asarray(v), plan, interpret=True)
    ref = x[np.ix_(perm, perm)] @ v
    np.testing.assert_allclose(np.asarray(y), ref, rtol=2e-5, atol=2e-5)
    # roofline helpers are consistent with the plan shape
    slots = plan.n_tiles * 8 * 128
    assert block_segtile_hbm_bytes(plan) == (
        slots * 17 + plan.nb * 2 * 4 + (-(-plan.nb // 8)) * 8 * 2 * 4)
    assert block_segtile_issue_seconds(plan) > 0


def test_block_segtile_partial_blocks():
    """Blocks need not be fully dense: explicit zeros inside stored blocks
    multiply as zeros (csr_to_bsr fills them)."""
    rng = np.random.default_rng(3)
    x = _block_matrix(32, 2, seed=3, scramble=False)
    # knock out ~30% of entries inside blocks
    x = x * (rng.random(x.shape) < 0.7)
    a = st.csr_from_dense(jnp.asarray(x))
    ab = csr_to_bsr(a, 2)
    plan = build_seg_tiles_block(ab)
    v = rng.standard_normal(64).astype(np.float32)
    y = bsr_smvm_segtile_block(ab, jnp.asarray(v), plan, interpret=True)
    np.testing.assert_allclose(np.asarray(y), x @ v, rtol=2e-5, atol=2e-5)


def test_block_segtile_rejects_wide_bsz():
    x = _block_matrix(16, 4, seed=4, scramble=False)
    a = st.csr_from_dense(jnp.asarray(x))
    ab = csr_to_bsr(a, 4)
    with pytest.raises(ValueError, match="bsz=2"):
        build_seg_tiles_block(ab)
    with pytest.raises(ValueError, match="shape"):
        ab2 = csr_to_bsr(st.csr_from_dense(jnp.asarray(x[:, :64] * 0 + 1)), 2)
        plan2 = build_seg_tiles_block(ab2)
        bsr_smvm_segtile_block(ab2, jnp.zeros(3), plan2, interpret=True)


def test_block_seg_tiles_refresh_matches_rebuild():
    from sparse_tpu.formats.bsr import BSR
    from sparse_tpu.ops.pallas_csr_block import block_seg_tiles_refresh

    x = _block_matrix(32, 2, seed=6, scramble=False)
    a = st.csr_from_dense(jnp.asarray(x))
    ab = csr_to_bsr(a, 2)
    plan = build_seg_tiles_block(ab, refreshable=True)
    nb2 = ab.blocks * 0.5
    plan2 = block_seg_tiles_refresh(plan, nb2)
    ref = build_seg_tiles_block(
        BSR(indices=ab.indices, blocks=nb2, n=ab.n, bsz=2))
    np.testing.assert_array_equal(np.asarray(plan2.vals),
                                  np.asarray(ref.vals))
    rng = np.random.default_rng(7)
    v = rng.standard_normal(64).astype(np.float32)
    y = bsr_smvm_segtile_block(
        BSR(indices=ab.indices, blocks=nb2, n=ab.n, bsz=2),
        jnp.asarray(v), plan2, interpret=True)
    np.testing.assert_allclose(np.asarray(y), (x * 0.5) @ v, rtol=2e-5,
                               atol=2e-5)
