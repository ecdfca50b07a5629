"""Distributed block SpGEMM (parallel/pbsr.py) on the virtual 8-device mesh.

Oracle: the single-device prepared block apply on the gathered matrices
(reference contract per shard: blocked_square_regular.fut:336-363).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sparse_tpu.formats.bsr import (
    BSR,
    bsr_smsmm_apply,
    bsr_smsmm_prepare,
    bsr_todense,
)
from sparse_tpu.ops.segmented import INDEX_DTYPE
from sparse_tpu.parallel import (
    build_pbsr_smsmm_plan,
    make_1d_mesh,
    pbsr_from_bsr,
    pbsr_smsmm,
    pbsr_to_bsr,
)


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


def banded_bsr(nb, bsz, half, seed):
    rng = np.random.default_rng(seed)
    rows, cols = [], []
    for off in range(-half, half + 1):
        rr = np.arange(max(0, -off), min(nb, nb - off))
        rows.append(rr)
        cols.append(rr + off)
    rows = np.concatenate(rows)
    cols = np.concatenate(cols)
    order = np.lexsort((cols, rows))
    rows, cols = rows[order], cols[order]
    return BSR(
        indices=jnp.asarray(rows * nb + cols, INDEX_DTYPE),
        blocks=jnp.asarray(
            rng.standard_normal((rows.size, bsz, bsz)).astype(np.float32)),
        n=nb * bsz,
        bsz=bsz,
    )


@pytest.mark.parametrize(
    "nb,bsz,da,db",
    [
        (24, 4, 0.25, 0.25),   # small blocks: flat product path
        (16, 8, 0.4, 0.3),     # boundary of the flat path
        (16, 16, 0.3, 0.4),    # einsum path
        (9, 4, 0.5, 0.5),      # nb not a multiple of D: padded slabs
    ],
)
def test_matches_single_device(nb, bsz, da, db):
    a = random_bsr(nb, bsz, da, seed=nb + bsz)
    b = random_bsr(nb, bsz, db, seed=3 * nb + 1)
    mesh = make_1d_mesh()
    pa = pbsr_from_bsr(a, mesh)
    pb = pbsr_from_bsr(b, mesh)
    plan = build_pbsr_smsmm_plan(pa, pb, mesh)
    pc = pbsr_smsmm(pa, pb, mesh, plan)
    got = np.asarray(bsr_todense(pbsr_to_bsr(pc)))
    ref = np.asarray(bsr_todense(a)) @ np.asarray(bsr_todense(b))
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)


def test_value_update_and_jit_reuse():
    # same plan, fresh values: the numeric pass must track them under jit
    a = banded_bsr(32, 4, 2, seed=5)
    mesh = make_1d_mesh()
    pa = pbsr_from_bsr(a, mesh)
    plan = build_pbsr_smsmm_plan(pa, pa, mesh)
    c1 = pbsr_smsmm(pa, pa, mesh, plan)
    pa2 = dataclasses.replace(pa, blocks=pa.blocks * 2.0)
    c2 = pbsr_smsmm(pa2, pa2, mesh, plan)
    np.testing.assert_allclose(
        np.asarray(bsr_todense(pbsr_to_bsr(c2))),
        4.0 * np.asarray(bsr_todense(pbsr_to_bsr(c1))),
        rtol=1e-5,
    )
    # agreement with the single-device prepared apply
    sp = bsr_smsmm_prepare(a, a)
    ref = bsr_smsmm_apply(sp, a, a)
    np.testing.assert_allclose(
        np.asarray(bsr_todense(pbsr_to_bsr(c1))),
        np.asarray(bsr_todense(ref)),
        rtol=2e-5, atol=2e-5,
    )


def test_comm_volume_banded_vs_dense():
    # banded block pattern: each shard needs only its halo of B block rows
    # -> exchanged values are O(halo * bsz^2), far below replicating B;
    # dense block coupling degrades toward full replication
    mesh = make_1d_mesh()
    d = len(jax.devices())
    nb, bsz, half = 64, 4, 1
    a = banded_bsr(nb, bsz, half, seed=1)
    pa = pbsr_from_bsr(a, mesh)
    plan = build_pbsr_smsmm_plan(pa, pa, mesh)
    nnz_b = int(np.asarray(a.indices).size) * bsz * bsz
    # halo: <= half block rows per neighbor side, ~(2*half+1) blocks each
    halo_vals = 2 * half * (2 * half + 1) * bsz * bsz
    assert plan.comm_entries_per_device <= d * halo_vals
    assert plan.comm_entries_per_device < nnz_b / 2

    dense = random_bsr(16, 4, 1.0, seed=2)
    pd_ = pbsr_from_bsr(dense, mesh)
    plan_d = build_pbsr_smsmm_plan(pd_, pd_, mesh)
    nbz_p = pd_.nbz_per_shard
    # dense coupling: every shard needs all remote B rows -> the per-pair
    # exchange is the full remote slab
    assert plan_d.exch == nbz_p


def test_empty_shards():
    # pattern confined to the first block row: most shards own nothing
    bsz = 4
    nb = 16
    a = BSR(
        indices=jnp.asarray([0 * nb + 0, 0 * nb + 5], INDEX_DTYPE),
        blocks=jnp.asarray(
            np.random.default_rng(0).standard_normal((2, bsz, bsz))
            .astype(np.float32)),
        n=nb * bsz,
        bsz=bsz,
    )
    mesh = make_1d_mesh()
    pa = pbsr_from_bsr(a, mesh)
    plan = build_pbsr_smsmm_plan(pa, pa, mesh)
    pc = pbsr_smsmm(pa, pa, mesh, plan)
    got = np.asarray(bsr_todense(pbsr_to_bsr(pc)))
    ref = np.asarray(bsr_todense(a)) @ np.asarray(bsr_todense(a))
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)
