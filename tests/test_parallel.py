"""Multi-chip layer on the virtual 8-device CPU mesh (conftest sets
xla_force_host_platform_device_count=8): row-partitioned SpMV/SpMM vs the
single-device oracle, and distributed CG vs a dense NumPy solve.

The reference has no distributed tests to mirror (nothing distributed
exists, SURVEY.md §4); oracle style follows the house rules."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sparse_tpu import csr_from_dense, csr_smvm, spmm
from sparse_tpu.parallel import (
    cg_solve,
    make_1d_mesh,
    pcsr_from_csr,
    pcsr_spmm,
    pcsr_spmv,
    pcsr_todense,
    power_iteration_step,
)
from sparse_tpu.parallel.pcsr import shard_vector


def random_csr(n, m, density, seed, spd=False):
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((n, m)) * (rng.random((n, m)) < density)
    if spd:
        x = x @ x.T + n * np.eye(n)
    return csr_from_dense(jnp.asarray(x)), np.asarray(x) if not spd else (
        np.asarray(x)
    )


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "expected 8 virtual CPU devices"
    return make_1d_mesh(8)


@pytest.mark.parametrize(
    "n,m,density",
    [(64, 64, 0.2), (17, 33, 0.5),
     # breadth-only third shape (~30 s of shard_map compiles)
     pytest.param(100, 80, 0.1, marks=pytest.mark.slow)],
)
def test_pcsr_spmv_matches_local(mesh, n, m, density):
    a, xa = random_csr(n, m, density, seed=n)
    pa = pcsr_from_csr(a, mesh)
    np.testing.assert_allclose(np.asarray(pcsr_todense(pa)), xa, rtol=1e-12)
    v = jnp.asarray(np.random.default_rng(1).standard_normal(m))
    got = pcsr_spmv(pa, shard_vector(v, pa, mesh), mesh)[:n]
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(csr_smvm(a, v)), rtol=1e-10, atol=1e-12
    )


@pytest.mark.parametrize("k", [
    pytest.param(1, marks=pytest.mark.slow),  # k=1 == the spmv tests
    8, 32,
])
def test_pcsr_spmm_matches_local(mesh, k):
    n, m = 48, 56
    a, _ = random_csr(n, m, 0.15, seed=7)
    pa = pcsr_from_csr(a, mesh)
    b = jnp.asarray(np.random.default_rng(2).standard_normal((m, k)))
    got = pcsr_spmm(pa, shard_vector(b, pa, mesh), mesh)[:n]
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(spmm(a, b)), rtol=1e-10, atol=1e-12
    )


def test_spmv_under_jit_with_mesh(mesh):
    n = 40
    a, xa = random_csr(n, n, 0.3, seed=3)
    pa = pcsr_from_csr(a, mesh)
    v = shard_vector(jnp.asarray(np.ones(n)), pa, mesh)
    f = jax.jit(lambda pa, v: pcsr_spmv(pa, v, mesh))
    np.testing.assert_allclose(
        np.asarray(f(pa, v))[:n], xa @ np.ones(n), rtol=1e-10
    )


def test_cg_solves_spd(mesh):
    rng = np.random.default_rng(11)
    n = 64
    x = rng.standard_normal((n, n)) * (rng.random((n, n)) < 0.2)
    spd = x @ x.T + n * np.eye(n)
    a = csr_from_dense(jnp.asarray(spd))
    pa = pcsr_from_csr(a, mesh)
    x_true = rng.standard_normal(n)
    b = spd @ x_true
    bv = shard_vector(jnp.asarray(b), pa, mesh)
    sol = jax.jit(lambda pa, bv: cg_solve(pa, bv, mesh, iters=2 * n))(pa, bv)
    np.testing.assert_allclose(np.asarray(sol)[:n], x_true, rtol=1e-6, atol=1e-6)


def test_power_iteration(mesh):
    rng = np.random.default_rng(5)
    n = 32
    x = rng.standard_normal((n, n))
    spd = x @ x.T
    a = csr_from_dense(jnp.asarray(spd))
    pa = pcsr_from_csr(a, mesh)
    v0 = shard_vector(jnp.asarray(np.ones(n) / np.sqrt(n)), pa, mesh)

    @jax.jit
    def run(pa, v):
        def body(_, carry):
            v, _ = carry
            return power_iteration_step(pa, v, mesh)

        return jax.lax.fori_loop(0, 200, body, (v, jnp.zeros((), v.dtype)))

    _, lam = run(pa, v0)
    expect = np.max(np.linalg.eigvalsh(spd))
    np.testing.assert_allclose(float(lam), expect, rtol=1e-6)


def test_uneven_rows_padding(mesh):
    # 10 rows over 8 shards: padded slabs must not corrupt results
    n, m = 10, 12
    a, xa = random_csr(n, m, 0.6, seed=9)
    pa = pcsr_from_csr(a, mesh)
    v = jnp.asarray(np.random.default_rng(4).standard_normal(m))
    got = pcsr_spmv(pa, shard_vector(v, pa, mesh), mesh)
    np.testing.assert_allclose(np.asarray(got)[:n], xa @ np.asarray(v), rtol=1e-10)
    assert np.all(np.asarray(got)[n:] == 0)


def test_pcg_matches_cg_and_converges_faster(mesh):
    from sparse_tpu import csr_diagonal
    from sparse_tpu.parallel import pcg_solve

    rng = np.random.default_rng(21)
    n = 64
    # ill-conditioned diagonal: Jacobi helps a lot
    d = 10.0 ** rng.uniform(0, 3, n)
    x = rng.standard_normal((n, n)) * (rng.random((n, n)) < 0.1)
    spd = x @ x.T + np.diag(d) + n * np.eye(n)
    a = csr_from_dense(jnp.asarray(spd))
    pa = pcsr_from_csr(a, mesh)
    x_true = rng.standard_normal(n)
    b = spd @ x_true
    bv = shard_vector(jnp.asarray(b), pa, mesh)
    inv_d = shard_vector(1.0 / csr_diagonal(a), pa, mesh)
    it = 40
    sol_p = jax.jit(lambda pa, bv, m: pcg_solve(pa, bv, m, mesh, iters=it))(
        pa, bv, inv_d
    )
    sol_c = jax.jit(lambda pa, bv: cg_solve(pa, bv, mesh, iters=it))(pa, bv)
    err_p = np.linalg.norm(np.asarray(sol_p)[:n] - x_true)
    err_c = np.linalg.norm(np.asarray(sol_c)[:n] - x_true)
    assert err_p < err_c  # preconditioning wins on this spectrum
    sol_full = jax.jit(lambda pa, bv, m: pcg_solve(pa, bv, m, mesh, iters=3 * n))(
        pa, bv, inv_d
    )
    np.testing.assert_allclose(np.asarray(sol_full)[:n], x_true, rtol=1e-6,
                               atol=1e-6)


def test_csr_diagonal():
    from sparse_tpu import csr_diagonal

    x = np.array([[5.0, 1, 0], [0, 0, 2], [3, 0, 7], [1, 1, 1]])
    a = csr_from_dense(jnp.asarray(x))
    np.testing.assert_array_equal(np.asarray(csr_diagonal(a)), [5.0, 0, 7])


def test_pbell_matches_local(mesh):
    from sparse_tpu import bsr_from_dense
    from sparse_tpu.formats.bell import bell_from_bsr, bell_smvm, bell_spmm
    from sparse_tpu.parallel.pbell import (
        pbell_from_bell,
        pbell_shard_vector,
        pbell_smvm,
        pbell_spmm,
    )

    rng = np.random.default_rng(31)
    n, bsz = 72, 4  # 18 block rows over 8 shards: uneven slabs
    nb = n // bsz
    mask = np.kron(rng.random((nb, nb)) < 0.3, np.ones((bsz, bsz)))
    x = rng.standard_normal((n, n)) * mask
    e = bell_from_bsr(bsr_from_dense(jnp.asarray(x), bsz))
    pe = pbell_from_bell(e, mesh)
    v = jnp.asarray(rng.standard_normal(n))
    vs = pbell_shard_vector(v, pe, mesh)
    got = pbell_smvm(pe, vs, mesh)[:n]
    np.testing.assert_allclose(np.asarray(got), x @ np.asarray(v), rtol=1e-10,
                               atol=1e-12)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(bell_smvm(e, v)), rtol=1e-12
    )
    b = jnp.asarray(rng.standard_normal((n, 8)))
    bs = pbell_shard_vector(b, pe, mesh)
    got_m = pbell_spmm(pe, bs, mesh)[:n]
    np.testing.assert_allclose(np.asarray(got_m), x @ np.asarray(b), rtol=1e-10,
                               atol=1e-12)
    f = jax.jit(lambda pe, vs: pbell_smvm(pe, vs, mesh))
    np.testing.assert_allclose(
        np.asarray(f(pe, vs))[:n], x @ np.asarray(v), rtol=1e-10
    )


def test_pcsr_spgemm_matches_local(mesh):
    from sparse_tpu import csr_todense, spgemm
    from sparse_tpu.parallel.pspgemm import pcsr_spgemm

    rng = np.random.default_rng(41)
    n, m, k = 40, 32, 24
    xa = rng.standard_normal((n, m)) * (rng.random((n, m)) < 0.2)
    xb = rng.standard_normal((m, k)) * (rng.random((m, k)) < 0.2)
    a = csr_from_dense(jnp.asarray(xa))
    b = csr_from_dense(jnp.asarray(xb))
    pa = pcsr_from_csr(a, mesh)
    pb = pcsr_from_csr(b, mesh)
    pc = pcsr_spgemm(pa, pb, mesh)
    got = np.asarray(pcsr_todense(pc))
    np.testing.assert_allclose(got, xa @ xb, rtol=1e-10, atol=1e-12)
    # agrees with the single-device product
    np.testing.assert_allclose(
        got, np.asarray(csr_todense(spgemm(a, b))), rtol=1e-12
    )


def test_pcsr_transpose(mesh):
    from sparse_tpu.parallel.pspgemm import pcsr_transpose

    rng = np.random.default_rng(42)
    n, m = 24, 40
    xa = rng.standard_normal((n, m)) * (rng.random((n, m)) < 0.3)
    pa = pcsr_from_csr(csr_from_dense(jnp.asarray(xa)), mesh)
    pt = pcsr_transpose(pa, mesh)
    assert pt.shape == (m, n)
    np.testing.assert_allclose(np.asarray(pcsr_todense(pt)), xa.T, rtol=1e-12)


def test_bicgstab_nonsymmetric(mesh):
    from sparse_tpu.parallel import bicgstab_solve

    rng = np.random.default_rng(51)
    n = 48
    # non-symmetric, diagonally dominant
    x = rng.standard_normal((n, n)) * (rng.random((n, n)) < 0.2)
    A = x + n * np.eye(n)
    assert not np.allclose(A, A.T)
    a = csr_from_dense(jnp.asarray(A))
    pa = pcsr_from_csr(a, mesh)
    x_true = rng.standard_normal(n)
    b = A @ x_true
    bv = shard_vector(jnp.asarray(b), pa, mesh)
    sol = jax.jit(lambda pa, bv: bicgstab_solve(pa, bv, mesh, iters=2 * n))(
        pa, bv
    )
    np.testing.assert_allclose(np.asarray(sol)[:n], x_true, rtol=1e-6, atol=1e-6)


def test_pcsr_spgemm_aa_matches_allgather(mesh):
    from sparse_tpu.parallel.pspgemm import (
        build_pspgemm_plan,
        pcsr_spgemm,
        pcsr_spgemm_aa,
    )

    rng = np.random.default_rng(51)
    n, m, k = 40, 32, 24
    xa = rng.standard_normal((n, m)) * (rng.random((n, m)) < 0.2)
    xb = rng.standard_normal((m, k)) * (rng.random((m, k)) < 0.2)
    pa = pcsr_from_csr(csr_from_dense(jnp.asarray(xa)), mesh)
    pb = pcsr_from_csr(csr_from_dense(jnp.asarray(xb)), mesh)
    plan = build_pspgemm_plan(pa, pb, mesh)
    # the exchange is a strict subset of B: never more than the all-gather
    assert plan.comm_entries_per_device <= 8 * pb.nse_per_shard
    pc = pcsr_spgemm_aa(pa, pb, mesh, plan)
    got = np.asarray(pcsr_todense(pc))
    np.testing.assert_allclose(got, xa @ xb, rtol=1e-10, atol=1e-12)
    ref = np.asarray(pcsr_todense(pcsr_spgemm(pa, pb, mesh)))
    np.testing.assert_allclose(got, ref, rtol=1e-12)


def test_pcsr_spgemm_aa_banded_comm_small(mesh):
    # banded x banded: each shard needs only O(bw) remote B rows, so the
    # all-to-all payload must be far below nnz_B
    from sparse_tpu.parallel.pspgemm import build_pspgemm_plan, pcsr_spgemm_aa

    rng = np.random.default_rng(52)
    n = 64
    x = np.zeros((n, n))
    for off in range(-2, 3):
        x += np.diag(rng.standard_normal(n - abs(off)), off)
    pa = pcsr_from_csr(csr_from_dense(jnp.asarray(x)), mesh)
    plan = build_pspgemm_plan(pa, pa, mesh)
    # 4x less traffic than the all-gather formulation's 8 * nse_p
    assert plan.comm_entries_per_device * 4 <= 8 * pa.nse_per_shard
    pc = pcsr_spgemm_aa(pa, pa, mesh, plan)
    np.testing.assert_allclose(
        np.asarray(pcsr_todense(pc)), x @ x, rtol=1e-10, atol=1e-12
    )


@pytest.mark.slow  # breadth: the module-level jit path is the same
# exec the default aa test drives
def test_pcsr_spgemm_aa_under_jit(mesh):
    from sparse_tpu.parallel.pspgemm import build_pspgemm_plan, pcsr_spgemm_aa

    rng = np.random.default_rng(53)
    n, m, k = 24, 40, 16
    xa = rng.standard_normal((n, m)) * (rng.random((n, m)) < 0.3)
    xb = rng.standard_normal((m, k)) * (rng.random((m, k)) < 0.3)
    pa = pcsr_from_csr(csr_from_dense(jnp.asarray(xa)), mesh)
    pb = pcsr_from_csr(csr_from_dense(jnp.asarray(xb)), mesh)
    plan = build_pspgemm_plan(pa, pb, mesh)
    f = jax.jit(lambda a, b, p: pcsr_spgemm_aa(a, b, mesh, p))
    pc = f(pa, pb, plan)
    np.testing.assert_allclose(
        np.asarray(pcsr_todense(pc)), xa @ xb, rtol=1e-10, atol=1e-12
    )


def test_pcsr_transpose_device_matches(mesh):
    from sparse_tpu.parallel.pspgemm import (
        build_transpose_plan,
        pcsr_transpose_device,
    )

    rng = np.random.default_rng(54)
    # two shapes (ragged + tiny-square): each is a fresh shard_map compile
    for n, m in [(17, 53), (8, 8)]:
        x = rng.standard_normal((n, m)) * (rng.random((n, m)) < 0.25)
        pa = pcsr_from_csr(csr_from_dense(jnp.asarray(x)), mesh)
        plan = build_transpose_plan(pa, mesh)
        f = jax.jit(lambda a, p: pcsr_transpose_device(a, mesh, p))
        pt = f(pa, plan)
        np.testing.assert_allclose(
            np.asarray(pcsr_todense(pt)), x.T, rtol=1e-12, atol=1e-14
        )


@pytest.mark.slow  # breadth: also exercised by the driver dryrun
def test_pcsr_transpose_roundtrip_device(mesh):
    from sparse_tpu.parallel.pspgemm import (
        build_transpose_plan,
        pcsr_transpose_device,
    )

    rng = np.random.default_rng(55)
    n, m = 33, 21
    x = rng.standard_normal((n, m)) * (rng.random((n, m)) < 0.3)
    pa = pcsr_from_csr(csr_from_dense(jnp.asarray(x)), mesh)
    pt = pcsr_transpose_device(pa, mesh, build_transpose_plan(pa, mesh))
    ptt = pcsr_transpose_device(pt, mesh, build_transpose_plan(pt, mesh))
    np.testing.assert_allclose(np.asarray(pcsr_todense(ptt)), x, rtol=1e-12)


def test_gmres_nonsymmetric_with_and_without_jacobi(mesh):
    from sparse_tpu.parallel import gmres_solve

    rng = np.random.default_rng(53)
    n = 48
    x = rng.standard_normal((n, n)) * (rng.random((n, n)) < 0.2)
    A = x + n * np.eye(n)
    assert not np.allclose(A, A.T)
    a = csr_from_dense(jnp.asarray(A))
    pa = pcsr_from_csr(a, mesh)
    x_true = rng.standard_normal(n)
    b = A @ x_true
    bv = shard_vector(jnp.asarray(b), pa, mesh)
    sol = jax.jit(lambda pa, bv: gmres_solve(pa, bv, mesh, restart=24,
                                             iters=4))(pa, bv)
    np.testing.assert_allclose(np.asarray(sol)[:n], x_true, rtol=1e-6,
                               atol=1e-6)
    # Jacobi preconditioning: same convention as pcg_solve
    inv_diag = np.zeros(bv.shape[0])
    inv_diag[:n] = 1.0 / np.diag(A)
    idv = shard_vector(jnp.asarray(inv_diag[:n]), pa, mesh)
    sol2 = gmres_solve(pa, bv, mesh, inv_diag=idv, restart=24, iters=4)
    np.testing.assert_allclose(np.asarray(sol2)[:n], x_true, rtol=1e-6,
                               atol=1e-6)


@pytest.mark.slow  # breadth: block-jacobi apply pinned in
# test_precond; the on-mesh pairing measured by the suite solver section
def test_block_jacobi_pcg_and_gmres(mesh):
    from sparse_tpu import block_jacobi_apply, block_jacobi_prepare
    from sparse_tpu.parallel import gmres_solve, pcg_solve

    rng = np.random.default_rng(57)
    n = 64
    # block-structured SPD: strong 4x4 diagonal blocks + weak coupling
    bs = 4
    blocks = rng.standard_normal((n // bs, bs, bs))
    bd = np.zeros((n, n))
    for i in range(n // bs):
        q = blocks[i] @ blocks[i].T + bs * np.eye(bs)
        bd[i * bs:(i + 1) * bs, i * bs:(i + 1) * bs] = q
    coup = rng.standard_normal((n, n)) * (rng.random((n, n)) < 0.05) * 0.1
    spd = bd + (coup + coup.T) + np.eye(n)
    a = csr_from_dense(jnp.asarray(spd))
    pa = pcsr_from_csr(a, mesh)
    x_true = rng.standard_normal(n)
    b = spd @ x_true
    bv = shard_vector(jnp.asarray(b), pa, mesh)
    inv_blocks = block_jacobi_prepare(a, bs, padded_n=bv.shape[0])
    assert inv_blocks.shape == (bv.shape[0] // bs, bs, bs)
    # the apply inverts the block-diagonal part exactly
    z = block_jacobi_apply(inv_blocks, bv)
    assert z.shape == bv.shape
    sol = jax.jit(lambda pa, bv, m: pcg_solve(pa, bv, m, mesh, iters=2 * n))(
        pa, bv, inv_blocks
    )
    np.testing.assert_allclose(np.asarray(sol)[:n], x_true, rtol=1e-6,
                               atol=1e-6)
    # block-Jacobi beats elementwise Jacobi at a fixed iteration budget here
    from sparse_tpu import csr_diagonal

    inv_d = shard_vector(1.0 / csr_diagonal(a), pa, mesh)
    it = 8
    err_blk = np.linalg.norm(
        np.asarray(pcg_solve(pa, bv, inv_blocks, mesh, iters=it))[:n] - x_true
    )
    err_elt = np.linalg.norm(
        np.asarray(pcg_solve(pa, bv, inv_d, mesh, iters=it))[:n] - x_true
    )
    assert err_blk < err_elt
    sol_g = gmres_solve(pa, bv, mesh, inv_diag=inv_blocks, restart=16, iters=4)
    np.testing.assert_allclose(np.asarray(sol_g)[:n], x_true, rtol=1e-6,
                               atol=1e-6)


def test_chebyshev_preconditioned_cg(mesh):
    from sparse_tpu.parallel import chebyshev_preconditioner, estimate_lmax

    rng = np.random.default_rng(59)
    n = 64
    d = 10.0 ** rng.uniform(0, 3, n)  # ill-conditioned spectrum
    x = rng.standard_normal((n, n)) * (rng.random((n, n)) < 0.1)
    spd = x @ x.T + np.diag(d) + np.eye(n)
    a = csr_from_dense(jnp.asarray(spd))
    pa = pcsr_from_csr(a, mesh)
    x_true = rng.standard_normal(n)
    bv = shard_vector(jnp.asarray(spd @ x_true), pa, mesh)
    lmax = float(estimate_lmax(pa, mesh))
    assert lmax >= np.linalg.eigvalsh(spd).max() * 0.98
    M = chebyshev_preconditioner(pa, mesh, lmax=lmax, degree=8)
    it = 25
    from sparse_tpu.parallel import pcg_solve

    err_c = np.linalg.norm(
        np.asarray(cg_solve(pa, bv, mesh, iters=it))[:n] - x_true
    )
    err_p = np.linalg.norm(
        np.asarray(jax.jit(
            lambda pa, bv: pcg_solve(pa, bv, M, mesh, iters=it)
        )(pa, bv))[:n] - x_true
    )
    assert err_p < err_c * 1e-3  # degree-8 polynomial crushes this spectrum
    sol = pcg_solve(pa, bv, M, mesh, iters=60)
    np.testing.assert_allclose(np.asarray(sol)[:n], x_true, rtol=1e-8,
                               atol=1e-8)


@pytest.mark.slow  # breadth: ILU(0) semantics pinned in test_bsr_lu;
# the on-mesh pairing is also measured by the suite's solver section
def test_bsr_ilu0_preconditioned_gmres(mesh):
    from sparse_tpu import bsr_from_dense, bsr_ilu0_preconditioner
    from sparse_tpu.parallel import gmres_solve

    rng = np.random.default_rng(7)
    n, bsz = 64, 4
    nb = n // bsz
    mask = np.kron((rng.random((nb, nb)) < 0.25) | np.eye(nb, dtype=bool),
                   np.ones((bsz, bsz)))
    A = rng.standard_normal((n, n)) * mask + 6 * np.eye(n)
    ab = bsr_from_dense(jnp.asarray(A), bsz)
    pa = pcsr_from_csr(csr_from_dense(jnp.asarray(A)), mesh)
    x_true = rng.standard_normal(n)
    bv = shard_vector(jnp.asarray(A @ x_true), pa, mesh)
    M = bsr_ilu0_preconditioner(ab, padded_n=bv.shape[0])
    # tight budget (6 matvecs): ILU(0) crushes plain GMRES (measured
    # 4e-4 vs 9e-2 on this system)
    s1 = jax.jit(lambda pa, bv: gmres_solve(pa, bv, mesh, inv_diag=M,
                                            restart=6, iters=1))(pa, bv)
    s0 = gmres_solve(pa, bv, mesh, restart=6, iters=1)
    e1 = np.linalg.norm(np.asarray(s1)[:n] - x_true)
    e0 = np.linalg.norm(np.asarray(s0)[:n] - x_true)
    assert e1 < e0 * 0.05
    sol = gmres_solve(pa, bv, mesh, inv_diag=M, restart=10, iters=3)
    np.testing.assert_allclose(np.asarray(sol)[:n], x_true, rtol=1e-8,
                               atol=1e-8)
    with pytest.raises(ValueError):
        bsr_ilu0_preconditioner(ab, padded_n=n - 1)
