"""Pallas BELL SpMM kernel (interpreter mode on CPU) vs dense oracle."""

import jax.numpy as jnp
import numpy as np
import pytest

from sparse_tpu import bsr_from_dense
from sparse_tpu.formats.bell import bell_from_bsr
from sparse_tpu.ops.pallas_bell import bell_spmm_pallas


def random_bell(n, bsz, density, seed):
    rng = np.random.default_rng(seed)
    nb = n // bsz
    mask = np.kron(rng.random((nb, nb)) < density, np.ones((bsz, bsz)))
    x = (rng.standard_normal((n, n)) * mask).astype(np.float32)
    return bell_from_bsr(bsr_from_dense(jnp.asarray(x), bsz)), x


@pytest.mark.parametrize("n,bsz,k", [(32, 8, 128), (64, 16, 64), (16, 8, 256)])
def test_pallas_spmm_matches(n, bsz, k):
    a, xa = random_bell(n, bsz, 0.4, seed=n + k)
    b = jnp.asarray(
        np.random.default_rng(k).standard_normal((n, k)).astype(np.float32)
    )
    got = bell_spmm_pallas(a, b, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got), xa @ np.asarray(b), rtol=2e-5, atol=2e-5
    )


def test_pallas_spmm_padding_inert():
    # padded window slots (col 0, zero block) must contribute nothing even
    # though their DMA fetches a real panel
    n, bsz, k = 24, 8, 128
    a, xa = random_bell(n, bsz, 0.3, seed=5)
    assert a.Lb >= 1
    b = jnp.asarray(
        np.random.default_rng(5).standard_normal((n, k)).astype(np.float32)
    )
    got = bell_spmm_pallas(a, b, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got), xa @ np.asarray(b), rtol=2e-5, atol=2e-5
    )


@pytest.mark.parametrize("n,bsz,k", [(32, 8, 128), (64, 16, 64)])
def test_pallas_spmm_fused_matches(n, bsz, k):
    from sparse_tpu.ops.pallas_bell import bell_spmm_pallas_fused

    a, xa = random_bell(n, bsz, 0.4, seed=n * 2 + k)
    b = jnp.asarray(
        np.random.default_rng(k + 1).standard_normal((n, k)).astype(np.float32)
    )
    got = bell_spmm_pallas_fused(a, b, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got), xa @ np.asarray(b), rtol=2e-5, atol=2e-5
    )


@pytest.mark.parametrize("n,bsz,rt", [(32, 8, 4), (40, 8, 4), (64, 16, 2)])
def test_pallas_smvm_matches(n, bsz, rt):
    from sparse_tpu.ops.pallas_bell import bell_smvm_pallas

    a, xa = random_bell(n, bsz, 0.4, seed=n + rt)
    v = jnp.asarray(
        np.random.default_rng(rt).standard_normal(n).astype(np.float32)
    )
    got = bell_smvm_pallas(a, v, row_tile=rt, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got), xa @ np.asarray(v), rtol=2e-5, atol=2e-5
    )


def test_pallas_spmm_windowed_matches():
    from sparse_tpu.ops.pallas_bell import (
        bell_spmm_pallas_windowed,
        build_window_plan,
    )

    # banded pattern: windows stay narrow
    rng = np.random.default_rng(9)
    n, bsz, k = 64, 8, 128
    nb = n // bsz
    mask = np.zeros((nb, nb), bool)
    for off in (-1, 0, 1):
        mask |= np.eye(nb, k=off, dtype=bool)
    x = (rng.standard_normal((n, n)) * np.kron(mask, np.ones((bsz, bsz)))).astype(
        np.float32
    )
    from sparse_tpu import bsr_from_dense
    from sparse_tpu.formats.bell import bell_from_bsr

    a = bell_from_bsr(bsr_from_dense(jnp.asarray(x), bsz))
    b = jnp.asarray(rng.standard_normal((n, k)).astype(np.float32))
    plan = build_window_plan(a, row_tile=2)
    assert plan is not None
    got = bell_spmm_pallas_windowed(a, b, plan, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got), x @ np.asarray(b), rtol=2e-5, atol=2e-5
    )
    # scattered pattern: window cap exceeded -> fallback signal
    y = np.zeros((n, n), np.float32)
    y[:bsz, -bsz:] = 1.0
    y[-bsz:, :bsz] = 1.0
    y[:bsz, :bsz] = 1.0
    a2 = bell_from_bsr(bsr_from_dense(jnp.asarray(y), bsz))
    assert build_window_plan(a2, row_tile=2, max_window=2) is None


def test_pallas_spmm_fused_bf16_stream():
    from sparse_tpu.ops.pallas_bell import bell_spmm_pallas_fused

    a, xa = random_bell(32, 8, 0.5, seed=77)
    b = jnp.asarray(
        np.random.default_rng(7).standard_normal((32, 128)).astype(np.float32)
    )
    got = bell_spmm_pallas_fused(a, b, compute_dtype=jnp.bfloat16,
                                 interpret=True)
    assert got.dtype == jnp.float32
    np.testing.assert_allclose(
        np.asarray(got), xa @ np.asarray(b), rtol=5e-2, atol=5e-2
    )
