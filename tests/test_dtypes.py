"""Dtype genericity: the formats are the 'element functor' of the reference
(element.fut:9-16) — one code path must serve f32/f64/bf16/i32."""

import jax.numpy as jnp
import numpy as np
import pytest

from sparse_tpu import (
    bsr_from_dense,
    bsr_smvm,
    csr_from_dense,
    csr_smvm,
    csr_todense,
    spgemm,
    tri_from_dense,
    tri_smm,
    tri_todense,
)
from sparse_tpu.formats.bell import bell_from_bsr, bell_smvm


def pattern(n, density, seed):
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n, n)) * (rng.random((n, n)) < density)


@pytest.mark.parametrize(
    "dtype,tol",
    [(jnp.float32, 1e-5), (jnp.float64, 1e-12), (jnp.bfloat16, 5e-2)],
)
def test_csr_float_dtypes(dtype, tol):
    x = pattern(24, 0.3, 0).astype(np.float64)
    a = csr_from_dense(jnp.asarray(x, dtype))
    assert a.dtype == dtype
    v = jnp.asarray(np.ones(24), dtype)
    got = np.asarray(csr_smvm(a, v), np.float64)
    ref = np.asarray(jnp.asarray(x, dtype), np.float64) @ np.ones(24)
    np.testing.assert_allclose(got, ref, rtol=tol, atol=tol)


def test_csr_int_dtype_exact():
    x = np.asarray(pattern(12, 0.5, 1) * 10, np.int32)
    a = csr_from_dense(jnp.asarray(x))
    assert a.dtype == jnp.int32
    v = jnp.asarray(np.arange(12, dtype=np.int32))
    np.testing.assert_array_equal(np.asarray(csr_smvm(a, v)), x @ np.asarray(v))
    c = spgemm(a, a)
    np.testing.assert_array_equal(np.asarray(csr_todense(c)), x @ x)


@pytest.mark.parametrize("dtype,tol", [(jnp.float32, 1e-5), (jnp.bfloat16, 5e-2)])
def test_block_formats_dtypes(dtype, tol):
    x = pattern(16, 0.5, 2)
    a = bsr_from_dense(jnp.asarray(x, dtype), 4)
    v = jnp.asarray(np.ones(16), dtype)
    ref = np.asarray(jnp.asarray(x, dtype), np.float64) @ np.ones(16)
    np.testing.assert_allclose(
        np.asarray(bsr_smvm(a, v), np.float64), ref, rtol=tol, atol=tol
    )
    e = bell_from_bsr(a)
    np.testing.assert_allclose(
        np.asarray(bell_smvm(e, v), np.float64), ref, rtol=tol, atol=tol
    )


def test_triangular_int():
    x = np.tril(np.arange(1, 17).reshape(4, 4)).astype(np.int32)
    a = tri_from_dense(jnp.asarray(x))
    got = tri_todense(tri_smm(a, a))
    np.testing.assert_array_equal(np.asarray(got), x @ x)
