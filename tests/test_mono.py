"""MSR/MSC conformance tests (golden vectors from reference mono_test.fut)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import sparse_tpu as st
from sparse_tpu.formats import mono


def dense(a):
    return np.asarray(a.todense())


@pytest.mark.parametrize(
    "n,m", [(2, 2), (2, 3), (3, 2), (1, 3), (0, 0), (0, 1), (1, 0)]
)
def test_msr_msc_eye(n, m):
    np.testing.assert_array_equal(
        dense(mono.msr_eye(n, m, jnp.int32)), np.eye(n, m, dtype=np.int32)
    )
    np.testing.assert_array_equal(
        dense(mono.msc_eye(n, m, jnp.int32)), np.eye(n, m, dtype=np.int32)
    )


MONO_CASES = [
    (2, 3, [0, 1], [0, 2], [2, 3], [[2, 0, 0], [0, 0, 3]]),
    (2, 3, [1, 0], [2, 0], [3, 2], [[2, 0, 0], [0, 0, 3]]),
    (2, 3, [], [], [], [[0, 0, 0], [0, 0, 0]]),
]


@pytest.mark.parametrize("n,m,rows,cols,vals,expected", MONO_CASES)
def test_msr_sparse(n, m, rows, cols, vals, expected):
    A = mono.msr_from_triples(n, m, zip(rows, cols, vals), dtype=np.int32)
    np.testing.assert_array_equal(dense(A), expected)


@pytest.mark.parametrize("n,m,rows,cols,vals,expected", MONO_CASES)
def test_msc_sparse(n, m, rows, cols, vals, expected):
    A = mono.msc_from_triples(n, m, zip(rows, cols, vals), dtype=np.int32)
    np.testing.assert_array_equal(dense(A), expected)


def test_msr_one_per_row_assert():
    # reference asserts one stored element per row (mono.fut:122-125)
    with pytest.raises(ValueError):
        mono.msr_from_triples(2, 3, [(0, 0, 1), (0, 2, 5)])
    # duplicates at the same (r, c) merge first, so this is fine:
    A = mono.msr_from_triples(2, 3, [(0, 0, 1), (0, 0, 5)], dtype=np.int32)
    np.testing.assert_array_equal(dense(A), [[6, 0, 0], [0, 0, 0]])


def test_msr_smvm_golden():
    # reference mono_test.fut:46-53
    A = mono.msr_from_triples(
        5, 5, zip([0, 1, 2, 3, 4], [0, 1, 1, 4, 3], [1, 3, 8, 6, 9]), dtype=np.int32
    )
    y = mono.msr_smvm(A, jnp.array([3, 10, 2, 6, 5], dtype=jnp.int32))
    np.testing.assert_array_equal(np.asarray(y), [3, 30, 80, 30, 54])


def test_msr_vsmm_golden():
    # reference mono_test.fut:78-89
    A = mono.msr_from_triples(
        4, 2, zip([0, 1, 2, 3], [0, 0, 1, 0], [1, 2, 3, 4]), dtype=np.int32
    )
    y = mono.msr_vsmm(jnp.array([10, 20, 30, 40], dtype=jnp.int32), A)
    np.testing.assert_array_equal(np.asarray(y), [210, 90])


def test_msr_nnz_and_coo():
    A = mono.msr_from_triples(2, 3, [(0, 0, 2), (1, 2, 3)], dtype=np.int32)
    assert int(mono.msr_nnz(A)) == 2
    c = st.coo_compact(mono.msr_to_coo(A))
    np.testing.assert_array_equal(np.asarray(c.row), [0, 1])
    np.testing.assert_array_equal(np.asarray(c.col), [0, 2])
    np.testing.assert_array_equal(np.asarray(c.data), [2, 3])
    Z = mono.msr_from_triples(2, 3, [], dtype=np.int32)
    assert int(mono.msr_nnz(Z)) == 0


def test_msr_msc_transpose():
    A = mono.msr_from_triples(2, 3, [(0, 0, 2), (1, 2, 3)], dtype=np.int32)
    t = mono.msr_transpose(A)
    assert isinstance(t, mono.MSC)
    np.testing.assert_array_equal(dense(t), [[2, 0], [0, 0], [0, 3]])
    B = mono.msc_from_triples(2, 3, [(0, 0, 2), (1, 2, 3)], dtype=np.int32)
    t2 = mono.msc_transpose(B)
    assert isinstance(t2, mono.MSR)
    np.testing.assert_array_equal(dense(t2), [[2, 0], [0, 0], [0, 3]])


def test_msr_add_sub_structure():
    A = mono.msr_from_triples(2, 3, [(0, 0, 2.0), (1, 2, 3.0)])
    B = mono.msr_scale(2.0, A)
    np.testing.assert_array_equal(dense(mono.msr_add(A, B)), [[6, 0, 0], [0, 0, 9]])
    np.testing.assert_array_equal(dense(mono.msr_sub(B, A)), [[2, 0, 0], [0, 0, 3]])
    C = mono.msr_from_triples(2, 3, [(0, 1, 2.0), (1, 2, 3.0)])
    with pytest.raises(ValueError):
        mono.msr_add(A, C)  # different structure (mono.fut:141 assert)


def test_msr_dmsmm():
    # dense (2x4) times mono (4x2)
    S = mono.msr_from_triples(
        4, 2, zip([0, 1, 2, 3], [0, 0, 1, 0], [1.0, 2.0, 3.0, 4.0])
    )
    D = jnp.arange(8, dtype=jnp.float64).reshape(2, 4)
    expected = np.asarray(D) @ dense(S)
    np.testing.assert_array_equal(np.asarray(mono.msr_dmsmm(D, S)), expected)


def test_msc_vsmm():
    A = mono.msc_from_triples(2, 3, [(0, 0, 2.0), (1, 2, 3.0)])
    y = mono.msc_vsmm(jnp.array([10.0, 100.0]), A)
    np.testing.assert_array_equal(np.asarray(y), [20.0, 0.0, 300.0])


def test_mono_jit():
    A = mono.msr_from_triples(2, 3, [(0, 0, 2.0), (1, 2, 3.0)])
    v = jnp.array([10.0, 20.0, 30.0])

    @jax.jit
    def f(a, v):
        return mono.msr_smvm(mono.msr_scale(2.0, a), v)

    np.testing.assert_array_equal(np.asarray(f(A, v)), [40.0, 180.0])


def test_msr_add_traced_mismatch_caught_in_debug_mode():
    # under jit the host structure check cannot run; debug mode turns it
    # into a checkify check so the mismatch surfaces instead of silently
    # corrupting (reference hard-asserts: mono.fut:141)
    from jax.experimental import checkify

    from sparse_tpu.formats import mono as mono_mod
    from sparse_tpu.formats.mono import msr_add, msr_from_triples

    a = msr_from_triples(3, 3, [(0, 0, 1.0), (1, 2, 2.0)])
    b = msr_from_triples(3, 3, [(0, 1, 1.0), (1, 2, 2.0)])  # different cols
    mono_mod.debug_checks(True)
    try:
        f = checkify.checkify(jax.jit(msr_add))
        err, _ = f(a, b)
        with pytest.raises(checkify.JaxRuntimeError):
            err.throw()
        # matching structure passes clean
        err2, out = f(a, a)
        err2.throw()
        np.testing.assert_allclose(np.asarray(out.vals), np.asarray(a.vals) * 2)
    finally:
        mono_mod.debug_checks(False)
