"""Native C++ host kernels vs their NumPy references."""

import numpy as np
import pytest

from harmony_tpu import native

sp = pytest.importorskip("scipy.sparse")

pytestmark = pytest.mark.skipif(
    not native.available(), reason="no C++ toolchain"
)


def _random_csc(nrow=40, ncol=60, density=0.2, seed=0):
    rng = np.random.default_rng(seed)
    A = rng.normal(size=(nrow, ncol))
    A[rng.random(A.shape) > density] = 0.0
    return A, sp.csc_matrix(A)


def test_scale_rows_matches_numpy():
    A, M = _random_csc()
    res = native.csc_scale_rows(
        M.data, M.indices, M.indptr, *M.shape, 10.0
    )
    mean = A.mean(axis=1, keepdims=True)
    sd = np.sqrt(((A - mean) ** 2).sum(axis=1, keepdims=True) / (A.shape[1] - 1))
    sd = np.where(sd == 0, 1.0, sd)
    expect = np.clip((A - mean) / sd, -10, 10)
    np.testing.assert_allclose(res, expect, atol=1e-12)


def test_scale_rows_clipping():
    A = np.zeros((3, 10))
    A[0, 0] = 1000.0
    M = sp.csc_matrix(A)
    res = native.csc_scale_rows(M.data, M.indices, M.indptr, 3, 10, 2.0)
    assert res.max() <= 2.0
    assert res.min() >= -2.0
    # zero-variance rows are left at 0 (sd fallback 1.0)
    np.testing.assert_allclose(res[1:], 0.0)


def test_row_stats():
    A, M = _random_csc(seed=3)
    mean, sd = native.csc_row_stats(M.data, M.indices, M.indptr, *M.shape)
    np.testing.assert_allclose(mean, A.mean(axis=1), atol=1e-12)
    expect_sd = A.std(axis=1, ddof=1)
    np.testing.assert_allclose(sd, expect_sd, atol=1e-12)


def test_log_normalize():
    A, M = _random_csc(seed=4)
    A = np.abs(A)
    M = sp.csc_matrix(A)
    out = native.csc_log_normalize(M.data.copy(), M.indptr, M.shape[1], 1e4)
    libsize = np.asarray(M.sum(axis=0)).ravel()
    libsize = np.where(libsize == 0, 1.0, libsize)
    dense = A / libsize[None, :] * 1e4
    expect = np.log1p(dense[A != 0])
    got = np.zeros_like(A)
    Mc = sp.csc_matrix((out, M.indices, M.indptr), shape=M.shape)
    np.testing.assert_allclose(
        np.sort(Mc.toarray()[A != 0]), np.sort(expect), atol=1e-12
    )


def test_scale_data_uses_native_and_matches():
    """Public scale_data CSC path agrees between native and NumPy."""
    import harmony_tpu.native as nat
    from harmony_tpu import scale_data

    A, M = _random_csc(seed=7)
    res_native = scale_data(M)
    import os

    os.environ["HARMONY_TPU_NO_NATIVE"] = "1"
    old = nat._LIB
    nat._LIB = False
    try:
        res_numpy = scale_data(M)
    finally:
        nat._LIB = old
        del os.environ["HARMONY_TPU_NO_NATIVE"]
    np.testing.assert_allclose(res_native, res_numpy, atol=1e-12)
