"""Row-standardisation preprocessing (``scaleData``/``scaleRows_dgc``).

The reference scales a sparse genes x cells matrix row-wise to mean 0 /
sd 1 with clipping at ``+-thresh``, operating directly on CSC arrays with a
zero-aware variance (R/utils.R:87-98 + src/utils.cpp:112-155). Here both a
dense NumPy/JAX path and a SciPy-CSC path are provided; the CSC path
reproduces the reference's zero-aware sd computation exactly (denominator
``ncol - 1``, including the zeros' contribution ``nz * mean^2``,
src/utils.cpp:132-147).
"""

from __future__ import annotations

import numpy as np


def scale_data(A, margin: int = 1, thresh: float = 10.0) -> np.ndarray:
    """Standardise rows (margin=1) or columns (margin=2) with clipping.

    Accepts a dense array or a ``scipy.sparse`` matrix; returns a dense
    float array like the reference (the output of row-scaling is dense).
    """
    try:
        import scipy.sparse as sp

        is_sparse = sp.issparse(A)
    except ImportError:  # pragma: no cover
        sp, is_sparse = None, False

    if margin not in (1, 2):
        raise ValueError("margin must be 1 (rows) or 2 (columns)")

    if is_sparse:
        M = A.tocsc() if margin == 1 else A.T.tocsc()
        res = _scale_rows_csc(M, thresh)
        return res if margin == 1 else res.T

    M = np.asarray(A, dtype=np.float64)
    if margin == 2:
        M = M.T
    res = _scale_rows_dense(M, thresh)
    return res if margin == 1 else res.T


def _scale_rows_dense(M: np.ndarray, thresh: float) -> np.ndarray:
    ncol = M.shape[1]
    mean = M.mean(axis=1, keepdims=True)
    # sample sd with ncol-1 denominator (src/utils.cpp:147)
    sd = np.sqrt(((M - mean) ** 2).sum(axis=1, keepdims=True) / (ncol - 1))
    sd = np.where(sd == 0, 1.0, sd)
    return np.clip((M - mean) / sd, -thresh, thresh)


def _scale_rows_csc(M, thresh: float) -> np.ndarray:
    """CSC path mirroring ``scaleRows_dgc`` (src/utils.cpp:112-155).

    Uses the native C++ kernel (harmony_tpu.native) when the toolchain is
    available; NumPy otherwise.
    """
    nrow, ncol = M.shape
    from . import native

    res = native.csc_scale_rows(
        M.data, M.indices, M.indptr, nrow, ncol, thresh
    )
    if res is not None:
        return res
    x, p, i = M.data, M.indptr, M.indices

    mean_vec = np.zeros(nrow)
    np.add.at(mean_vec, i, x)
    mean_vec /= ncol

    # zero-aware sum of squared deviations (src/utils.cpp:132-145)
    sd_vec = np.zeros(nrow)
    np.add.at(sd_vec, i, (x - mean_vec[i]) ** 2)
    nz = np.full(nrow, ncol, dtype=np.int64)
    np.subtract.at(nz, i, 1)
    sd_vec += nz * mean_vec**2
    sd_vec = np.sqrt(sd_vec / (ncol - 1))
    sd_vec = np.where(sd_vec == 0, 1.0, sd_vec)

    res = np.asarray(M.todense(), dtype=np.float64)
    res = (res - mean_vec[:, None]) / sd_vec[:, None]
    return np.clip(res, -thresh, thresh)
