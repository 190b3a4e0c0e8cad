"""Bundled reference datasets (the analog of the reference ``data/`` +
``R/data.R``): ``cell_lines``, ``cell_lines_small`` (meta_data + 20 scaled
PCs), and ``pbmc_ctrl``/``pbmc_stim`` (gene-count sparse matrices from Kang
et al. 2017, used by the Seurat vignette).

Loaded directly from the reference's .rda/.RData files when available
(default path ``/root/reference/data``; override with the
``HARMONY_TPU_DATA`` environment variable or the ``path=`` argument). A
deterministic synthetic fallback with the same schema keeps the API usable
when the reference data is absent.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Dict, Optional

import numpy as np

from .rdata import RFactor, RSparseMatrix, load_rdata

_DEFAULT_PATHS = (
    os.environ.get("HARMONY_TPU_DATA", ""),
    os.path.join(os.path.dirname(__file__), "data"),
    "/root/reference/data",
)


@dataclasses.dataclass
class CellDataset:
    """Embedding + metadata, the shape RunHarmony consumes."""

    scaled_pcs: np.ndarray  # (N, d) float64
    meta_data: Dict[str, np.ndarray]
    name: str

    @property
    def n_cells(self) -> int:
        return self.scaled_pcs.shape[0]


def _find(fname: str, path: Optional[str]) -> Optional[str]:
    candidates = [path] if path else [p for p in _DEFAULT_PATHS if p]
    for base in candidates:
        full = os.path.join(base, fname)
        if os.path.exists(full):
            return full
    return None


def _df_to_meta(df: Dict) -> Dict[str, np.ndarray]:
    out = {}
    for k, v in df.items():
        if isinstance(v, RFactor):
            out[k] = v.as_strings()
        else:
            out[k] = np.asarray(v)
    return out


def _df_to_matrix(df: Dict) -> np.ndarray:
    cols = [np.asarray(v, dtype=np.float64) for v in df.values()]
    return np.stack(cols, axis=1)


def _load_cell_lines(fname: str, key: str, name: str, path: Optional[str]):
    # vendored .npz first, then the reference .rda, then synthetic fallback
    npz = _find(f"{key}.npz", path)
    if npz is not None:
        z = np.load(npz, allow_pickle=False)
        meta = {
            k[len("meta_"):]: z[k] for k in z.files if k.startswith("meta_")
        }
        return CellDataset(scaled_pcs=z["scaled_pcs"], meta_data=meta, name=name)
    full = _find(fname, path)
    if full is None:
        return _synthetic_cell_lines(name)
    obj = load_rdata(full)[key]
    return CellDataset(
        scaled_pcs=_df_to_matrix(obj["scaled_pcs"]),
        meta_data=_df_to_meta(obj["meta_data"]),
        name=name,
    )


def cell_lines(path: Optional[str] = None) -> CellDataset:
    """Cell-line mixture (10x), 20 scaled PCs, covariates dataset/cell_type."""
    return _load_cell_lines("cell_lines.rda", "cell_lines", "cell_lines", path)


def cell_lines_small(path: Optional[str] = None) -> CellDataset:
    """300-cell subset of cell_lines."""
    return _load_cell_lines(
        "cell_lines_small.RData", "cell_lines_small", "cell_lines_small", path
    )


def pbmc_stim(path: Optional[str] = None):
    """(pbmc_ctrl, pbmc_stim) gene-count CSC matrices (genes x cells).

    Returns a pair of :class:`harmony_tpu.rdata.RSparseMatrix`.
    """
    out = []
    for key in ("pbmc_ctrl", "pbmc_stim"):
        npz = _find(f"{key}.npz", path)
        if npz is not None:
            z = np.load(npz, allow_pickle=False)
            dimnames = [
                z["genes"] if "genes" in z.files else None,
                z["cells"] if "cells" in z.files else None,
            ]
            out.append(
                RSparseMatrix(
                    data=z["data"], indices=z["indices"], indptr=z["indptr"],
                    shape=tuple(z["shape"]), dimnames=dimnames,
                )
            )
    if len(out) == 2:
        return tuple(out)
    full = _find("pbmc_stim.RData", path)
    if full is None:
        raise FileNotFoundError(
            "pbmc data not found; set HARMONY_TPU_DATA"
        )
    d = load_rdata(full)
    return d["pbmc.ctrl"], d["pbmc.stim"]


def pbmc_dataset(n_pcs: int = 20, path: Optional[str] = None) -> CellDataset:
    """Stimulated-vs-control PBMC integration input, reproducing the
    reference Seurat-vignette preprocessing in NumPy: concatenate ctrl+stim
    counts, library-size log-normalise, scale genes (scaleData,
    src/utils.cpp:112-155), PCA to ``n_pcs``.
    """
    ctrl, stim = pbmc_stim(path)
    from .scale import scale_data

    counts = np.concatenate([ctrl.toarray(), stim.toarray()], axis=1)
    cond = np.array(
        ["ctrl"] * ctrl.shape[1] + ["stim"] * stim.shape[1]
    )
    libsize = counts.sum(axis=0, keepdims=True)
    norm = np.log1p(counts / np.where(libsize == 0, 1, libsize) * 1e4)
    # keep top 1000 variable genes for a tractable PCA
    var = norm.var(axis=1)
    top = np.argsort(var)[::-1][:1000]
    scaled = scale_data(norm[top], margin=1, thresh=10.0)
    # PCA over cells
    Xc = scaled - scaled.mean(axis=1, keepdims=True)
    U, S, Vt = np.linalg.svd(Xc, full_matrices=False)
    pcs = (Vt[:n_pcs].T * S[:n_pcs])  # (N, n_pcs)
    # scale PCs to unit variance like the quickstart's scaled_pcs
    pcs = pcs / pcs.std(axis=0, keepdims=True) / np.sqrt(pcs.shape[0])
    return CellDataset(
        scaled_pcs=pcs, meta_data={"stim": cond}, name="pbmc_stim"
    )


def _synthetic_cell_lines(name: str) -> CellDataset:
    """Schema-compatible synthetic fallback (deterministic)."""
    n = 300 if name == "cell_lines_small" else 2370
    rng = np.random.default_rng(0)
    types = rng.integers(0, 3, n)
    datasets = rng.integers(0, 2, n)
    d = 20
    Z = (
        (rng.normal(size=(3, d)) * 3.0)[types]
        + (rng.normal(size=(2, d)) * 1.5)[datasets]
        + rng.normal(size=(n, d)) * 0.5
    ) / 50.0
    return CellDataset(
        scaled_pcs=Z,
        meta_data={
            "dataset": np.array([f"d{x}" for x in datasets]),
            "cell_type": np.array([f"t{x}" for x in types]),
        },
        name=name + "_synthetic",
    )
