"""Ecosystem adapters: the analog of the reference's L6 layer
(``RunHarmony.Seurat`` / ``RunHarmony.SingleCellExperiment``,
R/RunHarmony.R:60-194) for the Python single-cell stack.

* :func:`run_harmony_anndata` — AnnData/scanpy: reads an ``obsm`` embedding
  (default ``X_pca``), covariates from ``obs``, writes the corrected
  embedding to ``obsm['X_harmony']`` (the Seurat adapter's
  ``reduction.save='harmony'`` analog, R/RunHarmony.R:102-111).
* ``dims_use`` subsetting and validation mirror the reference
  (R/RunHarmony.R:77-86).

AnnData is an optional dependency (duck-typed: any object with ``obsm``,
``obs`` and ``n_obs`` works).
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

from .api import run_harmony
from .config import HarmonyConfigError


def project_dim_loadings(adata, basis: str = "X_harmony") -> np.ndarray:
    """Feature-loading projection of an ``obsm`` basis — the AnnData
    analog of ``Seurat::ProjectDim`` (called by the Seurat adapter at
    R/RunHarmony.R:112-119): project the feature-by-cell data matrix onto
    the cell embeddings, ``loadings = X^T · emb`` (n_var, d). Works with
    dense or scipy-sparse ``adata.X``; the result is written to
    ``adata.varm[basis]`` by :func:`run_harmony_anndata` when
    ``project_dim=True``."""
    emb = np.asarray(adata.obsm[basis])
    X = adata.X
    if X is None:
        raise HarmonyConfigError(
            "project_dim requires adata.X (the feature matrix) to project "
            "loadings; pass project_dim=False"
        )
    loadings = X.T @ emb  # sparse-friendly
    return np.asarray(loadings)


def run_harmony_anndata(
    adata,
    group_by_vars: Sequence[str],
    basis: str = "X_pca",
    adjusted_basis: str = "X_harmony",
    dims_use: Optional[Sequence[int]] = None,
    project_dim: Optional[bool] = None,
    **kwargs,
):
    """Run Harmony on an AnnData object in place; returns the object.

    Parameters mirror ``RunHarmony.Seurat`` (R/RunHarmony.R:60-68):
    ``basis`` is ``reduction.use``, ``adjusted_basis`` is
    ``reduction.save``, ``group_by_vars`` is ``group.by.vars``, and
    ``project_dim`` is ``project.dim`` — project feature loadings onto the
    harmony basis into ``varm[adjusted_basis]`` (default: on when the
    object carries a feature matrix ``X`` and a ``varm`` mapping,
    mirroring the reference's default ``project.dim=TRUE``).
    """
    if basis not in adata.obsm:
        raise HarmonyConfigError(
            f"{basis} cell embeddings not found in AnnData object. Run PCA "
            "(e.g. scanpy.pp.pca) first."
        )
    embedding = np.asarray(adata.obsm[basis])

    dims_avail = range(embedding.shape[1])
    if dims_use is None:
        dims_use = list(dims_avail)
    if not all(d in dims_avail for d in dims_use):
        raise HarmonyConfigError(
            "trying to use more dimensions than computed. Rerun dimension "
            "reduction with more dimensions or use fewer dims"
        )
    if len(dims_use) == 1:
        raise HarmonyConfigError("only specified one dimension in dims_use")

    missing = [v for v in group_by_vars if v not in adata.obs]
    if missing:
        raise HarmonyConfigError(
            f"covariates missing from adata.obs: {missing}"
        )
    meta = {v: np.asarray(adata.obs[v]) for v in group_by_vars}

    corrected = run_harmony(
        embedding[:, list(dims_use)], meta, list(group_by_vars), **kwargs
    )
    adata.obsm[adjusted_basis] = corrected
    if project_dim is None:
        project_dim = (
            getattr(adata, "X", None) is not None
            and getattr(adata, "varm", None) is not None
        )
    if project_dim:
        adata.varm[adjusted_basis] = project_dim_loadings(
            adata, adjusted_basis
        )
    return adata


def run_harmony_dataframe(
    embedding_df,
    meta_df,
    vars_use: Sequence[str],
    **kwargs,
) -> "np.ndarray":
    """Pandas-friendly entry: DataFrame embedding (cells x dims) + metadata
    DataFrame; returns a DataFrame-preserving corrected embedding when
    pandas is available, else an array."""
    values = np.asarray(embedding_df, dtype=np.float64)
    meta = {v: np.asarray(meta_df[v]) for v in vars_use}
    out = run_harmony(values, meta, list(vars_use), **kwargs)
    try:
        import pandas as pd

        if hasattr(embedding_df, "index"):
            return pd.DataFrame(
                out,
                index=embedding_df.index,
                columns=[f"harmony_{i+1}" for i in range(out.shape[1])],
            )
    except ImportError:
        pass
    return out
