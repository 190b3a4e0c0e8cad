"""Adapter tests with a duck-typed AnnData stand-in (anndata is optional)."""

import numpy as np
import pytest

from harmony_tpu import HarmonyConfigError
from harmony_tpu.adapters import run_harmony_anndata, run_harmony_dataframe

from conftest import make_synthetic


class FakeAnnData:
    """Minimal AnnData protocol: obsm mapping, obs mapping, n_obs."""

    def __init__(self, X_pca, obs):
        self.obsm = {"X_pca": X_pca}
        self.obs = obs
        self.n_obs = X_pca.shape[0]


@pytest.fixture()
def adata():
    Z, meta = make_synthetic(None, n_cells=150, d=8, seed=8)
    return FakeAnnData(Z, meta)


def test_anndata_roundtrip(adata):
    out = run_harmony_anndata(
        adata, ["dataset"], nclust=5, max_iter=2, seed=0
    )
    assert out is adata
    emb = adata.obsm["X_harmony"]
    assert emb.shape == (150, 8)
    assert np.all(np.isfinite(emb))


def test_anndata_dims_use(adata):
    run_harmony_anndata(
        adata, ["dataset"], dims_use=[0, 1, 2, 3], nclust=5, max_iter=1,
        seed=0,
    )
    assert adata.obsm["X_harmony"].shape == (150, 4)


def test_anndata_errors(adata):
    with pytest.raises(HarmonyConfigError):
        run_harmony_anndata(adata, ["dataset"], basis="X_umap")
    with pytest.raises(HarmonyConfigError):
        run_harmony_anndata(adata, ["nope"])
    with pytest.raises(HarmonyConfigError):
        run_harmony_anndata(adata, ["dataset"], dims_use=[0])
    with pytest.raises(HarmonyConfigError):
        run_harmony_anndata(adata, ["dataset"], dims_use=[0, 99])


def test_generic_dispatch_on_anndata(adata):
    """run_harmony(adata, 'dataset') routes to the AnnData adapter
    (UseMethod analog)."""
    from harmony_tpu import run_harmony

    out = run_harmony(adata, "dataset", nclust=5, max_iter=1, seed=0)
    assert out is adata
    assert adata.obsm["X_harmony"].shape == (150, 8)


def test_result_W_shape():
    from harmony_tpu import run_harmony

    Z, meta = make_synthetic(None, n_cells=100, d=6, seed=2)
    obj = run_harmony(
        Z, meta, ["dataset"], nclust=4, max_iter=1, return_object=True, seed=0
    )
    W = obj.W
    assert W.shape == (obj.K, obj.B + 1, obj.d)
    np.testing.assert_allclose(W[:, 0, :], 0.0)


def test_dataframe_adapter():
    Z, meta = make_synthetic(None, n_cells=120, d=6, seed=3)
    out = run_harmony_dataframe(Z, meta, ["dataset"], nclust=4, max_iter=1, seed=0)
    out = np.asarray(out)
    assert out.shape == (120, 6)
    assert np.all(np.isfinite(out))
