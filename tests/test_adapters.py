"""Adapter tests with a duck-typed AnnData stand-in (anndata is optional)."""

import numpy as np
import pytest

from harmony_tpu import HarmonyConfigError
from harmony_tpu.adapters import run_harmony_anndata, run_harmony_dataframe

from conftest import make_synthetic


class FakeAnnData:
    """Minimal AnnData protocol: obsm/varm mappings, obs mapping, n_obs,
    optional feature matrix X."""

    def __init__(self, X_pca, obs, X=None):
        self.obsm = {"X_pca": X_pca}
        self.varm = {}
        self.obs = obs
        self.n_obs = X_pca.shape[0]
        self.X = X


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


class TestProjectDim:
    """The Seurat adapter's ProjectDim step (R/RunHarmony.R:112-119):
    feature loadings projected onto the harmony basis, written to varm."""

    def _adata_with_X(self, sparse=False):
        Z, meta = make_synthetic(None, n_cells=150, d=8, seed=8)
        rng = np.random.default_rng(0)
        X = rng.normal(size=(150, 40))
        if sparse:
            import scipy.sparse as sp

            X = sp.csr_matrix(np.where(np.abs(X) > 1.0, X, 0.0))
        return FakeAnnData(Z, meta, X=X), X

    @pytest.mark.parametrize("sparse", [False, True])
    def test_loadings_written(self, sparse):
        adata, X = self._adata_with_X(sparse=sparse)
        run_harmony_anndata(adata, ["dataset"], nclust=5, max_iter=2, seed=0)
        emb = adata.obsm["X_harmony"]
        load = adata.varm["X_harmony"]
        assert load.shape == (40, 8)
        Xd = X.toarray() if sparse else X
        np.testing.assert_allclose(load, Xd.T @ emb, rtol=1e-5)

    def test_opt_out_and_no_X(self):
        adata, _ = self._adata_with_X()
        run_harmony_anndata(
            adata, ["dataset"], nclust=5, max_iter=1, seed=0,
            project_dim=False,
        )
        assert "X_harmony" not in adata.varm
        # no feature matrix: default silently skips; explicit opt-in raises
        Z, meta = make_synthetic(None, n_cells=150, d=8, seed=8)
        bare = FakeAnnData(Z, meta)
        run_harmony_anndata(bare, ["dataset"], nclust=5, max_iter=1, seed=0)
        assert "X_harmony" not in bare.varm
        with pytest.raises(HarmonyConfigError, match="project_dim"):
            run_harmony_anndata(
                bare, ["dataset"], nclust=5, max_iter=1, seed=0,
                project_dim=True,
            )

    def test_real_anndata_when_importable(self):
        anndata = pytest.importorskip("anndata")
        Z, meta = make_synthetic(None, n_cells=150, d=8, seed=8)
        rng = np.random.default_rng(0)
        ad = anndata.AnnData(
            X=rng.normal(size=(150, 30)).astype(np.float32),
            obs={"dataset": meta["dataset"]},
        )
        ad.obsm["X_pca"] = Z.astype(np.float32)
        run_harmony_anndata(ad, ["dataset"], nclust=5, max_iter=2, seed=0)
        assert ad.obsm["X_harmony"].shape == (150, 8)
        assert ad.varm["X_harmony"].shape == (30, 8)


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


def test_dispatch_forwards_engine_knobs(adata, monkeypatch):
    """The generic dispatch (api.run_harmony -> run_harmony_anndata) must
    forward shuffle_mode/estep_impl/init_Y etc. — with the 'auto' default,
    a dropped explicit shuffle_mode='permute' would silently become
    'rotate' at scale (code-review r3 finding)."""
    from harmony_tpu import run_harmony
    import harmony_tpu.api as api_mod

    seen = {}
    orig = api_mod.run_harmony

    def spy(data_mat, meta_data, vars_use=None, **kw):
        # the inner (non-AnnData) call carries the forwarded knobs
        if not hasattr(data_mat, "obsm"):
            seen.update(kw)
        return orig(data_mat, meta_data, vars_use, **kw)

    monkeypatch.setattr(api_mod, "run_harmony", spy)
    import harmony_tpu.adapters as ad_mod

    monkeypatch.setattr(ad_mod, "run_harmony", spy)
    spy(
        adata, ["dataset"], nclust=5, max_iter=1, seed=0,
        shuffle_mode="permute", estep_impl="xla",
    )
    assert seen.get("shuffle_mode") == "permute"
    assert seen.get("estep_impl") == "xla"
