"""Bundled-dataset loading (rdata parser + vendored npz) and integration on
the reference's real data (BASELINE.json configs 1-3)."""

import os

import numpy as np
import pytest

from harmony_tpu import harmony_options, run_harmony
from harmony_tpu import datasets
from harmony_tpu.rdata import RSparseMatrix, load_rdata

REF_DATA = "/root/reference/data"
HAVE_REF = os.path.isdir(REF_DATA)


def test_cell_lines_small_loads():
    ds = datasets.cell_lines_small()
    assert ds.scaled_pcs.shape == (300, 20)
    assert "dataset" in ds.meta_data
    assert "cell_type" in ds.meta_data
    assert len(ds.meta_data["dataset"]) == 300
    assert np.all(np.isfinite(ds.scaled_pcs))


def test_cell_lines_loads():
    ds = datasets.cell_lines()
    assert ds.scaled_pcs.shape[1] == 20
    assert ds.n_cells == 2370
    assert set(np.unique(ds.meta_data["dataset"])) == {"half", "jurkat", "t293"}
    assert set(np.unique(ds.meta_data["cell_type"])) == {"jurkat", "t293"}


def test_pbmc_loads():
    ctrl, stim = datasets.pbmc_stim()
    assert ctrl.shape == (9015, 1000)
    assert stim.shape == (9015, 1000)
    # counts are non-negative integers
    assert ctrl.data.min() >= 0
    dense_col = ctrl.toarray()[:, 0]
    assert dense_col.sum() == ctrl.data[: ctrl.indptr[1]].sum()


@pytest.mark.skipif(not HAVE_REF, reason="reference data not mounted")
def test_rdata_parser_matches_npz():
    """The vendored npz must agree with a fresh parse of the reference rda."""
    obj = load_rdata(os.path.join(REF_DATA, "cell_lines_small.RData"))[
        "cell_lines_small"
    ]
    pcs = np.stack(
        [np.asarray(v, float) for v in obj["scaled_pcs"].values()], axis=1
    )
    ds = datasets.cell_lines_small()
    np.testing.assert_array_equal(pcs, ds.scaled_pcs)


def test_integration_cell_lines_small():
    """The reference testthat config: theta=1, K=50, 5 iters
    (tests/testthat/test_integration.R:5-7)."""
    ds = datasets.cell_lines_small()
    obj = run_harmony(
        ds.scaled_pcs, ds.meta_data, ["dataset"], theta=1.0, nclust=50,
        max_iter=5, return_object=True, seed=0,
        options=harmony_options(max_iter_cluster=10),
    )
    assert obj.R.shape == (50, 300)
    np.testing.assert_allclose(obj.R.sum(axis=0), 1.0, atol=1e-5)
    assert np.all(np.isfinite(obj.Z_corr))
    # objective decreases and the run mixes the datasets: chi2 drops
    assert obj.objective_harmony[-1] < obj.objective_harmony[0]


def test_integration_cell_lines_two_covariates():
    ds = datasets.cell_lines()
    obj = run_harmony(
        ds.scaled_pcs, ds.meta_data, ["cell_type", "dataset"],
        theta=[1.0, 1.0], nclust=50, max_iter=3, return_object=True, seed=0,
        options=harmony_options(max_iter_cluster=10),
    )
    n_levels = len(np.unique(ds.meta_data["cell_type"])) + len(
        np.unique(ds.meta_data["dataset"])
    )
    assert obj.O.shape[1] == n_levels
    assert np.all(np.isfinite(obj.Z_corr))


def test_theta_monotonicity_on_real_data():
    ds = datasets.cell_lines_small()
    lo = run_harmony(
        ds.scaled_pcs, ds.meta_data, ["dataset"], theta=0.0, nclust=20,
        max_iter=2, return_object=True, seed=1,
    )
    hi = run_harmony(
        ds.scaled_pcs, ds.meta_data, ["dataset"], theta=1.0, nclust=5,
        max_iter=2, return_object=True, seed=1,
    )
    chi2 = lambda o: float(np.sum((o.O - o.E) ** 2 / o.E))
    assert chi2(lo) > chi2(hi)


def test_pbmc_dataset_pipeline():
    ds = datasets.pbmc_dataset(n_pcs=10)
    assert ds.scaled_pcs.shape == (2000, 10)
    assert np.all(np.isfinite(ds.scaled_pcs))
    out = run_harmony(
        ds.scaled_pcs, ds.meta_data, ["stim"], nclust=20, max_iter=2, seed=0
    )
    assert out.shape == (2000, 10)
    assert np.all(np.isfinite(out))


def test_cell_lines_reference_behavior():
    """Reproduce the reference's published qualitative result on its own
    bundled dataset (read from the reference .rda): the cell_lines
    quickstart integrates at default settings, mixing improves markedly
    ("well mixed after ~3 rounds", detailedWalkthrough.Rmd:857 — a visual
    statement; the epsilon_harmony stop lands within the default budget),
    and the chi2 batch-mixing statistic falls to less than half its
    initial value."""
    import numpy as np

    from harmony_tpu import run_harmony

    ds = datasets.cell_lines()
    chi2 = lambda O, E: float(
        np.sum((np.float64(O) - np.float64(E)) ** 2 / np.float64(E))
    )
    res0 = run_harmony(
        ds.scaled_pcs, ds.meta_data, ["dataset"], return_object=True,
        seed=0, max_iter=0,
    )
    res = run_harmony(
        ds.scaled_pcs, ds.meta_data, ["dataset"], return_object=True,
        seed=0,
    )
    # early-stopped before the 10-round budget (the reference's typical
    # 3-8 round regime), objective down substantially, mixing improved
    assert 2 <= int(res.state.n_rounds) < 10
    oh = np.asarray(res.objective_harmony, np.float64)
    assert oh[-1] < 0.6 * oh[0]
    assert chi2(res.O, res.E) < 0.5 * chi2(res0.O, res0.E)
    assert np.all(np.isfinite(res.embeddings))
