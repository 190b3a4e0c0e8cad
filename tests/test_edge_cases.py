"""Edge-case and robustness tests."""

import numpy as np
import pytest

from harmony_tpu import harmony_options, run_harmony

from conftest import make_synthetic


def test_nclust_one_is_linear_regression():
    """nclust=1 'equivalent to simple linear regression' (R/ui.R:34-35):
    R is all-ones and the correction subtracts per-batch offsets."""
    Z, meta = make_synthetic(
        None, n_cells=200, d=6, n_batches=2, n_types=1, batch_shift=3.0,
        seed=1,
    )
    obj = run_harmony(
        Z, meta, ["dataset"], nclust=1, max_iter=2, return_object=True,
        seed=0,
    )
    np.testing.assert_allclose(obj.R, 1.0, atol=1e-6)
    assert np.all(np.isfinite(obj.Z_corr))
    # batch means of the correction approach each other
    b = meta["dataset"]
    emb = obj.embeddings
    gap = np.linalg.norm(
        emb[b == "b0"].mean(0) - emb[b == "b1"].mean(0)
    )
    gap0 = np.linalg.norm(
        Z[b == "b0"].mean(0) - Z[b == "b1"].mean(0)
    )
    assert gap < 0.25 * gap0


def test_sigma_vector():
    Z, meta = make_synthetic(None, n_cells=150, d=6, seed=2)
    sigma = np.linspace(0.05, 0.3, 8)
    obj = run_harmony(
        Z, meta, ["dataset"], nclust=8, sigma=sigma, max_iter=2,
        return_object=True, seed=0,
    )
    np.testing.assert_allclose(obj.sigma, sigma, rtol=1e-6)
    assert np.all(np.isfinite(obj.Z_corr))


def test_sigma_wrong_length_errors():
    from harmony_tpu import HarmonyConfigError

    Z, meta = make_synthetic(None, n_cells=150, d=6, seed=2)
    with pytest.raises(HarmonyConfigError):
        run_harmony(Z, meta, ["dataset"], nclust=8, sigma=np.ones(3))


def test_same_seed_reproducible():
    Z, meta = make_synthetic(None, n_cells=200, d=8, seed=3)
    a = run_harmony(Z, meta, ["dataset"], nclust=6, max_iter=2, seed=42)
    b = run_harmony(Z, meta, ["dataset"], nclust=6, max_iter=2, seed=42)
    np.testing.assert_array_equal(a, b)


def test_different_seed_differs():
    Z, meta = make_synthetic(None, n_cells=200, d=8, seed=3)
    a = run_harmony(Z, meta, ["dataset"], nclust=6, max_iter=2, seed=1)
    b = run_harmony(Z, meta, ["dataset"], nclust=6, max_iter=2, seed=2)
    assert not np.allclose(a, b)


def test_block_size_one_single_block():
    """block_size=1 -> a single block per round (valid per the reference's
    0 < b <= 1 contract)."""
    Z, meta = make_synthetic(None, n_cells=120, d=6, seed=4)
    out = run_harmony(
        Z, meta, ["dataset"], nclust=4, max_iter=2, seed=0,
        options=harmony_options(block_size=1.0),
    )
    assert np.all(np.isfinite(out))


def test_single_batch_level_noop_correction():
    """One covariate with a single level: no covariate has >=2 levels, so
    every cluster is skipped and Z_corr stays the (original) embedding
    (src/harmony.cpp:449-452 continue path)."""
    Z, _ = make_synthetic(None, n_cells=100, d=6, seed=5)
    meta = {"dataset": np.array(["only"] * 100)}
    obj = run_harmony(
        Z, meta, ["dataset"], nclust=4, max_iter=1, return_object=True,
        seed=0,
    )
    np.testing.assert_allclose(obj.Z_corr, obj.Z_orig, atol=1e-5)


def test_max_iter_zero_like_behavior():
    """max_iter=1 minimal run still produces a usable result."""
    Z, meta = make_synthetic(None, n_cells=100, d=5, seed=6)
    out = run_harmony(Z, meta, ["dataset"], nclust=3, max_iter=1, seed=0)
    assert out.shape == (100, 5)


def test_integer_metadata_covariate():
    Z, _ = make_synthetic(None, n_cells=90, d=5, seed=7)
    meta = {"batch_id": np.array([0, 1, 2] * 30)}
    obj = run_harmony(
        Z, meta, ["batch_id"], nclust=3, max_iter=1, return_object=True,
        seed=0,
    )
    assert obj.B == 3
