"""End-to-end property tests mirroring the reference testthat suite
(tests/testthat/test_integration.R and test_two_variable.R): shapes,
simplex-valid R, finite corrected embeddings, chi-square theta-monotonicity,
and error paths.
"""

import numpy as np
import pytest

from harmony_tpu import HarmonyConfigError, harmony_options, run_harmony

from conftest import make_synthetic


@pytest.fixture(scope="module")
def result():
    Z, meta = make_synthetic(None, n_cells=300, d=12, seed=21)
    return run_harmony(
        Z, meta, ["dataset"], theta=1.0, nclust=20, max_iter=5,
        return_object=True, seed=1,
        options=harmony_options(max_iter_cluster=10),
    )


def test_dimensions_match(result):
    obj = result
    assert obj.Y.shape == (obj.d, obj.K)
    assert obj.Z_corr.shape == (obj.d, obj.N)
    assert obj.Z_orig.shape == (obj.d, obj.N)
    assert obj.R.shape == (obj.K, obj.N)
    assert obj.embeddings.shape == (obj.N, obj.d)


def test_R_is_probability_distribution(result):
    R = result.R
    assert R.min() >= 0
    assert R.max() <= 1
    np.testing.assert_allclose(R.sum(axis=0), 1.0, atol=1e-5)


def test_no_nulls_in_corrected_embedding(result):
    Z = result.Z_corr
    assert np.all(np.isfinite(Z))


def test_objective_decreases(result):
    oh = result.objective_harmony
    assert len(oh) >= 2
    assert oh[-1] < oh[0]


def test_theta_monotonicity_chi2():
    """Higher theta lowers the chi2 between cluster and batch assignment
    (test_integration.R:29-41)."""
    Z, meta = make_synthetic(None, n_cells=300, d=12, seed=33)
    obj0 = run_harmony(
        Z, meta, ["dataset"], theta=0.0, nclust=20, max_iter=2,
        return_object=True, seed=2,
    )
    obj1 = run_harmony(
        Z, meta, ["dataset"], theta=1.0, nclust=5, max_iter=2,
        return_object=True, seed=2,
    )
    chi2 = lambda o: float(np.sum((o.O - o.E) ** 2 / o.E))
    assert chi2(obj0) > chi2(obj1)


def test_bfloat16_end_to_end():
    """dtype='bfloat16' (bf16 storage, f32 contractions — the analog of
    the reference's dual-precision build, configure:185-199) must run end
    to end: finite output, decreasing objective, chi2 theta-monotonicity
    preserved, on both shuffle schedules."""
    Z, meta = make_synthetic(None, n_cells=400, d=12, seed=7)
    chi2 = lambda o: float(
        np.sum((np.float64(o.O) - np.float64(o.E)) ** 2 / np.float64(o.E))
    )
    for mode in ("permute", "rotate"):
        res = run_harmony(
            Z, meta, ["dataset"], nclust=8, max_iter=3, seed=0,
            dtype="bfloat16", shuffle_mode=mode, return_object=True,
        )
        assert str(res.state.Z_corr.dtype) == "bfloat16"
        assert np.all(np.isfinite(res.embeddings))
        np.testing.assert_allclose(res.R.sum(axis=0), 1.0, atol=2e-2)
        oh = np.asarray(res.objective_harmony, np.float64)
        assert oh[-1] < oh[0]
    lo = run_harmony(
        Z, meta, ["dataset"], theta=0.0, nclust=20, max_iter=2,
        return_object=True, seed=2, dtype="bfloat16",
    )
    hi = run_harmony(
        Z, meta, ["dataset"], theta=1.0, nclust=5, max_iter=2,
        return_object=True, seed=2, dtype="bfloat16",
    )
    assert chi2(lo) > chi2(hi)


def test_error_paths():
    Z, meta = make_synthetic(None, n_cells=100, d=6, seed=5)
    with pytest.raises(HarmonyConfigError):
        run_harmony(Z, meta, ["fake_variable"])
    with pytest.raises(HarmonyConfigError):
        run_harmony(Z, meta, ["dataset"], lamb=[1.0, 2.0])
    short_meta = {k: v[:-1] for k, v in meta.items()}
    with pytest.raises(HarmonyConfigError):
        run_harmony(Z, short_meta, ["dataset"])
    with pytest.raises(HarmonyConfigError):
        run_harmony(Z[:5], meta["dataset"][:5], None)  # <6 cells


def test_legacy_args_rejected():
    Z, meta = make_synthetic(None, n_cells=60, d=4, seed=6)
    with pytest.raises(HarmonyConfigError):
        run_harmony(Z, meta, ["dataset"], max_iter_harmony=5)


class TestTwoVariable:
    """Mirrors test_two_variable.R on synthetic two-covariate data."""

    @pytest.fixture(scope="class")
    def obj(self):
        Z, meta = make_synthetic(None, n_cells=400, d=12, seed=44)
        return run_harmony(
            Z, meta, ["cell_type", "dataset"], theta=[1.0, 1.0], nclust=20,
            max_iter=5, return_object=True, seed=3,
            options=harmony_options(max_iter_cluster=10),
        )

    def test_dimensions(self, obj):
        assert obj.Y.shape == (obj.d, obj.K)
        assert obj.R.shape == (obj.K, obj.N)

    def test_O_E_span_both_covariates(self, obj):
        n_levels = sum(obj.config.B_vec)
        assert obj.O.shape[1] == n_levels
        assert obj.E.shape[1] == n_levels

    def test_R_probabilities(self, obj):
        assert obj.R.min() >= 0
        assert obj.R.max() <= 1
        np.testing.assert_allclose(obj.R.sum(axis=0), 1.0, atol=1e-5)

    def test_finite(self, obj):
        assert np.all(np.isfinite(obj.Z_corr))

    def test_theta_monotonicity_both_covariates(self):
        Z, meta = make_synthetic(None, n_cells=400, d=12, seed=44)
        lo = run_harmony(
            Z, meta, ["cell_type", "dataset"], theta=[0.0, 0.0], nclust=20,
            max_iter=2, return_object=True, seed=4,
        )
        hi = run_harmony(
            Z, meta, ["cell_type", "dataset"], theta=[2.0, 2.0], nclust=20,
            max_iter=2, return_object=True, seed=4,
        )
        chi2 = lambda o: float(np.sum((o.O - o.E) ** 2 / o.E))
        assert chi2(lo) > chi2(hi)


def test_lambda_estimation_mode_runs():
    Z, meta = make_synthetic(None, n_cells=200, d=8, seed=9)
    obj = run_harmony(
        Z, meta, ["dataset"], lamb=None, nclust=10, max_iter=3,
        return_object=True, seed=5,
    )
    assert np.all(np.isfinite(obj.Z_corr))
    lam = obj.get_lambda()
    assert lam.shape == (obj.K, obj.B + 1)
    np.testing.assert_allclose(lam[:, 0], 0.0)
    # estimated lambdas are alpha * E
    np.testing.assert_allclose(lam[:, 1:], obj.config.alpha * obj.E, rtol=1e-5)


def test_batch_effect_reduced():
    """Harmony should shrink the distance between batch centroids of the
    same cell population."""
    Z, meta = make_synthetic(
        None, n_cells=500, d=10, n_batches=2, n_types=1, batch_shift=4.0,
        seed=77,
    )
    corrected = run_harmony(Z, meta, ["dataset"], nclust=5, max_iter=10, seed=6)
    b = meta["dataset"]

    def sep(M):
        mu0 = M[b == "b0"].mean(axis=0)
        mu1 = M[b == "b1"].mean(axis=0)
        scale = M.std(axis=0).mean()
        return np.linalg.norm(mu0 - mu1) / scale

    # compare in cosine-normalised space (the space harmony corrects)
    Zn = Z / np.linalg.norm(Z, axis=1, keepdims=True)
    Cn = corrected / np.linalg.norm(corrected, axis=1, keepdims=True)
    assert sep(Cn) < 0.5 * sep(Zn)


def test_fused_round_matches_separate_phases():
    """engine.round (one dispatch) == correct(cluster(state)) exactly."""
    import jax

    from harmony_tpu.config import harmony_options
    from harmony_tpu.engine import make_engine
    from harmony_tpu.preprocess import (
        build_design, expand_hyperparams, orient_embedding, resolve_config,
    )
    from harmony_tpu.state import init_state

    Z, meta = make_synthetic(None, n_cells=240, d=8, seed=3)
    options = harmony_options()
    design = build_design(meta, ["dataset"])
    Zt = orient_embedding(Z, 240)
    cfg = resolve_config(
        n_cells=240, d=8, design=design, nclust=10, max_iter=3,
        early_stop=False, options=options, verbose=False,
    )
    hp = expand_hyperparams(design, cfg.K, None, 0.1, 1.0, options.tau)
    state = init_state(
        cfg, Zt, design, hp.sigma, hp.theta, hp.lamb, jax.random.PRNGKey(7)
    )
    engine = make_engine(cfg, codes=state.codes)
    state = engine.init_cluster(state)

    fused = engine.round(state)
    separate = engine.correct(engine.cluster(state))
    np.testing.assert_array_equal(
        np.asarray(fused.Z_corr), np.asarray(separate.Z_corr)
    )
    np.testing.assert_array_equal(
        np.asarray(fused.objective_kmeans), np.asarray(separate.objective_kmeans)
    )
    assert int(fused.n_harmony) == int(separate.n_harmony)


def test_run_rounds_matches_host_loop():
    """engine.run_rounds (whole loop on device) == per-round host loop,
    including the early-stop behaviour of the convergence test."""
    import jax
    import jax.numpy as jnp

    from harmony_tpu.config import harmony_options
    from harmony_tpu.engine import make_engine
    from harmony_tpu.preprocess import (
        build_design, expand_hyperparams, orient_embedding, resolve_config,
    )
    from harmony_tpu.state import init_state

    Z, meta = make_synthetic(None, n_cells=240, d=8, seed=5)
    options = harmony_options()
    design = build_design(meta, ["dataset"])
    Zt = orient_embedding(Z, 240)
    cfg = resolve_config(
        n_cells=240, d=8, design=design, nclust=10, max_iter=6,
        early_stop=True, options=options, verbose=False,
    )
    hp = expand_hyperparams(design, cfg.K, None, 0.1, 1.0, options.tau)
    state = init_state(
        cfg, Zt, design, hp.sigma, hp.theta, hp.lamb, jax.random.PRNGKey(7)
    )
    engine = make_engine(cfg, codes=state.codes)
    state = engine.init_cluster(state)

    host = state
    for _ in range(6):
        host = engine.round(host)
        if bool(engine.harmony_converged(host)):
            break
    fused = engine.run_rounds(state, jnp.int32(6))
    assert int(fused.n_rounds) == int(host.n_rounds)
    np.testing.assert_array_equal(
        np.asarray(fused.Z_corr), np.asarray(host.Z_corr)
    )
    np.testing.assert_array_equal(
        np.asarray(fused.objective_harmony), np.asarray(host.objective_harmony)
    )
