"""Trajectory parity: JAX engine (fp32) vs the float64 NumPy oracle.

The oracle (harmony_tpu.reference_numpy) transliterates the reference C++
op-for-op. Both engines receive identical injected randomness (initial
centroids and block permutations, the only stochastic inputs —
SURVEY.md §7 'trajectory parity'), so any divergence is numerical, bounded
by fp32 accumulation-order effects.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from harmony_tpu.config import harmony_options
from harmony_tpu.driver import harmonize
from harmony_tpu.engine import make_engine
from harmony_tpu.preprocess import (
    build_design,
    expand_hyperparams,
    orient_embedding,
    resolve_config,
)
from harmony_tpu.reference_numpy import OracleHarmony
from harmony_tpu.state import init_state

import jax

from conftest import make_synthetic


def _setup(Z, meta, vars_use, nclust=8, lamb=1.0, theta=None, max_iter=3,
            options=None, seed=0, ridge_solver="cholesky"):
    options = options or harmony_options()
    design = build_design(meta, vars_use)
    N = design.n_cells
    Zt = orient_embedding(Z, N)
    cfg = resolve_config(
        n_cells=N, d=Zt.shape[0], design=design, nclust=nclust,
        max_iter=max_iter, early_stop=True, options=options, verbose=False,
        lambda_estimation=lamb is None, ridge_solver=ridge_solver,
    )
    hp = expand_hyperparams(design, cfg.K, theta, 0.1, lamb, options.tau)

    rng = np.random.default_rng(seed)
    Y0 = Zt[:, rng.choice(N, cfg.K, replace=False)]
    perms = np.stack(
        [
            np.stack([rng.permutation(N) for _ in range(cfg.max_iter_cluster)])
            for _ in range(max_iter)
        ]
    ).astype(np.int32)

    oracle = OracleHarmony(
        cfg=cfg, Z_orig=Zt, design=design,
        sigma=hp.sigma, theta=hp.theta, lamb=hp.lamb,
    )
    key = jax.random.PRNGKey(seed)
    state = init_state(cfg, Zt, design, hp.sigma, hp.theta, hp.lamb, key)
    return cfg, design, oracle, state, Y0, perms


@pytest.mark.parametrize("lamb", [1.0, None])
def test_trajectory_parity_single_covariate(lamb):
    Z, meta = make_synthetic(None, n_cells=240, d=8, seed=7)
    cfg, design, oracle, state, Y0, perms = _setup(
        Z, meta, ["dataset"], nclust=6, lamb=lamb, max_iter=3
    )

    oracle.init_cluster(Y0)
    oracle.harmonize(perms, max_iter=3)

    engine = make_engine(cfg)
    state = engine.init_cluster_from(state, jnp.asarray(Y0))
    state = harmonize(engine, state, max_iter=3, perms=perms)

    tr = state.trace_lists(cfg)
    np.testing.assert_allclose(
        tr["objective_kmeans"],
        np.array(oracle.objective_kmeans),
        rtol=2e-4,
    )
    np.testing.assert_allclose(
        tr["objective_harmony"],
        np.array(oracle.objective_harmony),
        rtol=2e-4,
    )
    np.testing.assert_array_equal(tr["kmeans_rounds"], oracle.kmeans_rounds)
    np.testing.assert_allclose(
        np.asarray(state.Z_corr), oracle.Z_corr, atol=5e-3
    )
    np.testing.assert_allclose(np.asarray(state.R), oracle.R, atol=2e-3)
    np.testing.assert_allclose(np.asarray(state.Y), oracle.Y, atol=5e-3)


def test_trajectory_parity_two_covariates():
    Z, meta = make_synthetic(None, n_cells=300, d=10, seed=11)
    cfg, design, oracle, state, Y0, perms = _setup(
        Z, meta, ["dataset", "cell_type"], nclust=5, lamb=1.0, max_iter=2,
        theta=[1.0, 1.0],
    )

    oracle.init_cluster(Y0)
    oracle.harmonize(perms, max_iter=2)

    engine = make_engine(cfg)
    state = engine.init_cluster_from(state, jnp.asarray(Y0))
    state = harmonize(engine, state, max_iter=2, perms=perms)

    tr = state.trace_lists(cfg)
    np.testing.assert_allclose(
        tr["objective_kmeans"], np.array(oracle.objective_kmeans), rtol=3e-4
    )
    np.testing.assert_allclose(
        np.asarray(state.Z_corr), oracle.Z_corr, atol=6e-3
    )


def test_parity_batch_cutoff_path():
    """Exercise the batch-filter/subset path: one batch nearly absent from a
    region so avg_R falls below the cutoff (src/harmony.cpp:368-410)."""
    rng = np.random.default_rng(3)
    n = 200
    # batch 'rare' concentrated in one corner -> absent from most clusters
    batches = np.array(["a"] * 90 + ["b"] * 90 + ["rare"] * 20)
    Z = rng.normal(size=(n, 6))
    Z[180:] += 8.0  # rare batch isolated
    meta = {"dataset": batches}
    opts = harmony_options(batch_prop_cutoff=5e-2)
    cfg, design, oracle, state, Y0, perms = _setup(
        Z, meta, ["dataset"], nclust=5, lamb=1.0, max_iter=2, options=opts
    )

    oracle.init_cluster(Y0)
    oracle.harmonize(perms, max_iter=2)

    engine = make_engine(cfg)
    state = engine.init_cluster_from(state, jnp.asarray(Y0))
    state = harmonize(engine, state, max_iter=2, perms=perms)

    np.testing.assert_allclose(
        np.asarray(state.Z_corr), oracle.Z_corr, atol=6e-3
    )
    np.testing.assert_allclose(
        state.trace_lists(cfg)["objective_kmeans"],
        np.array(oracle.objective_kmeans),
        rtol=3e-4,
    )


def test_parity_multicovariate_cutoff_path():
    """Two covariates with an aggressive cutoff: some batches drop while
    their cells stay via the other covariate (the union-of-kept-cells rule,
    src/harmony.cpp:389-402) — the hardest masking case."""
    rng = np.random.default_rng(13)
    n = 240
    Z = rng.normal(size=(n, 6))
    donors = np.array(["d1"] * 110 + ["d2"] * 110 + ["rare"] * 20)
    Z[220:] += 6.0
    batch = np.array([f"b{i%2}" for i in range(n)])
    meta = {"donor": donors, "batch": batch}
    opts = harmony_options(batch_prop_cutoff=4e-2)
    cfg, design, oracle, state, Y0, perms = _setup(
        Z, meta, ["donor", "batch"], nclust=5, lamb=1.0, max_iter=2,
        options=opts, theta=[1.0, 1.0],
    )

    oracle.init_cluster(Y0)
    oracle.harmonize(perms, max_iter=2)

    engine = make_engine(cfg)
    state = engine.init_cluster_from(state, jnp.asarray(Y0))
    state = harmonize(engine, state, max_iter=2, perms=perms)

    np.testing.assert_allclose(
        np.asarray(state.Z_corr), oracle.Z_corr, atol=6e-3
    )
    np.testing.assert_allclose(np.asarray(state.Y), oracle.Y, atol=6e-3)
    np.testing.assert_allclose(
        state.trace_lists(cfg)["objective_kmeans"],
        np.array(oracle.objective_kmeans),
        rtol=3e-4,
    )


def test_parity_three_covariates():
    """BASELINE.json config 4: three-covariate design exercises all
    cross-covariate blocks in the ridge normal matrices."""
    rng = np.random.default_rng(17)
    n = 300
    Z = rng.normal(size=(n, 8))
    meta = {
        "dataset": np.array([f"ds{i%2}" for i in range(n)]),
        "donor": np.array([f"dn{i%3}" for i in range(n)]),
        "batch_id": np.array([f"b{(i//3)%4}" for i in range(n)]),
    }
    cfg, design, oracle, state, Y0, perms = _setup(
        Z, meta, ["dataset", "donor", "batch_id"], nclust=5, lamb=1.0,
        max_iter=2, theta=[1.0, 1.0, 1.0],
    )

    oracle.init_cluster(Y0)
    oracle.harmonize(perms, max_iter=2)

    engine = make_engine(cfg)
    state = engine.init_cluster_from(state, jnp.asarray(Y0))
    state = harmonize(engine, state, max_iter=2, perms=perms)

    np.testing.assert_allclose(
        np.asarray(state.Z_corr), oracle.Z_corr, atol=6e-3
    )
    np.testing.assert_allclose(
        state.trace_lists(cfg)["objective_kmeans"],
        np.array(oracle.objective_kmeans),
        rtol=3e-4,
    )


def test_arrowhead_solver_matches_cholesky():
    Z, meta = make_synthetic(None, n_cells=240, d=8, seed=5)
    out = {}
    for solver in ("cholesky", "arrowhead", "solve"):
        cfg, design, oracle, state, Y0, perms = _setup(
            Z, meta, ["dataset"], nclust=6, lamb=1.0, max_iter=2,
            ridge_solver=solver,
        )
        engine = make_engine(cfg)
        state = engine.init_cluster_from(state, jnp.asarray(Y0))
        state = harmonize(engine, state, max_iter=2, perms=perms)
        out[solver] = np.asarray(state.Z_corr)
    np.testing.assert_allclose(out["cholesky"], out["arrowhead"], atol=2e-3)
    np.testing.assert_allclose(out["cholesky"], out["solve"], atol=2e-3)
