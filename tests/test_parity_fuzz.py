"""Randomized trajectory-parity sweep vs the float64 oracle.

Draws random small problems across the config space (covariate counts,
level counts, K, block sizes, lambda modes, cutoffs, theta) and checks the
fp32 engine tracks the oracle on shared injected randomness. Catches
interaction bugs no hand-written case covers.
"""

import numpy as np
import pytest

import jax
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


@pytest.mark.parametrize("trial", range(8))
def test_random_config_parity(trial):
    rng = np.random.default_rng(1000 + trial)
    N = int(rng.integers(60, 400))
    d = int(rng.integers(3, 16))
    ncov = int(rng.integers(1, 4))
    B_vec = [int(rng.integers(2, 6)) for _ in range(ncov)]
    K = int(rng.integers(2, 12))
    lamb = None if rng.random() < 0.3 else float(rng.uniform(0.1, 3.0))
    theta = [float(rng.uniform(0.0, 3.0)) for _ in range(ncov)]
    sigma = float(rng.uniform(0.05, 0.4))
    block_size = float(rng.choice([0.05, 0.1, 0.3, 0.7]))
    cutoff = float(rng.choice([1e-5, 1e-3, 2e-2]))
    tau = float(rng.choice([0.0, 5.0]))
    max_iter = 2

    Z = rng.normal(size=(N, d)) * rng.uniform(0.5, 3.0)
    meta = {
        f"cov{c}": rng.integers(0, B_vec[c], N).astype(str)
        for c in range(ncov)
    }
    # ensure every level appears
    for c in range(ncov):
        meta[f"cov{c}"][: B_vec[c]] = np.arange(B_vec[c]).astype(str)

    options = harmony_options(
        block_size=block_size, batch_prop_cutoff=cutoff, tau=tau
    )
    design = build_design(meta, list(meta))
    Zt = orient_embedding(Z, N)
    cfg = resolve_config(
        n_cells=N, d=d, design=design, nclust=K, max_iter=max_iter,
        early_stop=True, options=options, verbose=False,
        lambda_estimation=lamb is None,
    )
    hp = expand_hyperparams(design, cfg.K, theta, sigma, lamb, tau)

    Y0 = Zt[:, rng.choice(N, cfg.K, replace=False)]
    perms = np.stack(
        [
            np.stack([rng.permutation(N) for _ in range(cfg.max_iter_cluster)])
            for _ in range(max_iter)
        ]
    ).astype(np.int32)

    oracle = OracleHarmony(
        cfg=cfg, Z_orig=Zt, design=design, sigma=hp.sigma, theta=hp.theta,
        lamb=hp.lamb,
    )
    oracle.init_cluster(Y0)
    oracle.harmonize(perms, max_iter=max_iter)

    state = init_state(
        cfg, Zt, design, hp.sigma, hp.theta, hp.lamb, jax.random.PRNGKey(0)
    )
    engine = make_engine(cfg)
    state = engine.init_cluster_from(state, jnp.asarray(Y0))
    state = harmonize(engine, state, max_iter=max_iter, perms=perms)

    scale = max(1.0, float(np.abs(oracle.Z_corr).max()))
    np.testing.assert_allclose(
        np.asarray(state.Z_corr),
        oracle.Z_corr,
        atol=5e-4 * scale,
        err_msg=f"trial {trial}: N={N} d={d} B_vec={B_vec} K={K} "
        f"lamb={lamb} bs={block_size} cutoff={cutoff}",
    )
    np.testing.assert_allclose(
        state.trace_lists(cfg)["objective_kmeans"],
        np.array(oracle.objective_kmeans),
        rtol=3e-3,
    )
