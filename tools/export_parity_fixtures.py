"""Export golden parity fixtures for external validation against R.

R cannot run in this environment, so trajectory parity is established
against the float64 oracle (harmony_tpu.reference_numpy). This tool makes
that claim externally checkable: it exports, for each config, the exact
inputs (embedding, covariates, expanded hyperparameters, injected initial
centroids and block permutations) plus the oracle's and the JAX engine's
per-iteration objectives and final embeddings.

To cross-check with the actual R package, load the npz in R (e.g. via
reticulate), construct the harmony module object with the same inputs,
inject Y0 via `harmonyObj$Y <- Y0` after setup, and step
`cluster_cpp`/`moe_correct_ridge_cpp` with matching permutations patched
into `update_R` — or simply compare final embeddings statistically.

Usage: python tools/export_parity_fixtures.py [outdir]
"""

import sys

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

from harmony_tpu.config import harmony_options  # noqa: E402
from harmony_tpu.datasets import cell_lines_small  # noqa: E402
from harmony_tpu.driver import harmonize  # noqa: E402
from harmony_tpu.engine import make_engine  # noqa: E402
from harmony_tpu.preprocess import (  # noqa: E402
    build_design,
    expand_hyperparams,
    orient_embedding,
    resolve_config,
)
from harmony_tpu.reference_numpy import OracleHarmony  # noqa: E402
from harmony_tpu.state import init_state  # noqa: E402


def _threecov_dataset():
    """Synthetic BASELINE config-4 analog: c('dataset','donor','batch_id')
    — exercises the multi-level Phi / cross-covariate ridge blocks."""
    rng = np.random.default_rng(7)
    n, d = 400, 12
    types = rng.integers(0, 4, n)
    dataset = rng.integers(0, 2, n)
    donor = rng.integers(0, 3, n)
    batch_id = rng.integers(0, 4, n)
    Z = (
        (rng.normal(size=(4, d)) * 3.0)[types]
        + (rng.normal(size=(2, d)) * 1.0)[dataset]
        + (rng.normal(size=(3, d)) * 0.8)[donor]
        + (rng.normal(size=(4, d)) * 0.6)[batch_id]
        + rng.normal(size=(n, d)) * 0.5
    ) / 40.0
    meta = {
        "dataset": np.array([f"d{x}" for x in dataset]),
        "donor": np.array([f"o{x}" for x in donor]),
        "batch_id": np.array([f"b{x}" for x in batch_id]),
    }
    return Z, meta


def export(outdir: str):
    import os

    from harmony_tpu.datasets import pbmc_dataset

    os.makedirs(outdir, exist_ok=True)
    ds = cell_lines_small()
    pb = pbmc_dataset()
    Z3, meta3 = _threecov_dataset()
    configs = [
        ("cell_lines_small_default", ds.meta_data, ds.scaled_pcs,
         ["dataset"], dict(nclust=50, theta=[1.0])),
        (
            "cell_lines_small_twocov", ds.meta_data, ds.scaled_pcs,
            ["dataset", "cell_type"],
            dict(nclust=20, theta=[1.0, 1.0]),
        ),
        # BASELINE configs 3-4: the pbmc_stim integration pipeline and a
        # three-covariate design (VERDICT r2 #4)
        ("pbmc_stim_default", pb.meta_data, pb.scaled_pcs,
         ["stim"], dict(nclust=30, theta=[2.0])),
        ("synthetic_threecov", meta3, Z3,
         ["dataset", "donor", "batch_id"],
         dict(nclust=10, theta=[2.0, 2.0, 2.0])),
    ]
    for name, meta_data, pcs, vars_use, kw in configs:
        options = harmony_options(max_iter_cluster=10)
        design = build_design(meta_data, vars_use)
        N = design.n_cells
        Zt = orient_embedding(pcs, N)
        cfg = resolve_config(
            n_cells=N, d=Zt.shape[0], design=design, nclust=kw["nclust"],
            max_iter=5, early_stop=True, options=options, verbose=False,
        )
        hp = expand_hyperparams(
            design, cfg.K, kw["theta"], 0.1, 1.0, options.tau
        )
        rng = np.random.default_rng(0)
        Y0 = Zt[:, rng.choice(N, cfg.K, replace=False)]
        perms = np.stack(
            [
                np.stack(
                    [rng.permutation(N) for _ in range(cfg.max_iter_cluster)]
                )
                for _ in range(5)
            ]
        ).astype(np.int32)

        oracle = OracleHarmony(
            cfg=cfg, Z_orig=Zt, design=design, sigma=hp.sigma,
            theta=hp.theta, lamb=hp.lamb,
        )
        oracle.init_cluster(Y0)
        oracle.harmonize(perms, max_iter=5)

        state = init_state(
            cfg, Zt, design, hp.sigma, hp.theta, hp.lamb, jax.random.PRNGKey(0)
        )
        engine = make_engine(cfg)
        state = engine.init_cluster_from(state, jnp.asarray(Y0))
        state = harmonize(engine, state, max_iter=5, perms=perms)
        tr = state.trace_lists(cfg)

        path = os.path.join(outdir, f"{name}.npz")
        np.savez_compressed(
            path,
            Z=Zt,
            codes=design.codes,
            vars_use=np.array(vars_use),
            sigma=hp.sigma, theta=hp.theta, lamb=hp.lamb,
            Y0=Y0, perms=perms,
            nclust=cfg.K, max_iter=5,
            max_iter_cluster=cfg.max_iter_cluster,
            oracle_objective_kmeans=np.array(oracle.objective_kmeans),
            oracle_objective_harmony=np.array(oracle.objective_harmony),
            oracle_Z_corr=oracle.Z_corr,
            engine_objective_kmeans=tr["objective_kmeans"],
            engine_objective_harmony=tr["objective_harmony"],
            engine_Z_corr=np.asarray(state.Z_corr),
        )
        err = np.abs(np.asarray(state.Z_corr) - oracle.Z_corr).max()
        print(f"{name}: wrote {path}  max|engine - oracle| = {err:.2e}")


if __name__ == "__main__":
    export(sys.argv[1] if len(sys.argv) > 1 else "parity_fixtures")
