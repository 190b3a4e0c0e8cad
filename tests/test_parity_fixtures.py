"""Vendored golden parity fixtures (tools/export_parity_fixtures.py).

The fixtures pin exact inputs (embedding, codes, hyperparameters, injected
centroids and per-round permutations) together with the fp64 oracle's and
the engine's trajectories on the reference's own cell_lines_small data.
Two purposes:

* **Regression pin**: the engine must keep reproducing the vendored
  golden trajectory — a silent semantic change in any default-path kernel
  fails here even if it also changes the same-author oracle.
* **External checkability**: the npz carries everything an R session
  needs to replay the run against the actual reference package
  (see the exporter's docstring for the recipe).
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

_FIXDIR = os.path.join(os.path.dirname(__file__), "fixtures", "parity")
_NAMES = [
    "cell_lines_small_default",
    "cell_lines_small_twocov",
    # BASELINE configs 3-4 (VERDICT r2 #4): the pbmc_stim integration
    # pipeline (datasets.pbmc_dataset) and a three-covariate design
    "pbmc_stim_default",
    "synthetic_threecov",
]


@pytest.mark.parametrize("name", _NAMES)
def test_engine_reproduces_vendored_golden(name):
    import dataclasses

    from harmony_tpu.config import harmony_options
    from harmony_tpu.driver import harmonize
    from harmony_tpu.engine import make_engine
    from harmony_tpu.preprocess import DesignMatrix, resolve_config
    from harmony_tpu.state import init_state

    z = np.load(os.path.join(_FIXDIR, f"{name}.npz"), allow_pickle=False)
    codes = z["codes"]
    ncov, N = codes.shape
    levels = [np.unique(codes[c]) for c in range(ncov)]
    design = DesignMatrix(
        codes=codes.astype(np.int32),
        levels=[np.arange(len(l)) for l in levels],
        names=[str(v) for v in z["vars_use"]],
    )
    options = harmony_options(max_iter_cluster=int(z["max_iter_cluster"]))
    cfg = resolve_config(
        n_cells=N, d=z["Z"].shape[0], design=design,
        nclust=int(z["nclust"]), max_iter=int(z["max_iter"]),
        early_stop=True, options=options, verbose=False,
    )
    state = init_state(
        cfg, z["Z"], design, z["sigma"], z["theta"], z["lamb"],
        jax.random.PRNGKey(0),
    )
    engine = make_engine(cfg)
    state = engine.init_cluster_from(state, jnp.asarray(z["Y0"]))
    state = harmonize(engine, state, max_iter=int(z["max_iter"]),
                      perms=z["perms"])

    tr = state.trace_lists(cfg)
    np.testing.assert_allclose(
        tr["objective_kmeans"], z["engine_objective_kmeans"], rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(state.Z_corr), z["engine_Z_corr"], atol=1e-5
    )
    # and the golden engine trajectory itself still matches the fp64
    # oracle trajectory recorded alongside it
    np.testing.assert_allclose(
        np.asarray(state.Z_corr), z["oracle_Z_corr"], atol=1e-4
    )
    np.testing.assert_allclose(
        tr["objective_harmony"], z["oracle_objective_harmony"], rtol=1e-5
    )
