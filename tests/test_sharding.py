"""Multi-device sharding tests on the 8-device virtual CPU mesh.

The reference has no distributed execution (SURVEY.md §2.3); the contract
for the TPU rebuild is shard-count invariance: the cell-sharded engine must
produce the same R/E/O/Y/Z_corr (up to reduction-order fp noise) as the
single-device run.
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
from harmony_tpu.sharding import make_mesh, shard_state, state_shardings
from harmony_tpu.state import init_state

from conftest import make_synthetic


def _setup(n_cells=320, d=8, nclust=6, max_iter=2, seed=0):
    Z, meta = make_synthetic(None, n_cells=n_cells, d=d, seed=seed)
    options = harmony_options()
    design = build_design(meta, ["dataset"])
    Zt = orient_embedding(Z, n_cells)
    cfg = resolve_config(
        n_cells=n_cells, d=d, design=design, nclust=nclust, max_iter=max_iter,
        early_stop=True, options=options, verbose=False,
    )
    hp = expand_hyperparams(design, cfg.K, None, 0.1, 1.0, options.tau)
    rng = np.random.default_rng(seed)
    Y0 = Zt[:, rng.choice(n_cells, cfg.K, replace=False)]
    perms = np.stack(
        [
            np.stack([rng.permutation(n_cells) for _ in range(cfg.max_iter_cluster)])
            for _ in range(max_iter)
        ]
    ).astype(np.int32)
    key = jax.random.PRNGKey(seed)
    state = init_state(cfg, Zt, design, hp.sigma, hp.theta, hp.lamb, key)
    return cfg, state, Y0, perms


def test_eight_virtual_devices_present():
    assert jax.device_count() == 8


def _run(cfg, state, Y0, perms, mesh=None, max_iter=2):
    engine = make_engine(cfg)
    if mesh is not None:
        state = shard_state(state, mesh)
    state = engine.init_cluster_from(state, jnp.asarray(Y0))
    state = harmonize(engine, state, max_iter=max_iter, perms=perms)
    return state


def test_shard_count_invariance():
    cfg, state, Y0, perms = _setup()
    ref = _run(cfg, state, Y0, perms, mesh=None)

    mesh = make_mesh(8)
    shd = _run(cfg, state, Y0, perms, mesh=mesh)

    np.testing.assert_allclose(
        np.asarray(shd.Z_corr), np.asarray(ref.Z_corr), atol=2e-4
    )
    np.testing.assert_allclose(np.asarray(shd.R), np.asarray(ref.R), atol=2e-4)
    np.testing.assert_allclose(np.asarray(shd.Y), np.asarray(ref.Y), atol=2e-4)
    np.testing.assert_allclose(np.asarray(shd.O), np.asarray(ref.O), atol=2e-3)
    np.testing.assert_allclose(
        shd.trace_lists(cfg)["objective_kmeans"],
        ref.trace_lists(cfg)["objective_kmeans"],
        rtol=1e-4,
    )


def test_sharded_state_layout():
    cfg, state, Y0, perms = _setup()
    mesh = make_mesh(8)
    sstate = shard_state(state, mesh)
    shardings = state_shardings(mesh)
    # cells axis is actually distributed
    assert sstate.R.sharding == shardings.R
    assert sstate.Z_corr.sharding == shardings.Z_corr
    assert sstate.O.sharding.is_fully_replicated
    n_local = {d.id for s in sstate.R.addressable_shards for d in [s.device]}
    assert len(n_local) == 8


def test_uneven_shard_count_padded():
    """N not divisible by the mesh size: pad cells must be inert and the
    logical result identical to the unpadded single-device run."""
    from harmony_tpu.sharding import pad_for_mesh
    from harmony_tpu.state import init_state
    import dataclasses as dc

    Z, meta = make_synthetic(None, n_cells=301, d=8, seed=3)
    options = harmony_options()
    design = build_design(meta, ["dataset"])
    Zt = orient_embedding(Z, 301)
    cfg = resolve_config(
        n_cells=301, d=8, design=design, nclust=5, max_iter=1,
        early_stop=True, options=options, verbose=False,
    )
    hp = expand_hyperparams(design, cfg.K, None, 0.1, 1.0, options.tau)
    rng = np.random.default_rng(3)
    Y0 = Zt[:, rng.choice(301, cfg.K, replace=False)]
    perms = np.stack(
        [np.stack([rng.permutation(301) for _ in range(cfg.max_iter_cluster)])]
    ).astype(np.int32)
    key = jax.random.PRNGKey(3)

    ref_state = init_state(cfg, Zt, design, hp.sigma, hp.theta, hp.lamb, key)
    ref = _run(cfg, ref_state, Y0, perms, mesh=None, max_iter=1)

    mesh = make_mesh(8)
    cfg_p = pad_for_mesh(cfg, mesh)
    assert cfg_p.Np == 304 and cfg_p.N == 301
    pad_state = init_state(cfg_p, Zt, design, hp.sigma, hp.theta, hp.lamb, key)
    pad_state = shard_state(pad_state, mesh)
    engine = make_engine(cfg_p)
    pad_state = engine.init_cluster_from(pad_state, jnp.asarray(Y0))
    pad_state = harmonize(engine, pad_state, max_iter=1, perms=perms)

    np.testing.assert_allclose(
        np.asarray(pad_state.Z_corr)[:, :301],
        np.asarray(ref.Z_corr),
        atol=2e-4,
    )
    np.testing.assert_allclose(
        np.asarray(pad_state.R)[:, :301], np.asarray(ref.R), atol=2e-4
    )
    # pad columns are exactly inert
    assert np.all(np.asarray(pad_state.R)[:, 301:] == 0)
    np.testing.assert_allclose(
        np.asarray(pad_state.O), np.asarray(ref.O), atol=2e-3
    )
    np.testing.assert_allclose(
        pad_state.trace_lists(cfg_p)["objective_kmeans"],
        ref.trace_lists(cfg)["objective_kmeans"],
        rtol=1e-4,
    )


def test_run_harmony_mesh_auto():
    from harmony_tpu import run_harmony

    Z, meta = make_synthetic(None, n_cells=205, d=6, seed=9)
    out_1 = run_harmony(Z, meta, ["dataset"], nclust=5, max_iter=2, seed=0)
    out_8 = run_harmony(
        Z, meta, ["dataset"], nclust=5, max_iter=2, seed=0, mesh="auto"
    )
    assert out_8.shape == (205, 6)
    np.testing.assert_allclose(out_1, out_8, atol=5e-4)
