"""Sharded Pallas rotate E-step (shard_map wrappers) on the virtual CPU mesh.

The sharded schedule runs the reference's block structure per shard with one
E/O psum per round (ops/pallas_rotate.py sharded_* docstrings); on a
1-device mesh it must reproduce the local kernels exactly, and on a real
mesh it must converge to the same quality as the single-device schedule.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from harmony_tpu.config import HarmonyConfig, finalize_engine_config
from harmony_tpu import ops
from harmony_tpu.ops.normalize import l2_normalize_columns
from harmony_tpu.sharding import make_mesh, shard_state


def _problem(N=2048, d=8, K=5, B_vec=(3,), seed=0, n_shards=1):
    rng = np.random.default_rng(seed)
    cfg = HarmonyConfig(
        N=N, d=d, K=K, B=sum(B_vec), B_vec=B_vec,
        shuffle_mode="rotate", estep_impl="pallas", block_size=0.25,
    )
    mesh = make_mesh(n_shards) if n_shards > 1 else None
    cfg = finalize_engine_config(cfg, mesh)
    Np = cfg.Np
    Z = np.zeros((d, Np), np.float32)
    Z[:, :N] = rng.normal(size=(d, N))
    Z = np.asarray(l2_normalize_columns(jnp.asarray(Z)))
    Y = np.asarray(
        l2_normalize_columns(jnp.asarray(rng.normal(size=(d, K)), jnp.float32))
    )
    codes = np.zeros((len(B_vec), Np), np.int32)
    for c, b in enumerate(B_vec):
        codes[c, :N] = rng.integers(0, b, N)
    counts = np.concatenate(
        [np.bincount(codes[c, :N], minlength=b) for c, b in enumerate(B_vec)]
    )
    Pr_b = (counts / N).astype(np.float32)
    sigma = np.full(K, 0.1, np.float32)
    theta = np.full(cfg.B, 1.0, np.float32)
    return cfg, mesh, jnp.asarray(Z), jnp.asarray(Y), jnp.asarray(
        codes
    ), jnp.asarray(Pr_b), jnp.asarray(sigma), jnp.asarray(theta)


def test_single_shard_matches_local_kernels():
    """mesh.size == 1: the shard_map wrappers are the local kernels plus
    identity psums, with the shard key = fold_in(key, 0)."""
    from harmony_tpu.ops.pallas_rotate import (
        CodesLayout, RoundState, make_codes_pad, pad_cells_to_tile,
        pallas_reassign, pallas_rotate_update_round_v2,
        sharded_reassign, sharded_rotate_round_v2,
    )

    cfg, _, Z, Y, codes, Pr_b, sigma, theta, = _problem()
    mesh = make_mesh(1)
    codes_pad = make_codes_pad(cfg, codes)
    Z_raw = pad_cells_to_tile(cfg, Z).astype(jnp.float32)

    loc = pallas_reassign(cfg, Y, sigma, Pr_b, Z_raw, codes_pad,
                          interpret=True)
    shd = sharded_reassign(cfg, mesh, Y, sigma, Pr_b, Z_raw, codes_pad,
                           interpret=True)
    for a, b in zip(loc, shd):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    Zn_pad, tile_O, O, E = loc
    key = jax.random.PRNGKey(7)
    layout = CodesLayout(Z_pad=Zn_pad, codes_pad=codes_pad)
    K, Npt = cfg.K, Zn_pad.shape[1]
    R0 = jnp.zeros((K, Npt), jnp.float32)
    rs = RoundState(R=R0, E=E, O=O, tile_O=tile_O,
                    kmeans_error=jnp.float32(0), entropy=jnp.float32(0))

    res_loc = pallas_rotate_update_round_v2(
        cfg, Zn_pad, Y, rs, Pr_b, sigma, theta,
        jax.random.fold_in(key, 0), layout=layout, interpret=True,
    )
    res_shd = sharded_rotate_round_v2(
        cfg, mesh, Y, rs, Pr_b, sigma, theta, key, layout=layout,
        interpret=True,
    )
    for f in ("R", "E", "O", "tile_O"):
        np.testing.assert_allclose(
            np.asarray(getattr(res_loc, f)), np.asarray(getattr(res_shd, f)),
            atol=1e-5,
        )
    np.testing.assert_allclose(
        float(res_loc.kmeans_error), float(res_shd.kmeans_error), rtol=1e-5
    )
    np.testing.assert_allclose(
        float(res_loc.entropy), float(res_shd.entropy), rtol=1e-5
    )


def test_sharded_cluster_stats_consistent():
    """A full sharded cluster phase keeps the E/O/R invariants: R columns
    are simplex-valid, O recomputes from (R, codes), E from (R, Pr_b)."""
    from harmony_tpu.engine import make_engine
    from harmony_tpu.state import init_state
    from harmony_tpu.preprocess import DesignMatrix

    cfg, mesh, Z, Y, codes, Pr_b, sigma, theta = _problem(n_shards=4)
    assert mesh is not None and cfg.estep_impl == "pallas"

    state = init_state(
        cfg, np.asarray(Z[:, : cfg.N]),
        DesignMatrix(
            codes=np.asarray(codes[:, : cfg.N]),
            levels=[np.arange(b) for b in cfg.B_vec],
            names=["dataset"],
        ),
        np.asarray(sigma), np.asarray(theta),
        np.full(cfg.B + 1, 1.0, np.float32), jax.random.PRNGKey(0),
    )
    state = shard_state(state, mesh)
    engine = make_engine(cfg, codes=state.codes, mesh=mesh)
    state = engine.init_cluster(state)
    state = engine.cluster(state)

    R = np.asarray(state.R)
    n = cfg.N
    np.testing.assert_allclose(R[:, :n].sum(axis=0), 1.0, atol=1e-4)
    assert np.all(R[:, n:] == 0)
    O_ref = np.zeros((cfg.K, cfg.B), np.float32)
    codes_np = np.asarray(state.codes)
    for c, off in enumerate(cfg.covariate_offsets):
        for lvl in range(cfg.B_vec[c]):
            m = codes_np[c] == lvl
            O_ref[:, off + lvl] = R[:, m].sum(axis=1)
    np.testing.assert_allclose(np.asarray(state.O), O_ref, atol=2e-2)
    E_ref = R.sum(axis=1, keepdims=True) * np.asarray(state.Pr_b)[None, :]
    np.testing.assert_allclose(np.asarray(state.E), E_ref, atol=2e-2)


def _tiled_problem(N=8192, d=8, K=5, B=3, n_shards=4, seed=0,
                   virtual=False):
    """A batch-tiled-ingest state ready for sharded fast-path phases."""
    from harmony_tpu.config import harmony_options
    from harmony_tpu.engine import make_engine
    from harmony_tpu.ops.tiled import (
        build_batch_tiled_order, detect_tiled_layout,
    )
    from harmony_tpu.preprocess import (
        build_design, expand_hyperparams, orient_embedding, resolve_config,
    )
    from harmony_tpu.state import init_state

    rng = np.random.default_rng(seed)
    batches = rng.integers(0, B, N)
    Z = rng.normal(size=(N, d)).astype(np.float32)
    design = build_design({"dataset": batches}, ["dataset"])
    options = harmony_options(block_size=0.25)
    cfg = resolve_config(
        n_cells=N, d=d, design=design, nclust=K, max_iter=3,
        early_stop=False, options=options, verbose=False,
    )
    cfg = dataclasses.replace(
        cfg, shuffle_mode="rotate", estep_impl="pallas",
        estep_sub_tile=512, mstep_tile=128, mstep_mode="tiled",
        virtual_r=virtual,
    )
    perm, _ = build_batch_tiled_order(design.codes, 128, seed=0)
    Zt = orient_embedding(Z, N)[:, perm]
    design = dataclasses.replace(design, codes=design.codes[:, perm])
    hp = expand_hyperparams(design, cfg.K, None, 0.1, 1.0, options.tau)
    state = init_state(
        cfg, Zt, design, hp.sigma, hp.theta, hp.lamb, jax.random.PRNGKey(3)
    )
    tiled = detect_tiled_layout(np.asarray(state.codes), cfg.N, 128)
    assert tiled is not None
    mesh = make_mesh(n_shards)
    return cfg, mesh, state, tiled


class TestShardedTiledMStep:
    """The batch-tiled M-step fast path under a cells mesh (VERDICT r1 #1):
    per-shard streaming kernels + one psum of the joint moment table must
    reproduce the single-device tiled path on identical inputs."""

    def test_sharded_correct_matches_unsharded(self):
        from harmony_tpu.engine import cluster, correct

        cfg, mesh, state, tiled = _tiled_problem()
        from harmony_tpu.engine import make_engine

        engine = make_engine(cfg, codes=state.codes)
        state = engine.init_cluster(state)
        # one single-device cluster phase fixes (R, E, O) for both sides
        st = jax.jit(lambda s: cluster(cfg, s, tiled=tiled))(state)

        out_1 = jax.jit(lambda s: correct(cfg, s, tiled=tiled))(st)
        out_m = jax.jit(
            lambda s: correct(cfg, s, tiled=tiled, mesh=mesh)
        )(st)
        # per-shard partial sums + psum reorder the fp32 moment
        # accumulation; the ridge solve amplifies ~1e-5-relative W drift
        # into ~1e-4-absolute Z_corr differences (same as the fused-vs-
        # separate moment tolerance in test_tiled.py)
        np.testing.assert_allclose(
            np.asarray(out_m.Z_corr), np.asarray(out_1.Z_corr), atol=5e-4
        )
        np.testing.assert_allclose(
            np.asarray(out_m.Y), np.asarray(out_1.Y), atol=2e-4
        )

    def test_sharded_moment_fusion_matches_separate(self):
        """The moment table fused into the sharded final round (per-shard
        accumulation + psum) equals the separate streaming pass over the
        round's written R."""
        from harmony_tpu.engine import cluster
        from harmony_tpu.ops.pallas_ridge import pallas_tile_moments
        from harmony_tpu.engine import make_engine

        cfg, mesh, state, tiled = _tiled_problem()
        engine = make_engine(cfg, codes=state.codes, mesh=mesh)
        state = engine.init_cluster(state)
        from harmony_tpu.sharding import shard_state

        state = shard_state(state, mesh)
        st, M = jax.jit(
            lambda s: cluster(
                cfg, s, mesh=mesh, tiled=tiled, return_moments=True
            )
        )(state)
        assert M is not None, "sharded fusion gate did not activate"
        n_joint = tiled.joint_codes.shape[1]
        M_sep = pallas_tile_moments(
            cfg, jnp.asarray(np.asarray(st.R), jnp.float32),
            jnp.asarray(np.asarray(st.Z_orig), jnp.float32),
            tiled.tile, jnp.asarray(tiled.tile_joint), n_joint,
            interpret=True,
        )
        np.testing.assert_allclose(
            np.asarray(M), np.asarray(M_sep), rtol=1e-5, atol=1e-4
        )

    def test_sharded_virtual_matches_materialized(self):
        """Sharded virtual R reproduces the sharded materialised run: same
        PRNG path -> same per-shard schedules -> identical trajectories,
        and the run-end materialised R equals the round-written R."""
        from harmony_tpu.engine import make_engine
        from harmony_tpu.sharding import shard_state

        out = {}
        for virtual in (False, True):
            cfg, mesh, state, tiled = _tiled_problem(virtual=virtual)
            engine = make_engine(cfg, codes=state.codes, mesh=mesh)
            state = shard_state(state, mesh)
            state = engine.init_cluster(state)
            state = engine.run_rounds(state, jnp.int32(3))
            if virtual:
                assert state.virt_pen is not None, (
                    "sharded virtual gate did not fire"
                )
                state = engine.materialize_r(state)
            out[virtual] = state

        np.testing.assert_allclose(
            np.asarray(out[True].Z_corr), np.asarray(out[False].Z_corr),
            atol=2e-4,
        )
        np.testing.assert_allclose(
            np.asarray(out[True].objective_harmony),
            np.asarray(out[False].objective_harmony), rtol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(out[True].R), np.asarray(out[False].R), atol=1e-6
        )


def test_sharded_run_matches_single_device_quality():
    """End-to-end rotate+pallas run on a 4-device mesh converges to the
    same objective as the unsharded schedule (different stochastic order
    of the same process -> equal quality, not equal trajectory)."""
    from harmony_tpu.api import run_harmony
    from harmony_tpu.config import harmony_options

    rng = np.random.default_rng(0)
    n, d, nb = 2048, 10, 3
    batches = rng.integers(0, nb, n)
    Z = (rng.normal(size=(nb, d)) * 0.8)[batches] + rng.normal(size=(n, d))
    meta = {"dataset": np.array([f"b{i}" for i in batches])}

    def separation(emb):
        E = emb / np.linalg.norm(emb, axis=1, keepdims=True)
        cents = np.stack([E[batches == b].mean(0) for b in range(nb)])
        return float(
            np.mean([np.linalg.norm(a - c) for i, a in enumerate(cents)
                     for c in cents[i + 1:]])
        )

    sep0 = separation(Z)
    out = {}
    for name, mesh in (("single", None), ("mesh", make_mesh(4))):
        res = run_harmony(
            Z, meta, ["dataset"], nclust=8, max_iter=5, seed=0,
            shuffle_mode="rotate", estep_impl="pallas",
            options=harmony_options(block_size=0.25),
            mesh=mesh, return_object=True,
        )
        emb = res.embeddings
        assert np.all(np.isfinite(emb)) and emb.shape == (n, d)
        # batch effect actually removed (not just a passthrough)
        assert separation(emb) < 0.7 * sep0
        oh = np.asarray(res.objective_harmony)
        out[name] = oh[oh != 0]
    # same converged quality (different stochastic order, equal process)
    np.testing.assert_allclose(out["mesh"][-1], out["single"][-1], rtol=0.05)
