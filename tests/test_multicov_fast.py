"""Multi-covariate fast path: batch-tiled moment fusion, run-sum stats and
virtual R with n_covariates > 1 (VERDICT r2 #3).

The reference treats two-covariate runs as first-class
(/root/reference/tests/testthat/test_two_variable.R:5-25, subsetting
machinery /root/reference/src/harmony.cpp:440-547). Joint-batch-pure tiles
make every covariate's batch structure constant per tile, so the same
zero-gather kernels serve any covariate count; these tests pin the
equivalences that argument rests on.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from harmony_tpu import ops
from harmony_tpu.config import harmony_options
from harmony_tpu.engine import cluster, correct, make_engine
from harmony_tpu.ops.ridge import moe_correct_ridge
from harmony_tpu.ops.tiled import build_batch_tiled_order, detect_tiled_layout
from harmony_tpu.preprocess import (
    build_design, expand_hyperparams, orient_embedding, resolve_config,
)
from harmony_tpu.state import init_state

from test_tiled import _ridge_problem


class TestTwoCovCutoff:
    """The union cell mask (a cell is kept iff ANY of its batches is kept,
    src/harmony.cpp:389-402) must be reproduced by the fast branch's
    joint-level masking — without materialising a (K, N) cell mask."""

    def _dropped_problem(self, kill, seed=7):
        cfg, layout, Z, R, O, E, codes, counts, lamb, Y = _ridge_problem(
            N=4000, d=6, K=7, B_vec=(2, 3), T=128, seed=seed
        )
        cfg = dataclasses.replace(cfg, batch_prop_cutoff=0.02)
        R = R.at[0].set(jnp.where(kill(codes), 1e-7, R[0]))
        O = ops.compute_O(R, codes, cfg.covariate_offsets, cfg.B)
        return cfg, layout, Z, R, O, E, codes, counts, lamb, Y

    def _assert_tiled_matches_dense(self, prob):
        cfg, layout, Z, R, O, E, codes, counts, lamb, Y = prob
        Zc_d, Y_d, W_d = jax.jit(
            lambda *a: moe_correct_ridge(cfg, *a)
        )(Z, R, O, E, codes, counts, lamb, Y)
        Zc_t, Y_t, W_t = jax.jit(
            lambda *a: moe_correct_ridge(cfg, *a, tiled=layout)
        )(Z, R, O, E, codes, counts, lamb, Y)
        np.testing.assert_allclose(
            np.asarray(Zc_t), np.asarray(Zc_d), rtol=2e-4, atol=2e-4
        )
        np.testing.assert_allclose(
            np.asarray(W_t), np.asarray(W_d), rtol=2e-4, atol=2e-4
        )
        return W_d

    def test_union_kept_cells(self):
        """Covariate-1 level 0 drops below the cutoff in cluster 0, but
        those cells' covariate-0 batches stay: the cells remain in the
        intercept moments through the union mask."""
        prob = self._dropped_problem(lambda codes: codes[1] == 0)
        keep, _ = ops.ridge.compute_masks(prob[0], prob[4], prob[7])
        keep = np.asarray(keep)
        assert not keep[0, 2], "setup: cov-1 level 0 should be dropped"
        assert keep[0, :2].all(), "setup: cov-0 levels should survive"
        W = self._assert_tiled_matches_dense(prob)
        # dropped batch's beta row is exactly zero (masking exactness)
        assert np.abs(np.asarray(W)[0, 1 + 2, :]).max() == 0.0

    def test_whole_covariate_inactive(self):
        """Covariate 0 keeps <2 levels in cluster 0 -> its whole block is
        dropped (src/harmony.cpp:368-410) while covariate 1 still
        corrects."""
        prob = self._dropped_problem(lambda codes: codes[0] == 0)
        keep, _ = ops.ridge.compute_masks(prob[0], prob[4], prob[7])
        keep = np.asarray(keep)
        assert not keep[0, :2].any(), "setup: covariate 0 should deactivate"
        self._assert_tiled_matches_dense(prob)


def _engine_problem(B_vec, N=4096, d=8, seed=7, virtual=False,
                    variant=None):
    rng = np.random.default_rng(seed)
    meta = {
        f"v{c}": rng.integers(0, b, N).astype(np.int32)
        for c, b in enumerate(B_vec)
    }
    Z = rng.normal(size=(N, d)).astype(np.float32)
    design = build_design(meta, list(meta))
    options = harmony_options()
    cfg = resolve_config(
        n_cells=N, d=d, design=design, nclust=8, max_iter=3,
        early_stop=False, options=options, verbose=False,
    )
    overrides = dict(
        shuffle_mode="rotate", estep_impl="pallas",
        estep_sub_tile=512, mstep_tile=128, mstep_mode="tiled",
        virtual_r=virtual,
    )
    if variant:
        overrides["estep_variant"] = variant
    cfg = dataclasses.replace(cfg, **overrides)
    perm, _ = build_batch_tiled_order(design.codes, 128, seed=0)
    Zt = orient_embedding(Z, N)[:, perm]
    design = dataclasses.replace(design, codes=design.codes[:, perm])
    hp = expand_hyperparams(design, cfg.K, None, 0.1, 1.0, options.tau)
    state = init_state(
        cfg, Zt, design, hp.sigma, hp.theta, hp.lamb, jax.random.PRNGKey(5)
    )
    tiled = detect_tiled_layout(np.asarray(state.codes), cfg.N, 128)
    assert tiled is not None
    assert tiled.joint_codes.shape == (len(B_vec), np.prod(B_vec))
    return cfg, state, tiled


def test_twocov_fused_moments_match_separate_pass():
    """Final-round moment fusion with two covariates: the in-kernel joint
    table must reproduce the separate streaming moments pass."""
    cfg, state, tiled = _engine_problem((2, 3))
    engine = make_engine(cfg, codes=state.codes)
    state = engine.init_cluster(state)
    st, M = cluster(cfg, state, tiled=tiled, return_moments=True)
    assert M is not None, "two-covariate fusion gate did not activate"
    out_fused = correct(cfg, st, tiled=tiled, tiled_moments=M)
    out_sep = correct(cfg, st, tiled=tiled, tiled_moments=None)
    np.testing.assert_allclose(
        np.asarray(out_fused.Z_corr), np.asarray(out_sep.Z_corr), atol=2e-4,
    )
    np.testing.assert_allclose(
        np.asarray(out_fused.Y), np.asarray(out_sep.Y), atol=2e-4,
    )


@pytest.mark.parametrize(
    "B_vec,variant",
    [((2, 3), "fused_vpu"), ((2, 3), "legacy"), ((2, 2, 3), "fused_vpu")],
)
def test_multicov_virtual_matches_materialized(B_vec, variant):
    """virtual_r=True with >1 covariate reproduces the materialised run:
    same Z_corr trajectory, same objectives, and the run-end materialised
    R equals the round-written R (bit-level for <=2 covariates — the
    additive two-term penalty gather is order-free)."""
    out = {}
    for virtual in (False, True):
        cfg, state, tiled = _engine_problem(
            B_vec, virtual=virtual, variant=variant
        )
        engine = make_engine(cfg, codes=state.codes)
        state = engine.init_cluster(state)
        state = engine.run_rounds(state, jnp.int32(3))
        if virtual:
            assert state.virt_pen is not None, "virtual gate did not fire"
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


def test_twocov_rotate_end_to_end_mixes_batches():
    """Whole-pipeline smoke via run_harmony: a two-covariate rotate run
    (batch-tiled ingest + fused kernels) improves chi^2 mixing over the
    input and stays finite (the property contract of
    /root/reference/tests/testthat/test_two_variable.R:27-55)."""
    from harmony_tpu import run_harmony

    rng = np.random.default_rng(3)
    N, d = 4000, 10
    b0 = rng.integers(0, 2, N)
    b1 = rng.integers(0, 3, N)
    types = rng.integers(0, 4, N)
    Z = (
        rng.normal(size=(4, d))[types] * 2.0
        + rng.normal(size=(2, d))[b0] * 0.8
        + rng.normal(size=(3, d))[b1] * 0.8
        + rng.normal(size=(N, d)) * 0.5
    )
    res = run_harmony(
        Z, {"a": b0.astype(str), "b": b1.astype(str)}, ["a", "b"],
        nclust=8, max_iter=3, shuffle_mode="rotate", return_object=True,
        seed=0, early_stop=False,
    )
    assert res.O.shape == (8, 5)  # levels stack over both covariates
    emb = res.embeddings
    assert emb.shape == (N, d) and np.isfinite(emb).all()
    r_sums = res.R.sum(axis=0)
    np.testing.assert_allclose(r_sums, 1.0, atol=1e-4)


def test_twocov_sharded_virtual_matches_materialized():
    """The multi-covariate fast path under a cells mesh: sharded virtual R
    (per-shard schedules, psum'd moment table, multi-hot run maps) must
    reproduce the sharded materialised run — the two-covariate counterpart
    of test_sharded_pallas.py::test_sharded_virtual_matches_materialized."""
    from harmony_tpu.sharding import make_mesh, pad_for_mesh, shard_state

    out = {}
    mesh = make_mesh(4)
    for virtual in (False, True):
        cfg, state, tiled = _engine_problem(
            (2, 3), N=8192, virtual=virtual
        )
        cfg = pad_for_mesh(cfg, mesh)  # 8192 % 4 == 0: no-op, kept for form
        engine = make_engine(cfg, codes=state.codes, mesh=mesh)
        state = shard_state(state, mesh)
        state = engine.init_cluster(state)
        state = engine.run_rounds(state, jnp.int32(3))
        if virtual:
            assert state.virt_pen is not None, (
                "sharded two-covariate virtual gate did not fire"
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
