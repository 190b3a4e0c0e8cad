"""Batch-tiled ingest layout + zero-gather M-step (ops/tiled.py)."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from harmony_tpu.config import HarmonyConfig
from harmony_tpu import ops
from harmony_tpu.ops.normalize import l2_normalize_columns
from harmony_tpu.ops.ridge import moe_correct_ridge
from harmony_tpu.ops.tiled import (
    build_batch_tiled_order,
    detect_tiled_layout,
)


def _codes(N, B_vec, seed=0, skew=False):
    rng = np.random.default_rng(seed)
    codes = np.stack(
        [
            rng.choice(
                b,
                size=N,
                p=(
                    None
                    if not skew
                    else np.arange(1, b + 1) / np.arange(1, b + 1).sum()
                ),
            ).astype(np.int32)
            for b in B_vec
        ]
    )
    return codes


class TestOrderBuilder:
    @pytest.mark.parametrize("B_vec", [(4,), (2, 3)])
    @pytest.mark.parametrize("skew", [False, True])
    def test_perm_and_purity(self, B_vec, skew):
        N, T = 5000, 128
        codes = _codes(N, B_vec, skew=skew)
        perm, layout = build_batch_tiled_order(codes, T, seed=1)
        assert sorted(perm) == list(range(N))
        pc = codes[:, perm]
        det = detect_tiled_layout(pc, N, T)
        assert det is not None
        assert det.n_pure == layout.n_pure
        np.testing.assert_array_equal(det.tile_joint, layout.tile_joint)
        # pure tiles are joint-pure
        NTp = len(layout.tile_joint)
        for c in range(len(B_vec)):
            tiles = pc[c, : NTp * T].reshape(NTp, T)
            assert (tiles == tiles[:, :1]).all()
        # mixed region is small
        assert N - layout.n_pure < np.prod(B_vec) * T + T

    def test_interleaving_mixture(self):
        """Any contiguous run of tiles carries ~proportional batch counts."""
        N, T, B = 40000, 128, 5
        codes = _codes(N, (B,), seed=2)
        perm, layout = build_batch_tiled_order(codes, T, seed=2)
        tj = layout.tile_joint
        NTp = len(tj)
        win = max(3 * B, NTp // 8)
        for start in range(0, NTp - win, win // 2):
            counts = np.bincount(tj[start : start + win], minlength=B)
            assert counts.min() > 0  # every batch present in every window
            assert counts.max() / max(counts.min(), 1) < 3.0

    def test_detection_rejects_random_order(self):
        codes = _codes(5000, (4,), seed=3)
        assert detect_tiled_layout(codes, 5000, 128) is None


def _ridge_problem(N, d, K, B_vec, T, seed=0, pad=0):
    """Batch-tiled problem with valid R/O/E stats (pads inert)."""
    rng = np.random.default_rng(seed)
    codes = _codes(N, B_vec, seed=seed)
    perm, layout = build_batch_tiled_order(codes, T, seed=seed)
    codes = codes[:, perm]
    Np = N + pad
    codes_p = np.concatenate(
        [codes, np.zeros((len(B_vec), pad), np.int32)], axis=1
    )
    cfg = HarmonyConfig(
        N=N, d=d, K=K, B=sum(B_vec), B_vec=B_vec,
        N_pad=Np if pad else None, estep_sub_tile=T,
    )
    Z = np.zeros((d, Np), np.float32)
    Z[:, :N] = rng.normal(size=(d, N))
    R = np.zeros((K, Np), np.float32)
    R[:, :N] = rng.uniform(0.01, 1.0, size=(K, N))
    R[:, :N] /= R[:, :N].sum(axis=0, keepdims=True)
    Rj, cj = jnp.asarray(R), jnp.asarray(codes_p)
    O = ops.compute_O(Rj, cj, cfg.covariate_offsets, cfg.B)
    counts = np.concatenate(
        [np.bincount(codes[c], minlength=b) for c, b in enumerate(B_vec)]
    ).astype(np.float32)
    E = np.asarray(O).sum(axis=1, keepdims=True) / N * counts[None, :]
    Y = np.asarray(
        l2_normalize_columns(jnp.asarray(rng.normal(size=(d, K)), jnp.float32))
    )
    lamb = np.concatenate([[0.0], np.ones(cfg.B)]).astype(np.float32)
    return cfg, layout, jnp.asarray(Z), Rj, O, jnp.asarray(E), cj, jnp.asarray(
        counts
    ), jnp.asarray(lamb), jnp.asarray(Y)


class TestTiledRidge:
    @pytest.mark.parametrize(
        "B_vec,pad", [((3,), 0), ((3,), 96), ((2, 3), 0)]
    )
    def test_matches_dense(self, B_vec, pad):
        cfg, layout, Z, R, O, E, codes, counts, lamb, Y = _ridge_problem(
            N=4000, d=6, K=7, B_vec=B_vec, T=128, seed=5, pad=pad
        )
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
            np.asarray(Y_t), np.asarray(Y_d), rtol=1e-4, atol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(W_t), np.asarray(W_d), rtol=2e-4, atol=2e-4
        )

    def test_matches_dense_with_dropped_batch(self):
        """A batch below the cutoff must be dropped identically."""
        cfg, layout, Z, R, O, E, codes, counts, lamb, Y = _ridge_problem(
            N=4000, d=6, K=7, B_vec=(3,), T=128, seed=6
        )
        cfg = dataclasses.replace(cfg, batch_prop_cutoff=0.02)
        # make batch 0 rare in cluster 0's responsibilities
        R = R.at[0].set(
            jnp.where(codes[0] == 0, 1e-7, R[0])
        )
        O = ops.compute_O(R, codes, cfg.covariate_offsets, cfg.B)
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


def test_engine_tiled_mstep_end_to_end():
    """Full engine rounds with mstep_mode='tiled' match 'dense' rounds."""
    from harmony_tpu.config import harmony_options
    from harmony_tpu.engine import make_engine
    from harmony_tpu.preprocess import (
        build_design, expand_hyperparams, orient_embedding, resolve_config,
    )
    from harmony_tpu.state import init_state

    rng = np.random.default_rng(11)
    N, d, B = 2000, 8, 3
    batches = rng.integers(0, B, N)
    Z = rng.normal(size=(N, d)).astype(np.float32)
    design = build_design({"dataset": batches}, ["dataset"])
    options = harmony_options()
    cfg = resolve_config(
        n_cells=N, d=d, design=design, nclust=8, max_iter=3,
        early_stop=False, options=options, verbose=False,
    )
    cfg = dataclasses.replace(
        cfg, shuffle_mode="rotate", estep_sub_tile=128, mstep_tile=128
    )
    perm, _ = build_batch_tiled_order(design.codes, 128, seed=0)
    Zt = orient_embedding(Z, N)[:, perm]
    design = dataclasses.replace(design, codes=design.codes[:, perm])
    hp = expand_hyperparams(design, cfg.K, None, 0.1, 1.0, options.tau)

    results = {}
    for mode in ("dense", "tiled"):
        c = dataclasses.replace(cfg, mstep_mode=mode)
        state = init_state(
            c, Zt, design, hp.sigma, hp.theta, hp.lamb,
            jax.random.PRNGKey(3),
        )
        engine = make_engine(c, codes=state.codes)
        state = engine.init_cluster(state)
        state = engine.run_rounds(state, jnp.int32(3))
        results[mode] = state
    np.testing.assert_allclose(
        np.asarray(results["tiled"].Z_corr),
        np.asarray(results["dense"].Z_corr),
        rtol=5e-3, atol=5e-3,
    )
    np.testing.assert_allclose(
        np.asarray(results["tiled"].objective_harmony),
        np.asarray(results["dense"].objective_harmony),
        rtol=1e-3,
    )


class TestMixtureGate:
    """choose_tiled_tile: prefer >=4 tiles/group/block, accept >=2 floor."""

    def _cfg(self, Np, n_blocks=20, mstep_tile=256):
        from types import SimpleNamespace

        return SimpleNamespace(Np=Np, n_blocks=n_blocks, mstep_tile=mstep_tile)

    def test_prefers_configured_tile_at_high_factor(self):
        from harmony_tpu.ops.tiled import choose_tiled_tile

        # 1M cells, 10 joint levels: 256-tile gives 195 tiles/block >= 4*10
        assert choose_tiled_tile(self._cfg(1_000_000), 10) == 256

    def test_falls_to_fine_tile_then_low_factor(self):
        from harmony_tpu.ops.tiled import choose_tiled_tile

        # 1M cells, 100 joint levels: 256-tile -> 1.95 tiles/group/block
        # (reject), 128-tile -> 3.9 (accept at the >=2 floor)
        assert choose_tiled_tile(self._cfg(1_000_000), 100) == 128

    def test_rejects_below_floor(self):
        from harmony_tpu.ops.tiled import choose_tiled_tile

        # 250k cells, 100 joint levels: 128-tile -> 0.98 tiles/group/block
        assert choose_tiled_tile(self._cfg(250_000), 100) is None


def test_fused_mstep_moments_match_separate_pass():
    """The final-round moment fusion (pallas_rotate moments=...) must match
    the separate pallas_tile_moments pass through a full harmony round."""
    from harmony_tpu.config import harmony_options
    from harmony_tpu.engine import cluster, correct, make_engine
    from harmony_tpu.preprocess import (
        build_design, expand_hyperparams, orient_embedding, resolve_config,
    )
    from harmony_tpu.state import init_state

    rng = np.random.default_rng(7)
    N, d, B = 4096, 8, 3
    batches = rng.integers(0, B, N)
    Z = rng.normal(size=(N, d)).astype(np.float32)
    design = build_design({"dataset": batches}, ["dataset"])
    options = harmony_options()
    cfg = resolve_config(
        n_cells=N, d=d, design=design, nclust=8, max_iter=3,
        early_stop=False, options=options, verbose=False,
    )
    cfg = dataclasses.replace(
        cfg, shuffle_mode="rotate", estep_impl="pallas",
        estep_sub_tile=512, mstep_tile=128, mstep_mode="tiled",
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
    engine = make_engine(cfg, codes=state.codes)
    state = engine.init_cluster(state)

    # same PRNG path both ways: cluster once, correct twice
    st, M = cluster(cfg, state, tiled=tiled, return_moments=True)
    assert M is not None, "fusion gate did not activate"
    out_fused = correct(cfg, st, tiled=tiled, tiled_moments=M)
    out_sep = correct(cfg, st, tiled=tiled, tiled_moments=None)
    # the fused table accumulates in rotate-processed tile order, the
    # separate pass in physical order: fp32 reordering through the ridge
    # solve leaves ~1e-5-absolute differences
    np.testing.assert_allclose(
        np.asarray(out_fused.Z_corr), np.asarray(out_sep.Z_corr),
        atol=2e-4,
    )
    np.testing.assert_allclose(
        np.asarray(out_fused.Y), np.asarray(out_sep.Y), atol=2e-4,
    )


@pytest.mark.parametrize("variant", ["fused_vpu", "legacy"])
def test_virtual_r_matches_materialized_path(variant):
    """virtual_r=True must reproduce the virtual_r=False run: same Z_corr
    trajectory and the materialised R equals the round-written R. The
    assignment-variant knob (cfg.estep_variant) must preserve this contract
    for every variant: the round kernel, the virtual correction and the
    materialisation all read the ONE config field."""
    from harmony_tpu.config import harmony_options
    from harmony_tpu.engine import make_engine, materialize_r
    from harmony_tpu.preprocess import (
        build_design, expand_hyperparams, orient_embedding, resolve_config,
    )
    from harmony_tpu.state import init_state

    rng = np.random.default_rng(13)
    N, d, B = 4096, 8, 3
    batches = rng.integers(0, B, N)
    Z = rng.normal(size=(N, d)).astype(np.float32)
    design = build_design({"dataset": batches}, ["dataset"])
    options = harmony_options()
    cfg0 = resolve_config(
        n_cells=N, d=d, design=design, nclust=8, max_iter=3,
        early_stop=False, options=options, verbose=False,
    )
    cfg0 = dataclasses.replace(
        cfg0, shuffle_mode="rotate", estep_impl="pallas",
        estep_sub_tile=512, mstep_tile=128, mstep_mode="tiled",
        estep_variant=variant,
    )
    perm, _ = build_batch_tiled_order(design.codes, 128, seed=0)
    Zt = orient_embedding(Z, N)[:, perm]
    design = dataclasses.replace(design, codes=design.codes[:, perm])
    hp = expand_hyperparams(design, cfg0.K, None, 0.1, 1.0, options.tau)

    out = {}
    for virtual in (False, True):
        cfg = dataclasses.replace(cfg0, virtual_r=virtual)
        state = init_state(
            cfg, Zt, design, hp.sigma, hp.theta, hp.lamb,
            jax.random.PRNGKey(5),
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
    # materialised R == the R the final round would have written
    np.testing.assert_allclose(
        np.asarray(out[True].R), np.asarray(out[False].R), atol=1e-6
    )


def test_permute_fused_moments_match_separate_pass():
    """The permute phase's materialise kernel fuses the M-step moment
    table (round 4, mirroring the rotate phase's last-round fusion) —
    it must match the separate moments pass through a full round."""
    from harmony_tpu.config import harmony_options
    from harmony_tpu.engine import cluster, correct, make_engine
    from harmony_tpu.preprocess import (
        build_design, expand_hyperparams, orient_embedding, resolve_config,
    )
    from harmony_tpu.state import init_state

    rng = np.random.default_rng(11)
    N, d, B = 4096, 8, 3
    batches = rng.integers(0, B, N)
    Z = rng.normal(size=(N, d)).astype(np.float32)
    design = build_design({"dataset": batches}, ["dataset"])
    options = harmony_options()
    cfg = resolve_config(
        n_cells=N, d=d, design=design, nclust=8, max_iter=3,
        early_stop=False, options=options, verbose=False,
    )
    cfg = dataclasses.replace(
        cfg, shuffle_mode="permute", estep_impl="pallas",
        estep_sub_tile=512, mstep_tile=128, mstep_mode="tiled",
    )
    perm, _ = build_batch_tiled_order(design.codes, 128, seed=0)
    Zt = orient_embedding(Z, N)[:, perm]
    design = dataclasses.replace(design, codes=design.codes[:, perm])
    hp = expand_hyperparams(design, cfg.K, None, 0.1, 1.0, options.tau)
    state = init_state(
        cfg, Zt, design, hp.sigma, hp.theta, hp.lamb, jax.random.PRNGKey(5)
    )
    tiled = detect_tiled_layout(np.asarray(state.codes), cfg.N, 128)
    assert tiled is not None
    engine = make_engine(cfg, codes=state.codes)
    state = engine.init_cluster(state)

    st, M = cluster(cfg, state, tiled=tiled, return_moments=True)
    assert M is not None, "permute moment fusion did not activate"
    out_fused = correct(cfg, st, tiled=tiled, tiled_moments=M)
    out_sep = correct(cfg, st, tiled=tiled, tiled_moments=None)
    np.testing.assert_allclose(
        np.asarray(out_fused.Z_corr), np.asarray(out_sep.Z_corr),
        atol=2e-4,
    )
    np.testing.assert_allclose(
        np.asarray(out_fused.Y), np.asarray(out_sep.Y), atol=2e-4,
    )
