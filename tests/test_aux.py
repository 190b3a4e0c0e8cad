"""Auxiliary subsystems: checkpoint/resume, plotting, scale_data, runtime."""

import os

import numpy as np
import pytest

import jax

from harmony_tpu import harmony_options, run_harmony, scale_data
from harmony_tpu.checkpoint import load_checkpoint, save_checkpoint
from harmony_tpu.driver import harmonize
from harmony_tpu.engine import make_engine

from conftest import make_synthetic


def dataclasses_replace_r_zero(state):
    import dataclasses
    import jax.numpy as jnp

    return dataclasses.replace(state, R=jnp.zeros_like(state.R))


def _result(max_iter=2, seed=5):
    Z, meta = make_synthetic(None, n_cells=200, d=8, seed=seed)
    obj = run_harmony(
        Z, meta, ["dataset"], nclust=8, max_iter=max_iter, return_object=True,
        seed=seed,
    )
    return Z, meta, obj


class TestCheckpoint:
    def test_full_roundtrip(self, tmp_path):
        _, _, obj = _result()
        p = str(tmp_path / "ckpt.npz")
        save_checkpoint(p, obj.config, obj.state, mode="full")
        cfg0, _ = load_checkpoint(p, extra_rounds=0)
        assert cfg0 == obj.config
        cfg, state = load_checkpoint(p)
        assert cfg.max_iter_harmony > obj.config.max_iter_harmony
        np.testing.assert_array_equal(
            np.asarray(state.Z_corr), np.asarray(obj.state.Z_corr)
        )
        np.testing.assert_array_equal(
            np.asarray(state.R), np.asarray(obj.state.R)
        )
        # resumed state continues to run
        engine = make_engine(cfg)
        state2 = harmonize(engine, state, max_iter=1)
        assert np.all(np.isfinite(np.asarray(state2.Z_corr)))

    def test_atomic_overwrite_and_extension(self, tmp_path):
        """Saves are atomic (temp + os.replace — no partial file can ever
        sit at the target path) and the on-disk name always carries .npz
        (ADVICE r2: np.savez appends it silently otherwise)."""
        _, _, obj = _result()
        p = str(tmp_path / "ckpt")  # extensionless
        save_checkpoint(p, obj.config, obj.state, mode="full")
        assert os.path.exists(p + ".npz") and not os.path.exists(p)
        # overwrite in place; no temp residue left behind
        save_checkpoint(p, obj.config, obj.state, mode="full")
        assert [f for f in os.listdir(tmp_path) if "tmp" in f] == []
        # load accepts either spelling
        cfg_a, _ = load_checkpoint(p, extra_rounds=0)
        cfg_b, _ = load_checkpoint(p + ".npz", extra_rounds=0)
        assert cfg_a == cfg_b == obj.config

    def test_minimal_resume_matches_uninterrupted(self, tmp_path):
        """Stopping after 1 round and resuming for 1 more must match a
        straight 2-round run (restart-friendliness, SURVEY.md §5)."""
        Z, meta, _ = _result()
        from harmony_tpu.preprocess import build_design, orient_embedding

        # straight 2-round run with injected perms for determinism
        rng = np.random.default_rng(0)
        design = build_design(meta, ["dataset"])
        obj2 = run_harmony(
            Z, meta, ["dataset"], nclust=8, max_iter=2, return_object=True,
            seed=9, early_stop=False,
        )

        obj1 = run_harmony(
            Z, meta, ["dataset"], nclust=8, max_iter=1, return_object=True,
            seed=9, early_stop=False,
        )
        p = str(tmp_path / "min.npz")
        save_checkpoint(p, obj1.config, obj1.state, mode="minimal")

        Zt = orient_embedding(Z, design.n_cells)
        cfg, state = load_checkpoint(p, Z=Zt, design=design)
        engine = make_engine(cfg)
        state = harmonize(engine, state, max_iter=1)

        # The resumed round re-derives R from (Y, Z_corr) exactly like the
        # uninterrupted run's re-entry path; only the PRNG stream for the
        # block permutations is shared via the saved key, so trajectories
        # match to fp tolerance.
        np.testing.assert_allclose(
            np.asarray(state.Z_corr),
            np.asarray(obj2.state.Z_corr),
            atol=5e-5,
        )

    def test_orbax_roundtrip(self, tmp_path):
        pytest.importorskip("orbax.checkpoint")
        from harmony_tpu.checkpoint import (
            load_checkpoint_orbax,
            save_checkpoint_orbax,
        )

        _, _, obj = _result()
        p = str(tmp_path / "orbax_ckpt")
        save_checkpoint_orbax(p, obj.config, obj.state)
        cfg, state = load_checkpoint_orbax(p)
        assert cfg == obj.config
        np.testing.assert_array_equal(
            np.asarray(state.Z_corr), np.asarray(obj.state.Z_corr)
        )
        engine = make_engine(cfg)
        state2 = harmonize(engine, state, max_iter=1)
        assert np.all(np.isfinite(np.asarray(state2.Z_corr)))

    def test_driver_periodic_checkpoint(self, tmp_path):
        """harmonize() writes a resumable checkpoint every round. The
        state comes from a capacity-4 run of which only 2 rounds ran, so
        continuing 2 more stays within the trace capacity (running past
        it now raises, test_trace_capacity_guard)."""
        from harmony_tpu.preprocess import build_design, orient_embedding
        from harmony_tpu.config import harmony_options
        from harmony_tpu.preprocess import expand_hyperparams, resolve_config
        from harmony_tpu.state import init_state

        Z, meta = make_synthetic(None, n_cells=200, d=8, seed=5)
        design = build_design(meta, ["dataset"])
        options = harmony_options()
        cfg = resolve_config(
            n_cells=200, d=8, design=design, nclust=8, max_iter=2,
            early_stop=False, options=options, verbose=False,
        )
        hp = expand_hyperparams(design, cfg.K, None, 0.1, 1.0, options.tau)
        Zt = orient_embedding(Z, 200)
        state = init_state(
            cfg, Zt, design, hp.sigma, hp.theta, hp.lamb,
            jax.random.PRNGKey(3),
        )
        engine = make_engine(cfg, codes=state.codes)
        state = engine.init_cluster(state)

        p = str(tmp_path / "auto.npz")
        harmonize(engine, state, max_iter=2, checkpoint_path=p)
        from harmony_tpu.checkpoint import load_checkpoint

        cfg2, state2 = load_checkpoint(p, Z=Zt, design=design)
        assert int(state2.n_rounds) >= 2

    def test_orbax_sharded_resume_matches_uninterrupted(self, tmp_path):
        """Orbax checkpoint of a MESH run: save after round 1, restore,
        re-shard, continue 1 round — trajectory must match the
        uninterrupted 2-round sharded run (SURVEY.md §5 checkpoint plan;
        restart-friendliness holds under sharding because correction
        recomputes from Z_orig and re-entry re-derives R)."""
        from harmony_tpu.checkpoint import (
            load_checkpoint_orbax, save_checkpoint_orbax,
        )
        from harmony_tpu.config import harmony_options
        from harmony_tpu.preprocess import (
            build_design, expand_hyperparams, orient_embedding,
            resolve_config,
        )
        from harmony_tpu.sharding import make_mesh, shard_state
        from harmony_tpu.state import init_state
        import dataclasses
        import jax.numpy as jnp

        Z, meta = make_synthetic(None, n_cells=512, d=8, seed=11)
        design = build_design(meta, ["dataset"])
        options = harmony_options()
        cfg = resolve_config(
            n_cells=512, d=8, design=design, nclust=6, max_iter=2,
            early_stop=False, options=options, verbose=False,
        )
        mesh = make_mesh(4)
        from harmony_tpu.sharding import pad_for_mesh

        cfg = pad_for_mesh(cfg, mesh)
        hp = expand_hyperparams(design, cfg.K, None, 0.1, 1.0, options.tau)
        Zt = orient_embedding(Z, 512)

        def fresh():
            state = init_state(
                cfg, Zt, design, hp.sigma, hp.theta, hp.lamb,
                jax.random.PRNGKey(4),
            )
            state = shard_state(state, mesh)
            engine = make_engine(cfg, codes=state.codes, mesh=mesh)
            return engine, engine.init_cluster(state)

        engine, state = fresh()
        ref = engine.run_rounds(state, jnp.int32(2))

        engine, state = fresh()
        state = engine.run_rounds(state, jnp.int32(1))
        p = str(tmp_path / "orbax_ckpt")
        save_checkpoint_orbax(p, cfg, state)
        cfg2, restored = load_checkpoint_orbax(p)
        assert cfg2 == cfg
        restored = shard_state(restored, mesh)
        engine2 = make_engine(cfg2, codes=restored.codes, mesh=mesh)
        resumed = engine2.run_rounds(restored, jnp.int32(1))

        np.testing.assert_allclose(
            np.asarray(resumed.Z_corr), np.asarray(ref.Z_corr), atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(resumed.objective_harmony),
            np.asarray(ref.objective_harmony), rtol=1e-6,
        )
        assert int(resumed.n_rounds) == int(ref.n_rounds) == 2

    def test_orbax_virtual_state_reshards_and_resumes(self, tmp_path):
        """Orbax checkpoint of a mesh rotate VIRTUAL-R run: the saved state
        carries the virt_* context arrays (checkpoint.py preserves non-None
        fields), so shard_state must produce shardings for them — with the
        None-default sharding pytree this was a treedef mismatch (VERDICT
        r2 weak #4). Resume must match the uninterrupted run."""
        pytest.importorskip("orbax.checkpoint")
        import jax.numpy as jnp

        from harmony_tpu.checkpoint import (
            load_checkpoint_orbax, save_checkpoint_orbax,
        )
        from harmony_tpu.sharding import shard_state
        from test_sharded_pallas import _tiled_problem

        cfg, mesh, state0, tiled = _tiled_problem(virtual=True)
        engine = make_engine(cfg, codes=state0.codes, mesh=mesh)

        def start():
            state = shard_state(state0, mesh)
            return engine.init_cluster(state)

        ref = engine.run_rounds(start(), jnp.int32(2))
        ref = engine.materialize_r(ref)

        mid = engine.run_rounds(start(), jnp.int32(1))
        assert mid.virt_pen is not None, "virtual gate did not fire"
        p = str(tmp_path / "orbax_virt")
        save_checkpoint_orbax(p, cfg, mid)
        cfg2, restored = load_checkpoint_orbax(p)
        assert restored.virt_pen is not None
        restored = shard_state(restored, mesh)  # treedef mismatch pre-fix
        engine2 = make_engine(cfg2, codes=restored.codes, mesh=mesh)
        resumed = engine2.run_rounds(restored, jnp.int32(1))
        resumed = engine2.materialize_r(resumed)

        np.testing.assert_allclose(
            np.asarray(resumed.Z_corr), np.asarray(ref.Z_corr), atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(resumed.R), np.asarray(ref.R), atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(resumed.objective_harmony),
            np.asarray(ref.objective_harmony), rtol=1e-6,
        )

    def test_minimal_requires_inputs(self, tmp_path):
        _, _, obj = _result()
        p = str(tmp_path / "m.npz")
        save_checkpoint(p, obj.config, obj.state, mode="minimal")
        with pytest.raises(ValueError):
            load_checkpoint(p)

    def test_per_round_checkpoint_skips_materialize(
        self, tmp_path, monkeypatch
    ):
        """checkpoint_every=1 on a virtual-R rotate run must NOT
        materialise the (K, N) R per round (VERDICT r3 #7): minimal
        checkpoints re-derive R from (Y, Z_corr) on load, so the only
        materialisation is the user-facing one at run end — and the
        checkpointed run's trajectory is identical to an uncheckpointed
        one."""
        import dataclasses

        import harmony_tpu.driver as driver_mod

        rng = np.random.default_rng(3)
        N, d, B = 4096, 8, 3
        meta = {"dataset": rng.integers(0, B, N).astype(str)}
        Z = rng.normal(size=(N, d)).astype(np.float32)
        kw = dict(
            nclust=6, max_iter=3, seed=0, shuffle_mode="rotate",
            estep_impl="pallas", virtual_r=True,
            options=harmony_options(block_size=0.25),
            return_object=True, early_stop=False,
        )
        ref = run_harmony(Z, meta, ["dataset"], **kw)
        assert ref.state.virt_pen is not None, "virtual path did not engage"

        calls = {"n": 0}
        real_make_engine = driver_mod.make_engine

        def counting_make_engine(cfg, codes=None, mesh=None):
            engine = real_make_engine(cfg, codes=codes, mesh=mesh)
            real_mat = engine.materialize_r

            def counted(state):
                calls["n"] += 1
                return real_mat(state)

            return dataclasses.replace(engine, materialize_r=counted)

        monkeypatch.setattr(driver_mod, "make_engine", counting_make_engine)
        res = run_harmony(
            Z, meta, ["dataset"],
            checkpoint_path=str(tmp_path / "ck.npz"), checkpoint_every=1,
            **kw,
        )
        assert res.state.virt_pen is not None
        assert calls["n"] == 1, (
            f"materialize_r ran {calls['n']} times; per-round checkpoint "
            "writes must not materialise R"
        )
        np.testing.assert_array_equal(
            np.asarray(res.state.R), np.asarray(ref.state.R)
        )
        np.testing.assert_array_equal(res.Z_corr, ref.Z_corr)

    def test_full_save_of_virtual_state_materializes(self, tmp_path):
        """A full-mode save of a mid-run virtual-R state must persist the
        MATERIALISED R (state.R is stale during virtual rounds)."""
        from harmony_tpu.engine import materialize_r

        rng = np.random.default_rng(7)
        N, d, B = 4096, 8, 3
        meta = {"dataset": rng.integers(0, B, N).astype(str)}
        Z = rng.normal(size=(N, d)).astype(np.float32)
        res = run_harmony(
            Z, meta, ["dataset"], nclust=6, max_iter=2, seed=0,
            shuffle_mode="rotate", estep_impl="pallas", virtual_r=True,
            options=harmony_options(block_size=0.25),
            return_object=True, early_stop=False,
        )
        assert res.state.virt_pen is not None
        # fake a stale-R mid-run state: zero R, keep the virtual context
        stale = dataclasses_replace_r_zero(res.state)
        p = str(tmp_path / "virt_full.npz")
        save_checkpoint(p, res.config, stale, mode="full")
        _, loaded = load_checkpoint(p, extra_rounds=0)
        expect = materialize_r(res.config, stale)
        np.testing.assert_array_equal(
            np.asarray(loaded.R), np.asarray(expect.R)
        )
        assert float(np.abs(np.asarray(loaded.R)).max()) > 0


def test_convergence_plot():
    pytest.importorskip("matplotlib")
    import matplotlib

    matplotlib.use("Agg")
    _, _, obj = _result(max_iter=3)
    from harmony_tpu.plot import convergence_plot

    ax = convergence_plot(obj)
    assert len(ax.collections) >= 1


class TestScaleData:
    def test_dense_rows(self):
        rng = np.random.default_rng(0)
        A = rng.normal(size=(10, 50)) * 3 + 1
        S = scale_data(A)
        np.testing.assert_allclose(S.mean(axis=1), 0, atol=1e-10)
        np.testing.assert_allclose(S.std(axis=1, ddof=1), 1, atol=1e-10)

    def test_clipping(self):
        A = np.eye(5) * 100
        S = scale_data(A, thresh=2.0)
        assert S.max() <= 2.0
        assert S.min() >= -2.0

    def test_sparse_matches_dense(self):
        sp = pytest.importorskip("scipy.sparse")
        rng = np.random.default_rng(1)
        A = rng.normal(size=(20, 30))
        A[A < 0.5] = 0  # sparsify
        S_dense = scale_data(A)
        S_sparse = scale_data(sp.csc_matrix(A))
        np.testing.assert_allclose(S_dense, S_sparse, atol=1e-10)

    def test_margin_2(self):
        rng = np.random.default_rng(2)
        A = rng.normal(size=(12, 7))
        S = scale_data(A, margin=2)
        np.testing.assert_allclose(S.mean(axis=0), 0, atol=1e-10)


def test_phase_timers():
    from harmony_tpu.runtime import PhaseTimers

    t = PhaseTimers()
    with t.scope("phase_a"):
        pass
    with t.scope("phase_a"):
        pass
    assert t._count["phase_a"] == 2
    assert "phase_a" in t.report()


def test_trace_capacity_guard():
    """max_iter beyond the state's trace capacity must raise, not silently
    clamp pushes onto the last trace slot (engine trace buffers are
    fixed-capacity; jnp .at[].set clips out-of-bounds indices)."""
    _, _, obj = _result(max_iter=2)
    engine = make_engine(obj.config)
    with pytest.raises(ValueError, match="trace capacity"):
        harmonize(engine, obj.state, max_iter=obj.config.max_iter_harmony + 1)


class TestAbortPolling:
    def test_pre_set_flag_aborts_fast_path(self):
        from harmony_tpu.runtime import AbortFlag

        _, _, obj = _result(max_iter=2)
        engine = make_engine(obj.config, codes=obj.state.codes)
        flag = AbortFlag()
        flag.set()
        with pytest.raises(KeyboardInterrupt):
            harmonize(engine, obj.state, max_iter=2, abort=flag)

    def test_chunked_fast_path_completes(self):
        """With an (unset) abort flag the run chunks into
        ``abort_poll_rounds`` single dispatches and still matches the
        unchunked single-dispatch result."""
        from harmony_tpu.preprocess import build_design
        from harmony_tpu.runtime import AbortFlag
        from harmony_tpu.state import init_state
        from conftest import make_synthetic

        Z, meta = make_synthetic(None, n_cells=200, d=8, seed=5)
        from harmony_tpu.config import harmony_options
        from harmony_tpu.preprocess import (
            expand_hyperparams, orient_embedding, resolve_config,
        )

        design = build_design(meta, ["dataset"])
        options = harmony_options()
        cfg = resolve_config(
            n_cells=200, d=8, design=design, nclust=8, max_iter=3,
            early_stop=False, options=options, verbose=False,
        )
        hp = expand_hyperparams(design, cfg.K, None, 0.1, 1.0, options.tau)
        Zt = orient_embedding(Z, 200)

        def run(abort, polls):
            state = init_state(
                cfg, Zt, design, hp.sigma, hp.theta, hp.lamb,
                jax.random.PRNGKey(3),
            )
            engine = make_engine(cfg, codes=state.codes)
            state = engine.init_cluster(state)
            return harmonize(
                engine, state, max_iter=3, abort=abort,
                abort_poll_rounds=polls,
            )

        ref = run(None, 1)
        chunked = run(AbortFlag(), 1)
        np.testing.assert_allclose(
            np.asarray(ref.Z_corr), np.asarray(chunked.Z_corr), atol=1e-6
        )
        assert int(chunked.n_rounds) == int(ref.n_rounds)


def test_abort_flag():
    from harmony_tpu.runtime import AbortFlag

    f = AbortFlag()
    assert not f.aborted()
    f.set()
    assert f.aborted()


class TestFailureDetection:
    """Divergence detection (runtime.DivergenceError): a non-finite
    objective fails loudly instead of silently iterating on NaNs. The
    reference has no such guard (SURVEY.md §5 lists failure detection as
    absent); this is the production-framework upgrade."""

    def _poisoned(self):
        Z, meta = make_synthetic(None, n_cells=200, d=8, seed=3)
        Z = Z.copy()
        Z[0, 0] = np.nan
        return Z, meta

    def test_fast_path_raises(self):
        from harmony_tpu.runtime import DivergenceError

        Z, meta = self._poisoned()
        with pytest.raises(DivergenceError, match="non-finite"):
            run_harmony(Z, meta, ["dataset"], nclust=8, max_iter=2, seed=3)

    def test_host_loop_does_not_overwrite_good_checkpoint(self, tmp_path):
        from harmony_tpu.runtime import DivergenceError

        Z, meta = self._poisoned()
        p = str(tmp_path / "ckpt.npz")
        # verbose=True forces the per-round host loop; the divergence check
        # runs before the round's checkpoint write, so the poisoned state
        # never reaches disk
        with pytest.raises(DivergenceError):
            run_harmony(
                Z, meta, ["dataset"], nclust=8, max_iter=2, seed=3,
                verbose=True, checkpoint_path=p,
            )
        assert not os.path.exists(p)
