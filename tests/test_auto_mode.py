"""shuffle_mode='auto' steering (VERDICT r2 #7), PhaseTimers wiring
(VERDICT r2 #8) and W-recompute consistency on fast-path runs (weak #6)."""

import numpy as np

import jax
import jax.numpy as jnp

from harmony_tpu import run_harmony
from harmony_tpu.api import AUTO_ROTATE_MIN_CELLS, _resolve_shuffle_mode

from conftest import make_synthetic


class TestAutoResolution:
    def test_small_runs_stay_permute(self):
        assert _resolve_shuffle_mode("auto", 5_000, False, False) == "permute"

    def test_large_runs_go_rotate(self):
        assert (
            _resolve_shuffle_mode(
                "auto", AUTO_ROTATE_MIN_CELLS, False, False
            )
            == "rotate"
        )

    def test_parity_hooks_force_permute(self):
        assert (
            _resolve_shuffle_mode("auto", 10**7, True, False) == "permute"
        )

    def test_explicit_modes_pass_through(self):
        for mode in ("permute", "rotate"):
            assert _resolve_shuffle_mode(mode, 10**7, False, False) == mode


def test_default_auto_reproduces_permute_small():
    """The new 'auto' default must not change small-run semantics: same
    seed, same trajectory as explicit 'permute' (CLAUDE.md parity
    invariant — defaults stay reference-exact where it matters)."""
    Z, meta = make_synthetic(None, n_cells=300, d=8, seed=4)
    kw = dict(nclust=6, max_iter=2, return_object=True, seed=4,
              early_stop=False)
    res_auto = run_harmony(Z, meta, ["dataset"], **kw)
    res_perm = run_harmony(Z, meta, ["dataset"], shuffle_mode="permute",
                           **kw)
    np.testing.assert_array_equal(res_auto.Z_corr, res_perm.Z_corr)
    np.testing.assert_array_equal(
        res_auto.objective_harmony, res_perm.objective_harmony
    )
    assert res_auto.ingest_inv is None  # permute does not ingest-shuffle


def test_permute_pallas_rides_tiled_ingest(monkeypatch):
    """shuffle_mode='permute' + estep_impl='pallas' reorders cells at
    ingest into the batch-tiled layout (when the tile chooser accepts the
    shape) so the M-step rides the zero-gather tiled path — the permute
    schedule itself is ingest-order-neutral because every round draws a
    fresh uniform permutation (src/harmony.cpp:272-273). Outputs unmap to
    the caller's cell order via ingest_inv."""
    import harmony_tpu.ops.tiled as tiled_mod

    monkeypatch.setattr(
        tiled_mod, "choose_tiled_tile",
        lambda cfg, nj, n_shards=1: 128,
    )
    rng = np.random.default_rng(7)
    N, d = 4096, 8
    Z = rng.standard_normal((N, d)).astype(np.float32)
    meta = {"dataset": rng.integers(0, 2, N)}
    res = run_harmony(
        Z, meta, ["dataset"], nclust=6, max_iter=2, seed=0,
        shuffle_mode="permute", estep_impl="pallas", return_object=True,
    )
    assert res.ingest_inv is not None
    assert res._tiled_layout() is not None  # M-step took the tiled path
    # cell-indexed outputs are back in the caller's order
    np.testing.assert_allclose(res.Z_orig, Z.T, rtol=0, atol=1e-5)
    assert np.isfinite(res.embeddings).all()
    obj = res.objective_harmony
    assert obj[-1] < obj[0]


def test_result_timers_populated():
    """HarmonyResult.phase_seconds(): the driver's live phase timers (the
    reference's ~20 hot scopes, src/harmony.cpp:302-335 — here one scope
    per driver phase)."""
    Z, meta = make_synthetic(None, n_cells=200, d=6, seed=1)
    res = run_harmony(
        Z, meta, ["dataset"], nclust=5, max_iter=2, return_object=True,
        seed=1,
    )
    t = res.phase_seconds()
    for phase in ("make_engine", "init_cluster", "run_rounds",
                  "materialize_r"):
        assert phase in t and t[phase] >= 0.0, t
    # verbose per-round path uses per-round scopes instead
    res_v = run_harmony(
        Z, meta, ["dataset"], nclust=5, max_iter=2, return_object=True,
        seed=1, verbose=True,
    )
    assert "round" in res_v.phase_seconds()


def test_w_recompute_consistent_on_virtual_run():
    """res.W on a virtual-R rotate run: the run-end state carries the
    MATERIALISED R (driver.harmonize always materialises), so the dense
    W recompute must reproduce the correction the run applied:
    Z_corr == Z_orig - sum_k R_k * W[k, 1+code].  (VERDICT r2 weak #6.)"""
    from harmony_tpu.config import harmony_options

    rng = np.random.default_rng(9)
    N, d, B = 4096, 8, 3
    batches = rng.integers(0, B, N)
    Z = rng.normal(size=(N, d)).astype(np.float32)
    res = run_harmony(
        Z, {"dataset": batches.astype(str)}, ["dataset"], nclust=6,
        max_iter=2, seed=0, shuffle_mode="rotate", estep_impl="pallas",
        virtual_r=True, options=harmony_options(block_size=0.25),
        return_object=True, early_stop=False,
    )
    assert res.state.virt_pen is not None, "virtual path did not engage"
    W = np.asarray(res.W)  # (K, B+1, d), dense recompute from final state
    # work in engine (ingest-shuffled) order to avoid double-unmapping
    R_eng = np.asarray(res.state.R)[:, : res.config.N]
    codes_eng = np.asarray(res.state.codes)[:, : res.config.N]
    corr = np.zeros((res.config.d, res.config.N), np.float32)
    for c, off in enumerate(res.config.covariate_offsets):
        Wc = W[:, 1 + off : 1 + off + res.config.B_vec[c], :]
        W_cells = np.take(Wc, codes_eng[c], axis=1)  # (K, N, d)
        corr += np.einsum("kn,knd->dn", R_eng, W_cells)
    Zc_expected = np.asarray(res.state.Z_orig)[:, : res.config.N] - corr
    np.testing.assert_allclose(
        np.asarray(res.state.Z_corr)[:, : res.config.N], Zc_expected,
        atol=5e-4,
    )


def test_w_rides_tiled_path_on_mesh_virtual_run(monkeypatch):
    """VERDICT r3 #4: res.W on a mesh + virtual-R run must route through
    the run's batch-tiled layout and mesh — never a full (N, B) one-hot —
    and match the dense small-N value."""
    import harmony_tpu.ops as ops_mod
    from harmony_tpu.config import harmony_options

    rng = np.random.default_rng(11)
    # big enough that choose_tiled_tile accepts a layout on the 8-shard
    # mesh (>=2 tiles per joint group per shard-local rotate block)
    N, d, B = 32768, 8, 3
    Z = rng.normal(size=(N, d)).astype(np.float32)
    meta = {"dataset": rng.integers(0, B, N).astype(str)}
    res = run_harmony(
        Z, meta, ["dataset"], nclust=6, max_iter=2, seed=0,
        shuffle_mode="rotate", estep_impl="pallas", virtual_r=True,
        mesh="auto", options=harmony_options(block_size=0.25),
        return_object=True, early_stop=False,
    )
    assert res.state.virt_pen is not None, "virtual path did not engage"
    assert res.mesh is not None, "mesh not recorded on the result"

    seen = {}
    real = ops_mod.moe_correct_ridge

    def spy(*args, **kwargs):
        seen.update(kwargs)
        return real(*args, **kwargs)

    real_onehot = jax.nn.one_hot

    def onehot_guard(x, num_classes, *a, **kw):
        assert np.ndim(x) == 0 or np.shape(x)[-1] < N, (
            "W recompute materialised a cell-axis one-hot"
        )
        return real_onehot(x, num_classes, *a, **kw)

    monkeypatch.setattr(ops_mod, "moe_correct_ridge", spy)
    monkeypatch.setattr(jax.nn, "one_hot", onehot_guard)
    W_fast = res.W
    monkeypatch.undo()
    assert seen.get("tiled") is not None, "W recompute skipped the tiled path"
    assert seen.get("mesh") is res.mesh

    _, _, W_dense = real(
        res.config, res.state.Z_orig, res.state.R, res.state.O,
        res.state.E, res.state.codes, res.state.batch_sizes,
        res.state.lamb, res.state.Y,
    )
    np.testing.assert_allclose(W_fast, np.asarray(W_dense), atol=2e-5)


def test_verbose_per_kmeans_round_ticks(caplog):
    """VERDICT r3 #9: the verbose surface emits one tick per kmeans round
    (objective from the round's trace) — the RcppProgress
    within-clustering granularity analog (src/harmony.cpp:210,
    src/utils.cpp:21)."""
    import logging

    Z, meta = make_synthetic(None, n_cells=200, d=6, seed=1)
    with caplog.at_level(logging.INFO, logger="harmony_tpu"):
        res = run_harmony(
            Z, meta, ["dataset"], nclust=5, max_iter=2, return_object=True,
            seed=1, verbose=True, early_stop=False,
        )
    ticks = [r for r in caplog.records if r.message.lstrip().startswith("kmeans")]
    expected = int(np.sum(res.kmeans_rounds[: int(res.state.n_rounds)]))
    assert len(ticks) == expected and expected >= 2, (len(ticks), expected)
    assert all("objective=" in t.message for t in ticks)
