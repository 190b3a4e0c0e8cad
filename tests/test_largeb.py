"""Large-B kernel coverage (B > 32): the one-hot-matmul / run-broadcast
penalty branches of the rotate kernels, reassign, moment fusion, virtual
correction and run-end materialisation, in interpret mode.

Round 1 only exercised B <= 6 in CI; the B > 32 branch of _assign_tile and
the large-B behaviour of the runs-spec path (incl. the mixed-tile one-hot
fallback) were TPU-tool-only. These tests pin them against the engine's
own invariants and the virtual/materialised bit-identity contract.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from harmony_tpu import ops
from harmony_tpu.config import harmony_options
from harmony_tpu.engine import cluster, make_engine
from harmony_tpu.ops.tiled import (
    build_batch_tiled_order,
    detect_tiled_layout,
)
from harmony_tpu.preprocess import (
    build_design,
    expand_hyperparams,
    orient_embedding,
    resolve_config,
)
from harmony_tpu.state import init_state


def _problem(B, N, virtual=False, seed=0, T=512, dtype="float32"):
    rng = np.random.default_rng(seed)
    d = 8
    batches = rng.integers(0, B, N)
    Z = rng.normal(size=(N, d)).astype(np.float32)
    design = build_design({"dataset": batches}, ["dataset"])
    options = harmony_options(block_size=0.25)
    cfg = resolve_config(
        n_cells=N, d=d, design=design, nclust=6, max_iter=2,
        early_stop=False, options=options, verbose=False, dtype=dtype,
    )
    cfg = dataclasses.replace(
        cfg, shuffle_mode="rotate", estep_impl="pallas",
        estep_sub_tile=T, mstep_tile=128, mstep_mode="tiled",
        virtual_r=virtual,
    )
    perm, _ = build_batch_tiled_order(design.codes, 128, seed=0)
    Zt = orient_embedding(Z, N)[:, perm]
    design = dataclasses.replace(design, codes=design.codes[:, perm])
    hp = expand_hyperparams(design, cfg.K, None, 0.1, 1.0, options.tau)
    state = init_state(
        cfg, Zt, design, hp.sigma, hp.theta, hp.lamb, jax.random.PRNGKey(2)
    )
    tiled = detect_tiled_layout(np.asarray(state.codes), cfg.N, 128)
    assert tiled is not None, "large-B layout did not tile"
    # the trailing mixed region must be non-trivial so the runs-spec
    # mixed-tile fallback (one-hot contraction) actually executes
    assert tiled.n_pure < cfg.N
    return cfg, state, tiled


@pytest.mark.slow
@pytest.mark.parametrize("B,N", [(33, 8704), (128, 16384)])
class TestLargeB:
    def test_cluster_phase_self_consistent(self, B, N):
        """A full large-B cluster phase on the runs-spec path keeps the
        E/O/R invariants: R columns simplex-valid, O/E recompute from the
        written R (covers the B>32 penalty branch, the run-broadcast
        penalty on pure tiles AND the mixed-tile one-hot fallback)."""
        cfg, state, tiled = _problem(B, N)
        engine = make_engine(cfg, codes=state.codes)
        state = engine.init_cluster(state)
        st = jax.jit(lambda s: cluster(cfg, s, tiled=tiled))(state)

        R = np.asarray(st.R)
        np.testing.assert_allclose(R[:, : cfg.N].sum(0), 1.0, atol=1e-4)
        assert np.all(R[:, cfg.N:] == 0)
        O_ref = np.asarray(
            ops.compute_O(st.R, st.codes, cfg.covariate_offsets, cfg.B)
        )
        np.testing.assert_allclose(np.asarray(st.O), O_ref, atol=2e-2)
        E_ref = np.asarray(ops.compute_E(st.R, st.Pr_b))
        np.testing.assert_allclose(np.asarray(st.E), E_ref, atol=2e-2)

    def test_virtual_matches_materialized(self, B, N):
        """Virtual R reproduces the materialised run at large B: identical
        trajectories and bit-level R equality through the B>32 penalty
        branches of the round, virtual-correction, materialise and XLA
        tail recompute."""
        out = {}
        for virtual in (False, True):
            cfg, state, tiled = _problem(B, N, virtual=virtual)
            engine = make_engine(cfg, codes=state.codes)
            state = engine.init_cluster(state)
            state = engine.run_rounds(state, jnp.int32(2))
            if virtual:
                assert state.virt_pen is not None
                state = engine.materialize_r(state)
            out[virtual] = state

        np.testing.assert_allclose(
            np.asarray(out[True].objective_harmony),
            np.asarray(out[False].objective_harmony), rtol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(out[True].Z_corr), np.asarray(out[False].Z_corr),
            atol=2e-4,
        )
        np.testing.assert_allclose(
            np.asarray(out[True].R), np.asarray(out[False].R), atol=1e-6
        )


def test_virtual_run_rounds_bfloat16():
    """dtype='bfloat16' through the whole-run dispatch on the virtual-R
    pallas path: the virt_Y carry snapshots the bf16 state.Y, so a f32
    zeros init breaks the while_loop carry (caught live on TPU; this
    reproduces it in interpret mode)."""
    cfg, state, tiled = _problem(33, 8704, virtual=True, dtype="bfloat16")
    engine = make_engine(cfg, codes=state.codes)
    state = engine.init_cluster(state)
    state = engine.run_rounds(state, jnp.int32(2))
    state = engine.materialize_r(state)
    obj = np.asarray(state.objective_harmony, dtype=np.float64)
    assert np.isfinite(obj).all()
    R = np.asarray(state.R, dtype=np.float64)
    np.testing.assert_allclose(R[:, : cfg.N].sum(0), 1.0, atol=5e-3)


def test_pc_chunk_multi_chunk_matches_full_width(monkeypatch):
    """The chunked large-B temporaries (_pc_chunks/_tO_chunked) never ran
    with nch > 1 in the CPU suite (ADVICE r2: _PC_CHUNK=1024 and every
    test uses T <= 512). Patch _PC_CHUNK down so the multi-chunk slicing
    actually executes and pin the contract: pc chunking preserves each
    column's B-contraction (R equal to ~1 ulp — exact on the MXU, where
    the per-column reduction is shape-independent; XLA CPU dots may
    re-block by shape), tO chunking only reorders f32 partial sums
    (close E/O and objectives)."""
    from harmony_tpu.engine import cluster as cluster_fn
    from harmony_tpu.ops import pallas_rotate as pr

    cfg, state0, tiled = _problem(33, 8704, T=512)
    engine = make_engine(cfg, codes=state0.codes)
    state0 = engine.init_cluster(state0)

    outs = {}
    for chunk in (1024, 128):  # 1024 -> nch=1 (full width); 128 -> nch=4
        monkeypatch.setattr(pr, "_PC_CHUNK", chunk)
        outs[chunk] = jax.jit(
            lambda s: cluster_fn(cfg, s, tiled=tiled)
        )(state0)

    np.testing.assert_allclose(
        np.asarray(outs[128].R), np.asarray(outs[1024].R),
        rtol=1e-5, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(outs[128].O), np.asarray(outs[1024].O), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(outs[128].E), np.asarray(outs[1024].E), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(outs[128].objective_kmeans),
        np.asarray(outs[1024].objective_kmeans), rtol=1e-5,
    )
