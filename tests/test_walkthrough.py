"""Executable walkthrough: the reference vignette's user-space cross-checks.

The reference's detailed walkthrough recomputes engine quantities with
plain linear algebra and compares them against the module object — a de
facto numerical cross-check of the native kernels executed by R CMD check
(SURVEY.md §4). This file is the same idea in CI, and doubles as an
*independent referee* for the M-step: the W/correction formulas here are
implemented from the vignette's published math
(vignettes/detailedWalkthrough.Rmd:622-649, 810-823), NOT from the C++
source that `reference_numpy.OracleHarmony` transliterates — a shared
misreading of src/harmony.cpp cannot pass both.

docs/walkthrough.md walks through the same computations.
"""

import numpy as np
import pytest

from harmony_tpu import run_harmony

from conftest import make_synthetic


def _onehot(codes, B):
    return np.eye(B, dtype=np.float64)[codes].T  # (B, N)


@pytest.fixture(scope="module")
def init_result():
    Z, meta = make_synthetic(
        None, n_cells=400, d=10, n_batches=3, batch_shift=0.8, seed=17
    )
    # max_iter=0: setup + init_cluster only — the vignette's state right
    # after harmonyObj$init_cluster_cpp()
    return run_harmony(
        Z, meta, ["dataset"], nclust=8, max_iter=0, seed=3,
        return_object=True,
    )


class TestVignetteInitChecks:
    """User-space recomputation of the init-state quantities
    (detailedWalkthrough.Rmd:257-271, 319-337)."""

    def test_R_is_softmax_of_distances(self, init_result):
        res = init_result
        Z = np.asarray(res.Z_corr, np.float64)  # L2-normalised at init
        Y = np.asarray(res.Y, np.float64)
        sigma = np.asarray(res.sigma, np.float64)[:, None]
        # R_ki ∝ exp(-2(1 - Y^T Z)/sigma), columns normalised
        # (detailedWalkthrough.Rmd:257-271)
        dist = 2.0 * (1.0 - Y.T @ Z)
        R_doc = np.exp(-dist / sigma)
        R_doc /= R_doc.sum(axis=0, keepdims=True)
        np.testing.assert_allclose(res.R, R_doc, atol=1e-4)

    def test_O_is_R_phiT(self, init_result):
        """The vignette's observed-counts check: R %*% t(phi) equals the
        engine's O field (detailedWalkthrough.Rmd:319-337)."""
        res = init_result
        phi = _onehot(np.asarray(res.design.codes[0]), res.B)
        O_doc = np.asarray(res.R, np.float64) @ phi.T
        np.testing.assert_allclose(res.O, O_doc, atol=1e-3)

    def test_E_is_rowsums_times_Pr(self, init_result):
        res = init_result
        E_doc = (
            np.asarray(res.R, np.float64).sum(axis=1, keepdims=True)
            * np.asarray(res.Pr_b, np.float64)[None, :]
        )
        np.testing.assert_allclose(res.E, E_doc, atol=1e-3)


class TestVignetteMoEOracle:
    """The MoE ridge solve from the PUBLISHED formula
    W_k = (Φ* diag(R_k) Φ*ᵀ + Λ)⁻¹ Φ* diag(R_k) Z_origᵀ and the per-cell
    correction Ẑ_i = Z_i − Σ_k R_ki ⟨W_k[1:B,·], φ_i⟩
    (detailedWalkthrough.Rmd:622-649, 810-823), as an independent fp64
    referee for the engine's masked/batched M-step."""

    def _state_after_cluster(self):
        import dataclasses

        import jax

        from harmony_tpu.config import harmony_options
        from harmony_tpu.engine import cluster, correct, make_engine
        from harmony_tpu.preprocess import (
            build_design, expand_hyperparams, orient_embedding,
            resolve_config,
        )
        from harmony_tpu.state import init_state

        Z, meta = make_synthetic(
            None, n_cells=400, d=10, n_batches=3, batch_shift=0.8, seed=17
        )
        design = build_design(meta, ["dataset"])
        options = harmony_options()
        cfg = resolve_config(
            n_cells=400, d=10, design=design, nclust=8, max_iter=2,
            early_stop=False, options=options, verbose=False,
        )
        hp = expand_hyperparams(
            design, cfg.K, None, 0.1, 1.0, options.tau  # lambda = 1 fixed
        )
        state = init_state(
            cfg, orient_embedding(Z, 400), design, hp.sigma, hp.theta,
            hp.lamb, jax.random.PRNGKey(7),
        )
        engine = make_engine(cfg, codes=state.codes)
        state = engine.init_cluster(state)
        state = engine.cluster(state)
        out = engine.correct(state)
        return cfg, state, out

    def test_correction_matches_vignette_formula(self):
        cfg, st, out = self._state_after_cluster()
        R = np.asarray(st.R, np.float64)
        Z_orig = np.asarray(st.Z_orig, np.float64)
        codes = np.asarray(st.codes[0])
        B, K, d, N = cfg.B, cfg.K, cfg.d, cfg.N

        # engine masking must be inactive for the unmasked vignette
        # formula to apply: every batch passes the cutoff in every cluster
        O = np.asarray(st.O, np.float64)
        sizes = np.asarray(st.batch_sizes, np.float64)
        assert np.all(O / sizes[None, :] > cfg.batch_prop_cutoff)

        phi = _onehot(codes, B)  # (B, N)
        phi_moe = np.vstack([np.ones((1, N)), phi])  # (B+1, N)
        lam = np.diag(np.concatenate([[0.0], np.ones(B)]))  # fixed λ=1

        W = np.zeros((K, B + 1, d))
        for k in range(K):
            Rk = R[k]
            G = (phi_moe * Rk) @ phi_moe.T + lam
            rhs = (phi_moe * Rk) @ Z_orig.T
            W[k] = np.linalg.solve(G, rhs)

        # centroid refresh from the intercept betas, then unit-scaled
        Y_doc = W[:, 0, :].T
        Y_doc = Y_doc / np.linalg.norm(Y_doc, axis=0, keepdims=True)
        np.testing.assert_allclose(
            np.asarray(out.Y, np.float64), Y_doc, atol=1e-4
        )

        # per-cell correction from the batch betas
        corr = np.zeros((d, N))
        for k in range(K):
            beta = W[k, 1:, :]  # (B, d)
            corr += (beta[codes, :] * R[k][:, None]).T
        Z_doc = Z_orig - corr
        np.testing.assert_allclose(
            np.asarray(out.Z_corr, np.float64), Z_doc, atol=1e-4
        )
