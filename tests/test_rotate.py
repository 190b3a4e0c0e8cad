"""shuffle_mode='rotate': the zero-gather E-step schedule.

Not trajectory-identical to the reference (block membership differs), so
the contract is statistical equivalence: convergence, batch mixing and
theta-monotonicity must match the permute mode's behaviour.
"""

import numpy as np
import pytest

from harmony_tpu import harmony_options, run_harmony

from conftest import make_synthetic


def test_rotate_converges_and_mixes():
    Z, meta = make_synthetic(
        None, n_cells=500, d=10, n_batches=2, n_types=1, batch_shift=4.0,
        seed=77,
    )
    out = run_harmony(
        Z, meta, ["dataset"], nclust=5, max_iter=10, seed=6,
        shuffle_mode="rotate",
    )
    assert out.shape == (500, 10)
    assert np.all(np.isfinite(out))
    b = meta["dataset"]

    def sep(M):
        Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
        mus = np.stack([Mn[b == x].mean(0) for x in ("b0", "b1")])
        return np.linalg.norm(mus[0] - mus[1]) / M.std()

    Zn = Z / np.linalg.norm(Z, axis=1, keepdims=True)
    Cn = out / np.linalg.norm(out, axis=1, keepdims=True)
    assert sep(Cn) < 0.5 * sep(Zn)


def test_rotate_output_order_matches_input():
    """The ingest shuffle must be inverted on every cell-indexed output."""
    Z, meta = make_synthetic(None, n_cells=300, d=8, seed=5)
    obj = run_harmony(
        Z, meta, ["dataset"], nclust=8, max_iter=2, seed=0,
        return_object=True, shuffle_mode="rotate",
    )
    # Z_orig (after un-shuffling) must equal the user's input
    np.testing.assert_allclose(
        obj.Z_orig, Z.T.astype(np.float32), rtol=1e-6
    )
    assert obj.embeddings.shape == (300, 8)
    np.testing.assert_allclose(obj.R.sum(axis=0), 1.0, atol=1e-5)


def test_rotate_objective_comparable_to_permute():
    """With shared initial centroids, only the block schedule differs, so
    the trajectories must land close (each round fully refreshes every
    cell's assignment; the schedule only changes the online E/O path)."""
    rng = np.random.default_rng(11)
    Z, meta = make_synthetic(None, n_cells=400, d=10, seed=11)
    Y0 = Z[rng.choice(400, 10, replace=False)].T  # (d, K)
    objs = {}
    for mode in ("permute", "rotate"):
        o = run_harmony(
            Z, meta, ["dataset"], nclust=10, max_iter=5, seed=3,
            return_object=True, early_stop=False, shuffle_mode=mode,
            init_Y=Y0,
        )
        objs[mode] = o.objective_harmony
    for mode, tr in objs.items():
        assert tr[-1] < tr[0], mode
    np.testing.assert_allclose(
        objs["rotate"][-1], objs["permute"][-1], rtol=0.05
    )


def test_rotate_theta_monotonicity():
    Z, meta = make_synthetic(None, n_cells=300, d=12, seed=33)
    lo = run_harmony(
        Z, meta, ["dataset"], theta=0.0, nclust=20, max_iter=2,
        return_object=True, seed=2, shuffle_mode="rotate",
    )
    hi = run_harmony(
        Z, meta, ["dataset"], theta=1.0, nclust=5, max_iter=2,
        return_object=True, seed=2, shuffle_mode="rotate",
    )
    chi2 = lambda o: float(np.sum((o.O - o.E) ** 2 / o.E))
    assert chi2(lo) > chi2(hi)


def test_rotate_round_matches_numpy_emulation():
    """Exactness of the roll-free round: a straight NumPy transliteration of
    the virtual-rotation schedule (positions p hold cell (p+r) mod Np,
    blocks are S-slices of p-space, random block order, sequential E/O
    updates) must reproduce R/E/O and the objective accumulators.

    Covers Np > N (mesh padding), Np not a multiple of n_blocks (partial
    final block), and two covariates.
    """
    import dataclasses

    import jax
    import jax.numpy as jnp

    from harmony_tpu import ops
    from harmony_tpu.config import harmony_options
    from harmony_tpu.preprocess import (
        build_design, expand_hyperparams, orient_embedding, resolve_config,
    )
    from harmony_tpu.state import init_state

    n_cells, d = 203, 7
    Z, meta = make_synthetic(None, n_cells=n_cells, d=d, seed=19)
    options = harmony_options()
    design = build_design(meta, ["dataset", "cell_type"])
    cfg = resolve_config(
        n_cells=n_cells, d=d, design=design, nclust=6, max_iter=2,
        early_stop=True, options=options, verbose=False,
    )
    cfg = dataclasses.replace(cfg, N_pad=208, shuffle_mode="rotate")
    hp = expand_hyperparams(design, cfg.K, None, 0.1, 1.0, options.tau)
    state = init_state(
        cfg, orient_embedding(Z, n_cells), design, hp.sigma, hp.theta,
        hp.lamb, jax.random.PRNGKey(3),
    )
    # normalised Z + a valid (R, E, O) starting point
    from harmony_tpu.engine import init_cluster

    state = jax.jit(lambda s: init_cluster(cfg, s))(state)

    key = jax.random.PRNGKey(42)
    res = jax.jit(
        lambda s: ops.rotate_update_round(
            cfg, s.Z_corr, s.Y, s.R, s.E, s.O, s.codes, s.Pr_b, s.sigma,
            s.theta, key,
        )
    )(state)

    # ---- NumPy emulation (same PRNG draws) -------------------------------
    k1, k2 = jax.random.split(key)
    Np = cfg.Np
    nb = cfg.n_blocks
    S = -(-Np // nb)
    r = int(jax.random.randint(k1, (), 0, Np))
    order = np.asarray(jax.random.permutation(k2, nb))

    Zc = np.asarray(state.Z_corr, np.float64)
    Y = np.asarray(state.Y, np.float64)
    R = np.asarray(state.R, np.float64)
    E = np.asarray(state.E, np.float64)
    O = np.asarray(state.O, np.float64)
    codes = np.asarray(state.codes)
    Pr_b = np.asarray(state.Pr_b, np.float64)
    sigma = np.asarray(state.sigma, np.float64)
    theta = np.asarray(state.theta, np.float64)
    offsets = cfg.covariate_offsets
    oh = np.zeros((Np, cfg.B))
    valid = np.arange(Np) < cfg.N
    for c, off in enumerate(offsets):
        oh[np.arange(Np)[valid], off + codes[c][valid]] += 1.0

    R_out = R.copy()
    acc_d = acc_e = 0.0
    for b in order:
        p = b * S + np.arange(S)
        live = p < Np
        cells = (p[live] + r) % Np
        m = valid[cells]
        E -= R[:, cells].sum(axis=1, keepdims=True) * Pr_b[None, :]
        O -= R[:, cells] @ oh[cells]
        dist = 2.0 * (1.0 - Y.T @ Zc[:, cells])
        Rn = np.exp(-dist / sigma[:, None])
        Rn /= Rn.sum(axis=0, keepdims=True)
        pen = ((2.0 * E + 1.0) / (O + E + 1.0)) ** theta[None, :]
        pc = sum(
            pen[:, off + codes[c][cells]] for c, off in enumerate(offsets)
        )
        Rn *= pc
        Rn /= Rn.sum(axis=0, keepdims=True)
        Rn *= m[None, :]
        E += Rn.sum(axis=1, keepdims=True) * Pr_b[None, :]
        O += Rn @ oh[cells]
        acc_d += np.sum(Rn * dist)
        acc_e += np.sum(
            sigma[:, None] * np.where(Rn > 0, Rn * np.log(Rn + (Rn <= 0)), 0.0)
        )
        R_out[:, cells] = Rn

    np.testing.assert_allclose(np.asarray(res.R), R_out, atol=2e-6)
    np.testing.assert_allclose(np.asarray(res.E), E, atol=1e-4)
    np.testing.assert_allclose(np.asarray(res.O), O, atol=1e-4)
    np.testing.assert_allclose(float(res.kmeans_error), acc_d, rtol=1e-5)
    np.testing.assert_allclose(float(res.entropy), acc_e, rtol=1e-4)
    # every pad cell stays inert
    assert np.all(np.asarray(res.R)[:, cfg.N:] == 0.0)
