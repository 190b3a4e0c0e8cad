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
