"""Statistical-equivalence sweep for the sharded rotate schedule
(VERDICT r2 #9): seeds x shard-counts, comparing converged objective and
chi^2 mixing against both the unsharded rotate schedule and the
reference-exact permute schedule.

The per-shard block schedule (tests/test_sharded_pallas.py, blockwise
semantics src/harmony.cpp:279-332) is a different stochastic order of the
same process — trajectories differ, converged *quality* must not. One
lucky seed proving that is weak evidence; this sweep pins it across
seeds, in-suite, with the tools/exp_largeb_converge.py methodology.
"""

import numpy as np
import pytest

from harmony_tpu.api import run_harmony
from harmony_tpu.config import harmony_options
from harmony_tpu.sharding import make_mesh

_SEEDS = (0, 1, 2)


def _chi2(res):
    O = np.asarray(res.O)
    E = np.asarray(res.E)
    return float(((O - E) ** 2 / np.maximum(E, 1e-12)).sum())


def _problem(seed):
    rng = np.random.default_rng(100 + seed)
    n, d, nb = 2048, 10, 3
    batches = rng.integers(0, nb, n)
    Z = (rng.normal(size=(nb, d)) * 0.8)[batches] + rng.normal(size=(n, d))
    return Z, {"dataset": np.array([f"b{i}" for i in batches])}


@pytest.fixture(scope="module")
def sweep():
    """{(schedule, seed): (final_objective, chi2)} over the 3 schedules."""
    out = {}
    mesh = make_mesh(4)
    for seed in _SEEDS:
        Z, meta = _problem(seed)
        for name, kw in (
            ("permute", dict(shuffle_mode="permute")),
            ("rotate1", dict(shuffle_mode="rotate", estep_impl="pallas")),
            (
                "rotate4",
                dict(shuffle_mode="rotate", estep_impl="pallas", mesh=mesh),
            ),
        ):
            res = run_harmony(
                Z, meta, ["dataset"], nclust=8, max_iter=6, seed=seed,
                options=harmony_options(block_size=0.25),
                return_object=True, **kw,
            )
            oh = np.asarray(res.objective_harmony)
            oh = oh[oh != 0]
            out[(name, seed)] = (float(oh[-1]), _chi2(res))
    return out


def test_converged_objective_equivalent_across_schedules(sweep):
    """Per seed, all three schedules converge to the same objective to
    within a tolerance comparable to the seed-to-seed spread."""
    for seed in _SEEDS:
        objs = [sweep[(n, seed)][0] for n in ("permute", "rotate1",
                                              "rotate4")]
        assert max(objs) - min(objs) <= 0.05 * abs(np.mean(objs)), (
            seed, objs,
        )
    # schedule-induced spread does not exceed the process's own
    # seed-to-seed spread by more than a small factor
    seed_spread = np.ptp([sweep[("permute", s)][0] for s in _SEEDS])
    for name in ("rotate1", "rotate4"):
        sched_dev = max(
            abs(sweep[(name, s)][0] - sweep[("permute", s)][0])
            for s in _SEEDS
        )
        assert sched_dev <= max(seed_spread, 0.02 * abs(
            np.mean([sweep[("permute", s)][0] for s in _SEEDS])
        )), (name, sched_dev, seed_spread)


def test_chi2_mixing_equivalent_across_schedules(sweep):
    """The diversity objective's chi^2 statistic (the reference's own
    theta-monotone quality metric, test_integration.R:29-41) must agree
    across schedules per seed."""
    for seed in _SEEDS:
        chis = [sweep[(n, seed)][1] for n in ("permute", "rotate1",
                                              "rotate4")]
        lo, hi = min(chis), max(chis)
        assert hi <= 1.3 * lo + 1e-6, (seed, chis)
