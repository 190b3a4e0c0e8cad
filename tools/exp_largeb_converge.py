#!/usr/bin/env python
"""Convergence validation for the batch-tiled layout at low mixture factor.

Runs full Harmony (rotate schedule) at 1M cells x 100 batches twice with
identical data/seed:

  * tiled  — batch-tiled ingest (factor ~3.9 at this shape, below the old
             gate of 4) + zero-gather M-step;
  * random — plain random ingest + segmented M-step (the old fallback).

Compares converged objective, rounds to converge, and the chi^2 mixing
statistic sum((O-E)^2/E). The schedules are different stochastic orders of
the same process, so trajectories differ; converged quality must match.
"""

import os
import sys

import numpy as np


def chi2(res):
    O = np.asarray(res.O)
    E = np.asarray(res.E)
    return float(((O - E) ** 2 / np.maximum(E, 1e-12)).sum())


def run(mode):
    import harmony_tpu.ops.tiled as tiled_mod
    from harmony_tpu.api import run_harmony
    from harmony_tpu.bench import make_synthetic_cells

    n_cells = int(os.environ.get("EXP_CELLS", 1_000_000))
    n_batches = int(os.environ.get("EXP_B", 100))
    Z, batches = make_synthetic_cells(n_cells, 50, n_batches, seed=0)

    orig = tiled_mod.choose_tiled_tile
    if mode == "random":
        tiled_mod.choose_tiled_tile = lambda cfg, n_joint: None
    try:
        res = run_harmony(
            Z, {"dataset": batches}, ["dataset"], nclust=100,
            max_iter=25, early_stop=True, return_object=True,
            shuffle_mode="rotate", seed=0,
        )
    finally:
        tiled_mod.choose_tiled_tile = orig
    oh = np.asarray(res.objective_harmony)
    oh = oh[oh != 0]
    print(
        f"[{mode:6s}] rounds={len(oh) - 1} "
        f"objective: init={oh[0]:.1f} final={oh[-1]:.4f} "
        f"chi2={chi2(res):.1f}",
        flush=True,
    )
    return oh[-1], chi2(res)


def main():
    from harmony_tpu.runtime import enable_compilation_cache

    enable_compilation_cache()
    f_t, c_t = run("tiled")
    f_r, c_r = run("random")
    rel = abs(f_t - f_r) / abs(f_r)
    print(f"objective rel diff: {rel:.4%}   chi2 ratio: {c_t / c_r:.3f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
