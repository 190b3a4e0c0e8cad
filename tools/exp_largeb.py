#!/usr/bin/env python
"""Large-B breakdown: where does 1M cells x 100 batches spend time?

Measures, on the current defaults (auto -> segmented fallback because the
tiled-mixture gate fails at this shape) and on a FORCED batch-tiled
layout (tile=128, gate bypassed):

  * run_rounds slope      -> pure E-step round cost
  * full round() slope    -> E-step + M-step cost
"""

import dataclasses
import os
import sys
import time

import numpy as np


def _sync(st):
    np.asarray(st.O)
    np.asarray(st.Z_corr[:1, :1])


def measure(n_cells, d, n_batches, nclust, force_tiled):
    import jax
    import jax.numpy as jnp

    from harmony_tpu.bench import make_synthetic_cells
    from harmony_tpu.config import finalize_engine_config, harmony_options
    from harmony_tpu.engine import make_engine
    from harmony_tpu.ops.tiled import build_batch_tiled_order
    from harmony_tpu.preprocess import (
        build_design, expand_hyperparams, orient_embedding, resolve_config,
    )
    from harmony_tpu.state import init_state

    Z, batches = make_synthetic_cells(n_cells, d, n_batches, seed=0)
    design = build_design({"dataset": batches}, ["dataset"])
    Zt = orient_embedding(Z, n_cells)
    options = harmony_options()
    cfg = resolve_config(
        n_cells=n_cells, d=d, design=design, nclust=nclust, max_iter=40,
        early_stop=False, options=options, verbose=False,
    )
    cfg = dataclasses.replace(
        cfg, shuffle_mode="rotate", estep_impl="auto", mstep_impl="auto",
        mstep_mode="tiled" if force_tiled else "auto", donate="off",
    )
    cfg = finalize_engine_config(cfg, None)
    if force_tiled:
        perm, _ = build_batch_tiled_order(design.codes, 128, 0)
        Zt = Zt[:, perm]
        design = dataclasses.replace(design, codes=design.codes[:, perm])

    hp = expand_hyperparams(design, cfg.K, None, 0.1, 1.0, options.tau)
    state = init_state(
        cfg, Zt, design, hp.sigma, hp.theta, hp.lamb, jax.random.PRNGKey(0)
    )
    engine = make_engine(cfg, codes=state.codes)
    state = engine.init_cluster(state)
    _sync(state)
    label = "tiled-forced" if force_tiled else "auto"
    print(f"[{label}] estep={cfg.estep_impl} segments={cfg.use_segments} "
          f"T={cfg.estep_sub_tile}", flush=True)

    # warm-up / compile
    t0 = time.perf_counter()
    warm = engine.run_rounds(state, jnp.int32(1))
    _sync(warm)
    print(f"[{label}] compile+first: {time.perf_counter()-t0:.1f}s",
          flush=True)

    def two_point(n_lo, n_hi, reps=2):
        best = []
        for _ in range(reps):
            t0 = time.perf_counter()
            s = engine.run_rounds(warm, jnp.int32(n_lo))
            _sync(s)
            t_lo = time.perf_counter() - t0
            t0 = time.perf_counter()
            s = engine.run_rounds(warm, jnp.int32(n_hi))
            _sync(s)
            t_hi = time.perf_counter() - t0
            best.append((t_hi - t_lo) / (n_hi - n_lo))
        return min(best)

    per_round = two_point(2, 10)
    print(f"[{label}] full round (E+M): {per_round*1e3:8.2f} ms "
          f"({n_cells/per_round/1e6:.1f}M cells/s)", flush=True)

    # E-step-only slope: vary kmeans rounds via a cluster-only chain
    cl = engine.cluster
    t0 = time.perf_counter()
    s = cl(dataclasses.replace(warm))
    _sync(s)
    print(f"[{label}] cluster-phase compile+run: "
          f"{time.perf_counter()-t0:.2f}s", flush=True)
    reps = 4
    t0 = time.perf_counter()
    for _ in range(reps):
        s = cl(dataclasses.replace(warm))
    _sync(s)
    t_cluster = (time.perf_counter() - t0) / reps
    t0 = time.perf_counter()
    for _ in range(reps):
        s2 = engine.correct(dataclasses.replace(s))
    _sync(s2)
    t_correct = (time.perf_counter() - t0) / reps
    print(f"[{label}] cluster: {t_cluster*1e3:8.2f} ms   "
          f"correct: {t_correct*1e3:8.2f} ms  (incl dispatch)", flush=True)
    return per_round


def main():
    from harmony_tpu.runtime import enable_compilation_cache

    enable_compilation_cache()
    n_cells = int(os.environ.get("EXP_CELLS", 1_000_000))
    n_batches = int(os.environ.get("EXP_B", 100))
    for force_tiled in (False, True):
        if os.environ.get("EXP_ONLY") == "tiled" and not force_tiled:
            continue
        if os.environ.get("EXP_ONLY") == "auto" and force_tiled:
            continue
        measure(n_cells, 50, n_batches, 100, force_tiled)
    return 0


if __name__ == "__main__":
    sys.exit(main())
