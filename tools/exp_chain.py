#!/usr/bin/env python
"""Chained vs same-input dispatch of the fused round (tunnel pipelining)."""

import dataclasses
import os
import time
from functools import partial

import numpy as np


def _sync(x):
    import jax

    for leaf in jax.tree.leaves(x):
        if hasattr(leaf, "shape"):
            np.asarray(jax.device_get(leaf if leaf.ndim == 0 else leaf.ravel()[:1]))


def main():
    import jax

    from harmony_tpu.runtime import enable_compilation_cache

    enable_compilation_cache()

    from harmony_tpu import engine as eng
    from harmony_tpu.bench import make_synthetic_cells
    from harmony_tpu.config import finalize_engine_config, harmony_options
    from harmony_tpu.engine import _with_precision, make_engine
    from harmony_tpu.preprocess import (
        build_design, expand_hyperparams, orient_embedding, resolve_config,
    )
    from harmony_tpu.state import init_state

    n_cells = 500_000
    d, n_batches, nclust = 50, 10, 100

    Z, batches = make_synthetic_cells(n_cells, d, n_batches, seed=0)
    design = build_design({"dataset": batches}, ["dataset"])
    Zt = orient_embedding(Z, n_cells)
    options = harmony_options()
    cfg = resolve_config(
        n_cells=n_cells, d=d, design=design, nclust=nclust, max_iter=10,
        early_stop=False, options=options, verbose=False,
    )
    cfg = dataclasses.replace(cfg, shuffle_mode="rotate")
    cfg = finalize_engine_config(cfg, None)
    print("estep_impl:", cfg.estep_impl, "mstep_impl:", cfg.mstep_impl,
          "donate:", cfg.donate_state, flush=True)
    hp = expand_hyperparams(design, cfg.K, None, 0.1, 1.0, options.tau)
    key = jax.random.PRNGKey(0)
    state = init_state(cfg, Zt, design, hp.sigma, hp.theta, hp.lamb, key)
    engine = make_engine(cfg, codes=state.codes)
    state = engine.init_cluster(state)
    warm = engine.round(state)
    _sync(warm.O)

    # same-input: 10 dispatches of round(warm)
    t0 = time.perf_counter()
    outs = [engine.round(warm) for _ in range(10)]
    _sync(outs[-1].O)
    print(f"same-input fused round:  {(time.perf_counter()-t0)/10*1e3:8.2f} ms",
          flush=True)

    # chained: thread output into input
    s = warm
    t0 = time.perf_counter()
    for _ in range(8):
        s = engine.round(s)
    _sync(s.O)
    print(f"chained    fused round:  {(time.perf_counter()-t0)/8*1e3:8.2f} ms",
          flush=True)

    # chained separate phases
    s = warm
    t0 = time.perf_counter()
    for _ in range(8):
        s = engine.correct(engine.cluster(s))
    _sync(s.O)
    print(f"chained separate phases: {(time.perf_counter()-t0)/8*1e3:8.2f} ms",
          flush=True)

    # chained, explicit rounds count check
    s = warm
    for _ in range(3):
        s = engine.round(s)
    nr = int(np.asarray(s.n_rounds))
    kr = np.asarray(s.kmeans_rounds)[:nr]
    print("kmeans rounds per harmony round:", kr, flush=True)


if __name__ == "__main__":
    main()
