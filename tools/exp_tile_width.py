#!/usr/bin/env python
"""Quantify the estep_sub_tile sensitivity: same workload, T forced.

Motivation: the large-B VMEM budget lands 1M x 100-batch runs at T=2048
(the pc_s run-penalty scratch would overflow scoped VMEM at T=4096); this
measures what T-halving alone costs at a B=10 shape that fits both, so
the large-B figure can be decomposed into tile-width cost vs per-batch
work.
"""
import dataclasses
import os
import sys
import time

import numpy as np


def _sync(st):
    np.asarray(st.O)
    np.asarray(st.Z_corr[:1, :1])


def measure(T_force):
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

    n_cells = int(os.environ.get("EXP_CELLS", 1_000_000))
    n_batches = int(os.environ.get("EXP_B", 10))
    d, nclust = 50, 100
    Z, batches = make_synthetic_cells(n_cells, d, n_batches, seed=0)
    design = build_design({"dataset": batches}, ["dataset"])
    Zt = orient_embedding(Z, n_cells)
    options = harmony_options()
    cfg = resolve_config(
        n_cells=n_cells, d=d, design=design, nclust=nclust, max_iter=40,
        early_stop=False, options=options, verbose=False,
    )
    cfg = dataclasses.replace(
        cfg, shuffle_mode="rotate", estep_impl="auto", mstep_mode="tiled",
        donate="off",
    )
    cfg = finalize_engine_config(cfg, None)
    if T_force:
        cfg = dataclasses.replace(cfg, estep_sub_tile=T_force)
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
    t0 = time.perf_counter()
    warm = engine.run_rounds(state, jnp.int32(1))
    _sync(warm)
    print(f"[T={cfg.estep_sub_tile}] compile+first: "
          f"{time.perf_counter()-t0:.1f}s", flush=True)

    best = []
    for _ in range(3):
        t0 = time.perf_counter()
        s = engine.run_rounds(warm, jnp.int32(2))
        _sync(s)
        t_lo = time.perf_counter() - t0
        t0 = time.perf_counter()
        s = engine.run_rounds(warm, jnp.int32(10))
        _sync(s)
        t_hi = time.perf_counter() - t0
        best.append((t_hi - t_lo) / 8)
    per = min(best)
    print(f"[T={cfg.estep_sub_tile}] per-round: {per*1e3:8.2f} ms "
          f"({n_cells/per/1e6:.1f}M cells/s)", flush=True)


def main():
    from harmony_tpu.runtime import enable_compilation_cache

    enable_compilation_cache()
    ts = os.environ.get("EXP_T")
    widths = (
        [int(t) or None for t in ts.split(",")] if ts else [None, 2048, 1024]
    )
    for T in widths:
        measure(T)


if __name__ == "__main__":
    main()
