#!/usr/bin/env python
"""Phase-level A/B of the correct phase (mstep_impl) + fused-round variants."""

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


def bench_fn(fn, *args, iters=10, fetch=None):
    out = fn(*args)
    _sync(out if fetch is None else fetch(out))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _sync(out if fetch is None else fetch(out))
    return (time.perf_counter() - t0) / iters, out


def main():
    import jax

    from harmony_tpu.runtime import enable_compilation_cache

    enable_compilation_cache()

    from harmony_tpu import engine as eng
    from harmony_tpu.bench import make_synthetic_cells
    from harmony_tpu.config import harmony_options
    from harmony_tpu.engine import _with_precision, make_engine
    from harmony_tpu.preprocess import (
        build_design, expand_hyperparams, orient_embedding, resolve_config,
    )
    from harmony_tpu.state import init_state

    n_cells = int(os.environ.get("HARMONY_BENCH_CELLS", 500_000))
    d = int(os.environ.get("HARMONY_BENCH_DIMS", 50))
    n_batches = int(os.environ.get("HARMONY_BENCH_BATCHES", 10))
    nclust = int(os.environ.get("HARMONY_BENCH_K", 100))

    Z, batches = make_synthetic_cells(n_cells, d, n_batches, seed=0)
    design = build_design({"dataset": batches}, ["dataset"])
    Zt = orient_embedding(Z, n_cells)
    options = harmony_options()
    cfg0 = resolve_config(
        n_cells=n_cells, d=d, design=design, nclust=nclust, max_iter=3,
        early_stop=False, options=options, verbose=False,
    )
    cfg0 = dataclasses.replace(cfg0, shuffle_mode="rotate")
    hp = expand_hyperparams(design, cfg0.K, None, 0.1, 1.0, options.tau)
    key = jax.random.PRNGKey(0)
    state = init_state(cfg0, Zt, design, hp.sigma, hp.theta, hp.lamb, key)
    engine = make_engine(cfg0, codes=state.codes)
    state = engine.init_cluster(state)
    st2 = engine.cluster(state)
    _sync(st2.O)
    print(f"platform={jax.devices()[0].platform} N={n_cells} d={d} "
          f"K={cfg0.K} B={cfg0.B}", flush=True)

    for mimpl in ["xla", "pallas"]:
        cfg = dataclasses.replace(cfg0, mstep_impl=mimpl)
        fn = jax.jit(_with_precision(cfg, partial(eng.correct, cfg)))
        t, _ = bench_fn(fn, st2, iters=10, fetch=lambda s: s.O)
        print(f"correct  mstep={mimpl:6s}:          {t*1e3:8.2f} ms", flush=True)

    # fused full round (cluster + correct in ONE dispatch)
    for eimpl, mimpl in [("pallas", "xla"), ("pallas", "pallas")]:
        cfg = dataclasses.replace(
            cfg0, estep_impl=eimpl, mstep_impl=mimpl
        )

        def round_fn(cfg, s):
            return eng.correct(cfg, eng.cluster(cfg, s))

        fn = jax.jit(_with_precision(cfg, partial(round_fn, cfg)))
        t, _ = bench_fn(fn, st2, iters=10, fetch=lambda s: s.O)
        print(f"fused round estep={eimpl} mstep={mimpl}: {t*1e3:8.2f} ms",
              flush=True)


if __name__ == "__main__":
    main()
