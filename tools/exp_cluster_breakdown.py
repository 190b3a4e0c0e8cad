#!/usr/bin/env python
"""Cluster-phase component costs: re-entry reassign, tile-stat seed, one
v2 round, full phase (chain-of-10 amortised)."""

import dataclasses
import time
from functools import partial

import numpy as np


def _sync(x):
    import jax

    for leaf in jax.tree.leaves(x):
        if hasattr(leaf, "shape"):
            np.asarray(jax.device_get(leaf if leaf.ndim == 0 else leaf.ravel()[:1]))


def bench_fn(fn, *args, iters=5):
    out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp

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
    from harmony_tpu.ops.pallas_rotate import (
        RoundState, make_tile_layout, pallas_rotate_update_round_v2,
        tile_stats_from_R,
    )

    n_cells, d, n_batches, nclust = 500_000, 50, 10, 100
    Z, batches = make_synthetic_cells(n_cells, d, n_batches, seed=0)
    design = build_design({"dataset": batches}, ["dataset"])
    Zt = orient_embedding(Z, n_cells)
    options = harmony_options()
    cfg = resolve_config(
        n_cells=n_cells, d=d, design=design, nclust=nclust, max_iter=3,
        early_stop=False, options=options, verbose=False,
    )
    cfg = dataclasses.replace(
        cfg, shuffle_mode="rotate", estep_impl="auto", mstep_impl="auto"
    )
    cfg = finalize_engine_config(cfg, None)
    hp = expand_hyperparams(design, cfg.K, None, 0.1, 1.0, options.tau)
    key = jax.random.PRNGKey(0)
    state = init_state(cfg, Zt, design, hp.sigma, hp.theta, hp.lamb, key)
    engine = make_engine(cfg, codes=state.codes)
    state = engine.init_cluster(state)
    st2 = engine.round(state)
    _sync(st2.O)
    print(f"estep={cfg.estep_impl} T={cfg.estep_sub_tile} Np={cfg.Np}",
          flush=True)

    def chain10(stage_fn):
        def run(s):
            acc = jnp.float32(0)
            Y = s.Y
            for _ in range(10):
                v = stage_fn(s, Y)
                acc = acc + v
                Y = Y + jnp.tanh(v) * 1e-9
            return acc
        return jax.jit(_with_precision(cfg, run))

    def stage_reassign(s, Y):
        s2 = dataclasses.replace(s, Y=Y)
        st, kerr, ent = eng._assign_from_centroids(cfg, s2)
        return kerr + ent + st.O.sum()

    def stage_seed(s, Y):
        layout = make_tile_layout(cfg, s.Z_corr, s.codes)
        tO = tile_stats_from_R(cfg, s.R + Y[0, 0] * 0, layout.oh_pad)
        return tO.sum()

    def stage_round(s, Y):
        layout = make_tile_layout(cfg, s.Z_corr, s.codes)
        tO = tile_stats_from_R(cfg, s.R, layout.oh_pad)
        rs = RoundState(
            R=s.R, E=s.E, O=s.O, tile_O=tO,
            kmeans_error=jnp.float32(0), entropy=jnp.float32(0),
        )
        res = pallas_rotate_update_round_v2(
            cfg, s.Z_corr, Y, rs, s.Pr_b, s.sigma, s.theta,
            jax.random.PRNGKey(1), layout=layout,
        )
        return res.kmeans_error + res.entropy + res.R[0, 0]

    for name, fn in [
        ("reassign (re-entry)      ", stage_reassign),
        ("layout+tile-stat seed    ", stage_seed),
        ("seed + one v2 round      ", stage_round),
    ]:
        t = bench_fn(chain10(fn), st2, iters=5)
        print(f"{name}: {t*1e2:7.2f} ms/call", flush=True)

    # full phases for reference
    fn = jax.jit(_with_precision(cfg, partial(eng.cluster, cfg)))
    t = bench_fn(lambda s: fn(s), st2, iters=10)
    print(f"cluster phase (v2)       : {t*1e3:7.2f} ms", flush=True)
    fnc = jax.jit(_with_precision(cfg, partial(eng.correct, cfg)))
    t = bench_fn(lambda s: fnc(s), st2, iters=10)
    print(f"correct phase            : {t*1e3:7.2f} ms", flush=True)
    fnr = jax.jit(_with_precision(cfg, partial(eng.harmony_round, cfg)))
    t = bench_fn(lambda s: fnr(s), st2, iters=10)
    print(f"fused round              : {t*1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
