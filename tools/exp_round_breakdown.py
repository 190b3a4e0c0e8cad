#!/usr/bin/env python
"""True per-round cost via run_rounds deltas + per-component chains
under the current defaults (tiled M-step, fused reassign)."""

import dataclasses
import time

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
    from harmony_tpu.ops.tiled import build_batch_tiled_order

    n_cells, d, n_batches, nclust = 500_000, 50, 10, 100
    Z, batches = make_synthetic_cells(n_cells, d, n_batches, seed=0)
    design = build_design({"dataset": batches}, ["dataset"])
    Zt = orient_embedding(Z, n_cells)
    options = harmony_options()
    cfg = resolve_config(
        n_cells=n_cells, d=d, design=design, nclust=nclust, max_iter=30,
        early_stop=False, options=options, verbose=False,
    )
    cfg = dataclasses.replace(
        cfg, shuffle_mode="rotate", estep_impl="auto", mstep_impl="auto"
    )
    cfg = finalize_engine_config(cfg, None)
    perm, layout = build_batch_tiled_order(design.codes, cfg.mstep_tile, 0)
    Zt = Zt[:, perm]
    design = dataclasses.replace(design, codes=design.codes[:, perm])
    hp = expand_hyperparams(design, cfg.K, None, 0.1, 1.0, options.tau)
    state = init_state(
        cfg, Zt, design, hp.sigma, hp.theta, hp.lamb, jax.random.PRNGKey(0)
    )
    engine = make_engine(cfg, codes=state.codes)
    state = engine.init_cluster(state)
    st2 = engine.round(state)
    _sync(st2.O)
    print(f"estep={cfg.estep_impl} T={cfg.estep_sub_tile} Np={cfg.Np} "
          f"kmeans_rounds={np.asarray(st2.kmeans_rounds)[:2]}", flush=True)

    # true per-round cost: time(run_rounds n) for several n; slope = per-round
    for n in (2, 6, 10):
        t = bench_fn(lambda s, n=n: engine.run_rounds(s, jnp.int32(n)), st2,
                     iters=3)
        print(f"run_rounds({n:2d})          : {t*1e3:8.2f} ms", flush=True)

    f32 = jnp.float32

    def chain(stage_fn, n=10):
        def run(s):
            acc = jnp.float32(0)
            Y = s.Y
            for _ in range(n):
                v = stage_fn(s, Y)
                acc = acc + v
                Y = Y + jnp.tanh(v) * 1e-9
            return acc
        return jax.jit(_with_precision(cfg, run))

    from harmony_tpu.ops.pallas_ridge import (
        pallas_tile_moments, pallas_tiled_correction,
    )
    from harmony_tpu.ops.ridge import moe_correct_ridge
    from harmony_tpu.ops.pallas_rotate import make_tile_layout, pallas_reassign

    tl = make_tile_layout(cfg, st2.Z_corr, st2.codes)

    def stage_reassign(s, Y):
        R, tO, O, E = pallas_reassign(cfg, Y, s.sigma, s.Pr_b, tl)
        return R[0, 0] + tO[0, 0, 0] + O.sum() + E.sum()

    def stage_moments(s, Y):
        S = pallas_tile_moments(
            cfg, s.R + Y[0, 0] * 0, s.Z_orig.astype(f32), cfg.mstep_tile
        )
        return S.sum()

    def stage_corr(s, Y):
        NT = -(-cfg.Np // cfg.mstep_tile)
        W_tiles = jnp.ones((NT, cfg.d, cfg.K), f32) * (1e-3 + Y[0, 0] * 0)
        Zc = pallas_tiled_correction(
            cfg, W_tiles, s.R, s.Z_orig.astype(f32), cfg.mstep_tile
        )
        return Zc[0, 0]

    def stage_full_mstep(s, Y):
        from harmony_tpu.ops.tiled import detect_tiled_layout

        Z_corr, Y_new, W = moe_correct_ridge(
            cfg, s.Z_orig, s.R + Y[0, 0] * 0, s.O, s.E, s.codes,
            s.batch_sizes, s.lamb, s.Y, tiled=layout,
        )
        return Z_corr[0, 0] + Y_new[0, 0]

    for name, fn in [
        ("reassign kernel    ", stage_reassign),
        ("tile moments kernel", stage_moments),
        ("tiled corr kernel  ", stage_corr),
        ("full tiled M-step  ", stage_full_mstep),
    ]:
        t = bench_fn(chain(fn), st2, iters=3)
        print(f"{name}: {t*1e2:8.2f} ms/call", flush=True)


if __name__ == "__main__":
    main()
