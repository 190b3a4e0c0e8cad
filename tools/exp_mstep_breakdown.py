#!/usr/bin/env python
"""Cumulative-stage breakdown of the correct phase (chain-of-10 amortised)."""

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
    from harmony_tpu.config import harmony_options
    from harmony_tpu.engine import _with_precision, make_engine
    from harmony_tpu.preprocess import (
        build_design, expand_hyperparams, orient_embedding, resolve_config,
    )
    from harmony_tpu.state import init_state
    from harmony_tpu.ops.ridge import (
        _correction_dense, _moments_dense, _solve_ridge, compute_masks,
    )
    from harmony_tpu.ops.normalize import l2_normalize_columns

    n_cells, d, n_batches, nclust = 500_000, 50, 10, 100
    Z, batches = make_synthetic_cells(n_cells, d, n_batches, seed=0)
    design = build_design({"dataset": batches}, ["dataset"])
    Zt = orient_embedding(Z, n_cells)
    options = harmony_options()
    cfg = resolve_config(
        n_cells=n_cells, d=d, design=design, nclust=nclust, max_iter=3,
        early_stop=False, options=options, verbose=False,
    )
    cfg = dataclasses.replace(cfg, shuffle_mode="rotate")
    hp = expand_hyperparams(design, cfg.K, None, 0.1, 1.0, options.tau)
    key = jax.random.PRNGKey(0)
    state = init_state(cfg, Zt, design, hp.sigma, hp.theta, hp.lamb, key)
    engine = make_engine(cfg, codes=state.codes)
    state = engine.init_cluster(state)
    st2 = engine.cluster(state)
    _sync(st2.O)
    K, B = cfg.K, cfg.B
    f32 = jnp.float32

    def chain(stage_fn):
        def run(s):
            acc = jnp.float32(0)
            R = s.R
            for _ in range(10):
                v = stage_fn(s, R)
                acc = acc + v
                R = R + jnp.tanh(v) * 1e-9
            return acc
        return jax.jit(_with_precision(cfg, run))

    offsets = cfg.covariate_offsets

    def _masked_R(s, R, keep):
        cell_mask = None
        for c, off in enumerate(offsets):
            kc = jnp.take(keep[:, off: off + cfg.B_vec[c]], s.codes[c], axis=1)
            cell_mask = kc if cell_mask is None else (cell_mask | kc)
        return R.astype(f32) * cell_mask.astype(f32)

    def stage_masks(s, R):
        keep, any_active = compute_masks(cfg, s.O, s.batch_sizes)
        return keep.astype(f32).sum() + any_active.astype(f32).sum()

    def stage_reff(s, R):
        keep, any_active = compute_masks(cfg, s.O, s.batch_sizes)
        R_eff = jax.lax.cond(
            jnp.all(keep), lambda R: R.astype(f32),
            lambda R: _masked_R(s, R, keep), R,
        )
        return R_eff[0].sum() + keep.astype(f32).sum()

    def stage_moments(s, R):
        keep, any_active = compute_masks(cfg, s.O, s.batch_sizes)
        R_eff = jax.lax.cond(
            jnp.all(keep), lambda R: R.astype(f32),
            lambda R: _masked_R(s, R, keep), R,
        )
        O_eff, rhs_b, cross, ctx = _moments_dense(
            cfg, R_eff, s.Z_orig.astype(f32), s.codes
        )
        return O_eff.sum() + rhs_b.sum()

    def stage_corr_only(s, R):
        onehots = [
            jax.nn.one_hot(s.codes[c], cfg.B_vec[c], dtype=f32)
            for c in range(cfg.n_covariates)
        ]
        W = jnp.ones((K, B + 1, cfg.d), f32) * 1e-3
        corr = _correction_dense(cfg, W, R.astype(f32), onehots)
        return corr[0].sum()

    from harmony_tpu.ops.ridge import moe_correct_ridge

    def stage_full(s, R):
        Z_corr, Y_new, W = moe_correct_ridge(
            cfg, s.Z_orig, R, s.O, s.E, s.codes, s.batch_sizes, s.lamb, s.Y,
        )
        return Z_corr[0].sum() + Y_new[0].sum()

    for name, fn in [
        ("masks only       ", stage_masks),
        ("+ R_eff cond     ", stage_reff),
        ("+ moments        ", stage_moments),
        ("correction alone ", stage_corr_only),
        ("full moe ridge   ", stage_full),
    ]:
        t = bench_fn(chain(fn), st2, iters=5)
        print(f"{name}: {t*1e2:7.2f} ms/call", flush=True)


if __name__ == "__main__":
    main()
