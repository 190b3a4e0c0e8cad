#!/usr/bin/env python
"""Per-phase / per-op wall-clock breakdown at the canonical bench shape.

Times each engine phase and its dominant sub-ops separately (jitted,
warm-cache) so optimization effort goes where the milliseconds are.
Run on the real TPU; fresh sub-op shapes compile in the background of the
persistent cache. Synchronisation is via host fetches (remote-tunnel
block_until_ready is unreliable, CLAUDE.md).
"""

import os
import time

import numpy as np

from harmony_tpu.config import resolve_matmul_precision as _resolve_matmul_precision


def bench_fn(fn, *args, iters=10, fetch=None):
    out = fn(*args)
    _sync(out if fetch is None else fetch(out))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _sync(out if fetch is None else fetch(out))
    return (time.perf_counter() - t0) / iters, out


def _sync(x):
    import jax

    for leaf in jax.tree.leaves(x):
        if hasattr(leaf, "shape"):
            np.asarray(jax.device_get(leaf if leaf.ndim == 0 else leaf.ravel()[:1]))


def main():
    import jax
    import jax.numpy as jnp

    from harmony_tpu.runtime import enable_compilation_cache

    enable_compilation_cache()

    from harmony_tpu import ops
    from harmony_tpu.bench import make_synthetic_cells
    from harmony_tpu.config import harmony_options
    from harmony_tpu.engine import make_engine
    from harmony_tpu.preprocess import (
        build_design, expand_hyperparams, orient_embedding, resolve_config,
    )
    from harmony_tpu.state import init_state

    n_cells = int(os.environ.get("HARMONY_BENCH_CELLS", 500_000))
    d = int(os.environ.get("HARMONY_BENCH_DIMS", 50))
    n_batches = int(os.environ.get("HARMONY_BENCH_BATCHES", 10))
    nclust = int(os.environ.get("HARMONY_BENCH_K", 100))
    shuffle_mode = os.environ.get("HARMONY_BENCH_SHUFFLE", "rotate")

    Z, batches = make_synthetic_cells(n_cells, d, n_batches, seed=0)
    design = build_design({"dataset": batches}, ["dataset"])
    Zt = orient_embedding(Z, n_cells)
    options = harmony_options()
    cfg = resolve_config(
        n_cells=n_cells, d=d, design=design, nclust=nclust, max_iter=3,
        early_stop=False, options=options, verbose=False,
    )
    import dataclasses

    cfg = dataclasses.replace(cfg, shuffle_mode=shuffle_mode)
    hp = expand_hyperparams(design, cfg.K, None, 0.1, 1.0, options.tau)
    key = jax.random.PRNGKey(0)
    state = init_state(cfg, Zt, design, hp.sigma, hp.theta, hp.lamb, key)
    engine = make_engine(cfg, codes=state.codes)
    state = engine.init_cluster(state)
    _sync(state.O)

    print(f"platform={jax.devices()[0].platform} shape: N={n_cells} d={d} "
          f"K={cfg.K} B={cfg.B} shuffle={cfg.shuffle_mode} "
          f"mstep={'segment' if cfg.use_segments else 'dense'}")

    # --- full phases (non-donating copies so we can repeat) ---------------
    from functools import partial

    from harmony_tpu import engine as eng
    from harmony_tpu.engine import _with_precision

    cluster_fn = jax.jit(_with_precision(cfg, partial(eng.cluster, cfg)))
    correct_fn = jax.jit(_with_precision(cfg, partial(eng.correct, cfg)))

    t, st2 = bench_fn(cluster_fn, state, iters=5, fetch=lambda s: s.O)
    print(f"cluster phase (<=4 rounds):        {t*1e3:8.2f} ms")
    rounds = int(np.asarray(st2.kmeans_rounds)[int(np.asarray(st2.n_rounds))])
    print(f"  (rounds actually run: {rounds})")
    t, st3 = bench_fn(correct_fn, st2, iters=5, fetch=lambda s: s.O)
    print(f"correct phase:                     {t*1e3:8.2f} ms")

    # --- E-step sub-ops ----------------------------------------------------
    kk = jax.random.PRNGKey(1)

    def one_round(s, k):
        with jax.default_matmul_precision(_resolve_matmul_precision(cfg.dtype, cfg.matmul_precision)):
            if cfg.shuffle_mode == "rotate":
                res = ops.rotate_update_round(
                    cfg, s.Z_corr, s.Y, s.R, s.E, s.O, s.codes, s.Pr_b,
                    s.sigma, s.theta, k,
                )
            else:
                perm = jax.random.permutation(k, cfg.N).astype(jnp.int32)
                res = ops.block_update_round(
                    cfg, s.Z_corr, s.Y, s.R, s.E, s.O, s.codes, s.Pr_b,
                    s.sigma, s.theta, perm,
                )
        return res

    one_round_j = jax.jit(one_round)
    t, res = bench_fn(one_round_j, st2, kk, iters=10, fetch=lambda r: r.E)
    print(f"single update round:               {t*1e3:8.2f} ms")

    # roll cost (the rotate layout step, x2 per round)
    roll_j = jax.jit(lambda R: jnp.roll(R, -12345, axis=1))
    t, _ = bench_fn(roll_j, st2.R, iters=10)
    print(f"  roll of R (K x N):               {t*1e3:8.2f} ms")

    # pure assignment math without the sequential loop: one big matmul pass
    def fused_assign(Z, Y, sigma):
        g = jnp.dot(Y.T, Z, preferred_element_type=jnp.float32)
        dist = 2.0 * (1.0 - g)
        Rn = jnp.exp(-dist / sigma[:, None])
        return Rn / jnp.sum(Rn, axis=0, keepdims=True)

    fa = jax.jit(fused_assign)
    t, _ = bench_fn(fa, st2.Z_corr, st2.Y, st2.sigma, iters=10)
    print(f"  non-sequential assign (1 pass):  {t*1e3:8.2f} ms")

    # --- M-step sub-ops ------------------------------------------------------
    from harmony_tpu.ops.ridge import (
        _correction_dense, _moments_dense, _solve_ridge, compute_masks,
    )

    f32 = jnp.float32

    def moments(s):
        with jax.default_matmul_precision(_resolve_matmul_precision(cfg.dtype, cfg.matmul_precision)):
            R_eff = s.R.astype(f32)
            Zf = s.Z_orig.astype(f32)
            rhs0 = jnp.dot(R_eff, Zf.T, preferred_element_type=f32)
            O_eff, rhs_b, cross, ctx = _moments_dense(cfg, R_eff, Zf, s.codes)
            return rhs0, O_eff, rhs_b

    t, _ = bench_fn(jax.jit(moments), st2, iters=10)
    print(f"  M-step moments (dense):          {t*1e3:8.2f} ms")

    def corr_only(s):
        with jax.default_matmul_precision(_resolve_matmul_precision(cfg.dtype, cfg.matmul_precision)):
            R_eff = s.R.astype(f32)
            onehots = [
                jax.nn.one_hot(s.codes[c], cfg.B_vec[c], dtype=f32)
                for c in range(cfg.n_covariates)
            ]
            W = jnp.ones((cfg.K, cfg.B + 1, cfg.d), f32) * 1e-3
            return _correction_dense(cfg, W, R_eff, onehots)

    t, _ = bench_fn(jax.jit(corr_only), st2, iters=10)
    print(f"  M-step correction (dense):       {t*1e3:8.2f} ms")

    def solve_only(s):
        G = jnp.eye(cfg.B + 1, dtype=f32)[None] * 2.0 + jnp.ones(
            (cfg.K, cfg.B + 1, cfg.B + 1), f32
        ) * 0.1
        rhs = jnp.ones((cfg.K, cfg.B + 1, cfg.d), f32)
        return _solve_ridge(cfg, G, rhs)

    t, _ = bench_fn(jax.jit(solve_only), st2, iters=10)
    print(f"  M-step batched solve:            {t*1e3:8.2f} ms")

    t, _ = bench_fn(jax.jit(lambda s: compute_masks(cfg, s.O, s.batch_sizes)), st2, iters=10)
    print(f"  M-step masks:                    {t*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
