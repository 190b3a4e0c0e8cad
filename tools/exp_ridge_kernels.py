#!/usr/bin/env python
"""Isolated cost of the M-step pallas kernels vs their XLA equivalents.

Amortises dispatch by chaining 10 dependent calls inside one jit.
"""

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


def bench_fn(fn, *args, iters=5, fetch=None):
    out = fn(*args)
    _sync(out if fetch is None else fetch(out))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _sync(out if fetch is None else fetch(out))
    return (time.perf_counter() - t0) / iters, out


def main():
    import jax
    import jax.numpy as jnp

    from harmony_tpu.runtime import enable_compilation_cache

    enable_compilation_cache()

    from harmony_tpu.bench import make_synthetic_cells
    from harmony_tpu.config import harmony_options
    from harmony_tpu.preprocess import (
        build_design, expand_hyperparams, orient_embedding, resolve_config,
    )
    from harmony_tpu.state import init_state
    from harmony_tpu.ops.pallas_ridge import pallas_correction, pallas_moments

    n_cells = 500_000
    d, n_batches, nclust = 50, 10, 100
    Z, batches = make_synthetic_cells(n_cells, d, n_batches, seed=0)
    design = build_design({"dataset": batches}, ["dataset"])
    Zt = orient_embedding(Z, n_cells)
    options = harmony_options()
    cfg = resolve_config(
        n_cells=n_cells, d=d, design=design, nclust=nclust, max_iter=3,
        early_stop=False, options=options, verbose=False,
    )
    hp = expand_hyperparams(design, cfg.K, None, 0.1, 1.0, options.tau)
    key = jax.random.PRNGKey(0)
    state = init_state(cfg, Zt, design, hp.sigma, hp.theta, hp.lamb, key)
    K, B, Np = cfg.K, cfg.B, cfg.Np
    f32 = jnp.float32
    R = jax.random.uniform(key, (K, Np), f32)
    R = R / R.sum(0, keepdims=True)
    Zf = state.Z_orig.astype(f32)
    oh = jax.nn.one_hot(state.codes[0], B, dtype=f32)
    W = jax.random.normal(key, (K, B, d), f32) * 0.01
    print(f"N={n_cells} K={K} B={B} d={d}", flush=True)

    # chain 10 dependent moment calls: perturb R by a scalar derived from
    # the previous output so calls can't be reordered/deduped
    def chain_moments(R):
        acc = jnp.float32(0)
        for _ in range(10):
            M = pallas_moments(cfg, R, Zf, oh)
            s = jnp.tanh(M[0, 0, 0]) * 1e-6
            R = R + s
            acc = acc + M.sum()
        return acc

    def chain_moments_xla(R):
        acc = jnp.float32(0)
        Z_aug = jnp.concatenate([Zf, jnp.ones((1, Np), f32)], axis=0)
        for _ in range(10):
            M = jnp.einsum("kn,nb,dn->kbd", R, oh, Z_aug,
                           preferred_element_type=f32)
            s = jnp.tanh(M[0, 0, 0]) * 1e-6
            R = R + s
            acc = acc + M.sum()
        return acc

    def chain_corr(R):
        acc = jnp.float32(0)
        for _ in range(10):
            Zc = pallas_correction(cfg, W, R, Zf, oh)
            s = jnp.tanh(Zc[0, 0]) * 1e-6
            R = R + s
            acc = acc + Zc[0].sum()
        return acc

    def chain_corr_xla(R):
        acc = jnp.float32(0)
        for _ in range(10):
            corr = jnp.einsum("kn,nb,kbd->dn", R, oh, W,
                              preferred_element_type=f32)
            s = jnp.tanh(corr[0, 0]) * 1e-6
            R = R + s
            acc = acc + corr[0].sum()
        return acc

    for name, fn in [
        ("pallas moments x10", chain_moments),
        ("xla    moments x10", chain_moments_xla),
        ("pallas correct x10", chain_corr),
        ("xla    correct x10", chain_corr_xla),
    ]:
        t, _ = bench_fn(jax.jit(fn), R, iters=5)
        print(f"{name}: {t*1e3:8.2f} ms  ({t*1e2:6.2f} ms/call)", flush=True)


if __name__ == "__main__":
    main()
