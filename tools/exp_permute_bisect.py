#!/usr/bin/env python
"""Bisect the real (distinct-perm) fused-permute round cost.

exp_permute_engine.py showed a distinct-perm round costs ~58 ms while
the same-perm marginal is ~4 ms — the index-dependent per-round work is
the gap, but the component anchors in exp_permute_breakdown.py understate
it (their strided-slice consumers let XLA elide most of each gather).
This tool measures cumulative honest stages of the EXACT round
composition from ops/pallas_estep.pallas_permute_phase, each consuming
its full result (jnp.sum over everything), with a fresh permutation per
scan iteration (fold_in on a carried counter), two-point timed.

Usage: python tools/exp_permute_bisect.py [--cells 500000] ...
"""

import argparse
import time
from functools import partial

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cells", type=int, default=500_000)
    ap.add_argument("--dims", type=int, default=50)
    ap.add_argument("--batches", type=int, default=10)
    ap.add_argument("--nclust", type=int, default=100)
    ap.add_argument("--reps", type=int, default=10)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from harmony_tpu.config import harmony_options
    from harmony_tpu.ops.assign import make_blocks
    from harmony_tpu.preprocess import build_design, resolve_config
    from harmony_tpu.runtime import enable_compilation_cache

    enable_compilation_cache()

    N, d, K, B = args.cells, args.dims, args.nclust, args.batches
    rng = np.random.default_rng(0)
    design = build_design({"dataset": rng.integers(0, B, N)}, ["dataset"])
    cfg = resolve_config(
        n_cells=N, d=d, design=design, nclust=K, max_iter=3,
        early_stop=False, options=harmony_options(), verbose=False,
    )
    f32 = jnp.float32
    key = jax.random.PRNGKey(0)
    Zf = jax.random.normal(key, (d, N), f32)
    Zf = Zf / jnp.linalg.norm(Zf, axis=0, keepdims=True)
    Yt = jax.random.normal(key, (K, d), f32)
    codes = jnp.asarray(design.codes)
    Pr_b = jnp.bincount(codes[0], length=B).astype(f32) / N
    sigma = jnp.full((K,), 0.1, f32)
    theta = jnp.full((B,), 2.0, f32)
    E0 = jnp.abs(jax.random.normal(key, (K, B), f32)) * (N / (K * B))
    O0 = jnp.abs(jax.random.normal(key, (K, B), f32)) * (N / (K * B))

    nb = cfg.n_blocks
    nbp = nb + 1
    Np = cfg.Np
    sub_tile = cfg.estep_sub_tile
    offsets = cfg.covariate_offsets
    pen_ones = jnp.ones((K, nbp * B), f32)
    blk_ones = jnp.full((Np,), nb, jnp.int32)

    pad1 = lambda X: jnp.concatenate(
        [X, jnp.zeros((*X.shape[:-1], 1), X.dtype)], axis=-1
    )

    def draw(x):
        it = x[0].astype(jnp.int32)
        p = jax.random.permutation(jax.random.fold_in(key, it), N).astype(
            jnp.int32
        )
        return p

    def prep(p):
        idx, mask = make_blocks(cfg, p)
        S = idx.shape[1]
        nsub = max(1, -(-S // sub_tile))
        S_pad = nsub * sub_tile
        if S_pad != S:
            padw = ((0, 0), (0, S_pad - S))
            idx = jnp.pad(idx, padw, constant_values=Np)
            mask = jnp.pad(mask, padw, constant_values=False)
        L = nb * S_pad
        flat_idx = idx.reshape(-1)
        mf = mask.astype(f32).reshape(1, L)
        return flat_idx, mf, S_pad, nsub

    # cumulative stages; each returns (scalar contribution). Every stage
    # product passes through optimization_barrier so it MATERIALISES (the
    # real phase feeds these to pallas_call inputs, which cannot fuse) —
    # a jnp.sum consumer alone lets XLA fuse the gather into the
    # reduction, which lowers to a far slower path and would misattribute
    # the cost.
    def _mat(*xs):
        return jax.lax.optimization_barrier(xs)

    def _probe(x):
        # cheap consumer of a materialised array: touch one element
        return x.ravel()[0].astype(f32) * 1e-12

    def s1_draw(x):
        (p,) = _mat(draw(x))
        return _probe(p)

    def s2_blocks(x):
        p = draw(x)
        flat_idx, mf, _, _ = prep(p)
        flat_idx, mf = _mat(flat_idx, mf)
        return _probe(flat_idx) + _probe(mf)

    def s3_zlay(x):
        p = draw(x)
        flat_idx, mf, _, _ = prep(p)
        Z_lay = pad1(Zf)[:, flat_idx]
        (Z_lay,) = _mat(Z_lay)
        return _probe(Z_lay)

    def s3b_zrow(x):
        # candidate fix: row-major gather from an (N+1, d) table + one
        # transpose back to (d, L)
        p = draw(x)
        flat_idx, mf, _, _ = prep(p)
        lay = ZfT_pad[flat_idx, :]
        (lay,) = _mat(lay)
        Z_lay = lay.T
        (Z_lay,) = _mat(Z_lay)
        return _probe(Z_lay)

    def s4_alllay(x):
        p = draw(x)
        flat_idx, mf, _, _ = prep(p)
        Z_lay = pad1(Zf)[:, flat_idx]
        c_lay = pad1(codes)[:, flat_idx]
        blk_lay = jnp.concatenate(
            [blk_ones, jnp.full((1,), nb, jnp.int32)]
        )[flat_idx][None, :]
        Z_lay, c_lay, blk_lay = _mat(Z_lay, c_lay, blk_lay)
        return _probe(Z_lay) + _probe(c_lay) + _probe(blk_lay)

    def s5_scatter(x):
        p = draw(x)
        flat_idx, mf, S_pad, _ = prep(p)
        L = flat_idx.shape[0]
        slot_blk = jnp.arange(L, dtype=jnp.int32) // jnp.int32(S_pad)
        blk_nat = (
            jnp.zeros((Np + 1,), jnp.int32).at[flat_idx].set(slot_blk)
        )[:Np]
        Z_lay = pad1(Zf)[:, flat_idx]
        c_lay = pad1(codes)[:, flat_idx]
        blk_lay = jnp.concatenate(
            [blk_ones, jnp.full((1,), nb, jnp.int32)]
        )[flat_idx][None, :]
        Z_lay, c_lay, blk_lay, blk_nat = _mat(
            Z_lay, c_lay, blk_lay, blk_nat
        )
        return (
            _probe(Z_lay) + _probe(c_lay) + _probe(blk_lay)
            + _probe(blk_nat)
        )

    ZfT_pad = jnp.concatenate([Zf.T, jnp.zeros((1, d), f32)], axis=0)

    def reps_fn(f, n):
        def body(c, _):
            x, acc = c
            return (x + 1.0, acc + f(x)), None

        def run(x0):
            (_, acc), _ = jax.lax.scan(
                body, (x0, jnp.float32(0.0)), None, length=n
            )
            return acc

        return jax.jit(run)

    cases = [
        ("draw", s1_draw),
        ("+make_blocks", s2_blocks),
        ("+Z_lay gather", s3_zlay),
        ("+Z row-gather", s3b_zrow),
        ("+c/blk gathers", s4_alllay),
        ("+blk_nat scatter", s5_scatter),
    ]
    x0 = jnp.zeros((1,), f32)
    for name, f in cases:
        g = lambda xv, fn=f: fn(xv)
        lo_f, hi_f = reps_fn(g, 2), reps_fn(g, args.reps)
        float(np.asarray(lo_f(x0)))
        float(np.asarray(hi_f(x0)))
        deltas = []
        for _ in range(5):
            t0 = time.perf_counter()
            float(np.asarray(lo_f(x0)))
            t_lo = time.perf_counter() - t0
            t0 = time.perf_counter()
            float(np.asarray(hi_f(x0)))
            t_hi = time.perf_counter() - t0
            if t_hi > t_lo:
                deltas.append((t_hi - t_lo) / (args.reps - 2))
        per = float(np.median(deltas)) if deltas else float("nan")
        print(f"{name:18s}: {per*1e3:8.2f} ms/pass", flush=True)


if __name__ == "__main__":
    main()
