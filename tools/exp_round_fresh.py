#!/usr/bin/env python
"""Honest per-round costs with FRESH in-graph permutations.

The exp_permute_breakdown round anchors fixed the permutation across
scan iterations, which lets XLA hoist the loop-invariant Z/codes layout
gathers out of the timing loop — they time only the R-dependent work.
Here each scan iteration draws its own permutation (fold_in on the
carried counter), matching what engine.cluster really does:

  round_xla_fresh      ops.estep.block_update_round
  round_pallas_fresh   ops.pallas_estep.pallas_block_update_round
  zgather_einsum       the (d, N) layout gather consumed by an einsum
                       (no barrier) — tests whether consumer/layout
                       choice, not the gather op, explains the gap

Usage: python tools/exp_round_fresh.py [--cells 500000]
"""

import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cells", type=int, default=500_000)
    ap.add_argument("--dims", type=int, default=50)
    ap.add_argument("--batches", type=int, default=10)
    ap.add_argument("--nclust", type=int, default=100)
    ap.add_argument("--reps", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from harmony_tpu.config import harmony_options
    from harmony_tpu.ops.estep import block_update_round
    from harmony_tpu.ops.pallas_estep import pallas_block_update_round
    from harmony_tpu.preprocess import build_design, resolve_config
    from harmony_tpu.runtime import enable_compilation_cache

    enable_compilation_cache()

    N, d, K, B = args.cells, args.dims, args.nclust, args.batches
    reps = args.reps
    rng = np.random.default_rng(0)
    design = build_design({"dataset": rng.integers(0, B, N)}, ["dataset"])
    cfg = resolve_config(
        n_cells=N, d=d, design=design, nclust=K, max_iter=3,
        early_stop=False, options=harmony_options(), verbose=False,
    )
    f32 = jnp.float32
    key = jax.random.PRNGKey(0)
    Z = jax.random.normal(key, (d, N), f32)
    Zn = Z / jnp.linalg.norm(Z, axis=0, keepdims=True)
    Y = jax.random.normal(key, (d, K), f32)
    Yn = Y / jnp.linalg.norm(Y, axis=0, keepdims=True)
    R0 = jax.nn.softmax(jax.random.normal(key, (K, N), f32), axis=0)
    codes = jnp.asarray(design.codes)
    Pr_b = jnp.bincount(codes[0], length=B).astype(f32) / N
    E0 = jnp.sum(R0, axis=1, keepdims=True) * Pr_b[None, :]
    oh_full = jax.nn.one_hot(codes[0], B, dtype=f32)
    O0 = jnp.dot(R0, oh_full, preferred_element_type=f32)
    sigma = jnp.full((K,), 0.1, f32)
    theta = jnp.full((B,), 2.0, f32)

    def draw(it):
        return jax.random.permutation(
            jax.random.fold_in(key, it.astype(jnp.int32)), N
        ).astype(jnp.int32)

    def round_fn(impl):
        fn = (
            pallas_block_update_round
            if impl == "pallas"
            else block_update_round
        )

        def f(R, it):
            perm = draw(it)
            res = fn(
                cfg, Zn, Yn, R, E0, O0, codes, Pr_b, sigma, theta, perm
            )
            return res.R

        return f

    from harmony_tpu.ops.assign import make_blocks

    def zg_einsum(R, it):
        perm = draw(it)
        idx, mask = make_blocks(cfg, perm)
        pad1 = lambda X: jnp.concatenate(
            [X, jnp.zeros((*X.shape[:-1], 1), X.dtype)], axis=-1
        )
        Z_blk = pad1(Zn)[:, idx]  # (d, nb, S)
        R_blk = pad1(R)[:, idx]
        # consumers shaped like the round's old-stats einsums
        s = jnp.einsum("kbs->bk", R_blk)
        z = jnp.einsum("dbs,bs->bd", Z_blk, mask.astype(f32))
        return R + (jnp.sum(s) + jnp.sum(z)) * 1e-20

    def measure(name, f):
        def runner(n):
            def body(c, _):
                R, it = c
                return (f(R, it), it + 1), None

            def run(R0_):
                (Rn, _), _ = jax.lax.scan(
                    body, (R0_, jnp.int32(0)), None, length=n
                )
                return jnp.sum(Rn[:, ::65536])

            return jax.jit(run)

        lo_f, hi_f = runner(2), runner(reps)
        float(np.asarray(lo_f(R0)))
        float(np.asarray(hi_f(R0)))
        deltas = []
        for _ in range(5):
            t0 = time.perf_counter()
            float(np.asarray(lo_f(R0)))
            t_lo = time.perf_counter() - t0
            t0 = time.perf_counter()
            float(np.asarray(hi_f(R0)))
            t_hi = time.perf_counter() - t0
            if t_hi > t_lo:
                deltas.append((t_hi - t_lo) / (reps - 2))
        per = float(np.median(deltas)) if deltas else float("nan")
        print(f"{name:20s}: {per*1e3:8.2f} ms/pass", flush=True)

    measure("round_xla_fresh", round_fn("xla"))
    measure("round_pallas_fresh", round_fn("pallas"))
    measure("zgather_einsum", zg_einsum)


if __name__ == "__main__":
    main()
