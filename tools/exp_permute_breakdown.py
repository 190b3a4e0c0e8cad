#!/usr/bin/env python
"""Component breakdown of the reference-exact 'permute' E-step round.

The permute schedule (fresh random cell permutation per clustering round,
src/harmony.cpp:272-273) measured ~3.4M cells/s at 500k — ~30x below the
rotate schedule (PERFORMANCE.md). This tool attributes a round's wall to
its components with the robust two-point method (median of repeated
deltas over scan-chained invocations — naive slopes are unreliable over
the remote tunnel, CLAUDE.md):

  perm_draw   jax.random.permutation(N) + make_blocks
  gather_R    pad1(R)[:, flat_idx] (the K x N indexed gather)
  gather_Z    pad1(Z)[:, flat_idx]
  oh_build    the (L, B) one-hot layout build from gathered codes
  old_stats   the (nb, K) + (nb, K, B) old-block einsums over R_lay
  kernel      the fused Pallas round kernel body (pallas_estep)
  scatter     R_flat[:, pos] back to natural order
  round_pallas  the whole production pallas_block_update_round
  round_xla     the whole ops.estep.block_update_round

CAVEAT (round 4): several of these anchors are now known to be
unrepresentative — strided-slice consumers let XLA elide gather work,
and fixing the permutation across scan iterations lets it hoist the
loop-invariant layout gathers. Use exp_round_fresh.py /
exp_phase_ablate.py / exp_gather_variants.py for decision-grade
numbers; this tool is kept for the honest anchors (perm_draw, perm_sort,
gather_R, scatter, round_*) and as a record of the methodology trap.

Usage: python tools/exp_permute_breakdown.py [--cells 500000] ...
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
    ap.add_argument("--reps", type=int, default=10)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from harmony_tpu.config import harmony_options
    from harmony_tpu.ops.assign import make_blocks
    from harmony_tpu.ops.estep import block_update_round
    from harmony_tpu.ops.pallas_estep import pallas_block_update_round
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
    key = jax.random.PRNGKey(0)
    Z = jax.random.normal(key, (d, N), jnp.float32)
    Zn = Z / jnp.linalg.norm(Z, axis=0, keepdims=True)
    Y = jax.random.normal(key, (d, K), jnp.float32)
    Yn = Y / jnp.linalg.norm(Y, axis=0, keepdims=True)
    R0 = jax.nn.softmax(jax.random.normal(key, (K, N), jnp.float32), axis=0)
    codes = jnp.asarray(design.codes)
    Pr_b = jnp.bincount(codes[0], length=B).astype(jnp.float32) / N
    E0 = jnp.sum(R0, axis=1, keepdims=True) * Pr_b[None, :]
    oh_full = jax.nn.one_hot(codes[0], B, dtype=jnp.float32)
    O0 = jnp.dot(R0, oh_full, preferred_element_type=jnp.float32)
    sigma = jnp.full((K,), 0.1, jnp.float32)
    theta = jnp.full((B,), 2.0, jnp.float32)
    perm = jnp.asarray(rng.permutation(N).astype(np.int32))

    idx, mask = make_blocks(cfg, perm)
    flat_idx = idx.reshape(-1)
    L = flat_idx.shape[0]
    pos = jnp.full((N + 1,), L, dtype=jnp.int32)
    pos = pos.at[flat_idx].set(jnp.arange(L, dtype=jnp.int32))
    pad1 = lambda X: jnp.concatenate(
        [X, jnp.zeros((*X.shape[:-1], 1), X.dtype)], axis=-1
    )
    nb = cfg.n_blocks
    S_pad = L // nb

    def f_perm(x):
        p = jax.random.permutation(
            jax.random.fold_in(key, x[0, 0].astype(jnp.int32)), N
        ).astype(jnp.int32)
        i, m = make_blocks(cfg, p)
        return x + (jnp.sum(i[:, :1]) + jnp.sum(m[:, :1])).astype(
            jnp.float32
        ) * 1e-20

    def f_gather_R(x):
        return pad1(x)[:, flat_idx][:, : x.shape[1]]

    def f_gather_Z(x):
        g = pad1(Zn)[:, flat_idx]
        return x + jnp.sum(g[:, ::4096]) * 1e-20

    def f_oh(x):
        c_lay = pad1(codes)[:, flat_idx]
        b_ids = jnp.arange(B, dtype=jnp.int32)
        oh = (c_lay[0][:, None] == b_ids).astype(jnp.float32)
        return x + jnp.sum(oh[::4096]) * 1e-20

    def f_oldstats(x):
        R_old = pad1(x)[:, flat_idx].reshape(K, nb, S_pad)
        rsum_old = jnp.einsum("kbs->bk", R_old)
        oh = (pad1(codes)[:, flat_idx][0][:, None]
              == jnp.arange(B, dtype=jnp.int32)).astype(jnp.float32)
        O_old = jnp.einsum(
            "kbs,bsc->bkc", R_old, oh.reshape(nb, S_pad, B),
            preferred_element_type=jnp.float32,
        )
        return x + (jnp.sum(rsum_old) + jnp.sum(O_old)) * 1e-20

    def f_scatter(x):
        R_flat = jnp.concatenate([x, jnp.zeros((K, 1), x.dtype)], axis=1)
        return R_flat[:, pos[:N]]

    def f_round_pallas(x):
        res = pallas_block_update_round(
            cfg, Zn, Yn, x, E0, O0, codes, Pr_b, sigma, theta, perm
        )
        return res.R

    def f_round_xla(x):
        res = block_update_round(
            cfg, Zn, Yn, x, E0, O0, codes, Pr_b, sigma, theta, perm
        )
        return res.R

    from harmony_tpu.ops.pallas_estep import pallas_permute_phase

    perms1 = perm[None, :]
    perms4 = jnp.stack([perm, perm, perm, perm])

    def f_phase1(x):
        out = pallas_permute_phase(
            cfg, Zn, Yn, E0, O0, codes, Pr_b, sigma, theta, perms1
        )
        return out.R + x * 1e-20

    def f_phase4(x):
        out = pallas_permute_phase(
            cfg, Zn, Yn, E0, O0, codes, Pr_b, sigma, theta, perms4
        )
        return out.R + x * 1e-20

    def f_perm_sort(x):
        p = jax.random.permutation(
            jax.random.fold_in(key, x[0, 0].astype(jnp.int32)), N
        )
        return x + p[0].astype(jnp.float32) * 1e-20

    def reps_fn(f, n):
        def body(x, _):
            return f(x), None

        def run(x0):
            out, _ = jax.lax.scan(body, x0, None, length=n)
            return jnp.sum(out[:, ::4096])

        return jax.jit(run)

    cases = [
        ("perm_draw", f_perm, 16),
        ("perm_sort", f_perm_sort, 16),
        ("gather_R", f_gather_R, 16),
        ("gather_Z", f_gather_Z, 16),
        ("oh_build", f_oh, 16),
        ("old_stats", f_oldstats, 16),
        ("scatter", f_scatter, 16),
        ("round_pallas", f_round_pallas, args.reps),
        ("round_xla", f_round_xla, args.reps),
        ("fused_phase1", f_phase1, args.reps),
        ("fused_phase4", f_phase4, args.reps),
    ]
    for name, f, n_hi in cases:
        lo_f, hi_f = reps_fn(f, 2), reps_fn(f, n_hi)
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
                deltas.append((t_hi - t_lo) / (n_hi - 2))
        per = float(np.median(deltas)) if deltas else float("nan")
        print(f"{name:14s}: {per*1e3:8.2f} ms/pass")


if __name__ == "__main__":
    main()
