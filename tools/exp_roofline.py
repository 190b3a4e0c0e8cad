#!/usr/bin/env python
"""Roofline anchors for the E-step's cost model on the local accelerator.

Times primitive kernels standing in for the round kernel's component ops
with the robust two-point method bench.py uses (median of repeated
deltas, many repetitions per leg — tools/exp_* naive slopes are
unreliable over the remote tunnel, CLAUDE.md):

  * exp-chain: exp((g-1)*c) * pc + column normalise over a (K, N) array —
    the per-round VPU work of the fused round kernel's assign step;
  * stream: elementwise read+write of the (K, N) array — HBM bound;
  * gram: (K, d) x (d, N) matmul — the MXU work.

Large-B anchors (--batches > 32; the VERDICT r3 #2 B=100 roofline —
each models the op the production kernel actually runs at B > 32 with
a batch-tiled layout, ops/pallas_rotate.py _round_kernel_v2):

  * blkstat: one round's per-block sequential K x B work — remove the
    block's stats from (E, O), rebuild the penalty table
    ((2E+1)/(O+E+1))^theta and its log, commit the pending stats — as a
    lax.scan over the n_blocks blocks (the real kernel runs this once
    per block boundary, n_blocks times per round);
  * pc_runbcast: the large-B penalty gather: per grid tile a
    (K, B) x (B, rsub) run-penalty matmul + lane-broadcast of each run
    column over its 128-cell run, materialising the (K, N) pc operand;
  * tO_runsum: the per-tile stat contraction: per-run row sums of the
    (K, N) assignments + a (K, rsub) x (rsub, B) commit matmul;
  * moment_fused: the last round's fused M-step moment accumulation —
    per-sub-tile (K, 128-cell) x (128-cell, d) matmuls accumulated into
    the (n_joint+1, K, d+1) table (amortised over the 4 rounds of one
    iteration in the summary line, since it runs once per iteration).

One Harmony iteration runs ~max_iter_cluster E-step rounds + the M-step;
comparing round_components x rounds (+ moment) against bench.py's
per-iteration wall shows how close the engine sits to the component
bound.

Usage:
    python tools/exp_roofline.py [--cells 500000] [--batches 10]
        [--nclust 100] [--dims 50] [--rounds 4] [--tile 4096]
"""

import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cells", type=int, default=500_000)
    ap.add_argument("--batches", type=int, default=10)
    ap.add_argument("--nclust", type=int, default=100)
    ap.add_argument("--dims", type=int, default=50)
    ap.add_argument("--rounds", type=int, default=4,
                    help="E-step rounds per harmony iteration")
    ap.add_argument("--tile", type=int, default=4096,
                    help="grid tile width (estep_sub_tile)")
    ap.add_argument("--run", type=int, default=128,
                    help="batch-pure run width (mstep_tile)")
    ap.add_argument("--blocks", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from harmony_tpu.runtime import enable_compilation_cache

    enable_compilation_cache()

    K, N, d, B = args.nclust, args.cells, args.dims, args.batches
    T, RUN = args.tile, args.run
    key = jax.random.PRNGKey(0)
    g = jax.random.uniform(key, (K, N), jnp.float32)
    Z = jax.random.normal(key, (d, N), jnp.float32)
    Y = jax.random.normal(key, (K, d), jnp.float32)
    pc = jax.random.uniform(key, (K, N), jnp.float32)
    c = jnp.float32(20.0)
    theta = jnp.full((B,), 2.0, jnp.float32)
    Pr = jax.random.uniform(key, (B,), jnp.float32)
    run_codes = jax.random.randint(key, (N // RUN,), 0, B)
    run_oh = jax.nn.one_hot(run_codes, B, dtype=jnp.float32)  # (nruns, B)
    n_joint = B
    run_joint = run_codes  # single covariate: joint id == batch id

    def reps(f, n):
        # the big (K, N)/(d, N) operands ride as ARGUMENTS, not closures:
        # closed-over device arrays inline into the HLO as literals, and
        # at 1M x 100 the remote-compile request then exceeds the
        # tunnel's body-size limit (HTTP 413)
        def run(x0, pc_, Z_):
            def body(x, _):
                return f(x, pc_, Z_), None

            out, _ = jax.lax.scan(body, x0, None, length=n)
            # scalar result: the host fetch that synchronises each timed
            # leg must not stream the (K, N) array over the tunnel (its
            # multi-second transfer variance would swamp the delta); the
            # sum depends on every element so the scan cannot dead-code
            return jnp.sum(out)

        return jax.jit(run)

    def exp_chain(x, pc_, Z_):
        e = jnp.exp((x - 1.0) * c)
        w = e * pc_
        s = jnp.sum(w, axis=0, keepdims=True)
        return w / jnp.where(s == 0, 1.0, s)

    def stream(x, pc_, Z_):
        return x * 1.0000001 + 0.5

    def gram(x, pc_, Z_):
        return jnp.dot(Y + x[0, 0], Z_, preferred_element_type=jnp.float32)

    def blkstat(x, pc_, Z_):
        # one ROUND of per-block stat maintenance: n_blocks sequential
        # (remove block stats -> penalty table + log -> commit) passes
        # over the (K, B) E/O tables (kernel: _round_kernel_v2 first/last
        # block sections)
        E0 = jnp.abs(x[:, :B]) + 1.0
        O0 = jnp.abs(x[:, B : 2 * B]) + 1.0
        blkO = jnp.abs(x[:, 2 * B : 3 * B]) * (1.0 / args.blocks)

        def body(carry, _):
            E, O, acc = carry
            rb = jnp.sum(blkO[:, :B], axis=1, keepdims=True)
            E = E - rb * Pr[None, :]
            O = O - blkO
            ratio = (2.0 * E + 1.0) / (O + E + 1.0)
            pen = ratio ** theta[None, :]
            logpen = jnp.log(ratio) * theta[None, :]
            E = E + rb * Pr[None, :]
            O = O + blkO
            return (E, O, acc + jnp.sum(pen) + jnp.sum(logpen)), None

        (E, O, acc), _ = jax.lax.scan(
            body, (E0, O0, jnp.float32(0.0)), None, length=args.blocks
        )
        return x + acc * 1e-20

    Nr = (N // RUN) * RUN  # run-aligned prefix (N need not divide RUN)

    def pc_runbcast(x, pc_, Z_):
        # large-B penalty operand: (K, B) x (B, nruns) + broadcast each
        # run column over its RUN cells -> (K, N)
        pen = jnp.abs(x[:, :B]) + 0.5  # (K, B) stand-in table
        pen_run = jnp.dot(pen, run_oh.T, preferred_element_type=jnp.float32)
        full = jnp.repeat(pen_run, RUN, axis=1)  # (K, Nr)
        if Nr != N:
            full = jnp.pad(full, ((0, 0), (0, N - Nr)))
        return x * 1.0 + full * 1e-20

    def tO_runsum(x, pc_, Z_):
        rs = jnp.sum(x[:, :Nr].reshape(K, N // RUN, RUN), axis=2)  # (K, nruns)
        tO = jnp.dot(rs, run_oh, preferred_element_type=jnp.float32)
        return x + jnp.sum(tO) * 1e-20

    def moment_fused(x, pc_, Z_):
        # fused M-step moments: segment-sum the (K, N) x (N, d)
        # contraction into n_joint rows (the kernel does this as
        # per-sub-tile matmuls + table accumulates; the segment_sum form
        # lower-bounds the same arithmetic)
        S = jax.lax.dot_general(
            x[:, :Nr].reshape(K, N // RUN, RUN),
            Z_[:, :Nr].reshape(d, N // RUN, RUN),
            dimension_numbers=(((2,), (2,)), ((1,), (1,))),
            preferred_element_type=jnp.float32,
        )  # (nruns, K, d)
        M = jax.ops.segment_sum(S, run_joint, num_segments=n_joint + 1)
        return x + jnp.sum(M) * 1e-20

    prims = [
        ("exp_chain", exp_chain, g, 64),
        ("stream", stream, g, 256),
        ("gram", gram, g, 256),
    ]
    if B > 32:
        prims += [
            ("blkstat", blkstat, g, 64),
            ("pc_runbcast", pc_runbcast, g, 64),
            ("tO_runsum", tO_runsum, g, 64),
            ("moment_fused", moment_fused, g, 64),
        ]

    results = {}
    for name, f, x0, n_hi in prims:
        lo_f, hi_f = reps(f, 8), reps(f, n_hi)
        # warm-up / compile
        float(np.asarray(lo_f(x0, pc, Z)))
        float(np.asarray(hi_f(x0, pc, Z)))
        deltas = []
        for _ in range(5):
            t0 = time.perf_counter()
            float(np.asarray(lo_f(x0, pc, Z)))
            t_lo = time.perf_counter() - t0
            t0 = time.perf_counter()
            float(np.asarray(hi_f(x0, pc, Z)))
            t_hi = time.perf_counter() - t0
            if t_hi > t_lo:
                deltas.append((t_hi - t_lo) / (n_hi - 8))
        per = float(np.median(deltas)) if deltas else float("nan")
        results[name] = per
        el = K * N
        print(
            f"{name:12s}: {per*1e3:8.3f} ms/pass  "
            f"({el/per/1e9:7.1f} G elem/s; x{args.rounds} rounds = "
            f"{args.rounds*per*1e3:6.2f} ms)"
        )

    if B > 32:
        per_round = sum(
            results[k]
            for k in ("exp_chain", "gram", "blkstat", "pc_runbcast",
                      "tO_runsum")
        )
        bound = args.rounds * per_round + results["moment_fused"]
        print(json.dumps({
            "metric": "largeb_component_bound_ms_per_iter",
            "value": round(bound * 1e3, 3),
            "per_round_ms": round(per_round * 1e3, 3),
            "components_ms": {
                k: round(v * 1e3, 4) for k, v in results.items()
            },
            "shape": {"N": N, "K": K, "d": d, "B": B, "T": T, "run": RUN},
            "note": "sum of measured component passes x rounds + fused "
            "moments; excludes the correction (M-step solve + Z_corr "
            "update) and the final-round R write",
        }))


if __name__ == "__main__":
    main()
