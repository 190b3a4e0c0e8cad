#!/usr/bin/env python
"""Engine-level anatomy of the permute (reference-exact) iteration.

The component tool (exp_permute_breakdown.py) stacks the SAME
permutation for its fused-phase anchors, which lets XLA CSE the
per-round make_blocks + layout gathers across rounds — its marginal
round cost is therefore kernel-only. This tool measures the real
engine path (distinct per-round permutations, as drawn in
engine.cluster) phase by phase with the robust two-point method:

  cluster_pallas   engine.cluster with estep_impl='pallas' (fused phase)
  cluster_xla      engine.cluster with estep_impl='xla'
  correct_dense    engine.correct (dense one-hot M-step)
  round_pallas     engine.harmony_round (cluster + correct, pallas)
  phase4_distinct  pallas_permute_phase with 4 distinct perms
  materialize      the natural-order final-R kernel alone (phase with
                   0-round tail is not expressible; measured as
                   phase1_distinct - (phase4_distinct-phase1_distinct)/3)

Usage: python tools/exp_permute_engine.py [--cells 500000] ...
"""

import argparse
import dataclasses
import time
from functools import partial

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

    from harmony_tpu import engine as eng
    from harmony_tpu.config import finalize_engine_config, harmony_options
    from harmony_tpu.preprocess import (
        build_design, expand_hyperparams, resolve_config,
    )
    from harmony_tpu.runtime import enable_compilation_cache
    from harmony_tpu.state import init_state

    enable_compilation_cache()

    N, d, K, B = args.cells, args.dims, args.nclust, args.batches
    reps = args.reps
    rng = np.random.default_rng(0)
    design = build_design({"dataset": rng.integers(0, B, N)}, ["dataset"])
    base = resolve_config(
        n_cells=N, d=d, design=design, nclust=K,
        max_iter=4 * reps + 8, early_stop=False,
        options=harmony_options(), verbose=False,
    )
    hp = expand_hyperparams(design, base.K, None, 0.1, 1.0, 0.0)
    Z = rng.standard_normal((d, N), dtype=np.float32)

    def build(estep):
        cfg = dataclasses.replace(
            base, shuffle_mode="permute", estep_impl=estep
        )
        cfg = finalize_engine_config(cfg, None)
        st = init_state(
            cfg, Z, design, hp.sigma, hp.theta, hp.lamb,
            jax.random.PRNGKey(0),
        )
        st = jax.jit(partial(eng.init_cluster, cfg))(st)
        onehots = tuple(
            jax.nn.one_hot(st.codes[c], cfg.B_vec[c], dtype=jnp.float32)
            for c in range(cfg.n_covariates)
        )
        return cfg, st, onehots

    cfg_p, st_p, oh_p = build("pallas")
    cfg_x, st_x, _ = build("xla")

    def chain(fn, n):
        def run(s):
            out = jax.lax.scan(lambda c, _: (fn(c), None), s, None, length=n)[0]
            return out
        return jax.jit(run)

    def measure(name, fn, st, n_hi=reps):
        lo_f, hi_f = chain(fn, 2), chain(fn, n_hi)
        s = lo_f(st); np.asarray(s.O)
        s = hi_f(st); np.asarray(s.O)
        deltas = []
        for _ in range(5):
            t0 = time.perf_counter()
            s = lo_f(st); np.asarray(s.O)
            t_lo = time.perf_counter() - t0
            t0 = time.perf_counter()
            s = hi_f(st); np.asarray(s.O)
            t_hi = time.perf_counter() - t0
            if t_hi > t_lo:
                deltas.append((t_hi - t_lo) / (n_hi - 2))
        per = float(np.median(deltas)) if deltas else float("nan")
        print(f"{name:18s}: {per*1e3:8.2f} ms/pass", flush=True)
        return per

    measure("cluster_pallas", partial(eng.cluster, cfg_p), st_p)
    measure("cluster_xla", partial(eng.cluster, cfg_x), st_x)
    measure(
        "correct_dense", partial(eng.correct, cfg_p, onehots=oh_p), st_p
    )
    measure(
        "round_pallas",
        partial(eng.harmony_round, cfg_p, onehots=oh_p), st_p,
    )

    # fused phase with DISTINCT per-round perms (no cross-round CSE)
    from harmony_tpu.ops.pallas_estep import pallas_permute_phase

    perms = {
        n: jnp.stack(
            [
                jnp.asarray(rng.permutation(N).astype(np.int32))
                for _ in range(n)
            ]
        )
        for n in (1, 4)
    }
    Zn = st_p.Z_corr / jnp.linalg.norm(st_p.Z_corr, axis=0, keepdims=True)

    class _Box:
        def __init__(self, x):
            self.O = x

    def phase_fn(pn):
        def f(x):
            out = pallas_permute_phase(
                cfg_p, Zn, st_p.Y, st_p.E, st_p.O, st_p.codes,
                st_p.Pr_b, st_p.sigma, st_p.theta, pn,
            )
            return x + jnp.sum(out.R[:, ::65536]) * 1e-20
        def run_n(n):
            def run(x0):
                out = jax.lax.scan(
                    lambda c, _: (f(c), None), x0, None, length=n
                )[0]
                return out
            return jax.jit(run)
        return run_n

    for label, pn in (("phase1_distinct", perms[1]), ("phase4_distinct", perms[4])):
        runner = phase_fn(pn)
        lo_f, hi_f = runner(2), runner(reps)
        x0 = jnp.float32(0.0)
        float(np.asarray(lo_f(x0))); float(np.asarray(hi_f(x0)))
        deltas = []
        for _ in range(5):
            t0 = time.perf_counter()
            float(np.asarray(lo_f(x0)))
            t_lo = time.perf_counter() - t0
            t0 = time.perf_counter()
            float(np.asarray(hi_f(x0)))
            t_hi = time.perf_counter() - t0
            if t_hi > t_lo:
                deltas.append((t_hi - t_lo) / (reps - 2))
        per = float(np.median(deltas)) if deltas else float("nan")
        print(f"{label:18s}: {per*1e3:8.2f} ms/pass", flush=True)


if __name__ == "__main__":
    main()
