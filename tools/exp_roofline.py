#!/usr/bin/env python
"""Roofline anchors for the E-step's cost model on the local accelerator.

Times three primitive kernels at the canonical shape (K=100, N=500k,
d=50) with the same robust two-point method as bench.py (median of
repeated deltas, many repetitions per leg — tools/exp_* naive slopes are
unreliable over the remote tunnel, CLAUDE.md):

  * exp-chain: exp((g-1)*c) * pc + column normalise over a (K, N) array —
    the per-round VPU work of the fused round kernel's assign step;
  * stream: elementwise read+write of the (K, N) array — HBM bound;
  * gram: (K, d) x (d, N) matmul — the MXU work.

One Harmony iteration runs ~4 E-step rounds (each one exp-chain + one
gram over all cells) + the M-step; comparing 4x the measured exp-chain
time against bench.py's per-iteration wall shows how close the engine
sits to the elementwise-transcendental roofline.
"""

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from harmony_tpu.runtime import enable_compilation_cache

    enable_compilation_cache()

    K, N, d = 100, 500_000, 50
    key = jax.random.PRNGKey(0)
    g = jax.random.uniform(key, (K, N), jnp.float32)
    Z = jax.random.normal(key, (d, N), jnp.float32)
    Y = jax.random.normal(key, (K, d), jnp.float32)
    pc = jax.random.uniform(key, (K, N), jnp.float32)
    c = jnp.float32(20.0)

    def reps(f, n):
        def body(x, _):
            return f(x), None
        def run(x0):
            out, _ = jax.lax.scan(body, x0, None, length=n)
            # scalar result: the host fetch that synchronises each timed
            # leg must not stream the (K, N) array over the tunnel (its
            # multi-second transfer variance would swamp the delta); the
            # sum depends on every element so the scan cannot dead-code
            return jnp.sum(out)
        return jax.jit(run)

    def exp_chain(x):
        e = jnp.exp((x - 1.0) * c)
        w = e * pc
        s = jnp.sum(w, axis=0, keepdims=True)
        return w / jnp.where(s == 0, 1.0, s)

    def stream(x):
        return x * 1.0000001 + 0.5

    def gram(x):
        return jnp.dot(Y + x[0, 0], Z, preferred_element_type=jnp.float32)

    for name, f, x0, n_hi in (
        ("exp_chain", exp_chain, g, 64),
        ("stream", stream, g, 256),
        ("gram", gram, g, 256),
    ):
        lo_f, hi_f = reps(f, 8), reps(f, n_hi)
        # warm-up / compile
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
                deltas.append((t_hi - t_lo) / (n_hi - 8))
        per = float(np.median(deltas)) if deltas else float("nan")
        el = K * N
        print(
            f"{name:10s}: {per*1e3:8.3f} ms/pass  "
            f"({el/per/1e9:7.1f} G elem/s; x4 rounds = {4*per*1e3:6.2f} ms)"
        )


if __name__ == "__main__":
    main()
