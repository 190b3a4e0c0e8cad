#!/usr/bin/env python
"""Why does the in-phase layout gather cost ~34 ms when the standalone
anchor measured 2.8 ms? Isolates the candidate causes at the canonical
shape (520k-slot block layout over 500k cells):

  input_idx      index passed as a per-iteration INPUT array (no in-graph
                 index computation) — matches the old anchor's setup
  graph_idx      index computed in-graph (sort + make_blocks) — matches
                 the real phase
  graph_noblocks index = the raw permutation (no make_blocks/pad)
  promise        graph_idx but gathered via .at[].get(
                 mode='promise_in_bounds', fill_value=None)
  take_clip      jnp.take(..., mode='clip')
  input_promise  input index + promise_in_bounds

All gathers materialise via optimization_barrier; two-point timed over a
scan chain.
"""

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from harmony_tpu.config import harmony_options
    from harmony_tpu.ops.assign import make_blocks
    from harmony_tpu.preprocess import build_design, resolve_config
    from harmony_tpu.runtime import enable_compilation_cache

    enable_compilation_cache()

    N, d, K, B = 500_000, 50, 100, 10
    reps = 10
    rng = np.random.default_rng(0)
    design = build_design({"dataset": rng.integers(0, B, N)}, ["dataset"])
    cfg = resolve_config(
        n_cells=N, d=d, design=design, nclust=K, max_iter=3,
        early_stop=False, options=harmony_options(), verbose=False,
    )
    f32 = jnp.float32
    key = jax.random.PRNGKey(0)
    Zf = jax.random.normal(key, (d, N), f32)
    Zp = jnp.concatenate([Zf, jnp.zeros((d, 1), f32)], axis=1)
    nb = cfg.n_blocks
    Np = cfg.Np
    sub_tile = cfg.estep_sub_tile

    def prep(p):
        idx, mask = make_blocks(cfg, p)
        S = idx.shape[1]
        nsub = max(1, -(-S // sub_tile))
        S_pad = nsub * sub_tile
        if S_pad != S:
            idx = jnp.pad(
                idx, ((0, 0), (0, S_pad - S)), constant_values=Np
            )
        return idx.reshape(-1)

    # precomputed per-iteration indices (input_idx case)
    idx_host = []
    for i in range(max(reps, 2)):
        p = jnp.asarray(rng.permutation(N).astype(np.int32))
        idx_host.append(np.asarray(prep(p)))
    idx_all = jnp.asarray(np.stack(idx_host))  # (reps, L)
    L = idx_all.shape[1]

    def draw(x):
        it = x.astype(jnp.int32)
        return jax.random.permutation(
            jax.random.fold_in(key, it), N
        ).astype(jnp.int32)

    bar = lambda *xs: jax.lax.optimization_barrier(xs)
    probe = lambda a: a.ravel()[0].astype(f32) * 1e-12

    def mk_input(mode):
        def f(x):
            it = x.astype(jnp.int32) % idx_all.shape[0]
            fi = jax.lax.dynamic_index_in_dim(
                idx_all, it, axis=0, keepdims=False
            )
            (fi,) = bar(fi)
            if mode == "promise":
                g = Zp.at[:, fi].get(mode="promise_in_bounds")
            else:
                g = Zp[:, fi]
            (g,) = bar(g)
            return probe(g)
        return f

    def mk_graph(mode, blocks=True):
        def f(x):
            p = draw(x)
            fi = prep(p) if blocks else p
            (fi,) = bar(fi)
            if mode == "promise":
                g = Zp.at[:, fi].get(mode="promise_in_bounds")
            elif mode == "clip":
                g = jnp.take(Zp, fi, axis=1, mode="clip")
            else:
                g = Zp[:, fi]
            (g,) = bar(g)
            return probe(g)
        return f

    cases = [
        ("input_idx", mk_input("default")),
        ("input_promise", mk_input("promise")),
        ("graph_idx", mk_graph("default")),
        ("graph_noblocks", mk_graph("default", blocks=False)),
        ("graph_promise", mk_graph("promise")),
        ("graph_take_clip", mk_graph("clip")),
    ]

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

    x0 = jnp.float32(0.0)
    for name, f in cases:
        lo_f, hi_f = reps_fn(f, 2), reps_fn(f, reps)
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
                deltas.append((t_hi - t_lo) / (reps - 2))
        per = float(np.median(deltas)) if deltas else float("nan")
        print(f"{name:16s}: {per*1e3:8.2f} ms/pass", flush=True)


if __name__ == "__main__" and not __import__("os").environ.get("GV_EXTRA"):
    main()


def extra():
    """2-D-index gather variants (the shape ops/estep.py uses)."""
    import jax
    import jax.numpy as jnp

    from harmony_tpu.config import harmony_options
    from harmony_tpu.ops.assign import make_blocks
    from harmony_tpu.preprocess import build_design, resolve_config
    from harmony_tpu.runtime import enable_compilation_cache

    enable_compilation_cache()
    N, d, K, B = 500_000, 50, 100, 10
    reps = 10
    rng = np.random.default_rng(0)
    design = build_design({"dataset": rng.integers(0, B, N)}, ["dataset"])
    cfg = resolve_config(
        n_cells=N, d=d, design=design, nclust=K, max_iter=3,
        early_stop=False, options=harmony_options(), verbose=False,
    )
    f32 = jnp.float32
    key = jax.random.PRNGKey(0)
    Zf = jax.random.normal(key, (d, N), f32)
    Zp = jnp.concatenate([Zf, jnp.zeros((d, 1), f32)], axis=1)
    Rp = jnp.concatenate(
        [jax.random.normal(key, (K, N), f32), jnp.zeros((K, 1), f32)],
        axis=1,
    )
    bar = lambda *xs: jax.lax.optimization_barrier(xs)
    probe = lambda a: a.ravel()[0].astype(f32) * 1e-12

    def draw(x):
        it = x.astype(jnp.int32)
        return jax.random.permutation(
            jax.random.fold_in(key, it), N
        ).astype(jnp.int32)

    def g2d(x):
        p = draw(x)
        idx, mask = make_blocks(cfg, p)  # (nb, S) 2-D
        (idx,) = bar(idx)
        g = Zp[:, idx]  # (d, nb, S)
        (g,) = bar(g)
        return probe(g)

    def g2d_R(x):
        p = draw(x)
        idx, mask = make_blocks(cfg, p)
        (idx,) = bar(idx)
        g = Rp[:, idx]  # (K, nb, S)
        (g,) = bar(g)
        return probe(g)

    def g1d_from2d(x):
        p = draw(x)
        idx, mask = make_blocks(cfg, p)
        (idx,) = bar(idx)
        g = Zp[:, idx.reshape(-1)]
        (g,) = bar(g)
        return probe(g)

    def scatter_pos(x):
        p = draw(x)
        idx, _ = make_blocks(cfg, p)
        flat = idx.reshape(-1)
        L = flat.shape[0]
        pos = jnp.full((N + 1,), L, dtype=jnp.int32)
        pos = pos.at[flat].set(jnp.arange(L, dtype=jnp.int32))
        (pos,) = bar(pos)
        return probe(pos)

    import time as _t

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

    x0 = jnp.float32(0.0)
    for name, f in (
        ("g2d_Z", g2d), ("g2d_R", g2d_R), ("g1d_from2d", g1d_from2d),
        ("scatter_pos", scatter_pos),
    ):
        lo_f, hi_f = reps_fn(f, 2), reps_fn(f, reps)
        float(np.asarray(lo_f(x0)))
        float(np.asarray(hi_f(x0)))
        deltas = []
        for _ in range(5):
            t0 = _t.perf_counter()
            float(np.asarray(lo_f(x0)))
            t_lo = _t.perf_counter() - t0
            t0 = _t.perf_counter()
            float(np.asarray(hi_f(x0)))
            t_hi = _t.perf_counter() - t0
            if t_hi > t_lo:
                deltas.append((t_hi - t_lo) / (reps - 2))
        per = float(np.median(deltas)) if deltas else float("nan")
        print(f"{name:16s}: {per*1e3:8.2f} ms/pass", flush=True)


if __name__ == "__main__" and __import__("os").environ.get("GV_EXTRA"):
    extra()
