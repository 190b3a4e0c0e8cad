#!/usr/bin/env python
"""Per-kernel costs of one Harmony iteration at the canonical bench shape.

Times each Pallas kernel (reassign, v2 round, tile moments, tiled
correction) with a chain-of-10 inside one jit (amortises the remote-tunnel
dispatch constant), plus the full cluster/correct/fused-round phases.
"""

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
    from harmony_tpu.config import finalize_engine_config, harmony_options
    from harmony_tpu.engine import _with_precision, make_engine
    from harmony_tpu.preprocess import (
        build_design, expand_hyperparams, orient_embedding, resolve_config,
    )
    from harmony_tpu.state import init_state
    from harmony_tpu.ops.pallas_rotate import (
        RoundState, make_codes_layout, make_oh_pad, pad_cells_to_tile,
        make_codes_pad, pallas_reassign, pallas_rotate_update_round_v2,
        tile_stats_from_R,
    )
    from harmony_tpu.ops.pallas_ridge import (
        pallas_tile_moments, pallas_tiled_correction,
    )
    from harmony_tpu.ops.tiled import (
        build_batch_tiled_order, choose_tiled_tile, count_joint_levels,
        detect_tiled_layout,
    )

    n_cells, d, n_batches, nclust = 500_000, 50, 10, 100
    Z, batches = make_synthetic_cells(n_cells, d, n_batches, seed=0)
    design = build_design({"dataset": batches}, ["dataset"])
    Zt = orient_embedding(Z, n_cells)
    options = harmony_options()
    cfg = resolve_config(
        n_cells=n_cells, d=d, design=design, nclust=nclust, max_iter=30,
        early_stop=False, options=options, verbose=False,
    )
    cfg = dataclasses.replace(
        cfg, shuffle_mode="rotate", estep_impl="auto", mstep_impl="auto"
    )
    cfg = finalize_engine_config(cfg, None)

    tiled_t = choose_tiled_tile(cfg, count_joint_levels(design.codes))
    perm, _ = build_batch_tiled_order(design.codes, tiled_t, 0)
    Zt = Zt[:, perm]
    design = dataclasses.replace(design, codes=design.codes[:, perm])

    hp = expand_hyperparams(design, cfg.K, None, 0.1, 1.0, options.tau)
    key = jax.random.PRNGKey(0)
    state = init_state(cfg, Zt, design, hp.sigma, hp.theta, hp.lamb, key)
    engine = make_engine(cfg, codes=state.codes)
    state = engine.init_cluster(state)
    st2 = engine.round(state)
    _sync(st2.O)
    tiled = detect_tiled_layout(np.asarray(state.codes), cfg.N, tiled_t)
    print(
        f"estep={cfg.estep_impl} T={cfg.estep_sub_tile} Np={cfg.Np} "
        f"tiled_t={tiled_t} n_blocks={cfg.n_blocks}",
        flush=True,
    )

    def chain10(stage_fn):
        def run(s):
            acc = jnp.float32(0)
            Y = s.Y
            for _ in range(10):
                v = stage_fn(s, Y)
                acc = acc + v
                Y = Y + jnp.tanh(v) * 1e-9
            return acc
        return jax.jit(_with_precision(cfg, run))

    codes_pad = make_codes_pad(cfg, st2.codes)

    def stage_reassign(s, Y):
        Z_raw = pad_cells_to_tile(cfg, s.Z_corr).astype(jnp.float32)
        Zn, tO, O, E = pallas_reassign(
            cfg, Y, s.sigma, s.Pr_b, Z_raw, codes_pad
        )
        return O.sum() + Zn[0, 0] + tO[0, 0, 0]

    def stage_round(s, Y):
        layout = make_codes_layout(cfg, s.Z_corr, s.codes)
        oh_pad = make_oh_pad(cfg, s.codes)
        tO = tile_stats_from_R(cfg, s.R, oh_pad)
        rs = RoundState(
            R=s.R, E=s.E, O=s.O, tile_O=tO,
            kmeans_error=jnp.float32(0), entropy=jnp.float32(0),
        )
        res = pallas_rotate_update_round_v2(
            cfg, s.Z_corr, Y, rs, s.Pr_b, s.sigma, s.theta,
            jax.random.PRNGKey(1), layout=layout,
        )
        return res.kmeans_error + res.entropy + res.R[0, 0]

    def make_chained_rounds(cfg):
        def chained_rounds(s):
            # 10 real rounds feeding (R, E, O, tile_O) forward — the
            # steady-state per-round cost with true data dependencies
            layout = make_codes_layout(cfg, s.Z_corr, s.codes)
            oh_pad = make_oh_pad(cfg, s.codes)
            rs = RoundState(
                R=s.R, E=s.E, O=s.O,
                tile_O=tile_stats_from_R(cfg, s.R, oh_pad),
                kmeans_error=jnp.float32(0), entropy=jnp.float32(0),
            )
            keys = jax.random.split(jax.random.PRNGKey(1), 10)
            acc = jnp.float32(0)
            for i in range(10):
                rs = pallas_rotate_update_round_v2(
                    cfg, s.Z_corr, s.Y, rs, s.Pr_b, s.sigma, s.theta,
                    keys[i], layout=layout,
                )
                acc = acc + rs.kmeans_error
            return acc

        return chained_rounds

    chained_rounds = make_chained_rounds(cfg)

    def stage_moments(s, Y):
        Zf = s.Z_orig.astype(jnp.float32) + Y[0, 0] * 0
        M = pallas_tile_moments(
            cfg, s.R, Zf, tiled.tile, jnp.asarray(tiled.tile_joint),
            tiled.joint_codes.shape[1],
        )
        return M.sum()

    def stage_correction(s, Y):
        n_joint = tiled.joint_codes.shape[1]
        Wj = (
            jnp.zeros((n_joint + 1, cfg.d, cfg.K), jnp.float32)
            + Y[0, 0] * 1e-9
        )
        Zc = pallas_tiled_correction(
            cfg, Wj, jnp.asarray(tiled.tile_joint),
            s.R.astype(jnp.float32), s.Z_orig.astype(jnp.float32),
            tiled.tile,
        )
        return Zc[0, 0]

    for name, fn in [
        ("reassign (re-entry)   ", stage_reassign),
        ("seed + one v2 round   ", stage_round),
        ("mstep tile moments    ", stage_moments),
        ("mstep tiled correction", stage_correction),
    ]:
        t = bench_fn(chain10(fn), st2, iters=5)
        print(f"{name}: {t*1e2:7.2f} ms/call", flush=True)

    for variant in ("legacy", "fused_vpu", "fused_mxu"):
        cfg_v = dataclasses.replace(cfg, estep_variant=variant)
        t = bench_fn(
            jax.jit(_with_precision(cfg_v, make_chained_rounds(cfg_v))),
            st2, iters=5,
        )
        print(
            f"chained v2 round [{variant:9s}]: {t*1e2:7.3f} ms/round",
            flush=True,
        )

    # full phases (single-dispatch, 5-chain not possible: use direct timing)
    fn = jax.jit(_with_precision(cfg, partial(eng.cluster, cfg)))
    t = bench_fn(fn, st2, iters=10)
    print(f"cluster phase (4 rounds) : {t*1e3:7.2f} ms", flush=True)
    fnc = jax.jit(
        _with_precision(cfg, partial(eng.correct, cfg, tiled=tiled))
    )
    t = bench_fn(fnc, st2, iters=10)
    print(f"correct phase (tiled)    : {t*1e3:7.2f} ms", flush=True)
    t = bench_fn(engine.round, st2, iters=10)
    print(f"fused round              : {t*1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
