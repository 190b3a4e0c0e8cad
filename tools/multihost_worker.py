"""One process of a multi-process (multi-host analog) Harmony run.

The reference has no distributed execution at all (SURVEY.md §2.3); the
TPU-native framework's multi-host story is ``jax.distributed`` + a global
cell-sharded mesh, with every cross-shard reduction a psum (ICI within a
slice, DCN across — here the gloo CPU backend stands in for both, so the
full coordinator/collective path is exercised without TPU pods).

Run one process per "host":

    python tools/multihost_worker.py --process-id 0 --num-processes 2 \
        --port 12345 --local-devices 2 [--cells 16384]

Each process prints one JSON line with the replicated objective trace; a
driver (tests/test_multihost.py) asserts the processes agree with each
other AND with a single-process run on an equally-sized mesh.
"""

import argparse
import json
import os
import sys


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--process-id", type=int, required=True)
    ap.add_argument("--num-processes", type=int, required=True)
    ap.add_argument("--port", type=int, required=True)
    ap.add_argument("--local-devices", type=int, default=2)
    ap.add_argument("--cells", type=int, default=16384)
    ap.add_argument("--dims", type=int, default=8)
    ap.add_argument("--batches", type=int, default=3)
    ap.add_argument("--nclust", type=int, default=5)
    ap.add_argument("--rounds", type=int, default=2)
    ap.add_argument(
        "--fast-path", action="store_true",
        help="full production fast path: a second covariate, batch-tiled "
        "ingest, fused M-step moments and virtual R over the global mesh",
    )
    ap.add_argument(
        "--shuffle", choices=["rotate", "permute"], default="rotate",
        help="'permute' exercises the sharded fused permute phase "
        "(ops/permute_phase.py): global blocks + per-commit KxB psums "
        "over the gloo backend",
    )
    ap.add_argument(
        "--single-process", action="store_true",
        help="skip jax.distributed: one process owning the whole mesh "
        "(the reference result the multi-process run must match)",
    )
    ap.add_argument(
        "--bench-pairs", type=int, default=0,
        help="additionally time the engine: N repeats of the two-point "
        "(2 vs 2+rounds) run_rounds measurement (the bench.py method); "
        "adds 'seconds_per_iter' to the JSON line. This is the one "
        "DCN-analog wall this environment can record: per-iteration "
        "wall of the gloo-coupled multi-process mesh vs the same-size "
        "single-process mesh (VERDICT r3 #6).",
    )
    args = ap.parse_args()

    n_global = args.local_devices * args.num_processes
    flags = os.environ.get("XLA_FLAGS", "")
    dev = args.local_devices if not args.single_process else n_global
    os.environ["XLA_FLAGS"] = (
        flags + f" --xla_force_host_platform_device_count={dev}"
    ).strip()

    import jax

    jax.config.update("jax_platforms", "cpu")
    if not args.single_process:
        jax.config.update("jax_cpu_collectives_implementation", "gloo")

        from harmony_tpu.sharding import initialize_distributed

        nproc = initialize_distributed(
            coordinator_address=f"127.0.0.1:{args.port}",
            num_processes=args.num_processes,
            process_id=args.process_id,
        )
        assert nproc == args.num_processes, (nproc, args.num_processes)
    assert jax.device_count() == n_global, (
        jax.device_count(), n_global
    )

    import dataclasses

    import numpy as np
    import jax.numpy as jnp

    from harmony_tpu.config import harmony_options
    from harmony_tpu.engine import make_engine
    from harmony_tpu.preprocess import (
        build_design, expand_hyperparams, orient_embedding, resolve_config,
    )
    from harmony_tpu.sharding import make_mesh, shard_state
    from harmony_tpu.state import init_state

    # identical problem in every process (same seeds, host-side numpy)
    rng = np.random.default_rng(0)
    N, d, B = args.cells, args.dims, args.batches
    batches = rng.integers(0, B, N)
    Z = (rng.normal(size=(B, d)) * 0.8)[batches] + rng.normal(size=(N, d))
    meta = {"dataset": batches.astype(str)}
    vars_use = ["dataset"]
    if args.fast_path:
        donors = rng.integers(0, 2, N)
        Z = Z + (rng.normal(size=(2, d)) * 0.6)[donors]
        meta["donor"] = donors.astype(str)
        vars_use.append("donor")
    design = build_design(meta, vars_use)
    options = harmony_options(block_size=0.25)
    # bench mode consumes extra rounds (2 + pairs * (4 + rounds)); the
    # trace buffers are fixed-capacity, so size them for the whole budget
    cap = args.rounds + (
        2 + args.bench_pairs * (4 + args.rounds) if args.bench_pairs else 0
    )
    cfg = resolve_config(
        n_cells=N, d=d, design=design, nclust=args.nclust,
        max_iter=cap, early_stop=False, options=options,
        verbose=False,
    )
    overrides = dict(
        shuffle_mode=args.shuffle, estep_impl="pallas",
        estep_sub_tile=512,
    )
    tile = 128  # ingest tiling and cfg.mstep_tile must agree (fast path)
    if args.fast_path:
        overrides.update(mstep_tile=tile, mstep_mode="tiled", virtual_r=True)
    cfg = dataclasses.replace(cfg, **overrides)
    mesh = make_mesh()  # all global devices
    assert mesh.size == n_global
    hp = expand_hyperparams(design, cfg.K, None, 0.1, 1.0, options.tau)
    Zt = orient_embedding(Z, N)
    if args.fast_path:
        # identical host-side ingest order in every process (same seed)
        from harmony_tpu.ops.tiled import build_batch_tiled_order

        perm, _ = build_batch_tiled_order(design.codes, tile, seed=0)
        Zt = Zt[:, perm]
        design = dataclasses.replace(design, codes=design.codes[:, perm])

    host_codes = design.codes.astype(np.int32)
    state = init_state(
        cfg, Zt, design, hp.sigma, hp.theta, hp.lamb, jax.random.PRNGKey(0)
    )
    # place on the GLOBAL mesh (each process feeds its addressable shards)
    state = shard_state(state, mesh)
    engine = make_engine(cfg, codes=host_codes, mesh=mesh)
    state = engine.init_cluster(state)
    state = engine.run_rounds(state, jnp.int32(args.rounds))

    seconds_per_iter = None
    if args.bench_pairs:
        import time

        def sync(st):
            np.asarray(st.O)

        sync(state)  # the correctness rounds double as compile warm-up
        deltas = []
        for _ in range(args.bench_pairs):
            t0 = time.perf_counter()
            state = engine.run_rounds(state, jnp.int32(2))
            sync(state)
            t_small = time.perf_counter() - t0
            t1 = time.perf_counter()
            state = engine.run_rounds(state, jnp.int32(2 + args.rounds))
            sync(state)
            delta = (time.perf_counter() - t1) - t_small
            if delta > 0:
                deltas.append(delta)
        if deltas:
            seconds_per_iter = float(np.median(deltas)) / args.rounds

    # replicated traces are addressable everywhere
    obj_k = np.asarray(state.objective_kmeans)[: int(state.n_kmeans)]
    obj_h = np.asarray(state.objective_harmony)[: int(state.n_harmony)]
    print(json.dumps({
        "process_id": args.process_id,
        "processes": jax.process_count(),
        "global_devices": jax.device_count(),
        "virtual_r_engaged": state.virt_pen is not None,
        "seconds_per_iter": seconds_per_iter,
        "objective_kmeans": [float(x) for x in obj_k],
        "objective_harmony": [float(x) for x in obj_h],
    }), flush=True)


if __name__ == "__main__":
    main()
