"""Multi-device scaling-efficiency measurement (BASELINE.md metric).

Runs the benchmark at 1 device and at N devices (same per-run total cells,
cells sharded over the mesh) and reports throughput + scaling efficiency.
On a single-chip host this degenerates to the 1-device number; on a pod
slice (run once per host under ``jax.distributed``, see
``harmony_tpu.sharding.initialize_distributed``) it measures the real
multi-chip scaling of the psum-coupled engine.

Usage: python tools/scaling_bench.py [--cells 2000000] [--devices 1 8]

``JAX_PLATFORMS=cpu`` (+ ``XLA_FLAGS=--xla_force_host_platform_device_count=N``)
selects the virtual-CPU-mesh mode; the explicit config update below makes
that work even where a site plugin pre-sets the platform list at
interpreter start (which silently discards the env var).
"""

import argparse
import json
import os

import jax

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

from harmony_tpu.bench import run_bench


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cells", type=int, default=2_000_000)
    ap.add_argument("--dims", type=int, default=50)
    ap.add_argument("--batches", type=int, default=10)
    ap.add_argument("--nclust", type=int, default=100)
    ap.add_argument(
        "--devices", type=int, nargs="*", default=None,
        help="device counts to test (default: 1 and all)",
    )
    ap.add_argument(
        "--processes", type=int, default=0,
        help="N>=2: measure the MULTI-PROCESS leg instead — N OS "
        "processes x --local-devices virtual CPU devices each, gloo "
        "collectives (the DCN analog), vs one process owning the same "
        "global mesh (tools/multihost_worker.py --bench-pairs). This is "
        "the one cross-process wall this environment can record "
        "(VERDICT r3 #6); absolute CPU walls do not transfer to TPU, "
        "the multi/single RATIO is the recorded figure.",
    )
    ap.add_argument("--local-devices", type=int, default=2)
    ap.add_argument("--proc-cells", type=int, default=65536,
                    help="global cells for the --processes mode")
    ap.add_argument("--bench-pairs", type=int, default=5)
    ap.add_argument(
        "--shuffle", choices=["rotate", "permute"], default="rotate",
        help="schedule for the device-count legs: 'rotate' = the "
        "production kernels; 'permute' = the reference-exact schedule "
        "(1-device leg: the fused Pallas phase in interpret mode; mesh "
        "leg: the sharded fused phase, ops/permute_phase.py — structure "
        "evidence for its program, VERDICT r4 #8)",
    )
    args = ap.parse_args()

    if args.processes >= 2:
        return _process_mode(args)

    import jax

    counts = args.devices
    if not counts:
        counts = sorted({1, jax.device_count()})

    results = {}
    for n in counts:
        # estep_impl is forced to 'pallas' so BOTH legs run the production
        # kernel structure (stats-carry rounds; shard_map wrappers on the
        # mesh leg). The 'auto' resolution picks the XLA path off-TPU,
        # which the mesh partitions very differently — a 1-vs-N comparison
        # of that path does not measure the production engine's sharding
        # overhead (round-3 finding). For the permute schedule the legs
        # pass an explicit mesh SIZE so a 1-device leg still takes the
        # SHARDED fused-phase program (ops/permute_phase.py) — comparing
        # the single-device interpret-mode Pallas phase against the SPMD
        # XLA phase would compare different programs entirely.
        if args.shuffle == "permute":
            r = run_bench(
                n_cells=args.cells, d=args.dims, n_batches=args.batches,
                nclust=args.nclust, max_iter=2, mesh=n,
                shuffle_mode=args.shuffle, estep_impl="pallas",
            )
        elif n == 1:
            r = run_bench(
                n_cells=args.cells, d=args.dims, n_batches=args.batches,
                nclust=args.nclust, max_iter=2,
                shuffle_mode=args.shuffle, estep_impl="pallas",
            )
        else:
            r = run_bench(
                n_cells=args.cells, d=args.dims, n_batches=args.batches,
                nclust=args.nclust, max_iter=2, mesh="auto",
                shuffle_mode=args.shuffle, estep_impl="pallas",
            )
        total = r["value"] * r["n_devices"]
        results[n] = {
            "devices": r["n_devices"],
            "cells_per_sec_total": total,
            "seconds_per_iter": r["seconds_per_iter"],
        }
        print(json.dumps({"devices": r["n_devices"], **results[n]}))

    if len(results) > 1:
        base = results[min(results)]
        top = results[max(results)]
        eff = (
            top["cells_per_sec_total"]
            / (base["cells_per_sec_total"] * top["devices"] / base["devices"])
        )
        print(json.dumps({
            "metric": "multi_device_scaling_efficiency",
            "value": round(eff, 4),
            "from_devices": base["devices"],
            "to_devices": top["devices"],
        }))


def _process_mode(args):
    """1-process-(P*L)-device vs P-process-(L each)-device wall/iter."""
    import socket
    import subprocess
    import sys

    worker = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    base = [
        "--num-processes", str(args.processes),
        "--cells", str(args.proc_cells),
        "--local-devices", str(args.local_devices),
        "--nclust", str(args.nclust), "--fast-path",
        "--bench-pairs", str(args.bench_pairs),
    ]

    def parse(stdout):
        return json.loads(
            [l for l in stdout.splitlines() if l.startswith("{")][-1]
        )

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    single = subprocess.run(
        [sys.executable, worker, "--process-id", "0", "--single-process",
         "--port", str(port), *base],
        capture_output=True, text=True, env=env, timeout=1800,
    )
    assert single.returncode == 0, single.stderr[-2000:]
    ref = parse(single.stdout)
    print(json.dumps({
        "leg": "single_process", "devices": ref["global_devices"],
        "seconds_per_iter": ref["seconds_per_iter"],
    }))

    procs = [
        subprocess.Popen(
            [sys.executable, worker, "--process-id", str(i),
             "--port", str(port), *base],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            env=env,
        )
        for i in range(args.processes)
    ]
    outs = []
    for p in procs:
        stdout, stderr = p.communicate(timeout=1800)
        assert p.returncode == 0, stderr[-2000:]
        outs.append(parse(stdout))
    # every process runs the same global program; process 0's wall stands
    # for the run (the others differ only by dispatch jitter)
    multi = outs[0]
    print(json.dumps({
        "leg": "multi_process", "processes": args.processes,
        "devices": multi["global_devices"],
        "seconds_per_iter": multi["seconds_per_iter"],
        "per_process_seconds_per_iter": [
            o["seconds_per_iter"] for o in outs
        ],
    }))
    if ref["seconds_per_iter"] and multi["seconds_per_iter"]:
        print(json.dumps({
            "metric": "multi_process_overhead_ratio",
            "value": round(
                multi["seconds_per_iter"] / ref["seconds_per_iter"], 4
            ),
            "note": "wall/iter of the gloo 2-process mesh over the "
            "same-size single-process mesh (gloo CPU collectives stand "
            "in for DCN; ratio, not absolute wall, is the signal)",
        }))
    return None


if __name__ == "__main__":
    main()
