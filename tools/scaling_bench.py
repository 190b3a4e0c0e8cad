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
    args = ap.parse_args()

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
        # overhead (round-3 finding).
        if n == 1:
            r = run_bench(
                n_cells=args.cells, d=args.dims, n_batches=args.batches,
                nclust=args.nclust, max_iter=2, shuffle_mode="rotate",
                estep_impl="pallas",
            )
        else:
            r = run_bench(
                n_cells=args.cells, d=args.dims, n_batches=args.batches,
                nclust=args.nclust, max_iter=2, mesh="auto",
                shuffle_mode="rotate", estep_impl="pallas",
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


if __name__ == "__main__":
    main()
