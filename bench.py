#!/usr/bin/env python
"""Driver benchmark: prints ONE JSON line with the headline metric.

Headline: cells/sec/chip per Harmony iteration on a synthetic large-N
workload (the reference's only published number is "~4 seconds" for 9,478
cells x 20 PCs on CPU, README.md:44 — recorded here as the baseline:
9478 cells / 4 s / 10 rounds-ish ~= per-iteration throughput; see
BASELINE.md). ``vs_baseline`` is measured throughput over the reference's
implied CPU throughput on the quickstart dataset.

Robustness contract (the capture harness runs this under an external
timeout): the process keeps the best *valid* payload available so far and
emits it — once — no matter how it exits:

* an internal wall-clock budget (``HARMONY_BENCH_BUDGET``, seconds,
  default 270) degrades the repeat count and returns early;
* a watchdog thread fires at the budget even if the main thread is stuck
  in a hung tunnel RPC, printing the best payload and exiting 0;
* SIGTERM/SIGINT (what ``timeout(1)`` sends) do the same.

A payload only exists after the warm-up run completes (there is no
defensible number before any device round has been timed); if the kill
arrives before that, nothing is printed — same observable outcome as
today's timeout, never a fabricated figure.
"""

import json
import os
import signal
import sys
import threading
import time


_BEST: dict = {}
_EMITTED = threading.Event()


def _emit(rc: int) -> None:
    """Print the best payload exactly once and hard-exit.

    Lock-free on purpose: the signal handler runs on the main thread and
    may interrupt code anywhere, so taking a (non-reentrant) lock here
    could deadlock against the interrupted frame. _BEST is only ever
    rebound to a fresh dict (never mutated in place), so a plain read is
    consistent; the Event makes double emission a harmless duplicate line
    in the worst racing case (the capture harness parses the last line).

    os._exit: the main thread may be blocked in a native RPC that would
    swallow a normal SystemExit; flushing stdout first is all that the
    capture harness needs.
    """
    already = _EMITTED.is_set()
    _EMITTED.set()
    best = _BEST
    if best and not already:
        sys.stdout.write(json.dumps(best) + "\n")
        sys.stdout.flush()
        rc = 0
    elif best:
        rc = 0
    os._exit(rc)


def _on_signal(signum, frame):
    _emit(128 + signum)


def _watchdog(deadline: float):
    while not _EMITTED.is_set():
        now = time.monotonic()
        if now >= deadline and _BEST:
            # past budget and a valid figure exists: emit it now.  Past
            # budget with NO figure (still compiling): keep polling — the
            # moment the warm-up lands a payload, it goes out.
            _emit(0)
        time.sleep(1.0 if now >= deadline else min(5.0, deadline - now))


def main() -> int:
    size = int(os.environ.get("HARMONY_BENCH_CELLS", 500_000))
    d = int(os.environ.get("HARMONY_BENCH_DIMS", 50))
    # int ("10") = one covariate; comma-separated ("4,25") = one covariate
    # per level count (the reference's two-variable / BASELINE designs)
    raw_batches = os.environ.get("HARMONY_BENCH_BATCHES", "10")
    n_batches = (
        [int(v) for v in raw_batches.split(",")]
        if "," in raw_batches
        else int(raw_batches)
    )
    nclust = int(os.environ.get("HARMONY_BENCH_K", 100))
    budget = float(os.environ.get("HARMONY_BENCH_BUDGET", 270))

    signal.signal(signal.SIGTERM, _on_signal)
    signal.signal(signal.SIGINT, _on_signal)
    if budget > 0:
        # the watchdog allows grace over the measurement budget so
        # run_bench's own budget-aware early return lands first — enough
        # for the shrunk first pair that still runs when compilation
        # alone blew the budget (run_bench degrades the pair to 5 timed
        # rounds in that case)
        threading.Thread(
            target=_watchdog, args=(time.monotonic() + budget + 45,),
            daemon=True,
        ).start()

    from harmony_tpu.bench import run_bench

    # Reference baseline: quickstart "~4 seconds" for 9,478 cells
    # (README.md:44). The run does ~5 harmony rounds with several kmeans
    # iterations each; treat it as 9478 cells / 4s = ~2370 cells/s/chip
    # aggregate -> per-harmony-iteration baseline ~= 9478 / (4/5) ~= 11848.
    baseline = 9478.0 / (4.0 / 5.0)

    def keep_best(payload: dict) -> None:
        # rebind (never mutate): the signal handler/watchdog read _BEST
        # without a lock and must always see a complete payload
        global _BEST
        _BEST = dict(payload)

    # max_iter: timed rounds. The final host fetch pays one tunnel
    # round-trip; amortise it over enough rounds that per-iter numbers
    # reflect device time.
    result = run_bench(
        n_cells=size, d=d, n_batches=n_batches, nclust=nclust,
        max_iter=int(os.environ.get("HARMONY_BENCH_ITERS", 40)),
        baseline_cells_per_sec=baseline,
        estep_impl=os.environ.get("HARMONY_BENCH_ESTEP"),
        mstep_mode=os.environ.get("HARMONY_BENCH_MSTEP"),
        # 'auto' = all local devices; an integer = an explicit mesh SIZE
        # (a 1-device mesh still takes the sharded code paths)
        mesh=(
            int(m) if (m := os.environ.get("HARMONY_BENCH_MESH")) and
            m.isdigit() else m
        ),
        # 'rotate' is the scale-mode schedule (statistically equivalent,
        # zero-gather rounds); set HARMONY_BENCH_SHUFFLE=permute for the
        # reference-exact schedule.
        shuffle_mode=os.environ.get("HARMONY_BENCH_SHUFFLE", "rotate"),
        dtype=os.environ.get("HARMONY_BENCH_DTYPE"),
        budget_s=budget if budget > 0 else None,
        progress_cb=keep_best,
    )
    keep_best(result)
    if not _EMITTED.is_set():
        _EMITTED.set()
        print(json.dumps(_BEST))
    return 0


if __name__ == "__main__":
    sys.exit(main())
