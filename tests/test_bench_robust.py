"""Robustness contract of the driver-facing bench.py (VERDICT r2 #1).

The capture harness runs ``python bench.py`` under an external timeout;
round 2 recorded no perf number because the process was killed before its
single JSON line went out. These tests pin the contract: an internal
budget degrades the measurement instead of overrunning, and kills emit
the best payload available so far.
"""

import json
import os
import signal
import subprocess
import sys

import pytest

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_py(code, env_extra=None, timeout=300):
    env = dict(os.environ)
    env.update(env_extra or {})
    return subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=timeout, cwd=_ROOT, env=env,
    )


def _bench_code():
    # force CPU before the script initialises a backend (site plugin
    # ignores JAX_PLATFORMS, conftest pattern)
    return (
        "import jax; jax.config.update('jax_platforms', 'cpu'); "
        "import runpy, sys; sys.argv = ['bench.py']; "
        f"runpy.run_path({os.path.join(_ROOT, 'bench.py')!r}, "
        "run_name='__main__')"
    )


_SMALL = {
    "HARMONY_BENCH_CELLS": "2000", "HARMONY_BENCH_DIMS": "8",
    "HARMONY_BENCH_BATCHES": "2", "HARMONY_BENCH_K": "4",
    "HARMONY_BENCH_ITERS": "2",
}


@pytest.mark.slow
def test_bench_emits_one_json_line():
    out = _run_py(_bench_code(), {**_SMALL, "HARMONY_BENCH_BUDGET": "270"})
    assert out.returncode == 0, (out.stdout[-2000:], out.stderr[-2000:])
    lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
    assert len(lines) == 1
    payload = json.loads(lines[0])
    assert payload["metric"] == "cells_per_sec_per_chip_per_harmony_iter"
    assert payload["value"] > 0
    assert "degraded" not in payload


@pytest.mark.slow
def test_bench_budget_degrades_not_overruns():
    """An (absurdly) tight budget still produces a valid figure — the
    repeat count degrades to one pair instead of blowing the clock."""
    out = _run_py(_bench_code(), {**_SMALL, "HARMONY_BENCH_BUDGET": "0.01"})
    assert out.returncode == 0, (out.stdout[-2000:], out.stderr[-2000:])
    payload = json.loads(
        [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    )
    assert payload["value"] > 0
    assert payload.get("degraded") in (1, "warmup_lower_bound")


def test_sigterm_emits_best_payload():
    """What timeout(1) sends must flush the best payload, exactly once."""
    code = (
        f"import sys; sys.path.insert(0, {_ROOT!r})\n"
        "import bench, os, signal\n"
        "signal.signal(signal.SIGTERM, bench._on_signal)\n"
        "bench._BEST.update({'metric': 'm', 'value': 42})\n"
        "os.kill(os.getpid(), signal.SIGTERM)\n"
        "import time; time.sleep(5)\n"
    )
    out = _run_py(code, timeout=60)
    assert out.returncode == 0
    assert json.loads(out.stdout.strip()) == {"metric": "m", "value": 42}


def test_sigterm_before_any_payload_emits_nothing():
    """No fabricated figures: a kill before the warm-up produced a valid
    payload exits silently (same observable as a plain timeout)."""
    code = (
        f"import sys; sys.path.insert(0, {_ROOT!r})\n"
        "import bench, os, signal\n"
        "signal.signal(signal.SIGTERM, bench._on_signal)\n"
        "os.kill(os.getpid(), signal.SIGTERM)\n"
        "import time; time.sleep(5)\n"
    )
    out = _run_py(code, timeout=60)
    assert out.returncode == 128 + signal.SIGTERM
    assert out.stdout.strip() == ""


def test_watchdog_emits_past_deadline():
    """The watchdog preempts a main thread stuck in a hung RPC."""
    code = (
        f"import sys; sys.path.insert(0, {_ROOT!r})\n"
        "import bench, time\n"
        "bench._BEST.update({'metric': 'm', 'value': 7})\n"
        "bench._watchdog(time.monotonic() - 1)\n"
        "time.sleep(5)\n"
    )
    out = _run_py(code, timeout=60)
    assert out.returncode == 0
    assert json.loads(out.stdout.strip()) == {"metric": "m", "value": 7}


def test_make_synthetic_cells_multi_covariate():
    """Comma-separated HARMONY_BENCH_BATCHES produces one covariate per
    level count (the BASELINE multi-covariate benchmark designs)."""
    from harmony_tpu.bench import make_synthetic_cells

    Z, cols = make_synthetic_cells(500, 8, [2, 3], seed=1)
    assert Z.shape == (500, 8)
    assert sorted(cols) == ["v0", "v1"]
    assert cols["v0"].max() == 1 and cols["v1"].max() == 2
    # int form stays a bare array (single covariate)
    Z1, b = make_synthetic_cells(500, 8, 4, seed=1)
    assert b.shape == (500,) and b.max() == 3
