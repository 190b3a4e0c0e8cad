"""Outer Harmony loop: the analog of ``harmonize`` (R/utils.R:15-46).

Host-side driver over the jitted engine phases. One device->host scalar
sync per round (the convergence flag); everything else stays on device.
"""

from __future__ import annotations

import logging
import time
from typing import Optional

import jax.numpy as jnp
import numpy as np

from .config import HarmonyConfig
from .engine import Engine, make_engine
from .state import HarmonyState

logger = logging.getLogger("harmony_tpu")


def _ensure_verbose_handler():
    """Make verbose output visible without user logging config (the
    reference's message() prints, R/utils.R:21-23)."""
    if not logger.handlers and not logging.getLogger().handlers:
        h = logging.StreamHandler()
        h.setFormatter(logging.Formatter("%(message)s"))
        logger.addHandler(h)
        logger.setLevel(logging.INFO)


def _check_finite(state: HarmonyState, where: str = "") -> None:
    """Failure detection: fail loudly on a diverged objective trace.

    One host fetch of the (tiny, replicated) harmony-objective trace;
    callers invoke it only at points that already synchronise with the
    device (per-round convergence fetches, end-of-run materialise), so it
    adds no extra device round-trips."""
    from .runtime import DivergenceError

    n = int(state.n_harmony)
    if n < 1:
        return
    obj = np.asarray(state.objective_harmony[:n], dtype=np.float64)
    if not np.isfinite(obj).all():
        bad = int(np.argmax(~np.isfinite(obj)))
        raise DivergenceError(bad, obj[max(0, bad - 2): bad + 1].tolist())


def _scope(timers, name: str):
    """timers.scope(name), or a no-op when no PhaseTimers was supplied."""
    if timers is None:
        import contextlib

        return contextlib.nullcontext()
    return timers.scope(name)


def _sync(state: HarmonyState) -> None:
    """Host fetch of a tiny replicated array — the only reliable execution
    barrier through a remote-dispatch tunnel (see CLAUDE.md), so timer
    scopes around dispatches measure real work."""
    np.asarray(state.O)


def harmonize(
    engine: Engine,
    state: HarmonyState,
    max_iter: Optional[int] = None,
    verbose: bool = False,
    perms: Optional[np.ndarray] = None,
    abort=None,
    checkpoint_path: Optional[str] = None,
    checkpoint_every: int = 1,
    abort_poll_rounds: int = 1,
    checkpoint_meta: Optional[dict] = None,
    timers=None,
) -> HarmonyState:
    """Run up to ``max_iter`` rounds of (cluster, correct), with early stop.

    ``perms`` optionally injects per-round cell permutations of shape
    (rounds, max_iter_cluster, N) for trajectory-parity testing.
    ``abort`` is an optional :class:`harmony_tpu.runtime.AbortFlag`, polled
    every ``abort_poll_rounds`` completed rounds (the RcppProgress
    check_abort analog, src/harmony.cpp:233-234 — device dispatches are
    not interruptible, so the run is chunked into ``abort_poll_rounds``
    single-dispatch pieces when a flag is supplied).

    ``checkpoint_path`` enables crash recovery: a minimal checkpoint
    (see :mod:`harmony_tpu.checkpoint`) is written every
    ``checkpoint_every`` completed rounds; resume with
    ``load_checkpoint(path, Z, design)`` + ``harmonize`` (the algorithm is
    restart-friendly — correction recomputes from Z_orig, SURVEY.md §5).
    ``checkpoint_meta`` persists run provenance (the rotate ingest-shuffle
    recipe) alongside the arrays.

    ``timers`` (a :class:`harmony_tpu.runtime.PhaseTimers`) accumulates
    named wall-clock scopes per phase — the analog of the reference's ~20
    live timer scopes (src/harmony.cpp:302-335, src/timer.h). Scopes time
    host-side dispatch+sync walls: exact on the per-round host loop (each
    round fetches the convergence flag), one aggregate scope on the
    fused single-dispatch path.
    """
    cfg = engine.cfg
    if max_iter is None:
        max_iter = cfg.max_iter_harmony
    if max_iter > cfg.max_iter_harmony:
        # The trace buffers are fixed-capacity (allocated for
        # cfg.max_iter_harmony rounds); pushing past them would silently
        # clamp onto the last slot and corrupt the convergence test's
        # window (jnp ``at[i].set`` clips out-of-bounds indices).
        raise ValueError(
            f"max_iter={max_iter} exceeds the engine's trace capacity "
            f"(config max_iter_harmony={cfg.max_iter_harmony}); build the "
            "config/state with max_iter >= the requested round budget"
        )
    if max_iter < 1:
        return state
    if verbose:
        _ensure_verbose_handler()

    if perms is None and checkpoint_path is None and not verbose:
        # Nothing needs the host between rounds: run the whole loop —
        # including the convergence test — as one device program
        # (engine.run_rounds). Per-round host round-trips otherwise cost
        # ~6 ms each through a remote-dispatch tunnel. With an abort flag
        # the run is chunked into ``abort_poll_rounds`` dispatches, the
        # flag polled between chunks (src/harmony.cpp:233-234 analog at
        # chunk granularity).
        if abort is None:
            with _scope(timers, "run_rounds"):
                state = engine.run_rounds(state, jnp.int32(max_iter))
                _sync(state)
        else:
            done = 0
            while done < max_iter:
                if abort.aborted():
                    raise KeyboardInterrupt("harmony run aborted by user")
                k = min(max(abort_poll_rounds, 1), max_iter - done)
                with _scope(timers, "run_rounds"):
                    state = engine.run_rounds(state, jnp.int32(k))
                    if timers is not None:
                        _sync(state)
                done += k
                _check_finite(state)
                if done < max_iter and bool(engine.harmony_converged(state)):
                    break
        # virtual-R runs rematerialise the user-facing R once per run
        with _scope(timers, "materialize_r"):
            state = engine.materialize_r(state)
            if timers is not None:
                _sync(state)
        _check_finite(state)
        return state

    for it in range(max_iter):
        if abort is not None and abort.aborted():
            raise KeyboardInterrupt("harmony run aborted by user")
        t0 = time.perf_counter()
        # dispatches are async: each timed scope ends with a host fetch of
        # a tiny replicated array so the recorded wall is real work, not
        # dispatch time (the convergence fetch below would otherwise
        # absorb it all)
        if perms is not None:
            with _scope(timers, "cluster"):
                state = engine.cluster(state, perms=jnp.asarray(perms[it]))
                if timers is not None:
                    _sync(state)
            with _scope(timers, "correct"):
                state = engine.correct(state)
                if timers is not None:
                    _sync(state)
        else:
            # one dispatch per round (see engine.harmony_round)
            with _scope(timers, "round"):
                state = engine.round(state)
                if timers is not None:
                    _sync(state)
        converged = bool(engine.harmony_converged(state))
        # round wall stops here (the convergence fetch synchronised);
        # checkpoint I/O below is deliberately excluded from the
        # throughput figure
        dt = time.perf_counter() - t0
        # failure detection before the checkpoint write: a diverged state
        # must never overwrite the last good checkpoint on disk
        _check_finite(state)
        if checkpoint_path and (it + 1) % checkpoint_every == 0:
            from .checkpoint import save_checkpoint

            # minimal checkpoints never persist R (load_checkpoint
            # re-derives it from (Y, Z_corr) exactly as the cluster
            # re-entry does, src/harmony.cpp:214-228) — so virtual-R runs
            # need NO per-round (K, N) materialisation here; the one
            # user-facing materialise happens after the loop
            with _scope(timers, "checkpoint"):
                save_checkpoint(
                    checkpoint_path, cfg, state,
                    mode="minimal", meta=checkpoint_meta,
                )
        if verbose:
            # per-kmeans-round ticks — the RcppProgress within-clustering
            # granularity analog (src/harmony.cpp:210, src/utils.cpp:21).
            # Each harmony round is ONE device program here (that is the
            # single-dispatch design), so the ticks flush when the round's
            # convergence fetch lands rather than live mid-dispatch; the
            # objectives come from the round's kmeans trace.
            nk = int(state.n_kmeans)
            done = int(state.kmeans_rounds[int(state.n_rounds) - 1])
            objs = np.asarray(
                state.objective_kmeans[max(nk - done, 0): nk],
                dtype=np.float64,
            )
            for j, o in enumerate(objs):
                logger.info(
                    "  kmeans %d/%d  objective=%.6f",
                    j + 1, cfg.max_iter_cluster, o,
                )
            # per-round progress with throughput — the convergence fetch
            # above synchronised with the device before dt was taken, so
            # dt is a true round wall (excluding any checkpoint write)
            obj = float(state.objective_harmony[int(state.n_harmony) - 1])
            logger.info(
                "Harmony %d/%d  objective=%.6f  (%.3fs, %.2fM cells/s)",
                it + 1, max_iter, obj, dt, cfg.N / dt / 1e6,
            )
        if converged:
            if verbose:
                logger.info("Harmony converged after %d iterations", it + 1)
            break
    with _scope(timers, "materialize_r"):
        state = engine.materialize_r(state)
        if timers is not None:
            _sync(state)
    return state


def run(
    cfg: HarmonyConfig,
    state: HarmonyState,
    verbose: bool = False,
    Y0: Optional[np.ndarray] = None,
    perms: Optional[np.ndarray] = None,
    mesh=None,
    abort=None,
    checkpoint_path: Optional[str] = None,
    checkpoint_every: int = 1,
    checkpoint_meta: Optional[dict] = None,
    timers=None,
    engine: Optional[Engine] = None,
) -> HarmonyState:
    """init_cluster + harmonize, returning the final state.

    ``engine`` may be pre-built (streamed-ingest runs construct it while
    the embedding upload is still in flight); otherwise it is built here.
    """
    if engine is None:
        with _scope(timers, "make_engine"):
            engine = make_engine(cfg, codes=state.codes, mesh=mesh)
    with _scope(timers, "init_cluster"):
        if Y0 is not None:
            state = engine.init_cluster_from(state, jnp.asarray(Y0))
        else:
            state = engine.init_cluster(state)
        _sync(state)
    return harmonize(
        engine, state, verbose=verbose, perms=perms, abort=abort,
        checkpoint_path=checkpoint_path, checkpoint_every=checkpoint_every,
        checkpoint_meta=checkpoint_meta, timers=timers,
    )
