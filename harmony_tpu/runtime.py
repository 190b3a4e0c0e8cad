"""Runtime niceties: persistent compilation cache, named-scope profiling,
progress reporting and cooperative abort.

The reference's instrumentation is an RAII timer map plus RcppProgress bars
with user-abort polling (src/timer.h:9-31, src/harmony.cpp:210-234,
348-356). The TPU-native equivalents here are ``jax.profiler`` traces,
host wall-clock phase timers, and a cooperative abort flag the driver polls
between rounds (device work is not interruptible mid-step).
"""

from __future__ import annotations

import contextlib
import os
import threading
import time
from typing import Dict, Optional

_CACHE_ENABLED = False


def enable_compilation_cache(path: Optional[str] = None) -> None:
    """Enable JAX's persistent compilation cache (idempotent).

    First TPU compiles can take tens of seconds (more over remote-compile
    tunnels); caching makes repeat processes fast. Opt out with
    ``HARMONY_TPU_NO_CACHE=1``.
    """
    global _CACHE_ENABLED
    if _CACHE_ENABLED or os.environ.get("HARMONY_TPU_NO_CACHE"):
        return
    import jax

    try:
        if jax.default_backend() == "cpu":
            # CPU compiles are fast and CPU AOT artifacts are sensitive to
            # exact machine features (noisy cross-process reload warnings);
            # the cache only pays off on accelerators.
            return
    except Exception:
        pass

    if path is None:
        path = os.environ.get(
            "HARMONY_TPU_CACHE_DIR",
            os.path.join(
                os.path.expanduser("~"), ".cache", "harmony_tpu", "xla"
            ),
        )
    try:
        os.makedirs(path, exist_ok=True)
        if not jax.config.jax_compilation_cache_dir:
            jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        _CACHE_ENABLED = True
    except Exception:  # cache is best-effort; never fail a run over it
        pass


class PhaseTimers:
    """Named wall-clock accumulators (the analog of the reference's
    ``timers`` map, src/timer.h:20)."""

    def __init__(self):
        self._acc: Dict[str, float] = {}
        self._count: Dict[str, int] = {}

    @contextlib.contextmanager
    def scope(self, name: str):
        import jax

        t0 = time.perf_counter()
        with jax.named_scope(name), jax.profiler.TraceAnnotation(name):
            yield
        dt = time.perf_counter() - t0
        self._acc[name] = self._acc.get(name, 0.0) + dt
        self._count[name] = self._count.get(name, 0) + 1

    def report(self) -> str:
        lines = [
            f"{name:>24s}: {self._acc[name]*1e3:10.2f} ms over "
            f"{self._count[name]} calls"
            for name in sorted(self._acc)
        ]
        return "\n".join(lines)

    def as_dict(self) -> Dict[str, float]:
        return dict(self._acc)


class DivergenceError(RuntimeError):
    """The objective trace went non-finite (NaN/Inf) mid-run.

    The reference has no failure detection (SURVEY.md §5 — it only
    error-codes a user abort, R/utils.R:27-32); at production scale a
    numerically diverged run must fail loudly instead of silently
    iterating on NaNs. The driver raises this as soon as a fetched
    objective is non-finite; if checkpointing is enabled the last *good*
    checkpoint on disk is the recovery point (the algorithm is
    restart-friendly, SURVEY.md §5)."""

    def __init__(self, round_idx: int, values):
        # Trace index 0 is the *initialization* objective (init_cluster,
        # before any harmony round); index i >= 1 is the objective after
        # round i. A non-finite entry at index 0 means the input itself
        # is bad — "resume from a checkpoint" would misdirect there.
        self.round_idx = round_idx
        self.values = values
        if round_idx == 0:
            where = (
                "at initialization (the objective of the initial "
                "clustering, before any harmony round — the input itself "
                "is likely non-finite or badly scaled)"
            )
            advice = (
                "check input scaling (embeddings should be PCA-scaled), "
                "sigma > 0, and lambda >= 0"
            )
        else:
            where = f"at round {round_idx}"
            advice = (
                "check input scaling (embeddings should be PCA-scaled), "
                "sigma > 0, and lambda >= 0; resume from the last "
                "checkpoint after fixing inputs"
            )
        super().__init__(
            f"harmony objective became non-finite {where} "
            f"(objective trace tail: {values}); the run has diverged — "
            f"{advice}"
        )


class AbortFlag:
    """Cooperative abort (the analog of ``Progress::check_abort``,
    src/harmony.cpp:233-234): the driver polls between device steps."""

    def __init__(self):
        self._event = threading.Event()

    def set(self):
        self._event.set()

    def aborted(self) -> bool:
        return self._event.is_set()


@contextlib.contextmanager
def trace(log_dir: Optional[str]):
    """Capture a ``jax.profiler`` trace for the enclosed block when
    ``log_dir`` is set (view with TensorBoard / xprof)."""
    if not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class AsyncIngest:
    """Streamed host->device upload of the (d, N) cell embedding.

    The BASELINE north star says "each host streams its cell-embedding
    shard"; the measured 10M end-to-end wall was dominated by a
    host->device transfer strictly serialized before everything else
    (VERDICT r4 missing #2). This uploader starts moving the embedding in
    engine-dtype column chunks on a background thread the moment the
    input is oriented, so the ingest-layout construction, hyperparameter
    expansion and engine build all overlap the transfer. Chunks are cast
    to the engine dtype on the host first — a bf16 run ships HALF the
    bytes of the old path (which uploaded f32 and cast on device), and a
    float64 input ships a quarter.

    On a mesh, each shard's column slice is ``device_put`` directly onto
    its device and the global array assembles with
    ``jax.make_array_from_single_device_arrays`` — no post-hoc reshard.

    ``result(perm)`` joins the thread and finishes ON DEVICE: optional
    ingest reorder (a gather — the old path did a 2 GB host fancy-index
    copy) over the padded (d, Np) array. Pad columns are zero (inert by
    the R == 0 invariant).
    """

    def __init__(self, Z, cfg, mesh=None, chunk_bytes: int = 64 << 20):
        import numpy as np

        self._Z = Z  # (d, N) host array, original cell order
        self._cfg = cfg
        self._mesh = mesh
        self._chunk = chunk_bytes
        self._parts = None
        self._exc = None
        # the engine dtype as a numpy-compatible dtype (bf16 via ml_dtypes)
        import jax.numpy as jnp

        self._np_dtype = jnp.dtype(cfg.dtype)
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def _upload_slice(self, a: int, b: int, device):
        """Cast + device_put host columns [a, b) padded to width b-a."""
        import jax
        import numpy as np

        d, N = self._Z.shape
        hi = min(b, N)
        if hi > a:
            chunk = np.ascontiguousarray(self._Z[:, a:hi]).astype(
                self._np_dtype, copy=False
            )
        else:
            chunk = np.zeros((d, 0), self._np_dtype)
        if b - a > chunk.shape[1]:  # sharding/tile pad: inert zero cells
            chunk = np.concatenate(
                [chunk, np.zeros((d, b - a - chunk.shape[1]), self._np_dtype)],
                axis=1,
            )
        return jax.device_put(chunk, device)

    def _run(self):
        try:
            import jax

            cfg, mesh = self._cfg, self._mesh
            d = self._Z.shape[0]
            Np = cfg.Np
            itemsize = jax.numpy.dtype(cfg.dtype).itemsize
            cols = max(1, self._chunk // max(1, d * itemsize))
            if mesh is None:
                dev = jax.devices()[0]
                self._parts = [
                    self._upload_slice(a, min(a + cols, Np), dev)
                    for a in range(0, Np, cols)
                ]
            else:
                # per-shard slices straight onto their devices
                devs = list(mesh.devices.flat)
                Nps = Np // len(devs)
                self._parts = [
                    self._upload_slice(s * Nps, (s + 1) * Nps, dv)
                    for s, dv in enumerate(devs)
                ]
        except BaseException as e:  # re-raised on the caller thread
            self._exc = e

    def result(self, perm=None):
        """Join the upload; return the (d, Np) device array in ingest
        order (``perm`` applied on device when given)."""
        import jax
        import jax.numpy as jnp
        import numpy as np

        self._thread.join()
        if self._exc is not None:
            raise self._exc
        cfg, mesh = self._cfg, self._mesh
        if mesh is None:
            if perm is not None:
                # assemble + reorder as ONE jitted program: eager op
                # dispatches cost ~100 ms each through a remote tunnel
                N = cfg.N
                idx = np.arange(cfg.Np, dtype=np.int32)
                idx[:N] = np.asarray(perm, dtype=np.int32)
                return jax.jit(
                    lambda i, *parts: jnp.take(
                        parts[0]
                        if len(parts) == 1
                        else jnp.concatenate(parts, axis=1),
                        i,
                        axis=1,
                    )
                )(jnp.asarray(idx), *self._parts)
            Z = (
                self._parts[0]
                if len(self._parts) == 1
                else jnp.concatenate(self._parts, axis=1)
            )
        else:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from .sharding import CELL_AXIS

            Z = jax.make_array_from_single_device_arrays(
                (self._Z.shape[0], cfg.Np),
                NamedSharding(mesh, P(None, CELL_AXIS)),
                self._parts,
            )
        if perm is not None:
            N = cfg.N
            idx = np.arange(cfg.Np, dtype=np.int32)
            idx[:N] = np.asarray(perm, dtype=np.int32)
            Z = jnp.take(Z, jnp.asarray(idx), axis=1)
            if mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P

                from .sharding import CELL_AXIS

                Z = jax.device_put(
                    Z, NamedSharding(mesh, P(None, CELL_AXIS))
                )
        return Z
