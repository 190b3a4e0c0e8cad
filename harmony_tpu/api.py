"""Public API: ``run_harmony`` — NumPy in / NumPy out.

Mirrors ``RunHarmony.default`` semantics (R/ui.R:91-309): orientation
auto-detection, vector metadata coercion, hyperparameter expansion and
validation, then drives the TPU engine. Returns either the corrected
embedding (cells x dims, like the reference's ``t(getZcorr())``,
R/ui.R:292-295) or a :class:`HarmonyResult` exposing the same fields as the
reference's module object (src/harmony.cpp:672-709).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Union

import jax
import numpy as np

from .config import (
    HarmonyConfig,
    HarmonyOptions,
    check_legacy_args,
    finalize_engine_config,
    harmony_options,
)
from .driver import run as _run
from .preprocess import (
    DesignMatrix,
    build_design,
    expand_hyperparams,
    orient_embedding,
    resolve_config,
)
from .state import HarmonyState, init_state

# Below this many cells the reference-exact 'permute' schedule is cheap
# enough that auto mode keeps it (bit-comparable trajectories); above it
# the zero-gather 'rotate' schedule is ~16x faster and statistically
# equivalent (PERFORMANCE.md), which is what a production-scale run wants.
AUTO_ROTATE_MIN_CELLS = 100_000


def _resolve_shuffle_mode(
    shuffle_mode: str, n_cells: int, parity_hooks: bool, verbose: bool
) -> str:
    """Resolve shuffle_mode='auto' (VERDICT r2 #7 steering).

    'permute' when the run is small or injects parity hooks (init_Y) —
    those runs want reference-exact trajectories; 'rotate' otherwise.
    Explicit modes pass through untouched.
    """
    if shuffle_mode != "auto":
        if (
            shuffle_mode == "permute"
            and n_cells >= AUTO_ROTATE_MIN_CELLS
            and not parity_hooks
            and verbose
        ):
            import logging

            logging.getLogger("harmony_tpu").info(
                "shuffle_mode='permute' at %d cells: the reference-exact "
                "schedule re-permutes the cell layout every round; "
                "shuffle_mode='rotate' (or 'auto') is ~16x faster at this "
                "scale and statistically equivalent (PERFORMANCE.md)",
                n_cells,
            )
        return shuffle_mode
    if parity_hooks or n_cells < AUTO_ROTATE_MIN_CELLS:
        return "permute"
    if verbose:
        import logging

        logging.getLogger("harmony_tpu").info(
            "shuffle_mode='auto': using the zero-gather 'rotate' schedule "
            "at %d cells (statistically equivalent; pass "
            "shuffle_mode='permute' for reference-exact trajectories)",
            n_cells,
        )
    return "rotate"


@dataclasses.dataclass
class HarmonyResult:
    """Result object mirroring the reference engine's exposed fields
    (RCPP_MODULE, src/harmony.cpp:672-709).

    Cell-indexed array properties (Z_corr, Z_orig, R, embeddings) are
    returned in the user's input cell order; under
    ``shuffle_mode='rotate'`` the underlying ``state``/``design`` are held
    in ingest-shuffled order (``ingest_inv`` maps back)."""

    config: HarmonyConfig
    state: HarmonyState
    design: DesignMatrix
    # inverse of the ingest shuffle (shuffle_mode='rotate'); None otherwise
    ingest_inv: Optional[np.ndarray] = None
    # per-phase wall-clock accumulators of the run (runtime.PhaseTimers) —
    # the analog of the reference's live timer scopes (src/timer.h:9-31,
    # src/harmony.cpp:302-335); None when the run bypassed the driver
    timers: Optional[object] = None
    # the cells mesh the run executed on (None = single device); stored so
    # on-demand recomputes (the W property) ride the run's sharded path
    mesh: Optional[object] = None

    def phase_seconds(self) -> dict:
        """{phase: accumulated seconds} for the run (empty if untimed)."""
        return self.timers.as_dict() if self.timers is not None else {}

    # -- shapes ------------------------------------------------------------
    @property
    def N(self) -> int:
        return self.config.N

    @property
    def d(self) -> int:
        return self.config.d

    @property
    def K(self) -> int:
        return self.config.K

    @property
    def B(self) -> int:
        return self.config.B

    # device->host fetches are chunked to this many elements (~64 MB of
    # f32): one giant copy can exhaust transport/staging resources on
    # remote-attached devices, and bounded messages stream just as fast
    _FETCH_CHUNK_ELEMS = 16 * 2**20
    # chunks fetch CONCURRENTLY: on remote-attached devices each copy
    # pays a round trip, and overlapping them recovers most of the link
    # bandwidth (directly-attached chips are fast either way)
    _FETCH_WORKERS = 4

    def _fetch(self, X) -> np.ndarray:
        if not hasattr(X, "devices"):
            return np.asarray(X)
        ncols = X.shape[-1]
        cols = max(1, self._FETCH_CHUNK_ELEMS // max(1, X.shape[0]))
        if ncols <= cols:
            return np.asarray(X)
        from concurrent.futures import ThreadPoolExecutor

        starts = list(range(0, ncols, cols))
        with ThreadPoolExecutor(max_workers=self._FETCH_WORKERS) as ex:
            parts = list(
                ex.map(lambda i: np.asarray(X[:, i : i + cols]), starts)
            )
        return np.concatenate(parts, axis=-1)

    def _cells(self, X) -> np.ndarray:
        """Slice sharding pads and undo the ingest shuffle on the cell axis."""
        X = X[:, : self.config.N]
        X = self._fetch(X)
        if self.ingest_inv is not None:
            X = X[:, self.ingest_inv]
        return X

    # -- arrays (host copies, reference getters src/harmony.cpp:640-669;
    #    trailing sharding-pad columns are sliced away) -------------------
    @property
    def Z_corr(self) -> np.ndarray:
        """(d, N) corrected embedding (``getZcorr``)."""
        return self._cells(self.state.Z_corr)

    @property
    def Z_orig(self) -> np.ndarray:
        return self._cells(self.state.Z_orig)

    @property
    def Y(self) -> np.ndarray:
        """(d, K) centroids (``getCentroids``)."""
        return np.asarray(self.state.Y)

    @property
    def R(self) -> np.ndarray:
        """(K, N) soft assignments (``getR``)."""
        return self._cells(self.state.R)

    @property
    def O(self) -> np.ndarray:
        return np.asarray(self.state.O)

    @property
    def E(self) -> np.ndarray:
        return np.asarray(self.state.E)

    @property
    def embeddings(self) -> np.ndarray:
        """(N, d) corrected embedding, the default user-facing output."""
        return self.Z_corr.T

    def _tiled_layout(self):
        """Re-detect the run's batch-tiled ingest layout from the state's
        cell order (the layout is a deterministic property of the codes,
        so detection == the choice make_engine made). Lets on-demand
        recomputes ride the same zero-gather O(K·N·d) moment path the run
        used instead of materialising an (N, B) one-hot — at the 10M-cell
        sizes this framework targets, the dense fallback's one-hot alone
        is ~4 GB (VERDICT r3 weak #3)."""
        from .ops.tiled import detect_tiled_layout

        codes = np.asarray(self.state.codes)
        for t in dict.fromkeys((self.config.mstep_tile, 128)):
            tiled = detect_tiled_layout(codes, self.config.N, t)
            if tiled is not None:
                return tiled
        return None

    @property
    def W(self) -> np.ndarray:
        """(K, B+1, d) per-cluster MoE betas, intercept rows zeroed.

        The reference exposes only the last cluster's W buffer
        (src/harmony.cpp:686); here the full batched tensor is recomputed
        from the final state — through the run's own execution context
        (batch-tiled layout + mesh) when one exists, dense only as the
        small-N fallback.
        """
        import harmony_tpu.ops as ops

        _, _, W = ops.moe_correct_ridge(
            self.config, self.state.Z_orig, self.state.R, self.state.O,
            self.state.E, self.state.codes, self.state.batch_sizes,
            self.state.lamb, self.state.Y, tiled=self._tiled_layout(),
            mesh=self.mesh,
        )
        return np.asarray(W)

    def get_lambda(self) -> np.ndarray:
        """K x (B+1) ridge-penalty matrix (``getLambda``, src/harmony.cpp:657-669)."""
        if self.config.lambda_estimation:
            lam = self.config.alpha * self.E  # (K, B)
            return np.concatenate([np.zeros((self.K, 1), lam.dtype), lam], axis=1)
        return np.broadcast_to(
            np.asarray(self.state.lamb), (self.K, self.B + 1)
        ).copy()

    # -- hyperparameters (module fields, src/harmony.cpp:672-696) ----------
    @property
    def sigma(self) -> np.ndarray:
        return np.asarray(self.state.sigma)

    @property
    def theta(self) -> np.ndarray:
        return np.asarray(self.state.theta)

    @property
    def Pr_b(self) -> np.ndarray:
        return np.asarray(self.state.Pr_b)

    @property
    def B_vec(self):
        return self.config.B_vec

    @property
    def alpha(self) -> float:
        return self.config.alpha

    # -- traces ------------------------------------------------------------
    @property
    def objective_kmeans(self) -> np.ndarray:
        return self._traces()["objective_kmeans"]

    @property
    def objective_kmeans_dist(self) -> np.ndarray:
        return self._traces()["objective_kmeans_dist"]

    @property
    def objective_kmeans_entropy(self) -> np.ndarray:
        return self._traces()["objective_kmeans_entropy"]

    @property
    def objective_kmeans_cross(self) -> np.ndarray:
        return self._traces()["objective_kmeans_cross"]

    @property
    def objective_harmony(self) -> np.ndarray:
        return self._traces()["objective_harmony"]

    @property
    def kmeans_rounds(self) -> np.ndarray:
        return self._traces()["kmeans_rounds"]

    def _traces(self):
        return self.state.trace_lists(self.config)


def run_harmony(
    data_mat,
    meta_data,
    vars_use: Optional[Sequence[str]] = None,
    theta: Optional[Union[float, Sequence[float]]] = None,
    sigma: Union[float, Sequence[float]] = 0.1,
    lamb: Optional[Union[float, Sequence[float]]] = None,
    nclust: Optional[int] = None,
    max_iter: int = 10,
    early_stop: bool = True,
    plot_convergence: bool = False,
    return_object: bool = False,
    verbose: bool = False,
    seed: int = 0,
    options: Optional[HarmonyOptions] = None,
    dtype: str = "float32",
    matmul_precision: str = "auto",
    ridge_solver: str = "auto",
    init_Y: Optional[np.ndarray] = None,
    mesh=None,
    shuffle_mode: str = "auto",
    estep_impl: str = "auto",
    mstep_impl: str = "auto",
    virtual_r: Optional[bool] = None,
    abort=None,
    checkpoint_path: Optional[str] = None,
    checkpoint_every: int = 1,
    stream_ingest="auto",
    **legacy,
):
    """Run Harmony integration on a cell-embedding matrix.

    Parameters mirror ``RunHarmony.default`` (R/ui.R:91-107); ``lamb`` is
    the reference's ``lambda`` (``None`` enables estimation mode),
    ``options`` the reference's ``.options``/``harmony_options()``, and
    ``seed`` replaces R's implicit global RNG (R/ui.R:264-266). ``init_Y``
    injects initial centroids (d x K or K x d) for trajectory parity runs.

    ``mesh`` distributes the run: pass a 1-D ``jax.sharding.Mesh`` (see
    :func:`harmony_tpu.sharding.make_mesh`) or ``"auto"`` to shard cells
    data-parallel over all local devices.

    ``matmul_precision``: precision of the engine's dot ops —
    ``"bfloat16"`` | ``"float32"`` | ``"highest"``; the default
    ``"auto"`` resolves by ``dtype`` (bf16 engines run true bf16
    matmuls, the configuration the recorded bf16 throughput figures
    were measured with; fp32 keeps the parity-contract 3-pass fp32
    passes — see :func:`harmony_tpu.config.resolve_matmul_precision`,
    the analog of the reference's configure probe, configure:23-40).

    ``virtual_r``: ``None`` (default) resolves by dtype — fp32 writes the
    final round's R once, reduced-precision runs never materialise it
    during rounds (see ``HarmonyConfig.virtual_r`` for the measured
    tradeoff); trajectories are identical either way.

    ``shuffle_mode``: ``"permute"`` reproduces the reference's fresh
    random cell permutation per clustering round (bit-comparable
    trajectories); ``"rotate"`` is the statistically-equivalent
    zero-gather schedule for production-scale runs (see PERFORMANCE.md);
    ``"auto"`` (default) picks ``permute`` below 100k cells or when
    parity hooks (``init_Y``) are supplied, ``rotate`` otherwise.

    ``stream_ingest``: stream the embedding to the device in engine-dtype
    chunks on a background thread, overlapping the upload with the
    ingest-layout build and engine construction; the ingest reorder then
    runs on device (:class:`harmony_tpu.runtime.AsyncIngest`). ``"auto"``
    (default) enables it once the engine-dtype upload reaches ~256 MB
    (where the transfer dominates ingest); values are identical either
    way — streaming only changes when bytes move.

    ``abort`` (a :class:`harmony_tpu.runtime.AbortFlag`) enables
    cooperative interruption; ``checkpoint_path`` enables periodic
    crash-recovery checkpoints every ``checkpoint_every`` rounds (see
    :mod:`harmony_tpu.checkpoint`). A diverged run (non-finite objective)
    raises :class:`harmony_tpu.runtime.DivergenceError` without
    overwriting the last good checkpoint.

    Returns (N, d) corrected embeddings, or a :class:`HarmonyResult` when
    ``return_object=True``.
    """
    # Generic dispatch (the UseMethod analog, R/RunHarmony.R:27-29): an
    # AnnData-like first argument routes to the ecosystem adapter, with
    # meta_data acting as group.by.vars.
    if hasattr(data_mat, "obsm") and hasattr(data_mat, "obs"):
        from .adapters import run_harmony_anndata

        group_by = vars_use if vars_use is not None else meta_data
        if isinstance(group_by, str):
            group_by = [group_by]
        return run_harmony_anndata(
            data_mat, group_by, theta=theta, sigma=sigma, lamb=lamb,
            nclust=nclust, max_iter=max_iter, early_stop=early_stop,
            verbose=verbose, seed=seed, options=options, dtype=dtype,
            matmul_precision=matmul_precision,
            ridge_solver=ridge_solver, mesh=mesh, init_Y=init_Y,
            shuffle_mode=shuffle_mode, estep_impl=estep_impl,
            mstep_impl=mstep_impl, virtual_r=virtual_r, abort=abort,
            checkpoint_path=checkpoint_path,
            checkpoint_every=checkpoint_every, **legacy,
        )

    check_legacy_args(**legacy)
    from .runtime import enable_compilation_cache

    enable_compilation_cache()
    if options is None:
        options = harmony_options()

    design = build_design(meta_data, vars_use)
    N = design.n_cells
    Z = orient_embedding(data_mat, N, verbose=verbose)
    d = Z.shape[0]

    if verbose:
        from .driver import _ensure_verbose_handler

        _ensure_verbose_handler()
    shuffle_mode = _resolve_shuffle_mode(
        shuffle_mode, N, init_Y is not None, verbose
    )

    cfg = resolve_config(
        n_cells=N,
        d=d,
        design=design,
        nclust=nclust,
        max_iter=max_iter,
        early_stop=early_stop,
        options=options,
        verbose=verbose,
        lambda_estimation=lamb is None,
        dtype=dtype,
        ridge_solver=ridge_solver,
        shuffle_mode=shuffle_mode,
        matmul_precision=matmul_precision,
    )
    if mesh == "auto":
        from .sharding import make_mesh

        mesh = make_mesh() if jax.device_count() > 1 else None
    if mesh is not None:
        from .sharding import pad_for_mesh

        cfg = pad_for_mesh(cfg, mesh)
    overrides = {"estep_impl": estep_impl, "mstep_impl": mstep_impl}
    if virtual_r is not None:
        # bandwidth-for-write-pressure tradeoff, trajectories unchanged
        # (see HarmonyConfig.virtual_r)
        overrides["virtual_r"] = virtual_r
    cfg = dataclasses.replace(cfg, **overrides)
    cfg = finalize_engine_config(cfg, mesh)

    # 'rotate' shuffle mode pre-shuffles cells once at ingest (contiguous
    # blocks are then random subsets; see HarmonyConfig.shuffle_mode). On
    # the fused Pallas path — single-device AND mesh — the shuffle is the
    # batch-tiled order (ops/tiled.py): random within batch, batch-pure
    # tiles interleaved proportionally — the M-step then runs its
    # zero-gather O(K·N·d) path (sharded: per-shard tiles + one psum of
    # the joint moment table).
    ingest_inv = None
    ingest_perm = None
    ckpt_meta = {
        "shuffle_mode": shuffle_mode, "seed": seed,
        # mesh provenance (ADVICE r3): lets a CLI resume know the run was
        # sharded even when --mesh is not re-passed
        "mesh_size": 0 if mesh is None else int(mesh.size),
    }

    # Streamed ingest (the BASELINE north star's "each host streams its
    # cell-embedding shard"): start the chunked engine-dtype upload NOW,
    # on a background thread, so the ingest-layout build, hyperparameter
    # expansion and engine construction below all overlap the transfer;
    # the ingest reorder then happens ON DEVICE (runtime.AsyncIngest).
    # Auto-gate by UPLOAD BYTES, not cells: streaming pays extra
    # dispatches for the on-device reorder, which only amortise once the
    # transfer itself dominates (measured v5e round 5: the 10M bf16 1 GB
    # upload warm wall fell 211.5 -> 113 s, while the 100 MB canonical
    # 500k upload regressed 13 -> 30 s before this gate).
    if stream_ingest == "auto":
        import jax.numpy as _jnp

        stream_ingest = (
            N * d * _jnp.dtype(cfg.dtype).itemsize >= 256 * 2**20
        )
    stream = None
    if stream_ingest:
        from .runtime import AsyncIngest

        stream = AsyncIngest(Z, cfg, mesh=mesh)
    # 'permute' runs benefit from the same batch-tiled ingest: the E-step
    # re-permutes cells every round regardless of base order (so the
    # reference's uniform-random schedule is preserved verbatim), while
    # the M-step then rides the zero-gather tiled path instead of the
    # dense one-hot contractions. Parity-pinned runs (injected init_Y)
    # keep the caller's cell order byte-stable.
    if shuffle_mode == "rotate" or (
        shuffle_mode == "permute"
        and init_Y is None
        and cfg.estep_impl == "pallas"
    ):
        from .ops.tiled import (
            build_batch_tiled_order, choose_tiled_tile, count_joint_levels,
        )

        tiled_t = None
        if (
            cfg.estep_impl == "pallas"
            and cfg.mstep_impl != "pallas"
            and cfg.mstep_mode in ("auto", "tiled")
        ):
            tiled_t = choose_tiled_tile(
                cfg, count_joint_levels(design.codes),
                n_shards=1 if mesh is None else mesh.size,
            )
        if tiled_t:
            perm, _ = build_batch_tiled_order(design.codes, tiled_t, seed)
        elif shuffle_mode == "rotate":
            perm = np.random.default_rng(seed).permutation(N)
        else:
            # permute draws a fresh uniform permutation per round; with no
            # tiled layout to gain there is nothing to reorder at ingest
            perm = None
        # checkpoint provenance: the ingest order is deterministic in
        # (seed, tile width), so a crash-recovery resume rebuilds it from
        # the original inputs (cli._resume_run)
        ckpt_meta["tiled_tile"] = int(tiled_t or 0)
        if perm is not None:
            ingest_inv = np.argsort(perm)
            ingest_perm = perm
            if stream is None:
                Z = Z[:, perm]
            # streamed runs reorder on device (AsyncIngest.result(perm));
            # the codes reorder is small and stays on host either way
            design = dataclasses.replace(
                design, codes=design.codes[:, perm]
            )

    hp = expand_hyperparams(
        design, cfg.K, theta, sigma, lamb, options.tau, verbose=verbose
    )

    if init_Y is not None:
        init_Y = np.asarray(init_Y, dtype=np.float64)
        if init_Y.shape == (cfg.K, cfg.d):
            init_Y = init_Y.T
        if init_Y.shape != (cfg.d, cfg.K):
            raise ValueError(f"init_Y must be (d, K)={cfg.d, cfg.K}")

    from .runtime import PhaseTimers

    timers = PhaseTimers()
    engine = None
    if stream is not None:
        # build the engine while the upload streams: its host-side layout
        # detection + one-hot constant builds are transfer-independent
        # (they read the small host codes, not Z)
        from .engine import make_engine

        codes_host = design.codes.astype(np.int32)
        if cfg.Np != cfg.N:  # same zero pad init_state applies
            codes_host = np.concatenate(
                [
                    codes_host,
                    np.zeros(
                        (codes_host.shape[0], cfg.Np - cfg.N), np.int32
                    ),
                ],
                axis=1,
            )
        with timers.scope("make_engine"):
            engine = make_engine(cfg, codes=codes_host, mesh=mesh)
        with timers.scope("ingest_join"):
            Z = stream.result(ingest_perm)

    key = jax.random.PRNGKey(seed)
    state = init_state(cfg, Z, design, hp.sigma, hp.theta, hp.lamb, key)
    if mesh is not None:
        from .sharding import shard_state

        state = shard_state(state, mesh)

    state = _run(
        cfg, state, verbose=verbose, Y0=init_Y, mesh=mesh, abort=abort,
        checkpoint_path=checkpoint_path, checkpoint_every=checkpoint_every,
        checkpoint_meta=ckpt_meta, timers=timers, engine=engine,
    )

    result = HarmonyResult(
        config=cfg, state=state, design=design, ingest_inv=ingest_inv,
        timers=timers, mesh=mesh,
    )
    if plot_convergence:
        # the reference's plot_convergence hook (R/ui.R:285)
        from .plot import convergence_plot

        import matplotlib.pyplot as plt

        convergence_plot(result)
        plt.show()
    if return_object:
        return result
    return result.embeddings
