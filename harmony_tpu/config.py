"""Configuration for the TPU-native Harmony engine.

Two-tier configuration mirroring the reference API surface:

* First-class arguments of :func:`harmony_tpu.run_harmony` (reference:
  ``RunHarmony.default``, ``R/ui.R:91-107``).
* Advanced options via :func:`harmony_options` (reference:
  ``R/harmony_option.R:33-55``), validated the same way.

The engine itself receives a fully-resolved, hashable :class:`HarmonyConfig`
(the analog of the flat positional config handed to the C++ engine's
``setup()``, ``src/harmony.cpp:29-33``) so every jitted step function can
close over it statically.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Tuple


class HarmonyConfigError(ValueError):
    """Raised on invalid user configuration (reference: R ``stop()`` paths)."""


# Legacy RunHarmony arguments that hard-error with migration advice
# (reference: ``check_legacy_args`` / ``legacy_error``, R/harmony_option.R:67-132).
_LEGACY_ARGS = {
    "do_pca": (
        "The parameters do_pca and npcs have been dropped from the run_harmony "
        "API. Pass cell embeddings directly."
    ),
    "npcs": (
        "The parameters do_pca and npcs have been dropped from the run_harmony "
        "API. Pass cell embeddings directly."
    ),
    "tau": (
        "The parameter tau has been dropped from the run_harmony API. "
        "Set it via harmony_options(tau=...)."
    ),
    "block.size": (
        "The parameter block.size has been dropped from the run_harmony API. "
        "Set it via harmony_options(block_size=...)."
    ),
    "block_size": (
        "The parameter block_size has been dropped from the run_harmony API. "
        "Set it via harmony_options(block_size=...)."
    ),
    "max.iter.harmony": (
        "The parameter max.iter.harmony is replaced with parameter max_iter."
    ),
    "max_iter_harmony": (
        "The parameter max_iter_harmony is replaced with parameter max_iter."
    ),
    "max.iter.cluster": (
        "The parameter max.iter.cluster has been dropped from the run_harmony "
        "API. Set it via harmony_options(max_iter_cluster=...)."
    ),
    "epsilon.cluster": (
        "The parameter epsilon.cluster has been dropped from the run_harmony "
        "API. Set it via harmony_options(epsilon_cluster=...)."
    ),
    "epsilon.harmony": (
        "The parameter epsilon.harmony has been dropped from the run_harmony "
        "API. Use early_stop, or harmony_options(epsilon_harmony=...)."
    ),
}


def check_legacy_args(**kwargs) -> None:
    """Reject dropped legacy arguments with actionable messages.

    Mirrors ``check_legacy_args`` (R/harmony_option.R:67-81): legacy names
    raise their migration message; any other unknown argument raises a
    generic unhandled-argument error.
    """
    for name in kwargs:
        if name in _LEGACY_ARGS:
            raise HarmonyConfigError(_LEGACY_ARGS[name])
    if kwargs:
        bad = ", ".join(sorted(kwargs))
        raise HarmonyConfigError(
            f"Argument(s) {bad} are unhandled. Please refer to the "
            "documentation for the valid harmony options."
        )


@dataclasses.dataclass(frozen=True)
class HarmonyOptions:
    """Advanced options (reference ``harmony_options()``, R/harmony_option.R:33-55).

    Defaults match the reference exactly: alpha=0.2, tau=0, block_size=0.05,
    max_iter_cluster=4, epsilon_cluster=1e-3, epsilon_harmony=1e-2,
    batch_prop_cutoff=1e-5 (R/harmony_option.R:34-40).
    """

    alpha: float = 0.2
    tau: float = 0.0
    block_size: float = 0.05
    max_iter_cluster: int = 4
    epsilon_cluster: float = 1e-3
    epsilon_harmony: float = 1e-2
    batch_prop_cutoff: float = 1e-5

    def __post_init__(self):
        # validate_block.size (R/harmony_option.R:58-63)
        if not (0.0 < self.block_size <= 1.0):
            raise HarmonyConfigError(
                "block_size should be set between 0 and 1 (0 < block_size <= 1)"
            )


def harmony_options(**kwargs) -> HarmonyOptions:
    """Construct advanced options; the analog of R ``harmony_options()``."""
    return HarmonyOptions(**kwargs)


@dataclasses.dataclass(frozen=True)
class HarmonyConfig:
    """Fully-resolved static engine configuration.

    Every field is hashable so jitted step functions can specialise on it.
    This is the analog of the state the C++ engine copies out of ``setup()``
    (src/harmony.cpp:29-111) minus the array-valued hyperparameters, which
    live in :class:`harmony_tpu.state.HarmonyState` as device arrays.
    """

    # Problem shape
    N: int  # number of cells (logical)
    d: int  # embedding dimension
    K: int  # number of clusters
    B: int  # total one-hot design rows = sum(B_vec)
    B_vec: Tuple[int, ...]  # levels per covariate (R/ui.R:219-221)
    # Physical cell-axis length: N rounded up so the axis divides the device
    # mesh. Pad cells carry zero assignment weight everywhere (R == 0) and
    # are provably inert in every reduction; None means no padding.
    N_pad: Optional[int] = None

    # Driver / convergence
    max_iter_harmony: int = 10
    max_iter_cluster: int = 4
    epsilon_cluster: float = 1e-3
    epsilon_harmony: float = 1e-2
    window_size: int = 3  # sliding window (src/harmony.cpp:19)

    # Correction
    alpha: float = 0.2
    batch_prop_cutoff: float = 1e-5
    lambda_estimation: bool = False  # lambda sentinel -1 mode (src/harmony.cpp:75-79)

    # Clustering block updates
    block_size: float = 0.05

    # Numerics
    dtype: str = "float32"  # compute dtype for the hot path
    # Precision of dot ops: 'bfloat16' | 'float32' (3-pass bf16, the
    # parity-contract default) | 'highest' (6-pass) | 'auto' (resolved by
    # dtype in finalize_engine_config — see resolve_matmul_precision).
    # The user-reachable analog of the reference's configure precision
    # probe (configure:23-40).
    matmul_precision: str = "float32"
    ridge_solver: str = "auto"  # 'auto' | 'cholesky' | 'solve' | 'arrowhead'
    # M-step moment strategy: 'dense' one-hot contractions, 'segment'
    # batch-pure tile matmuls via gathers (ops/segments.py), 'tiled'
    # batch-tiled ingest layout with zero-gather per-tile matmuls
    # (ops/tiled.py; requires a batch-tiled cell order), or 'auto'
    # (tiled when the layout allows it on the fused-kernel path, else
    # segment at large N·B, else dense).
    mstep_mode: str = "auto"
    segment_tile: int = 1024
    # Cell-tile width of the batch-tiled layout (ops/tiled.py). Finer than
    # the E-step tile so each rotate block spans many batch-pure tiles and
    # keeps a near-proportional batch mixture; must divide estep_sub_tile.
    mstep_tile: int = 256
    # M-step contraction implementation: 'xla', or 'pallas' (single-pass
    # fused moment/correction kernels, ops/pallas_ridge.py; single-covariate
    # TPU runs only — resolved from 'auto' by finalize_engine_config).
    mstep_impl: str = "xla"
    # E-step round implementation: 'xla' (ops/estep.py fori_loop), 'pallas'
    # (fused kernels: ops/pallas_rotate.py for the rotate schedule,
    # ops/pallas_estep.py for the permute layout), or 'auto' (pallas for
    # single-device rotate runs on TPU — resolved by finalize_engine_config).
    estep_impl: str = "xla"
    estep_sub_tile: int = 4096
    # Elementwise form of the Pallas assignment tile (ops/pallas_rotate.py
    # _assign_tile): 'legacy' reproduces the reference's two-normalise op
    # sequence (src/harmony.cpp:319-323); 'fused_vpu' applies the single
    # normalise the algebra allows (~half the VPU passes); 'fused_mxu'
    # additionally runs the column sums on the MXU. One config field keeps
    # the round kernel, the virtual-R correction/materialisation kernels
    # and the XLA tail recompute provably on the SAME variant — the
    # virtual-R bit-identity contract depends on it.
    estep_variant: str = "fused_vpu"
    # Pallas rotate rounds carry per-tile O statistics between rounds so a
    # round never re-reads R from HBM (ops/pallas_rotate.py v2); False falls
    # back to the two-phase kernel that recovers block stats by streaming R.
    rotate_stats_carry: bool = True
    # Virtual R: on the batch-tiled stats-carry path, no round writes the
    # (K, N) assignment matrix at all — the correction recomputes
    # assignments from the final round's tiny penalty table, and the
    # user-facing R materialises once per run (engine.materialize_r).
    # Trajectories are bit-compatible with virtual_r=False on that path
    # for <=2 covariates; with >=3 the tail correction's one-hot
    # reduction tree may differ in the last bit (_virtual_tail_r,
    # ops/ridge.py).
    # None = resolved by dtype in finalize_engine_config (r3 A/B on v5e):
    # * fp32: OFF — the correction's in-kernel assignment recompute (an
    #   extra K x N exp chain, ~1 ms at 500k) costs more than the
    #   final-round R write + correction R read it avoids (4.9 vs
    #   5.4 ms/iter at 500k x 50 B=10; 14.9 vs 16.2 ms at 1M x 100).
    # * bf16: ON — the non-virtual path's R write is f32-kernel-output +
    #   cast-to-bf16, a 3-pass HBM round-trip that dominates at scale
    #   (10M x 100 bf16: 144 ms/iter virtual vs 165 ms written).
    # The R *buffer* exists in the state either way (virtual R saves
    # bandwidth, not capacity); explicit True/False overrides the policy.
    virtual_r: "bool | None" = None
    # Cell-shuffle strategy for the block updates. 'permute' reproduces the
    # reference exactly (fresh random permutation per round; costs one
    # indexed gather/scatter of the K x N state per round). 'rotate'
    # assumes cells were shuffled once at ingest and re-randomises each
    # round with a rotation offset + random block order — contiguous rolls
    # at streaming bandwidth, no gathers; statistically equivalent but a
    # different trajectory.
    shuffle_mode: str = "permute"
    # Fused permute phase only: gather each block's cells in ascending
    # physical index order (ops/assign.make_blocks_sorted). Identical
    # block membership/commit points — the exact math is invariant to
    # within-block order (src/harmony.cpp:309-331). Measured on v5e
    # (round 5): XLA's gather lowering does NOT exploit index order —
    # 500k 74.3 -> 76.6 ms/iter, 2M 641 -> 682 ms (the extra per-round
    # sort costs, the gather doesn't improve; tools/exp_gather_layout.py
    # shows the same rate for random and block-sorted indices in both
    # table layouts) — so the default is OFF and the knob exists as the
    # recorded negative result. Parity-pinned runs (injected perms) use
    # the exact order regardless.
    permute_sorted_blocks: bool = False

    # Buffer donation for the phase functions: 'on' | 'off' | 'auto'
    # (auto = donate only when the big state arrays exceed ~2 GiB, where
    # in-place reuse matters for HBM headroom; below that, donation's
    # input/output aliasing costs dispatch-pipeline time for no benefit).
    donate: str = "auto"

    verbose: bool = False

    @property
    def donate_state(self) -> bool:
        if self.donate == "on":
            return True
        if self.donate == "off":
            return False
        state_bytes = (self.K + 2 * self.d) * self.Np * 4
        return state_bytes > 2 * 1024**3

    def __post_init__(self):
        if self.N < 6:
            # src/harmony.cpp:83-85
            raise HarmonyConfigError("Refusing to run with less than 6 cells")
        if sum(self.B_vec) != self.B:
            raise HarmonyConfigError("B must equal sum(B_vec)")
        if self.N_pad is not None and self.N_pad < self.N:
            raise HarmonyConfigError("N_pad must be >= N")

    @property
    def Np(self) -> int:
        """Physical (possibly padded) length of the cell axis."""
        return self.N if self.N_pad is None else self.N_pad

    # ---- Derived block geometry (src/harmony.cpp:279-299) -----------------

    @property
    def effective_block_size(self) -> float:
        """N < 40 forces block_size to 0.2 (src/harmony.cpp:86-88)."""
        if self.N < 40:
            return 0.2
        return self.block_size

    @property
    def n_blocks(self) -> int:
        """ceil(1 / block_size) (src/harmony.cpp:280)."""
        return int(math.ceil(1.0 / self.effective_block_size - 1e-12))

    @property
    def cells_per_block(self) -> int:
        """floor(N * block_size) (src/harmony.cpp:281)."""
        return int(self.N * self.effective_block_size)

    @property
    def last_block_size(self) -> int:
        """The final block absorbs the remainder (src/harmony.cpp:296-300)."""
        return self.N - (self.n_blocks - 1) * self.cells_per_block

    @property
    def max_block_size(self) -> int:
        return max(self.cells_per_block, self.last_block_size)

    @property
    def covariate_offsets(self) -> Tuple[int, ...]:
        """Start row of each covariate in the stacked design (src/harmony.cpp:96-97)."""
        offs = []
        acc = 0
        for b in self.B_vec:
            offs.append(acc)
            acc += b
        return tuple(offs)

    @property
    def n_covariates(self) -> int:
        return len(self.B_vec)

    @property
    def use_segments(self) -> bool:
        if self.mstep_mode == "segment":
            return True
        if self.mstep_mode == "dense":
            return False
        # XLA's dense one-hot contraction wins at small B (measured: 26ms
        # dense vs 46ms segmented at N=500k, B=10 on v5e); the segmented
        # path's O(K N d) only pays off once B is large.
        return self.N >= 65536 and self.B >= 32

    @property
    def norm_const(self) -> float:
        """Objective scaling 2000/N (src/harmony.cpp:159)."""
        return 2000.0 / float(self.N)

    # ---- Trace capacities (fixed-shape buffers held in HarmonyState) ------

    @property
    def kmeans_trace_capacity(self) -> int:
        # 1 entry from init + up to max_iter_cluster per harmony round
        return 1 + self.max_iter_harmony * self.max_iter_cluster

    @property
    def harmony_trace_capacity(self) -> int:
        # 1 entry from init + 1 per harmony round
        return 1 + self.max_iter_harmony


def resolve_matmul_precision(dtype: str, matmul_precision: str = "auto") -> str:
    """Resolve the 'auto' matmul-precision sentinel by engine dtype.

    Reduced-precision engines (itemsize < 4) run true bf16 matmuls — the
    configuration every recorded bf16 throughput figure was measured with
    (PERFORMANCE.md); float64 parity engines run 'highest'; float32 keeps
    the 3-pass fp32-equivalent passes the parity contract assumes. The
    dtype->precision policy is the analog of the reference's configure
    probe selecting a float vs double build (configure:23-40).
    """
    if matmul_precision != "auto":
        return matmul_precision
    import numpy as _np

    dt = _np.dtype(dtype)
    if dt.itemsize < 4:
        return "bfloat16"
    if dt == _np.float64:
        return "highest"
    return "float32"


def default_nclust(n_cells: int) -> int:
    """K heuristic ``min(round(N/30), 100)`` (R/ui.R:192-194).

    R's ``round`` is round-half-to-even, as is Python 3's built-in.
    """
    return min(round(n_cells / 30), 100)


def finalize_engine_config(cfg: HarmonyConfig, mesh=None) -> HarmonyConfig:
    """Resolve 'auto' implementation knobs and align the padded cell axis.

    - ``estep_impl='auto'`` picks the fused Pallas rotate kernel for
      single-device rotate-schedule runs on TPU (the Pallas kernels use
      single-device layouts; sharded runs stay on the XLA path, whose
      contractions lower to per-shard partials + psum).
    - For the Pallas rotate kernel, ``N_pad`` is rounded up to the cell
      sub-tile so block slices are tile-aligned (pad cells are provably
      inert: zero one-hot rows yield zero assignments).

    Call after any manual ``dataclasses.replace`` overrides and before
    ``init_state`` (the state is allocated at ``cfg.Np``).
    """
    import dataclasses as _dc

    import jax as _jax

    n_shards = 1 if mesh is None else mesh.size
    if cfg.estep_impl == "auto":
        if cfg.shuffle_mode == "rotate":
            use_pallas = (
                # only the stats-carry kernel has a sharded wrapper
                (mesh is None or cfg.rotate_stats_carry)
                and _jax.default_backend() == "tpu"
                # The tile-rotate kernel quantises blocks to cell tiles
                # (>=128 cells each). Below n_blocks*128 cells it cannot
                # express the reference's block count — at the extreme a
                # single block, which removes the whole dataset from E/O
                # and so nullifies the diversity penalty within each
                # round. Small runs use the exact cell-granular XLA
                # schedule instead. On a mesh the kernels run per shard
                # (ops/pallas_rotate.py sharded wrappers), so the bound
                # applies to the shard-local cells.
                and cfg.Np // n_shards >= cfg.n_blocks * 128
            )
        else:
            # Permute (reference-exact) schedule: the fused R-gather-free
            # phase measures ~1.7x the XLA round loop at 500k on v5e (68
            # vs 118 ms per 4-round cluster phase;
            # tools/exp_permute_engine.py, round 4). Single-device runs
            # use the Pallas phase (ops/pallas_estep); mesh runs the
            # SPMD-partitioned XLA variant of the same algorithm
            # (ops/permute_phase), which skips the K x N R
            # gathers/scatters the per-round path pays three of per
            # round. Flip only where measured / structurally better:
            # production-scale N, moderate K. Blocks stay cell-granular
            # (make_blocks), so no n_blocks*128 floor applies — the N
            # bound is about per-block sub-tile padding overhead, not
            # correctness.
            use_pallas = (
                _jax.default_backend() == "tpu"
                and cfg.Np >= 200_000
                and cfg.K <= 256
                # the fused phase needs the static round count (the
                # windowed early stop cannot fire when max_iter_cluster
                # <= window_size + 2); larger clustering budgets (the
                # reference's own tests use 10) run the per-round
                # kernel, which is slower than XLA's gathered loop —
                # don't auto-pick pallas there
                and cfg.max_iter_cluster <= cfg.window_size + 2
            )
        cfg = _dc.replace(cfg, estep_impl="pallas" if use_pallas else "xla")
    if (
        cfg.estep_impl == "pallas"
        and cfg.shuffle_mode != "rotate"
        and cfg.estep_sub_tile == 4096
    ):
        # Fused permute phase: each block pads to nsub * T slots, and the
        # pad slots pay full gather + kernel cost. Pick the candidate
        # sub-tile minimising ceil(S/T)*T (ties -> larger T). Measured
        # (v5e, round 5, canonical 500k: S=25000): T=4096 pads 14.7% ->
        # 74.3 ms/iter, T=2048 6.5% -> 69.9, T=1024 2.4% -> 67.8; at 2M
        # (S=100000) T∈{2048,1024} tie at 0.35% -> 627.6 ms vs 641 at
        # T=4096. Explicit estep_sub_tile values are left alone.
        S = cfg.max_block_size
        T = min(
            (4096, 2048, 1024),
            key=lambda t: (-(-S // t) * t, -t),
        )
        if T != cfg.estep_sub_tile:
            cfg = _dc.replace(cfg, estep_sub_tile=T)
    if cfg.estep_impl == "pallas" and cfg.shuffle_mode == "rotate":
        # Shrink the cell sub-tile so each shard's round has at least
        # n_blocks tiles (keeps the stochastic block schedule faithful at
        # small N; no-op at the production shapes where
        # Np/(shards*n_blocks) >> estep_sub_tile).
        T = cfg.estep_sub_tile
        # VMEM budget: the round kernel holds ~2 double-buffered copies of
        # the (d+B+K) x T tile working set; shrink T so it stays well
        # under a v5e core's 16 MB (large-K runs). B > 32 additionally
        # allocates the (K, T) run-penalty scratch (pc_s); its one-hot /
        # penalty stack temporaries are built in _PC_CHUNK-column pieces
        # (ops/pallas_rotate.py), which is what lands K=100, d=50, B=100
        # at T=4096 (full-width temporaries measured 16.6 MB > the 16 MB
        # scoped limit; chunked they fit).
        pc_extra = 4 * cfg.K if cfg.B > 32 else 0
        budget = (12 if cfg.B <= 32 else 10) * 2**20
        while T > 512 and T * (8 * (cfg.K + cfg.d + cfg.B) + pc_extra) > budget:
            T //= 2
        per_block = max(cfg.Np // n_shards // max(cfg.n_blocks, 1), 1)
        fit = 128
        while fit * 2 <= per_block:
            fit *= 2
        T = max(128, min(T, fit))
        if T != cfg.estep_sub_tile:
            cfg = _dc.replace(cfg, estep_sub_tile=T)
        # Every shard needs a tile-aligned slice: pad to shards * tile.
        align = n_shards * T
        Npt = -(-cfg.Np // align) * align
        if Npt != cfg.Np:
            cfg = _dc.replace(cfg, N_pad=Npt)
    if cfg.matmul_precision == "auto":
        cfg = _dc.replace(
            cfg, matmul_precision=resolve_matmul_precision(cfg.dtype)
        )
    if cfg.mstep_impl == "auto":
        # The fused M-step kernels (ops/pallas_ridge.py) measure at parity
        # with the XLA dense path on v5e (the per-batch unrolled matmuls pay
        # Mosaic op latency back); they stay opt-in via mstep_impl='pallas'.
        cfg = _dc.replace(cfg, mstep_impl="xla")
    if cfg.virtual_r is None:
        # dtype policy (see the field's comment): full-precision engines
        # prefer writing R once; REDUCED-precision engines prefer never
        # materialising it (the write pays an f32-output + cast
        # round-trip). Itemsize, not string compare: np.float32 spellings
        # normalise in resolve_config, but direct HarmonyConfig
        # construction may carry any dtype-like, and float64 is not
        # reduced precision.
        import numpy as _np

        cfg = _dc.replace(
            cfg, virtual_r=bool(_np.dtype(cfg.dtype).itemsize < 4)
        )
    return cfg
