"""HarmonyState: the full engine state as a JAX pytree.

The analog of the C++ engine's member state (``src/harmony.h:20-70``), made
functional: every engine step is ``state -> state``. All arrays are device
arrays; all trace buffers are fixed-capacity (lengths in
:class:`harmony_tpu.config.HarmonyConfig`) with integer cursors, so the whole
state is jit-traceable and checkpointable.

Array layout follows the reference ("cells last" so the big N axis is the
TPU lane axis and the one that shards across the device mesh):

=============  ==========  ====================================================
field          shape       reference analog
=============  ==========  ====================================================
Z_orig         (d, N)      ``Z_orig`` (src/harmony.h)
Z_corr         (d, N)      ``Z_corr``
Y              (d, K)      centroids ``Y``
R              (K, N)      soft assignments ``R``
O, E           (K, B)      observed / expected batch-cluster counts
codes          (ncov, N)   integer design replacing sparse ``Phi``
Pr_b           (B,)        batch frequencies ``Pr_b = N_b / N``
batch_sizes    (B,)        ``batch_sizes`` (src/harmony.cpp:51)
sigma          (K,)        per-cluster soft-kmeans width
theta          (B,)        per-level diversity penalty
lamb           (B+1,)      ridge penalties (0 intercept); estimation mode
                           ignores this and uses alpha*E (src/utils.cpp:159-163)
=============  ==========  ====================================================
"""

from __future__ import annotations

import dataclasses
import jax
import jax.numpy as jnp
import numpy as np

from .config import HarmonyConfig
from .preprocess import DesignMatrix


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class HarmonyState:
    # Embeddings and model state. (The reference also persists a K x N
    # ``dist_mat``; here distances are recomputed from (Y, Z_corr) per
    # block — see ops/estep.py — so no dist buffer exists.)
    Z_orig: jax.Array
    Z_corr: jax.Array
    Y: jax.Array
    R: jax.Array
    O: jax.Array
    E: jax.Array

    # Static-per-run data (device side)
    codes: jax.Array  # (ncov, N) int32, local level ids per covariate
    Pr_b: jax.Array  # (B,)
    batch_sizes: jax.Array  # (B,) float

    # Hyperparameter vectors
    sigma: jax.Array  # (K,)
    theta: jax.Array  # (B,)
    lamb: jax.Array  # (B+1,)

    # Objective traces (fixed capacity + cursor), reference src/harmony.cpp:165-168
    objective_kmeans: jax.Array  # (kmeans_trace_capacity,)
    objective_kmeans_dist: jax.Array
    objective_kmeans_entropy: jax.Array
    objective_kmeans_cross: jax.Array
    n_kmeans: jax.Array  # () int32 cursor
    objective_harmony: jax.Array  # (harmony_trace_capacity,)
    n_harmony: jax.Array  # () int32 cursor
    kmeans_rounds: jax.Array  # (max_iter_harmony,) int32
    n_rounds: jax.Array  # () int32, completed harmony rounds

    # RNG
    key: jax.Array

    # Virtual-R context (rotate stats-carry runs with virtual correction
    # only; None otherwise): everything needed to reproduce the LAST
    # clustering round's assignments without R ever having been written —
    # per-block penalties, the schedule's tile->block map, the round's
    # normalised layout and the centroids it used (ops/pallas_rotate.py,
    # virtual-R section). engine.materialize_r turns these back into the
    # user-facing R (getR parity, src/harmony.cpp:646-649).
    virt_pen: jax.Array | None = None  # (nb, K, B) f32
    virt_blkmap: jax.Array | None = None  # (NT,) int32
    virt_Zn: jax.Array | None = None  # (d, Npt) f32
    virt_Y: jax.Array | None = None  # (d, K) f32

    @property
    def converged_flag(self) -> jax.Array:
        """Placeholder; harmony convergence is evaluated by the driver."""
        return self.n_rounds

    def trace_lists(self, cfg: HarmonyConfig):
        """Host-side copies of the valid prefixes of all trace buffers."""
        nk = int(self.n_kmeans)
        nh = int(self.n_harmony)
        nr = int(self.n_rounds)
        return {
            "objective_kmeans": np.asarray(self.objective_kmeans)[:nk],
            "objective_kmeans_dist": np.asarray(self.objective_kmeans_dist)[:nk],
            "objective_kmeans_entropy": np.asarray(self.objective_kmeans_entropy)[
                :nk
            ],
            "objective_kmeans_cross": np.asarray(self.objective_kmeans_cross)[:nk],
            "objective_harmony": np.asarray(self.objective_harmony)[:nh],
            "kmeans_rounds": np.asarray(self.kmeans_rounds)[:nr],
        }


def init_state(
    cfg: HarmonyConfig,
    Z: np.ndarray,
    design: DesignMatrix,
    sigma: np.ndarray,
    theta: np.ndarray,
    lamb: np.ndarray,
    key: jax.Array,
) -> HarmonyState:
    """Build the initial state (the analog of ``harmony::setup``,
    src/harmony.cpp:29-111): converts input to the compute dtype, L2-normalises
    ``Z_corr`` columns (src/harmony.cpp:42), and computes batch statistics.
    Clustering state (Y, R, O, E, dist) is zero until
    :func:`harmony_tpu.engine.init_cluster` runs (src/harmony.cpp:131-156).
    """
    dtype = jnp.dtype(cfg.dtype)
    streamed = isinstance(Z, jax.Array)
    gcodes = design.codes.astype(np.int32)
    if not streamed:
        Z = np.asarray(Z)
    if cfg.Np != cfg.N:
        # Pad the cell axis with inert zero cells (see HarmonyConfig.N_pad).
        pad = cfg.Np - cfg.N
        if not streamed:  # streamed uploads arrive pre-padded (AsyncIngest)
            Z = np.concatenate(
                [Z, np.zeros((cfg.d, pad), Z.dtype)], axis=1
            )
        gcodes = np.concatenate(
            [gcodes, np.zeros((gcodes.shape[0], pad), gcodes.dtype)], axis=1
        )
    if streamed and Z.shape != (cfg.d, cfg.Np):
        raise ValueError(
            f"streamed embedding has shape {Z.shape}, expected "
            f"{(cfg.d, cfg.Np)} (AsyncIngest pads to cfg.Np)"
        )
    Z_orig = jnp.asarray(Z, dtype=dtype)
    norms = jnp.linalg.norm(Z_orig, axis=0, keepdims=True)
    Z_corr = Z_orig / jnp.where(norms == 0, 1.0, norms)
    batch_sizes = design.batch_sizes().astype(np.float64)
    Pr_b = batch_sizes / cfg.N

    kcap = cfg.kmeans_trace_capacity
    hcap = cfg.harmony_trace_capacity
    f = lambda shape: jnp.zeros(shape, dtype=jnp.float32)

    return HarmonyState(
        Z_orig=Z_orig,
        Z_corr=Z_corr,
        Y=jnp.zeros((cfg.d, cfg.K), dtype=dtype),
        R=jnp.zeros((cfg.K, cfg.Np), dtype=dtype),
        O=jnp.zeros((cfg.K, cfg.B), dtype=dtype),
        E=jnp.zeros((cfg.K, cfg.B), dtype=dtype),
        codes=jnp.asarray(gcodes),
        Pr_b=jnp.asarray(Pr_b, dtype=dtype),
        batch_sizes=jnp.asarray(batch_sizes, dtype=dtype),
        sigma=jnp.asarray(sigma, dtype=dtype),
        theta=jnp.asarray(theta, dtype=dtype),
        lamb=jnp.asarray(lamb, dtype=dtype),
        objective_kmeans=f(kcap),
        objective_kmeans_dist=f(kcap),
        objective_kmeans_entropy=f(kcap),
        objective_kmeans_cross=f(kcap),
        n_kmeans=jnp.zeros((), dtype=jnp.int32),
        objective_harmony=f(hcap),
        n_harmony=jnp.zeros((), dtype=jnp.int32),
        kmeans_rounds=jnp.zeros(cfg.max_iter_harmony, dtype=jnp.int32),
        n_rounds=jnp.zeros((), dtype=jnp.int32),
        key=key,
    )
