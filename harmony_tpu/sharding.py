"""Cell-sharded data parallelism over a TPU device mesh.

The scaling axis of Harmony is N cells (SURVEY.md §2.3): Z (d, N), R/dist
(K, N) and the code arrays shard over a 1-D ``cells`` mesh axis, while the
small cluster state (Y, O, E, hyperparameters, traces) stays replicated.
Every global reduction in the algorithm — E/O block deltas
(src/harmony.cpp:312-330), objective partials (src/harmony.cpp:158-170) and
the M-step normal-equation moments (src/harmony.cpp:561-616) — is a sum
over cells, so under jit XLA lowers the contractions over the sharded axis
to per-shard partial sums + ``psum`` over ICI (the NCCL-equivalent the
reference lacks). Computation follows data: placing the state with
:func:`shard_state` is sufficient; no per-op annotations are needed.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .state import HarmonyState

CELL_AXIS = "cells"


def initialize_distributed(**kwargs) -> int:
    """Initialise multi-host JAX (idempotent); returns the process count.

    The multi-host entry point for pod-slice runs: call once per host
    before building the mesh, then ``make_mesh()`` spans all global
    devices and the psum set rides ICI within a slice / DCN across
    slices. Arguments pass through to ``jax.distributed.initialize``
    (coordinator address etc. default from the TPU environment).
    """
    already = getattr(jax.distributed, "is_initialized", None)
    if already is not None and already():
        return jax.process_count()
    try:
        jax.distributed.initialize(**kwargs)
    except RuntimeError as e:
        # Idempotence only: re-initialisation is fine, but a genuinely
        # failed init (bad coordinator address, port clash, timeout) must
        # surface — silently degrading to single-process would run the
        # full workload on one host's devices.
        if "already" in str(e).lower():
            return jax.process_count()
        raise
    return jax.process_count()


def make_mesh(n_devices: Optional[int] = None, devices=None) -> Mesh:
    """1-D mesh over the cell axis (all global devices by default)."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (CELL_AXIS,))


def pad_for_mesh(cfg, mesh: Mesh):
    """Round the physical cell axis up to a multiple of the mesh size."""
    import dataclasses
    import math

    n = mesh.size
    Np = int(math.ceil(cfg.Np / n) * n)
    if Np == cfg.N:
        return cfg
    return dataclasses.replace(cfg, N_pad=Np)


def state_shardings(
    mesh: Mesh, state: Optional[HarmonyState] = None
) -> HarmonyState:
    """A HarmonyState-shaped pytree of NamedShardings.

    Arrays with a trailing N axis shard over ``cells``; everything else is
    replicated. Pass ``state`` so the optional virtual-R context fields
    (None on non-virtual states) mirror its pytree structure — a
    ``jax.tree.map`` over (state, shardings) needs equal treedefs, and a
    post-run virtual state (e.g. an orbax checkpoint of a mesh rotate run)
    carries real arrays there. Their layout matches how the engine lays
    them out (ops/pallas_rotate.py sharded_* wrappers): penalty tables
    stack per shard on the leading axis, the tile->block map rides with
    the tiles, the normalised layout shards like Z.
    """
    cell = NamedSharding(mesh, P(None, CELL_AXIS))
    rep1 = NamedSharding(mesh, P())
    virt = {}
    if state is not None:
        if state.virt_pen is not None:
            virt["virt_pen"] = NamedSharding(mesh, P(CELL_AXIS, None, None))
        if state.virt_blkmap is not None:
            virt["virt_blkmap"] = NamedSharding(mesh, P(CELL_AXIS))
        if state.virt_Zn is not None:
            virt["virt_Zn"] = cell
        if state.virt_Y is not None:
            virt["virt_Y"] = rep1
    return HarmonyState(
        Z_orig=cell, Z_corr=cell, Y=rep1, R=cell,
        O=rep1, E=rep1,
        codes=cell, Pr_b=rep1, batch_sizes=rep1,
        sigma=rep1, theta=rep1, lamb=rep1,
        objective_kmeans=rep1, objective_kmeans_dist=rep1,
        objective_kmeans_entropy=rep1, objective_kmeans_cross=rep1,
        n_kmeans=rep1,
        objective_harmony=rep1, n_harmony=rep1,
        kmeans_rounds=rep1, n_rounds=rep1,
        key=rep1,
        **virt,
    )


def shard_state(state: HarmonyState, mesh: Mesh) -> HarmonyState:
    """Place the state on the mesh (cells sharded, cluster state replicated)."""
    shardings = state_shardings(mesh, state)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, s), state, shardings
    )


def constrain_state(state: HarmonyState, mesh: Optional[Mesh]) -> HarmonyState:
    """Inside-jit sharding constraint keeping the canonical layout."""
    if mesh is None:
        return state
    shardings = state_shardings(mesh, state)
    return jax.tree.map(
        lambda x, s: jax.lax.with_sharding_constraint(x, s), state, shardings
    )
