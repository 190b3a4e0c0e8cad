"""Checkpoint / resume.

The reference has no serialization (SURVEY.md §5): the engine object lives
for the session only. The algorithm is restart-friendly by construction —
the correction always recomputes from Z_orig (src/harmony.cpp:347) and
clustering re-derives R from (Y, Z_corr) on re-entry
(src/harmony.cpp:214-228) — so a *minimal* checkpoint is
{Y, O, E, hyperparameters, objective traces, PRNG key, counters} plus the
corrected embedding; R and dist are recomputed on resume.

Formats:

* ``mode='minimal'`` (default): the small replicated state + Z_corr.
  Resume requires the original embedding/design to be re-supplied.
* ``mode='full'``: every array in the state; standalone resume.

Rotate-shuffle runs (``shuffle_mode='rotate'``) hold state in
ingest-shuffled cell order: full checkpoints resume transparently, but
minimal resumes must re-supply Z/design in the same order — re-apply
``np.random.default_rng(seed).permutation(N)`` (the ingest shuffle is
deterministic in the run seed).

Storage is a single ``.npz`` plus a JSON config header — portable and
dependency-free. (For multi-host sharded runs, pair with
``jax.experimental.multihost_utils`` gather or orbax; single-file npz is
written from host-gathered arrays.)
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Optional, Tuple

import numpy as np

from .config import HarmonyConfig
from .state import HarmonyState

_MINIMAL_FIELDS = (
    "Y", "O", "E", "Z_corr",
    "Pr_b", "batch_sizes", "sigma", "theta", "lamb",
    "objective_kmeans", "objective_kmeans_dist", "objective_kmeans_entropy",
    "objective_kmeans_cross", "n_kmeans", "objective_harmony", "n_harmony",
    "kmeans_rounds", "n_rounds", "key",
)
_FULL_ONLY_FIELDS = ("Z_orig", "R", "codes")


def normalize_checkpoint_path(path: str) -> str:
    """The on-disk name always carries ``.npz`` (``np.savez`` would
    silently append it otherwise, leaving resume-existence checks looking
    at a name that is never written)."""
    return path if path.endswith(".npz") else path + ".npz"


def save_checkpoint(
    path: str, cfg: HarmonyConfig, state: HarmonyState,
    mode: str = "minimal", meta: Optional[dict] = None,
    compress: bool = False,
) -> None:
    """``meta`` persists run provenance the arrays cannot express — the
    ingest-shuffle recipe of rotate runs ({shuffle_mode, seed, tiled_tile});
    it is deterministic in those values, so a resume can rebuild the
    shuffled cell order from the original inputs (read it back with
    :func:`read_checkpoint_meta`)."""
    if mode not in ("minimal", "full"):
        raise ValueError("mode must be 'minimal' or 'full'")
    if mode == "full" and getattr(state, "virt_pen", None) is not None:
        # Virtual-R rounds leave state.R stale; a full checkpoint persists
        # R verbatim, so materialise it from the virtual context first.
        # Minimal checkpoints (the driver's per-round cadence) skip this
        # entirely — R is re-derived from (Y, Z_corr) on load.
        from .engine import materialize_r

        state = materialize_r(cfg, state)
    path = normalize_checkpoint_path(path)
    fields = _MINIMAL_FIELDS + (_FULL_ONLY_FIELDS if mode == "full" else ())
    arrays = {f: np.asarray(getattr(state, f)) for f in fields}
    if meta:
        arrays["__meta__"] = np.frombuffer(
            json.dumps(meta).encode(), dtype=np.uint8
        )
    cfg_json = json.dumps(dataclasses.asdict(cfg))
    # Atomic update: a crash mid-write (the exact scenario checkpointing
    # protects against) must not truncate the previous good checkpoint.
    # Write to a temp file in the same directory and os.replace() it in.
    tmp = path + f".tmp.{os.getpid()}"
    # compress=False by default: the bulk of a checkpoint is fp32/bf16
    # embedding data that deflate barely shrinks, while the compression
    # pass multiplies the per-round write wall at the default
    # checkpoint_every=1 cadence
    savez = np.savez_compressed if compress else np.savez
    try:
        with open(tmp, "wb") as fh:
            savez(
                fh,
                __config__=np.frombuffer(cfg_json.encode(), dtype=np.uint8),
                __mode__=np.array(mode),
                **arrays,
            )
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.remove(tmp)


def read_checkpoint_meta(path: str) -> dict:
    """The provenance dict stored by ``save_checkpoint(..., meta=...)``
    (empty if none was stored)."""
    with np.load(normalize_checkpoint_path(path), allow_pickle=False) as z:
        if "__meta__" not in z:
            return {}
        return json.loads(bytes(z["__meta__"]).decode())


def load_checkpoint(
    path: str,
    Z: Optional[np.ndarray] = None,
    design=None,
    extra_rounds: int = 10,
) -> Tuple[HarmonyConfig, HarmonyState]:
    """Load a checkpoint; for minimal checkpoints pass the original
    (d, N) embedding ``Z`` and the :class:`DesignMatrix` back in.

    ``extra_rounds`` extends ``max_iter_harmony`` (and the fixed-capacity
    trace buffers) so the resumed run has room for further rounds; trace
    pushes past capacity would otherwise be silently dropped.
    """
    import jax
    import jax.numpy as jnp

    z = np.load(normalize_checkpoint_path(path), allow_pickle=False)
    cfg_dict = json.loads(bytes(z["__config__"]).decode())
    cfg_dict["B_vec"] = tuple(cfg_dict["B_vec"])
    cfg = HarmonyConfig(**cfg_dict)
    mode = str(z["__mode__"])

    kw = {f: jnp.asarray(z[f]) for f in _MINIMAL_FIELDS}

    if extra_rounds:
        old_kcap = cfg.kmeans_trace_capacity
        old_hcap = cfg.harmony_trace_capacity
        old_rounds = cfg.max_iter_harmony
        cfg = dataclasses.replace(
            cfg, max_iter_harmony=cfg.max_iter_harmony + extra_rounds
        )

        def grow(name, old, new):
            kw[name] = jnp.concatenate(
                [kw[name], jnp.zeros(new - old, kw[name].dtype)]
            )

        for f in (
            "objective_kmeans", "objective_kmeans_dist",
            "objective_kmeans_entropy", "objective_kmeans_cross",
        ):
            grow(f, old_kcap, cfg.kmeans_trace_capacity)
        grow("objective_harmony", old_hcap, cfg.harmony_trace_capacity)
        grow("kmeans_rounds", old_rounds, cfg.max_iter_harmony)
    if mode == "full":
        for f in _FULL_ONLY_FIELDS:
            kw[f] = jnp.asarray(z[f])
    else:
        if Z is None or design is None:
            raise ValueError(
                "minimal checkpoint: pass Z (d, N) and design to resume"
            )
        Zp = np.asarray(Z)
        gcodes = design.codes.astype(np.int32)
        if cfg.Np != cfg.N:
            pad = cfg.Np - cfg.N
            Zp = np.concatenate([Zp, np.zeros((cfg.d, pad), Zp.dtype)], axis=1)
            gcodes = np.concatenate(
                [gcodes, np.zeros((gcodes.shape[0], pad), gcodes.dtype)],
                axis=1,
            )
        dtype = jnp.dtype(cfg.dtype)
        kw["Z_orig"] = jnp.asarray(Zp, dtype=dtype)
        kw["codes"] = jnp.asarray(gcodes)
        # Re-derive R/dist from (Y, Z_corr) exactly as the cluster()
        # re-entry does (src/harmony.cpp:214-228), so the state is valid
        # even when resuming before the first correction.
        from .ops.assign import compute_distances, initial_assignments
        from .ops.normalize import l2_normalize_columns

        Zc = l2_normalize_columns(kw["Z_corr"])
        dist = compute_distances(kw["Y"], Zc)
        R = initial_assignments(dist, kw["sigma"])
        if cfg.Np != cfg.N:
            R = R * (jnp.arange(cfg.Np) < cfg.N)[None, :].astype(R.dtype)
        kw["Z_corr"] = Zc
        kw["R"] = R

    state = HarmonyState(**kw)
    return cfg, state


# ---- orbax (sharded / multi-host) variant ---------------------------------


def save_checkpoint_orbax(path: str, cfg: HarmonyConfig, state: HarmonyState):
    """Sharded checkpoint via orbax: preserves device shardings, works
    multi-host (each host writes its shards). Use for mesh runs; the npz
    format above is the portable single-host path."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(
            path,
            {
                # None-valued optionals (the virtual-R context) are
                # dropped; load restores them as None defaults
                "state": {
                    f: getattr(state, f)
                    for f in state.__dataclass_fields__
                    if getattr(state, f) is not None
                },
                # orbax trees hold arrays only; config rides as JSON bytes
                "config": np.frombuffer(
                    json.dumps(dataclasses.asdict(cfg)).encode(), dtype=np.uint8
                ).copy(),
            },
            force=True,
        )


def load_checkpoint_orbax(path: str):
    """Returns (cfg, state) from an orbax checkpoint (replicated layout;
    re-shard with harmony_tpu.sharding.shard_state for mesh runs)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        tree = ckptr.restore(path)
    cfg_dict = json.loads(bytes(np.asarray(tree["config"])).decode())
    cfg_dict["B_vec"] = tuple(cfg_dict["B_vec"])
    cfg = HarmonyConfig(**cfg_dict)
    import jax.numpy as jnp

    state = HarmonyState(
        **{k: jnp.asarray(v) for k, v in tree["state"].items()}
    )
    return cfg, state
