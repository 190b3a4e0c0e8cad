"""Fused, bandwidth-optimal E-step (the production update_R path).

Re-design of the reference's hottest loop (``update_R``,
src/harmony.cpp:269-342) for TPU memory hierarchy. Three structural changes
versus a literal translation, all value-preserving:

1. **Block layout instead of per-block gathers.** The permuted cells are
   gathered once per round into a dense (n_blocks, S) layout (one
   bandwidth-bound pass), the sequential block scan then reads contiguous
   slices, and the new R scatters back once via a precomputed inverse map.
   Block membership and order are bit-identical to the reference's
   geometry (unequal final block included) via validity masks.

2. **dist is recomputed, not stored.** During clustering Y and Z_corr are
   fixed (Harmony2 refreshes centroids only in the correction step,
   src/harmony.cpp:236-238, 610), so ``dist = 2(1 - Y^T Z)`` per block is a
   (K, d) x (d, S) MXU matmul — cheaper than streaming a K x N array from
   HBM, and it removes the K x N dist buffer from the state entirely.

3. **The objective is computed inside the round.** Each cell's final R for
   the round is known when its block is processed, so the kmeans-error and
   entropy terms accumulate per block; the diversity cross term collapses
   algebraically to a K x B contraction:

       sum_{k,n} R[k,n] sigma_k pen_log[k, code(n)]
         = sum_{k,b} sigma_k pen_log[k,b] * O[k,b]

   (grouping cells by batch), so no extra pass over R is needed —
   value-identical to src/harmony.cpp:158-170 up to summation order.

Per round this touches R twice and Z/codes once: ~5 bytes/cell/cluster,
the streaming lower bound for the update's sequential semantics.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..config import HarmonyConfig
from .assign import make_blocks
from .normalize import l1_normalize_columns


class RoundResult(NamedTuple):
    R: jnp.ndarray
    E: jnp.ndarray
    O: jnp.ndarray
    kmeans_error: jnp.ndarray  # sum R . dist over the round's final R
    entropy: jnp.ndarray  # sum sigma_k R log R


def block_update_round(
    cfg: HarmonyConfig,
    Z: jnp.ndarray,  # (d, Np) L2-normalised corrected embedding
    Y: jnp.ndarray,  # (d, K) L2-normalised centroids
    R: jnp.ndarray,  # (K, Np)
    E: jnp.ndarray,  # (K, B)
    O: jnp.ndarray,  # (K, B)
    codes: jnp.ndarray,  # (ncov, Np)
    Pr_b: jnp.ndarray,  # (B,)
    sigma: jnp.ndarray,  # (K,)
    theta: jnp.ndarray,  # (B,)
    perm: jnp.ndarray,  # (N,) cell permutation
) -> RoundResult:
    """One full update_R round in block layout, objective terms included."""
    offsets = cfg.covariate_offsets
    K, Np = R.shape
    nb = cfg.n_blocks
    S = cfg.max_block_size
    dtype = R.dtype
    f32 = jnp.float32

    idx, mask = make_blocks(cfg, perm)  # (nb, S); sentinel Np for pad slots
    mf = mask.astype(dtype)

    # ---- one gather per array into block layout --------------------------
    pad1 = lambda X: jnp.concatenate(
        [X, jnp.zeros((*X.shape[:-1], 1), X.dtype)], axis=-1
    )
    R_blk = pad1(R)[:, idx]  # (K, nb, S)
    Z_blk = pad1(Z)[:, idx]  # (d, nb, S)
    c_blk = pad1(codes)[:, idx]  # (ncov, nb, S)

    # one-hot designs per block: (nb, S, B)
    b_ids = jnp.arange(cfg.B, dtype=jnp.int32)
    oh = jnp.zeros((nb, S, cfg.B), dtype=dtype)
    for c, off in enumerate(offsets):
        oh = oh + (
            (c_blk[c][..., None] + off == b_ids) & mask[..., None]
        ).astype(dtype)

    # ---- batched old-block statistics (cells are partitioned, so block
    # i's old R is untouched by earlier block updates). Masked slots need
    # no zeroing: they gathered the appended zero column.
    rsum_old = jnp.einsum("kbs->bk", R_blk)  # (nb, K)
    O_old = jnp.einsum(
        "kbs,bsc->bkc", R_blk.astype(f32), oh.astype(f32),
        preferred_element_type=f32,
    ).astype(dtype)  # (nb, K, B)

    theta_row = theta[None, :]
    sigma_col = sigma[:, None]
    sigma_f32 = sigma.astype(f32)[:, None]

    # fori_loop with mid-axis dynamic slices: no physical transposes of the
    # big block tensors, and R_new writes land in a (K, nb, S) buffer whose
    # flat view feeds the inverse-map gather directly.
    def body(i, carry):
        E, O, acc_d, acc_e, R_new_all = carry
        Z_b = jax.lax.dynamic_index_in_dim(Z_blk, i, axis=1, keepdims=False)
        oh_b = jax.lax.dynamic_index_in_dim(oh, i, axis=0, keepdims=False)
        m_b = jax.lax.dynamic_index_in_dim(mf, i, axis=0, keepdims=False)
        cb = jax.lax.dynamic_index_in_dim(c_blk, i, axis=1, keepdims=False)

        # Step 1: remove the block's old contributions (src/harmony.cpp:312-313)
        E = E - rsum_old[i][:, None] * Pr_b[None, :]
        O = O - O_old[i]

        # Step 2: recompute the block's assignments (src/harmony.cpp:318-323)
        g = jnp.dot(
            Y.T.astype(f32), Z_b.astype(f32), preferred_element_type=f32
        )  # (K, S)
        d_b = (2.0 * (1.0 - g)).astype(dtype)
        R_n = jnp.exp(-d_b / sigma_col)
        R_n = l1_normalize_columns(R_n)
        pen = ((2.0 * E + 1.0) / (O + E + 1.0)) ** theta_row  # (K, B)
        pc = None
        for c, off in enumerate(offsets):
            t = jnp.take(pen[:, off:], cb[c], axis=1)
            pc = t if pc is None else pc + t
        R_n = l1_normalize_columns(R_n * pc) * m_b[None, :]

        # Step 3: add the block back + objective accumulators
        rs = jnp.sum(R_n, axis=1, keepdims=True)
        E = E + rs * Pr_b[None, :]
        O = O + jnp.dot(
            R_n.astype(f32), oh_b.astype(f32), preferred_element_type=f32
        ).astype(dtype)
        Rf = R_n.astype(f32)
        acc_d = acc_d + jnp.sum(Rf * d_b.astype(f32))
        acc_e = acc_e + jnp.sum(
            sigma_f32 * jnp.where(Rf > 0, Rf * jnp.log(Rf), 0.0)
        )
        R_new_all = jax.lax.dynamic_update_slice_in_dim(
            R_new_all, R_n[:, None, :], i, axis=1
        )
        return (E, O, acc_d, acc_e, R_new_all)

    E, O, acc_d, acc_e, R_new = jax.lax.fori_loop(
        0,
        nb,
        body,
        (
            E, O, jnp.zeros((), f32), jnp.zeros((), f32),
            jnp.zeros((K, nb, S), dtype),
        ),
    )

    # ---- scatter back via the precomputed inverse map --------------------
    flat_idx = idx.reshape(-1)  # (nb*S,) cell of each slot (Np = pad)
    pos = jnp.full((Np + 1,), nb * S, dtype=jnp.int32)
    pos = pos.at[flat_idx].set(jnp.arange(nb * S, dtype=jnp.int32))
    R_flat = jnp.concatenate(
        [R_new.reshape(K, nb * S), jnp.zeros((K, 1), dtype)], axis=1
    )
    R_out = R_flat[:, pos[:Np]]
    # cells not covered by any block (sharding pads) keep zero R; real cells
    # are always covered (blocks partition [0, N)).
    return RoundResult(R=R_out, E=E, O=O, kmeans_error=acc_d, entropy=acc_e)


class RotateLayout(NamedTuple):
    """Per-cluster-phase constants for the rotate schedule (built once; Z and
    codes are fixed across a phase's rounds, only R/E/O change)."""

    Z_pad: jnp.ndarray  # (d, Np+S) Z with its first S columns mirrored
    oh_pad: jnp.ndarray  # (Np+S, B) one-hot design, mirrored, pad rows zero
    codes_pad: jnp.ndarray  # (ncov, Np+S)
    valid_pad: jnp.ndarray  # (Np+S,) 1.0 for real cells


def make_rotate_layout(
    cfg: HarmonyConfig, Z: jnp.ndarray, codes: jnp.ndarray
) -> RotateLayout:
    """Build the mirror-padded phase constants for :func:`rotate_update_round`.

    The mirror pad (first S columns appended) makes every circular block
    slice ``[(r + b·S) mod Np, +S)`` a single contiguous ``dynamic_slice``.
    """
    dtype = Z.dtype
    Np = cfg.Np
    S = -(-Np // cfg.n_blocks)
    mirror = lambda X: jnp.concatenate([X, X[..., :S]], axis=-1)
    valid = (jnp.arange(Np) < cfg.N).astype(dtype)
    codes_pad = mirror(codes)
    valid_pad = mirror(valid)
    b_ids = jnp.arange(cfg.B, dtype=jnp.int32)
    oh = jnp.zeros((Np + S, cfg.B), dtype=dtype)
    for c, off in enumerate(cfg.covariate_offsets):
        oh = oh + (
            (codes_pad[c][:, None] + off == b_ids)
            & (valid_pad[:, None] > 0)
        ).astype(dtype)
    return RotateLayout(
        Z_pad=mirror(Z), oh_pad=oh, codes_pad=codes_pad, valid_pad=valid_pad
    )


def rotate_update_round(
    cfg: HarmonyConfig,
    Z: jnp.ndarray,  # (d, Np)
    Y: jnp.ndarray,  # (d, K)
    R: jnp.ndarray,  # (K, Np)
    E: jnp.ndarray,
    O: jnp.ndarray,
    codes: jnp.ndarray,
    Pr_b: jnp.ndarray,
    sigma: jnp.ndarray,
    theta: jnp.ndarray,
    key: jax.Array,
    layout: RotateLayout | None = None,
) -> RoundResult:
    """Roll-free update round (``shuffle_mode='rotate'``).

    Pre-condition: cells were shuffled once at ingest, so any contiguous
    chunk is a random subset. Each round draws a rotation offset r and a
    random block order. Virtual position ``p ∈ [0, nb·S)`` holds cell
    ``(p + r) mod Np`` when ``p < Np`` and nothing otherwise; block b is
    positions ``[b·S, (b+1)·S)``. Nothing is physically rotated: blocks are
    contiguous slices of mirror-padded fixed layouts (see
    :func:`make_rotate_layout`), so per round the only full-array traffic is
    one read of R and one write of the new R — the streaming lower bound.
    The update math per block is identical to :func:`block_update_round`;
    only block *membership* differs from the reference's fresh full
    permutation, which changes the (stochastic) trajectory but not the
    algorithm.
    """
    offsets = cfg.covariate_offsets
    K, Np = R.shape
    nb = cfg.n_blocks
    dtype = R.dtype
    f32 = jnp.float32

    S = -(-Np // nb)
    if layout is None:
        layout = make_rotate_layout(cfg, Z, codes)
    k1, k2 = jax.random.split(key)
    r = jax.random.randint(k1, (), 0, Np)
    block_order = jax.random.permutation(k2, nb)

    # Old R values, mirror-padded like the phase constants. Dead slots
    # (p >= Np) are masked per block; shard-pad cells carry R == 0 by
    # invariant, so only the position mask is needed for the old stats.
    R_pad = jnp.concatenate([R, R[:, :S]], axis=1)  # (K, Np+S)

    theta_row = theta[None, :]
    sigma_col = sigma[:, None]
    sigma_f32 = sigma.astype(f32)[:, None]
    pos = jnp.arange(S, dtype=jnp.int32)

    def body(i, carry):
        E, O, acc_d, acc_e, R_new = carry
        b = block_order[i]
        start = (b * S + r) % Np  # in [0, Np); slice fits in Np+S
        live = ((b * S + pos) < Np).astype(dtype)  # kills p >= Np slots
        Z_b = jax.lax.dynamic_slice_in_dim(layout.Z_pad, start, S, axis=1)
        oh_b = jax.lax.dynamic_slice_in_dim(layout.oh_pad, start, S, axis=0)
        v_b = jax.lax.dynamic_slice_in_dim(layout.valid_pad, start, S, axis=0)
        cb = jax.lax.dynamic_slice_in_dim(layout.codes_pad, start, S, axis=1)
        m_b = live * v_b

        # Step 1: remove the block's old contributions (src/harmony.cpp:312-313)
        R_b_old = (
            jax.lax.dynamic_slice_in_dim(R_pad, start, S, axis=1)
            * live[None, :]
        )
        E = E - jnp.sum(R_b_old, axis=1, keepdims=True) * Pr_b[None, :]
        O = O - jnp.dot(
            R_b_old.astype(f32), oh_b.astype(f32),
            preferred_element_type=f32,
        ).astype(dtype)

        # Step 2: recompute the block's assignments (src/harmony.cpp:318-323)
        g = jnp.dot(
            Y.T.astype(f32), Z_b.astype(f32), preferred_element_type=f32
        )
        d_b = (2.0 * (1.0 - g)).astype(dtype)
        R_n = jnp.exp(-d_b / sigma_col)
        R_n = l1_normalize_columns(R_n)
        pen = ((2.0 * E + 1.0) / (O + E + 1.0)) ** theta_row
        pc = None
        for c, off in enumerate(offsets):
            t = jnp.take(pen[:, off:], cb[c], axis=1)
            pc = t if pc is None else pc + t
        R_n = l1_normalize_columns(R_n * pc) * m_b[None, :]

        # Step 3: add the block back + objective accumulators
        rs = jnp.sum(R_n, axis=1, keepdims=True)
        E = E + rs * Pr_b[None, :]
        O = O + jnp.dot(
            R_n.astype(f32), oh_b.astype(f32), preferred_element_type=f32
        ).astype(dtype)
        Rf = R_n.astype(f32)
        acc_d = acc_d + jnp.sum(Rf * d_b.astype(f32))
        acc_e = acc_e + jnp.sum(
            sigma_f32 * jnp.where(Rf > 0, Rf * jnp.log(Rf), 0.0)
        )
        # Merged write: the (single) partial block's dead tail must not
        # clobber already-written neighbours in the circular buffer.
        cur = jax.lax.dynamic_slice_in_dim(R_new, start, S, axis=1)
        R_w = jnp.where(live[None, :] > 0, R_n, cur)
        R_new = jax.lax.dynamic_update_slice_in_dim(R_new, R_w, start, axis=1)
        return (E, O, acc_d, acc_e, R_new)

    E, O, acc_d, acc_e, R_new = jax.lax.fori_loop(
        0, nb, body,
        (E, O, jnp.zeros((), f32), jnp.zeros((), f32),
         jnp.zeros((K, Np + S), dtype)),
    )
    # Fold the mirror region back: each cell was written exactly once, at
    # its main position or (for a slice crossing Np) its mirror, so add.
    R_out = R_new[:, :Np].at[:, :S].add(R_new[:, Np:])
    return RoundResult(R=R_out, E=E, O=O, kmeans_error=acc_d, entropy=acc_e)


def objective_from_stats(
    cfg: HarmonyConfig,
    kmeans_error: jnp.ndarray,
    entropy: jnp.ndarray,
    O: jnp.ndarray,
    E: jnp.ndarray,
    sigma: jnp.ndarray,
    theta: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Objective from in-round accumulators + the O-contraction cross term.

    Value-identical to ``compute_objective`` (src/harmony.cpp:158-170) up to
    fp summation order; see module docstring for the algebra.
    """
    nc = jnp.float32(cfg.norm_const)
    Of, Ef = O.astype(jnp.float32), E.astype(jnp.float32)
    pen_log = theta.astype(jnp.float32)[None, :] * jnp.log(
        (Of + Ef + 1.0) / (2.0 * Ef + 1.0)
    )
    cross = jnp.sum(sigma.astype(jnp.float32)[:, None] * pen_log * Of)
    total = (kmeans_error + entropy + cross) * nc
    return total, kmeans_error * nc, entropy * nc, cross * nc
