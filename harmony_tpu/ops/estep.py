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
        "kbs,bsc->bkc", R_blk, oh, preferred_element_type=f32
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
        g = jnp.dot(Y.T, Z_b, preferred_element_type=f32)  # (K, S)
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
        O = O + jnp.dot(R_n, oh_b, preferred_element_type=f32).astype(dtype)
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
) -> RoundResult:
    """Zero-gather update round (``shuffle_mode='rotate'``).

    Pre-condition: cells were shuffled once at ingest, so any contiguous
    chunk is a random subset. Each round draws a rotation offset r and a
    random block order; blocks are contiguous S-slices of the rotated
    layout. Data movement is two rolls of each cell-indexed array —
    contiguous copies at streaming bandwidth — instead of the permute
    path's indexed gathers. The update math per block is identical to
    :func:`block_update_round`; only block *membership* differs from the
    reference's fresh full permutation, which changes the (stochastic)
    trajectory but not the algorithm.
    """
    offsets = cfg.covariate_offsets
    K, Np = R.shape
    nb = cfg.n_blocks
    dtype = R.dtype
    f32 = jnp.float32

    S = -(-Np // nb)
    L = nb * S
    k1, k2 = jax.random.split(key)
    r = jax.random.randint(k1, (), 0, Np)
    block_order = jax.random.permutation(k2, nb)

    valid = (jnp.arange(Np) < cfg.N).astype(dtype)

    def lay(X):
        Xr = jnp.roll(X, -r, axis=-1)
        if L != Np:
            Xr = jnp.concatenate(
                [Xr, jnp.zeros((*X.shape[:-1], L - Np), X.dtype)], axis=-1
            )
        return Xr

    R_lay = lay(R)
    Z_lay = lay(Z)
    c_lay = lay(codes)
    m_lay = lay(valid[None, :])[0]  # (L,)

    b_ids = jnp.arange(cfg.B, dtype=jnp.int32)
    oh = jnp.zeros((L, cfg.B), dtype=dtype)
    for c, off in enumerate(offsets):
        oh = oh + (
            (c_lay[c][:, None] + off == b_ids) & (m_lay[:, None] > 0)
        ).astype(dtype)

    # No mask-multiply needed for the old stats: appended pad slots are
    # zeros and shard-pad cells carry R == 0 by invariant.
    R_old = R_lay.reshape(K, nb, S)
    rsum_old = jnp.einsum("kbs->bk", R_old)
    O_old = jnp.einsum(
        "kbs,bsc->bkc", R_old, oh.reshape(nb, S, cfg.B),
        preferred_element_type=f32,
    ).astype(dtype)

    theta_row = theta[None, :]
    sigma_col = sigma[:, None]
    sigma_f32 = sigma.astype(f32)[:, None]

    def body(i, carry):
        E, O, acc_d, acc_e, R_new = carry
        b = block_order[i]
        start = b * S
        Z_b = jax.lax.dynamic_slice_in_dim(Z_lay, start, S, axis=1)
        oh_b = jax.lax.dynamic_slice_in_dim(oh, start, S, axis=0)
        m_b = jax.lax.dynamic_slice_in_dim(m_lay, start, S, axis=0)
        cb = jax.lax.dynamic_slice_in_dim(c_lay, start, S, axis=1)

        E = E - rsum_old[b][:, None] * Pr_b[None, :]
        O = O - O_old[b]

        g = jnp.dot(Y.T, Z_b, preferred_element_type=f32)
        d_b = (2.0 * (1.0 - g)).astype(dtype)
        R_n = jnp.exp(-d_b / sigma_col)
        R_n = l1_normalize_columns(R_n)
        pen = ((2.0 * E + 1.0) / (O + E + 1.0)) ** theta_row
        pc = None
        for c, off in enumerate(offsets):
            t = jnp.take(pen[:, off:], cb[c], axis=1)
            pc = t if pc is None else pc + t
        R_n = l1_normalize_columns(R_n * pc) * m_b[None, :]

        rs = jnp.sum(R_n, axis=1, keepdims=True)
        E = E + rs * Pr_b[None, :]
        O = O + jnp.dot(R_n, oh_b, preferred_element_type=f32).astype(dtype)
        Rf = R_n.astype(f32)
        acc_d = acc_d + jnp.sum(Rf * d_b.astype(f32))
        acc_e = acc_e + jnp.sum(
            sigma_f32 * jnp.where(Rf > 0, Rf * jnp.log(Rf), 0.0)
        )
        R_new = jax.lax.dynamic_update_slice_in_dim(R_new, R_n, start, axis=1)
        return (E, O, acc_d, acc_e, R_new)

    E, O, acc_d, acc_e, R_new = jax.lax.fori_loop(
        0, nb, body,
        (E, O, jnp.zeros((), f32), jnp.zeros((), f32),
         jnp.zeros((K, L), dtype)),
    )
    R_out = jnp.roll(R_new[:, :Np], r, axis=1)
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
