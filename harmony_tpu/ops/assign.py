"""Diversity-penalised soft-assignment E-step.

The reference's hottest loop (``update_R``, src/harmony.cpp:269-342):
cells are visited in a random permutation, in ``ceil(1/block_size)`` blocks;
for each block the global O/E statistics are decremented by the block's old
assignments, the block's assignments are recomputed as

    R_blk = L1norm( exp(-dist_blk / sigma) )  *  ((2E+1)/(O+E+1))^theta [cell]
    R_blk = L1norm(R_blk)

and O/E are incremented back. The sequential block structure is the
algorithm's online update and is preserved exactly: here it is a
``lax.scan`` over a precomputed (n_blocks, S_max) block-index matrix, with a
validity mask reproducing the reference's unequal final block
(src/harmony.cpp:293-300). All per-block math is dense (K x S) and fuses into
a handful of VPU/MXU ops.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..config import HarmonyConfig
from .normalize import l1_normalize_columns
from .stats import penalty_for_cells


def compute_distances(Y: jnp.ndarray, Z: jnp.ndarray) -> jnp.ndarray:
    """Cosine-squared distances ``dist = 2*(1 - Y^T Z)`` (src/harmony.cpp:141).

    Y and Z columns must be L2-normalised.
    """
    g = jnp.dot(Y.T, Z, preferred_element_type=jnp.float32)
    return (2.0 * (1.0 - g)).astype(Z.dtype)


def initial_assignments(dist: jnp.ndarray, sigma: jnp.ndarray) -> jnp.ndarray:
    """R = column-softmax of (-dist / sigma) (src/harmony.cpp:143-146)."""
    logits = -dist / sigma[:, None]
    return jax.nn.softmax(logits, axis=0)


def make_blocks(
    cfg: HarmonyConfig, perm: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Split a permutation of [0, N) into the reference's block structure.

    Returns ``(cell_idx, valid)`` of shape (n_blocks, S_max): block ``i``
    covers ``perm[i*cpb : i*cpb + size_i]`` where ``size_i`` is
    ``cells_per_block`` for all but the final block, which absorbs the
    remainder (src/harmony.cpp:293-300). Invalid slots carry the sentinel
    index N (a padded trash column).
    """
    nb, cpb, smax = cfg.n_blocks, cfg.cells_per_block, cfg.max_block_size
    starts = jnp.arange(nb, dtype=jnp.int32) * cpb
    sizes = jnp.full((nb,), cpb, dtype=jnp.int32).at[nb - 1].set(
        cfg.last_block_size
    )
    pos = jnp.arange(smax, dtype=jnp.int32)
    grid = starts[:, None] + pos[None, :]
    valid = pos[None, :] < sizes[:, None]
    safe = jnp.clip(grid, 0, cfg.N - 1)
    cell_idx = jnp.where(valid, perm[safe], cfg.Np)
    return cell_idx, valid


def block_update_R(
    cfg: HarmonyConfig,
    R: jnp.ndarray,  # (K, N)
    dist: jnp.ndarray,  # (K, N)
    E: jnp.ndarray,  # (K, B)
    O: jnp.ndarray,  # (K, B)
    codes: jnp.ndarray,  # (ncov, N)
    Pr_b: jnp.ndarray,  # (B,)
    sigma: jnp.ndarray,  # (K,)
    theta: jnp.ndarray,  # (B,)
    perm: jnp.ndarray,  # (N,) random cell permutation
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One full ``update_R`` pass; returns (R, E, O).

    Sequential over blocks via ``lax.scan``; within a block everything is
    dense K x S math. Gathers/scatters address a trash column at index N so
    masked slots are no-ops.
    """
    offsets = cfg.covariate_offsets
    K, N = R.shape
    dtype = R.dtype

    cell_idx, valid = make_blocks(cfg, perm)

    # Padded copies with a trash column at index N.
    R_pad = jnp.concatenate([R, jnp.zeros((K, 1), dtype)], axis=1)
    dist_pad = jnp.concatenate([dist, jnp.zeros((K, 1), dtype)], axis=1)
    codes_pad = jnp.concatenate(
        [codes, jnp.zeros((codes.shape[0], 1), codes.dtype)], axis=1
    )

    theta_row = theta[None, :]
    sigma_col = sigma[:, None]

    def body(carry, blk):
        R_pad, E, O = carry
        idx, m = blk  # (S,), (S,)
        mf = m.astype(dtype)[None, :]  # (1, S)

        R_old = R_pad[:, idx] * mf  # (K, S); trash column is zero anyway
        blk_codes = codes_pad[:, idx]  # (ncov, S)

        # Per-batch membership counts of this block, weighted by R rows:
        # O_delta[k, b] = sum_{cells in block, code=b} R[k, cell]
        # (src/harmony.cpp:312-313, 329-330). One-hot matmul -> MXU.
        b_ids = jnp.arange(cfg.B, dtype=jnp.int32)[None, :]  # (1, B)
        oh = jnp.zeros((idx.shape[0], cfg.B), dtype=dtype)  # (S, B)
        for c, off in enumerate(offsets):
            g = blk_codes[c] + off  # (S,)
            oh = oh + ((g[:, None] == b_ids) & m[:, None]).astype(dtype)

        def seg_O(Rblk):
            return jnp.dot(
                Rblk, oh, preferred_element_type=jnp.float32
            ).astype(dtype)

        # Step 1: remove block from E, O
        rs_old = jnp.sum(R_old, axis=1, keepdims=True)
        E = E - rs_old * Pr_b[None, :]
        O = O - seg_O(R_old)

        # Step 2: recompute block R (src/harmony.cpp:318-323)
        d_blk = dist_pad[:, idx]
        R_new = jnp.exp(-d_blk / sigma_col)
        R_new = l1_normalize_columns(R_new)
        pen = ((2.0 * E + 1.0) / (O + E + 1.0)) ** theta_row  # (K, B)
        pen_cells = penalty_for_cells(pen, blk_codes, offsets)
        R_new = R_new * pen_cells
        R_new = l1_normalize_columns(R_new)
        R_new = R_new * mf

        # Step 3: put block back
        rs_new = jnp.sum(R_new, axis=1, keepdims=True)
        E = E + rs_new * Pr_b[None, :]
        O = O + seg_O(R_new)

        safe_idx = jnp.where(m, idx, N)  # masked slots write the trash column
        R_pad = R_pad.at[:, safe_idx].set(jnp.where(mf > 0, R_new, 0.0))
        return (R_pad, E, O), None

    (R_pad, E, O), _ = jax.lax.scan(body, (R_pad, E, O), (cell_idx, valid))
    return R_pad[:, :N], E, O
