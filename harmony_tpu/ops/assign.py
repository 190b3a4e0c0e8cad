"""Diversity-penalised soft-assignment E-step.

The reference's hottest loop (``update_R``, src/harmony.cpp:269-342):
cells are visited in a random permutation, in ``ceil(1/block_size)`` blocks;
for each block the global O/E statistics are decremented by the block's old
assignments, the block's assignments are recomputed as

    R_blk = L1norm( exp(-dist_blk / sigma) )  *  ((2E+1)/(O+E+1))^theta [cell]
    R_blk = L1norm(R_blk)

and O/E are incremented back. This module holds the assignment primitives
and the block-geometry builder (reproducing the reference's unequal final
block, src/harmony.cpp:293-300); the fused production round lives in
:mod:`harmony_tpu.ops.estep`.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..config import HarmonyConfig


def compute_distances(Y: jnp.ndarray, Z: jnp.ndarray) -> jnp.ndarray:
    """Cosine-squared distances ``dist = 2*(1 - Y^T Z)`` (src/harmony.cpp:141).

    Y and Z columns must be L2-normalised.
    """
    # operands upcast: bf16 is a storage dtype; contractions run in f32
    # (CPU has no bf16 dot kernels, and TPU rounds inputs per
    # cfg.matmul_precision regardless)
    g = jnp.dot(
        Y.T.astype(jnp.float32), Z.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )
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
    sizes = jnp.full((nb,), cpb, dtype=jnp.int32).at[nb - 1].set(
        cfg.last_block_size
    )
    pos = jnp.arange(smax, dtype=jnp.int32)
    valid = pos[None, :] < sizes[:, None]
    # Blocks are contiguous windows of the permutation at static starts
    # i*cpb — static slices, no general gather (a (nb, smax) gather
    # measures ~3 ms at 500k on v5e; the slices are plain copies). The
    # tail is padded by smax so a window may overrun N without
    # dynamic_slice clamping its START (when last_block_size <
    # cells_per_block, e.g. N=100, block_size=0.3 -> blocks 30/30/30/10,
    # the last window would otherwise shift and return wrong cells);
    # overrun slots are invalid and masked to the Np sentinel.
    p32 = perm.astype(jnp.int32)
    p_pad = jnp.concatenate([p32, jnp.zeros((smax,), jnp.int32)])
    rows = jnp.stack(
        [
            jax.lax.dynamic_slice_in_dim(p_pad, i * cpb, smax)
            for i in range(nb)
        ]
    )
    cell_idx = jnp.where(valid, rows, cfg.Np)
    return cell_idx, valid


def make_blocks_sorted(
    cfg: HarmonyConfig, perm: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """:func:`make_blocks` with each block's members in ASCENDING cell
    order.

    Block MEMBERSHIP and processing order are identical to
    :func:`make_blocks` (the reference's geometry, src/harmony.cpp:
    293-300); only the within-block visit order changes — which the
    algorithm's exact math is invariant to (every cell of a block sees
    the same post-removal (E, O), src/harmony.cpp:309-331; only fp
    summation order of the block's aggregate statistics regroups).
    Ascending indices turn the layout gather's HBM access pattern from
    uniform-random into nb interleaved ascending streams (stride ~nb
    between consecutive columns), which restores gather bandwidth past
    the ≥2M-cell cache-reach cliff (PERFORMANCE.md permute section).

    Built with ONE extra sort per round: the composite key
    ``block(p) * (Np+1) + perm[p]`` sorts jointly by (block, cell); the
    static block boundaries then slice it exactly like make_blocks.
    Exact-trajectory runs (injected perms) keep :func:`make_blocks`.
    """
    nb, cpb, smax = cfg.n_blocks, cfg.cells_per_block, cfg.max_block_size
    N = perm.shape[0]
    stride = cfg.Np + 1
    # key range nb * (Np+1): int32 up to ~100M cells at nb=20; use i64
    # beyond (jax x64 may be off, so guard statically)
    kdt = jnp.int32 if nb * stride < 2**31 else jnp.int64
    p = jnp.arange(N, dtype=kdt)
    b_of_p = jnp.minimum(p // cpb, nb - 1)  # last block absorbs
    key = jnp.sort(b_of_p * stride + perm.astype(kdt))
    cell_sorted = (key % stride).astype(jnp.int32)

    sizes = jnp.full((nb,), cpb, dtype=jnp.int32).at[nb - 1].set(
        cfg.last_block_size
    )
    pos = jnp.arange(smax, dtype=jnp.int32)
    valid = pos[None, :] < sizes[:, None]
    c_pad = jnp.concatenate(
        [cell_sorted, jnp.zeros((smax,), jnp.int32)]
    )
    rows = jnp.stack(
        [
            jax.lax.dynamic_slice_in_dim(c_pad, i * cpb, smax)
            for i in range(nb)
        ]
    )
    cell_idx = jnp.where(valid, rows, cfg.Np)
    return cell_idx, valid
