"""Pallas TPU kernel for the fused E-step round.

The XLA path (ops/estep.py) is a ``fori_loop`` whose per-block body XLA
fuses reasonably well, but every sub-step still round-trips block tensors
through HBM. This kernel runs the *entire* sequential round as one Pallas
program: the grid is (n_blocks, n_subtiles) — TPU grids execute
sequentially, so the running E/O diversity statistics live in VMEM scratch
across all steps — and each sub-tile streams (K, T) assignment tiles
through VMEM exactly once:

  j == 0        : commit "remove block" (precomputed old stats) to E/O
  every j       : dist tile on the MXU from (K,d)x(d,T); penalty applied
                  as a (K,B)x(B,T) one-hot matmul; pending add-stats
                  accumulated
  j == nsub - 1 : commit pending stats (block's new contribution)

Sub-tiling preserves the reference semantics exactly: within one block all
cells see the same (E, O) — the state after removing the whole block
(src/harmony.cpp:309-331) — so the commit points are the only places E/O
may change.

Layout note: Mosaic requires the last two dims of a block to divide
(8, 128) or equal the array's, so the (n_blocks, S) block structure is
flattened to one padded cell axis of length L = n_blocks * S_pad and
addressed with linear block indices i * nsub + j; the small per-block
statistics ride whole in VMEM and are indexed dynamically.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import HarmonyConfig
from .assign import make_blocks
from .estep import RoundResult


def _round_kernel(
    # inputs
    Yt_ref,  # (K, d) full
    Z_ref,  # (d, T) sub-tile
    oh_ref,  # (T, B) one-hot sub-tile
    m_ref,  # (1, T) validity
    rsum_old_ref,  # (nb, K) full: old block row-sums
    O_old_ref,  # (nb, K, B) full: old block batch-sums
    E_in_ref,  # (K, B)
    O_in_ref,  # (K, B)
    Pr_ref,  # (1, B)
    sigma_ref,  # (K, 1)
    theta_ref,  # (1, B)
    # outputs
    R_out_ref,  # (K, T)
    E_out_ref,  # (K, B)
    O_out_ref,  # (K, B)
    acc_ref,  # (1, 2) SMEM
    # scratch
    E_s,  # (K, B)
    O_s,  # (K, B)
    rpend_s,  # (K, 1)
    Opend_s,  # (K, B)
    accv_s,  # (1, 2)
):
    i = pl.program_id(0)
    j = pl.program_id(1)
    nsub = pl.num_programs(1)

    @pl.when((i == 0) & (j == 0))
    def _():
        E_s[:] = E_in_ref[:]
        O_s[:] = O_in_ref[:]
        accv_s[0, 0] = 0.0  # SMEM: scalar stores only
        accv_s[0, 1] = 0.0

    @pl.when(j == 0)
    def _():
        # Step 1: remove the block's old contribution (src/harmony.cpp:312-313)
        rs_old = rsum_old_ref[i, :]  # (K,)
        E_s[:] = E_s[:] - rs_old[:, None] * Pr_ref[0, :][None, :]
        O_s[:] = O_s[:] - O_old_ref[i]
        rpend_s[:] = jnp.zeros_like(rpend_s)
        Opend_s[:] = jnp.zeros_like(Opend_s)

    # Step 2: recompute this sub-tile's assignments against the committed
    # (block-removed) statistics (src/harmony.cpp:318-323).
    Z_t = Z_ref[:]  # (d, T)
    oh_t = oh_ref[:]  # (T, B)
    m_t = m_ref[0, :]  # (T,)
    g = jnp.dot(Yt_ref[:], Z_t, preferred_element_type=jnp.float32)  # (K, T)
    d_t = 2.0 * (1.0 - g)
    R_n = jnp.exp(-d_t / sigma_ref[:])
    R_n = R_n / jnp.sum(R_n, axis=0, keepdims=True)
    E, O = E_s[:], O_s[:]
    pen = ((2.0 * E + 1.0) / (O + E + 1.0)) ** theta_ref[0, :][None, :]
    pc = jnp.dot(pen, oh_t.T, preferred_element_type=jnp.float32)  # (K, T)
    R_n = R_n * pc
    colsum = jnp.sum(R_n, axis=0, keepdims=True)
    R_n = R_n / jnp.where(colsum == 0.0, 1.0, colsum)
    R_n = R_n * m_t[None, :]

    # Step 3: pending add-back + objective accumulators
    rpend_s[:] = rpend_s[:] + jnp.sum(R_n, axis=1, keepdims=True)
    Opend_s[:] = Opend_s[:] + jnp.dot(
        R_n, oh_t, preferred_element_type=jnp.float32
    )
    xlogx = jnp.where(R_n > 0, R_n * jnp.log(R_n), 0.0)
    accv_s[0, 0] = accv_s[0, 0] + jnp.sum(R_n * d_t)
    accv_s[0, 1] = accv_s[0, 1] + jnp.sum(sigma_ref[:] * xlogx)

    R_out_ref[:] = R_n

    @pl.when(j == nsub - 1)
    def _():
        # commit the block's new contribution (src/harmony.cpp:329-330)
        E_s[:] = E_s[:] + rpend_s[:] * Pr_ref[0, :][None, :]
        O_s[:] = O_s[:] + Opend_s[:]
        E_out_ref[:] = E_s[:]
        O_out_ref[:] = O_s[:]
        acc_ref[0, 0] = accv_s[0, 0]
        acc_ref[0, 1] = accv_s[0, 1]


def pallas_block_update_round(
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
    perm: jnp.ndarray,
    sub_tile: int = 2048,
    interpret: bool = False,
) -> RoundResult:
    """Drop-in replacement for ops.estep.block_update_round."""
    offsets = cfg.covariate_offsets
    K, Np = R.shape
    nb = cfg.n_blocks
    d = Z.shape[0]
    B = cfg.B
    f32 = jnp.float32

    idx, mask = make_blocks(cfg, perm)  # (nb, S)
    S = idx.shape[1]
    nsub = max(1, -(-S // sub_tile))
    S_pad = nsub * sub_tile
    if S_pad != S:
        padw = ((0, 0), (0, S_pad - S))
        idx = jnp.pad(idx, padw, constant_values=Np)
        mask = jnp.pad(mask, padw, constant_values=False)
    L = nb * S_pad
    flat_idx = idx.reshape(-1)  # (L,)
    mf = mask.astype(f32).reshape(1, L)

    pad1 = lambda X: jnp.concatenate(
        [X, jnp.zeros((*X.shape[:-1], 1), X.dtype)], axis=-1
    )
    R_lay = pad1(R.astype(f32))[:, flat_idx]  # (K, L)
    Z_lay = pad1(Z.astype(f32))[:, flat_idx]  # (d, L)
    c_lay = pad1(codes)[:, flat_idx]  # (ncov, L)

    b_ids = jnp.arange(B, dtype=jnp.int32)
    oh = jnp.zeros((L, B), dtype=f32)
    for c, off in enumerate(offsets):
        oh = oh + (
            (c_lay[c][:, None] + off == b_ids) & (mf[0][:, None] > 0)
        ).astype(f32)

    # masked slots gathered the appended zero column; no re-masking needed
    R_old = R_lay.reshape(K, nb, S_pad)
    rsum_old = jnp.einsum("kbs->bk", R_old)  # (nb, K)
    O_old = jnp.einsum(
        "kbs,bsc->bkc", R_old, oh.reshape(nb, S_pad, B),
        preferred_element_type=f32,
    )  # (nb, K, B)

    T = sub_tile
    grid = (nb, nsub)

    def lin(i, j):
        return i * nsub + j

    kernel = pl.pallas_call(
        _round_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((K, d), lambda i, j: (0, 0)),  # Yt
            pl.BlockSpec((d, T), lambda i, j: (0, lin(i, j))),  # Z tile
            pl.BlockSpec((T, B), lambda i, j: (lin(i, j), 0)),  # oh tile
            pl.BlockSpec((1, T), lambda i, j: (0, lin(i, j))),  # mask
            pl.BlockSpec((nb, K), lambda i, j: (0, 0)),  # rsum_old
            pl.BlockSpec((nb, K, B), lambda i, j: (0, 0, 0)),  # O_old
            pl.BlockSpec((K, B), lambda i, j: (0, 0)),  # E_in
            pl.BlockSpec((K, B), lambda i, j: (0, 0)),  # O_in
            pl.BlockSpec((1, B), lambda i, j: (0, 0)),  # Pr_b
            pl.BlockSpec((K, 1), lambda i, j: (0, 0)),  # sigma
            pl.BlockSpec((1, B), lambda i, j: (0, 0)),  # theta
        ],
        out_specs=[
            pl.BlockSpec((K, T), lambda i, j: (0, lin(i, j))),  # R_out
            pl.BlockSpec((K, B), lambda i, j: (0, 0)),  # E_out
            pl.BlockSpec((K, B), lambda i, j: (0, 0)),  # O_out
            pl.BlockSpec(
                (1, 2), lambda i, j: (0, 0), memory_space=pltpu.SMEM
            ),  # acc
        ],
        out_shape=[
            jax.ShapeDtypeStruct((K, L), f32),
            jax.ShapeDtypeStruct((K, B), f32),
            jax.ShapeDtypeStruct((K, B), f32),
            jax.ShapeDtypeStruct((1, 2), f32),
        ],
        scratch_shapes=[
            pltpu.VMEM((K, B), f32),  # E_s
            pltpu.VMEM((K, B), f32),  # O_s
            pltpu.VMEM((K, 1), f32),  # rpend
            pltpu.VMEM((K, B), f32),  # Opend
            pltpu.SMEM((1, 2), f32),  # accv (scalar accumulators)
        ],
        interpret=interpret,
    )
    R_new, E_out, O_out, acc = kernel(
        Y.T.astype(f32),
        Z_lay,
        oh,
        mf,
        rsum_old,
        O_old,
        E.astype(f32),
        O.astype(f32),
        Pr_b.astype(f32)[None, :],
        sigma.astype(f32)[:, None],
        theta.astype(f32)[None, :],
    )

    # scatter back via the inverse map (same as the XLA path)
    pos = jnp.full((Np + 1,), L, dtype=jnp.int32)
    pos = pos.at[flat_idx].set(jnp.arange(L, dtype=jnp.int32))
    R_flat = jnp.concatenate([R_new, jnp.zeros((K, 1), f32)], axis=1)
    R_out = R_flat[:, pos[:Np]].astype(R.dtype)
    return RoundResult(
        R=R_out,
        E=E_out.astype(E.dtype),
        O=O_out.astype(O.dtype),
        kmeans_error=acc[0, 0],
        entropy=acc[0, 1],
    )
