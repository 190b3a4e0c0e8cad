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

from typing import NamedTuple

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


# ---------------------------------------------------------------------------
# Fused permute PHASE: reference-exact schedule without per-round R gathers
# ---------------------------------------------------------------------------
#
# The per-round kernel above still pays the permute schedule's dominant
# cost: every round gathers the (K, N) R into block layout, reduces it for
# the old-block statistics, and scatters the new R back — three full
# K x N indexed passes per round (VERDICT r3 weak #5 measured the
# schedule at ~3.4M cells/s against rotate's ~100M; the fused phase
# below lands it at ~6.7M fp32 / 8.0M bf16, round 4).
#
# This phase-level design removes R from the round loop entirely, by the
# same observation that powers rotate's virtual R: DURING a clustering
# phase, Y and Z_corr are fixed (Harmony2 refreshes centroids only in the
# correction, src/harmony.cpp:236-238, 610), so a cell's current
# assignment is a pure function of (Y, Z_cell, penalty table in force
# when its block was last processed). Carrying the per-block penalty
# tables (nb x K x B — tiny) and each cell's last block id across rounds
# lets round r+1 RECOMPUTE round r's assignments on the fly — bit-equal
# to what round r would have written, because both run the identical
# in-kernel op chain on identical inputs (per-column MXU products and
# elementwise chains are column-deterministic) — instead of gathering a
# 200 MB matrix through HBM.
#
# Per round the only full-size traffic left is the (d, N) Z gather into
# the round's fresh block layout (the permutation is the reference
# semantics — it cannot be avoided, src/harmony.cpp:272-273) plus one
# in-kernel read of it; R is written once, by the final round, and
# scattered back to natural order once per phase.
#
# Block membership, processing order and the E/O update points remain
# bit-faithful to the reference geometry (same make_blocks partition of
# the injected or drawn permutation).


class PermutePhaseResult(NamedTuple):
    R: jnp.ndarray  # (K, Np) natural order, the final round's assignments
    E: jnp.ndarray  # (K, B) per-round stacks below are post-round values
    O: jnp.ndarray
    E_rounds: jnp.ndarray  # (rounds, K, B)
    O_rounds: jnp.ndarray  # (rounds, K, B)
    kmeans_error: jnp.ndarray  # (rounds,)
    entropy: jnp.ndarray  # (rounds,)
    M: "jnp.ndarray | None" = None  # (n_joint+1, K, d+1) fused moments


def _permute_round_kernel(
    # inputs
    Yt_ref,  # (K, d)
    Z_ref,  # (d, T) tile
    c_ref,  # (ncov, T) int32 codes tile
    blk_ref,  # (1, T) int32 previous-round block id per cell (nb = none)
    m_ref,  # (1, T) validity
    pen_prev_ref,  # (K, nbp*B) previous-round penalty tables + ones tail
    E_in_ref,  # (K, B)
    O_in_ref,  # (K, B)
    Pr_ref,  # (1, B)
    sigma_ref,  # (K, 1)
    theta_ref,  # (1, B)
    *rest,
    offsets: tuple,
    B: int,
    nbp: int,
    chunk: int,
):
    it = iter(rest)
    E_out_ref = next(it)
    O_out_ref = next(it)
    pen_out_ref = next(it)  # (nb, K, B) unblocked (VMEM-resident)
    acc_ref = next(it)  # (1, 2) SMEM
    E_s, O_s, pen_s, pend_r_s, pend_O_s = (
        next(it), next(it), next(it), next(it), next(it),
    )
    accv_s = next(it)  # (1, 2) SMEM

    i = pl.program_id(0)  # block
    p = pl.program_id(1)  # 0 = recompute-old/remove, 1 = assign/add
    j = pl.program_id(2)  # sub-tile
    nsub = pl.num_programs(2)
    n_steps_done = (i * 2 + p) * nsub + j

    @pl.when(n_steps_done == 0)
    def _():
        E_s[:] = E_in_ref[:]
        O_s[:] = O_in_ref[:]
        accv_s[0, 0] = 0.0
        accv_s[0, 1] = 0.0

    @pl.when(j == 0)
    def _():
        pend_r_s[:] = jnp.zeros_like(pend_r_s)
        pend_O_s[:] = jnp.zeros_like(pend_O_s)

    # shared head of both phases: distances + the un-penalised softmax.
    # Per-column MXU/VPU results are column-deterministic, so phase 0's
    # recompute of a cell reproduces the value phase 1 computed for it
    # last round bit-for-bit (same Y, same Z column, same sigma).
    Z_t = Z_ref[:]  # (d, T)
    T_t = Z_t.shape[1]
    m_t = m_ref[0, :]
    g = jnp.dot(Yt_ref[:], Z_t, preferred_element_type=jnp.float32)
    d_t = 2.0 * (1.0 - g)
    e = jnp.exp(-d_t / sigma_ref[:])
    R1 = e / jnp.sum(e, axis=0, keepdims=True)

    # op-lean forms (the chunk machinery only engages at large B, where
    # the (nbp*B, T) temporaries would blow the kernel stack): the
    # per-step op count, not arithmetic, bounds this kernel — every extra
    # Mosaic op costs ~us against a ~10 us tile budget
    nch = max(1, T_t // chunk)
    Tc = T_t // nch

    def oh_codes(sl, Tw):
        """(B, Tw) multi-hot of the slice's batch codes."""
        b_iota = jax.lax.broadcasted_iota(jnp.int32, (B, Tw), 0)
        oh = None
        for c, off in enumerate(offsets):
            mc = (c_ref[c : c + 1, sl] + off == b_iota).astype(jnp.float32)
            oh = mc if oh is None else oh + mc
        return oh

    def finish(sl, pc, oh, Tw):
        """Chain tail: penalise, re-normalise, mask; accumulate pending
        stats; returns the slice's assignments. The round kernel never
        writes R at all — an R output block would be visited by both
        phases (non-consecutively), and a revisited Pallas output breaks
        the grid pipeline (measured ~25x on the whole round); the phase
        materialises R once at the end, in natural order."""
        R_n = R1[:, sl] * pc
        cs = jnp.sum(R_n, axis=0, keepdims=True)
        R_n = R_n / jnp.where(cs == 0.0, 1.0, cs)
        R_n = R_n * m_t[sl][None, :]
        pend_r_s[:] = pend_r_s[:] + jnp.sum(R_n, axis=1, keepdims=True)
        if oh is None:
            oh = oh_codes(sl, Tw)
        pend_O_s[:] = pend_O_s[:] + jax.lax.dot_general(
            R_n, oh, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return R_n

    full_sl = slice(0, T_t)

    @pl.when(p == 0)
    def _():
        # ---- recompute the block's CURRENT assignments from the carried
        # penalty tables; accumulate them as the to-remove statistics
        # (src/harmony.cpp:312-313 without reading R). The penalty gather
        # indexes (prev block, batch) jointly: a single
        # (K, nbp*B) x (nbp*B, T) product per slice — exact (one 1 per
        # covariate row, zeros elsewhere).
        for ci in range(nch):
            sl = (
                full_sl if nch == 1 else slice(ci * Tc, (ci + 1) * Tc)
            )
            Tw = T_t if nch == 1 else Tc
            jx_iota = jax.lax.broadcasted_iota(
                jnp.int32, (nbp * B, Tw), 0
            )
            mh = None
            for c, off in enumerate(offsets):
                jidx = blk_ref[0:1, sl] * B + (c_ref[c : c + 1, sl] + off)
                mc = (jidx == jx_iota).astype(jnp.float32)
                mh = mc if mh is None else mh + mc
            pc = jnp.dot(
                pen_prev_ref[:], mh, preferred_element_type=jnp.float32
            )
            finish(sl, pc, None, Tw)

    @pl.when((p == 0) & (j == nsub - 1))
    def _():
        # commit the removal and freeze this block's penalty table
        # (src/harmony.cpp:312-322)
        E_s[:] = E_s[:] - pend_r_s[:] * Pr_ref[0, :][None, :]
        O_s[:] = O_s[:] - pend_O_s[:]
        ratio = (2.0 * E_s[:] + 1.0) / (O_s[:] + E_s[:] + 1.0)
        pen_s[:] = ratio ** theta_ref[0, :][None, :]
        pen_out_ref[pl.ds(i, 1)] = pen_s[:][None]

    @pl.when(p == 1)
    def _():
        # ---- assign against the block-removed stats
        # (src/harmony.cpp:318-323) + objective accumulators. At B <= 32
        # the penalty gather is a select chain (the one-hot matmul pads B
        # to 128 MXU lanes; see pallas_rotate._assign_tile) — identical
        # bits, fewer/wider ops.
        if B <= 32:
            pen = pen_s[:]
            pc = jnp.zeros((R1.shape[0], T_t), jnp.float32)
            for c, off in enumerate(offsets):
                crow = c_ref[c : c + 1, :] + off
                width = (
                    offsets[c + 1] if c + 1 < len(offsets) else B
                ) - offsets[c]
                for b in range(offsets[c], offsets[c] + width):
                    pc = pc + pen[:, b][:, None] * (crow == b).astype(
                        jnp.float32
                    )
            R_n = finish(full_sl, pc, None, T_t)
            accv_s[0, 0] = accv_s[0, 0] + jnp.sum(R_n * d_t)
            xlogx = jnp.where(R_n > 0, R_n * jnp.log(R_n), 0.0)
            accv_s[0, 1] = accv_s[0, 1] + jnp.sum(sigma_ref[:] * xlogx)
        else:
            for ci in range(nch):
                sl = (
                    full_sl if nch == 1 else slice(ci * Tc, (ci + 1) * Tc)
                )
                Tw = T_t if nch == 1 else Tc
                oh = oh_codes(sl, Tw)
                pc = jnp.dot(
                    pen_s[:], oh, preferred_element_type=jnp.float32
                )
                R_n = finish(sl, pc, oh, Tw)
                accv_s[0, 0] = accv_s[0, 0] + jnp.sum(R_n * d_t[:, sl])
                xlogx = jnp.where(R_n > 0, R_n * jnp.log(R_n), 0.0)
                accv_s[0, 1] = accv_s[0, 1] + jnp.sum(
                    sigma_ref[:] * xlogx
                )

    @pl.when((p == 1) & (j == nsub - 1))
    def _():
        # commit the block's new contribution (src/harmony.cpp:329-330)
        E_s[:] = E_s[:] + pend_r_s[:] * Pr_ref[0, :][None, :]
        O_s[:] = O_s[:] + pend_O_s[:]
        E_out_ref[:] = E_s[:]
        O_out_ref[:] = O_s[:]
        acc_ref[0, 0] = accv_s[0, 0]
        acc_ref[0, 1] = accv_s[0, 1]


def _permute_materialize_kernel(
    Yt_ref,  # (K, d)
    Z_ref,  # (d, T) NATURAL-order tile
    c_ref,  # (ncov, T)
    blk_ref,  # (1, T) final-round block id per cell
    m_ref,  # (1, T) validity (cell < N)
    pen_ref,  # (K, nbp*B) final-round penalty tables (+ ones tail)
    sigma_ref,  # (K, 1)
    *rest,
    offsets: tuple,
    B: int,
    nbp: int,
    chunk: int,
    msub: int = 0,
):
    """R of the phase's final round, recomputed in NATURAL cell order —
    the same per-column chain as the round kernel (bit-identical per
    cell), so no (K, N) scatter pass ever runs. With ``msub`` the kernel
    also fuses the M-step's joint-batch moment accumulation against
    Z_orig (the rotate phase's last-round fusion,
    pallas_rotate._round_kernel_v2) — the R it just wrote IS the R the
    correction consumes, so the separate O(K·N·d) moments pass never
    runs on the permute path either."""
    it = iter(rest)
    Zo_ref = next(it) if msub else None  # (d, T) Z_orig tile
    tj_ref = next(it) if msub else None  # (1, NT*msub) SMEM joint ids
    R_ref = next(it)  # (K, T) out
    M_out_ref = next(it) if msub else None  # (nj+1, K, d+1) out

    s = pl.program_id(0)
    if msub:

        @pl.when(s == 0)
        def _():
            M_out_ref[...] = jnp.zeros_like(M_out_ref)

    Z_t = Z_ref[:]
    T_t = Z_t.shape[1]
    g = jnp.dot(Yt_ref[:], Z_t, preferred_element_type=jnp.float32)
    e = jnp.exp(-(2.0 * (1.0 - g)) / sigma_ref[:])
    R1 = e / jnp.sum(e, axis=0, keepdims=True)
    m_t = m_ref[0, :]
    nch = max(1, T_t // chunk)
    Tc = T_t // nch
    for ci in range(nch):
        sl = slice(0, T_t) if nch == 1 else slice(ci * Tc, (ci + 1) * Tc)
        Tw = T_t if nch == 1 else Tc
        jx_iota = jax.lax.broadcasted_iota(jnp.int32, (nbp * B, Tw), 0)
        mh = None
        for c, off in enumerate(offsets):
            jidx = blk_ref[0:1, sl] * B + (c_ref[c : c + 1, sl] + off)
            mc = (jidx == jx_iota).astype(jnp.float32)
            mh = mc if mh is None else mh + mc
        pc = jnp.dot(pen_ref[:], mh, preferred_element_type=jnp.float32)
        R_n = R1[:, sl] * pc
        cs = jnp.sum(R_n, axis=0, keepdims=True)
        R_n = R_n / jnp.where(cs == 0.0, 1.0, cs)
        R_ref[:, sl] = R_n * m_t[sl][None, :]

    if msub:
        # moment fusion: pad cells carry R == 0 (masked above) and pad
        # tiles map to the dropped sentinel row n_joint
        Rt = R_ref[:]  # the (K, T) tile just written, VMEM-resident
        Zo = Zo_ref[:]
        Tl = T_t // msub
        for j in range(msub):
            sl = slice(j * Tl, (j + 1) * Tl)
            R_sl = Rt[:, sl]
            S = jax.lax.dot_general(
                R_sl, Zo[:, sl],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (K, d)
            S = jnp.concatenate(
                [S, jnp.sum(R_sl, axis=1, keepdims=True)], axis=1
            )
            jid = tj_ref[0, s * msub + j]
            M_out_ref[pl.ds(jid, 1)] = M_out_ref[pl.ds(jid, 1)] + S[None]


def pallas_permute_phase(
    cfg: HarmonyConfig,
    Z: jnp.ndarray,  # (d, Np) L2-normalised
    Y: jnp.ndarray,  # (d, K)
    E: jnp.ndarray,  # (K, B)
    O: jnp.ndarray,
    codes: jnp.ndarray,  # (ncov, Np)
    Pr_b: jnp.ndarray,
    sigma: jnp.ndarray,
    theta: jnp.ndarray,
    perms: jnp.ndarray,  # (rounds, N)
    sub_tile: int = 4096,
    interpret: bool = False,
    moments=None,  # pallas_rotate.MomentsSpec | None: fuse M-step moments
    sorted_blocks: bool = False,
    prefetch_layouts: "bool | None" = None,  # None = memory-gated auto
) -> PermutePhaseResult:
    """All of a clustering phase's update rounds, R-gather-free.

    ``sorted_blocks=True`` gathers each block's cells in ascending
    physical order (``make_blocks_sorted``): identical block membership
    and commit points, HBM-friendly layout gathers — the fix for the
    ≥2M-cell random-gather cliff. Exact-trajectory runs (injected perms)
    must pass ``False`` (within-block fp summation order regroups).

    Pre-condition: (E, O) are consistent with the CURRENT implied
    assignments softmax(-dist/sigma) — i.e. the state right after
    init_cluster or the cluster re-entry re-estimation
    (src/harmony.cpp:214-228). The first round's "old" statistics are
    recomputed with an all-ones penalty (what the re-entry wrote);
    later rounds recompute with the carried tables.
    """
    offsets = cfg.covariate_offsets
    K, Np = int(sigma.shape[0]), int(Z.shape[1])
    nb = cfg.n_blocks
    nbp = nb + 1  # + the ones row (pre-first-round assignments)
    d = Z.shape[0]
    B = cfg.B
    f32 = jnp.float32
    rounds = int(perms.shape[0])

    # chunk only when the (nbp*B, T) joint multi-hot temporary would
    # blow the kernel stack (~<= 4.5 MB keeps B <= ~25 at T=4096 full
    # width; large-B permute runs chunk)
    chunk = sub_tile
    while chunk > 256 and nbp * B * chunk * 4 > 4608 * 2**10:
        chunk //= 2

    Zf = Z.astype(f32)
    Yt = Y.T.astype(f32)
    pen_prev = jnp.ones((K, nbp * B), f32)
    blk_nat = jnp.full((Np,), nb, jnp.int32)  # sentinel: ones row
    E_c, O_c = E.astype(f32), O.astype(f32)

    pad1 = lambda X: jnp.concatenate(
        [X, jnp.zeros((*X.shape[:-1], 1), X.dtype)], axis=-1
    )

    # All rounds share one static shape set (S = cfg.max_block_size), so
    # the round loop is a lax.scan over the per-round permutations. The
    # scan structure matters for performance, not just compile time: with
    # the rounds unrolled into one flat computation, XLA's scheduler
    # interleaves the rounds' independent layout gathers and the
    # per-round prep measured ~5x slower than the identical expressions
    # inside a loop body (tools/exp_permute_engine.py vs
    # exp_round_fresh.py on v5e).
    S = cfg.max_block_size
    nsub = max(1, -(-S // sub_tile))
    S_pad = nsub * sub_tile
    L = nb * S_pad
    T = sub_tile
    grid = (nb, 2, nsub)

    def lin(i, p, j):
        return i * nsub + j

    out_specs = [
        pl.BlockSpec((K, B), lambda i, p, j: (0, 0)),  # E_out
        pl.BlockSpec((K, B), lambda i, p, j: (0, 0)),  # O_out
        pl.BlockSpec(  # pen_out: unblocked, stays VMEM-resident
            (nb, K, B), lambda i, p, j: (0, 0, 0)
        ),
        pl.BlockSpec(
            (1, 2), lambda i, p, j: (0, 0), memory_space=pltpu.SMEM
        ),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((K, B), f32),
        jax.ShapeDtypeStruct((K, B), f32),
        jax.ShapeDtypeStruct((nb, K, B), f32),
        jax.ShapeDtypeStruct((1, 2), f32),
    ]

    from functools import partial

    kernel = pl.pallas_call(
        partial(
            _permute_round_kernel,
            offsets=offsets, B=B, nbp=nbp,
            chunk=chunk,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((K, d), lambda i, p, j: (0, 0)),  # Yt
            pl.BlockSpec(
                (d, T), lambda i, p, j: (0, lin(i, p, j))
            ),  # Z
            pl.BlockSpec(
                (codes.shape[0], T), lambda i, p, j: (0, lin(i, p, j))
            ),  # codes
            pl.BlockSpec(
                (1, T), lambda i, p, j: (0, lin(i, p, j))
            ),  # blk
            pl.BlockSpec(
                (1, T), lambda i, p, j: (0, lin(i, p, j))
            ),  # mask
            pl.BlockSpec((K, nbp * B), lambda i, p, j: (0, 0)),
            pl.BlockSpec((K, B), lambda i, p, j: (0, 0)),  # E_in
            pl.BlockSpec((K, B), lambda i, p, j: (0, 0)),  # O_in
            pl.BlockSpec((1, B), lambda i, p, j: (0, 0)),  # Pr
            pl.BlockSpec((K, 1), lambda i, p, j: (0, 0)),  # sigma
            pl.BlockSpec((1, B), lambda i, p, j: (0, 0)),  # theta
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((K, B), f32),  # E_s
            pltpu.VMEM((K, B), f32),  # O_s
            pltpu.VMEM((K, B), f32),  # pen_s
            pltpu.VMEM((K, 1), f32),  # pend_r
            pltpu.VMEM((K, B), f32),  # pend_O
            pltpu.SMEM((1, 2), f32),  # accv
        ],
        interpret=interpret,
    )

    Zp = pad1(Zf)
    cp = pad1(codes)
    Prr = Pr_b.astype(f32)[None, :]
    sig = sigma.astype(f32)[:, None]
    th = theta.astype(f32)[None, :]
    slot_blk = jnp.arange(L, dtype=jnp.int32) // jnp.int32(S_pad)

    # ONE combined gather per round. Gathering Z, the codes and the
    # previous-round block ids separately costs ~15 ms EACH at 500k on
    # v5e — the per-gather overhead dominates, not the bytes (the 1-row
    # block-id gather costs the same as the 51-row Z gather) — while one
    # (d+ncov+1, L) gather from a stacked table costs ~6 ms total
    # (tools/exp_phase_ablate.py). Codes and block ids ride as f32 rows
    # (exact: both are small ints) and cast back for the kernel.
    ncov = codes.shape[0]
    tbl_zc = jnp.concatenate([Zp, cp.astype(f32)], axis=0)

    from .assign import make_blocks_sorted

    block_maker = make_blocks_sorted if sorted_blocks else make_blocks

    # Layout prefetch (round 5): every round's block layout is a pure
    # function of the upfront-drawn permutations — only the tiny penalty
    # tables carry data between rounds — so ALL rounds' layouts gather in
    # ONE pass from a table whose extra rows hold each round's
    # precomputed block ids (row d+ncov+r = block ids after round r-1;
    # row d+ncov is the all-sentinel pre-phase row). The per-gather fixed
    # overhead (measured ~15 ms per separate gather at 500k, r4) is then
    # paid once per PHASE instead of once per round, and the per-round
    # block-id scatters hoist out of the scan. Memory: the gathered
    # (d+ncov+rounds, rounds*L) layout block; gate at ~2.5 GB (10M-scale
    # permute runs keep the per-round path).
    # Measured on v5e (round 5): NEUTRAL — 500k 74.3 -> 75.5 ms/iter, 2M
    # 641 -> 645 ms. The gather's cost is per-index (table-size-rated),
    # not per-gather-call, so merging four N-index gathers into one
    # 4N-index gather buys nothing and the hoisted scatters are offset
    # by the per-round layout slices. Kept as an explicit knob (and as
    # the recorded refutation of the fixed-overhead hypothesis); default
    # stays the per-round path.
    rowsN = d + ncov + rounds
    prefetch = False
    if prefetch_layouts is not None:
        prefetch = prefetch_layouts and rounds >= 1

    if prefetch:
        idxs = []
        mf = None
        blk_rows = [jnp.full((Np + 1,), float(nb), f32)]  # round 0
        for r in range(rounds):
            idx, mask = block_maker(cfg, perms[r])  # (nb, S)
            if S_pad != S:
                padw = ((0, 0), (0, S_pad - S))
                idx = jnp.pad(idx, padw, constant_values=Np)
                mask = jnp.pad(mask, padw, constant_values=False)
            if mf is None:  # block sizes are static: mask is round-free
                mf = mask.astype(f32).reshape(1, L)
            idxs.append(idx.reshape(-1))
            blk_rows.append(
                jnp.zeros((Np + 1,), jnp.int32)
                .at[idxs[-1]]
                .set(slot_blk)
                .astype(f32)
            )
        blk_nat = blk_rows[-1][:Np].astype(jnp.int32)  # materialise ctx
        tbl_big = jnp.concatenate(
            [tbl_zc, jnp.stack(blk_rows[:rounds])], axis=0
        )  # (rowsN, Np+1)
        lay_all = tbl_big[:, jnp.concatenate(idxs)]  # ONE gather

        def round_body_pre(carry, r):
            pen_prev, E_c, O_c = carry
            lay = jax.lax.dynamic_slice(
                lay_all, (0, r * L), (d + ncov, L)
            )
            blk_lay = jax.lax.dynamic_slice(
                lay_all, (d + ncov + r, r * L), (1, L)
            ).astype(jnp.int32)
            Z_lay = lay[:d]
            c_lay = lay[d:].astype(jnp.int32)
            E_n, O_n, pen_out, acc = kernel(
                Yt, Z_lay, c_lay, blk_lay, mf, pen_prev, E_c, O_c,
                Prr, sig, th,
            )
            pen_next = jnp.concatenate(
                [
                    jnp.transpose(pen_out, (1, 0, 2)).reshape(K, nb * B),
                    jnp.ones((K, B), f32),
                ],
                axis=1,
            )
            return (
                (pen_next, E_n, O_n),
                (E_n, O_n, acc[0, 0], acc[0, 1]),
            )

        (pen_prev, E_c, O_c), (E_st, O_st, kerr_st, ent_st) = (
            jax.lax.scan(
                round_body_pre,
                (pen_prev, E_c, O_c),
                jnp.arange(rounds),
            )
        )
    else:

        def round_body(carry, perm_r):
            pen_prev, blk_nat, E_c, O_c = carry
            idx, mask = block_maker(cfg, perm_r)  # (nb, S)
            if S_pad != S:
                padw = ((0, 0), (0, S_pad - S))
                idx = jnp.pad(idx, padw, constant_values=Np)
                mask = jnp.pad(mask, padw, constant_values=False)
            flat_idx = idx.reshape(-1)
            mf = mask.astype(f32).reshape(1, L)

            blk_row = jnp.concatenate(
                [blk_nat, jnp.full((1,), nb, jnp.int32)]
            ).astype(f32)[None, :]
            lay = jnp.concatenate([tbl_zc, blk_row], axis=0)[:, flat_idx]
            Z_lay = lay[:d]
            c_lay = lay[d : d + ncov].astype(jnp.int32)
            blk_lay = lay[d + ncov :].astype(jnp.int32)

            E_n, O_n, pen_out, acc = kernel(
                Yt, Z_lay, c_lay, blk_lay, mf, pen_prev, E_c, O_c,
                Prr, sig, th,
            )
            # next round's carried context
            pen_next = jnp.concatenate(
                [
                    jnp.transpose(pen_out, (1, 0, 2)).reshape(K, nb * B),
                    jnp.ones((K, B), f32),
                ],
                axis=1,
            )
            blk_next = (
                jnp.zeros((Np + 1,), jnp.int32).at[flat_idx].set(slot_blk)
            )[:Np]
            return (
                (pen_next, blk_next, E_n, O_n),
                (E_n, O_n, acc[0, 0], acc[0, 1]),
            )

        (pen_prev, blk_nat, E_c, O_c), (E_st, O_st, kerr_st, ent_st) = (
            jax.lax.scan(
                round_body, (pen_prev, blk_nat, E_c, O_c), perms
            )
        )

    # materialise the final round's R once, in NATURAL order — no layout
    # write, no scatter (both measured pathological: a revisited Pallas
    # output block serialises the whole grid)
    from functools import partial

    T = sub_tile
    Npt = -(-Np // T) * T
    NT = Npt // T
    padT = lambda X: (
        X if X.shape[-1] == Npt else jnp.concatenate(
            [X, jnp.zeros((*X.shape[:-1], Npt - X.shape[-1]), X.dtype)],
            axis=-1,
        )
    )
    valid_nat = (jnp.arange(Npt) < cfg.N).astype(f32)[None, :]
    msub = 0
    in_specs = [
        pl.BlockSpec((K, d), lambda s_: (0, 0)),
        pl.BlockSpec((d, T), lambda s_: (0, s_)),
        pl.BlockSpec((codes.shape[0], T), lambda s_: (0, s_)),
        pl.BlockSpec((1, T), lambda s_: (0, s_)),
        pl.BlockSpec((1, T), lambda s_: (0, s_)),
        pl.BlockSpec((K, nbp * B), lambda s_: (0, 0)),
        pl.BlockSpec((K, 1), lambda s_: (0, 0)),
    ]
    out_specs = [pl.BlockSpec((K, T), lambda s_: (0, s_))]
    out_shape = [jax.ShapeDtypeStruct((K, Npt), f32)]
    extra_in = ()
    if moments is not None:
        msub = T // moments.tile
        nj = moments.n_joint
        NTm = NT * msub
        tj = jnp.full((1, NTm), nj, jnp.int32)
        tj = tj.at[0, : moments.tile_joint.shape[0]].set(
            moments.tile_joint.astype(jnp.int32)
        )
        in_specs += [
            pl.BlockSpec((d, T), lambda s_: (0, s_)),  # Z_orig tile
            pl.BlockSpec(
                (1, NTm), lambda s_: (0, 0), memory_space=pltpu.SMEM
            ),  # tile -> joint id
        ]
        out_specs.append(
            pl.BlockSpec((nj + 1, K, d + 1), lambda s_: (0, 0, 0))
        )
        out_shape.append(jax.ShapeDtypeStruct((nj + 1, K, d + 1), f32))
        extra_in = (padT(moments.Z_orig_pad.astype(f32)), tj)
    mat = pl.pallas_call(
        partial(
            _permute_materialize_kernel,
            offsets=offsets, B=B, nbp=nbp, chunk=chunk, msub=msub,
        ),
        grid=(NT,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )
    outs = mat(
        Yt, padT(Zf), padT(codes), padT(blk_nat[None, :]),
        padT(valid_nat), pen_prev, sigma.astype(f32)[:, None],
        *extra_in,
    )
    if moments is not None:
        R_nat, M = outs
    else:
        (R_nat,) = (outs if isinstance(outs, (list, tuple)) else (outs,))
        M = None
    R_nat = R_nat[:, :Np]
    return PermutePhaseResult(
        R=R_nat,
        E=E_c,
        O=O_c,
        E_rounds=E_st,
        O_rounds=O_st,
        kmeans_error=kerr_st,
        entropy=ent_st,
        M=M,
    )
