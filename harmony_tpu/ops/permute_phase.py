"""Sharded fused permute phase: reference-exact schedule, R-gather-free,
on a cell-sharded device mesh.

Same algorithm as the single-device Pallas phase
(:func:`harmony_tpu.ops.pallas_estep.pallas_permute_phase`): during a
clustering phase Y and Z_corr are fixed (src/harmony.cpp:236-238, 610),
so every cell's current assignment is a pure function of (Y, Z_cell, the
penalty table in force when its block was last committed). Carrying the
tiny per-block penalty tables (nb x K x B) plus each cell's last block id
across rounds lets each round RECOMPUTE the previous round's assignments
instead of gathering/scattering the (K, N) R every round; only the
phase's end materialises R once, in natural order.

This variant is written as a plain XLA program so jit's SPMD partitioner
shards it over a 1-D cells mesh (SURVEY.md §2.3): blocks are GLOBAL —
``make_blocks`` partitions the same global permutation the XLA per-round
path uses, so trajectories are shard-count invariant — each shard holds
an equal slice of every block's slots, and the only cross-shard
communication is the per-block commit reductions (one K x B + K psum per
remove and per add, ~4 KB at K=100, B=10 — the exact communication set of
src/harmony.cpp:272-273, 312-330) plus the round's layout gather. The
penalty tables and E/O ride replicated.

Communication per round: 1 gather of the stacked (d+ncov+1, N) table
into block layout (the reference's physical re-permute — unavoidable,
src/harmony.cpp:272-273; it is an all-to-all over the mesh), 2*nb K x B
psums, and nothing else — in particular no K x N R gather, which is what
the sharded XLA per-round path pays three times per round.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from ..config import HarmonyConfig
from .assign import make_blocks
from .pallas_estep import PermutePhaseResult


def _cshard(x, mesh, spec):
    if mesh is None:
        return x
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(mesh, spec)
    )


def xla_permute_phase(
    cfg: HarmonyConfig,
    Z: jnp.ndarray,  # (d, Np) L2-normalised, cells-sharded
    Y: jnp.ndarray,  # (d, K) replicated
    E: jnp.ndarray,  # (K, B) replicated
    O: jnp.ndarray,
    codes: jnp.ndarray,  # (ncov, Np) cells-sharded
    Pr_b: jnp.ndarray,
    sigma: jnp.ndarray,
    theta: jnp.ndarray,
    perms: jnp.ndarray,  # (rounds, N) global permutations
    mesh=None,
) -> PermutePhaseResult:
    """All of a clustering phase's update rounds, R-gather-free, sharded.

    Pre-condition (same as the Pallas phase): (E, O) are consistent with
    the current implied assignments softmax(-dist/sigma) — the state
    right after init_cluster or the cluster re-entry re-estimation
    (src/harmony.cpp:214-228). The first round's removal recomputes with
    an all-ones penalty (the sentinel ``nb`` row); later rounds with the
    carried tables.
    """
    from ..sharding import CELL_AXIS

    offsets = cfg.covariate_offsets
    K = int(sigma.shape[0])
    Np = int(Z.shape[1])
    nb = cfg.n_blocks
    nbp = nb + 1  # + the all-ones sentinel row
    d = int(Z.shape[0])
    B = cfg.B
    ncov = codes.shape[0]
    f32 = jnp.float32
    cell3 = P(None, None, CELL_AXIS)

    ns = 1 if mesh is None else mesh.size
    S = cfg.max_block_size
    # each shard holds an equal, contiguous slice of every block's slots
    S_pad = -(-S // ns) * ns
    L = nb * S_pad

    Zf = Z.astype(f32)
    Yt = Y.T.astype(f32)
    sig = sigma.astype(f32)[:, None, None]
    Prr = Pr_b.astype(f32)[None, :]
    th = theta.astype(f32)[None, :]
    b_ids = jnp.arange(B, dtype=jnp.int32)

    pad1 = lambda X: jnp.concatenate(
        [X, jnp.zeros((*X.shape[:-1], 1), X.dtype)], axis=-1
    )
    # one stacked-table gather per round (codes/block ids ride as exact
    # small-int f32 rows; see pallas_estep for the measured rationale)
    tbl = jnp.concatenate([pad1(Zf), pad1(codes).astype(f32)], axis=0)

    pen_prev0 = jnp.ones((K, nbp * B), f32)
    blk_nat0 = jnp.full((Np,), nb, jnp.int32)  # sentinel: ones row
    slot_blk = jnp.arange(L, dtype=jnp.int32) // jnp.int32(S_pad)

    def pc_from_tables(pen_tbl, blk, cds):
        """Per-cell penalty from (K, nbp*B) tables by joint (block, batch)
        index — one small-table gather per covariate (the tables are
        replicated, so the gathers are shard-local)."""
        pc = None
        for c, off in enumerate(offsets):
            jidx = blk * B + (cds[c] + off)
            t = jnp.take(pen_tbl, jidx, axis=1)
            pc = t if pc is None else pc + t
        return pc

    def round_body(carry, perm_r):
        pen_prev, blk_nat, E_c, O_c = carry
        idx, mask = make_blocks(cfg, perm_r)  # (nb, S)
        if S_pad != S:
            padw = ((0, 0), (0, S_pad - S))
            idx = jnp.pad(idx, padw, constant_values=Np)
            mask = jnp.pad(mask, padw, constant_values=False)
        flat_idx = idx.reshape(-1)  # (L,)

        blk_row = jnp.concatenate(
            [blk_nat, jnp.full((1,), nb, jnp.int32)]
        ).astype(f32)[None, :]
        lay = jnp.concatenate([tbl, blk_row], axis=0)[:, flat_idx]
        lay = _cshard(lay.reshape(-1, nb, S_pad), mesh, cell3)
        Z_lay = lay[:d]  # (d, nb, S_pad)
        c_lay = lay[d : d + ncov].astype(jnp.int32)
        blk_lay = lay[d + ncov].astype(jnp.int32)  # (nb, S_pad)

        # assignment head for every slot: per-column deterministic, so
        # the removal recompute reproduces last round's values
        g = jnp.einsum(
            "kd,dbs->kbs", Yt, Z_lay, preferred_element_type=f32
        )
        d_t = 2.0 * (1.0 - g)
        R1 = jnp.exp(-d_t / sig)
        R1 = R1 / jnp.sum(R1, axis=0, keepdims=True)

        # ---- removal: recompute the blocks' CURRENT assignments from
        # the carried tables (src/harmony.cpp:312-313 without reading R)
        pc_prev = pc_from_tables(pen_prev, blk_lay, c_lay)
        R_prev = R1 * pc_prev
        cs = jnp.sum(R_prev, axis=0, keepdims=True)
        R_prev = R_prev / jnp.where(cs == 0.0, 1.0, cs)

        oh = jnp.zeros((nb, S_pad, B), f32)
        for c, off in enumerate(offsets):
            oh = oh + (
                (c_lay[c][..., None] + off == b_ids) & mask[..., None]
            ).astype(f32)
        oh = _cshard(oh, mesh, P(None, CELL_AXIS, None))
        # masked slots have zero one-hot rows -> zero penalty -> R == 0,
        # but R_prev above normalises before the penalty; mask explicitly
        R_prev = R_prev * mask.astype(f32)[None]
        rm_r = jnp.einsum("kbs->bk", R_prev)  # (nb, K)
        rm_O = jnp.einsum(
            "kbs,bsc->bkc", R_prev, oh, preferred_element_type=f32
        )  # (nb, K, B)

        # ---- sequential block commits (src/harmony.cpp:309-331):
        # per-shard partial sums; the K x B reductions are the psums
        def blk_body(carry2, xs):
            E_b, O_b, acc_d, acc_e = carry2
            R1_b, d_b, oh_b, rm_r_i, rm_O_i = xs
            E_b = E_b - rm_r_i[:, None] * Prr
            O_b = O_b - rm_O_i
            pen = ((2.0 * E_b + 1.0) / (O_b + E_b + 1.0)) ** th  # (K, B)
            pc = jnp.dot(pen, oh_b.T, preferred_element_type=f32)
            R_n = R1_b * pc
            cs_n = jnp.sum(R_n, axis=0, keepdims=True)
            R_n = R_n / jnp.where(cs_n == 0.0, 1.0, cs_n)
            rs = jnp.sum(R_n, axis=1)
            E_b = E_b + rs[:, None] * Prr
            O_b = O_b + jnp.dot(R_n, oh_b, preferred_element_type=f32)
            acc_d = acc_d + jnp.sum(R_n * d_b)
            acc_e = acc_e + jnp.sum(
                sigma.astype(f32)[:, None]
                * jnp.where(R_n > 0, R_n * jnp.log(R_n), 0.0)
            )
            return (E_b, O_b, acc_d, acc_e), pen

        xs = (
            jnp.moveaxis(R1, 0, 1),  # (nb, K, S_pad)
            jnp.moveaxis(d_t, 0, 1),
            oh,
            rm_r,
            rm_O,
        )
        (E_n, O_n, acc_d, acc_e), pen_st = jax.lax.scan(
            blk_body,
            (E_c, O_c, jnp.zeros((), f32), jnp.zeros((), f32)),
            xs,
        )

        pen_next = jnp.concatenate(
            [
                jnp.moveaxis(pen_st, 0, 1).reshape(K, nb * B),
                jnp.ones((K, B), f32),
            ],
            axis=1,
        )
        blk_next = (
            jnp.zeros((Np + 1,), jnp.int32).at[flat_idx].set(slot_blk)
        )[:Np]
        blk_next = _cshard(blk_next, mesh, P(CELL_AXIS))
        return (
            (pen_next, blk_next, E_n, O_n),
            (E_n, O_n, acc_d, acc_e),
        )

    (pen_prev, blk_nat, E_c, O_c), (E_st, O_st, kerr_st, ent_st) = (
        jax.lax.scan(
            round_body,
            (pen_prev0, blk_nat0, E.astype(f32), O.astype(f32)),
            perms,
        )
    )

    # materialise the final round's R once, in NATURAL order (shards
    # recompute their own cells locally: tables are replicated)
    g = jnp.dot(Yt, Zf, preferred_element_type=f32)  # (K, Np)
    R1 = jnp.exp(-(2.0 * (1.0 - g)) / sigma.astype(f32)[:, None])
    R1 = R1 / jnp.sum(R1, axis=0, keepdims=True)
    pc = pc_from_tables(pen_prev, blk_nat, codes)
    R_nat = R1 * pc
    cs = jnp.sum(R_nat, axis=0, keepdims=True)
    R_nat = R_nat / jnp.where(cs == 0.0, 1.0, cs)
    if cfg.Np != cfg.N:
        R_nat = R_nat * (jnp.arange(Np) < cfg.N)[None, :].astype(f32)
    R_nat = _cshard(R_nat, mesh, P(None, CELL_AXIS))

    return PermutePhaseResult(
        R=R_nat,
        E=E_c,
        O=O_c,
        E_rounds=E_st,
        O_rounds=O_st,
        kmeans_error=kerr_st,
        entropy=ent_st,
        M=None,
    )
