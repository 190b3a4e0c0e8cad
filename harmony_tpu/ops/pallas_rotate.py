"""Pallas TPU kernel for the roll-free rotate-schedule E-step round.

The XLA rotate round (ops/estep.py) round-trips every intermediate —
distances, pre-normalised assignments, penalty products — through HBM, and
any batched formulation of the old-block statistics forces a physical
transpose of the (K, N) assignment matrix. This kernel runs the whole
sequential round as ONE Pallas program with a two-phase step sequence per
block (TPU grids execute sequentially, so the running E/O diversity
statistics live in VMEM scratch across every step):

  phase 0 (stats):  stream the block's old R tiles once, accumulating the
                    block's old row-sums and O contribution in VMEM;
  phase 1 (assign): commit the removal (src/harmony.cpp:312-313), compute
                    the block-constant penalty, then recompute each tile's
                    assignments entirely in VMEM and write it exactly once.

Per round the HBM traffic is exactly one read of R, Z and the one-hot
design and one write of R — the streaming lower bound for the sequential
block semantics.

Schedule (the tile-aligned variant of the rotate schedule): cells were
shuffled once at ingest; virtual tile v in [0, NT) holds physical tile
(v + rt) mod NT for a per-round random tile rotation rt, and the nb blocks
are contiguous runs of virtual tiles processed in a per-round random block
order. Identical in distribution to the cell-granular rotate schedule up
to tile quantisation of the rotation offset; like that schedule it is
statistically equivalent to — not bit-comparable with — the reference's
fresh full permutation (src/harmony.cpp:272-273). Per-block semantics are
the reference's exactly: all cells of a block see the E/O state with the
whole block removed, so the penalty matrix ((2E+1)/(O+E+1))^theta is
block-constant (src/harmony.cpp:318-323).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import HarmonyConfig
from .estep import RoundResult

# rows of the per-step scalar table
_TILE = 0  # logical tile this step computes on (Z/oh fetch; R write in phase 1)
_RIDX = 1  # R_in fetch index (old tiles in phase 0; pinned in phase 1)
_WIDX = 2  # R_out buffer index (pinned to the first assign tile in phase 0)
_BLK = 3  # processed block
_PHASE = 4  # 0 = stats, 1 = assign
_FIRST = 5  # first step of the block's phase
_LAST = 6  # last assign step of the block
_ROWS = 7


class TileLayout(NamedTuple):
    """Phase constants for the tile-rotate kernel (Z and the design are
    fixed across a cluster phase's rounds)."""

    Z_pad: jnp.ndarray  # (d, NT*T) zero-padded
    oh_pad: jnp.ndarray  # (NT*T, B) one-hot design; pad/invalid rows zero


class CodesLayout(NamedTuple):
    """Phase constants for the v2 kernels: the design rides as int32
    codes and each tile's one-hot block is rebuilt in VMEM by an
    iota-compare — the (N, B) one-hot never exists in HBM (it is 4 GB at
    10M cells x 100 batches; codes are ncov x N x 4 bytes)."""

    Z_pad: jnp.ndarray  # (d, NT*T) zero-padded
    codes_pad: jnp.ndarray  # (ncov, NT*T) int32; pads get a <-B sentinel


def make_codes_pad(cfg: HarmonyConfig, codes: jnp.ndarray) -> jnp.ndarray:
    """(ncov, Npt) int32 codes with pad/invalid cells set to a sentinel
    below -B, so no level matches even after the per-covariate offset is
    added (their one-hot columns come out all-zero)."""
    T = cfg.estep_sub_tile
    Np = cfg.Np
    Npt = -(-Np // T) * T
    sentinel = -cfg.B - 1
    valid = (jnp.arange(Np) < cfg.N)[None, :]
    cp = jnp.where(valid, codes.astype(jnp.int32), sentinel)
    if Npt != Np:
        cp = jnp.concatenate(
            [
                cp,
                jnp.full((cp.shape[0], Npt - Np), sentinel, jnp.int32),
            ],
            axis=1,
        )
    return cp


def make_codes_layout(
    cfg: HarmonyConfig, Z: jnp.ndarray, codes: jnp.ndarray
) -> CodesLayout:
    return CodesLayout(
        Z_pad=pad_cells_to_tile(cfg, Z).astype(jnp.float32),
        codes_pad=make_codes_pad(cfg, codes),
    )


def _covw(offsets, c: int, B: int) -> int:
    """Level count of covariate c from the stacked offsets."""
    return (offsets[c + 1] if c + 1 < len(offsets) else B) - offsets[c]


def _build_ohT(codes_ref, offsets, B: int, T: int):
    """(B, T) one-hot-transpose block from this tile's int32 codes;
    sentinel codes (pads, < -B) produce all-zero columns even after the
    covariate offset. Pure VPU iota-compares."""
    b_iota = jax.lax.broadcasted_iota(jnp.int32, (B, T), 0)
    ohT = None
    for c, off in enumerate(offsets):
        m = (codes_ref[c : c + 1, :] + off == b_iota).astype(jnp.float32)
        ohT = m if ohT is None else ohT + m
    return ohT


_PC_CHUNK = 1024  # column chunk for large-B temporaries (VMEM stack budget)


def _run_mapT(runb_ref, ncov: int, rsub: int, B: int):
    """(B, rsub) multi-hot run map + joint-purity flag.

    ``runb_ref`` is a RunsSpec slab: sublane c holds the GLOBAL batch row
    of covariate c for each of the grid tile's ``rsub`` runs (sentinel -1
    on mixed/pad runs). The multi-hot column of a run selects all of its
    ncov batch rows at once, so one (K, B) x (B, rsub) product yields both
    the additive multi-covariate penalty gather (the reference's
    pen * Phi product sums per-covariate penalties, src/harmony.cpp:322)
    and the run-sum tile-stat scatter."""
    rb = runb_ref[0, 0:ncov, 0:rsub]  # (ncov, rsub)
    pure = jnp.min(rb) >= 0
    iota = jax.lax.broadcasted_iota(jnp.int32, (B, rsub), 0)
    m = None
    for c in range(ncov):
        mc = (rb[c : c + 1, :] == iota).astype(jnp.float32)
        m = mc if m is None else m + mc
    return m, pure


def _pc_chunks(pen, codes_ref, offsets, B: int, T: int):
    """Yield (slice, pc_chunk) covering the tile: pc = pen x one-hot,
    built ``_PC_CHUNK`` columns at a time so the (B, T) one-hot and (K, T)
    product temporaries never materialise whole — at B=K=100, T=4096 the
    full-width form alone holds 3.2 MB of kernel stack, which is what
    pushes the round kernel past the 16 MB scoped-VMEM limit and forces
    the tile shrink to T=2048 (the large-B throughput penalty). Each
    column's value is the same B-contraction as the full-width dot, so
    chunking is bit-transparent."""
    nch = max(1, T // _PC_CHUNK)
    Tc = T // nch
    for i in range(nch):
        sl = slice(i * Tc, (i + 1) * Tc)
        oh_c = _build_ohT(codes_ref[:, sl], offsets, B, Tc)
        yield sl, jnp.dot(pen, oh_c, preferred_element_type=jnp.float32)


def _tO_chunked(R_n, codes_ref, offsets, B: int, T: int):
    """(K, B) one-hot contraction of this tile's assignments, accumulated
    ``_PC_CHUNK`` columns at a time (same VMEM-stack motivation as
    :func:`_pc_chunks`; addition order over cells changes — tile stats are
    f32 partial sums whose order is already tile-shape-dependent)."""
    nch = max(1, T // _PC_CHUNK)
    Tc = T // nch
    tO = None
    for i in range(nch):
        sl = slice(i * Tc, (i + 1) * Tc)
        oh_c = _build_ohT(codes_ref[:, sl], offsets, B, Tc)
        part = jax.lax.dot_general(
            R_n[:, sl], oh_c, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        tO = part if tO is None else tO + part
    return tO


def make_oh_pad(cfg: HarmonyConfig, codes: jnp.ndarray) -> jnp.ndarray:
    """(Npt, B) one-hot design, pad/invalid rows zero (tile-aligned)."""
    T = cfg.estep_sub_tile
    Np = cfg.Np
    Npt = -(-Np // T) * T
    f32 = jnp.float32
    valid = jnp.arange(Np) < cfg.N
    b_ids = jnp.arange(cfg.B, dtype=jnp.int32)
    oh = jnp.zeros((Np, cfg.B), dtype=f32)
    for c, off in enumerate(cfg.covariate_offsets):
        oh = oh + (
            (codes[c][:, None] + off == b_ids) & valid[:, None]
        ).astype(f32)
    if Npt != Np:
        oh = jnp.concatenate(
            [oh, jnp.zeros((Npt - Np, cfg.B), f32)], axis=0
        )
    return oh


def pad_cells_to_tile(cfg: HarmonyConfig, Z: jnp.ndarray) -> jnp.ndarray:
    """Zero-pad the cell axis to the tile-aligned width (no-op when the
    production config already aligned ``N_pad``)."""
    T = cfg.estep_sub_tile
    Np = cfg.Np
    Npt = -(-Np // T) * T
    if Npt != Np:
        Z = jnp.concatenate(
            [Z, jnp.zeros((Z.shape[0], Npt - Np), Z.dtype)], axis=1
        )
    return Z


def make_tile_layout(
    cfg: HarmonyConfig, Z: jnp.ndarray, codes: jnp.ndarray
) -> TileLayout:
    return TileLayout(
        Z_pad=pad_cells_to_tile(cfg, Z).astype(jnp.float32),
        oh_pad=make_oh_pad(cfg, codes),
    )


def _round_kernel(
    scal_ref,  # (_ROWS, 2*NT) int32 step table
    # inputs
    Yt_ref,  # (K, d)
    Z_ref,  # (d, T) tile at scal[_TILE, s]
    oh_ref,  # (T, B) tile at scal[_TILE, s]
    R_in_ref,  # (K, T) tile at scal[_RIDX, s]
    E_in_ref,  # (K, B)
    O_in_ref,  # (K, B)
    Pr_ref,  # (1, B)
    sigma_ref,  # (K, 1)
    theta_ref,  # (1, B)
    # outputs
    R_out_ref,  # (K, T) tile at scal[_WIDX, s]
    E_out_ref,  # (K, B)
    O_out_ref,  # (K, B)
    acc_ref,  # (1, 2) SMEM
    # scratch
    E_s,  # (K, B)
    O_s,  # (K, B)
    pen_s,  # (K, B)
    rold_s,  # (K, 1) block's old row-sums
    Oold_s,  # (K, B) block's old O contribution
    rpend_s,  # (K, 1)
    Opend_s,  # (K, B)
    accv_s,  # (1, 2) SMEM
):
    s = pl.program_id(0)
    n_steps = pl.num_programs(0)
    phase = scal_ref[_PHASE, s]
    first = scal_ref[_FIRST, s]
    last = scal_ref[_LAST, s]

    @pl.when(s == 0)
    def _():
        E_s[:] = E_in_ref[:]
        O_s[:] = O_in_ref[:]
        accv_s[0, 0] = 0.0
        accv_s[0, 1] = 0.0

    @pl.when((phase == 0) & (first == 1))
    def _():
        rold_s[:] = jnp.zeros_like(rold_s)
        Oold_s[:] = jnp.zeros_like(Oold_s)

    @pl.when(phase == 0)
    def _():
        # accumulate the block's old contribution (one streamed R read)
        R_t = R_in_ref[:]
        rold_s[:] = rold_s[:] + jnp.sum(R_t, axis=1, keepdims=True)
        Oold_s[:] = Oold_s[:] + jnp.dot(
            R_t, oh_ref[:], preferred_element_type=jnp.float32
        )

    @pl.when((phase == 1) & (first == 1))
    def _():
        # Step 1: remove the block (src/harmony.cpp:312-313) and build the
        # block-constant diversity penalty (src/harmony.cpp:318-322).
        E_s[:] = E_s[:] - rold_s[:] * Pr_ref[0, :][None, :]
        O_s[:] = O_s[:] - Oold_s[:]
        E, O = E_s[:], O_s[:]
        pen_s[:] = ((2.0 * E + 1.0) / (O + E + 1.0)) ** theta_ref[0, :][None, :]
        rpend_s[:] = jnp.zeros_like(rpend_s)
        Opend_s[:] = jnp.zeros_like(Opend_s)

    @pl.when(phase == 1)
    def _():
        # Step 2: this tile's assignments against the block-removed stats
        # (src/harmony.cpp:318-323). Invalid cells have all-zero one-hot
        # rows, so their penalty column is zero and the guarded normalise
        # yields an inert zero column.
        Z_t = Z_ref[:]  # (d, T)
        oh_t = oh_ref[:]  # (T, B)
        g = jnp.dot(Yt_ref[:], Z_t, preferred_element_type=jnp.float32)
        d_t = 2.0 * (1.0 - g)
        R_n = jnp.exp(-d_t / sigma_ref[:])
        R_n = R_n / jnp.sum(R_n, axis=0, keepdims=True)
        pc = jnp.dot(pen_s[:], oh_t.T, preferred_element_type=jnp.float32)
        R_n = R_n * pc
        colsum = jnp.sum(R_n, axis=0, keepdims=True)
        R_n = R_n / jnp.where(colsum == 0.0, 1.0, colsum)

        # Step 3: pending add-back + objective accumulators
        rpend_s[:] = rpend_s[:] + jnp.sum(R_n, axis=1, keepdims=True)
        Opend_s[:] = Opend_s[:] + jnp.dot(
            R_n, oh_t, preferred_element_type=jnp.float32
        )
        xlogx = jnp.where(R_n > 0, R_n * jnp.log(R_n), 0.0)
        accv_s[0, 0] = accv_s[0, 0] + jnp.sum(R_n * d_t)
        accv_s[0, 1] = accv_s[0, 1] + jnp.sum(sigma_ref[:] * xlogx)

        R_out_ref[:] = R_n

        @pl.when(last == 1)
        def _():
            # commit the block's new contribution (src/harmony.cpp:329-330)
            E_s[:] = E_s[:] + rpend_s[:] * Pr_ref[0, :][None, :]
            O_s[:] = O_s[:] + Opend_s[:]

    @pl.when(s == n_steps - 1)
    def _():
        E_out_ref[:] = E_s[:]
        O_out_ref[:] = O_s[:]
        acc_ref[0, 0] = accv_s[0, 0]
        acc_ref[0, 1] = accv_s[0, 1]


def _schedule(cfg: HarmonyConfig, NT: int, key: jax.Array):
    """(_ROWS, 2*NT) step table for the two-phase processed-order walk."""
    nb = min(cfg.n_blocks, NT)
    base, rem = divmod(NT, nb)
    szs = base + (jnp.arange(nb, dtype=jnp.int32) < rem).astype(jnp.int32)
    vstart = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(szs)[:-1]]
    )
    k1, k2 = jax.random.split(key)
    rt = jax.random.randint(k1, (), 0, NT)
    order = jax.random.permutation(k2, nb).astype(jnp.int32)

    n_steps = 2 * NT
    sz2 = 2 * szs[order]
    blk = jnp.repeat(order, sz2, total_repeat_length=n_steps)
    offs = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(sz2)[:-1]]
    )
    within2 = jnp.arange(n_steps, dtype=jnp.int32) - jnp.repeat(
        offs, sz2, total_repeat_length=n_steps
    )
    sz_b = szs[blk]
    phase = (within2 >= sz_b).astype(jnp.int32)
    within = jnp.where(phase == 1, within2 - sz_b, within2)
    tile = (vstart[blk] + within + rt) % NT
    blk_first_tile = (vstart[blk] + rt) % NT
    blk_last_tile = (vstart[blk] + sz_b - 1 + rt) % NT
    # R_in: stream old tiles in phase 0; pin to the block's last old tile in
    # phase 1 so no refetch happens. R_out: pin to the block's first assign
    # tile during phase 0 (the buffer is rewritten before any index change
    # can flush it).
    ridx = jnp.where(phase == 0, tile, blk_last_tile)
    widx = jnp.where(phase == 1, tile, blk_first_tile)
    first = (within == 0).astype(jnp.int32)
    last = ((within == sz_b - 1) & (phase == 1)).astype(jnp.int32)
    return (
        jnp.stack([tile, ridx, widx, blk, phase, first, last]),
        n_steps,
    )


# --------------------------------------------------------------------------
# v2: stats-carrying single-phase round
#
# The v1 kernel's phase-0 pass exists only to recover each block's *old*
# contribution to (E, O) from the current R — one full HBM read of R per
# round. But those contributions are sums of per-tile statistics that the
# *previous* round already had in VMEM when it wrote each tile. v2 therefore
# emits per-tile stats tile_O[t, k, b] = sum_{n in tile t} R[k,n]·oh[n,b] as
# an extra (tiny) output, and each round receives the previous round's
# tile_O: block-old stats for ANY new rotation/block partition are cheap
# XLA cumsums over the (NT, K, B) table (tiles are rotation-agnostic; blocks
# are contiguous virtual-tile runs). Per round the kernel then runs a single
# assign phase over NT steps whose only large HBM traffic is one read of
# Z/oh and one write of R — R is never re-read by the E-step.
#
# Per-cluster-phase seeding: tile_stats_from_R computes tile_O once from the
# phase-start R (after the re-entry re-assignment, src/harmony.cpp:214-228).
#
# The intercept row-sums fall out of tile_O: every valid cell carries
# exactly one covariate-0 level (pad cells have all-zero oh rows AND inert
# zero R columns), so sum_{b < B_vec[0]} tile_O[t, :, b] is the tile's R
# row-sum.
# --------------------------------------------------------------------------

# rows of the v2 per-step scalar table
_V2_TILE = 0  # physical tile this step assigns (Z/oh fetch; R/tile_O write)
_V2_BLK = 1  # processed block id (blk-stat fetch)
_V2_FIRST = 2  # first step of the block
_V2_LAST = 3  # last step of the block
_V2_ROWS = 4


def _assign_tile(
    Yt, Z_t, codes_ref, pen, sigma_col, inv2sig_col, *, offsets, B, variant,
    pc=None,
):
    """Assignments of one (d, T) tile against block-removed penalty ``pen``.

    The exact op sequence of the reference's per-block update
    (src/harmony.cpp:318-323). Shared by the round kernel and the
    virtual-R recompute/materialise kernels, which must reproduce the
    round's assignments BIT-IDENTICALLY — per-column results depend only
    on (Y, the cell's column, pen, sigma) and the op order fixed here, not
    on tile boundaries. Returns (R_n, ohT, g, colsum1, colsum_g).

    ``pc`` optionally injects the per-cell penalty gather (K, T) computed
    by the caller (the run-broadcast form on batch-pure runs). Every form
    — select chain, one-hot matmul, run broadcast — produces the SAME
    bits: each entry is exactly ``pen[k, code(t)]`` (products by exact
    0/1 and additions of 0 are exact), so callers may mix forms freely
    without breaking the virtual-R bit-identity contract.
    """
    T = Z_t.shape[1]
    # ohT is consumed by callers' one-hot contractions; with the
    # select-chain gather (B <= 32) or the chunked large-B build it never
    # materialises here (callers build it on demand)
    ohT = None
    g = jnp.dot(Yt, Z_t, preferred_element_type=jnp.float32)
    if pc is not None:
        pass
    elif B <= 32:
        # penalty gather as a B-pass select chain: the (K,B)x(B,T) one-hot
        # matmul pads B to 128 MXU lanes (~13x waste at B=10) and measures
        # +2.6 us/step, while the selects hide entirely behind the tile
        # DMA (tools/exp_round_anatomy.py); sentinel codes (pads) match no
        # level, leaving pc = 0 exactly as the one-hot contraction does
        pc = jnp.zeros_like(g)
        for c, off in enumerate(offsets):
            crow = codes_ref[c : c + 1, :] + off  # (1, T)
            for b in range(offsets[c], offsets[c] + _covw(offsets, c, B)):
                pc = pc + pen[:, b][:, None] * (crow == b).astype(
                    jnp.float32
                )
    else:
        # large-B penalty via the chunked one-hot matmul (bit-identical
        # per column to the full-width dot; see _pc_chunks)
        pc = jnp.concatenate(
            [c for _, c in _pc_chunks(pen, codes_ref, offsets, B, T)],
            axis=1,
        )

    if variant == "legacy":
        # two-normalise form, matching the reference op-for-op
        # (src/harmony.cpp:319-323)
        d_t = 2.0 * (1.0 - g)
        e = jnp.exp(-d_t / sigma_col)
        colsum1 = jnp.sum(e, axis=0, keepdims=True)
        w = (e / colsum1) * pc
    else:
        # single-normalise form: the reference's softmax normaliser
        # cancels in exact arithmetic, so apply ONE normalise to
        # w = exp(-d/sigma) * pen — the elementwise chain over the (K, T)
        # tile is the VPU bottleneck of the whole E-step and this form
        # needs ~half the passes. -d/sigma = (g - 1) * (2/sigma), fused
        # from the gram matrix. exp underflow is safe: d in [0, 4] and
        # sigma ~ 0.1 keeps exp(-d/sigma) >= ~4e-18.
        e = jnp.exp((g - 1.0) * inv2sig_col)
        w = e * pc
        colsum1 = None
    if variant == "fused_mxu":
        # column sums on the MXU (a (1, K) x (K, T) matmul replaces a
        # sublane reduction tree while the MXU sits between products)
        ones_row = jnp.full((1, Yt.shape[0]), 1.0, jnp.float32)
        colsum = jnp.dot(ones_row, w, preferred_element_type=jnp.float32)
    else:
        colsum = jnp.sum(w, axis=0, keepdims=True)
    colsum_g = jnp.where(colsum == 0.0, 1.0, colsum)
    R_n = w * (1.0 / colsum_g)
    return R_n, ohT, g, colsum1, colsum_g


class RoundState(NamedTuple):
    """Carry for stats-carrying rotate rounds."""

    R: jnp.ndarray
    E: jnp.ndarray
    O: jnp.ndarray
    tile_O: jnp.ndarray  # (NT, K, B) per-tile O contributions of R
    kmeans_error: jnp.ndarray
    entropy: jnp.ndarray


class VirtualR(NamedTuple):
    """Everything the virtual-R correction / materialisation needs to
    reproduce the final round's assignments (see the virtual-R section)."""

    pen: jnp.ndarray  # (nb, K, B) per-block penalties of the final round
    blkmap: jnp.ndarray  # (NT,) physical tile -> block
    Zn_pad: jnp.ndarray  # (d, Npt) the phase's normalised layout
    codes_pad: jnp.ndarray  # (ncov, Npt)
    Y: jnp.ndarray  # (d, K) centroids the final round used
    Z_orig_pad: jnp.ndarray  # (d, Npt)
    sigma: jnp.ndarray  # (K,)


class RunsSpec(NamedTuple):
    """Joint-batch-pure run structure of the layout: for every
    ``tile``-wide run, the GLOBAL batch row of each covariate (sublane c
    holds covariate c's row; sentinel -1 on mixed/pad runs). Enables the
    run-sum form of the per-tile stat contraction and the run-broadcast
    penalty gather for any covariate count <= 8 sublanes. Rows are one
    grid tile's runs padded to (8, 128) (Mosaic block constraint);
    requires estep_sub_tile // tile <= 128."""

    run_batch: jnp.ndarray  # (NT, 8, 128) int32; codes in [:, c, :rsub]
    tile: int  # run width (the layout tile; divides estep_sub_tile)


class MomentsSpec(NamedTuple):
    """Inputs for fusing the M-step joint-batch moments into the phase's
    final round (see pallas_rotate_update_round_v2). ``tile_joint`` maps
    every layout tile (width ``tile``, NT*msub entries incl. the mixed/pad
    tail mapped to slot ``n_joint``) to its joint-batch id."""

    Z_orig_pad: jnp.ndarray  # (d, Npt) original embedding, tile-aligned
    tile_joint: jnp.ndarray  # (Npt // tile,) int32
    n_joint: int
    tile: int  # layout-tile width (divides estep_sub_tile)


def tile_stats_from_R(
    cfg: HarmonyConfig, R: jnp.ndarray, oh_pad: jnp.ndarray
) -> jnp.ndarray:
    """(NT, K, B) per-tile O contributions, one XLA pass over R."""
    K, Np = R.shape
    T = cfg.estep_sub_tile
    NT = -(-Np // T)
    Npt = NT * T
    f32 = jnp.float32
    R_p = R.astype(f32)
    if Npt != Np:
        R_p = jnp.concatenate([R_p, jnp.zeros((K, Npt - Np), f32)], axis=1)
    R3 = R_p.reshape(K, NT, T)
    oh3 = oh_pad.reshape(NT, T, -1)
    return jnp.einsum(
        "knt,ntb->nkb", R3, oh3, preferred_element_type=f32
    )


def _block_old_stats(
    cfg: HarmonyConfig, tile_O: jnp.ndarray, NT: int, key: jax.Array
):
    """Per-round schedule + per-block old (E, O) contributions.

    Returns (scal table (_V2_ROWS, NT), blk_O (nb, K, B)). Same rotation /
    block-order distribution as the v1 schedule.
    """
    nb = min(cfg.n_blocks, NT)
    base, rem = divmod(NT, nb)
    szs = base + (jnp.arange(nb, dtype=jnp.int32) < rem).astype(jnp.int32)
    vstart = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(szs)[:-1]]
    )
    k1, k2 = jax.random.split(key)
    rt = jax.random.randint(k1, (), 0, NT)
    order = jax.random.permutation(k2, nb).astype(jnp.int32)

    # step table: process blocks in `order`, tiles within a block in
    # virtual order; virtual slot v holds physical tile (v + rt) % NT
    sz_o = szs[order]
    blk = jnp.repeat(order, sz_o, total_repeat_length=NT)
    offs = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(sz_o)[:-1]]
    )
    within = jnp.arange(NT, dtype=jnp.int32) - jnp.repeat(
        offs, sz_o, total_repeat_length=NT
    )
    tile = (vstart[blk] + within + rt) % NT
    first = (within == 0).astype(jnp.int32)
    last = (within == szs[blk] - 1).astype(jnp.int32)
    scal = jnp.stack([tile, blk, first, last])

    # block-old stats from the previous round's per-tile table: gather into
    # virtual order, then contiguous-range sums via an exclusive cumsum
    virt = (jnp.arange(NT, dtype=jnp.int32) + rt) % NT
    tO_v = jnp.take(tile_O, virt, axis=0)  # (NT, K, B)
    cs = jnp.cumsum(tO_v, axis=0, dtype=jnp.float32)
    zero = jnp.zeros_like(cs[:1])
    cs_ex = jnp.concatenate([zero, cs], axis=0)  # inclusive -> exclusive
    blk_O = cs_ex[vstart + szs] - cs_ex[vstart]  # (nb, K, B)
    return scal, blk_O


def _round_kernel_v2(
    scal_ref,  # (_V2_ROWS, NT) int32 step table
    tj_ref,  # (NT*msub,) int32 layout-tile -> joint id (moments only)
    # inputs
    Yt_ref,  # (K, d)
    Z_ref,  # (d, T) tile at scal[_V2_TILE, s]
    codes_ref,  # (ncov, T) tile at scal[_V2_TILE, s]
    blkO_ref,  # (1, K, B) block-old O at scal[_V2_BLK, s]
    E_in_ref,  # (K, B)
    O_in_ref,  # (K, B)
    Pr_ref,  # (1, B)
    sigma_ref,  # (K, 1)
    sigrow_ref,  # (1, K) sigma again, lane-major for the MXU row-sums
    inv2sig_ref,  # (K, 1) 2/sigma
    theta_ref,  # (1, B)
    *rest,  # [runb_ref][Zo_ref (d, T) Z_orig tile] + outputs + scratch
    b0: int,  # levels of covariate 0 (intercept row-sum slice)
    cheap_entropy: bool,  # single covariate: factorised sigma*R*logR
    offsets: tuple,  # covariate offsets into the global batch rows
    B: int,
    variant: str = "legacy",  # 'legacy' | 'fused_vpu' | 'fused_mxu'
    msub: int = 0,  # layout sub-tiles per grid tile (M-step moment fusion)
    emit_pen: bool = False,  # emit the per-block penalty table (virtual R)
    rsub: int = 0,  # batch-pure runs per grid tile (run-sum tile stats)
):
    it = iter(rest)
    runb_ref = next(it) if rsub else None  # (1, 8, 128) run codes slab
    Zo_ref = next(it) if msub else None
    R_out_ref, tO_out_ref, E_out_ref, O_out_ref = (
        next(it), next(it), next(it), next(it),
    )
    M_out_ref = next(it) if msub else None
    pen_out_ref = next(it) if emit_pen else None
    acc_ref = next(it)
    E_s, O_s, pen_s, logpen_s, rpend_s, Opend_s = (
        next(it), next(it), next(it), next(it), next(it), next(it),
    )
    tO_s = next(it) if rsub else None
    pc_s = next(it) if (rsub and B > 32) else None
    accv_s = next(it)
    s = pl.program_id(0)
    n_steps = pl.num_programs(0)
    first = scal_ref[_V2_FIRST, s]
    last = scal_ref[_V2_LAST, s]

    @pl.when(s == 0)
    def _():
        E_s[:] = E_in_ref[:]
        O_s[:] = O_in_ref[:]
        accv_s[0, 0] = 0.0
        accv_s[0, 1] = 0.0
        if msub:
            # M_out doubles as the accumulator: unblocked outputs stay
            # VMEM-resident for the whole grid, so accumulating here saves
            # a second (n_joint+1, K, d+1) scratch copy — at B=100, K=100
            # that 2 MB is the difference between T=4096 fitting scoped
            # VMEM and the tile shrinking to 2048
            M_out_ref[...] = jnp.zeros_like(M_out_ref)

    @pl.when(first == 1)
    def _():
        # remove the whole block using the carried per-tile stats
        # (src/harmony.cpp:312-313) and build the block-constant penalty
        # (src/harmony.cpp:318-322)
        Ob = blkO_ref[0]  # (K, B)
        rb = jnp.sum(Ob[:, :b0], axis=1, keepdims=True)  # (K, 1)
        E_s[:] = E_s[:] - rb * Pr_ref[0, :][None, :]
        O_s[:] = O_s[:] - Ob
        E, O = E_s[:], O_s[:]
        ratio = (2.0 * E + 1.0) / (O + E + 1.0)
        pen_s[:] = ratio ** theta_ref[0, :][None, :]
        # only the entropy accumulator consumes the log; for valid states
        # ratio > 0 (E, O are non-negative cell sums)
        logpen_s[:] = jnp.log(ratio) * theta_ref[0, :][None, :]
        rpend_s[:] = jnp.zeros_like(rpend_s)
        Opend_s[:] = jnp.zeros_like(Opend_s)
        if emit_pen:
            # persist the block-removed penalty: with it (+ the schedule's
            # tile->block map) any later kernel reproduces this round's
            # assignments without R ever reaching HBM
            blk = scal_ref[_V2_BLK, s]
            pen_out_ref[pl.ds(blk, 1)] = pen_s[:][None]

    # assignments for this tile against the block-removed stats
    # (src/harmony.cpp:318-323); invalid cells (code -1) have all-zero
    # one-hot columns, so the guarded normalise leaves inert zero columns.
    Z_t = Z_ref[:]  # (d, T)
    T_pc = Z_t.shape[1]
    pc_in = None
    if pc_s is not None:
        # Large-B penalty gather without the (K, B)x(B, T) one-hot matmul
        # (which at B=100 costs ~2.5x the gram matmul after 128-lane
        # padding): on a batch-pure run the penalty column is constant, so
        # gather pen at the rsub run codes — a tiny (K, B)x(B, rsub)
        # product — and lane-broadcast each column over its run. Mixed/pad
        # runs (sentinel codes) fall back to the exact one-hot contraction
        # per tile. Both forms produce bit-identical pc (see _assign_tile).
        runmapT_pc, pure_pc = _run_mapT(runb_ref, len(offsets), rsub, B)

        @pl.when(pure_pc)
        def _():
            # multi-hot columns sum each run's ncov penalty rows — the
            # additive multi-covariate penalty (src/harmony.cpp:322)
            pen_run = jnp.dot(
                pen_s[:], runmapT_pc, preferred_element_type=jnp.float32
            )  # (K, rsub)
            Tr = T_pc // rsub
            K_pc = pen_run.shape[0]
            # per-run slice stores (no full-width concatenate temporary —
            # the (K, T) stack copy is what the VMEM budget pays for)
            for j in range(rsub):
                pc_s[:, j * Tr : (j + 1) * Tr] = jnp.broadcast_to(
                    pen_run[:, j : j + 1], (K_pc, Tr)
                )

        @pl.when(~pure_pc)
        def _():
            for sl, c in _pc_chunks(pen_s[:], codes_ref, offsets, B, T_pc):
                pc_s[:, sl] = c

        pc_in = pc_s[:]
    R_n, ohT, g, colsum1, colsum_g = _assign_tile(
        Yt_ref[:], Z_t, codes_ref, pen_s[:], sigma_ref[:], inv2sig_ref[:],
        offsets=offsets, B=B, variant=variant, pc=pc_in,
    )

    # per-tile stats: this IS the add-back bookkeeping AND the next round's
    # block-old source
    T_t = Z_t.shape[1]
    if rsub:
        # batch-pure runs: tO as per-run row sums (VPU lane reductions) +
        # a tiny (K, rsub)x(rsub, B) matmul — the (K,T)x(T,B) one-hot
        # contraction pads B to 128 MXU lanes and measures +2.6 us/step
        # over this form (tools/exp_round_anatomy.py tO_runsum). Tiles
        # containing mixed/pad runs (sentinel batch codes) fall back to
        # the exact one-hot contraction.
        runmapT, is_pure = _run_mapT(runb_ref, len(offsets), rsub, B)

        @pl.when(is_pure)
        def _():
            Tr = T_t // rsub
            rs = jnp.concatenate(
                [
                    jnp.sum(
                        R_n[:, j * Tr : (j + 1) * Tr],
                        axis=1, keepdims=True,
                    )
                    for j in range(rsub)
                ],
                axis=1,
            )  # (K, rsub)
            tO_s[:] = jax.lax.dot_general(
                rs, runmapT, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        @pl.when(~is_pure)
        def _():
            if B > 32:
                tO_s[:] = _tO_chunked(R_n, codes_ref, offsets, B, T_t)
            else:
                oh_m = _build_ohT(codes_ref, offsets, B, T_t)
                tO_s[:] = jax.lax.dot_general(
                    R_n, oh_m, dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )

        tO = tO_s[:]
    elif B > 32:
        tO = _tO_chunked(R_n, codes_ref, offsets, B, T_t)  # (K, B)
    else:
        if ohT is None:
            ohT = _build_ohT(codes_ref, offsets, B, T_t)
        tO = jax.lax.dot_general(
            R_n, ohT, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (K, B)
    rpend_s[:] = rpend_s[:] + jnp.sum(tO[:, :b0], axis=1, keepdims=True)
    Opend_s[:] = Opend_s[:] + tO
    if variant == "legacy":
        s_rd = jnp.sum(R_n * (2.0 * (1.0 - g)))
    else:
        # sum R*d = 2*sum(R) - 2*sum(R*g); sum(R) is the tile's
        # valid-cell count, free from the covariate-0 slice of tO
        n_valid = jnp.sum(tO[:, :b0])
        s_rd = 2.0 * n_valid - 2.0 * jnp.sum(R_n * g)
    accv_s[0, 0] = accv_s[0, 0] + s_rd
    if cheap_entropy:
        # sigma_k R log R factorised: log R = -d/sigma + logpen[b] -
        # log(colsum[1]*colsum). The first term contracts to -R*d; the
        # penalty term contracts against the per-tile stats tO (one K x B
        # product); the column-sum term needs sR = sigma^T R and T
        # transcendentals instead of K*T. Exact for one covariate, where
        # pc is a gather of pen columns. Pad columns are inert: sR = 0 and
        # colsum_g = 1 -> log = 0.
        if variant == "fused_mxu":
            sR = jnp.dot(
                sigrow_ref[:], R_n, preferred_element_type=jnp.float32
            )  # (1, T)
        else:
            sR = jnp.sum(sigma_ref[:] * R_n, axis=0, keepdims=True)
        logc = (
            jnp.log(colsum1 * colsum_g)
            if variant == "legacy"
            else jnp.log(colsum_g)
        )
        ent_t = (
            -s_rd
            - jnp.sum(logc * sR)
            + jnp.sum(sigma_ref[:] * tO * logpen_s[:])
        )
        accv_s[0, 1] = accv_s[0, 1] + ent_t
    else:
        xlogx = jnp.where(R_n > 0, R_n * jnp.log(R_n), 0.0)
        accv_s[0, 1] = accv_s[0, 1] + jnp.sum(sigma_ref[:] * xlogx)

    R_out_ref[:] = R_n
    tO_out_ref[0] = tO

    if msub:
        # M-step moment fusion: this round is the phase's last, so R_n IS
        # the R the correction consumes — accumulate its joint-batch
        # moments against Z_orig right here. The sub-tile matmuls split
        # the same contraction the tO product already pays for, and the
        # separate O(K·N·d) moments pass over R and Z_orig disappears
        # (src/harmony.cpp:561 moments via ops/pallas_ridge.py otherwise).
        Zo = Zo_ref[:]  # (d, T) Z_orig tile
        Tl = Z_t.shape[1] // msub
        tile = scal_ref[_V2_TILE, s]
        for j in range(msub):
            sl = slice(j * Tl, (j + 1) * Tl)
            R_sl = R_n[:, sl]
            S = jax.lax.dot_general(
                R_sl, Zo[:, sl],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (K, d)
            S = jnp.concatenate(
                [S, jnp.sum(R_sl, axis=1, keepdims=True)], axis=1
            )
            jid = tj_ref[tile * msub + j]
            M_out_ref[pl.ds(jid, 1)] = M_out_ref[pl.ds(jid, 1)] + S[None]

    @pl.when(last == 1)
    def _():
        # commit the block's new contribution (src/harmony.cpp:329-330)
        E_s[:] = E_s[:] + rpend_s[:] * Pr_ref[0, :][None, :]
        O_s[:] = O_s[:] + Opend_s[:]

    @pl.when(s == n_steps - 1)
    def _():
        E_out_ref[:] = E_s[:]
        O_out_ref[:] = O_s[:]
        acc_ref[0, 0] = accv_s[0, 0]
        acc_ref[0, 1] = accv_s[0, 1]


def pallas_rotate_update_round_v2(
    cfg: HarmonyConfig,
    Z: jnp.ndarray,  # unused (layout carries Z); kept for signature parity
    Y: jnp.ndarray,  # (d, K)
    rs: "RoundState",
    Pr_b: jnp.ndarray,
    sigma: jnp.ndarray,
    theta: jnp.ndarray,
    key: jax.Array,
    layout: CodesLayout,
    interpret: bool = False,
    write_r: bool = True,
    moments: "MomentsSpec | None" = None,
    emit_pen: bool = False,
    runs: "RunsSpec | None" = None,
):
    """Stats-carrying rotate round: one Z/codes read + one R write per round.

    ``write_r=False`` skips materialising the (K, N) assignment matrix in
    HBM entirely — the kernel's only large output becomes the tiny per-tile
    stat table. Valid because no stats-carrying round ever *reads* R (the
    carried tile table reconstructs block-old stats); callers use it for
    every round except the phase's last, whose R feeds the M-step. The
    returned ``RoundState.R`` then carries the (stale) input R unchanged.

    ``moments`` (a :class:`MomentsSpec`) fuses the M-step's joint-batch
    moment accumulation into this round: the kernel additionally reads the
    Z_orig tile and returns the (n_joint+1, K, d+1) moment table of the
    freshly written R — the separate O(K·N·d) moments pass then never runs.

    ``emit_pen`` additionally returns (pen (nb, K, B), blk_of_phys (NT,)):
    the per-block penalty matrices and the physical-tile -> block map of
    this round's schedule, from which _assign_tile reproduces every
    assignment bit-identically (the virtual-R correction path).

    Return value: RoundState, extended to a tuple
    ``(RoundState[, M][, (pen, blk_of_phys)])`` per the flags.
    """
    K, Np = rs.R.shape
    d = layout.Z_pad.shape[0]
    B = cfg.B
    ncov = cfg.n_covariates
    T = cfg.estep_sub_tile
    f32 = jnp.float32
    NT = -(-Np // T)
    Npt = NT * T

    scal, blk_O = _block_old_stats(cfg, rs.tile_O, NT, key)
    nb = blk_O.shape[0]

    from functools import partial as _partial

    if write_r:
        r_spec = pl.BlockSpec((K, T), lambda s, sc, tj: (0, sc[_V2_TILE, s]))
        r_shape = jax.ShapeDtypeStruct((K, Npt), f32)
    else:
        # constant index map: the single (K, T) buffer stays VMEM-resident
        # for the whole grid and flushes once — no per-step HBM write
        r_spec = pl.BlockSpec((K, T), lambda s, sc, tj: (0, 0))
        r_shape = jax.ShapeDtypeStruct((K, T), f32)

    in_specs = [
        pl.BlockSpec((K, d), lambda s, sc, tj: (0, 0)),  # Y^T
        pl.BlockSpec((d, T), lambda s, sc, tj: (0, sc[_V2_TILE, s])),  # Z
        pl.BlockSpec(
            (ncov, T), lambda s, sc, tj: (0, sc[_V2_TILE, s])
        ),  # codes
        pl.BlockSpec((1, K, B), lambda s, sc, tj: (sc[_V2_BLK, s], 0, 0)),
        pl.BlockSpec((K, B), lambda s, sc, tj: (0, 0)),  # E_in
        pl.BlockSpec((K, B), lambda s, sc, tj: (0, 0)),  # O_in
        pl.BlockSpec((1, B), lambda s, sc, tj: (0, 0)),  # Pr_b
        pl.BlockSpec((K, 1), lambda s, sc, tj: (0, 0)),  # sigma
        pl.BlockSpec((1, K), lambda s, sc, tj: (0, 0)),  # sigma row
        pl.BlockSpec((K, 1), lambda s, sc, tj: (0, 0)),  # 2/sigma
        pl.BlockSpec((1, B), lambda s, sc, tj: (0, 0)),  # theta
    ]
    out_specs = [
        r_spec,  # R new (or the VMEM dummy)
        pl.BlockSpec((1, K, B), lambda s, sc, tj: (sc[_V2_TILE, s], 0, 0)),
        pl.BlockSpec((K, B), lambda s, sc, tj: (0, 0)),
        pl.BlockSpec((K, B), lambda s, sc, tj: (0, 0)),
    ]
    out_shape = [
        r_shape,
        jax.ShapeDtypeStruct((NT, K, B), f32),
        jax.ShapeDtypeStruct((K, B), f32),
        jax.ShapeDtypeStruct((K, B), f32),
    ]
    scratch = [
        pltpu.VMEM((K, B), f32),  # E_s
        pltpu.VMEM((K, B), f32),  # O_s
        pltpu.VMEM((K, B), f32),  # pen_s
        pltpu.VMEM((K, B), f32),  # logpen_s
        pltpu.VMEM((K, 1), f32),  # rpend
        pltpu.VMEM((K, B), f32),  # Opend
    ]
    rsub = 0
    if runs is not None:
        rsub = T // runs.tile
        # run batch codes, one (8, 128) slab per grid tile (Mosaic block
        # constraint: last two block dims divisible by (8, 128))
        in_specs.append(
            pl.BlockSpec(
                (1, 8, 128), lambda s, sc, tj: (sc[_V2_TILE, s], 0, 0)
            )
        )
        scratch.append(pltpu.VMEM((K, B), f32))  # tO_s
        if B > 32:
            scratch.append(pltpu.VMEM((K, T), f32))  # pc_s (run penalty)
    msub = 0
    if moments is not None:
        msub = T // moments.tile
        nj = moments.n_joint
        in_specs.append(
            pl.BlockSpec((d, T), lambda s, sc, tj: (0, sc[_V2_TILE, s]))
        )  # Z_orig
        out_specs.append(
            pl.BlockSpec((nj + 1, K, d + 1), lambda s, sc, tj: (0, 0, 0))
        )
        out_shape.append(jax.ShapeDtypeStruct((nj + 1, K, d + 1), f32))
        tj = moments.tile_joint
    else:
        tj = jnp.zeros((1,), jnp.int32)
    extra_in = ()
    if runs is not None:
        extra_in += (runs.run_batch.astype(jnp.int32),)
    if moments is not None:
        extra_in += (moments.Z_orig_pad,)
    if emit_pen:
        out_specs.append(
            pl.BlockSpec((nb, K, B), lambda s, sc, tj: (0, 0, 0))
        )
        out_shape.append(jax.ShapeDtypeStruct((nb, K, B), f32))
    out_specs.append(
        pl.BlockSpec((1, 2), lambda s, sc, tj: (0, 0), memory_space=pltpu.SMEM)
    )
    out_shape.append(jax.ShapeDtypeStruct((1, 2), f32))
    scratch.append(pltpu.SMEM((1, 2), f32))  # accv

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(NT,),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=scratch,
    )
    kernel = pl.pallas_call(
        _partial(
            _round_kernel_v2, b0=cfg.B_vec[0],
            cheap_entropy=cfg.n_covariates == 1,
            offsets=tuple(cfg.covariate_offsets), B=B,
            variant=cfg.estep_variant,
            msub=msub,
            emit_pen=emit_pen,
            rsub=rsub,
        ),
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )
    sig32 = sigma.astype(f32)
    outs = kernel(
        scal,
        tj,
        Y.T.astype(f32),
        layout.Z_pad,
        layout.codes_pad,
        blk_O,
        rs.E.astype(f32),
        rs.O.astype(f32),
        Pr_b.astype(f32)[None, :],
        sig32[:, None],
        sig32[None, :],
        (2.0 / sig32)[:, None],
        theta.astype(f32)[None, :],
        *extra_in,
    )
    it_out = iter(outs)
    R_new, tO_new, E_out, O_out = (
        next(it_out), next(it_out), next(it_out), next(it_out),
    )
    M = next(it_out) if moments is not None else None
    pen = next(it_out) if emit_pen else None
    acc = next(it_out)
    if write_r:
        R_out = (R_new[:, :Np] if Npt != Np else R_new).astype(rs.R.dtype)
    else:
        R_out = rs.R  # stale by contract; never consumed before the next write
    res = RoundState(
        R=R_out,
        E=E_out.astype(rs.E.dtype),
        O=O_out.astype(rs.O.dtype),
        tile_O=tO_new,
        kmeans_error=acc[0, 0],
        entropy=acc[0, 1],
    )
    out = (res,)
    if moments is not None:
        out = out + (M,)
    if emit_pen:
        # physical tile -> processed block of THIS round's schedule (tiny
        # scatter; scal rows: tile at _V2_TILE, block at _V2_BLK)
        blk_of_phys = jnp.zeros((NT,), jnp.int32).at[scal[_V2_TILE]].set(
            scal[_V2_BLK]
        )
        out = out + ((pen, blk_of_phys),)
    return out[0] if len(out) == 1 else out


# --------------------------------------------------------------------------
# Sharded (multi-chip) wrappers: per-shard block schedule.
#
# The reference's E-step interleaves *global* E/O updates between blocks
# (src/harmony.cpp:293-332); preserving that exactly across a mesh would
# cost one K x B all-reduce per block (~n_blocks per round). Instead each
# shard runs the full reference block structure — n_blocks sequential
# blocks over its local tiles, its own random rotation and block order —
# against diversity statistics that are global at round start and updated
# shard-locally within the round; the shards' E/O deltas merge with ONE
# psum per round. Equivalent to the reference's stochastic schedule in the
# same sense the rotate schedule already is (different random order of the
# same online process; remote contributions are at most one round stale
# within a round). The carried tile_O table shards with the tiles, so the
# E-step's zero-R-re-read property is preserved per shard.
# --------------------------------------------------------------------------


def sharded_reassign(
    cfg: HarmonyConfig,
    mesh,
    Y: jnp.ndarray,
    sigma: jnp.ndarray,
    Pr_b: jnp.ndarray,
    Z_raw: jnp.ndarray,  # (d, Npt) cell-sharded, tile*mesh aligned
    codes_pad: jnp.ndarray,  # (ncov, Npt) cell-sharded
    interpret: bool = False,
    runs: "RunsSpec | None" = None,
):
    """Fused re-entry on a cell-sharded mesh: local kernels + one psum.

    ``runs`` (global row table, sharded with the tiles) enables the
    run-sum tile-stat form per shard exactly as on one device."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from ..sharding import CELL_AXIS

    def fn(Y, sigma, Pr_b, Z_loc, codes_loc, *rest):
        runs_loc = (
            RunsSpec(run_batch=rest[0], tile=runs.tile)
            if runs is not None
            else None
        )
        Zn, tO, O, _ = pallas_reassign(
            cfg, Y, sigma, Pr_b, Z_loc, codes_loc, interpret=interpret,
            runs=runs_loc,
        )
        O = jax.lax.psum(O, CELL_AXIS)
        rsum = jnp.sum(O[:, : cfg.B_vec[0]], axis=1)
        E = rsum[:, None] * Pr_b.astype(jnp.float32)[None, :]
        return Zn, tO, O, E

    in_specs = [P(), P(), P(), P(None, CELL_AXIS), P(None, CELL_AXIS)]
    args = [Y, sigma, Pr_b, Z_raw, codes_pad]
    if runs is not None:
        in_specs.append(P(CELL_AXIS))
        args.append(runs.run_batch.astype(jnp.int32))
    return shard_map(
        fn,
        mesh=mesh,
        check_vma=False,
        in_specs=tuple(in_specs),
        out_specs=(P(None, CELL_AXIS), P(CELL_AXIS), P(), P()),
    )(*args)


def sharded_rotate_round_v2(
    cfg: HarmonyConfig,
    mesh,
    Y: jnp.ndarray,  # (d, K) replicated
    rs: "RoundState",  # R/tile_O cell-sharded; E/O replicated
    Pr_b: jnp.ndarray,
    sigma: jnp.ndarray,
    theta: jnp.ndarray,
    key: jax.Array,
    layout: CodesLayout,  # Z_pad/codes_pad cell-sharded
    interpret: bool = False,
    write_r: bool = True,
    moments: "MomentsSpec | None" = None,
    emit_pen: bool = False,
    runs: "RunsSpec | None" = None,
):
    """Stats-carrying rotate round on a cell-sharded mesh.

    Each shard's schedule derives from ``fold_in(key, axis_index)`` — the
    global round is ``mesh.size * n_blocks`` blocks processed in parallel
    waves of ``mesh.size``. E/O enter replicated; the shards' deltas and
    the objective accumulators merge with one psum.

    The single-device round's extras all shard: ``runs`` row tables ride
    with the tiles; ``moments`` fuses each shard's joint-batch moment
    contribution and merges the (n_joint+1, K, d+1) tables with the same
    psum wave (the M-step normal-equation reduction of SURVEY.md §2.3);
    ``emit_pen`` returns the per-shard penalty tables stacked on a sharded
    leading axis — (mesh.size * nb, K, B) — and the tile -> block map in
    GLOBAL block ids (shard s's blocks are s*nb .. s*nb+nb-1), which is
    what the virtual-R correction/materialisation consume.

    Return value mirrors the local round:
    ``RoundState`` | ``(RoundState[, M][, (pen, blk_of_phys)])``.
    """
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from ..sharding import CELL_AXIS

    f32 = jnp.float32

    def fn(Y, R, E, O, tile_O, Z_loc, codes_loc, Pr_b, sigma, theta, key,
           *rest):
        it = iter(rest)
        runs_loc = (
            RunsSpec(run_batch=next(it), tile=runs.tile)
            if runs is not None
            else None
        )
        moments_loc = (
            MomentsSpec(
                Z_orig_pad=next(it), tile_joint=next(it),
                n_joint=moments.n_joint, tile=moments.tile,
            )
            if moments is not None
            else None
        )
        idx = jax.lax.axis_index(CELL_AXIS)
        k = jax.random.fold_in(key, idx)
        rs_loc = RoundState(
            R=R, E=E, O=O, tile_O=tile_O,
            kmeans_error=jnp.float32(0), entropy=jnp.float32(0),
        )
        out = pallas_rotate_update_round_v2(
            cfg, Z_loc, Y, rs_loc, Pr_b, sigma, theta, k,
            layout=CodesLayout(Z_pad=Z_loc, codes_pad=codes_loc),
            interpret=interpret, write_r=write_r,
            moments=moments_loc, emit_pen=emit_pen, runs=runs_loc,
        )
        # RoundState is itself a (named) tuple: unpack by the flags, not
        # by isinstance
        if moments is not None or emit_pen:
            res, *extras = out
        else:
            res, extras = out, ()
        it_out = iter(extras)
        O_new = O + jax.lax.psum(res.O.astype(f32) - O, CELL_AXIS)
        E_new = E + jax.lax.psum(res.E.astype(f32) - E, CELL_AXIS)
        kerr = jax.lax.psum(res.kmeans_error, CELL_AXIS)
        ent = jax.lax.psum(res.entropy, CELL_AXIS)
        outs = (res.R, res.tile_O, E_new, O_new, kerr, ent)
        if moments is not None:
            M = jax.lax.psum(next(it_out), CELL_AXIS)
            outs += (M,)
        if emit_pen:
            pen, blk_of_phys = next(it_out)
            nb_loc = pen.shape[0]
            outs += (pen, blk_of_phys + idx * nb_loc)
        return outs

    in_specs = [
        P(), P(None, CELL_AXIS), P(), P(), P(CELL_AXIS),
        P(None, CELL_AXIS), P(None, CELL_AXIS), P(), P(), P(), P(),
    ]
    args = [
        Y, rs.R, rs.E.astype(f32), rs.O.astype(f32), rs.tile_O,
        layout.Z_pad, layout.codes_pad, Pr_b, sigma, theta, key,
    ]
    out_specs = [P(None, CELL_AXIS), P(CELL_AXIS), P(), P(), P(), P()]
    if runs is not None:
        in_specs.append(P(CELL_AXIS))
        args.append(runs.run_batch.astype(jnp.int32))
    if moments is not None:
        in_specs.extend([P(None, CELL_AXIS), P(CELL_AXIS)])
        args.extend([moments.Z_orig_pad, moments.tile_joint])
        out_specs.append(P())
    if emit_pen:
        out_specs.extend([P(CELL_AXIS), P(CELL_AXIS)])

    outs = shard_map(
        fn,
        mesh=mesh,
        check_vma=False,
        in_specs=tuple(in_specs),
        out_specs=tuple(out_specs),
    )(*args)
    it_out = iter(outs)
    R, tile_O, E, O, kerr, ent = (
        next(it_out), next(it_out), next(it_out), next(it_out),
        next(it_out), next(it_out),
    )
    res = RoundState(
        R=R, E=E.astype(rs.E.dtype), O=O.astype(rs.O.dtype),
        tile_O=tile_O, kmeans_error=kerr, entropy=ent,
    )
    out = (res,)
    if moments is not None:
        out = out + (next(it_out),)
    if emit_pen:
        out = out + ((next(it_out), next(it_out)),)
    return out[0] if len(out) == 1 else out


def _reassign_kernel(
    # inputs
    Yt_ref,  # (K, d)
    Z_ref,  # (d, T) tile s — RAW (un-normalised) corrected embedding
    codes_ref,  # (ncov, T) tile s
    inv2sig_ref,  # (K, 1) 2/sigma
    *rest,  # [runb_ref (1, 8, 128)] + outputs + scratch
    ncov: int,
    offsets: tuple,
    B: int,
    rsub: int = 0,
):
    it = iter(rest)
    runb_ref = next(it) if rsub else None
    Zn_out_ref = next(it)  # (d, T) tile s — L2-normalised columns
    tO_out_ref = next(it)  # (1, K, B) tile s
    O_out_ref = next(it)  # (K, B)
    O_s = next(it)  # (K, B) scratch
    tO_s = next(it) if rsub else None
    s = pl.program_id(0)
    n_steps = pl.num_programs(0)

    @pl.when(s == 0)
    def _():
        O_s[:] = jnp.zeros_like(O_s)

    # column normalise in VMEM (src/harmony.cpp:220; zero columns — pads —
    # stay zero, matching arma::normalise)
    Z_t = Z_ref[:]  # (d, T)
    T_t = Z_t.shape[1]
    nrm = jnp.sqrt(jnp.sum(Z_t * Z_t, axis=0, keepdims=True))
    Z_t = Z_t / jnp.where(nrm == 0.0, 1.0, nrm)
    Zn_out_ref[:] = Z_t

    g = jnp.dot(Yt_ref[:], Z_t, preferred_element_type=jnp.float32)
    # single-normalise form of exp(-2(1-g)/sigma) (see _round_kernel_v2)
    e = jnp.exp((g - 1.0) * inv2sig_ref[:])
    # pad cells (sentinel codes) must stay inert zero columns
    valid = (codes_ref[0:1, :] >= 0).astype(jnp.float32)  # (1, T)
    R_n = e * valid
    colsum = jnp.sum(R_n, axis=0, keepdims=True)
    R_n = R_n * (1.0 / jnp.where(colsum == 0.0, 1.0, colsum))

    if rsub:
        # run-sum tile stats on batch-pure runs (see _round_kernel_v2)
        runmapT, is_pure = _run_mapT(runb_ref, ncov, rsub, B)

        @pl.when(is_pure)
        def _():
            Tr = T_t // rsub
            rs = jnp.concatenate(
                [
                    jnp.sum(
                        R_n[:, j * Tr : (j + 1) * Tr],
                        axis=1, keepdims=True,
                    )
                    for j in range(rsub)
                ],
                axis=1,
            )
            tO_s[:] = jax.lax.dot_general(
                rs, runmapT, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        @pl.when(~is_pure)
        def _():
            if B > 32:
                tO_s[:] = _tO_chunked(R_n, codes_ref, offsets, B, T_t)
            else:
                oh_m = _build_ohT(codes_ref, offsets, B, T_t)
                tO_s[:] = jax.lax.dot_general(
                    R_n, oh_m, dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )

        tO = tO_s[:]
    elif B > 32:
        tO = _tO_chunked(R_n, codes_ref, offsets, B, T_t)  # (K, B)
    else:
        ohT = _build_ohT(codes_ref, offsets, B, T_t)
        tO = jax.lax.dot_general(
            R_n, ohT, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (K, B)
    O_s[:] = O_s[:] + tO
    tO_out_ref[0] = tO

    @pl.when(s == n_steps - 1)
    def _():
        O_out_ref[:] = O_s[:]


def pallas_reassign(
    cfg: HarmonyConfig,
    Y: jnp.ndarray,  # (d, K)
    sigma: jnp.ndarray,  # (K,)
    Pr_b: jnp.ndarray,  # (B,)
    Z_raw: jnp.ndarray,  # (d, Npt) un-normalised corrected embedding, padded
    codes_pad: jnp.ndarray,  # (ncov, Npt) int32; pads -1
    interpret: bool = False,
    runs: "RunsSpec | None" = None,
):
    """Fused re-entry: normalise + re-assign + tile-stat seed, one Z pass.

    The re-entry re-estimation of src/harmony.cpp:220-227 computes
    R = L1norm(exp(-2(1 - Y^T Z/|Z|)/sigma)) and the E/O stats. The
    stats-carrying round kernel never *reads* R — each round rebuilds every
    block's assignments from (Y, Z) and recovers block-old stats from the
    carried (NT, K, B) tile table — so this kernel skips the (K, N) R
    write entirely and emits only the normalised embedding (consumed as
    the phase's tile layout AND the new Z_corr), the tile table, and O;
    E = rowsums·Pr_b^T falls out of O's covariate-0 block.
    """
    K = cfg.K
    d = Z_raw.shape[0]
    B = cfg.B
    T = cfg.estep_sub_tile
    f32 = jnp.float32
    Npt = Z_raw.shape[1]
    NT = Npt // T

    from functools import partial as _partial

    rsub = 0
    in_specs = [
        pl.BlockSpec((K, d), lambda s: (0, 0)),  # Y^T
        pl.BlockSpec((d, T), lambda s: (0, s)),  # Z raw
        pl.BlockSpec((cfg.n_covariates, T), lambda s: (0, s)),  # codes
        pl.BlockSpec((K, 1), lambda s: (0, 0)),  # sigma
    ]
    scratch = [pltpu.VMEM((K, B), f32)]
    extra_in = ()
    if runs is not None:
        rsub = T // runs.tile
        in_specs.append(pl.BlockSpec((1, 8, 128), lambda s: (s, 0, 0)))
        scratch.append(pltpu.VMEM((K, B), f32))  # tO_s
        extra_in = (runs.run_batch.astype(jnp.int32),)
    kernel = pl.pallas_call(
        _partial(
            _reassign_kernel, ncov=cfg.n_covariates,
            offsets=tuple(cfg.covariate_offsets), B=B, rsub=rsub,
        ),
        grid=(NT,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((d, T), lambda s: (0, s)),  # Z normalised
            pl.BlockSpec((1, K, B), lambda s: (s, 0, 0)),  # tile_O
            pl.BlockSpec((K, B), lambda s: (0, 0)),  # O
        ],
        out_shape=[
            jax.ShapeDtypeStruct((d, Npt), f32),
            jax.ShapeDtypeStruct((NT, K, B), f32),
            jax.ShapeDtypeStruct((K, B), f32),
        ],
        scratch_shapes=scratch,
        interpret=interpret,
    )
    Zn, tile_O, O = kernel(
        Y.T.astype(f32),
        Z_raw.astype(f32),
        codes_pad,
        (2.0 / sigma.astype(f32))[:, None],
        *extra_in,
    )
    # E = rowsums(R) Pr_b^T (src/harmony.cpp:226); rowsums fall out of the
    # covariate-0 block of O (every valid cell carries exactly one level)
    rsum = jnp.sum(O[:, : cfg.B_vec[0]], axis=1)
    E = rsum[:, None] * Pr_b.astype(f32)[None, :]
    return Zn, tile_O, O, E


# --------------------------------------------------------------------------
# Virtual R: the assignment matrix never reaches HBM during a run.
#
# A stats-carrying round's R is a pure function of (Y, the normalised
# layout Zn, the per-block penalty matrices pen, sigma) — everything else
# (E/O bookkeeping) only shaped pen. With the final round emitting pen
# (~nb*K*B floats) and its tile->block map, the M-step can recompute any
# tile's assignments in VMEM (bit-identically: _assign_tile is shared and
# per-column results don't depend on tile boundaries). So:
#   * every round runs write_r=False (no (K, N) HBM write at all);
#   * moments come fused from the final round (MomentsSpec);
#   * the correction kernel below recomputes R per tile and applies the
#     per-joint betas in one pass: Zn read + Z_orig read + Z_corr write;
#   * the user-facing R materialises ONCE per run (pallas_materialize_r)
#     from the persisted (Zn, pen, blk map, Y) of the last cluster phase.
# --------------------------------------------------------------------------


def _virtual_correction_kernel(
    tj_ref,  # (NT*msub,) layout tile -> joint id
    blkmap_ref,  # (NT,) physical tile -> schedule block
    # inputs
    Yt_ref,  # (K, d) centroids the final round used
    Zn_ref,  # (d, T) normalised layout tile s
    codes_ref,  # (ncov, T)
    pen_ref,  # (nb, K, B) per-block penalties (VMEM-resident)
    sigma_ref,  # (K, 1)
    inv2sig_ref,  # (K, 1)
    Wj_ref,  # (nj+1, dp, K) per-joint betas; trash row zero
    Zo_ref,  # (d, T) original embedding tile
    # outputs
    Zc_ref,  # (d, T) corrected embedding
    *,
    offsets: tuple,
    B: int,
    variant: str,
    msub: int,
    d: int,
):
    s = pl.program_id(0)
    blk = blkmap_ref[s]
    pen = pen_ref[pl.ds(blk, 1)][0]  # (K, B)
    R_n, _, _, _, _ = _assign_tile(
        Yt_ref[:], Zn_ref[:], codes_ref, pen, sigma_ref[:],
        inv2sig_ref[:], offsets=offsets, B=B, variant=variant,
    )
    Zo = Zo_ref[:]
    T = Zo.shape[1]
    Tl = T // msub
    for j in range(msub):
        sl = slice(j * Tl, (j + 1) * Tl)
        jid = tj_ref[s * msub + j]
        Wj = Wj_ref[pl.ds(jid, 1)][0]  # (dp, K)
        corr = jax.lax.dot_general(
            Wj, R_n[:, sl], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (dp, Tl)
        Zc_ref[:, sl] = Zo[:, sl] - corr[0:d, :]


def pallas_virtual_correction(
    cfg: HarmonyConfig,
    W_joint: jnp.ndarray,  # (n_joint + 1, d, K); trash row zeros
    tile_joint: jnp.ndarray,  # (Npt // tile,) int32 incl. trash tail
    layout_tile: int,
    Y: jnp.ndarray,  # (d, K) centroids the final round used
    sigma: jnp.ndarray,  # (K,)
    pen: jnp.ndarray,  # (nb, K, B)
    blk_of_phys: jnp.ndarray,  # (NT,)
    Zn_pad: jnp.ndarray,  # (d, Npt) the final phase's layout
    codes_pad: jnp.ndarray,  # (ncov, Npt)
    Z_orig_pad: jnp.ndarray,  # (d, Npt)
    interpret: bool = False,
) -> jnp.ndarray:
    """Z_corr = Z_orig - W^T Phi R (src/harmony.cpp:613-616) with R
    recomputed in VMEM from the final round's penalty table. Mixed/pad
    layout tiles hit the trash beta row (zero) and pass Z_orig through —
    the caller patches their correction (tiny tail) in XLA."""
    from functools import partial as _partial

    K, d, B = cfg.K, cfg.d, cfg.B
    T = cfg.estep_sub_tile
    f32 = jnp.float32
    Npt = Zn_pad.shape[1]
    NT = Npt // T
    msub = T // layout_tile
    nb = pen.shape[0]
    nj1 = W_joint.shape[0]
    dp = -(-d // 8) * 8
    Wp = W_joint.astype(f32)
    if dp != d:
        Wp = jnp.concatenate(
            [Wp, jnp.zeros((nj1, dp - d, K), f32)], axis=1
        )
    sig32 = sigma.astype(f32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(NT,),
        in_specs=[
            pl.BlockSpec((K, d), lambda s, tj, bm: (0, 0)),
            pl.BlockSpec((d, T), lambda s, tj, bm: (0, s)),
            pl.BlockSpec(
                (cfg.n_covariates, T), lambda s, tj, bm: (0, s)
            ),
            pl.BlockSpec((nb, K, B), lambda s, tj, bm: (0, 0, 0)),
            pl.BlockSpec((K, 1), lambda s, tj, bm: (0, 0)),
            pl.BlockSpec((K, 1), lambda s, tj, bm: (0, 0)),
            pl.BlockSpec((nj1, dp, K), lambda s, tj, bm: (0, 0, 0)),
            pl.BlockSpec((d, T), lambda s, tj, bm: (0, s)),
        ],
        out_specs=pl.BlockSpec((d, T), lambda s, tj, bm: (0, s)),
    )
    kernel = pl.pallas_call(
        _partial(
            _virtual_correction_kernel,
            offsets=tuple(cfg.covariate_offsets), B=B,
            variant=cfg.estep_variant,
            msub=msub, d=d,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((d, Npt), f32),
        interpret=interpret,
    )
    return kernel(
        tile_joint.astype(jnp.int32),
        blk_of_phys.astype(jnp.int32),
        Y.T.astype(f32),
        Zn_pad,
        codes_pad,
        pen.astype(f32),
        sig32[:, None],
        (2.0 / sig32)[:, None],
        Wp,
        Z_orig_pad.astype(f32),
    )


def sharded_virtual_correction(
    cfg: HarmonyConfig,
    mesh,
    W_joint: jnp.ndarray,  # (n_joint + 1, d, K); trash row zeros
    tile_joint: jnp.ndarray,  # (Npt // tile,) int32 incl. trash tail
    layout_tile: int,
    Y: jnp.ndarray,
    sigma: jnp.ndarray,
    pen: jnp.ndarray,  # (mesh.size * nb, K, B) global penalty tables
    blk_of_phys: jnp.ndarray,  # (NT,) GLOBAL block ids
    Zn_pad: jnp.ndarray,  # (d, Npt) cell-sharded
    codes_pad: jnp.ndarray,  # (ncov, Npt) cell-sharded
    Z_orig_pad: jnp.ndarray,  # (d, Npt) cell-sharded
    interpret: bool = False,
) -> jnp.ndarray:
    """Virtual-R correction on a cell-sharded mesh: each shard recomputes
    its own tiles' assignments from ITS penalty tables (the sharded final
    round's schedule is per-shard, so a shard's tiles only ever reference
    its own blocks) and applies the replicated betas — zero communication,
    Z_corr comes back cell-sharded."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from ..sharding import CELL_AXIS

    nb_loc = pen.shape[0] // mesh.size

    def fn(Wj, tj_loc, Y, sigma, pen_loc, bm_loc, Zn_loc, codes_loc,
           Zo_loc):
        bm_local = bm_loc - jax.lax.axis_index(CELL_AXIS) * nb_loc
        return pallas_virtual_correction(
            cfg, Wj, tj_loc, layout_tile, Y, sigma, pen_loc, bm_local,
            Zn_loc, codes_loc, Zo_loc, interpret=interpret,
        )

    return shard_map(
        fn,
        mesh=mesh,
        check_vma=False,
        in_specs=(
            P(), P(CELL_AXIS), P(), P(), P(CELL_AXIS), P(CELL_AXIS),
            P(None, CELL_AXIS), P(None, CELL_AXIS), P(None, CELL_AXIS),
        ),
        out_specs=P(None, CELL_AXIS),
    )(
        W_joint, tile_joint.astype(jnp.int32), Y, sigma, pen,
        blk_of_phys.astype(jnp.int32), Zn_pad, codes_pad, Z_orig_pad,
    )


def _materialize_r_kernel(
    blkmap_ref,  # (NT,)
    Yt_ref,  # (K, d)
    Zn_ref,  # (d, T)
    codes_ref,  # (ncov, T)
    pen_ref,  # (nb, K, B)
    sigma_ref,  # (K, 1)
    inv2sig_ref,  # (K, 1)
    R_ref,  # (K, T) out
    *,
    offsets: tuple,
    B: int,
    variant: str,
):
    s = pl.program_id(0)
    blk = blkmap_ref[s]
    pen = pen_ref[pl.ds(blk, 1)][0]
    R_n, _, _, _, _ = _assign_tile(
        Yt_ref[:], Zn_ref[:], codes_ref, pen, sigma_ref[:],
        inv2sig_ref[:], offsets=offsets, B=B, variant=variant,
    )
    # cast in-kernel: emitting the engine dtype directly avoids a full
    # (K, N) f32 intermediate + cast pass — at 10M cells bf16 that
    # intermediate alone is 4 GB and OOMs the run-end materialisation
    R_ref[:] = R_n.astype(R_ref.dtype)


def pallas_materialize_r(
    cfg: HarmonyConfig,
    Y: jnp.ndarray,  # (d, K) centroids the final round used
    sigma: jnp.ndarray,
    pen: jnp.ndarray,  # (nb, K, B)
    blk_of_phys: jnp.ndarray,  # (NT,)
    Zn_pad: jnp.ndarray,  # (d, Npt)
    codes_pad: jnp.ndarray,  # (ncov, Npt)
    interpret: bool = False,
    out_dtype=None,
) -> jnp.ndarray:
    """The (K, Np) assignment matrix of the last clustering round, exactly
    as the round would have written it — runs once per run when the user
    (or a checkpoint) needs R (getR parity, src/harmony.cpp:646-649).
    ``out_dtype`` (default f32) is cast per tile inside the kernel."""
    from functools import partial as _partial

    K, d, B = cfg.K, cfg.d, cfg.B
    T = cfg.estep_sub_tile
    f32 = jnp.float32
    Npt = Zn_pad.shape[1]
    NT = Npt // T
    nb = pen.shape[0]
    sig32 = sigma.astype(f32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(NT,),
        in_specs=[
            pl.BlockSpec((K, d), lambda s, bm: (0, 0)),
            pl.BlockSpec((d, T), lambda s, bm: (0, s)),
            pl.BlockSpec(
                (cfg.n_covariates, T), lambda s, bm: (0, s)
            ),
            pl.BlockSpec((nb, K, B), lambda s, bm: (0, 0, 0)),
            pl.BlockSpec((K, 1), lambda s, bm: (0, 0)),
            pl.BlockSpec((K, 1), lambda s, bm: (0, 0)),
        ],
        out_specs=pl.BlockSpec((K, T), lambda s, bm: (0, s)),
    )
    kernel = pl.pallas_call(
        _partial(
            _materialize_r_kernel,
            offsets=tuple(cfg.covariate_offsets), B=B,
            variant=cfg.estep_variant,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((K, Npt), out_dtype or f32),
        interpret=interpret,
    )
    R = kernel(
        blk_of_phys.astype(jnp.int32),
        Y.T.astype(f32),
        Zn_pad,
        codes_pad,
        pen.astype(f32),
        sig32[:, None],
        (2.0 / sig32)[:, None],
    )
    return R[:, : cfg.Np] if Npt != cfg.Np else R


def sharded_materialize_r(
    cfg: HarmonyConfig,
    mesh,
    Y: jnp.ndarray,
    sigma: jnp.ndarray,
    pen: jnp.ndarray,  # (mesh.size * nb, K, B)
    blk_of_phys: jnp.ndarray,  # (NT,) GLOBAL block ids
    Zn_pad: jnp.ndarray,  # (d, Npt) cell-sharded
    codes_pad: jnp.ndarray,  # (ncov, Npt) cell-sharded
    interpret: bool = False,
    out_dtype=None,
) -> jnp.ndarray:
    """Run-end R materialisation on a cell-sharded mesh (see
    sharded_virtual_correction for the per-shard penalty argument)."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from ..sharding import CELL_AXIS

    nb_loc = pen.shape[0] // mesh.size

    def fn(Y, sigma, pen_loc, bm_loc, Zn_loc, codes_loc):
        bm_local = bm_loc - jax.lax.axis_index(CELL_AXIS) * nb_loc
        return pallas_materialize_r(
            cfg, Y, sigma, pen_loc, bm_local, Zn_loc, codes_loc,
            interpret=interpret, out_dtype=out_dtype,
        )

    return shard_map(
        fn,
        mesh=mesh,
        check_vma=False,
        in_specs=(
            P(), P(), P(CELL_AXIS), P(CELL_AXIS),
            P(None, CELL_AXIS), P(None, CELL_AXIS),
        ),
        out_specs=P(None, CELL_AXIS),
    )(
        Y, sigma, pen, blk_of_phys.astype(jnp.int32), Zn_pad, codes_pad,
    )


def pallas_rotate_update_round(
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
    layout: TileLayout | None = None,
    interpret: bool = False,
) -> RoundResult:
    """Drop-in rotate round via the fused kernel (single-device layouts)."""
    K, Np = R.shape
    d = Z.shape[0]
    B = cfg.B
    T = cfg.estep_sub_tile
    f32 = jnp.float32
    NT = -(-Np // T)
    Npt = NT * T

    if layout is None:
        layout = make_tile_layout(cfg, Z, codes)
    scal, n_steps = _schedule(cfg, NT, key)

    R_p = R.astype(f32)
    if Npt != Np:
        # avoided in production: align_cells_pad rounds Np up to the tile
        R_p = jnp.concatenate(
            [R_p, jnp.zeros((K, Npt - Np), f32)], axis=1
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_steps,),
        in_specs=[
            pl.BlockSpec((K, d), lambda s, sc: (0, 0)),  # Y^T
            pl.BlockSpec((d, T), lambda s, sc: (0, sc[_TILE, s])),  # Z
            pl.BlockSpec((T, B), lambda s, sc: (sc[_TILE, s], 0)),  # oh
            pl.BlockSpec((K, T), lambda s, sc: (0, sc[_RIDX, s])),  # R old
            pl.BlockSpec((K, B), lambda s, sc: (0, 0)),  # E_in
            pl.BlockSpec((K, B), lambda s, sc: (0, 0)),  # O_in
            pl.BlockSpec((1, B), lambda s, sc: (0, 0)),  # Pr_b
            pl.BlockSpec((K, 1), lambda s, sc: (0, 0)),  # sigma
            pl.BlockSpec((1, B), lambda s, sc: (0, 0)),  # theta
        ],
        out_specs=[
            pl.BlockSpec((K, T), lambda s, sc: (0, sc[_WIDX, s])),  # R new
            pl.BlockSpec((K, B), lambda s, sc: (0, 0)),
            pl.BlockSpec((K, B), lambda s, sc: (0, 0)),
            pl.BlockSpec(
                (1, 2), lambda s, sc: (0, 0), memory_space=pltpu.SMEM
            ),
        ],
        scratch_shapes=[
            pltpu.VMEM((K, B), f32),  # E_s
            pltpu.VMEM((K, B), f32),  # O_s
            pltpu.VMEM((K, B), f32),  # pen_s
            pltpu.VMEM((K, 1), f32),  # rold
            pltpu.VMEM((K, B), f32),  # Oold
            pltpu.VMEM((K, 1), f32),  # rpend
            pltpu.VMEM((K, B), f32),  # Opend
            pltpu.SMEM((1, 2), f32),  # accv
        ],
    )
    kernel = pl.pallas_call(
        _round_kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((K, Npt), f32),
            jax.ShapeDtypeStruct((K, B), f32),
            jax.ShapeDtypeStruct((K, B), f32),
            jax.ShapeDtypeStruct((1, 2), f32),
        ],
        interpret=interpret,
    )
    R_new, E_out, O_out, acc = kernel(
        scal,
        Y.T.astype(f32),
        layout.Z_pad,
        layout.oh_pad,
        R_p,
        E.astype(f32),
        O.astype(f32),
        Pr_b.astype(f32)[None, :],
        sigma.astype(f32)[:, None],
        theta.astype(f32)[None, :],
    )
    return RoundResult(
        R=(R_new[:, :Np] if Npt != Np else R_new).astype(R.dtype),
        E=E_out.astype(E.dtype),
        O=O_out.astype(O.dtype),
        kmeans_error=acc[0, 0],
        entropy=acc[0, 1],
    )
