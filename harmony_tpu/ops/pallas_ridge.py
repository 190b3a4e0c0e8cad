"""Pallas TPU kernels for the M-step's two O(K·N·B·d) contractions.

XLA lowers the dense moment einsum ``kn,nb,dn->kbd`` as B masked matmuls —
at the canonical shape that reads the (K, N) assignment matrix ~B times
from HBM (measured ~2 GB of operand traffic for B=10). These kernels tile
the cell axis so each contraction streams R, Z and the design exactly
once; the per-batch work happens on tiles already resident in VMEM:

* :func:`pallas_moments` — M[b, k, e] = Σ_n R[k,n]·oh[n,b]·Z_aug[e,n]: per
  tile, the VMEM-resident R tile is masked by each one-hot column and
  multiplied against the Z_aug tile (Z is augmented with a ones row, so
  the O row and the intercept moments fall out of the same product — the
  fused moment trick of ops/ridge.py).
* :func:`pallas_correction` — corr[e, n] = Σ_k R[k,n]·W[k, code(n), e]:
  one (B·dp, K)x(K, T) matmul per tile against the VMEM-resident
  (sublane-aligned) stacked betas, a one-hot contraction over B on the
  VPU, and ``Z_orig - corr`` written directly.

Single-covariate path (the reference's dominant case; multi-covariate
designs use the XLA paths). Exactness of skipping the cell mask for one
covariate: a cell is dropped iff its (only) batch is dropped, so keep-
masking the per-batch moments equals cell-masking R, and dropped batches'
beta rows are exactly zero so unmasked cells receive no correction from
them (src/harmony.cpp:368-410 masking semantics).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import HarmonyConfig


def _sublane_pad(x: int) -> int:
    return -(-x // 8) * 8


def _moments_kernel(R_ref, Za_ref, oh_ref, M_ref, Macc_s):
    s = pl.program_id(0)
    NT = pl.num_programs(0)
    B = oh_ref.shape[1]

    @pl.when(s == 0)
    def _():
        Macc_s[:] = jnp.zeros_like(Macc_s)

    R_t = R_ref[:]  # (K, T)
    Za = Za_ref[:]  # (d1, T)
    for b in range(B):  # static unroll; tiles stay in VMEM
        Rb = R_t * oh_ref[:, b][None, :]
        # A·Bᵀ form: contract the cell (lane) dim of both operands, so Z
        # never needs a cell-major transpose.
        Macc_s[b] = Macc_s[b] + jax.lax.dot_general(
            Rb, Za, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(s == NT - 1)
    def _():
        M_ref[:] = Macc_s[:]


def pallas_moments(
    cfg: HarmonyConfig,
    R: jnp.ndarray,  # (K, Np)
    Z: jnp.ndarray,  # (d, Np) original embedding
    oh: jnp.ndarray,  # (Np, B) one-hot design (pad/invalid rows zero)
    interpret: bool = False,
) -> jnp.ndarray:
    """Return M (K, B, d+1): per-batch RHS blocks with the O row at [..., -1]."""
    K, Np = R.shape
    d = Z.shape[0]
    B = cfg.B
    T = min(cfg.estep_sub_tile, Np)
    NT = -(-Np // T)
    Npt = NT * T
    f32 = jnp.float32
    d1 = d + 1

    Za = jnp.concatenate(
        [Z.astype(f32), jnp.ones((1, Np), f32)], axis=0
    )  # (d1, Np), natural layout
    R_p = R.astype(f32)
    if Npt != Np:
        pad = Npt - Np
        R_p = jnp.concatenate([R_p, jnp.zeros((K, pad), f32)], axis=1)
        Za = jnp.concatenate([Za, jnp.zeros((d1, pad), f32)], axis=1)
        oh = jnp.concatenate([oh, jnp.zeros((pad, B), oh.dtype)], axis=0)

    M = pl.pallas_call(
        _moments_kernel,
        grid=(NT,),
        in_specs=[
            pl.BlockSpec((K, T), lambda s: (0, s)),
            pl.BlockSpec((d1, T), lambda s: (0, s)),
            pl.BlockSpec((T, B), lambda s: (s, 0)),
        ],
        out_specs=pl.BlockSpec((B, K, d1), lambda s: (0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, K, d1), f32),
        scratch_shapes=[pltpu.VMEM((B, K, d1), f32)],
        interpret=interpret,
    )(R_p, Za, oh.astype(f32))
    return jnp.swapaxes(M, 0, 1)  # (K, B, d1)


def _tile_moments_kernel(R_ref, Z_ref, S_ref, *, sub: int, T: int):
    # per-layout-tile unsegmented moments: S_t = [R_t Z_t^T | R_t 1]
    # (batch resolution is recovered OUTSIDE from the static tile->joint
    # table); `sub` layout tiles of width T are processed per grid step.
    # The ones component is a row-sum, not a matmul — Z needs no
    # augmented copy in HBM.
    d = Z_ref.shape[0]
    for j in range(sub):
        sl = slice(j * T, (j + 1) * T)
        R_t = R_ref[:, sl]
        S_ref[j, :, 0:d] = jax.lax.dot_general(
            R_t, Z_ref[:, sl],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        S_ref[j, :, d] = jnp.sum(R_t, axis=1)


def pallas_tile_moments(
    cfg: HarmonyConfig,
    R: jnp.ndarray,  # (K, Np)
    Z: jnp.ndarray,  # (d, Np) original embedding
    tile: int,
    interpret: bool = False,
    grid_tile: int | None = None,
) -> jnp.ndarray:
    """Per-layout-tile moment blocks S (NT, K, d+1): S[t] = R_t·[Z; 1]_t^T.

    One (K, T)x(T, d+1) matmul per layout tile — O(K·N·d) with no batch
    factor; HBM traffic is one read of R and Z plus a tiny (NT, K, d+1)
    write. The layout tile T is finer than the DMA-efficient grid tile, so
    each grid step handles ``grid_tile // T`` layout tiles from the same
    resident block. With a batch-tiled layout (ops/tiled.py) the per-batch
    moments of src/harmony.cpp:561 are segment-sums of S over the static
    tile->joint-batch table.
    """
    K, Np = R.shape
    d = Z.shape[0]
    T = tile
    Tg = grid_tile or max(T, min(2048, cfg.estep_sub_tile))
    Tg = max(T, (Tg // T) * T)
    sub = Tg // T
    NG = -(-Np // Tg)
    Npt = NG * Tg
    NT = Npt // T
    f32 = jnp.float32
    d1 = d + 1

    Zf = Z.astype(f32)
    R_p = R.astype(f32)
    if Npt != Np:
        pad = Npt - Np
        R_p = jnp.concatenate([R_p, jnp.zeros((K, pad), f32)], axis=1)
        Zf = jnp.concatenate([Zf, jnp.zeros((d, pad), f32)], axis=1)

    from functools import partial as _partial

    return pl.pallas_call(
        _partial(_tile_moments_kernel, sub=sub, T=T),
        grid=(NG,),
        in_specs=[
            pl.BlockSpec((K, Tg), lambda s: (0, s)),
            pl.BlockSpec((d, Tg), lambda s: (0, s)),
        ],
        out_specs=pl.BlockSpec((sub, K, d1), lambda s: (s, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((NT, K, d1), f32),
        interpret=interpret,
    )(R_p, Zf)


def _tiled_correction_kernel(Wt_ref, R_ref, Z_ref, Z_out_ref, *, sub, T):
    # Wt_ref: (sub, dp, K) betas of this grid step's layout tiles (zero
    # rows for mixed/pad tiles — their correction is applied outside)
    d = Z_ref.shape[0]
    for j in range(sub):
        sl = slice(j * T, (j + 1) * T)
        corr = jax.lax.dot_general(
            Wt_ref[j], R_ref[:, sl],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (dp, T)
        Z_out_ref[:, sl] = Z_ref[:, sl] - corr[0:d, :]


def pallas_tiled_correction(
    cfg: HarmonyConfig,
    W_tiles: jnp.ndarray,  # (NT, d, K) betas per layout tile (zeros: no-op)
    R: jnp.ndarray,  # (K, Np)
    Z: jnp.ndarray,  # (d, Np) original embedding
    tile: int,
    interpret: bool = False,
    grid_tile: int | None = None,
) -> jnp.ndarray:
    """Z - W[tile]·R per batch-pure layout tile (src/harmony.cpp:613-616).

    One (d, K)x(K, T) matmul per layout tile against that tile's beta
    block (pre-gathered per tile — a few MB). Zero rows in ``W_tiles``
    (mixed/pad tiles) leave Z unchanged; the mixed-region correction is
    added outside.
    """
    K, Np = R.shape
    d = Z.shape[0]
    T = tile
    Tg = grid_tile or max(T, min(2048, cfg.estep_sub_tile))
    Tg = max(T, (Tg // T) * T)
    sub = Tg // T
    NG = -(-Np // Tg)
    Npt = NG * Tg
    NT = Npt // T
    f32 = jnp.float32
    dp = _sublane_pad(d)

    Wp = W_tiles.astype(f32)
    if Wp.shape[0] != NT:
        Wp = jnp.concatenate(
            [Wp, jnp.zeros((NT - Wp.shape[0],) + Wp.shape[1:], f32)], axis=0
        )
    if dp != d:
        Wp = jnp.concatenate(
            [Wp, jnp.zeros((NT, dp - d, K), f32)], axis=1
        )
    R_p = R.astype(f32)
    Zf = Z.astype(f32)
    if Npt != Np:
        pad = Npt - Np
        R_p = jnp.concatenate([R_p, jnp.zeros((K, pad), f32)], axis=1)
        Zf = jnp.concatenate([Zf, jnp.zeros((d, pad), f32)], axis=1)

    from functools import partial as _partial

    Z_out = pl.pallas_call(
        _partial(_tiled_correction_kernel, sub=sub, T=T),
        grid=(NG,),
        in_specs=[
            pl.BlockSpec((sub, dp, K), lambda s: (s, 0, 0)),
            pl.BlockSpec((K, Tg), lambda s: (0, s)),
            pl.BlockSpec((d, Tg), lambda s: (0, s)),
        ],
        out_specs=pl.BlockSpec((d, Tg), lambda s: (0, s)),
        out_shape=jax.ShapeDtypeStruct((d, Npt), f32),
        interpret=interpret,
    )(Wp, R_p, Zf)
    return Z_out[:, :Np] if Npt != Np else Z_out


def _correction_kernel(Wt_ref, R_ref, Z_ref, oh_ref, Z_out_ref, acc_s):
    B = oh_ref.shape[1]
    d = Z_ref.shape[0]
    dp = Wt_ref.shape[0] // B
    # (B*dp, T): all batches' corrections at once; W stays VMEM-resident.
    tw = jnp.dot(Wt_ref[:], R_ref[:], preferred_element_type=jnp.float32)
    acc_s[:] = tw[0:dp, :] * oh_ref[:, 0][None, :]
    for b in range(1, B):  # static unroll, sublane-aligned slices
        acc_s[:] = acc_s[:] + tw[b * dp : (b + 1) * dp, :] * oh_ref[:, b][None, :]
    Z_out_ref[:] = Z_ref[:] - acc_s[0:d, :]


def pallas_correction(
    cfg: HarmonyConfig,
    W: jnp.ndarray,  # (K, B, d) batch betas (intercept row excluded/zeroed)
    R: jnp.ndarray,  # (K, Np)
    Z: jnp.ndarray,  # (d, Np) original embedding
    oh: jnp.ndarray,  # (Np, B)
    interpret: bool = False,
) -> jnp.ndarray:
    """Return Z_corr = Z - Σ_k R[k]·W[k, code(·)] (src/harmony.cpp:613-616)."""
    K, Np = R.shape
    d = Z.shape[0]
    B = cfg.B
    T = min(cfg.estep_sub_tile, Np)
    NT = -(-Np // T)
    Npt = NT * T
    f32 = jnp.float32
    dp = _sublane_pad(d)

    # (B*dp, K) stacked betas, rows b*dp+e = W[:, b, e] (sublane-aligned)
    Wt = jnp.transpose(W.astype(f32), (1, 2, 0))  # (B, d, K)
    if dp != d:
        Wt = jnp.concatenate(
            [Wt, jnp.zeros((B, dp - d, K), f32)], axis=1
        )
    Wt = Wt.reshape(B * dp, K)
    R_p = R.astype(f32)
    Zf = Z.astype(f32)
    if Npt != Np:
        pad = Npt - Np
        R_p = jnp.concatenate([R_p, jnp.zeros((K, pad), f32)], axis=1)
        Zf = jnp.concatenate([Zf, jnp.zeros((d, pad), f32)], axis=1)
        oh = jnp.concatenate([oh, jnp.zeros((pad, B), oh.dtype)], axis=0)

    Z_out = pl.pallas_call(
        _correction_kernel,
        grid=(NT,),
        in_specs=[
            pl.BlockSpec((B * dp, K), lambda s: (0, 0)),
            pl.BlockSpec((K, T), lambda s: (0, s)),
            pl.BlockSpec((d, T), lambda s: (0, s)),
            pl.BlockSpec((T, B), lambda s: (s, 0)),
        ],
        out_specs=pl.BlockSpec((d, T), lambda s: (0, s)),
        out_shape=jax.ShapeDtypeStruct((d, Npt), f32),
        scratch_shapes=[pltpu.VMEM((dp, T), f32)],
        interpret=interpret,
    )(Wt, R_p, Zf, oh.astype(f32))
    return Z_out[:, :Np] if Npt != Np else Z_out
