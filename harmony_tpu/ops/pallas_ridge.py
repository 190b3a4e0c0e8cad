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


def _tile_moments_kernel(
    tj_ref, R_ref, Z_ref, M_ref, Macc_s, *, sub: int, T: int
):
    # per-layout-tile unsegmented moments S_t = [R_t Z_t^T | R_t 1],
    # accumulated in VMEM directly into the tile's joint-batch slot (the
    # static tile->joint table rides scalar prefetch, so per-batch moments
    # never round-trip HBM; mixed/pad tiles land in the trailing trash
    # slot). The ones component is a row-sum, not a matmul — Z needs no
    # augmented copy in HBM.
    s = pl.program_id(0)
    NG = pl.num_programs(0)
    d = Z_ref.shape[0]

    @pl.when(s == 0)
    def _():
        Macc_s[...] = jnp.zeros_like(Macc_s)

    for j in range(sub):
        sl = slice(j * T, (j + 1) * T)
        R_t = R_ref[:, sl]
        S = jax.lax.dot_general(
            R_t, Z_ref[:, sl],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (K, d)
        S = jnp.concatenate([S, jnp.sum(R_t, axis=1)[:, None]], axis=1)
        jid = tj_ref[s * sub + j]
        Macc_s[pl.ds(jid, 1)] = Macc_s[pl.ds(jid, 1)] + S[None]

    @pl.when(s == NG - 1)
    def _():
        M_ref[...] = Macc_s[...]


def pallas_tile_moments(
    cfg: HarmonyConfig,
    R: jnp.ndarray,  # (K, Np)
    Z: jnp.ndarray,  # (d, Np) original embedding
    tile: int,
    tile_joint: jnp.ndarray,  # (NT_pure,) int32 joint id per pure tile
    n_joint: int,
    interpret: bool = False,
    grid_tile: int | None = None,
) -> jnp.ndarray:
    """Joint-batch moments M (n_joint + 1, K, d+1) in one streaming pass.

    M[j] = Σ_{tiles of joint j} R_t·[Z; 1]_t^T — one (K, T)x(T, d+1)
    matmul per batch-pure layout tile, O(K·N·d) with no batch factor,
    accumulated in VMEM by the static tile->joint table (scalar
    prefetch). HBM traffic is exactly one read of R and Z plus the tiny
    (n_joint+1, K, d+1) result; the trailing row collects mixed/pad
    tiles and is discarded by the caller (their cells go through the
    dense path). Replaces both the per-tile HBM table — O(N/T · K · d),
    hundreds of MB at 5M cells — and the XLA segment-sum over it.
    """
    K, Np = R.shape
    d = Z.shape[0]
    T = tile
    Tg = grid_tile or max(T, min(4096, cfg.estep_sub_tile))
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

    NT_pure = tile_joint.shape[0]
    tj = jnp.concatenate(
        [
            tile_joint.astype(jnp.int32),
            jnp.full((NT - NT_pure,), n_joint, jnp.int32),
        ]
    )

    from functools import partial as _partial

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(NG,),
        in_specs=[
            pl.BlockSpec((K, Tg), lambda s, tj: (0, s)),
            pl.BlockSpec((d, Tg), lambda s, tj: (0, s)),
        ],
        out_specs=pl.BlockSpec(
            (n_joint + 1, K, d1), lambda s, tj: (0, 0, 0)
        ),
        scratch_shapes=[pltpu.VMEM((n_joint + 1, K, d1), f32)],
    )
    return pl.pallas_call(
        _partial(_tile_moments_kernel, sub=sub, T=T),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_joint + 1, K, d1), f32),
        interpret=interpret,
    )(tj, R_p, Zf)


def sharded_tile_moments(
    cfg: HarmonyConfig,
    mesh,
    R: jnp.ndarray,  # (K, Np) cell-sharded
    Z: jnp.ndarray,  # (d, Np) cell-sharded
    tile: int,
    tile_joint_full: jnp.ndarray,  # (Np // tile,) int32 joint id per layout
    #   tile over the FULL padded axis (mixed/pad tiles -> n_joint slot)
    n_joint: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """Joint-batch moments on a cell-sharded mesh: per-shard streaming
    kernels + ONE psum of the tiny (n_joint+1, K, d+1) table — the M-step
    communication set of SURVEY.md §2.3 (normal-equation partials are cell
    sums, src/harmony.cpp:561-616). Layout tiles are shard-local (the
    batch-tiled ingest order is built on the global axis and shard
    boundaries fall on grid-tile boundaries), so each shard contracts its
    own tiles against its slice of the tile->joint table."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from ..sharding import CELL_AXIS

    def fn(R_loc, Z_loc, tj_loc):
        # pallas_tile_moments takes any tile->joint prefix (entries may
        # already be the trash slot n_joint); the local slice is the full
        # local grid, so no implicit-trash suffix is appended
        M = pallas_tile_moments(
            cfg, R_loc, Z_loc, tile, tj_loc, n_joint, interpret=interpret
        )
        return jax.lax.psum(M, CELL_AXIS)

    return shard_map(
        fn,
        mesh=mesh,
        check_vma=False,
        in_specs=(P(None, CELL_AXIS), P(None, CELL_AXIS), P(CELL_AXIS)),
        out_specs=P(),
    )(R, Z, tile_joint_full.astype(jnp.int32))


def _tiled_correction_kernel(
    tj_ref, Wj_ref, R_ref, Z_ref, Z_out_ref, *, sub, T
):
    # Wj_ref: (n_joint + 1, dp, K) per-joint betas, whole table VMEM
    # resident (a few hundred KB); each layout tile fetches its row by the
    # prefetched tile->joint table. The trailing zero row makes mixed/pad
    # tiles a no-op (their correction is applied outside).
    s = pl.program_id(0)
    d = Z_ref.shape[0]
    for j in range(sub):
        sl = slice(j * T, (j + 1) * T)
        jid = tj_ref[s * sub + j]
        Wj = Wj_ref[pl.ds(jid, 1)][0]  # (dp, K)
        corr = jax.lax.dot_general(
            Wj, R_ref[:, sl],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (dp, T)
        Z_out_ref[:, sl] = Z_ref[:, sl] - corr[0:d, :]


def pallas_tiled_correction(
    cfg: HarmonyConfig,
    W_joint: jnp.ndarray,  # (n_joint + 1, d, K) betas; last row zeros
    tile_joint: jnp.ndarray,  # (NT_pure,) int32 joint id per pure tile
    R: jnp.ndarray,  # (K, Np)
    Z: jnp.ndarray,  # (d, Np) original embedding
    tile: int,
    interpret: bool = False,
    grid_tile: int | None = None,
) -> jnp.ndarray:
    """Z - W[joint(tile)]·R per batch-pure layout tile
    (src/harmony.cpp:613-616). One (d, K)x(K, T) matmul per tile; the
    joint beta table stays VMEM-resident and rows are fetched via the
    prefetched tile->joint map, so HBM traffic is one read of R and Z and
    one write of Z_corr. Mixed/pad tiles hit the trailing zero row and
    pass Z through (their correction is added outside)."""
    K, Np = R.shape
    d = Z.shape[0]
    T = tile
    Tg = grid_tile or max(T, min(4096, cfg.estep_sub_tile))
    Tg = max(T, (Tg // T) * T)
    sub = Tg // T
    NG = -(-Np // Tg)
    Npt = NG * Tg
    NT = Npt // T
    f32 = jnp.float32
    dp = _sublane_pad(d)

    nj1 = W_joint.shape[0]
    Wp = W_joint.astype(f32)
    if dp != d:
        Wp = jnp.concatenate(
            [Wp, jnp.zeros((nj1, dp - d, K), f32)], axis=1
        )
    R_p = R.astype(f32)
    Zf = Z.astype(f32)
    if Npt != Np:
        pad = Npt - Np
        R_p = jnp.concatenate([R_p, jnp.zeros((K, pad), f32)], axis=1)
        Zf = jnp.concatenate([Zf, jnp.zeros((d, pad), f32)], axis=1)

    NT_pure = tile_joint.shape[0]
    tj = jnp.concatenate(
        [
            tile_joint.astype(jnp.int32),
            jnp.full((NT - NT_pure,), nj1 - 1, jnp.int32),
        ]
    )

    from functools import partial as _partial

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(NG,),
        in_specs=[
            pl.BlockSpec((nj1, dp, K), lambda s, tj: (0, 0, 0)),
            pl.BlockSpec((K, Tg), lambda s, tj: (0, s)),
            pl.BlockSpec((d, Tg), lambda s, tj: (0, s)),
        ],
        out_specs=pl.BlockSpec((d, Tg), lambda s, tj: (0, s)),
    )
    Z_out = pl.pallas_call(
        _partial(_tiled_correction_kernel, sub=sub, T=T),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((d, Npt), f32),
        interpret=interpret,
    )(tj, Wp, R_p, Zf)
    return Z_out[:, :Np] if Npt != Np else Z_out


def sharded_tiled_correction(
    cfg: HarmonyConfig,
    mesh,
    W_joint: jnp.ndarray,  # (n_joint + 1, d, K) betas; last row zeros
    tile_joint_full: jnp.ndarray,  # (Np // tile,) incl. trash entries
    R: jnp.ndarray,  # (K, Np) cell-sharded
    Z: jnp.ndarray,  # (d, Np) cell-sharded
    tile: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """Batch-tiled correction on a cell-sharded mesh: betas are replicated
    (K x (B+1) x d, tiny), tiles are shard-local, Z_corr comes back
    cell-sharded — zero communication (src/harmony.cpp:613-616 is a
    per-cell update)."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from ..sharding import CELL_AXIS

    def fn(Wj, tj_loc, R_loc, Z_loc):
        return pallas_tiled_correction(
            cfg, Wj, tj_loc, R_loc, Z_loc, tile, interpret=interpret
        )

    return shard_map(
        fn,
        mesh=mesh,
        check_vma=False,
        in_specs=(
            P(), P(CELL_AXIS), P(None, CELL_AXIS), P(None, CELL_AXIS),
        ),
        out_specs=P(None, CELL_AXIS),
    )(
        W_joint, tile_joint_full.astype(jnp.int32), R, Z,
    )


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
