"""Mixture-of-experts ridge correction (M-step), batched over clusters.

TPU-native re-design of ``moe_correct_ridge_cpp`` (src/harmony.cpp:345-638).
The reference loops over clusters, and for each cluster *subsets* cells and
batches whose per-cluster representation falls below ``batch_prop_cutoff``
(src/harmony.cpp:358-410), rebuilding a compacted sparse design
(src/harmony.cpp:440-547). Data-dependent shapes do not compile on TPU, so
subsetting becomes *masking* with an exactness argument:

* dropped cells get ``R_eff = 0`` -> they contribute nothing to any moment;
* dropped batches get their design row zeroed and an identity row in the
  normal matrix (1 on the diagonal, 0 RHS) -> their beta rows are exactly 0,
  so they neither receive nor induce any correction;
* fully-skipped clusters (no covariate with >= 2 surviving levels,
  src/harmony.cpp:449-452) get an all-false cell mask -> W == 0 and the old
  centroid column is retained.

With this, the whole M-step is one batched computation over K on the MXU:
normal matrices G (K, B+1, B+1) from segment moments of R, a batched
Cholesky solve (replacing both ``arma::inv`` and the single-covariate
arrowhead closed form, src/harmony.cpp:572-586 — the arrowhead is kept as an
optional solver), the centroid refresh from the intercept betas
(src/harmony.cpp:610-611), and a rank-(B+1) correction of Z
(src/harmony.cpp:613-616).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..config import HarmonyConfig
from .normalize import l2_normalize_columns


def _covariate_of_batch(cfg: HarmonyConfig) -> jnp.ndarray:
    """(B,) covariate id of each global batch row (src/harmony.cpp:96-97)."""
    ids = []
    for c, b in enumerate(cfg.B_vec):
        ids.extend([c] * b)
    return jnp.asarray(ids, dtype=jnp.int32)


def compute_masks(
    cfg: HarmonyConfig,
    O: jnp.ndarray,  # (K, B)
    batch_sizes: jnp.ndarray,  # (B,)
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batch-filter masks: (keep (K, B) bool, any_active (K,) bool).

    keep[k, b] iff avg responsibility O[k,b]/N_b exceeds the cutoff AND
    batch b's covariate retains >= 2 qualifying levels
    (src/harmony.cpp:368-410). any_active[k] iff any covariate retains >= 2
    levels (else the cluster is skipped, src/harmony.cpp:449-452).
    """
    avg_R = O / batch_sizes[None, :]
    present = avg_R > cfg.batch_prop_cutoff  # (K, B)
    cov_of_b = _covariate_of_batch(cfg)
    # levels per covariate passing the cutoff
    cov_levels = jax.ops.segment_sum(
        present.astype(jnp.int32).T, cov_of_b, num_segments=cfg.n_covariates
    ).T  # (K, ncov)
    cov_active = cov_levels > 1
    keep = present & jnp.take(cov_active, cov_of_b, axis=1)
    any_active = jnp.any(cov_active, axis=1)
    return keep, any_active


def moe_correct_ridge(
    cfg: HarmonyConfig,
    Z_orig: jnp.ndarray,  # (d, N)
    R: jnp.ndarray,  # (K, N)
    O: jnp.ndarray,  # (K, B)
    E: jnp.ndarray,  # (K, B)
    codes: jnp.ndarray,  # (ncov, N) local level codes
    batch_sizes: jnp.ndarray,  # (B,)
    lamb: jnp.ndarray,  # (B+1,) fixed ridge diag (ignored when estimating)
    Y_old: jnp.ndarray,  # (d, K) previous centroids
    segments=None,  # tuple[CovariateSegments] -> tiled O(K N d) moment path
    onehots=None,  # precomputed per-covariate (N, B_c) one-hot designs
    tiled=None,  # ops.tiled.TiledCells -> batch-tiled O(K N d) moment path
    tiled_moments=None,  # (n_joint+1, K, d+1) table fused into the E-step
    virtual=None,  # pallas_rotate.VirtualR -> R never read; recomputed
    mesh=None,  # cells mesh -> tiled Pallas kernels run per shard
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Return (Z_corr, Y_new, W) — W is (K, B+1, d) with intercept rows zeroed.

    ``Z_corr`` is always recomputed fresh from ``Z_orig``
    (src/harmony.cpp:347): correction is never incremental.

    With ``segments`` (see :mod:`harmony_tpu.ops.segments`) the moments and
    the correction use batch-pure tile matmuls at O(K·N·d) cost; without,
    a dense one-hot path serves small problems and doubles as the test
    reference for the segmented path.
    """
    offsets = cfg.covariate_offsets
    K, B, d = cfg.K, cfg.B, cfg.d
    f32 = jnp.float32

    keep, any_active = compute_masks(cfg, O, batch_sizes)
    keepf = keep.astype(f32)

    use_pallas = (
        cfg.mstep_impl == "pallas"
        and cfg.n_covariates == 1
        and segments is None
        and mesh is None
    )

    Zf = Z_orig.astype(f32)

    if use_pallas:
        # Single covariate: the cell mask is redundant — a cell is dropped
        # iff its (only) batch is, so keep-masking the per-batch moments
        # below IS the cell mask, and dropped batches' beta rows come out
        # exactly zero so no cell receives a correction from them.
        from .pallas_ridge import pallas_correction, pallas_moments

        interp = jax.default_backend() == "cpu"
        oh_full = jax.nn.one_hot(codes[0], B, dtype=f32)  # (Np, B)
        M = pallas_moments(cfg, R, Zf, oh_full, interpret=interp)
        O_eff = M[:, :, -1] * keepf
        rhs_batches = M[:, :, :-1] * keepf[:, :, None]
        # post-mask intercept moments == pre-mask moments of cell-masked R
        r_tot = jnp.sum(O_eff, axis=1)
        rhs0 = jnp.sum(rhs_batches, axis=1)
        cross_blocks, ctx, R_eff = {}, None, None
    elif cfg.n_covariates == 1 or tiled is not None:
        # Contract raw R and keep-mask the moments — no (K, N) cell-mask
        # gather (nor the lax.cond around it, whose identity branch still
        # costs a full copy of R per call). Exactness:
        #
        # * single covariate: a cell is dropped iff its (only) batch is,
        #   so keep-masking the per-batch moments IS the cell mask;
        # * multiple covariates (batch-tiled layouts): a cell is kept iff
        #   ANY of its batches is kept (src/harmony.cpp:389-402), and all
        #   cells of a kept batch are kept — so kept batches' blocks equal
        #   their raw-R values and dropped batches zero out, exactly as
        #   keep-masking does. Only the INTERCEPT moments see the union
        #   cell mask, and the mask is constant within a joint batch
        #   level, so they reduce from the per-joint moment table below.
        #
        # Virtual R: the state's R is stale by contract; the moments came
        # fused from the E-step's final round, and the trailing mixed
        # region's assignments are recomputed from the penalty table.
        R_eff = None if virtual is not None else R.astype(f32)
        if virtual is not None:
            tail_R = _virtual_tail_r(cfg, virtual, tiled.n_pure)
            O_all, rhs_all, cross_blocks, ctx = _moments_tiled(
                cfg, R_eff, Zf, codes, tiled, precomputed=tiled_moments,
                tail_R=tail_R, mesh=mesh,
            )
        elif tiled is not None:
            O_all, rhs_all, cross_blocks, ctx = _moments_tiled(
                cfg, R_eff, Zf, codes, tiled, precomputed=tiled_moments,
                mesh=mesh,
            )
        elif segments is None:
            O_all, rhs_all, cross_blocks, ctx = _moments_dense(
                cfg, R_eff, Zf, codes, onehots
            )
        else:
            O_all, rhs_all, cross_blocks, ctx = _moments_segmented(
                cfg, R_eff, Zf, codes, segments
            )
        O_eff = O_all * keepf
        rhs_batches = rhs_all * keepf[:, :, None]
        if cfg.n_covariates == 1:
            # intercept moments over kept cells = sum of keep-masked blocks
            r_tot = jnp.sum(O_eff, axis=1)
            rhs0 = jnp.sum(rhs_batches, axis=1)
        else:
            # union cell mask at joint-level granularity: joint level j is
            # kept for cluster k iff any covariate's batch at j is kept
            seg_tbl = ctx[2]  # (n_joint, K, d+1) raw per-joint moments
            mask_j = None
            for c, off in enumerate(offsets):
                kc = jnp.take(
                    keep[:, off : off + cfg.B_vec[c]],
                    jnp.asarray(tiled.joint_codes[c]), axis=1,
                )  # (K, n_joint)
                mask_j = kc if mask_j is None else (mask_j | kc)
            maskf_j = mask_j.astype(f32)
            r_tot = jnp.einsum(
                "jk,kj->k", seg_tbl[:, :, -1], maskf_j,
                preferred_element_type=f32,
            )
            rhs0 = jnp.einsum(
                "jkd,kj->kd", seg_tbl[:, :, :-1], maskf_j,
                preferred_element_type=f32,
            )
            n_pure = tiled.n_pure
            if cfg.Np - n_pure:
                # trailing mixed region: per-cell union mask on the raw
                # (or virtual-recomputed) tail assignments
                R_t_raw = ctx[0]
                mask_t = None
                for c, off in enumerate(offsets):
                    kc = jnp.take(
                        keep[:, off : off + cfg.B_vec[c]],
                        codes[c][n_pure:], axis=1,
                    )
                    mask_t = kc if mask_t is None else (mask_t | kc)
                R_tm = R_t_raw * mask_t.astype(f32)
                r_tot = r_tot + jnp.sum(R_tm, axis=1)
                rhs0 = rhs0 + jnp.einsum(
                    "kn,dn->kd", R_tm, Zf[:, n_pure:],
                    preferred_element_type=f32,
                )
    else:
        # Cell mask: kept iff ANY of the cell's batches is kept (union over
        # covariates of the kept batches' cell sets, src/harmony.cpp:389-402).
        # Fast path: when no batch is dropped anywhere (the common case with
        # the 1e-5 default cutoff) the mask is all-true and the K x N gather +
        # multiply is skipped at runtime via a real branch.
        def _masked(R):
            cell_mask = None
            for c, off in enumerate(offsets):
                kc = jnp.take(
                    keep[:, off : off + cfg.B_vec[c]], codes[c], axis=1
                )
                cell_mask = kc if cell_mask is None else (cell_mask | kc)
            return R.astype(f32) * cell_mask.astype(f32)

        R_eff = jax.lax.cond(
            jnp.all(keep),
            lambda R: R.astype(f32),
            _masked,
            R,
        )  # (K, N)

        if tiled is not None:
            O_eff, rhs_batches, cross_blocks, ctx = _moments_tiled(
                cfg, R_eff, Zf, codes, tiled, mesh=mesh
            )
        elif segments is None:
            O_eff, rhs_batches, cross_blocks, ctx = _moments_dense(
                cfg, R_eff, Zf, codes, onehots
            )
        else:
            O_eff, rhs_batches, cross_blocks, ctx = _moments_segmented(
                cfg, R_eff, Zf, codes, segments
            )
        # Intercept moments: every cell carries exactly one covariate-0
        # level, so the level-sum of the (pre-mask) covariate-0 blocks is
        # the cell sum (Phi_Rk's intercept row, src/harmony.cpp:561).
        b0 = cfg.B_vec[0]
        r_tot = jnp.sum(O_eff[:, :b0], axis=1)  # (K,)
        rhs0 = jnp.sum(rhs_batches[:, :b0, :], axis=1)  # (K, d)
        O_eff = O_eff * keepf
        rhs_batches = rhs_batches * keepf[:, :, None]

    # ---- Normal matrices G (K, B+1, B+1) ---------------------------------
    G = jnp.zeros((K, B + 1, B + 1), dtype=f32)
    G = G.at[:, 0, 0].set(r_tot)
    G = G.at[:, 0, 1:].set(O_eff)
    G = G.at[:, 1:, 0].set(O_eff)
    diag_idx = jnp.arange(1, B + 1)
    G = G.at[:, diag_idx, diag_idx].set(O_eff)
    # Cross-covariate co-occurrence blocks (the reference's Phi_Rk Phi^T has
    # these implicitly through the stacked sparse design).
    for (c1, c2), cross in cross_blocks.items():
        b1, b2 = cfg.B_vec[c1], cfg.B_vec[c2]
        o1, o2 = offsets[c1], offsets[c2]
        cross = (
            cross
            * keepf[:, o1 : o1 + b1][:, :, None]
            * keepf[:, o2 : o2 + b2][:, None, :]
        )
        G = G.at[:, 1 + o1 : 1 + o1 + b1, 1 + o2 : 1 + o2 + b2].set(cross)
        G = G.at[:, 1 + o2 : 1 + o2 + b2, 1 + o1 : 1 + o1 + b1].set(
            jnp.swapaxes(cross, 1, 2)
        )

    # ---- Ridge diagonal (lambda) -----------------------------------------
    if cfg.lambda_estimation:
        # lambda = alpha * E[k, b] per kept batch (find_lambda_cpp,
        # src/utils.cpp:159-163; selection at src/harmony.cpp:434-438,532-544)
        lam_b = cfg.alpha * E.astype(f32)  # (K, B)
    else:
        lam_b = jnp.broadcast_to(lamb[1:].astype(f32), (K, B))
    # Kept batches add lambda to their (zeroless) diagonal moment; dropped
    # batches have a zero diagonal (O_eff is keep-masked) and get the
    # identity row instead.
    G = G.at[:, diag_idx, diag_idx].add(jnp.where(keep, lam_b, 1.0))
    # Degenerate (skipped) clusters: identity intercept too.
    G = G.at[:, 0, 0].add(jnp.where(any_active, 0.0, 1.0))

    # ---- RHS (K, B+1, d): Phi_moe diag(R_eff) Z^T ------------------------
    rhs = jnp.concatenate([rhs0[:, None, :], rhs_batches], axis=1)

    # ---- Solve ------------------------------------------------------------
    W = _solve_ridge(cfg, G, rhs)  # (K, B+1, d)

    # Centroid refresh from intercept betas (src/harmony.cpp:610-611);
    # skipped clusters keep their previous centroid (the reference's
    # ``continue`` path never touches Y.col(k)).
    Y_new = jnp.where(
        any_active[None, :], W[:, 0, :].T.astype(Y_old.dtype), Y_old
    )
    Y_new = l2_normalize_columns(Y_new)
    W = W.at[:, 0, :].set(0.0)

    # ---- Correction: Z_corr = Z_orig - sum_k W_k^T Phi_Rk ----------------
    # Per cell n: correction = sum_k R_eff[k,n] * sum_c W[k, 1+code_c(n), :]
    if virtual is not None:
        Z_corr = _correction_virtual(
            cfg, W, ctx, tiled, virtual, mesh=mesh
        ).astype(Z_orig.dtype)
        return Z_corr, Y_new, W
    if use_pallas:
        Z_corr = pallas_correction(
            cfg, W[:, 1:, :], R, Zf, oh_full, interpret=interp
        ).astype(Z_orig.dtype)
        return Z_corr, Y_new, W
    if tiled is not None:
        Z_corr = _correction_tiled(
            cfg, W, R_eff, Zf, ctx, tiled, mesh=mesh
        ).astype(Z_orig.dtype)
        return Z_corr, Y_new, W
    if segments is None:
        corr = _correction_dense(cfg, W, R_eff, ctx)
    else:
        corr = _correction_segmented(cfg, W, ctx, segments)
    Z_corr = (Zf - corr).astype(Z_orig.dtype)
    return Z_corr, Y_new, W


def _moments_dense(cfg, R_eff, Zf, codes, onehots=None):
    """One-hot contractions: O(K·N·B·d). Small-N path + test reference.

    Z is augmented with a ones row so each covariate's single contraction
    yields both its RHS block and its O row (the ones component); the
    intercept moments fall out as the level-sum of covariate 0's blocks —
    one pass over R per covariate instead of three. ``onehots`` optionally
    supplies the designs precomputed once per engine (they are fixed for
    the whole run).
    """
    f32 = jnp.float32
    K = cfg.K
    if onehots is None:
        onehots = [
            jax.nn.one_hot(codes[c], cfg.B_vec[c], dtype=f32)  # (N, B_c)
            for c in range(cfg.n_covariates)
        ]
    Z_aug = jnp.concatenate(
        [Zf, jnp.ones((1, Zf.shape[1]), f32)], axis=0
    )  # (d+1, N)
    moments = [
        jnp.einsum(
            "kn,nb,dn->kbd", R_eff, oh, Z_aug, preferred_element_type=f32
        )
        for oh in onehots
    ]
    O_eff = jnp.concatenate([M[:, :, -1] for M in moments], axis=1)
    rhs_batches = jnp.concatenate([M[:, :, :-1] for M in moments], axis=1)
    cross_blocks = {}
    for c1 in range(cfg.n_covariates):
        for c2 in range(c1 + 1, cfg.n_covariates):
            b1, b2 = cfg.B_vec[c1], cfg.B_vec[c2]
            joint = codes[c1] * b2 + codes[c2]  # (N,)
            ohj = jax.nn.one_hot(joint, b1 * b2, dtype=f32)
            cross_blocks[(c1, c2)] = jnp.dot(
                R_eff, ohj, preferred_element_type=f32
            ).reshape(K, b1, b2)
    return O_eff, rhs_batches, cross_blocks, onehots


def _correction_dense(cfg, W, R_eff, onehots):
    f32 = jnp.float32
    corr = None
    for c, oh in enumerate(onehots):
        o = cfg.covariate_offsets[c]
        Wc = W[:, 1 + o : 1 + o + cfg.B_vec[c], :]  # (K, B_c, d)
        t = jnp.einsum(
            "kn,nb,kbd->dn", R_eff, oh, Wc, preferred_element_type=f32
        )
        corr = t if corr is None else corr + t
    return corr


def _full_tile_joint(cfg, tiled):
    """(Np // tile,) layout-tile -> joint id over the FULL padded cell
    axis, mixed/pad tiles mapped to the trailing trash slot ``n_joint``
    (the form the sharded kernels consume: it shards with the tiles)."""
    import numpy as np

    n_joint = tiled.joint_codes.shape[1]
    tj = np.full(cfg.Np // tiled.tile, n_joint, np.int32)
    tj[: len(tiled.tile_joint)] = tiled.tile_joint
    return tj


def _moments_tiled(cfg, R_eff, Zf, codes, tiled, precomputed=None,
                   tail_R=None, mesh=None):
    """Batch-tiled moments: O(K·N·d), streaming layouts (see ops/tiled.py).

    One unsegmented (K, T)x(T, d+1) matmul per cell tile (Pallas), then
    tiny segment-sums over the static tile->joint-batch table recover the
    per-batch blocks. The trailing mixed region (< n_joint·T cells of
    group remainders + pads) goes through the dense one-hot path.
    ``precomputed`` supplies the (n_joint+1, K, d+1) table when the E-step's
    final round already accumulated it (moment fusion) — the streaming pass
    over R and Z then never runs.
    """
    import jax as _jax

    from .pallas_ridge import pallas_tile_moments

    f32 = jnp.float32
    K = cfg.K
    interp = _jax.default_backend() == "cpu"
    n_joint = tiled.joint_codes.shape[1]
    if precomputed is not None:
        M = precomputed
    elif mesh is not None:
        from .pallas_ridge import sharded_tile_moments

        M = sharded_tile_moments(
            cfg, mesh, R_eff, Zf, tiled.tile,
            jnp.asarray(_full_tile_joint(cfg, tiled)), n_joint,
            interpret=interp,
        )
    else:
        M = pallas_tile_moments(
            cfg, R_eff, Zf, tiled.tile, jnp.asarray(tiled.tile_joint),
            n_joint, interpret=interp,
        )
    seg = M[:n_joint]  # (n_joint, K, d+1); trailing mixed/pad row dropped

    # trailing mixed region: group remainders + pad cells (inert, R == 0)
    n_pure = tiled.n_pure
    Np = cfg.Np
    tail = Np - n_pure
    if tail:
        R_t = tail_R if tail_R is not None else R_eff[:, n_pure:]
        Za_t = jnp.concatenate(
            [Zf[:, n_pure:], jnp.ones((1, tail), f32)], axis=0
        )
        tail_oh = [
            jax.nn.one_hot(codes[c][n_pure:], cfg.B_vec[c], dtype=f32)
            for c in range(cfg.n_covariates)
        ]
        tail_M = [
            jnp.einsum(
                "kn,nb,dn->kbd", R_t, oh, Za_t, preferred_element_type=f32
            )
            for oh in tail_oh
        ]
    else:
        R_t, tail_oh, tail_M = None, None, None

    O_parts, rhs_parts = [], []
    for c in range(cfg.n_covariates):
        jc = jnp.asarray(tiled.joint_codes[c])
        Mc = jnp.swapaxes(
            jax.ops.segment_sum(seg, jc, num_segments=cfg.B_vec[c]), 0, 1
        )  # (K, B_c, d+1)
        if tail:
            Mc = Mc + tail_M[c]
        O_parts.append(Mc[:, :, -1])
        rhs_parts.append(Mc[:, :, :-1])
    O_eff = jnp.concatenate(O_parts, axis=1)
    rhs_batches = jnp.concatenate(rhs_parts, axis=1)

    cross_blocks = {}
    for c1 in range(cfg.n_covariates):
        for c2 in range(c1 + 1, cfg.n_covariates):
            b1, b2 = cfg.B_vec[c1], cfg.B_vec[c2]
            jidx = jnp.asarray(
                tiled.joint_codes[c1] * b2 + tiled.joint_codes[c2]
            )
            cross = jax.ops.segment_sum(
                seg[:, :, -1], jidx, num_segments=b1 * b2
            )  # (b1*b2, K)
            cross = jnp.swapaxes(cross, 0, 1).reshape(K, b1, b2)
            if tail:
                joint_t = codes[c1][n_pure:] * b2 + codes[c2][n_pure:]
                ohj = jax.nn.one_hot(joint_t, b1 * b2, dtype=f32)
                cross = cross + jnp.dot(
                    R_t, ohj, preferred_element_type=f32
                ).reshape(K, b1, b2)
            cross_blocks[(c1, c2)] = cross
    # ctx also carries the per-joint table: the multi-covariate intercept
    # moments reduce from it under the union cell mask (see caller)
    return O_eff, rhs_batches, cross_blocks, (R_t, tail_oh, seg)


def _correction_tiled(cfg, W, R_eff, Zf, ctx, tiled, mesh=None):
    """Batch-tiled correction: one (d, K)x(K, T) matmul per pure tile
    (Pallas, betas fetched by the static tile->joint table), dense on the
    trailing mixed region. Returns Z_corr directly."""
    import jax as _jax

    from .pallas_ridge import (
        pallas_tiled_correction, sharded_tiled_correction,
    )

    f32 = jnp.float32
    interp = _jax.default_backend() == "cpu"
    n_joint = tiled.joint_codes.shape[1]
    NT_pure = len(tiled.tile_joint)

    # per-joint betas: sum of each covariate's beta block at that joint's
    # level (a cell's correction is the sum over covariates,
    # src/harmony.cpp:613-616 via the stacked design)
    W_joint = None
    for c in range(cfg.n_covariates):
        o = cfg.covariate_offsets[c]
        Wc = jnp.take(
            W[:, 1 + o : 1 + o + cfg.B_vec[c], :],
            jnp.asarray(tiled.joint_codes[c]),
            axis=1,
        )  # (K, n_joint, d)
        W_joint = Wc if W_joint is None else W_joint + Wc
    W_joint = jnp.transpose(W_joint, (1, 2, 0)).astype(f32)  # (n_joint, d, K)
    W_joint = jnp.concatenate(
        [W_joint, jnp.zeros((1,) + W_joint.shape[1:], f32)], axis=0
    )

    Np = R_eff.shape[1]
    if mesh is not None:
        Z_corr = sharded_tiled_correction(
            cfg, mesh, W_joint, jnp.asarray(_full_tile_joint(cfg, tiled)),
            R_eff, Zf, tiled.tile, interpret=interp,
        )
    else:
        Z_corr = pallas_tiled_correction(
            cfg, W_joint, jnp.asarray(tiled.tile_joint), R_eff, Zf,
            tiled.tile, interpret=interp,
        )

    tail = Np - tiled.n_pure
    if tail:
        R_t, tail_oh = ctx[0], ctx[1]
        corr_t = None
        for c, oh in enumerate(tail_oh):
            o = cfg.covariate_offsets[c]
            Wc = W[:, 1 + o : 1 + o + cfg.B_vec[c], :]
            t = jnp.einsum(
                "kn,nb,kbd->dn", R_t, oh, Wc, preferred_element_type=f32
            )
            corr_t = t if corr_t is None else corr_t + t
        Z_corr = Z_corr.at[:, tiled.n_pure :].add(-corr_t)
    return Z_corr


def _virtual_tail_r(cfg, virt, n_pure):
    """(K, tail) assignments of the trailing mixed/pad cells, recomputed
    from the final round's penalty table with the same op sequence as the
    kernels' _assign_tile (XLA on the small tail). The penalty gather sums
    per-covariate penalty rows in covariate order — the select chain's
    order, so one- and two-covariate runs reproduce the kernel bits
    exactly (a two-term sum is order-free); >=3 covariates can differ in
    the last bit from the large-B one-hot contraction's reduction tree."""
    f32 = jnp.float32
    Np = cfg.Np
    T = cfg.estep_sub_tile
    tail = Np - n_pure
    Zn_t = virt.Zn_pad[:, n_pure:Np].astype(f32)  # (d, tail)
    tiles = (n_pure + jnp.arange(tail)) // T
    blk = virt.blkmap[tiles]  # (tail,)
    valid = (virt.codes_pad[0, n_pure:Np] >= 0).astype(f32)
    pc = None
    for c, off in enumerate(cfg.covariate_offsets):
        code = virt.codes_pad[c, n_pure:Np]  # sentinels (<0) on pads
        code_c = jnp.clip(code + off, 0, cfg.B - 1)
        pcc = virt.pen[blk, :, code_c].T  # (K, tail)
        pc = pcc if pc is None else pc + pcc
    pc = pc * valid[None, :]  # (K, tail)
    g = jnp.dot(
        virt.Y.T.astype(f32), Zn_t, preferred_element_type=f32
    )  # (K, tail)
    sigma = virt.sigma.astype(f32)[:, None]
    if cfg.estep_variant == "legacy":
        e = jnp.exp(-(2.0 * (1.0 - g)) / sigma)
        colsum1 = jnp.sum(e, axis=0, keepdims=True)
        w = (e / colsum1) * pc
    else:
        e = jnp.exp((g - 1.0) * (2.0 / sigma))
        w = e * pc
    colsum = jnp.sum(w, axis=0, keepdims=True)
    return w * (1.0 / jnp.where(colsum == 0.0, 1.0, colsum))


def _correction_virtual(cfg, W, ctx, tiled, virt, mesh=None):
    """Correction with R recomputed in VMEM from the penalty table (see
    ops/pallas_rotate.py, virtual-R section). Pure layout tiles run in the
    fused kernel; the mixed tail gets the dense patch from its recomputed
    assignments (ctx carries them from _moments_tiled)."""
    import jax as _jax

    from .pallas_rotate import (
        pallas_virtual_correction, sharded_virtual_correction,
    )

    f32 = jnp.float32
    interp = _jax.default_backend() == "cpu"
    n_joint = tiled.joint_codes.shape[1]

    # per-joint betas: sum of each covariate's beta block at that joint's
    # level (a cell's correction sums over covariates,
    # src/harmony.cpp:613-616 via the stacked design)
    W_joint = None
    for c in range(cfg.n_covariates):
        o = cfg.covariate_offsets[c]
        Wc = jnp.take(
            W[:, 1 + o : 1 + o + cfg.B_vec[c], :],
            jnp.asarray(tiled.joint_codes[c]),
            axis=1,
        )  # (K, n_joint, d)
        W_joint = Wc if W_joint is None else W_joint + Wc
    W_joint = jnp.transpose(W_joint, (1, 2, 0)).astype(f32)
    W_joint = jnp.concatenate(
        [W_joint, jnp.zeros((1,) + W_joint.shape[1:], f32)], axis=0
    )

    import numpy as np

    NT_layout = virt.Zn_pad.shape[1] // tiled.tile
    tj = np.full(NT_layout, n_joint, np.int32)
    tj[: len(tiled.tile_joint)] = tiled.tile_joint

    if mesh is not None:
        Z_corr = sharded_virtual_correction(
            cfg, mesh, W_joint, jnp.asarray(tj), tiled.tile, virt.Y,
            virt.sigma, virt.pen, virt.blkmap, virt.Zn_pad,
            virt.codes_pad, virt.Z_orig_pad, interpret=interp,
        )
    else:
        Z_corr = pallas_virtual_correction(
            cfg, W_joint, jnp.asarray(tj), tiled.tile, virt.Y, virt.sigma,
            virt.pen, virt.blkmap, virt.Zn_pad, virt.codes_pad,
            virt.Z_orig_pad, interpret=interp,
        )
    Np = cfg.Np
    if Z_corr.shape[1] != Np:
        Z_corr = Z_corr[:, :Np]

    tail = Np - tiled.n_pure
    if tail:
        R_t, tail_oh = ctx[0], ctx[1]
        corr_t = None
        for c, oh in enumerate(tail_oh):
            oc = cfg.covariate_offsets[c]
            Wc = W[:, 1 + oc : 1 + oc + cfg.B_vec[c], :]
            t = jnp.einsum(
                "kn,nb,kbd->dn", R_t, oh, Wc, preferred_element_type=f32
            )
            corr_t = t if corr_t is None else corr_t + t
        Z_corr = Z_corr.at[:, tiled.n_pure :].add(-corr_t)
    return Z_corr


def _pad1(X):
    return jnp.concatenate(
        [X, jnp.zeros((*X.shape[:-1], 1), X.dtype)], axis=-1
    )


def _moments_segmented(cfg, R_eff, Zf, codes, segments):
    """Batch-pure tile matmuls: O(K·N·d) (see ops/segments.py).

    All tile tensors use a *leading* tile axis — (nt, T, K)/(nt, T, d) —
    so the per-tile contractions lower to clean batched matmuls without
    layout transposes of the big arrays.
    """
    f32 = jnp.float32
    Rt_p = jnp.concatenate(
        [R_eff.T, jnp.zeros((1, cfg.K), f32)], axis=0
    )  # (N+1, K)
    Zt_p = jnp.concatenate(
        [Zf.T, jnp.zeros((1, cfg.d), f32)], axis=0
    )  # (N+1, d)
    O_parts, S_parts, R_s_all = [], [], []
    for c, seg in enumerate(segments):
        Bc = cfg.B_vec[c]
        R_s = Rt_p[seg.tile_cells]  # (nt, T, K)
        Z_s = Zt_p[seg.tile_cells]  # (nt, T, d)
        R_s_all.append(R_s)
        rs_t = jnp.sum(R_s, axis=1)  # (nt, K)
        O_c = jax.ops.segment_sum(
            rs_t, seg.tile_batch, num_segments=Bc
        ).T  # (K, B_c)
        S_t = jnp.einsum(
            "ntk,ntd->nkd", R_s, Z_s, preferred_element_type=f32
        )  # (nt, K, d)
        S_c = jax.ops.segment_sum(S_t, seg.tile_batch, num_segments=Bc)
        O_parts.append(O_c)
        S_parts.append(jnp.swapaxes(S_c, 0, 1))  # (K, B_c, d)
    O_eff = jnp.concatenate(O_parts, axis=1)
    rhs_batches = jnp.concatenate(S_parts, axis=1)

    cross_blocks = {}
    codes_p = _pad1(codes)
    for c1 in range(cfg.n_covariates):
        seg = segments[c1]
        for c2 in range(c1 + 1, cfg.n_covariates):
            b1, b2 = cfg.B_vec[c1], cfg.B_vec[c2]
            c2_s = codes_p[c2][seg.tile_cells]  # (nt, T)
            oh2 = jax.nn.one_hot(c2_s, b2, dtype=f32)  # (nt, T, B2)
            X_t = jnp.einsum(
                "ntk,ntb->nkb", R_s_all[c1], oh2, preferred_element_type=f32
            )
            X = jax.ops.segment_sum(X_t, seg.tile_batch, num_segments=b1)
            cross_blocks[(c1, c2)] = jnp.swapaxes(X, 0, 1)
    return O_eff, rhs_batches, cross_blocks, R_s_all


def _correction_segmented(cfg, W, R_s_all, segments):
    f32 = jnp.float32
    d = cfg.d
    corr = None
    for c, seg in enumerate(segments):
        o = cfg.covariate_offsets[c]
        Bc = cfg.B_vec[c]
        Wc = W[:, 1 + o : 1 + o + Bc, :]  # (K, B_c, d)
        W_t = jnp.take(Wc, seg.tile_batch, axis=1).swapaxes(0, 1)  # (nt, K, d)
        corr_t = jnp.einsum(
            "ntk,nkd->ntd", R_s_all[c], W_t, preferred_element_type=f32
        )  # (nt, T, d)
        nt, T = seg.tile_cells.shape
        corr_flat = jnp.concatenate(
            [corr_t.reshape(nt * T, d), jnp.zeros((1, d), f32)], axis=0
        )
        t = corr_flat[seg.pos[:-1]]  # (N, d)
        corr = t if corr is None else corr + t
    return corr.T  # (d, N)


def _solve_ridge(cfg: HarmonyConfig, G: jnp.ndarray, rhs: jnp.ndarray):
    """Batched solve of G W = rhs. G is symmetric positive definite.

    'auto' (default) mirrors the reference's dispatch: the closed-form
    arrowhead inverse for a single covariate (src/harmony.cpp:574-586 —
    then Phi_cov is an arrowhead matrix, and the elementwise formula is
    ~10x cheaper than a batched factorisation of K tiny matrices on TPU),
    a general solve otherwise (``arma::inv``, src/harmony.cpp:572-573,
    here batched Cholesky). 'cholesky' / 'solve' (batched LU) /
    'arrowhead' force a specific method.
    """
    solver = cfg.ridge_solver
    if solver == "auto":
        solver = "arrowhead" if cfg.n_covariates == 1 else "cholesky"
    if solver == "solve":
        return jnp.linalg.solve(G, rhs)
    if solver == "arrowhead":
        if cfg.n_covariates != 1:
            raise ValueError("arrowhead solver requires a single covariate")
        return _arrowhead_solve(G, rhs)
    L = jnp.linalg.cholesky(G)
    return jax.scipy.linalg.cho_solve((L, True), rhs)


def _arrowhead_solve(G: jnp.ndarray, rhs: jnp.ndarray) -> jnp.ndarray:
    """Closed-form arrowhead inverse applied to rhs (src/harmony.cpp:574-586).

    For G = [[b0, a^T], [a, D]] with diagonal D, the reference builds
    inv = (1/u) m m^T + diag(b) with b = 1/diag(G) (b[0] = 0),
    m = (-a) * b (m[0] = 1), u = b0 - sum(a^2 * b).
    """
    ac = -G[:, 0, :]  # (K, B+1)
    ac = ac.at[:, 0].set(1.0)
    b0 = G[:, 0, 0]
    diag = jnp.diagonal(G, axis1=1, axis2=2)
    b = 1.0 / diag
    b = b.at[:, 0].set(0.0)
    u = b0 - jnp.sum(ac * ac * b, axis=1)
    ac_b = ac * b
    ac_b = ac_b.at[:, 0].set(1.0)
    # inv = (1/u) ac_b ac_b^T + diag(b);  W = inv @ rhs
    t = jnp.einsum("kb,kbd->kd", ac_b, rhs)  # ac_b^T rhs
    W = ac_b[:, :, None] * (t / u[:, None])[:, None, :]
    W = W + b[:, :, None] * rhs
    return W
