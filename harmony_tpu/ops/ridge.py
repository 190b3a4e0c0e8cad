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
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Return (Z_corr, Y_new, W) — W is (K, B+1, d) with intercept rows zeroed.

    ``Z_corr`` is always recomputed fresh from ``Z_orig``
    (src/harmony.cpp:347): correction is never incremental.
    """
    offsets = cfg.covariate_offsets
    K, B, d = cfg.K, cfg.B, cfg.d
    f32 = jnp.float32

    keep, any_active = compute_masks(cfg, O, batch_sizes)
    keepf = keep.astype(f32)

    # Cell mask: kept iff ANY of the cell's batches is kept (union over
    # covariates of the kept batches' cell sets, src/harmony.cpp:389-402).
    cell_mask = None
    for c, off in enumerate(offsets):
        kc = jnp.take(keep[:, off : off + cfg.B_vec[c]], codes[c], axis=1)
        cell_mask = kc if cell_mask is None else (cell_mask | kc)
    R_eff = R.astype(f32) * cell_mask.astype(f32)  # (K, N)

    # ---- Moments ----------------------------------------------------------
    # One-hot designs per covariate (dense small-N path).
    onehots = [
        jax.nn.one_hot(codes[c], cfg.B_vec[c], dtype=f32)  # (N, B_c)
        for c in range(cfg.n_covariates)
    ]

    # O_eff[k, b] = sum_n R_eff[k, n] [code = b], masked by keep.
    O_eff = jnp.concatenate(
        [
            jnp.dot(R_eff, oh, preferred_element_type=f32)
            for oh in onehots
        ],
        axis=1,
    ) * keepf  # (K, B)
    r_tot = jnp.sum(R_eff, axis=1)  # (K,) = Phi_Rk intercept moment

    # ---- Normal matrices G (K, B+1, B+1) ---------------------------------
    G = jnp.zeros((K, B + 1, B + 1), dtype=f32)
    G = G.at[:, 0, 0].set(r_tot)
    G = G.at[:, 0, 1:].set(O_eff)
    G = G.at[:, 1:, 0].set(O_eff)
    diag_idx = jnp.arange(1, B + 1)
    G = G.at[:, diag_idx, diag_idx].set(O_eff)
    # Cross-covariate co-occurrence blocks (the reference's Phi_Rk Phi^T has
    # these implicitly through the stacked sparse design).
    for c1 in range(cfg.n_covariates):
        for c2 in range(c1 + 1, cfg.n_covariates):
            b1, b2 = cfg.B_vec[c1], cfg.B_vec[c2]
            o1, o2 = offsets[c1], offsets[c2]
            joint = codes[c1] * b2 + codes[c2]  # (N,)
            ohj = jax.nn.one_hot(joint, b1 * b2, dtype=f32)  # (N, b1*b2)
            cross = jnp.dot(
                R_eff, ohj, preferred_element_type=f32
            ).reshape(K, b1, b2)
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
    Zf = Z_orig.astype(f32)
    rhs0 = jnp.dot(R_eff, Zf.T, preferred_element_type=f32)  # (K, d)
    rhs_rows = []
    for c, oh in enumerate(onehots):
        # S_c[k, b, :] = sum_{n: code_c = b} R_eff[k, n] Z[:, n]
        S_c = jnp.einsum(
            "kn,nb,dn->kbd", R_eff, oh, Zf, preferred_element_type=f32
        )
        rhs_rows.append(S_c)
    rhs_batches = jnp.concatenate(rhs_rows, axis=1) * keepf[:, :, None]
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
    corr = jnp.zeros_like(Zf)
    for c, oh in enumerate(onehots):
        o = offsets[c]
        Wc = W[:, 1 + o : 1 + o + cfg.B_vec[c], :]  # (K, B_c, d)
        corr = corr + jnp.einsum(
            "kn,nb,kbd->dn", R_eff, oh, Wc, preferred_element_type=f32
        )
    Z_corr = (Zf - corr).astype(Z_orig.dtype)
    return Z_corr, Y_new, W


def _solve_ridge(cfg: HarmonyConfig, G: jnp.ndarray, rhs: jnp.ndarray):
    """Batched solve of G W = rhs. G is symmetric positive definite.

    'cholesky' (default) replaces the reference's general ``arma::inv``
    (src/harmony.cpp:572-573); 'solve' uses batched LU; 'arrowhead' applies
    the reference's single-covariate closed form (src/harmony.cpp:574-586),
    valid only when the design is one covariate (then Phi_cov is an
    arrowhead matrix).
    """
    if cfg.ridge_solver == "solve":
        return jnp.linalg.solve(G, rhs)
    if cfg.ridge_solver == "arrowhead":
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
