"""The Harmony objective (``compute_objective``, src/harmony.cpp:158-170).

    J = [ sum(R . dist)                                   (kmeans error)
        + sum(sigma_k * R log R)                          (entropy)
        + sum((R . sigma_k) * ((theta_b log((O+E+1)/(2E+1))) Phi)) ]
      * 2000/N

The three terms are returned separately; the reference pushes each to its
own trace (src/harmony.cpp:165-168). All reductions are single fused XLA
reductions in fp32 (the reference accumulates fp32 in a naive loop,
src/utils.cpp:67-75; accumulation order differs, tolerance-tested).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from ..config import HarmonyConfig
from .stats import penalty_for_cells


def compute_objective(
    cfg: HarmonyConfig,
    R: jnp.ndarray,
    dist: jnp.ndarray,
    O: jnp.ndarray,
    E: jnp.ndarray,
    codes: jnp.ndarray,
    sigma: jnp.ndarray,
    theta: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Return (total, dist_term, entropy_term, cross_term), each * 2000/N."""
    nc = jnp.float32(cfg.norm_const)
    Rf = R.astype(jnp.float32)

    kmeans_error = jnp.sum(Rf * dist.astype(jnp.float32))

    # safe_entropy: x log x with 0 -> 0 (trunc_log, src/utils.cpp:77-81)
    xlogx = jnp.where(Rf > 0, Rf * jnp.log(Rf), 0.0)
    entropy = jnp.sum(sigma.astype(jnp.float32)[:, None] * xlogx)

    # cross term: (theta_b * log((O+E+1)/(2E+1))) is a K x B matrix whose
    # product with Phi sums one column per covariate per cell.
    Of = O.astype(jnp.float32)
    Ef = E.astype(jnp.float32)
    pen_log = theta.astype(jnp.float32)[None, :] * jnp.log(
        (Of + Ef + 1.0) / (2.0 * Ef + 1.0)
    )
    pen_cells = penalty_for_cells(pen_log, codes, cfg.covariate_offsets)
    cross = jnp.sum(Rf * sigma.astype(jnp.float32)[:, None] * pen_cells)

    return (
        (kmeans_error + entropy + cross) * nc,
        kmeans_error * nc,
        entropy * nc,
        cross * nc,
    )
