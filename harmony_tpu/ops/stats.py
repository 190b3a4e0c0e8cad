"""Batch-diversity statistics O and E, and the diversity-penalty gather.

The reference computes ``O = R * Phi^T`` as a sparse matmul
(src/harmony.cpp:150) and the penalty term as
``harmony_pow((2E+1)/(O+E+1), theta) * Phi`` (src/harmony.cpp:322). With the
one-hot design replaced by integer codes, ``O`` is a segment-sum of R columns
keyed by batch id and the penalty for a cell is the *sum* of its per-covariate
penalty columns (the sparse matmul with stacked one-hot blocks sums one entry
per covariate).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def one_hot_design(codes: jnp.ndarray, offsets: Tuple[int, ...], B: int,
                   dtype=jnp.float32) -> jnp.ndarray:
    """Materialise the stacked one-hot Phi (B, N). Small-N/dense path only."""
    gcodes = codes + jnp.asarray(offsets, dtype=codes.dtype)[:, None]
    # (ncov, N, B) one-hots summed over covariates -> (B, N)
    oh = jax.nn.one_hot(gcodes, B, dtype=dtype, axis=-1)  # (ncov, N, B)
    return jnp.sum(oh, axis=0).T


def compute_O(R: jnp.ndarray, codes: jnp.ndarray, offsets: Tuple[int, ...],
              B: int) -> jnp.ndarray:
    """O[k, b] = sum_n R[k, n] * Phi[b, n]  (src/harmony.cpp:150).

    Implemented as a dense one-hot matmul (K x N @ N x B) which XLA maps to a
    single MXU contraction; the segment layout / Pallas path replaces this at
    large N.
    """
    Phi_t = one_hot_design(codes, offsets, B, dtype=jnp.float32).T  # (N, B)
    return jnp.dot(
        R.astype(jnp.float32), Phi_t, preferred_element_type=jnp.float32
    ).astype(R.dtype)


def compute_E(R: jnp.ndarray, Pr_b: jnp.ndarray) -> jnp.ndarray:
    """E = rowSums(R) * Pr_b^T  (src/harmony.cpp:149)."""
    return jnp.sum(R, axis=1, keepdims=True) * Pr_b[None, :]


def penalty_for_cells(
    pen: jnp.ndarray,  # (K, B) per-batch penalty columns
    codes: jnp.ndarray,  # (ncov, n) local level codes of the cells
    offsets: Tuple[int, ...],
) -> jnp.ndarray:
    """Per-cell penalty: sum over covariates of pen[:, batch_of(cell, c)].

    This is exactly ``pen * Phi_cells`` for the stacked one-hot design
    (src/harmony.cpp:322): the sparse matmul sums one penalty column per
    covariate.
    """
    out = None
    for c, off in enumerate(offsets):
        cols = pen[:, off:]  # static offset slice then gather local codes
        term = jnp.take(cols, codes[c], axis=1)
        out = term if out is None else out + term
    return out
