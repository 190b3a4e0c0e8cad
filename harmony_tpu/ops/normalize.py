"""Column normalisation helpers (the analog of ``arma::normalise``)."""

from __future__ import annotations

import jax.numpy as jnp


def l2_normalize_columns(X: jnp.ndarray, eps: float = 0.0) -> jnp.ndarray:
    """L2-normalise columns; zero columns are left at zero.

    Matches ``arma::normalise(X, 2, 0)`` (used at src/harmony.cpp:42,136,220,633):
    Armadillo leaves zero-norm columns as zero.
    """
    norms = jnp.linalg.norm(X, axis=0, keepdims=True)
    return X / jnp.where(norms <= eps, 1.0, norms)


def l1_normalize_columns(X: jnp.ndarray) -> jnp.ndarray:
    """L1-normalise columns (``arma::normalise(X, 1, 0)``, src/harmony.cpp:321-323).

    Armadillo normalises by sum(|x|); R entries are non-negative here so the
    plain column sum is used.
    """
    sums = jnp.sum(X, axis=0, keepdims=True)
    return X / jnp.where(sums == 0, 1.0, sums)
