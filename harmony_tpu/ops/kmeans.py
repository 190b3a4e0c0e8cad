"""Centroid initialisation: randomized seeding + Lloyd rounds.

TPU-native re-implementation of ``kmeans_centers`` (src/utils.cpp:53-64):

1. Seeding (``initialize_centroids``, src/utils.cpp:10-49): start from K
   random cells; for each slot k, compute distances of all cells to the
   current slot-k point and draw a replacement by the exponential-race trick
   (``argmin(-log(u)/dist)`` samples proportionally to distance); previously
   chosen cells are excluded (reference dedupes via a retry set).
2. 10 Lloyd iterations of Euclidean k-means seeded with those centroids
   (``arma::kmeans(..., keep_existing, 1 iter) x 10``, src/utils.cpp:57-61);
   empty clusters keep their previous centroid.

All data-dependent choices run on explicit JAX PRNG keys (the reference
uses R's global RNG, R/ui.R:264-266; trajectory parity therefore requires
injecting centroids, see ``init_override`` in the driver).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _seed_centroids(
    key: jax.Array, X: jnp.ndarray, K: int, n_valid: int
) -> jnp.ndarray:
    """Distance-weighted random seeding (src/utils.cpp:10-49). X is (d, N).

    Columns at index >= n_valid are padding and are never selected.
    """
    d, N = X.shape
    k0, k1 = jax.random.split(key)
    init_idx = jax.random.randint(k0, (K,), 0, n_valid)
    Y0 = X[:, init_idx]  # (d, K)
    race_keys = jax.random.split(k1, K)

    Xv = X[:, :n_valid]  # race only over logical cells (pad-invariant draws)

    # The reference races each slot against its *initial* random column
    # (Y.col(i) is only replaced after slot i samples, src/utils.cpp:25-45),
    # so all K distance rows come from one (K, d) x (d, N) MXU matmul; the
    # sequential part is just the race argmin + dedupe on (N,) vectors.
    D = jnp.abs(
        2.0 * (1.0 - jnp.dot(
            Y0.T.astype(jnp.float32), Xv.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        ))
    ).astype(X.dtype)  # (K, n_valid)

    def body(chosen, inp):
        dist, kk = inp
        u = jax.random.uniform(
            kk, (n_valid,), minval=jnp.finfo(X.dtype).tiny, maxval=1.0
        )
        prob = -jnp.log(u) / jnp.maximum(dist, jnp.finfo(X.dtype).tiny)
        prob = jnp.where(chosen, jnp.inf, prob)  # dedupe (src/utils.cpp:39-43)
        idx = jnp.argmin(prob)
        chosen = chosen.at[idx].set(True)
        return chosen, idx

    chosen0 = jnp.zeros((n_valid,), dtype=bool)
    _, picks = jax.lax.scan(body, chosen0, (D, race_keys))
    return X[:, picks]


def _lloyd_round(
    X: jnp.ndarray, Y: jnp.ndarray, n_valid: int
) -> jnp.ndarray:
    """One Euclidean Lloyd iteration; empty clusters keep old centroids.

    Cluster means via segment-sum keyed by the assignment (an (N, K)
    one-hot would cost N*K floats — 2 GB at 5M cells, K=100).
    """
    K = Y.shape[1]
    # argmin_k ||x - y_k||^2 = argmin_k (||y_k||^2 - 2 y_k^T x)
    g = jnp.dot(
        Y.T.astype(jnp.float32), X.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )  # (K, N)
    sq = jnp.sum(
        Y.astype(jnp.float32) ** 2, axis=0
    )  # (K,)
    assign = jnp.argmin(sq[:, None] - 2.0 * g, axis=0)  # (N,)
    if n_valid != X.shape[1]:
        # padding cells go to a drop bucket
        assign = jnp.where(jnp.arange(X.shape[1]) < n_valid, assign, K)
    sums = jax.ops.segment_sum(
        X.astype(jnp.float32).T, assign, num_segments=K + 1
    )[:K].T  # (d, K)
    counts = jax.ops.segment_sum(
        jnp.ones_like(assign, dtype=jnp.float32), assign, num_segments=K + 1
    )[:K]
    Y_new = sums / jnp.maximum(counts, 1.0)[None, :]
    return jnp.where(counts[None, :] > 0, Y_new, Y.astype(jnp.float32)).astype(
        X.dtype
    )


def kmeans_centers(
    key: jax.Array,
    X: jnp.ndarray,
    K: int,
    iterations: int = 10,
    n_valid: int | None = None,
) -> jnp.ndarray:
    """Seed + ``iterations`` Lloyd rounds (src/utils.cpp:53-64). X is (d, N).

    ``n_valid`` marks trailing padding columns to exclude (sharding pad).
    """
    if n_valid is None:
        n_valid = X.shape[1]
    Y = _seed_centroids(key, X, K, n_valid)

    def body(Y, _):
        return _lloyd_round(X, Y, n_valid), None

    Y, _ = jax.lax.scan(body, Y, None, length=iterations)
    return Y
