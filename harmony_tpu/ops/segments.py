"""Batch-segmented tile layout for the M-step moments.

The correction's heavy moments are segment sums over cells grouped by
batch: ``S_c[k, b, :] = sum_{n: code_c(n)=b} R_eff[k, n] Z[:, n]`` and the
R-weighted batch co-occurrences. Computed densely (one-hot contractions)
these cost O(K·N·B·d); grouping cells by batch reduces them to batched
(K, T) x (T, d) tile matmuls costing O(K·N·d) — the information-theoretic
minimum — because every tile lies wholly inside one batch.

The layout is static per run (batch membership never changes): cells are
sorted by level per covariate, each level's run padded to a multiple of the
tile size T, with a sentinel cell index pointing at a zero-padded column.
This is the TPU-native replacement for the reference's per-batch cell index
(``index``, src/harmony.cpp:48-65) that drives its per-batch column
accumulations (src/harmony.cpp:595-609).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import numpy as np

from ..config import HarmonyConfig


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class CovariateSegments:
    """Tiled, batch-pure cell layout for one covariate."""

    tile_cells: jax.Array  # (nt, T) int32 cell ids; sentinel Np = padding
    tile_batch: jax.Array  # (nt,) int32 local level of each tile
    pos: jax.Array  # (Np+1,) int32 flat tile-slot of each cell

    @property
    def n_tiles(self) -> int:
        return self.tile_cells.shape[0]

    @property
    def tile(self) -> int:
        return self.tile_cells.shape[1]


def build_segments(
    cfg: HarmonyConfig, codes: np.ndarray, tile: int = 1024
) -> Tuple[CovariateSegments, ...]:
    """Host-side construction from the (ncov, Np) code array.

    Sharding-pad cells (index >= N) are excluded from every tile, so they
    contribute nothing to any moment.
    """
    import jax.numpy as jnp

    out = []
    Np = codes.shape[1]
    for c in range(cfg.n_covariates):
        col = np.asarray(codes[c][: cfg.N])
        order = np.argsort(col, kind="stable").astype(np.int64)
        sorted_codes = col[order]
        counts = np.bincount(sorted_codes, minlength=cfg.B_vec[c])

        tiles = []
        tile_batch = []
        start = 0
        for b, cnt in enumerate(counts):
            nb_tiles = max(1, int(np.ceil(cnt / tile))) if cnt > 0 else 0
            for t in range(nb_tiles):
                lo = start + t * tile
                hi = min(start + (t + 1) * tile, start + cnt)
                row = np.full(tile, Np, dtype=np.int64)
                row[: hi - lo] = order[lo:hi]
                tiles.append(row)
                tile_batch.append(b)
            start += cnt
        if not tiles:  # degenerate: no cells at all
            tiles = [np.full(tile, Np, dtype=np.int64)]
            tile_batch = [0]
        tile_cells = np.stack(tiles).astype(np.int32)
        tb = np.asarray(tile_batch, dtype=np.int32)

        nt = tile_cells.shape[0]
        pos = np.full(Np + 1, nt * tile, dtype=np.int64)
        flat = tile_cells.reshape(-1).astype(np.int64)
        pos[flat] = np.arange(nt * tile, dtype=np.int64)
        out.append(
            CovariateSegments(
                tile_cells=jnp.asarray(tile_cells),
                tile_batch=jnp.asarray(tb),
                pos=jnp.asarray(pos[: Np + 1].astype(np.int32)),
            )
        )
    return tuple(out)
