"""Unit tests for individual kernels (internal coverage the reference's
test suite lacks — SURVEY.md §4)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from harmony_tpu.config import HarmonyConfig
from harmony_tpu import ops
from harmony_tpu.ops.estep import block_update_round, objective_from_stats
from harmony_tpu.ops.normalize import l1_normalize_columns, l2_normalize_columns
from harmony_tpu.ops.ridge import compute_masks


def _cfg(N=100, d=6, K=4, B_vec=(3,), **kw):
    return HarmonyConfig(N=N, d=d, K=K, B=sum(B_vec), B_vec=B_vec, **kw)


class TestNormalize:
    def test_l2_zero_columns_preserved(self):
        X = jnp.array([[1.0, 0.0], [1.0, 0.0]])
        out = np.asarray(l2_normalize_columns(X))
        np.testing.assert_allclose(out[:, 0], [2**-0.5, 2**-0.5], rtol=1e-6)
        np.testing.assert_allclose(out[:, 1], 0.0)

    def test_l1_columns_sum_to_one(self):
        X = jnp.abs(jax.random.normal(jax.random.PRNGKey(0), (5, 7))) + 0.1
        out = np.asarray(l1_normalize_columns(X))
        np.testing.assert_allclose(out.sum(axis=0), 1.0, rtol=1e-6)


class TestBlocks:
    def test_make_blocks_partitions_cells(self):
        cfg = _cfg(N=103)
        perm = jnp.asarray(np.random.default_rng(0).permutation(103), jnp.int32)
        idx, valid = ops.make_blocks(cfg, perm)
        cells = np.asarray(idx)[np.asarray(valid)]
        assert sorted(cells.tolist()) == list(range(103))

    def test_reference_geometry(self):
        # N=9478, bs=0.05 -> 19 blocks of 473 + final 491 (src/harmony.cpp:279-300)
        cfg = _cfg(N=9478)
        perm = jnp.arange(9478, dtype=jnp.int32)
        idx, valid = ops.make_blocks(cfg, perm)
        sizes = np.asarray(valid).sum(axis=1)
        assert sizes[:-1].tolist() == [473] * 19
        assert sizes[-1] == 491

    def test_short_final_block_values(self):
        """When the final block is SHORTER than cells_per_block (e.g.
        N=100, bs=0.3 -> 30/30/30/10) the last slice window overruns N;
        the r4 slice-based build must pad, not let dynamic_slice clamp
        the start (a clamp silently shifts the last block's cells —
        caught by the parity fuzz suite)."""
        from harmony_tpu.config import harmony_options
        from harmony_tpu.preprocess import build_design, resolve_config

        design = build_design({"a": np.zeros(100, np.int32)}, ["a"])
        cfg = resolve_config(
            n_cells=100, d=4, design=design, nclust=3, max_iter=2,
            early_stop=True, verbose=False,
            options=harmony_options(block_size=0.3),
        )
        assert cfg.last_block_size < cfg.cells_per_block
        perm = jnp.asarray(
            np.random.default_rng(3).permutation(100), jnp.int32
        )
        idx, valid = ops.make_blocks(cfg, perm)
        idx, valid = np.asarray(idx), np.asarray(valid)
        p = np.asarray(perm)
        start = 0
        for b in range(cfg.n_blocks):
            size = int(valid[b].sum())
            np.testing.assert_array_equal(
                idx[b, :size], p[start : start + size]
            )
            assert (idx[b, size:] == cfg.Np).all()
            start += size
        assert start == 100


class TestObjectiveEquivalence:
    def test_cross_term_contraction_matches_gather_form(self):
        """sum_kn R sigma pen[code] == sum_kb sigma pen O exactly."""
        rng = np.random.default_rng(0)
        cfg = _cfg(N=50, K=3, B_vec=(2, 3))
        codes = jnp.asarray(
            np.stack([rng.integers(0, 2, 50), rng.integers(0, 3, 50)]),
            jnp.int32,
        )
        R = jnp.asarray(rng.random((3, 50)), jnp.float32)
        R = R / R.sum(0, keepdims=True)
        sigma = jnp.asarray(rng.random(3), jnp.float32)
        theta = jnp.asarray(rng.random(5), jnp.float32)
        Pr_b = jnp.asarray(np.full(5, 0.2), jnp.float32)
        E = ops.compute_E(R, Pr_b)
        O = ops.compute_O(R, codes, cfg.covariate_offsets, cfg.B)
        dist = jnp.asarray(rng.random((3, 50)), jnp.float32)

        full = ops.compute_objective(cfg, R, dist, O, E, codes, sigma, theta)
        kerr = jnp.sum(R * dist)
        ent = jnp.sum(
            sigma[:, None] * jnp.where(R > 0, R * jnp.log(R), 0.0)
        )
        fused = objective_from_stats(cfg, kerr, ent, O, E, sigma, theta)
        for a, b in zip(full, fused):
            np.testing.assert_allclose(float(a), float(b), rtol=1e-5)


class TestRidgeMasks:
    def test_cutoff_drops_batches_and_covariates(self):
        cfg = _cfg(N=100, K=2, B_vec=(2, 2), batch_prop_cutoff=0.1)
        batch_sizes = jnp.asarray([50.0, 50.0, 60.0, 40.0])
        # cluster 0: all batches well represented
        # cluster 1: batch 1 of covariate 0 below cutoff -> covariate 0
        # retains 1 level -> both its batches dropped
        O = jnp.asarray(
            [[20.0, 20.0, 25.0, 15.0], [20.0, 1.0, 25.0, 15.0]]
        )
        keep, any_active = compute_masks(cfg, O, batch_sizes)
        keep = np.asarray(keep)
        assert keep[0].tolist() == [True, True, True, True]
        assert keep[1].tolist() == [False, False, True, True]
        assert np.asarray(any_active).tolist() == [True, True]

    def test_all_dropped_cluster_inactive(self):
        cfg = _cfg(N=100, K=1, B_vec=(2,), batch_prop_cutoff=0.5)
        batch_sizes = jnp.asarray([50.0, 50.0])
        O = jnp.asarray([[1.0, 1.0]])
        keep, any_active = compute_masks(cfg, O, batch_sizes)
        assert not bool(any_active[0])
        assert not np.asarray(keep).any()


class TestKmeans:
    def test_centroids_are_near_data(self):
        rng = np.random.default_rng(0)
        centers = rng.normal(size=(3, 5)) * 4
        X = np.concatenate(
            [centers[i] + rng.normal(size=(40, 5)) * 0.1 for i in range(3)]
        ).T  # (d, N)
        Y = ops.kmeans_centers(jax.random.PRNGKey(0), jnp.asarray(X), 3)
        Y = np.asarray(Y)
        # every true center has a recovered centroid nearby
        for c in centers:
            dists = np.linalg.norm(Y - c[:, None], axis=0)
            assert dists.min() < 0.5

    def test_no_duplicate_seeds(self):
        X = jnp.asarray(np.random.default_rng(0).normal(size=(4, 30)))
        from harmony_tpu.ops.kmeans import _seed_centroids

        Y = _seed_centroids(jax.random.PRNGKey(1), X, 10, 30)
        # all seeded centroids are distinct columns
        Yn = np.asarray(Y)
        assert len({tuple(np.round(c, 9)) for c in Yn.T}) == 10


class TestSegmentedRidge:
    @pytest.mark.parametrize("B_vec", [(3,), (2, 3)])
    def test_segmented_matches_dense(self, B_vec):
        rng = np.random.default_rng(0)
        N, d, K = 200, 5, 4
        cfg = _cfg(
            N=N, d=d, K=K, B_vec=B_vec, mstep_mode="segment", segment_tile=64
        )
        codes = jnp.asarray(
            np.stack([rng.integers(0, b, N) for b in B_vec]), jnp.int32
        )
        R = jnp.asarray(rng.random((K, N)), jnp.float32)
        R = R / R.sum(0, keepdims=True)
        Z = jnp.asarray(rng.normal(size=(d, N)), jnp.float32)
        Pr = np.concatenate(
            [np.bincount(np.asarray(codes[c]), minlength=b) for c, b in
             enumerate(B_vec)]
        ).astype(np.float32)
        batch_sizes = jnp.asarray(Pr)
        Pr_b = jnp.asarray(Pr / N)
        E = ops.compute_E(R, Pr_b)
        O = ops.compute_O(R, codes, cfg.covariate_offsets, cfg.B)
        lamb = jnp.concatenate(
            [jnp.zeros(1), jnp.ones(cfg.B)]
        ).astype(jnp.float32)
        Y_old = jnp.asarray(rng.normal(size=(d, K)), jnp.float32)

        from harmony_tpu.ops.segments import build_segments

        segs = build_segments(cfg, np.asarray(codes), tile=64)
        dense = ops.moe_correct_ridge(
            cfg, Z, R, O, E, codes, batch_sizes, lamb, Y_old
        )
        seg = ops.moe_correct_ridge(
            cfg, Z, R, O, E, codes, batch_sizes, lamb, Y_old, segments=segs
        )
        np.testing.assert_allclose(
            np.asarray(seg[0]), np.asarray(dense[0]), atol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(seg[1]), np.asarray(dense[1]), atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(seg[2]), np.asarray(dense[2]), atol=1e-4
        )

    def test_segments_cover_cells_once(self):
        rng = np.random.default_rng(1)
        cfg = _cfg(N=150, B_vec=(4,), segment_tile=32)
        codes = np.stack([rng.integers(0, 4, 150)])
        from harmony_tpu.ops.segments import build_segments

        (seg,) = build_segments(cfg, codes, tile=32)
        cells = np.asarray(seg.tile_cells).reshape(-1)
        real = cells[cells < 150]
        assert sorted(real.tolist()) == list(range(150))
        # each tile is batch-pure
        tb = np.asarray(seg.tile_batch)
        for t in range(seg.n_tiles):
            row = np.asarray(seg.tile_cells[t])
            row = row[row < 150]
            if row.size:
                assert np.all(codes[0][row] == tb[t])


class TestBlockUpdateRound:
    def test_preserves_simplex_and_updates_stats(self):
        rng = np.random.default_rng(0)
        cfg = _cfg(N=120, d=4, K=3, B_vec=(2,))
        Z = jnp.asarray(rng.normal(size=(4, 120)), jnp.float32)
        Z = l2_normalize_columns(Z)
        Y = l2_normalize_columns(
            jnp.asarray(rng.normal(size=(4, 3)), jnp.float32)
        )
        codes = jnp.asarray(rng.integers(0, 2, (1, 120)), jnp.int32)
        sigma = jnp.full((3,), 0.1, jnp.float32)
        theta = jnp.full((2,), 1.0, jnp.float32)
        counts = np.bincount(np.asarray(codes[0]), minlength=2)
        Pr_b = jnp.asarray(counts / 120, jnp.float32)
        dist = ops.compute_distances(Y, Z)
        R = ops.initial_assignments(dist, sigma)
        E = ops.compute_E(R, Pr_b)
        O = ops.compute_O(R, codes, cfg.covariate_offsets, cfg.B)
        perm = jnp.asarray(rng.permutation(120), jnp.int32)

        res = block_update_round(
            cfg, Z, Y, R, E, O, codes, Pr_b, sigma, theta, perm
        )
        Rn = np.asarray(res.R)
        np.testing.assert_allclose(Rn.sum(axis=0), 1.0, atol=1e-5)
        # E/O consistent with the returned R
        O_direct = np.asarray(
            ops.compute_O(res.R, codes, cfg.covariate_offsets, cfg.B)
        )
        np.testing.assert_allclose(np.asarray(res.O), O_direct, atol=1e-3)
        E_direct = np.asarray(ops.compute_E(res.R, Pr_b))
        np.testing.assert_allclose(np.asarray(res.E), E_direct, atol=1e-3)


def test_make_blocks_sorted_membership():
    """make_blocks_sorted: identical block membership to make_blocks,
    ascending within-block order (the exact math is order-invariant
    within a block, src/harmony.cpp:309-331)."""
    import numpy as np
    import jax.numpy as jnp

    from harmony_tpu.config import HarmonyConfig
    from harmony_tpu.ops.assign import make_blocks, make_blocks_sorted

    rng = np.random.default_rng(0)
    for N, bs in ((100, 0.3), (237, 0.05), (64, 0.25)):
        cfg = HarmonyConfig(
            N=N, d=4, K=3, B=2, B_vec=(2,), block_size=bs,
        )
        perm = jnp.asarray(rng.permutation(N).astype(np.int32))
        idx, mask = make_blocks(cfg, perm)
        idx_s, mask_s = make_blocks_sorted(cfg, perm)
        assert idx_s.shape == idx.shape
        np.testing.assert_array_equal(np.asarray(mask_s), np.asarray(mask))
        for b in range(cfg.n_blocks):
            a = np.asarray(idx[b])[np.asarray(mask[b])]
            s = np.asarray(idx_s[b])[np.asarray(mask_s[b])]
            assert set(a) == set(s), f"block {b} membership differs"
            assert np.all(np.diff(s) > 0), f"block {b} not ascending"
        # every cell exactly once across blocks
        all_s = np.asarray(idx_s)[np.asarray(mask_s)]
        assert sorted(all_s) == list(range(N))
