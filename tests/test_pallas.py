"""Pallas fused E-step kernel vs the XLA path (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from harmony_tpu.config import HarmonyConfig
from harmony_tpu import ops
from harmony_tpu.ops.estep import block_update_round
from harmony_tpu.ops.normalize import l2_normalize_columns
from harmony_tpu.ops.pallas_estep import pallas_block_update_round


def _problem(N=600, d=8, K=5, B_vec=(3,), seed=0, N_pad=None):
    rng = np.random.default_rng(seed)
    cfg = HarmonyConfig(
        N=N, d=d, K=K, B=sum(B_vec), B_vec=B_vec, N_pad=N_pad
    )
    Np = cfg.Np
    Z = np.zeros((d, Np), np.float32)
    Z[:, :N] = rng.normal(size=(d, N))
    Z = np.asarray(l2_normalize_columns(jnp.asarray(Z)))
    Y = np.asarray(
        l2_normalize_columns(jnp.asarray(rng.normal(size=(d, K)), jnp.float32))
    )
    codes = np.zeros((len(B_vec), Np), np.int32)
    for c, b in enumerate(B_vec):
        codes[c, :N] = rng.integers(0, b, N)
    counts = np.concatenate(
        [np.bincount(codes[c, :N], minlength=b) for c, b in enumerate(B_vec)]
    )
    Pr_b = (counts / N).astype(np.float32)
    sigma = np.full(K, 0.1, np.float32)
    theta = np.full(cfg.B, 1.0, np.float32)

    Zj, Yj, cj = jnp.asarray(Z), jnp.asarray(Y), jnp.asarray(codes)
    dist = ops.compute_distances(Yj, Zj)
    R = ops.initial_assignments(dist, jnp.asarray(sigma))
    if Np != N:
        R = R * (jnp.arange(Np) < N)[None, :].astype(R.dtype)
    E = ops.compute_E(R, jnp.asarray(Pr_b))
    O = ops.compute_O(R, cj, cfg.covariate_offsets, cfg.B)
    perm = jnp.asarray(rng.permutation(N).astype(np.int32))
    return cfg, Zj, Yj, R, E, O, cj, jnp.asarray(Pr_b), jnp.asarray(
        sigma
    ), jnp.asarray(theta), perm


@pytest.mark.parametrize("B_vec", [(3,), (2, 3)])
@pytest.mark.parametrize("sub_tile", [128, 256])
def test_pallas_matches_xla(B_vec, sub_tile):
    cfg, Z, Y, R, E, O, codes, Pr_b, sigma, theta, perm = _problem(
        B_vec=B_vec
    )
    ref = block_update_round(
        cfg, Z, Y, R, E, O, codes, Pr_b, sigma, theta, perm
    )
    out = pallas_block_update_round(
        cfg, Z, Y, R, E, O, codes, Pr_b, sigma, theta, perm,
        sub_tile=sub_tile, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(out.R), np.asarray(ref.R), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out.E), np.asarray(ref.E), atol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(out.O), np.asarray(ref.O), atol=1e-3
    )
    np.testing.assert_allclose(
        float(out.kmeans_error), float(ref.kmeans_error), rtol=1e-4
    )
    np.testing.assert_allclose(
        float(out.entropy), float(ref.entropy), rtol=1e-4
    )


def test_pallas_with_sharding_pad():
    cfg, Z, Y, R, E, O, codes, Pr_b, sigma, theta, perm = _problem(
        N=500, N_pad=512
    )
    ref = block_update_round(
        cfg, Z, Y, R, E, O, codes, Pr_b, sigma, theta, perm
    )
    out = pallas_block_update_round(
        cfg, Z, Y, R, E, O, codes, Pr_b, sigma, theta, perm,
        sub_tile=128, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(out.R), np.asarray(ref.R), atol=1e-5)
    assert np.all(np.asarray(out.R)[:, 500:] == 0)


def test_engine_pallas_impl_end_to_end():
    """Full run with estep_impl='pallas' (interpret on CPU) matches xla."""
    import dataclasses

    from harmony_tpu.driver import harmonize
    from harmony_tpu.engine import make_engine
    from harmony_tpu.preprocess import (
        build_design, expand_hyperparams, orient_embedding, resolve_config,
    )
    from harmony_tpu.state import init_state
    from harmony_tpu.config import harmony_options

    from conftest import make_synthetic

    Z, meta = make_synthetic(None, n_cells=200, d=6, seed=4)
    design = build_design(meta, ["dataset"])
    Zt = orient_embedding(Z, 200)
    cfg = resolve_config(
        n_cells=200, d=6, design=design, nclust=5, max_iter=2,
        early_stop=False, options=harmony_options(), verbose=False,
    )
    hp = expand_hyperparams(design, cfg.K, None, 0.1, 1.0, 0)
    rng = np.random.default_rng(0)
    Y0 = Zt[:, rng.choice(200, cfg.K, replace=False)]
    perms = np.stack(
        [np.stack([rng.permutation(200) for _ in range(cfg.max_iter_cluster)])
         for _ in range(2)]
    ).astype(np.int32)

    outs = {}
    for impl in ("xla", "pallas"):
        c = dataclasses.replace(cfg, estep_impl=impl, estep_sub_tile=64)
        st = init_state(c, Zt, design, hp.sigma, hp.theta, hp.lamb,
                        jax.random.PRNGKey(0))
        eng = make_engine(c)
        st = eng.init_cluster_from(st, jnp.asarray(Y0))
        st = harmonize(eng, st, max_iter=2, perms=perms)
        outs[impl] = np.asarray(st.Z_corr)
    np.testing.assert_allclose(outs["pallas"], outs["xla"], atol=1e-4)
