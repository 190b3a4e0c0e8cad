"""Streamed ingest (runtime.AsyncIngest + api stream_ingest): the chunked
background upload with on-device reorder must be value-identical to the
host-side path — streaming only changes when bytes move."""

import numpy as np
import pytest

from harmony_tpu import run_harmony
from harmony_tpu.sharding import make_mesh

from conftest import make_synthetic


def _run(Z, meta, stream, mesh=None, **kw):
    return run_harmony(
        Z, meta, ["dataset"], nclust=5, max_iter=2, seed=3,
        stream_ingest=stream, mesh=mesh, return_object=True, **kw,
    )


@pytest.mark.parametrize("shuffle_mode", ["rotate", "permute"])
def test_streamed_equals_hostpath(shuffle_mode):
    Z, meta = make_synthetic(None, n_cells=300, d=8, seed=9)
    a = _run(Z, meta, False, shuffle_mode=shuffle_mode)
    b = _run(Z, meta, True, shuffle_mode=shuffle_mode)
    np.testing.assert_array_equal(
        np.asarray(a.state.Z_orig), np.asarray(b.state.Z_orig)
    )
    np.testing.assert_array_equal(a.embeddings, b.embeddings)
    np.testing.assert_array_equal(
        np.asarray(a.state.objective_harmony),
        np.asarray(b.state.objective_harmony),
    )


def test_streamed_equals_hostpath_mesh():
    """Mesh runs upload per-shard slices directly onto their devices."""
    Z, meta = make_synthetic(None, n_cells=400, d=8, seed=9)
    mesh = make_mesh(8)
    a = _run(Z, meta, False, mesh=mesh, shuffle_mode="rotate")
    b = _run(Z, meta, True, mesh=mesh, shuffle_mode="rotate")
    np.testing.assert_array_equal(
        np.asarray(a.state.Z_orig), np.asarray(b.state.Z_orig)
    )
    np.testing.assert_array_equal(a.embeddings, b.embeddings)


def test_streamed_bfloat16_chunks():
    """bf16 runs cast on host and ship half the bytes; values must match
    the unstreamed bf16 path exactly."""
    Z, meta = make_synthetic(None, n_cells=256, d=6, seed=2)
    a = _run(Z, meta, False, dtype="bfloat16")
    b = _run(Z, meta, True, dtype="bfloat16")
    np.testing.assert_array_equal(
        np.asarray(a.state.Z_orig).astype(np.float32),
        np.asarray(b.state.Z_orig).astype(np.float32),
    )
    np.testing.assert_array_equal(
        np.asarray(a.embeddings).astype(np.float32),
        np.asarray(b.embeddings).astype(np.float32),
    )


def test_async_ingest_chunking_and_pad():
    """AsyncIngest pads to cfg.Np, uploads in column chunks, and applies
    the ingest permutation on device."""
    import jax.numpy as jnp

    from harmony_tpu.config import HarmonyConfig
    from harmony_tpu.runtime import AsyncIngest

    rng = np.random.default_rng(0)
    d, N, Np = 6, 100, 112
    Z = rng.normal(size=(d, N))
    cfg = HarmonyConfig(N=N, d=d, K=3, B=2, B_vec=(2,), N_pad=Np)
    # tiny chunks to force multi-part assembly
    ing = AsyncIngest(Z, cfg, chunk_bytes=d * 4 * 16)
    perm = rng.permutation(N).astype(np.int32)
    out = np.asarray(ing.result(perm))
    assert out.shape == (d, Np)
    np.testing.assert_allclose(
        out[:, :N], Z.astype(np.float32)[:, perm], rtol=0, atol=0
    )
    assert np.all(out[:, N:] == 0)
