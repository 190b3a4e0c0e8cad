"""Test configuration: run everything on CPU with 8 virtual devices.

Must run before the first ``import jax`` anywhere in the test session so the
XLA flags take effect (SURVEY.md §4: shard-count-invariance tests on a faked
device mesh).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# A site plugin may have force-set jax_platforms (e.g. to a TPU plugin) at
# interpreter start; the config value wins over the env var, so re-force it.
jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu", jax.devices()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)


def make_synthetic(
    rng, n_cells=300, d=10, n_batches=3, n_types=4, batch_shift=2.0, seed=None
):
    """Synthetic cell embedding with known batch structure.

    Cell types define cluster structure; batches add a systematic offset that
    Harmony should remove.
    """
    if seed is not None:
        rng = np.random.default_rng(seed)
    types = rng.integers(0, n_types, size=n_cells)
    batches = rng.integers(0, n_batches, size=n_cells)
    type_centers = rng.normal(size=(n_types, d)) * 3.0
    batch_offsets = rng.normal(size=(n_batches, d)) * batch_shift
    Z = (
        type_centers[types]
        + batch_offsets[batches]
        + rng.normal(size=(n_cells, d)) * 0.5
    )
    meta = {
        "dataset": np.array([f"b{b}" for b in batches]),
        "cell_type": np.array([f"t{t}" for t in types]),
    }
    return Z.astype(np.float64), meta


@pytest.fixture()
def synthetic(rng):
    return make_synthetic(rng, seed=123)
