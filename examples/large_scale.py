"""Production-scale recipe: the zero-gather rotate schedule, device
meshes, bfloat16 and crash recovery.

The quickstart covers the reference-faithful small-data path; this
example shows the knobs a production run at millions of cells uses (the
analog of the reference's PERFORMANCE.md guidance, which is about BLAS
backends — on TPU the levers are the schedule, the mesh and the dtype).

Sized down so it runs anywhere (including the CPU test environment);
scale ``N_CELLS`` up on real hardware — the same code integrates 10M
cells x 100 batches on one v5e chip in bfloat16 (PERFORMANCE.md scale
table).
"""

import os
import tempfile

import numpy as np

from harmony_tpu import harmony_options, run_harmony

N_CELLS = int(os.environ.get("N_CELLS", 20_000))

rng = np.random.default_rng(0)
d, n_types = 20, 8
types = rng.integers(0, n_types, N_CELLS)
donor = rng.integers(0, 4, N_CELLS)
condition = rng.integers(0, 2, N_CELLS)
Z = (
    (rng.normal(size=(n_types, d)) * 3.0)[types]
    + (rng.normal(size=(4, d)) * 0.9)[donor]
    + (rng.normal(size=(2, d)) * 0.9)[condition]
    + rng.normal(size=(N_CELLS, d)) * 0.5
)
meta = {"donor": donor.astype(str), "condition": condition.astype(str)}

ckpt = os.path.join(tempfile.mkdtemp(), "run.npz")
res = run_harmony(
    Z,
    meta,
    ["donor", "condition"],  # multi-covariate designs ride the fast path
    # shuffle_mode="auto" (default): reference-exact below 100k cells,
    # the ~30x-faster zero-gather rotate schedule above. Force it here so
    # the example exercises the production path at any N_CELLS:
    shuffle_mode="rotate",
    # dtype="bfloat16",            # halves HBM traffic at scale
    # mesh="auto",                 # shard cells over all local devices
    # stream_ingest="auto" (default): uploads >=256 MB stream in
    #   engine-dtype chunks on a background thread, overlapped with the
    #   layout/engine build; mesh runs place per-shard slices directly
    checkpoint_path=ckpt,  # crash recovery: resume via the CLI
    #   (harmony-tpu run ... --checkpoint PATH), which rebuilds the
    #   rotate ingest order from the checkpoint's provenance meta —
    #   load_checkpoint alone would pair the shuffled state with
    #   unshuffled inputs
    nclust=50,
    max_iter=5,
    verbose=True,  # per-round objective + cells/s progress lines
    return_object=True,
    options=harmony_options(),
    seed=0,
)

emb = res.embeddings
print(f"integrated {N_CELLS} cells; corrected embedding {emb.shape}")
print("phase walls:", {k: round(v, 3) for k, v in res.phase_seconds().items()})
assert np.isfinite(emb).all()

# the diversity objective's chi^2 statistic shrinks vs the raw input
O, E = res.O, res.E
chi2 = float(((O - E) ** 2 / np.maximum(E, 1e-12)).sum())
print(f"chi2(O, E) after integration: {chi2:.1f}")
print(f"checkpoint for crash recovery at: {ckpt}")
