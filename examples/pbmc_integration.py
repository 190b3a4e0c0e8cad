"""PBMC stimulated-vs-control integration — the Seurat-vignette analog.

Reproduces the reference's Seurat workflow in NumPy + harmony_tpu:
concatenate the Kang et al. 2017 control and stimulated PBMC count
matrices, log-normalise, scale the top variable genes (scaleData), PCA,
then Harmony over the 'stim' covariate.

Run:  python examples/pbmc_integration.py
"""

import numpy as np

from harmony_tpu import run_harmony
from harmony_tpu.datasets import pbmc_dataset


def main():
    ds = pbmc_dataset(n_pcs=20)
    print(f"{ds.n_cells} cells ({np.unique(ds.meta_data['stim'], return_counts=True)})")

    obj = run_harmony(
        ds.scaled_pcs, ds.meta_data, ["stim"], return_object=True,
        verbose=True,
    )
    chi2_before = None
    chi2_after = float(np.sum((obj.O - obj.E) ** 2 / obj.E))
    print("objective per round:", np.round(obj.objective_harmony, 2))
    print(f"final chi2(cluster, condition) = {chi2_after:.1f}")

    # condition-mixing measure: fraction of each cell's 30 nearest
    # neighbours from the other condition (higher = better mixed)
    emb = obj.embeddings
    cond = ds.meta_data["stim"]

    def mixing(M, k=30, sample=300):
        rng = np.random.default_rng(0)
        pick = rng.choice(len(M), sample, replace=False)
        Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
        sims = Mn[pick] @ Mn.T
        out = []
        for i, p in enumerate(pick):
            nn = np.argsort(sims[i])[::-1][1 : k + 1]
            out.append(np.mean(cond[nn] != cond[p]))
        return float(np.mean(out))

    print(f"cross-condition kNN mixing: before={mixing(ds.scaled_pcs):.3f} "
          f"after={mixing(emb):.3f} (0.5 = perfectly mixed)")


if __name__ == "__main__":
    main()
