"""Quickstart: integrate the bundled cell-line dataset.

The analog of the reference's quickstart vignette: two 10x runs (one pure
jurkat, one pure t293, one 50:50 mix) whose scaled PCs separate by dataset
before integration and mix after.

Run:  python examples/quickstart.py [--plot out.png]
"""

import argparse

import numpy as np

from harmony_tpu import run_harmony, harmony_options
from harmony_tpu.datasets import cell_lines


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--plot", default=None, help="save a before/after PNG")
    args = ap.parse_args()

    ds = cell_lines()
    print(f"{ds.n_cells} cells, {ds.scaled_pcs.shape[1]} PCs, "
          f"datasets: {sorted(set(ds.meta_data['dataset']))}")

    obj = run_harmony(
        ds.scaled_pcs, ds.meta_data, ["dataset"], return_object=True,
        verbose=True,
    )
    print("objective per round:", np.round(obj.objective_harmony, 2))

    # batch mixing: chi2 between cluster and batch assignment
    chi2 = float(np.sum((obj.O - obj.E) ** 2 / obj.E))
    print(f"final chi2(cluster, batch) = {chi2:.1f}")

    if args.plot:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, axes = plt.subplots(1, 2, figsize=(10, 4))
        for ax, emb, title in [
            (axes[0], ds.scaled_pcs, "before"),
            (axes[1], obj.embeddings, "after harmony"),
        ]:
            for name in sorted(set(ds.meta_data["dataset"])):
                m = ds.meta_data["dataset"] == name
                ax.scatter(emb[m, 0], emb[m, 1], s=3, alpha=0.5, label=name)
            ax.set_title(title)
            ax.legend(markerscale=3, fontsize=8)
        fig.tight_layout()
        fig.savefig(args.plot, dpi=100)
        print("wrote", args.plot)


if __name__ == "__main__":
    main()
