"""Float64 NumPy oracle mirroring the reference C++ engine op-for-op.

R cannot run in this environment, so trajectory parity is established
against this straight-line NumPy transliteration of the reference math
(every step cites ``src/harmony.cpp``). It is deliberately *not*
TPU-idiomatic: it loops over clusters and blocks exactly like the C++ so
that the JAX engine can be validated against it on shared injected
randomness (initial centroids + block permutations), in float64 to bound
accumulation-order effects.

The reference's own build supports a double-precision mode
(``configure:185-199``), so float64 is a legitimate comparison target.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence

import numpy as np

from .config import HarmonyConfig
from .preprocess import DesignMatrix


def _l2norm_cols(X):
    n = np.linalg.norm(X, axis=0, keepdims=True)
    return X / np.where(n == 0, 1.0, n)


@dataclasses.dataclass
class OracleHarmony:
    """State + methods mirroring class ``harmony`` (src/harmony.h:20-70)."""

    cfg: HarmonyConfig
    Z_orig: np.ndarray  # (d, N)
    design: DesignMatrix
    sigma: np.ndarray  # (K,)
    theta: np.ndarray  # (B,)
    lamb: np.ndarray  # (B+1,)

    def __post_init__(self):
        cfg = self.cfg
        self.N, self.d, self.K, self.B = cfg.N, cfg.d, cfg.K, cfg.B
        self.Z_corr = _l2norm_cols(self.Z_orig.astype(np.float64))
        # dense Phi (B, N) from the stacked one-hot design (R/ui.R:210-213)
        self.Phi = np.zeros((self.B, self.N))
        gc = self.design.global_codes
        for c in range(gc.shape[0]):
            self.Phi[gc[c], np.arange(self.N)] += 1.0
        self.batch_sizes = self.Phi.sum(axis=1)
        self.Pr_b = self.batch_sizes / self.N
        self.O = np.zeros((self.K, self.B))
        self.E = np.zeros((self.K, self.B))
        self.R = np.zeros((self.K, self.N))
        self.dist = np.zeros((self.K, self.N))
        self.Y = np.zeros((self.d, self.K))
        self.objective_kmeans: List[float] = []
        self.objective_kmeans_dist: List[float] = []
        self.objective_kmeans_entropy: List[float] = []
        self.objective_kmeans_cross: List[float] = []
        self.objective_harmony: List[float] = []
        self.kmeans_rounds: List[int] = []

    # ---- init (src/harmony.cpp:131-156) ----------------------------------
    def init_cluster(self, Y0: np.ndarray):
        self.Y = _l2norm_cols(Y0.astype(np.float64))
        self.dist = 2.0 * (1.0 - self.Y.T @ self.Z_corr)
        R = np.exp(-self.dist / self.sigma[:, None])
        self.R = R / R.sum(axis=0, keepdims=True)
        self.E = self.R.sum(axis=1, keepdims=True) * self.Pr_b[None, :]
        self.O = self.R @ self.Phi.T
        self.compute_objective()
        self.objective_harmony.append(self.objective_kmeans[-1])

    # ---- objective (src/harmony.cpp:158-170) ------------------------------
    def compute_objective(self):
        nc = 2000.0 / self.N
        kmeans_error = float(np.sum(self.R * self.dist))
        with np.errstate(divide="ignore", invalid="ignore"):
            xlogx = np.where(self.R > 0, self.R * np.log(self.R), 0.0)
        entropy = float(np.sum(self.sigma[:, None] * xlogx))
        pen = self.theta[None, :] * np.log(
            (self.O + self.E + 1.0) / (2.0 * self.E + 1.0)
        )
        cross = float(np.sum(self.R * self.sigma[:, None] * (pen @ self.Phi)))
        self.objective_kmeans.append((kmeans_error + entropy + cross) * nc)
        self.objective_kmeans_dist.append(kmeans_error * nc)
        self.objective_kmeans_entropy.append(entropy * nc)
        self.objective_kmeans_cross.append(cross * nc)

    # ---- convergence (src/harmony.cpp:173-205) ----------------------------
    def check_convergence(self, typ: int) -> bool:
        w = self.cfg.window_size
        if typ == 0:
            ok = self.objective_kmeans
            obj_old = sum(ok[-2 - i] for i in range(w))
            obj_new = sum(ok[-1 - i] for i in range(w))
            return abs(obj_old - obj_new) / abs(obj_old) < self.cfg.epsilon_cluster
        obj_old, obj_new = self.objective_harmony[-2], self.objective_harmony[-1]
        return (obj_old - obj_new) / abs(obj_old) < self.cfg.epsilon_harmony

    # ---- E-step (src/harmony.cpp:208-342) ----------------------------------
    def cluster(self, perms: Sequence[np.ndarray]) -> int:
        cfg = self.cfg
        if len(self.objective_harmony) != 1:
            # re-entry re-estimation (src/harmony.cpp:214-228)
            self.Z_corr = _l2norm_cols(self.Z_corr)
            self.dist = 2.0 * (1.0 - self.Y.T @ self.Z_corr)
            R = np.exp(-self.dist / self.sigma[:, None])
            self.R = R / R.sum(axis=0, keepdims=True)
            self.E = self.R.sum(axis=1, keepdims=True) * self.Pr_b[None, :]
            self.O = self.R @ self.Phi.T

        it = 0
        for it in range(cfg.max_iter_cluster):
            self.update_R(np.asarray(perms[it]))
            self.compute_objective()
            if it > cfg.window_size and self.check_convergence(0):
                it += 1
                break
        else:
            it = cfg.max_iter_cluster
        self.kmeans_rounds.append(it)
        self.objective_harmony.append(self.objective_kmeans[-1])
        return 0

    def update_R(self, perm: np.ndarray):
        """Block-sequential online update (src/harmony.cpp:269-342)."""
        cfg = self.cfg
        n_blocks = cfg.n_blocks
        cpb = cfg.cells_per_block
        Rp = self.R[:, perm]
        dp = self.dist[:, perm]
        Pp = self.Phi[:, perm]
        for i in range(n_blocks):
            lo = i * cpb
            hi = (i + 1) * cpb if i < n_blocks - 1 else self.N
            Rb, db, Pb = Rp[:, lo:hi], dp[:, lo:hi], Pp[:, lo:hi]
            self.E -= Rb.sum(axis=1, keepdims=True) * self.Pr_b[None, :]
            self.O -= Rb @ Pb.T
            Rb = np.exp(-db / self.sigma[:, None])
            Rb /= Rb.sum(axis=0, keepdims=True)
            pen = ((2.0 * self.E + 1.0) / (self.O + self.E + 1.0)) ** self.theta[
                None, :
            ]
            Rb = Rb * (pen @ Pb)
            Rb /= Rb.sum(axis=0, keepdims=True)
            self.E += Rb.sum(axis=1, keepdims=True) * self.Pr_b[None, :]
            self.O += Rb @ Pb.T
            Rp[:, lo:hi] = Rb
        inv = np.empty_like(perm)
        inv[perm] = np.arange(self.N)
        self.R = Rp[:, inv]

    # ---- M-step (src/harmony.cpp:345-638) ----------------------------------
    def moe_correct_ridge(self):
        cfg = self.cfg
        self.Z_corr = self.Z_orig.astype(np.float64).copy()
        cov_of_b = np.concatenate(
            [np.full(b, c) for c, b in enumerate(cfg.B_vec)]
        )
        Phi_moe = np.vstack([np.ones((1, self.N)), self.Phi])  # (B+1, N)

        for k in range(self.K):
            avg_R = self.O[k] / self.batch_sizes
            present = avg_R > cfg.batch_prop_cutoff
            cov_levels = np.array(
                [present[cov_of_b == c].sum() for c in range(cfg.n_covariates)]
            )
            keep_b = present & (cov_levels[cov_of_b] > 1)
            if not np.any(cov_levels > 1):
                continue  # skip cluster (src/harmony.cpp:449-452)

            # cells in any kept batch (src/harmony.cpp:389-402)
            cell_keep = np.zeros(self.N, dtype=bool)
            gc = self.design.global_codes
            for c in range(gc.shape[0]):
                cell_keep |= keep_b[gc[c]]
            cells = np.where(cell_keep)[0]
            kept = np.where(keep_b)[0]

            Phi_k = np.vstack(
                [np.ones((1, cells.size)), self.Phi[np.ix_(kept, cells)]]
            )
            Rk = self.R[k, cells]
            if cfg.lambda_estimation:
                lam = np.concatenate([[0.0], cfg.alpha * self.E[k, kept]])
            else:
                lam = np.concatenate([[0.0], self.lamb[1 + kept]])

            Phi_Rk = Phi_k * Rk[None, :]
            Phi_cov = Phi_Rk @ Phi_k.T + np.diag(lam)
            inv_cov = np.linalg.inv(Phi_cov)
            Z_tmp = self.Z_orig[:, cells] * Rk[None, :]
            # W = inv_cov @ (Phi_k Z_tmp^T) (src/harmony.cpp:595-609)
            W = inv_cov @ (Phi_k @ Z_tmp.T)
            self.Y[:, k] = W[0]  # centroid refresh (src/harmony.cpp:610)
            W[0] = 0.0
            self.Z_corr[:, cells] -= W.T @ Phi_Rk
        self.Y = _l2norm_cols(self.Y)

    # ---- outer loop (R/utils.R:15-46) --------------------------------------
    def harmonize(self, perms, max_iter: Optional[int] = None) -> int:
        """perms: (rounds, max_iter_cluster, N) injected permutations."""
        if max_iter is None:
            max_iter = self.cfg.max_iter_harmony
        for it in range(max_iter):
            self.cluster(perms[it])
            self.moe_correct_ridge()
            if self.check_convergence(1):
                return it + 1
        return max_iter
