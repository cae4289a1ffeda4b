"""Trajectory evaluation: ATE and RPE.

Self-hosted equivalent of TUM's `evaluate_ate.py` / `evaluate_rpe.py`,
the external scripts the reference's protocol depends on (SURVEY.md §5):
timestamp association, Horn/Umeyama SE3 alignment, ATE RMSE, and
fixed-delta relative pose error.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

import jax.numpy as jnp

from ..geometry.align import umeyama_alignment


@dataclass
class ATEResult:
    rmse: float
    mean: float
    median: float
    max: float
    n_pairs: int

    def __repr__(self):
        return (
            f"ATE(rmse={self.rmse:.4f}m mean={self.mean:.4f} "
            f"median={self.median:.4f} max={self.max:.4f} n={self.n_pairs})"
        )


def _associate_timestamps(ts_a, ts_b, max_difference=0.02):
    """Nearest-neighbor greedy matching of two sorted timestamp arrays."""
    pairs = []
    j = 0
    used_b = np.zeros(len(ts_b), dtype=bool)
    for i, t in enumerate(ts_a):
        j = int(np.searchsorted(ts_b, t))
        best, best_d = -1, max_difference
        for k in (j - 1, j, j + 1):
            if 0 <= k < len(ts_b) and not used_b[k]:
                d = abs(ts_b[k] - t)
                if d < best_d:
                    best, best_d = k, d
        if best >= 0:
            used_b[best] = True
            pairs.append((i, best))
    return pairs


def evaluate_ate(
    ts_est, poses_est_twc, ts_gt, poses_gt_twc,
    max_difference: float = 0.02, with_scale: bool = False,
) -> ATEResult:
    """Absolute trajectory error after Umeyama alignment (TUM protocol)."""
    ts_est = np.asarray(ts_est)
    ts_gt = np.asarray(ts_gt)
    pairs = _associate_timestamps(ts_est, ts_gt, max_difference)
    if len(pairs) < 2:
        raise ValueError(f"only {len(pairs)} associated pose pairs")
    ei = np.array([p[0] for p in pairs])
    gi = np.array([p[1] for p in pairs])
    p_est = np.asarray(poses_est_twc)[ei, :3, 3]
    p_gt = np.asarray(poses_gt_twc)[gi, :3, 3]
    s, R, t = umeyama_alignment(
        jnp.asarray(p_est, jnp.float32),
        jnp.asarray(p_gt, jnp.float32),
        with_scale=with_scale,
    )
    s, R, t = np.asarray(s), np.asarray(R), np.asarray(t)
    aligned = s * (p_est @ R.T) + t
    err = np.linalg.norm(aligned - p_gt, axis=-1)
    return ATEResult(
        rmse=float(np.sqrt(np.mean(err**2))),
        mean=float(np.mean(err)),
        median=float(np.median(err)),
        max=float(np.max(err)),
        n_pairs=len(pairs),
    )


def evaluate_rpe(
    ts_est, poses_est_twc, ts_gt, poses_gt_twc,
    delta: float = 1.0, max_difference: float = 0.02,
):
    """Relative pose error over a fixed time delta (translational drift).

    Returns (trans_rmse [m], rot_rmse [rad]).
    """
    ts_est = np.asarray(ts_est)
    ts_gt = np.asarray(ts_gt)
    pairs = _associate_timestamps(ts_est, ts_gt, max_difference)
    ei = np.array([p[0] for p in pairs])
    gi = np.array([p[1] for p in pairs])
    Te = np.asarray(poses_est_twc)[ei]
    Tg = np.asarray(poses_gt_twc)[gi]
    ts = ts_est[ei]
    terrs, rerrs = [], []
    for i in range(len(ts)):
        j = int(np.searchsorted(ts, ts[i] + delta))
        if j >= len(ts):
            break
        de = np.linalg.inv(Te[i]) @ Te[j]
        dg = np.linalg.inv(Tg[i]) @ Tg[j]
        e = np.linalg.inv(dg) @ de
        terrs.append(np.linalg.norm(e[:3, 3]))
        c = np.clip((np.trace(e[:3, :3]) - 1) / 2, -1, 1)
        rerrs.append(np.arccos(c))
    if not terrs:
        return 0.0, 0.0
    return (
        float(np.sqrt(np.mean(np.array(terrs) ** 2))),
        float(np.sqrt(np.mean(np.array(rerrs) ** 2))),
    )
