"""Batched-hypothesis RANSAC for 3D-3D alignment (Horn / Sim3).

Replaces the reference's sequential `Sim3Solver::iterate` RANSAC
(SURVEY.md §3.1) with the TPU-native shape: all hypotheses evaluated in
parallel — sample H minimal sets, solve Horn closed-form for each via
the batched Umeyama, score inliers by symmetric 3D consistency, refine
the best hypothesis on its inliers (SURVEY.md §8.3#2). Also used by
RGB-D relocalization (3D-3D instead of the reference's EPnP, since
depth gives the frame's keypoints 3D positions).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry.align import umeyama_alignment


class RansacResult(NamedTuple):
    s: jax.Array        # () scale
    R: jax.Array        # (3, 3)
    t: jax.Array        # (3,)
    inliers: jax.Array  # (N,) bool
    n_inliers: jax.Array


def horn_ransac(
    src: jax.Array,          # (N, 3)
    dst: jax.Array,          # (N, 3)
    valid: jax.Array,        # (N,) bool
    key: jax.Array,
    n_hypotheses: int = 256,
    inlier_tol: float = 0.10,   # meters, 3D consistency
    fix_scale: bool = True,
    min_set: int = 3,
) -> RansacResult:
    """Robust similarity dst ≈ s R src + t over correspondences."""
    N = src.shape[0]
    p_valid = valid.astype(jnp.float32)
    p_valid = p_valid / jnp.maximum(jnp.sum(p_valid), 1.0)
    # sample minimal sets (with replacement; degenerate sets score poorly)
    idx = jax.random.choice(
        key, N, shape=(n_hypotheses, min_set), p=p_valid
    )
    src_h = src[idx]                      # (H, 3, 3)
    dst_h = dst[idx]
    s_h, R_h, t_h = umeyama_alignment(
        src_h, dst_h, with_scale=not fix_scale
    )
    # score all hypotheses against all correspondences
    mapped = (
        s_h[:, None, None]
        * jnp.einsum("hij,nj->hni", R_h, src)
        + t_h[:, None, :]
    )
    err = jnp.linalg.norm(mapped - dst[None, :, :], axis=-1)  # (H, N)
    inl = (err < inlier_tol) & valid[None, :]
    scores = jnp.sum(inl.astype(jnp.int32), axis=-1)
    best = jnp.argmax(scores)
    best_inl = inl[best]
    # refine on the best inlier set (weighted Umeyama)
    w = best_inl.astype(jnp.float32)
    s, R, t = umeyama_alignment(src, dst, w=w, with_scale=not fix_scale)
    mapped = s * src @ R.T + t
    err = jnp.linalg.norm(mapped - dst, axis=-1)
    inliers = (err < inlier_tol) & valid
    return RansacResult(
        s=s, R=R, t=t, inliers=inliers,
        n_inliers=jnp.sum(inliers.astype(jnp.int32)),
    )
