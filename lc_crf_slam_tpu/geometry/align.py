"""Point-set alignment: Umeyama (for ATE) and weighted Horn / Sim3.

Covers two reference roles (SURVEY.md §3.1, §5):
  - the Horn closed-form absolute orientation inside `Sim3Solver.cc`
    (used with RANSAC for loop closing; scale fixed to 1 for RGB-D), and
  - the Horn/Umeyama trajectory alignment of TUM's `evaluate_ate.py`
    used by the evaluation protocol.
Both are jit-safe, support per-point weights (for masked RANSAC batches),
and broadcast over leading batch dimensions.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-9


def _weighted_stats(src, dst, w):
    """Common centroid / covariance computation.

    src, dst: (..., N, 3); w: (..., N) nonneg weights.
    Returns centroids (..., 3), cross-covariance (..., 3, 3), src variance.
    """
    wsum = jnp.maximum(jnp.sum(w, axis=-1, keepdims=True), _EPS)
    wn = w / wsum  # normalized weights
    mu_s = jnp.sum(wn[..., None] * src, axis=-2)
    mu_d = jnp.sum(wn[..., None] * dst, axis=-2)
    cs = src - mu_s[..., None, :]
    cd = dst - mu_d[..., None, :]
    # Sigma = sum_i w_i * cd_i cs_i^T  (maps src frame -> dst frame)
    Sigma = jnp.einsum("...n,...ni,...nj->...ij", wn, cd, cs)
    var_s = jnp.sum(wn * jnp.sum(cs * cs, axis=-1), axis=-1)
    return mu_s, mu_d, Sigma, var_s


def umeyama_alignment(src, dst, w=None, with_scale: bool = False):
    """Least-squares similarity dst ≈ s R src + t.

    src, dst: (..., N, 3). w: optional (..., N) weights.
    Returns (s, R, t) with s scalar (...,), R (..., 3, 3), t (..., 3).
    SVD-based Umeyama with determinant correction.
    """
    if w is None:
        w = jnp.ones(src.shape[:-1], src.dtype)
    mu_s, mu_d, Sigma, var_s = _weighted_stats(src, dst, w)
    U, D, Vt = jnp.linalg.svd(Sigma)
    det = jnp.linalg.det(U) * jnp.linalg.det(Vt)
    S = jnp.ones(src.shape[:-2] + (3,), src.dtype)
    S = S.at[..., 2].set(jnp.where(det < 0, -1.0, 1.0))
    R = U @ (S[..., :, None] * Vt)
    if with_scale:
        s = jnp.sum(D * S, axis=-1) / jnp.maximum(var_s, _EPS)
    else:
        s = jnp.ones(src.shape[:-2], src.dtype)
    t = mu_d - s[..., None] * (R @ mu_s[..., None])[..., 0]
    return s, R, t


def horn_sim3(src, dst, w=None, fix_scale: bool = True):
    """Horn closed-form Sim3 (quaternion-free SVD variant).

    Same solution as Sim3Solver::ComputeSim3 in the reference lineage;
    returns the Sim3 tuple (s, R, t) mapping src -> dst. RGB-D loop
    closing calls this with fix_scale=True.
    """
    s, R, t = umeyama_alignment(src, dst, w=w, with_scale=not fix_scale)
    return (s, R, t)


def alignment_residuals(src, dst, s, R, t):
    """Per-point residual norms after applying (s, R, t) to src."""
    mapped = s[..., None, None] * jnp.einsum("...ij,...nj->...ni", R, src) + t[..., None, :]
    return jnp.linalg.norm(mapped - dst, axis=-1)
