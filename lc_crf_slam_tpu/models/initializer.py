"""Monocular two-view initialization.

Counterpart of the reference's `Initializer.cc` (SURVEY.md §3.1):
bootstrap a monocular map from 2D-2D correspondences between a reference
frame and the current frame. TPU-native shape — instead of the
reference's parallel H/F RANSAC threads, a batched essential-matrix
RANSAC (intrinsics known): all H hypothesis 8-point solves and scorings
run in parallel, the best E is decomposed into the 4 (R, t) candidates,
cheirality voting picks the pose, and the initial map triangulates with
scale normalized to unit median depth (the reference's convention).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry.camera import Pinhole
from ..geometry.se3 import make_se3
from ..ops.triangulate import triangulate_pairs


class MonoInit(NamedTuple):
    Tcw2: jax.Array       # (4, 4) pose of the second view (first = I)
    xyz: jax.Array        # (N, 3) triangulated points (unit median depth)
    ok: jax.Array         # (N,) bool valid points
    n_good: jax.Array
    accepted: jax.Array


def _normalize(cam: Pinhole, uv: jax.Array) -> jax.Array:
    return jnp.stack(
        [(uv[:, 0] - cam.cx) / cam.fx, (uv[:, 1] - cam.cy) / cam.fy],
        axis=-1,
    )


def _eight_point(x1: jax.Array, x2: jax.Array) -> jax.Array:
    """E from >=8 normalized correspondences ((M, 2) each) by SVD."""
    a = jnp.concatenate([x1, jnp.ones((x1.shape[0], 1))], axis=-1)
    b = jnp.concatenate([x2, jnp.ones((x2.shape[0], 1))], axis=-1)
    A = jnp.einsum("ni,nj->nij", b, a).reshape(x1.shape[0], 9)
    _, _, Vt = jnp.linalg.svd(A)
    E = Vt[-1].reshape(3, 3)
    # project onto the essential manifold (two equal singular values)
    U, S, Vt2 = jnp.linalg.svd(E)
    s = (S[0] + S[1]) * 0.5
    return U @ jnp.diag(jnp.asarray([s, s, 0.0])) @ Vt2


def _sampson_error(E: jax.Array, x1: jax.Array, x2: jax.Array) -> jax.Array:
    a = jnp.concatenate([x1, jnp.ones((x1.shape[0], 1))], axis=-1)
    b = jnp.concatenate([x2, jnp.ones((x2.shape[0], 1))], axis=-1)
    Ea = a @ E.T
    Etb = b @ E
    num = jnp.sum(b * (a @ E.T), axis=-1) ** 2
    den = Ea[:, 0] ** 2 + Ea[:, 1] ** 2 + Etb[:, 0] ** 2 + Etb[:, 1] ** 2
    return num / jnp.maximum(den, 1e-12)


def initialize_mono(
    cam: Pinhole,
    uv1: jax.Array, uv2: jax.Array, valid: jax.Array,
    key: jax.Array,
    n_hypotheses: int = 256,
    inlier_tol: float = 3.0e-6,    # Sampson in normalized coords (~1px)
    min_inliers: int = 60,
    min_parallax_cos: float = 0.99995,
) -> MonoInit:
    """Two-view bootstrap from matched pixel pairs (N each, masked)."""
    N = uv1.shape[0]
    x1 = _normalize(cam, uv1)
    x2 = _normalize(cam, uv2)
    p = valid.astype(jnp.float32)
    p = p / jnp.maximum(jnp.sum(p), 1.0)
    idx = jax.random.choice(key, N, shape=(n_hypotheses, 8), p=p)
    Es = jax.vmap(lambda i: _eight_point(x1[i], x2[i]))(idx)
    errs = jax.vmap(lambda E: _sampson_error(E, x1, x2))(Es)   # (H, N)
    inl = (errs < inlier_tol) & valid[None, :]
    scores = jnp.sum(inl.astype(jnp.int32), axis=-1)
    best = jnp.argmax(scores)
    E = Es[best]
    inliers = inl[best]

    # decompose: 4 candidates
    U, _, Vt = jnp.linalg.svd(E)
    d = jnp.linalg.det(U @ Vt)
    U = U * jnp.sign(d)  # keep det(R)=+1 overall
    W = jnp.asarray([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]])
    R1 = U @ W @ Vt
    R2 = U @ W.T @ Vt
    R1 = R1 * jnp.sign(jnp.linalg.det(R1))
    R2 = R2 * jnp.sign(jnp.linalg.det(R2))
    t = U[:, 2]
    t = t / jnp.maximum(jnp.linalg.norm(t), 1e-9)
    T1w = jnp.eye(4)

    def score_pose(R, tt):
        Tcw2 = make_se3(R, tt)
        tri = triangulate_pairs(
            cam, T1w, Tcw2, uv1, uv2, inliers,
            min_parallax_cos=min_parallax_cos,
        )
        return jnp.sum(tri.ok.astype(jnp.int32)), Tcw2, tri

    cands = [
        score_pose(R1, t), score_pose(R1, -t),
        score_pose(R2, t), score_pose(R2, -t),
    ]
    counts = jnp.stack([c[0] for c in cands])
    bi = jnp.argmax(counts)
    Tcw2 = jnp.stack([c[1] for c in cands])[bi]
    xyz = jnp.stack([c[2].xyz for c in cands])[bi]
    ok = jnp.stack([c[2].ok for c in cands])[bi]
    n_good = counts[bi]
    # reference convention: normalize scale to unit median scene depth
    depths = jnp.where(ok, xyz[:, 2], jnp.nan)
    med = jnp.nanmedian(depths)
    med = jnp.where(jnp.isfinite(med) & (med > 1e-6), med, 1.0)
    xyz = xyz / med
    Tcw2 = Tcw2.at[:3, 3].set(Tcw2[:3, 3] / med)
    # best-of-4 must dominate (reference's similar ratio check)
    second = jnp.sort(counts)[-2]
    accepted = (n_good >= min_inliers) & (
        second.astype(jnp.float32) < 0.7 * n_good.astype(jnp.float32)
    )
    return MonoInit(
        Tcw2=Tcw2, xyz=xyz, ok=ok & accepted, n_good=n_good,
        accepted=accepted,
    )
