"""Batched 2D-3D absolute-pose RANSAC (depth-free relocalization).

TPU-native counterpart of the reference's `PnPsolver.cc` (~950 LoC EPnP
inside a sequential RANSAC loop, SURVEY.md §3.1): relocalization must
work from pixel observations alone — the depth-backed 3D-3D Horn path
cannot serve mono frames or features without depth. Per SURVEY.md
§8.3#2, sequential RANSAC becomes a fixed hypothesis batch evaluated in
parallel: each hypothesis solves a 6-point DLT for the projection
matrix (12x12 normal-matrix eigenvector, batched `eigh`), decomposes it
into the nearest rigid pose with cheirality disambiguation, and all
hypotheses are scored against every correspondence at once; the winner
is polished by the Huber-LM motion-only solver upstream.

DLT-P6P differs from the reference's EPnP mechanism but serves the same
role with the same RANSAC contract (minimal-ish sample -> pose ->
inlier count); on TPU the batched formulation is the faster shape.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry.camera import Pinhole

SAMPLE = 6   # DLT needs >= 5.5 points; 6 gives an exactly-determined A


class PnPResult(NamedTuple):
    R: jax.Array          # (3, 3) world->cam rotation
    t: jax.Array          # (3,) world->cam translation
    inliers: jax.Array    # (N,) bool at the winning hypothesis
    n_inliers: jax.Array  # () int32
    ok: jax.Array         # () bool — enough points and a finite solution


def _dlt_pose(Xw: jax.Array, xy: jax.Array):
    """One 6-point DLT: world points (S, 3) + normalized image coords
    (S, 2) -> (R, t) with cheirality-chosen sign."""
    X, Y, Z = Xw[:, 0], Xw[:, 1], Xw[:, 2]
    x, y = xy[:, 0], xy[:, 1]
    one = jnp.ones_like(X)
    zero = jnp.zeros_like(X)
    rows_u = jnp.stack(
        [X, Y, Z, one, zero, zero, zero, zero,
         -x * X, -x * Y, -x * Z, -x], axis=-1)
    rows_v = jnp.stack(
        [zero, zero, zero, zero, X, Y, Z, one,
         -y * X, -y * Y, -y * Z, -y], axis=-1)
    A = jnp.concatenate([rows_u, rows_v], axis=0)        # (2S, 12)
    M = A.T @ A
    _, vecs = jnp.linalg.eigh(M)                         # ascending
    p = vecs[:, 0]
    P = p.reshape(3, 4)

    def rigidify(Ps):
        U, S, Vt = jnp.linalg.svd(Ps[:, :3])
        D = jnp.sign(jnp.linalg.det(U @ Vt))
        R = U @ jnp.diag(jnp.asarray([1.0, 1.0, 1.0]).at[2].set(D)) @ Vt
        t = Ps[:, 3] / jnp.maximum(jnp.mean(S), 1e-12)
        return R, t

    # the DLT null vector has an unknown global sign; pick by cheirality
    Rp, tp = rigidify(P)
    Rm, tm = rigidify(-P)
    zp = Xw @ Rp.T[:, 2] + tp[2]
    zm = Xw @ Rm.T[:, 2] + tm[2]
    use_p = jnp.sum((zp > 0).astype(jnp.int32)) >= jnp.sum(
        (zm > 0).astype(jnp.int32))
    R = jnp.where(use_p, Rp, Rm)
    t = jnp.where(use_p, tp, tm)
    return R, t


def pnp_ransac(
    cam: Pinhole,
    p_world: jax.Array,     # (N, 3)
    uv: jax.Array,          # (N, 2) pixel observations
    level: jax.Array,       # (N,) int32 pyramid level (chi2 scaling)
    valid: jax.Array,       # (N,) bool
    key: jax.Array,
    n_hypotheses: int = 256,
    chi2_th: float = 5.991,
    scale_factor: float = 1.2,
    min_inliers: int = 12,
) -> PnPResult:
    """Parallel-hypothesis 2D-3D pose RANSAC.

    Inlier test: squared pixel error < chi2_th * sigma^2(level), the
    reference PnPsolver's per-level threshold."""
    N = p_world.shape[0]
    n_valid = jnp.sum(valid.astype(jnp.int32))
    # dense list of valid slots (padded by repetition of the first valid)
    _, vid = jax.lax.top_k(valid.astype(jnp.float32), N)
    # sample indices in [0, n_valid)
    samp = jax.random.randint(
        key, (n_hypotheses, SAMPLE), 0, jnp.maximum(n_valid, 1))
    sel = vid[samp]                                       # (H, S)
    Xw = p_world[sel]                                     # (H, S, 3)
    xy = jnp.stack(
        [(uv[sel][..., 0] - cam.cx) / cam.fx,
         (uv[sel][..., 1] - cam.cy) / cam.fy], axis=-1)   # (H, S, 2)
    R, t = jax.vmap(_dlt_pose)(Xw, xy)                    # (H,3,3), (H,3)

    # score every hypothesis against every correspondence
    pc = jnp.einsum("hij,nj->hni", R, p_world) + t[:, None, :]
    z = pc[..., 2]
    u = cam.fx * pc[..., 0] / jnp.maximum(z, 1e-6) + cam.cx
    v = cam.fy * pc[..., 1] / jnp.maximum(z, 1e-6) + cam.cy
    err2 = (u - uv[None, :, 0]) ** 2 + (v - uv[None, :, 1]) ** 2
    sigma2 = (scale_factor ** 2) ** level.astype(jnp.float32)
    inl = valid[None, :] & (z > 0.05) & (err2 < chi2_th * sigma2[None, :])
    counts = jnp.sum(inl.astype(jnp.int32), axis=1)       # (H,)
    finite = jnp.all(jnp.isfinite(R.reshape(n_hypotheses, -1)), axis=-1) & \
        jnp.all(jnp.isfinite(t), axis=-1)
    counts = jnp.where(finite, counts, -1)
    best = jnp.argmax(counts)
    n_best = counts[best]
    ok = (n_best >= min_inliers) & (n_valid >= SAMPLE)
    return PnPResult(
        R=R[best], t=t[best], inliers=inl[best],
        n_inliers=jnp.maximum(n_best, 0), ok=ok,
    )
