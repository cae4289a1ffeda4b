"""Sim3 relative-transform refinement (the reference's OptimizeSim3).

SURVEY.md §3.1 Optimizer.cc `OptimizeSim3` / §4.4 ComputeSim3: after the
Horn RANSAC produces a candidate S12 between the current and loop
keyframes, the reference refines it with g2o over BIDIRECTIONAL mono
reprojection edges (project KF2's points through S12 into KF1's image
and KF1's points through S12^-1 into KF2's), Huber-robust, pruning
outliers between rounds. This is the batched TPU equivalent: fixed-
iteration Gauss-Newton on the 7-dim tangent [ups, omega, sigma], both
directions' residuals stacked, forward-mode AD Jacobians (7 dual evals
per iteration), chi2 inlier reclassification. `fix_scale` pins sigma
(RGB-D/stereo); mono leaves it free so the loop measures relative map
scale — the input `optimize_pose_graph_sim3` needs for drift correction.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry.camera import Pinhole
from ..geometry.sim3 import exp_sim3, sim3_apply, sim3_compose, sim3_inverse


class Sim3Refine(NamedTuple):
    s: jax.Array          # () refined scale
    R: jax.Array          # (3, 3)
    t: jax.Array          # (3,)
    inliers: jax.Array    # (N,) bool (both directions within chi2)
    n_inliers: jax.Array  # () int32


def _proj(cam: Pinhole, pc: jax.Array) -> jax.Array:
    z = jnp.maximum(pc[..., 2], 1e-6)
    return jnp.stack(
        [cam.fx * pc[..., 0] / z + cam.cx,
         cam.fy * pc[..., 1] / z + cam.cy], axis=-1)


def optimize_sim3(
    cam: Pinhole,
    S12,                       # initial (s, R, t): maps KF2-cam -> KF1-cam
    pc1: jax.Array,            # (N, 3) matched points in KF1 camera frame
    pc2: jax.Array,            # (N, 3) matched points in KF2 camera frame
    uv1: jax.Array,            # (N, 2) observed pixels in KF1
    uv2: jax.Array,            # (N, 2) observed pixels in KF2
    valid: jax.Array,          # (N,) bool
    inv_sigma2: jax.Array,     # (N,) information weight by pyramid level
    fix_scale: bool = True,
    n_iters: int = 8,
    huber_delta: float = 3.1623,   # sqrt(10) — reference's deltaHuber
    chi2_th: float = 9.21,         # reference's 2-dof 99% gate
) -> Sim3Refine:
    """Gauss-Newton refinement of S12 with bidirectional reprojection."""
    s0, R0, t0 = S12
    coord = jnp.ones((7,), t0.dtype)
    if fix_scale:
        coord = coord.at[6].set(0.0)

    def residuals(xi, s, R, t):
        S = sim3_compose(exp_sim3(xi), (s, R, t))
        r1 = _proj(cam, sim3_apply(S, pc2)) - uv1       # (N, 2)
        r2 = _proj(cam, sim3_apply(sim3_inverse(S), pc1)) - uv2
        return jnp.concatenate([r1, r2], axis=0)        # (2N, 2)

    w_lvl = jnp.concatenate([inv_sigma2, inv_sigma2])

    def chi2_of(r):
        return jnp.sum(r * r, axis=-1) * w_lvl

    z7 = jnp.zeros((7,), t0.dtype)

    def body(_, carry):
        s, R, t, keep = carry
        r = residuals(z7, s, R, t)                      # (2N, 2)
        J = jax.jacfwd(lambda xi: residuals(xi, s, R, t))(z7)  # (2N, 2, 7)
        J = J * coord[None, None, :]
        chi2 = chi2_of(r)
        sqc = jnp.sqrt(jnp.maximum(chi2, 1e-12))
        w_huber = jnp.where(sqc <= huber_delta, 1.0, huber_delta / sqc)
        act = jnp.concatenate([valid, valid]) & keep
        w = jnp.where(act, w_lvl * w_huber, 0.0)
        H = jnp.einsum("nij,n,nik->jk", J, w, J)
        g = jnp.einsum("nij,n,ni->j", J, w, r)
        # keep fixed coordinates invertible
        H = H + jnp.diag(1e-6 + (1.0 - coord))
        dx = -jnp.linalg.solve(H, g) * coord
        s_n, R_n, t_n = sim3_compose(exp_sim3(dx), (s, R, t))
        # chi2 reclassification at the updated transform
        chi2_new = chi2_of(residuals(z7, s_n, R_n, t_n))
        keep = chi2_new < chi2_th
        return s_n, R_n, t_n, keep

    keep0 = jnp.ones((2 * pc1.shape[0],), bool)
    s, R, t, keep = jax.lax.fori_loop(
        0, n_iters, body, (s0, R0, t0, keep0))
    N = pc1.shape[0]
    inl = keep[:N] & keep[N:] & valid
    return Sim3Refine(
        s=s, R=R, t=t, inliers=inl,
        n_inliers=jnp.sum(inl.astype(jnp.int32)),
    )
