"""Bundle-adjustment solvers: motion-only pose optimization.

TPU-native replacement for the reference's g2o glue
(`Optimizer::PoseOptimization`, SURVEY.md §3.1): batched analytic
reprojection Jacobians + Huber-weighted Levenberg-Marquardt on a single
SE3 vertex, with the reference's schedule — 4 rounds x 10 iterations,
chi2-based outlier re-classification between rounds (5.991 mono /
7.815 stereo), per-level information weights 1/1.2^(2l). Local/global
BA (multi-vertex, Schur complement) lives in schur.py / mapping.py.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import PoseOptConfig
from ..geometry.camera import Pinhole
from ..geometry.se3 import exp_se3, hat_so3


class PoseOptResult(NamedTuple):
    Tcw: jax.Array       # (4, 4) optimized pose
    inliers: jax.Array   # (N,) bool
    chi2: jax.Array      # () final weighted chi2 over inliers
    n_inliers: jax.Array  # () int32


def _residuals_jacobians(cam: Pinhole, Tcw, pw, obs_uv, obs_ur, is_stereo):
    """Per-point residual (N, 3) and Jacobian (N, 3, 6) wrt left-mult twist.

    Third residual row (uR) is zeroed for mono points. Returns also the
    positive-depth mask.
    """
    R = Tcw[:3, :3]
    t = Tcw[:3, 3]
    pc = pw @ R.T + t  # (N, 3)
    x, y, z = pc[:, 0], pc[:, 1], pc[:, 2]
    z_ok = z > 1e-3
    zs = jnp.where(z_ok, z, 1.0)
    inv_z = 1.0 / zs
    inv_z2 = inv_z * inv_z

    u = cam.fx * x * inv_z + cam.cx
    v = cam.fy * y * inv_z + cam.cy
    ur = u - cam.bf * inv_z

    r_u = u - obs_uv[:, 0]
    r_v = v - obs_uv[:, 1]
    r_r = jnp.where(is_stereo, ur - obs_ur, 0.0)
    r = jnp.stack([r_u, r_v, r_r], axis=-1)

    # d(residual)/d(pc)
    du = jnp.stack([cam.fx * inv_z, jnp.zeros_like(z), -cam.fx * x * inv_z2], -1)
    dv = jnp.stack([jnp.zeros_like(z), cam.fy * inv_z, -cam.fy * y * inv_z2], -1)
    dr = du + jnp.stack(
        [jnp.zeros_like(z), jnp.zeros_like(z), cam.bf * inv_z2], -1
    )
    dr = jnp.where(is_stereo[:, None], dr, 0.0)
    d_pc = jnp.stack([du, dv, dr], axis=-2)  # (N, 3, 3)

    # d(pc)/d(twist [ups, omega]) = [I | -hat(pc)]
    I3 = jnp.broadcast_to(jnp.eye(3, dtype=pc.dtype), (pc.shape[0], 3, 3))
    d_twist = jnp.concatenate([I3, -hat_so3(pc)], axis=-1)  # (N, 3, 6)
    J = d_pc @ d_twist  # (N, 3, 6)
    return r, J, z_ok


def pose_optimize(
    cam: Pinhole,
    Tcw0: jax.Array,
    pw: jax.Array,
    obs_uv: jax.Array,
    obs_ur: jax.Array,
    level: jax.Array,
    valid: jax.Array,
    cfg: PoseOptConfig = PoseOptConfig(),
    scale_factor: float = 1.2,
) -> PoseOptResult:
    """Motion-only BA. obs_ur < 0 marks mono observations.

    Mirrors Optimizer::PoseOptimization: between rounds, points whose chi2
    exceeds the threshold are excluded (and re-included if they pass
    again); the final inlier mask is returned for tracking bookkeeping.
    """
    is_stereo = obs_ur >= 0
    inv_sigma2 = (1.0 / scale_factor**2) ** level.astype(jnp.float32)
    chi2_th = jnp.where(is_stereo, cfg.chi2_stereo, cfg.chi2_mono)
    delta = jnp.where(is_stereo, cfg.huber_delta_stereo, cfg.huber_delta_mono)

    def point_chi2(Tcw, active):
        r, _, z_ok = _residuals_jacobians(cam, Tcw, pw, obs_uv, obs_ur, is_stereo)
        chi2 = jnp.sum(r * r, axis=-1) * inv_sigma2
        return chi2, z_ok & active

    def lm_round(Tcw, active, n_iters):
        def body(_, carry):
            Tcw, lam, best_chi2 = carry
            r, J, z_ok = _residuals_jacobians(
                cam, Tcw, pw, obs_uv, obs_ur, is_stereo
            )
            ok = active & z_ok
            chi2 = jnp.sum(r * r, axis=-1) * inv_sigma2
            # Huber IRLS weight on top of the information weight
            s = jnp.sqrt(jnp.maximum(chi2, 1e-12))
            w_huber = jnp.where(s <= delta, 1.0, delta / s)
            w = jnp.where(ok, inv_sigma2 * w_huber, 0.0)
            H = jnp.einsum("nij,n,nik->jk", J, w, J)
            g = jnp.einsum("nij,n,ni->j", J, w, r)
            H_lm = H + lam * jnp.diag(jnp.diag(H)) + 1e-9 * jnp.eye(6)
            delta_xi = -jnp.linalg.solve(H_lm, g)
            T_new = exp_se3(delta_xi) @ Tcw
            chi2_new_pts, ok_new = point_chi2(T_new, active)
            # robustified total for accept test (Huber rho)
            def total(c, okm):
                s = jnp.sqrt(jnp.maximum(c, 1e-12))
                rho = jnp.where(
                    s <= delta, c, 2.0 * delta * s - delta * delta
                )
                return jnp.sum(jnp.where(okm, rho, 0.0))

            chi2_pts, ok_old = point_chi2(Tcw, active)
            f_old = total(chi2_pts, ok_old)
            f_new = total(chi2_new_pts, ok_new)
            accept = f_new < f_old
            Tcw = jnp.where(accept, T_new, Tcw)
            lam = jnp.where(accept, lam * 0.5, lam * 4.0)
            lam = jnp.clip(lam, 1e-9, 1e6)
            return Tcw, lam, jnp.minimum(f_old, f_new)

        Tcw, _, chi2 = jax.lax.fori_loop(
            0, n_iters, body, (Tcw, jnp.asarray(cfg.init_lambda), jnp.inf)
        )
        return Tcw, chi2

    Tcw = Tcw0
    active = valid
    for _ in range(cfg.rounds):
        Tcw, _ = lm_round(Tcw, active, cfg.iters_per_round)
        chi2_pts, ok = point_chi2(Tcw, valid)  # re-test ALL valid points
        active = ok & (chi2_pts < chi2_th)

    chi2_pts, ok = point_chi2(Tcw, valid)
    inliers = ok & (chi2_pts < chi2_th)
    chi2_total = jnp.sum(jnp.where(inliers, chi2_pts, 0.0))
    return PoseOptResult(
        Tcw=Tcw,
        inliers=inliers,
        chi2=chi2_total,
        n_inliers=jnp.sum(inliers.astype(jnp.int32)),
    )
