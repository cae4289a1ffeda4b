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
from ..geometry.align import umeyama_alignment
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


_COVERAGE_CELL_PX = 40  # image-grid cell for the dispersion score


def _tight_score(cam, Tcw, pw, obs_uv, inv_sigma2, valid, tight_chi2,
                 trust=None):
    """Spatial-coverage consensus score of a pose hypothesis.

    Primary term: the number of image-grid cells (40 px) containing at
    least one tight-window inlier. A coherent mover is spatially COMPACT
    (the same assumption the CRF's Potts pairwise term encodes, SURVEY.md
    §4.5) while the static world surrounds it, so even when the mover
    supplies the majority of matches — e.g. a close walking person
    filling the depth-sorted keyframe spawn budget — its basin lights up
    only its own silhouette's cells, while the true pose's inliers cover
    the frame. Raw (even trust-weighted) counts fail exactly there: at
    bootstrap every track is young, trust is uniform, and a 2/3-majority
    mover outvotes the dispersed statics. Secondary term: a small
    trust-weighted inlier mass to break coverage ties.
    """
    pc = pw @ Tcw[:3, :3].T + Tcw[:3, 3]
    z = jnp.maximum(pc[..., 2], 1e-6)
    u = cam.fx * pc[..., 0] / z + cam.cx
    v = cam.fy * pc[..., 1] / z + cam.cy
    chi2 = (
        jnp.square(u - obs_uv[..., 0]) + jnp.square(v - obs_uv[..., 1])
    ) * inv_sigma2
    ok = (chi2 < tight_chi2) & valid & (pc[..., 2] > 0.05)
    w = ok.astype(jnp.float32) if trust is None else ok * trust
    nx = -(-cam.width // _COVERAGE_CELL_PX)
    ny = -(-cam.height // _COVERAGE_CELL_PX)
    cu = jnp.clip(obs_uv[..., 0] // _COVERAGE_CELL_PX, 0, nx - 1)
    cv = jnp.clip(obs_uv[..., 1] // _COVERAGE_CELL_PX, 0, ny - 1)
    cell = (cv * nx + cu).astype(jnp.int32)
    hit = jnp.zeros((nx * ny,), jnp.float32).at[cell].max(
        ok.astype(jnp.float32))
    coverage = jnp.sum(hit)
    return coverage + 0.01 * jnp.sum(w, axis=-1)


def pose_consensus(
    cam: Pinhole,
    T_lm: jax.Array,       # (4, 4) the LM solve to audit
    pw: jax.Array,         # (N, 3) matched world points
    pc_cam: jax.Array,     # (N, 3) frame keypoints unprojected by depth
    obs_uv: jax.Array,     # (N, 2)
    level: jax.Array,      # (N,)
    valid3d: jax.Array,    # (N,) bool: usable for hypothesis sampling
    valid_score: jax.Array,  # (N,) bool: counted in consensus
    key: jax.Array,
    n_hypotheses: int = 64,
    tight_chi2: float = 4.0,
    scale_factor: float = 1.2,
    audit_points: int = 256,
    trust: jax.Array | None = None,  # (N,) per-point anchor trust
):
    """Capture-resistance audit of a motion-only solve.

    A coherently moving cluster can capture the Huber LM solve into a
    compromise basin whose STANDARD-chi2 inlier count exceeds the true
    pose's (the cluster fits exactly, far statics fit loosely) — count-
    based reclassification then locks in the wrong pose. The bias is
    visible only under a TIGHT threshold: near the true pose the static
    majority fits to noise level, while the compromise fits the (smaller)
    cluster plus few statics. So: sample batched 3-point Horn hypotheses
    from depth-unprojected keypoints vs map points, score every
    hypothesis AND the LM pose with a tight reprojection window, and
    report the best hypothesis with both scores; the caller re-polishes
    from the hypothesis when it decisively wins. Replaces nothing in the
    reference (whose tracker is capturable — its walking-sequence
    failure mode [SURVEY.md §7]); this is the TPU-parallel complement to
    the CRF labeler that lets evidence be measured at an uncaptured pose.
    """
    N = pw.shape[0]
    inv_sigma2 = (1.0 / scale_factor**2) ** level.astype(jnp.float32)
    k_sample, k_audit = jax.random.split(key)
    # Anchor trust: when a coherent mover supplies the MAJORITY of
    # matches (a large rigid surface re-spawning fresh points every
    # keyframe), raw inlier counts prefer its basin and the audit itself
    # is captured. Long-lived consistently-found tracks are the reliable
    # anchors (the paper's long-term-consistency thesis applied to the
    # solver): trust weights both the hypothesis sampling and the
    # tight-window scores, so a minority of mature statics outvotes a
    # majority of young dynamics.
    if trust is None:
        trust = jnp.ones((N,), jnp.float32)
    p = valid3d.astype(jnp.float32) * trust
    p = p / jnp.maximum(jnp.sum(p), 1e-6)
    idx = jax.random.choice(k_sample, N, shape=(n_hypotheses, 3), p=p)
    _, R_h, t_h = umeyama_alignment(pw[idx], pc_cam[idx], with_scale=False)
    # audit on a random SUBSAMPLE of the associations: polishing/scoring
    # every hypothesis against every match is ~10x the motion-only
    # solve's FLOPs for no statistical gain — a few hundred points
    # separate the basins just as decisively (the tight-score gap is
    # ~20% of the count).
    n_audit = min(audit_points, N)
    rnd = jnp.where(
        valid_score, jax.random.uniform(k_audit, (N,)), -1.0
    )
    _, sub = jax.lax.top_k(rnd, n_audit)
    pw_s, uv_s = pw[sub], obs_uv[sub]
    inv_s, vs_s = inv_sigma2[sub], valid_score[sub]
    tr_s = trust[sub]
    T_h = (
        jnp.zeros((n_hypotheses, 4, 4), pw.dtype)
        .at[:, :3, :3].set(R_h)
        .at[:, :3, 3].set(t_h)
        .at[:, 3, 3].set(1.0)
    )
    # MSAC-style polish: a raw 3-point Horn pose carries the depth noise
    # (~cm), far too loose to collect a tight-window consensus; refine
    # every hypothesis with gated Gauss-Newton on the PIXEL residuals,
    # tightening the gate each sweep so the moving cluster (many px off
    # a static-born hypothesis) drops out while the static majority
    # anchors the pose to sub-pixel.
    mono_ur = jnp.full((n_audit,), -1.0, pw.dtype)
    not_stereo = jnp.zeros((n_audit,), bool)

    def polish(T):
        def sweep(T, gate_chi2):
            r, J, z_ok = _residuals_jacobians(
                cam, T, pw_s, uv_s, mono_ur, not_stereo
            )
            chi2 = jnp.sum(r * r, axis=-1) * inv_s
            w = jnp.where(
                vs_s & z_ok & (chi2 < gate_chi2), inv_s * tr_s, 0.0
            )
            H = jnp.einsum("nij,n,nik->jk", J, w, J)
            g = jnp.einsum("nij,n,ni->j", J, w, r)
            dx = -jnp.linalg.solve(H + 1e-6 * jnp.eye(6), g)
            return exp_se3(dx) @ T, None

        # Gate schedule starts at 9 (3px at level 0), NOT looser: a slow
        # coherent mover sits ~3-8px off a static-seeded hypothesis, and
        # a first sweep that admits it drags EVERY hypothesis into the
        # same compromise basin as the LM solve before scoring can
        # separate them (observed on the rendered billboard scenario).
        # Depth-unprojected Horn seeds are accurate enough for a 3px
        # first gate; hypothesis diversity covers the noisy-depth case.
        T, _ = jax.lax.scan(
            sweep, T, jnp.asarray([9.0, 4.0, tight_chi2]))
        return T

    T_h = jax.vmap(polish)(T_h)
    scores = jax.vmap(
        lambda T: _tight_score(
            cam, T, pw_s, uv_s, inv_s, vs_s, tight_chi2, tr_s
        )
    )(T_h)
    best = jnp.argmax(scores)
    score_lm = _tight_score(
        cam, T_lm, pw_s, uv_s, inv_s, vs_s, tight_chi2, tr_s
    )
    # inlier set of the winning hypothesis under a slightly relaxed
    # window: the caller re-polishes RESTRICTED to this set — running the
    # standard solve (with its generous 5.991 reclassification windows)
    # over all matches from the rescued pose would simply re-admit the
    # cluster and fall back into the compromise minimum.
    T_best = T_h[best]
    pc = pw @ T_best[:3, :3].T + T_best[:3, 3]
    z = jnp.maximum(pc[:, 2], 1e-6)
    u = cam.fx * pc[:, 0] / z + cam.cx
    v = cam.fy * pc[:, 1] / z + cam.cy
    chi2 = (
        jnp.square(u - obs_uv[:, 0]) + jnp.square(v - obs_uv[:, 1])
    ) * inv_sigma2
    best_mask = (chi2 < 2.0 * tight_chi2) & valid_score & (pc[:, 2] > 0.05)
    return T_best, scores[best], score_lm, best_mask
