"""Tracking: per-frame pose estimation against the last frame and the map.

TPU-native counterpart of the reference's `Tracking.cc` hot path
(SURVEY.md §4.2): motion-model prediction -> projection-gated matching
against the last frame (including temporal "visual odometry" points from
depth, cf. UpdateLastFrame) -> motion-only pose optimization ->
track-local-map (frustum culling + projection matching + second pose
optimization) -> keyframe decision (RGB-D close-point rules) ->
keyframe/new-point insertion (CreateNewKeyFrame's depth-backed points).

Everything is jit-compiled over fixed shapes; the only host decision per
frame is whether to run the (jitted) keyframe insertion, mirroring the
reference's Tracking -> LocalMapping handoff.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..config import SLAMConfig
from ..geometry.camera import Pinhole
from ..geometry.se3 import orthonormalize_se3, se3_inverse
from ..ops.match import (
    hamming_matrix,
    match_nn,
    projection_gate,
    resolve_duplicates,
    rotation_consistency,
)
from .ba import pose_consensus, pose_optimize
from .frame import Frame
from .mapstate import (
    MapState, add_keyframe, add_points, near_dynamic_envelope,
)

LOCAL_POINTS = 4096  # fixed capacity of the tracked local-map window


class TrackState(NamedTuple):
    Tcw: jax.Array          # (4, 4) current camera pose (world->cam)
    vel: jax.Array          # (4, 4) constant-velocity model Tcw_t @ Twc_{t-1}
    last_uv: jax.Array      # (K, 2) last frame features
    last_ur: jax.Array      # (K,)
    last_depth: jax.Array   # (K,)
    last_level: jax.Array   # (K,) int32
    last_angle: jax.Array   # (K,)
    last_desc: jax.Array    # (K, 8) uint32
    last_valid: jax.Array   # (K,) bool
    last_obs: jax.Array     # (K,) int32 map point per last-frame feature
    frame_idx: jax.Array    # () int32 frames processed
    ref_kf: jax.Array       # () int32
    ref_matches: jax.Array  # () int32 inlier count when ref KF was made
    n_since_kf: jax.Array   # () int32
    status: jax.Array      # () int32: 0 uninit / 1 ok / 2 lost


class TrackInfo(NamedTuple):
    n_mm_matches: jax.Array
    n_inliers: jax.Array
    n_local_matches: jax.Array
    n_tracked_close: jax.Array
    n_untracked_close: jax.Array
    need_kf: jax.Array
    obs: jax.Array          # (K,) int32 final per-feature map-point ids
    inlier: jax.Array       # (K,) bool final per-feature inlier mask
    near_map: jax.Array     # (K,) bool feature lies on an existing point's
                            # projection (duplicate guard for KF insertion)
    rescued: jax.Array      # () bool: consensus audit replaced the solve
    ref_fallback: jax.Array  # () bool: TrackReferenceKeyFrame path used


def empty_track_state(cfg: SLAMConfig) -> TrackState:
    K = cfg.map.max_features
    f32, i32 = jnp.float32, jnp.int32
    return TrackState(
        Tcw=jnp.eye(4, dtype=f32),
        vel=jnp.eye(4, dtype=f32),
        last_uv=jnp.zeros((K, 2), f32),
        last_ur=jnp.full((K,), -1.0, f32),
        last_depth=jnp.zeros((K,), f32),
        last_level=jnp.zeros((K,), i32),
        last_angle=jnp.zeros((K,), f32),
        last_desc=jnp.zeros((K, 8), jnp.uint32),
        last_valid=jnp.zeros((K,), bool),
        last_obs=jnp.full((K,), -1, i32),
        frame_idx=jnp.asarray(0, i32),
        ref_kf=jnp.asarray(0, i32),
        ref_matches=jnp.asarray(0, i32),
        n_since_kf=jnp.asarray(0, i32),
        status=jnp.asarray(0, i32),
    )


def _depth_threshold(cam: Pinhole, cfg: SLAMConfig) -> float:
    """Close/far split: ThDepth * baseline (reference Tracking ctor)."""
    return cfg.tracking.th_depth * cam.bf / cam.fx


def _unproject_world(cam: Pinhole, Twc, uv, depth):
    x = (uv[:, 0] - cam.cx) / cam.fx * depth
    y = (uv[:, 1] - cam.cy) / cam.fy * depth
    pc = jnp.stack([x, y, depth], axis=-1)
    return pc @ Twc[:3, :3].T + Twc[:3, 3]


def _scale_radii(level: jax.Array, base: float, scale_factor: float):
    return base * scale_factor ** level.astype(jnp.float32)


def _point_scale_range(
    depth: jax.Array, level: jax.Array, n_levels: int, scale_factor: float
):
    """MapPoint scale-invariance distances from creation depth + level."""
    max_dist = depth * scale_factor ** level.astype(jnp.float32)
    min_dist = max_dist / scale_factor ** (n_levels - 1)
    return min_dist, max_dist


def initialize_map(
    cfg: SLAMConfig, cam: Pinhole, m: MapState, frame: Frame,
    timestamp: jax.Array,
) -> Tuple[MapState, TrackState]:
    """StereoInitialization: first frame becomes KF0 at identity; every
    keypoint with depth becomes a map point."""
    Tcw = jnp.eye(4, dtype=jnp.float32)
    create = frame.valid & (frame.depth > 0)
    pw = _unproject_world(cam, Tcw, frame.uv, frame.depth)  # Twc = I
    normal = -pw / jnp.maximum(jnp.linalg.norm(pw, axis=-1, keepdims=True), 1e-9)
    min_d, max_d = _point_scale_range(
        jnp.linalg.norm(pw, axis=-1), frame.level,
        cfg.orb.n_levels, cfg.orb.scale_factor,
    )
    m, ids = add_points(
        m, pw, frame.desc, normal, min_d, max_d, create, jnp.asarray(0),
        tomb_dyn_threshold=cfg.crf.dynamic_threshold,
        n_obs_init=0,    # add_keyframe's bump counts the observation
    )
    m, kf_idx = add_keyframe(m, frame, Tcw, timestamp, ids)
    ts = empty_track_state(cfg)._replace(
        Tcw=Tcw,
        last_uv=frame.uv,
        last_ur=frame.u_right,
        last_depth=frame.depth,
        last_level=frame.level,
        last_angle=frame.angle,
        last_desc=frame.desc,
        last_valid=frame.valid,
        last_obs=ids,
        ref_kf=kf_idx,
        ref_matches=jnp.sum((ids >= 0).astype(jnp.int32)),
        status=jnp.asarray(1, jnp.int32),
    )
    return m, ts


def track_step(
    cfg: SLAMConfig, cam: Pinhole, m: MapState, ts: TrackState, frame: Frame,
) -> Tuple[TrackState, MapState, TrackInfo]:
    """One tracking iteration. Returns updated track state (pose, last-frame
    buffers), map with updated point statistics, and per-frame info."""
    mcfg = cfg.matcher
    T_pred = ts.vel @ ts.Tcw

    # ---- 1. match against last frame (motion model) ------------------------
    Twc_last = se3_inverse(ts.Tcw)
    pw_last = jnp.where(
        (ts.last_obs >= 0)[:, None],
        m.p_xyz[jnp.maximum(ts.last_obs, 0)],
        _unproject_world(cam, Twc_last, ts.last_uv, ts.last_depth),
    )
    has3d = ts.last_valid & ((ts.last_obs >= 0) | (ts.last_depth > 0))
    pc_pred = pw_last @ T_pred[:3, :3].T + T_pred[:3, 3]
    z_pred = pc_pred[:, 2]
    uv_proj = jnp.stack(
        [
            cam.fx * pc_pred[:, 0] / jnp.maximum(z_pred, 1e-6) + cam.cx,
            cam.fy * pc_pred[:, 1] / jnp.maximum(z_pred, 1e-6) + cam.cy,
        ],
        axis=-1,
    )
    cand_ok = has3d & (z_pred > 0.05)
    dist = hamming_matrix(frame.desc, ts.last_desc)

    def _motion_match(radius_mult):
        gate = projection_gate(
            frame.uv, uv_proj,
            _scale_radii(
                ts.last_level, radius_mult * mcfg.search_radius_motion,
                cfg.orb.scale_factor,
            ),
            frame.level, ts.last_level, level_tolerance=1,
        )
        gate &= frame.valid[:, None] & cand_ok[None, :]
        mm = match_nn(dist, mask=gate, max_dist=mcfg.th_high,
                      ratio=mcfg.nn_ratio_tracking)
        mm_valid = mm.valid
        if mcfg.check_orientation:
            mm_valid = rotation_consistency(
                frame.angle, ts.last_angle[mm.idx], mm_valid, mcfg.histo_bins
            )
        mm_valid = resolve_duplicates(mm.idx, mm.dist, mm_valid, frame.capacity)
        return mm, mm_valid

    # reference TrackWithMotionModel: retry with doubled window when the
    # first search yields too few matches
    mm_a, valid_a = _motion_match(1.0)
    mm_b, valid_b = _motion_match(2.0)
    use_wide = jnp.sum(valid_a.astype(jnp.int32)) < 20
    mm = jax.tree.map(
        lambda a, b: jnp.where(use_wide, b, a), mm_a, mm_b
    )
    mm_valid = jnp.where(use_wide, valid_b, valid_a)
    n_mm = jnp.sum(mm_valid.astype(jnp.int32))

    pw_mm = pw_last[mm.idx]
    obs_mm = jnp.where(mm_valid, ts.last_obs[mm.idx], -1)
    r1 = pose_optimize(
        cam, T_pred, pw_mm, frame.uv, frame.u_right, frame.level,
        mm_valid, cfg.pose_opt, cfg.orb.scale_factor,
    )
    T1 = r1.Tcw

    # ---- 1b. TrackReferenceKeyFrame fallback -------------------------------
    # reference Tracking::Track: when motion-model matching collapses
    # (jerk, blur, teleport), match the frame against the reference
    # keyframe's MAP POINTS and re-solve from the last pose before
    # declaring LOST (SURVEY.md §4.2). lax.cond keeps the dense ref-KF
    # matching off the healthy-frame hot path.
    mm_failed = (n_mm < 20) | (r1.n_inliers < 10)

    def _track_ref_kf(_):
        kf = ts.ref_kf
        obs_ref = m.kf_obs[kf]
        valid_ref = m.kf_valid[kf] & (obs_ref >= 0)
        dist_r = hamming_matrix(frame.desc, m.kf_desc[kf])
        gate_r = frame.valid[:, None] & valid_ref[None, :]
        mr = match_nn(dist_r, mask=gate_r, max_dist=mcfg.th_low,
                      ratio=0.7, mutual=True)
        mr_valid = mr.valid
        if mcfg.check_orientation:
            mr_valid = rotation_consistency(
                frame.angle, m.kf_angle[kf][mr.idx], mr_valid,
                mcfg.histo_bins,
            )
        mr_valid = resolve_duplicates(
            mr.idx, mr.dist, mr_valid, frame.capacity)
        obs_r = jnp.where(mr_valid, obs_ref[mr.idx], -1)
        ok_r = obs_r >= 0
        rr = pose_optimize(
            cam, ts.Tcw, m.p_xyz[jnp.maximum(obs_r, 0)], frame.uv,
            frame.u_right, frame.level, ok_r, cfg.pose_opt,
            cfg.orb.scale_factor,
        )
        return rr.Tcw, obs_r, ok_r, rr.n_inliers

    def _keep_motion_model(_):
        return T1, obs_mm, mm_valid & (obs_mm >= 0), r1.n_inliers

    T_fb, obs_fb, val_fb, n_fb = jax.lax.cond(
        mm_failed, _track_ref_kf, _keep_motion_model, None)
    use_fb = mm_failed & (n_fb >= 10)
    T1 = jnp.where(use_fb, T_fb, T1)
    obs_mm = jnp.where(use_fb, obs_fb, obs_mm)
    mm_valid = jnp.where(use_fb, val_fb, mm_valid)
    pw_mm = jnp.where(use_fb, m.p_xyz[jnp.maximum(obs_fb, 0)], pw_mm)

    # ---- 2. track local map ------------------------------------------------
    pc1 = m.p_xyz @ T1[:3, :3].T + T1[:3, 3]
    z1 = pc1[:, 2]
    uv1 = jnp.stack(
        [
            cam.fx * pc1[:, 0] / jnp.maximum(z1, 1e-6) + cam.cx,
            cam.fy * pc1[:, 1] / jnp.maximum(z1, 1e-6) + cam.cy,
        ],
        axis=-1,
    )
    dist_cam = jnp.linalg.norm(
        m.p_xyz - se3_inverse(T1)[:3, 3][None, :], axis=-1
    )
    in_frustum = (
        m.p_alive
        & (z1 > 0.05)
        & (uv1[:, 0] >= 5) & (uv1[:, 0] < cam.width - 5)
        & (uv1[:, 1] >= 5) & (uv1[:, 1] < cam.height - 5)
        & (dist_cam >= 0.8 * m.p_min_dist)
        & (dist_cam <= 1.2 * m.p_max_dist)
        & (m.p_dyn < cfg.crf.dynamic_threshold)
    )
    # fixed-capacity local window: prefer frustum points (ties by index)
    sel_score = in_frustum.astype(jnp.float32)
    _, local_ids = jax.lax.top_k(sel_score, LOCAL_POINTS)
    local_ok = in_frustum[local_ids]
    # predicted pyramid level from distance (MapPoint::PredictScale)
    ratio = jnp.maximum(m.p_max_dist[local_ids], 1e-6) / jnp.maximum(
        dist_cam[local_ids], 1e-6
    )
    pred_level = jnp.clip(
        jnp.ceil(jnp.log(ratio) / jnp.log(cfg.orb.scale_factor)),
        0, cfg.orb.n_levels - 1,
    ).astype(jnp.int32)
    gate2 = projection_gate(
        frame.uv, uv1[local_ids],
        _scale_radii(pred_level, cfg.matcher.search_radius_map,
                     cfg.orb.scale_factor),
        frame.level, pred_level, level_tolerance=1,
    )
    # only queries not already matched by the motion model
    unmatched_q = ~(mm_valid & (obs_mm >= 0))
    gate2 &= (frame.valid & unmatched_q)[:, None] & local_ok[None, :]
    dist2 = hamming_matrix(frame.desc, m.p_desc[local_ids])
    lm = match_nn(dist2, mask=gate2, max_dist=mcfg.th_high,
                  ratio=mcfg.nn_ratio_reloc)
    lm_valid = resolve_duplicates(lm.idx, lm.dist, lm.valid, LOCAL_POINTS)
    n_local = jnp.sum(lm_valid.astype(jnp.int32))
    # duplicate guard: features sitting on an existing map point's
    # projection (position + compatible depth) must not spawn new points
    # at keyframe insertion (the reference relies on LocalMapping::Fuse;
    # duplicated descriptors would poison the ratio test)
    z_local = z1[local_ids]
    depth_compat = jnp.abs(frame.depth[:, None] - z_local[None, :]) <= (
        0.15 * jnp.maximum(frame.depth[:, None], 0.3)
    )
    near_gate = projection_gate(frame.uv, uv1[local_ids], 4.0)
    near_map = jnp.any(
        near_gate & depth_compat & local_ok[None, :], axis=1
    ) & frame.valid

    # ---- 3. final pose optimization over all associations ------------------
    obs = jnp.where(
        mm_valid & (obs_mm >= 0), obs_mm,
        jnp.where(lm_valid, local_ids[lm.idx], -1),
    )
    pw_fin = jnp.where(
        (obs >= 0)[:, None], m.p_xyz[jnp.maximum(obs, 0)], pw_mm
    )
    # reference TrackLocalMap: the final solve uses MAP points only —
    # temporal VO anchors would re-inject last-frame pose error and turn
    # tracking into a drifting random walk. [CRF] dynamic-labeled points
    # are excluded from the edge set (SURVEY.md §4.5).
    assoc = (obs >= 0) & (
        m.p_dyn[jnp.maximum(obs, 0)] < cfg.crf.dynamic_threshold
    )
    # [CRF] flow-memory gate: exclude points whose LK-vs-egomotion EMA
    # says they move (see CRFConfig.solve_flow_gate) — the per-frame
    # geometry cannot tell a coherent rigid mover from the static world,
    # but the EMA, accumulated at honest poses, can.
    if cfg.crf.solve_flow_gate > 0:
        assoc &= m.p_flow_err[jnp.maximum(obs, 0)] < cfg.crf.solve_flow_gate
    r2 = pose_optimize(
        cam, T1, pw_fin, frame.uv, frame.u_right, frame.level,
        assoc, cfg.pose_opt, cfg.orb.scale_factor,
    )

    # ---- 3b. capture-resistance audit (see ba.pose_consensus) --------------
    # A coherent dynamic cluster can capture the LM solve into a
    # compromise basin that standard chi2 counts PREFER; audit with
    # batched Horn hypotheses + tight-window consensus and re-polish
    # from the winning hypothesis when it decisively beats the solve.
    # cfg is jit-static, so the disabled path compiles to nothing.
    pcfg = cfg.pose_opt
    if pcfg.consensus_hypotheses > 0:
        pc_cam_q = jnp.stack(
            [
                (frame.uv[:, 0] - cam.cx) / cam.fx * frame.depth,
                (frame.uv[:, 1] - cam.cy) / cam.fy * frame.depth,
                frame.depth,
            ],
            axis=-1,
        )
        valid3d = assoc & (frame.depth > 0)
        n3d = jnp.sum(valid3d.astype(jnp.int32))
        ckey = jax.random.fold_in(jax.random.PRNGKey(17), ts.frame_idx)
        # anchor trust = track longevity (found count, log-compressed)
        # damped by the CRF's dynamic belief: a minority of mature
        # statics must outvote a majority of freshly-respawned points on
        # a large coherent mover (see pose_consensus docstring)
        obs_c = jnp.maximum(obs, 0)
        trust = jnp.where(
            obs >= 0,
            (1.0 + jnp.log2(1.0 + jnp.minimum(
                m.p_found[obs_c].astype(jnp.float32), 64.0)))
            * (1.0 - m.p_dyn[obs_c]),
            1.0,
        )
        T_hyp, s_hyp, s_lm, hyp_mask = pose_consensus(
            cam, r2.Tcw, pw_fin, pc_cam_q, frame.uv, frame.level,
            valid3d, assoc, ckey,
            n_hypotheses=pcfg.consensus_hypotheses,
            tight_chi2=pcfg.consensus_chi2,
            scale_factor=cfg.orb.scale_factor,
            audit_points=pcfg.consensus_audit_points,
            trust=trust,
        )
        use_rescue = (
            (s_hyp.astype(jnp.float32)
             > pcfg.consensus_ratio * s_lm.astype(jnp.float32))
            & (n3d >= pcfg.consensus_min_3d)
        )
        import os as _os
        if _os.environ.get("SLAM_DEBUG_CONSENSUS"):
            jax.debug.print(
                "consensus f={f} s_hyp={a} s_lm={b} n3d={n} rescue={r}",
                f=ts.frame_idx, a=s_hyp, b=s_lm, n=n3d, r=use_rescue,
            )
        r3 = jax.lax.cond(
            use_rescue,
            lambda: pose_optimize(
                cam, T_hyp, pw_fin, frame.uv, frame.u_right, frame.level,
                assoc & hyp_mask, cfg.pose_opt, cfg.orb.scale_factor,
            ),
            lambda: r2,
        )
    else:
        r3 = r2
        use_rescue = jnp.asarray(False)
    T2 = orthonormalize_se3(r3.Tcw)
    inlier = r3.inliers
    # reference mnMatchesInliers: count only MAP-point inliers (temporal
    # VO points keep the pose stable but must not mask map degradation
    # in the keyframe decision)
    n_inliers = jnp.sum((inlier & (obs >= 0)).astype(jnp.int32))

    # ---- 4. update per-point statistics (CRF evidence) ---------------------
    pc2 = m.p_xyz @ T2[:3, :3].T + T2[:3, 3]
    z2 = pc2[:, 2]
    uv2 = jnp.stack(
        [
            cam.fx * pc2[:, 0] / jnp.maximum(z2, 1e-6) + cam.cx,
            cam.fy * pc2[:, 1] / jnp.maximum(z2, 1e-6) + cam.cy,
        ],
        axis=-1,
    )
    vis_ids = jnp.where(local_ok, local_ids, m.capacity_points)
    m = m._replace(
        p_visible=m.p_visible.at[vis_ids].add(1, mode="drop"),
        p_last_seen=m.p_last_seen.at[vis_ids].set(
            ts.frame_idx + 1, mode="drop"
        ),
    )
    matched_pts = jnp.where(inlier & (obs >= 0), obs, m.capacity_points)
    m = m._replace(
        p_found=m.p_found.at[matched_pts].add(1, mode="drop")
    )
    # [CRF] long-term consistency evidence, measured at the audited pose:
    # post-optimization residuals are the clean discriminator (statics at
    # noise level, dynamics many px) PROVIDED the solve is not captured
    # by a coherent dynamic cluster — which the consensus audit above
    # guards. (Motion-model-prediction residuals with median centering
    # and/or MAD normalization were tried first and measured worse: the
    # prediction error's parallax structure inflates static residuals
    # with camera speed, and the normalized variant loses the contrast
    # exactly in the bootstrap frames where capture begins.)
    reproj_err = jnp.linalg.norm(frame.uv - uv2[jnp.maximum(obs, 0)], axis=-1)
    depth_err = jnp.where(
        frame.depth > 0,
        jnp.abs(frame.depth - z2[jnp.maximum(obs, 0)])
        / jnp.maximum(frame.depth, 1e-6),
        0.0,
    )
    upd_ids = jnp.where((obs >= 0) & frame.valid, obs, m.capacity_points)
    decay = cfg.crf.history_decay
    err_old = m.p_err_ema[jnp.maximum(obs, 0)]
    derr_old = m.p_depth_err_ema[jnp.maximum(obs, 0)]
    m = m._replace(
        p_err_ema=m.p_err_ema.at[upd_ids].set(
            decay * err_old + (1 - decay) * reproj_err, mode="drop"
        ),
        p_depth_err_ema=m.p_depth_err_ema.at[upd_ids].set(
            decay * derr_old + (1 - decay) * depth_err, mode="drop"
        ),
    )
    # [CRF] visible-but-not-found evidence: a dynamic point's map position
    # goes stale as the object moves, so within a few frames the feature
    # leaves the match gate and the track stops producing reprojection
    # residuals at all — the *miss itself* is the long-term inconsistency
    # signal (the reference tracks the same thing as the found/visible
    # ratio). Feed misses into the error EMA so stale dynamics keep
    # accumulating energy while they sit in the frustum unmatched;
    # occasional static misses (occlusion) are washed out by the decay.
    assoc_mask = (
        jnp.zeros(m.capacity_points, bool).at[upd_ids].set(True, mode="drop")
    )
    # border guard: a point projecting near the image edge routinely
    # loses its feature to extraction dropout (grid budget, blur) during
    # fast rotation — that miss is an artifact, not motion evidence
    bm = cfg.crf.miss_border_px
    uv_loc = uv2[local_ids]
    interior = (
        (uv_loc[:, 0] >= bm) & (uv_loc[:, 0] < cam.width - bm)
        & (uv_loc[:, 1] >= bm) & (uv_loc[:, 1] < cam.height - bm)
    )
    missed = local_ok & interior & ~assoc_mask[local_ids]
    miss_ids = jnp.where(missed, local_ids, m.capacity_points)
    err_miss_old = m.p_err_ema[local_ids]
    # two-tier miss target (see CRFConfig): a stale mover carries an
    # elevated flow / residual EMA from the frames it was still matched;
    # only then does the miss push hard toward the dynamic threshold.
    # The corroboration bar rides the self-calibrating flow noise floor
    # (crf.noise_floors): under image noise the whole map's flow EMA
    # sits above the noise-free bar and every rotation dropout would
    # count as corroborated.
    from .crf import masked_median

    flow_floor = masked_median(
        m.p_flow_err, m.p_alive & (m.p_visible >= 4))
    corroborated = m.p_flow_err[local_ids] > jnp.maximum(
        cfg.crf.miss_corroborate_flow, 2.0 * flow_floor
    )
    miss_tgt = jnp.where(
        corroborated, cfg.crf.miss_err, cfg.crf.miss_err_weak
    )
    m = m._replace(
        p_err_ema=m.p_err_ema.at[miss_ids].set(
            decay * err_miss_old + (1 - decay) * miss_tgt,
            mode="drop",
        )
    )

    # ---- 5. keyframe decision (RGB-D close-point rules) --------------------
    close_th = _depth_threshold(cam, cfg)
    is_close = (frame.depth > 0) & (frame.depth < close_th)
    tracked_close = inlier & (obs >= 0) & is_close
    untracked_close = frame.valid & is_close & ~tracked_close
    n_tc = jnp.sum(tracked_close.astype(jnp.int32))
    n_uc = jnp.sum(untracked_close.astype(jnp.int32))
    tcfg = cfg.tracking
    ok = n_inliers >= tcfg.min_inliers_ok
    need_close = (n_tc < tcfg.kf_min_close_tracked) & (
        n_uc > tcfg.kf_max_close_insertable
    )
    # reference c1c/c2: inliers fell below thRefRatio of the reference
    # keyframe's match count. MONO (no stereo/depth features) uses the
    # reference's mono constants: thRefRatio = 0.9 and the >15-inlier
    # insertion bar instead of the 30-inlier OK gate — with the RGB-D
    # 0.75 ratio, 0.75*ref_matches falls below min_inliers_ok at mono
    # match counts and keyframe insertion deadlocks (the map starves
    # while tracking decays straight to LOST). The mode comes from the
    # CONFIG (static — set by the System entry point), never from
    # per-frame depth availability (ADVICE r3: an RGB-D frame with a
    # transient all-invalid depth image must keep RGB-D policy).
    is_mono = cfg.sensor == "monocular"
    weak_ratio = tcfg.kf_ref_ratio_mono if is_mono else tcfg.kf_ref_ratio
    # nRefMatches is a LIVE query (reference TrackedMapPoints(nMinObs)
    # reads current observation counts at decision time), NOT a value
    # frozen at keyframe insertion: insertion runs BEFORE the mapping
    # pass, so a frozen count misses every point the reference KF gains
    # through triangulation and fusion. For mono that froze ref_matches
    # near zero (new KFs' points all had < 3 obs yet), the thRefRatio
    # trigger fired only below the 30-inlier OK bar, and keyframe
    # insertion deadlocked while the pan starved the map (measured:
    # LOST at frame ~68 with KFs 8 frames apart).
    ref_obs = m.kf_obs[ts.ref_kf]
    ref_min_obs = jnp.where(m.n_kfs <= 2, 2, 3)
    ref_live = (
        (ref_obs >= 0)
        & m.kf_valid[ts.ref_kf]
        & m.p_alive[jnp.maximum(ref_obs, 0)]
        & (m.p_n_obs[jnp.maximum(ref_obs, 0)] >= ref_min_obs)
    )
    n_ref_matches = jnp.sum(ref_live.astype(jnp.int32))
    weak = n_inliers < (
        weak_ratio * n_ref_matches.astype(jnp.float32)
    ).astype(jnp.int32)
    # the reference evaluates NeedNewKeyFrame ONLY when tracking is OK
    # (Track() gates on bOK) — without the `ok` term a mono frame with
    # 16-29 inliers is simultaneously LOST and keyframe-insertable, and
    # inserts a motion-model-extrapolated garbage pose into the map
    # (observed: the never-green mono Sim3 gate's one detection fired
    # from exactly such a keyframe)
    insertable = (
        ok & (n_inliers > tcfg.kf_min_inliers_mono) if is_mono else ok
    )
    need_kf = insertable & (
        (ts.n_since_kf >= tcfg.max_frames_between_kf) | need_close | weak
    ) & (ts.n_since_kf > tcfg.min_frames_between_kf)

    status = jnp.where(ok, 1, 2).astype(jnp.int32)
    vel = T2 @ se3_inverse(ts.Tcw)
    ts2 = ts._replace(
        Tcw=T2,
        vel=jnp.where(ok, vel, jnp.eye(4, dtype=jnp.float32)),
        last_uv=frame.uv,
        last_ur=frame.u_right,
        last_depth=frame.depth,
        last_level=frame.level,
        last_angle=frame.angle,
        last_desc=frame.desc,
        last_valid=frame.valid,
        # keep ALL map associations (reference: mvpMapPoints persists,
        # mvbOutlier only gates optimization) — outlier-but-matched tracks
        # must keep accumulating CRF inconsistency evidence
        last_obs=obs,
        frame_idx=ts.frame_idx + 1,
        n_since_kf=ts.n_since_kf + 1,
        status=status,
    )
    info = TrackInfo(
        n_mm_matches=n_mm,
        n_inliers=n_inliers,
        n_local_matches=n_local,
        n_tracked_close=n_tc,
        n_untracked_close=n_uc,
        need_kf=need_kf,
        obs=jnp.where(inlier, obs, -1),
        inlier=inlier,
        near_map=near_map | (obs >= 0),
        rescued=use_rescue,
        ref_fallback=use_fb,
    )
    return ts2, m, info


def insert_keyframe(
    cfg: SLAMConfig, cam: Pinhole, m: MapState, ts: TrackState, frame: Frame,
    obs: jax.Array, timestamp: jax.Array,
    near_map: jax.Array | None = None,
    flow_dyn: jax.Array | None = None,
) -> Tuple[MapState, TrackState]:
    """CreateNewKeyFrame: insert KF, spawn map points from depth for
    unmatched close keypoints (capped, nearest-first like the reference's
    depth-sorted creation). `near_map` vetoes duplicates of existing
    points; `flow_dyn` vetoes keypoints whose measured optical flow is
    inconsistent with rigid egomotion (see CRFConfig.spawn_flow_gate)."""
    Twc = se3_inverse(ts.Tcw)
    close_th = _depth_threshold(cam, cfg)
    cand = frame.valid & (frame.depth > 0) & (obs < 0)
    if near_map is not None:
        cand &= ~near_map
    if flow_dyn is not None:
        cand &= ~flow_dyn
    # [CRF] dynamic-region veto: do not spawn points inside the spatial
    # envelope of dynamic-labeled tracks — otherwise the moving object
    # is re-ingested every keyframe (SURVEY.md §4.5: labels gate map
    # growth). Culled dynamics contribute via the tombstone ring (their
    # live slots are recycled; mapstate.MapState.tomb_xyz).
    pw_cand = _unproject_world(cam, se3_inverse(ts.Tcw), frame.uv, frame.depth)
    cand &= ~near_dynamic_envelope(
        m, pw_cand, cfg.crf.dynamic_threshold, cfg.crf.spatial_sigma
    )
    # grid-stratified nearest-first cap: within each image cell only the
    # `spawn_cell_quota` nearest candidates survive, then the global
    # nearest-first budget applies. Pure depth-sorted creation (the
    # reference's behavior) lets one close surface — a person filling
    # the frame — take 2/3 of the new points and capture the next pose
    # solve; the per-cell cap bounds any compact object's map share by
    # its image area, which is what the consensus audit and the CRF's
    # compactness prior both assume.
    if cfg.mapping.spawn_cell_quota > 0:
        cs = cfg.mapping.spawn_cell_px
        nx = -(-cam.width // cs)
        cell = (
            jnp.clip(frame.uv[:, 1] // cs, 0, (-(-cam.height // cs)) - 1)
            * nx
            + jnp.clip(frame.uv[:, 0] // cs, 0, nx - 1)
        ).astype(jnp.int32)
        same = cell[:, None] == cell[None, :]
        idx = jnp.arange(frame.capacity)
        better = (
            (frame.depth[None, :] < frame.depth[:, None])
            | ((frame.depth[None, :] == frame.depth[:, None])
               & (idx[None, :] < idx[:, None]))
        )
        rank = jnp.sum(same & better & cand[None, :], axis=1)
        cand &= rank < cfg.mapping.spawn_cell_quota
    score = jnp.where(cand, -frame.depth, -1e9)
    k_new = cfg.mapping.max_new_points_per_kf
    _, top_ids = jax.lax.top_k(score, k_new)
    chosen = jnp.zeros((frame.capacity,), bool).at[top_ids].set(True)
    # reference keeps creating past the cap only for close points; here the
    # cap is the budget: close points win by depth sort automatically
    create = cand & chosen
    pw = _unproject_world(cam, Twc, frame.uv, frame.depth)
    cam_center = Twc[:3, 3]
    d_vec = pw - cam_center[None, :]
    dist = jnp.linalg.norm(d_vec, axis=-1)
    normal = -d_vec / jnp.maximum(dist[:, None], 1e-9)
    min_d, max_d = _point_scale_range(
        dist, frame.level, cfg.orb.n_levels, cfg.orb.scale_factor
    )
    m, new_ids = add_points(
        m, pw, frame.desc, normal, min_d, max_d, create, ts.ref_kf + 1,
        tomb_dyn_threshold=cfg.crf.dynamic_threshold,
        n_obs_init=0,    # add_keyframe's bump counts the observation
    )
    m = m._replace(
        p_last_seen=m.p_last_seen.at[
            jnp.where(new_ids >= 0, new_ids, m.capacity_points)
        ].set(ts.frame_idx, mode="drop")
    )
    obs_all = jnp.where(obs >= 0, obs, new_ids)
    if flow_dyn is not None:
        # CONDEMN flow-dynamic features (-2) rather than leaving them
        # free (-1): the spawn veto above only blocked the depth spawn,
        # but a free feature re-enters through create_new_points'
        # epipolar triangulation at the next mapping pass — a moving
        # surface triangulates self-consistently between two close-in-
        # time keyframes, so the mover was re-ingested through the
        # triangulation path (the entering-billboard gate measured 18
        # trusted mover points slipping in this way).
        obs_all = jnp.where(flow_dyn & (obs_all == -1), -2, obs_all)
    m, kf_idx = add_keyframe(m, frame, ts.Tcw, timestamp, obs_all)
    # reference NeedNewKeyFrame: nRefMatches counts only the reference
    # KF's WELL-OBSERVED points (TrackedMapPoints(nMinObs), nMinObs=3,
    # or 2 while the map has <=2 KFs) — counting the freshly spawned
    # points here (1 obs each, up to 512) made thRefRatio fire on
    # every eligible frame (KF every 2 frames on the billboard world)
    min_obs = jnp.where(m.n_kfs <= 2, 2, 3)
    n_obs_pts = m.p_n_obs[jnp.maximum(obs_all, 0)]
    ts = ts._replace(
        ref_kf=kf_idx,
        ref_matches=jnp.sum(
            ((obs_all >= 0) & (n_obs_pts >= min_obs)).astype(jnp.int32)),
        n_since_kf=jnp.asarray(0, jnp.int32),
        last_obs=obs_all,
    )
    return m, ts
