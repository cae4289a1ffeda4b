"""Loop closing: detection, Sim3/SE3 verification, correction, global BA.

TPU-native counterpart of the reference's `LoopClosing.cc` thread plus
`KeyFrameDatabase` retrieval (SURVEY.md §4.4):
  - DetectLoop: cosine retrieval over per-KF descriptor embeddings
    (brute-force replacement for DBoW2, SURVEY.md §3.2), gated by the
    minimum covisible-neighbor score and temporal separation;
    consecutive-detection consistency is the host driver's counter.
  - ComputeSim3: dense Hamming matching between the two keyframes'
    features, depth-backed 3D-3D batched Horn RANSAC (scale fixed for
    RGB-D), inlier gates following the reference's thresholds.
  - CorrectLoop: corrective transform applied to the current covisible
    group and its points, loop edge inserted, pose-graph optimization
    over chain + strong-covisibility + loop edges (posegraph.py), map
    points propagated through their reference keyframe's correction.
  - Global BA: alternating resection-intersection (block-coordinate GN
    over cameras then points) — same fixed point as joint BA, but each
    half-step is embarrassingly parallel, which is the memory-lean way
    to run full-map refinement on TPU (no (P,C) coupling tensor).
Relocalization (Tracking::Relocalization) shares retrieval + RANSAC.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..config import SLAMConfig
from ..geometry.camera import Pinhole
from ..geometry.se3 import exp_se3, make_se3, se3_inverse
from ..ops.match import (
    hamming_matrix, match_nn, projection_gate, resolve_duplicates,
)
from ..ops.ransac import horn_ransac
from .ba import pose_optimize
from .frame import Frame
from .mapstate import MapState, covisibility
from .posegraph import PoseGraph, optimize_pose_graph


class LoopCandidate(NamedTuple):
    cand: jax.Array      # () int32 best candidate KF (-1 none)
    score: jax.Array     # () float32 retrieval score of best
    valid: jax.Array     # () bool any candidate survived
    cands: jax.Array     # (topk,) int32 surviving candidates (-1 pad)
    groups: jax.Array    # (topk, F) bool covisibility group per candidate


def detect_loop(cfg: SLAMConfig, m: MapState, kf_idx: jax.Array) -> LoopCandidate:
    """Retrieval + gating (KeyFrameDatabase::DetectLoopCandidates).

    Full reference retrieval-quality machinery, vocabulary-free: raw
    cosine scores are accumulated over each candidate's covisibility
    group (a true revisit lights up a whole neighborhood of keyframes,
    a perceptual alias lights up one), the best accumulated score sets
    a 0.75*best admission bar, and the surviving candidates are returned
    top-k with their groups (the host runs the reference's
    consecutive-detection group-consistency check over them)."""
    topk = cfg.loop.retrieval_topk
    sim = m.kf_emb @ m.kf_emb[kf_idx]                   # (F,)
    covis = covisibility(m)
    row = covis[kf_idx]
    # reference GetConnectedKeyFrames: only weight-THRESHOLDED edges
    # count as connected (UpdateConnections keeps edges with >= 15
    # shared observations). `row > 0` was stricter and blocked the
    # revisit: a handful of stray shared points (triangulation /
    # fusion stragglers, w=1..14) excluded exactly the loop candidates
    # at the keyframes where the revisit begins (measured on the
    # throughput sweep world: start-sector weights 1-14 at the 2
    # keyframes whose detections had to seed the consistency streak).
    connected = row >= cfg.mapping.covisibility_min_weight
    # reference minScore: lowest similarity among covisible neighbors
    # (capped: a KF with no / perfectly-similar neighbors must not set an
    # unreachable bar)
    nbr_scores = jnp.where(connected & m.kf_alive, sim, jnp.inf)
    has_nbr = jnp.any(connected & m.kf_alive)
    min_score = jnp.where(has_nbr, jnp.min(nbr_scores), 0.0)
    min_score = jnp.minimum(min_score, cfg.loop.min_score_cap)
    ids = jnp.arange(m.capacity_kfs)
    eligible = (
        m.kf_alive
        & (ids < m.n_kfs)
        & ~connected
        & (jnp.abs(ids - kf_idx) >= cfg.loop.min_kfs_since_last)
        & (ids != kf_idx)
    )
    floor = jnp.maximum(min_score, cfg.loop.retrieval_floor)
    cand_mask = eligible & (sim >= floor)
    # accumulated group score: candidate's own score + scores of fellow
    # candidates inside its covisibility group (reference accScore)
    nbr = (covis >= cfg.mapping.covisibility_min_weight)      # (F, F)
    cand_score = jnp.where(cand_mask, sim, 0.0)
    acc = sim + nbr.astype(sim.dtype) @ cand_score
    acc = jnp.where(cand_mask, acc, -jnp.inf)
    best_acc = jnp.max(acc)
    keep = cand_mask & (acc >= 0.75 * best_acc)
    # top-k surviving candidates by raw similarity
    kscore, kidx = jax.lax.top_k(jnp.where(keep, sim, -jnp.inf), topk)
    kvalid = jnp.isfinite(kscore)
    cands = jnp.where(kvalid, kidx, -1).astype(jnp.int32)
    groups = (
        nbr[jnp.maximum(cands, 0)]
        | (jnp.arange(m.capacity_kfs)[None, :] == cands[:, None])
    ) & kvalid[:, None]
    valid = jnp.any(kvalid)
    return LoopCandidate(
        cand=cands[0],
        score=kscore[0],
        valid=valid,
        cands=cands,
        groups=groups,
    )


def _kf_world_points(cam: Pinhole, m: MapState, kf: jax.Array):
    """World positions of a keyframe's features (K, 3): depth-backed
    where measured depth exists (RGB-D/stereo), falling back to the
    feature's associated MAP POINT (the reference always uses
    vpMapPointMatches — this is what makes mono loop verification
    possible, where per-feature depth is absent)."""
    uv = m.kf_uv[kf]
    d = m.kf_depth[kf]
    Twc = se3_inverse(m.kf_Tcw[kf])
    x = (uv[:, 0] - cam.cx) / cam.fx * d
    y = (uv[:, 1] - cam.cy) / cam.fy * d
    pc = jnp.stack([x, y, d], axis=-1)
    pw_depth = pc @ Twc[:3, :3].T + Twc[:3, 3]
    obs = m.kf_obs[kf]
    has_pt = (obs >= 0) & m.p_alive[jnp.maximum(obs, 0)]
    pw_map = m.p_xyz[jnp.maximum(obs, 0)]
    ok_d = d > 0
    pw = jnp.where(ok_d[:, None], pw_depth, pw_map)
    return pw, m.kf_valid[kf] & (ok_d | has_pt)


class LoopVerification(NamedTuple):
    T_corr: jax.Array     # (4, 4) world correction: p_true = T_corr @ p_drifted
    s_corr: jax.Array     # () world-correction scale (1 when fix_scale)
    n_inliers: jax.Array
    accepted: jax.Array


def verify_loop(
    cfg: SLAMConfig, cam: Pinhole, m: MapState,
    kf_idx: jax.Array, cand: jax.Array, key: jax.Array,
) -> LoopVerification:
    """ComputeSim3: feature matching + 3D-3D Horn RANSAC + OptimizeSim3.

    Mirrors the reference's full ComputeSim3 ladder (SURVEY.md §4.4):
    descriptor matches -> Sim3Solver RANSAC -> `OptimizeSim3` refinement
    with bidirectional reprojection and chi2 pruning (models/sim3opt.py),
    with the refined inlier count gating acceptance. For mono
    (cfg.loop.fix_scale=False) the refined scale is the relative map
    scale the Sim3 pose graph consumes."""
    from ..geometry.sim3 import (
        se3_from_sim3, sim3_compose, sim3_from_se3, sim3_inverse,
    )
    from .sim3opt import optimize_sim3

    cand_s = jnp.maximum(cand, 0)
    dist = hamming_matrix(m.kf_desc[kf_idx], m.kf_desc[cand_s])
    gate = m.kf_valid[kf_idx][:, None] & m.kf_valid[cand_s][None, :]
    mm = match_nn(dist, mask=gate, max_dist=cfg.matcher.th_low,
                  ratio=0.75, mutual=True)
    mv = resolve_duplicates(mm.idx, mm.dist, mm.valid, dist.shape[1])
    p_kf, ok_kf = _kf_world_points(cam, m, kf_idx)
    p_cd, ok_cd = _kf_world_points(cam, m, cand_s)
    pairs_ok = mv & ok_kf & ok_cd[mm.idx]
    n_matches = jnp.sum(pairs_ok.astype(jnp.int32))
    # correction maps the drifted current branch onto the loop branch
    res = horn_ransac(
        p_kf, p_cd[mm.idx], pairs_ok, key,
        n_hypotheses=cfg.loop.ransac_hypotheses,
        inlier_tol=0.10,
        fix_scale=cfg.loop.fix_scale,
    )
    # --- OptimizeSim3 refinement in the two camera frames -------------------
    # S12 maps cand-camera coords -> kf-camera coords; from the world
    # correction: S12 = Tcw_kf o S_corr^-1 o Twc_cd.
    def _cam_points(kf):
        # camera-frame feature points: measured depth where present,
        # else the associated map point transformed into the camera
        # (mono path — mirrors _kf_world_points)
        uv = m.kf_uv[kf]
        d = m.kf_depth[kf]
        x = (uv[:, 0] - cam.cx) / cam.fx * d
        y = (uv[:, 1] - cam.cy) / cam.fy * d
        pc_d = jnp.stack([x, y, d], axis=-1)
        T = m.kf_Tcw[kf]
        obs = m.kf_obs[kf]
        pc_m = m.p_xyz[jnp.maximum(obs, 0)] @ T[:3, :3].T + T[:3, 3]
        return jnp.where((d > 0)[:, None], pc_d, pc_m)

    S_corr0 = (res.s, res.R, res.t)
    Tcw_kf = m.kf_Tcw[kf_idx]
    Twc_cd = se3_inverse(m.kf_Tcw[cand_s])
    S12_0 = sim3_compose(
        sim3_from_se3(Tcw_kf),
        sim3_compose(sim3_inverse(S_corr0), sim3_from_se3(Twc_cd)),
    )
    pc1 = _cam_points(kf_idx)
    pc2 = _cam_points(cand_s)[mm.idx]
    inv_sigma2 = (
        (1.0 / cfg.orb.scale_factor**2)
        ** m.kf_level[kf_idx].astype(jnp.float32)
    )
    ref = optimize_sim3(
        cam, S12_0, pc1, pc2,
        m.kf_uv[kf_idx], m.kf_uv[cand_s][mm.idx],
        pairs_ok & res.inliers, inv_sigma2,
        fix_scale=cfg.loop.fix_scale,
    )
    S_corr = sim3_inverse(sim3_compose(
        sim3_from_se3(se3_inverse(Tcw_kf)),
        sim3_compose((ref.s, ref.R, ref.t), sim3_from_se3(m.kf_Tcw[cand_s])),
    ))

    # --- guided SearchByProjection re-match + final refinement ----------
    # The reference's ComputeSim3 does NOT accept on the Sim3 solve alone:
    # it projects the loop branch's map points (candidate + covisible
    # neighbors) through the corrected pose, re-matches in a narrow
    # window, refines once more, and requires >= 40 total matches
    # (SURVEY.md §4.4). This stage is what makes T_corr accurate enough
    # to distribute over the pose graph — Horn on a few dozen depth
    # pairs leaves ~cm-level error that a 5x-weighted loop edge then
    # smears over otherwise-consistent odometry (measured on the
    # sweep-revisit world: KF ATE 0.045 -> 0.265 without this stage).
    from .ba import pose_optimize
    from .mapstate import observed_mask

    covis = covisibility(m)
    gw0 = jnp.where(
        (covis[cand_s] >= cfg.mapping.covisibility_min_weight) & m.kf_alive,
        covis[cand_s], -jnp.inf,
    ).at[cand_s].set(jnp.inf)
    gw, gids = jax.lax.top_k(gw0, 12)
    gids = jnp.where(gw > -jnp.inf, gids, -1).astype(jnp.int32)
    loop_pts = observed_mask(m, gids)                       # (P,) bool
    NP = min(2048, m.capacity_points)
    _, pid = jax.lax.top_k(loop_pts.astype(jnp.float32), NP)
    p_ok = loop_pts[pid]
    pw = m.p_xyz[pid]                                       # (NP, 3)
    # corrected current-camera pose in the loop world: Sim3 camera
    # S_cw = Tcw_kf o S_corr^-1; its SE3 projection equivalent folds the
    # scale into the translation (pixels are scale-invariant: s cancels
    # in x/z), so pose_optimize refines R, t/s for mono too.
    S_cw = sim3_compose(sim3_from_se3(Tcw_kf), sim3_inverse(S_corr))
    Tcw_corr0 = make_se3(S_cw[1], S_cw[2] / S_cw[0])
    pc = pw @ Tcw_corr0[:3, :3].T + Tcw_corr0[:3, 3]
    z = jnp.maximum(pc[:, 2], 1e-6)
    uv_pred = jnp.stack(
        [cam.fx * pc[:, 0] / z + cam.cx,
         cam.fy * pc[:, 1] / z + cam.cy], axis=-1,
    )
    proj_ok = p_ok & (pc[:, 2] > 0.05) & \
        (uv_pred[:, 0] >= 0) & (uv_pred[:, 0] < cam.width) & \
        (uv_pred[:, 1] >= 0) & (uv_pred[:, 1] < cam.height)
    dist_g = hamming_matrix(m.kf_desc[kf_idx], m.p_desc[pid])   # (K, NP)
    gate_g = m.kf_valid[kf_idx][:, None] & proj_ok[None, :]
    gate_g &= projection_gate(
        m.kf_uv[kf_idx], uv_pred, cfg.loop.guided_radius_px
    )
    mm_g = match_nn(dist_g, mask=gate_g, max_dist=cfg.matcher.th_high,
                    mutual=True)
    mv_g = resolve_duplicates(mm_g.idx, mm_g.dist, mm_g.valid, NP)
    r2a = pose_optimize(
        cam, Tcw_corr0, pw[mm_g.idx], m.kf_uv[kf_idx], m.kf_ur[kf_idx],
        m.kf_level[kf_idx], mv_g, cfg.pose_opt, cfg.orb.scale_factor,
    )
    # second guided pass at the REFINED pose (the reference re-searches
    # after OptimizeSim3 before applying the >= 40-total gate): the
    # refined projection recovers matches the first window missed.
    pc_b = pw @ r2a.Tcw[:3, :3].T + r2a.Tcw[:3, 3]
    z_b = jnp.maximum(pc_b[:, 2], 1e-6)
    uv_b = jnp.stack(
        [cam.fx * pc_b[:, 0] / z_b + cam.cx,
         cam.fy * pc_b[:, 1] / z_b + cam.cy], axis=-1,
    )
    proj_b = p_ok & (pc_b[:, 2] > 0.05) & \
        (uv_b[:, 0] >= 0) & (uv_b[:, 0] < cam.width) & \
        (uv_b[:, 1] >= 0) & (uv_b[:, 1] < cam.height)
    gate_b = m.kf_valid[kf_idx][:, None] & proj_b[None, :]
    gate_b &= projection_gate(
        m.kf_uv[kf_idx], uv_b, cfg.loop.guided_radius_px
    )
    mm_b = match_nn(dist_g, mask=gate_b, max_dist=cfg.matcher.th_high,
                    mutual=True)
    mv_b = resolve_duplicates(mm_b.idx, mm_b.dist, mm_b.valid, NP)
    r2 = pose_optimize(
        cam, r2a.Tcw, pw[mm_b.idx], m.kf_uv[kf_idx], m.kf_ur[kf_idx],
        m.kf_level[kf_idx], mv_b, cfg.pose_opt, cfg.orb.scale_factor,
    )
    # final correction from the refined camera pose (scale unchanged):
    # S_corr = S_cw_refined^-1 o Tcw_kf. The camera Sim3 being refined is
    # S_cw = Tcw_kf o S_corr^-1, whose scale is S_cw[0] = 1/S_corr[0] —
    # NOT S_corr[0] (for fix_scale both are 1; for mono confusing them
    # inverts the applied scale correction and corrupts the translation).
    S_cw_ref = (S_cw[0], r2.Tcw[:3, :3], S_cw[0] * r2.Tcw[:3, 3])
    S_corr_f = sim3_compose(sim3_inverse(S_cw_ref), sim3_from_se3(Tcw_kf))
    T_corr = se3_from_sim3(S_corr_f)

    # Acceptance (deliberate redesign of the reference's gate budget,
    # SURVEY.md §8.3#3 rationale): the reference runs its early stages
    # at >= 20 matches/inliers each partly because the guided
    # SearchByProjection is CPU-expensive and must be protected by
    # early exits. Here the guided stage is one batched program, so the
    # early stages only need to SEED a usable correction (half the
    # reference bars — Horn + refine are well-posed from ~10 pairs) and
    # the decision rests where the evidence is strongest: the guided
    # stage at the FULL reference bars (>= min_total_matches projected
    # map-point matches, the reference's nTotalMatches semantics, plus
    # a solid refined inlier set). A wrong seed cannot pass: its
    # projections miss the 8 px windows and the guided count collapses
    # (the perceptual-aliasing test pins the rejection path).
    n_total = jnp.sum(mv_b.astype(jnp.int32))
    seed_bow = cfg.loop.seed_bow_matches or max(
        cfg.loop.min_bow_matches // 2, 8)
    seed_inl = cfg.loop.seed_sim3_inliers or max(
        cfg.loop.min_sim3_inliers // 2, 8)
    accepted = (
        (cand >= 0)
        & (n_matches >= seed_bow)
        & (res.n_inliers >= seed_inl)
        & (ref.n_inliers >= seed_inl)
        & (r2.n_inliers >= cfg.loop.min_sim3_inliers)
        & (n_total >= cfg.loop.min_total_matches)
        & jnp.all(jnp.isfinite(T_corr))
    )
    return LoopVerification(
        T_corr=jnp.where(accepted, T_corr, jnp.eye(4)),
        s_corr=jnp.where(accepted, S_corr_f[0], 1.0),
        n_inliers=r2.n_inliers,
        accepted=accepted,
    )


def search_and_fuse(
    cfg: SLAMConfig, cam: Pinhole, m: MapState, kf_idx: jax.Array,
    budget: int = 4,
) -> MapState:
    """SearchAndFuse (reference CorrectLoop, SURVEY.md §4.4): fuse the
    loop branch's duplicate points into the current covisible group —
    merge twins (re-pointing every observation) and attach orphan
    features — on the current KF plus its `budget`-1 strongest covisible
    neighbors, with `fuse_duplicates(loop_mode=True)` merge policy.

    Timing matters (measured on the sweep-revisit world): the full-group
    fuse must run AFTER global BA — right after the pose-graph
    correction the residual alignment error makes the 2.5 px
    attach/merge gates error-prone (map thinned to 45-82 alive points
    vs 107, plus a transient LOST frame); after the BA refinement the
    same fuse is clean (110 alive, no losses). `correct_loop` therefore
    fuses only the current keyframe immediately, and the driver calls
    this with the full budget once global BA has converged."""
    from .mapping import fuse_duplicates

    covis = covisibility(m)
    group = (covis[kf_idx] >= cfg.mapping.covisibility_min_weight)
    group &= m.kf_alive
    w = jnp.where(group, covis[kf_idx], -jnp.inf)
    w = w.at[kf_idx].set(jnp.inf)
    _, fuse_kfs = jax.lax.top_k(w, budget)
    # pad slots whose weight is -inf (group smaller than the budget)
    # with the current KF — re-fusing it is a cheap no-op
    fuse_kfs = jnp.where(
        jnp.isinf(w[fuse_kfs]) & (w[fuse_kfs] < 0), kf_idx, fuse_kfs
    )

    def _fuse_body(i, mm):
        return fuse_duplicates(cfg, cam, mm, fuse_kfs[i], loop_mode=True)

    return jax.lax.fori_loop(0, budget, _fuse_body, m)


def correct_loop(
    cfg: SLAMConfig, cam: Pinhole, m: MapState,
    kf_idx: jax.Array, cand: jax.Array, T_corr: jax.Array,
) -> MapState:
    """CorrectLoop: correct the current covisible group, optimize the
    essential graph, propagate map points via their reference keyframe."""
    F = m.capacity_kfs
    covis = covisibility(m)
    group = (covis[kf_idx] >= cfg.mapping.covisibility_min_weight)
    group = group.at[kf_idx].set(True)
    group &= m.kf_alive

    Tcw_old = m.kf_Tcw
    # corrected poses for the group: world correction T_corr moves their
    # (drifted) world frame onto the loop branch -> Tcw' = Tcw @ T_corr^-1
    T_corr_inv = se3_inverse(T_corr)
    Tcw_corr = jnp.where(
        group[:, None, None], Tcw_old @ T_corr_inv, Tcw_old
    )

    # pose graph: chain + strong covisibility edges measured from the
    # PRE-correction poses (odometry), loop edge from the corrected
    # relative pose; anchor = loop candidate + KF0
    seq_i = jnp.arange(F - 1, dtype=jnp.int32) + 1
    seq_j = jnp.arange(F - 1, dtype=jnp.int32)
    seq_valid = m.kf_alive[seq_i] & m.kf_alive[seq_j] & (seq_i < m.n_kfs)
    cv = jnp.where(
        jnp.triu(jnp.ones((F, F), bool), 2)
        & m.kf_alive[:, None] & m.kf_alive[None, :],
        covis, 0.0,
    )
    topv, topidx = jax.lax.top_k(cv.reshape(-1), 256)
    cv_i = (topidx // F).astype(jnp.int32)
    cv_j = (topidx % F).astype(jnp.int32)
    cv_valid = topv >= cfg.loop.covis_edge_weight
    e_i = jnp.concatenate([seq_i, cv_i, kf_idx[None]])
    e_j = jnp.concatenate([seq_j, cv_j, jnp.maximum(cand, 0)[None]])
    rel_meas = Tcw_old[e_i[:-1]] @ jax.vmap(se3_inverse)(Tcw_old[e_j[:-1]])
    loop_rel = (Tcw_old[kf_idx] @ T_corr_inv) @ se3_inverse(
        Tcw_old[jnp.maximum(cand, 0)]
    )
    e_rel = jnp.concatenate([rel_meas, loop_rel[None]])
    e_w = jnp.concatenate([
        jnp.ones((F - 1,)), jnp.ones((256,)), jnp.asarray([5.0])
    ])
    e_valid = jnp.concatenate([seq_valid, cv_valid, jnp.asarray([True])])
    node_fixed = (jnp.arange(F) == 0) | (jnp.arange(F) == cand)
    g = PoseGraph(
        Tcw=Tcw_corr,
        node_valid=m.kf_alive & (jnp.arange(F) < m.n_kfs),
        node_fixed=node_fixed,
        e_i=e_i, e_j=e_j, e_rel=e_rel, e_w=e_w, e_valid=e_valid,
    )
    Tcw_new = optimize_pose_graph(g, n_iters=cfg.loop.pose_graph_iters)

    # propagate map points through their reference keyframe's correction
    ref = jnp.clip(m.p_first_kf, 0, F - 1)
    D = jax.vmap(se3_inverse)(Tcw_new) @ Tcw_old       # (F, 4, 4) Twc_new Tcw_old
    Dp = D[ref]
    p_new = jnp.einsum("pij,pj->pi", Dp[:, :3, :3], m.p_xyz) + Dp[:, :3, 3]
    p_new = jnp.where(m.p_alive[:, None], p_new, m.p_xyz)
    m = m._replace(kf_Tcw=Tcw_new, p_xyz=p_new)

    # immediate SearchAndFuse on the current keyframe only: dedups the
    # frame the tracker anchors on before global BA runs; the driver
    # fuses the whole group AFTER global BA (see search_and_fuse for the
    # measured reason this split matters)
    return search_and_fuse(cfg, cam, m, kf_idx, budget=1)


def correct_loop_sim3(
    cfg: SLAMConfig, cam: Pinhole, m: MapState,
    kf_idx: jax.Array, cand: jax.Array, T_corr: jax.Array,
    s_corr: jax.Array,
) -> MapState:
    """CorrectLoop for MONO (cfg.loop.fix_scale=False): the reference's
    OptimizeEssentialGraph proper — Sim3 nodes with a free scale
    coordinate absorb the accumulated scale drift that an SE3 graph
    cannot (SURVEY.md §4.4, g2o types_seven_dof_expmap). The corrected
    current-group poses get scale 1/s_corr; after optimization node
    poses fold scale back into translation (se3_from_sim3, the
    reference's Tiw = [R, t/s]) and map points propagate through their
    reference keyframe's Sim3 delta."""
    from ..geometry.sim3 import (
        se3_from_sim3, sim3_compose, sim3_from_se3, sim3_inverse,
    )
    from .posegraph import Sim3Graph, optimize_pose_graph_sim3

    F = m.capacity_kfs
    # verify_loop exported T_corr with scale folded into translation
    # (se3_from_sim3); reconstruct the true Sim3 world correction
    S_corr = (s_corr, T_corr[:3, :3], T_corr[:3, 3] * s_corr)
    covis = covisibility(m)
    group = (covis[kf_idx] >= cfg.mapping.covisibility_min_weight)
    group = group.at[kf_idx].set(True)
    group &= m.kf_alive

    Tcw_old = m.kf_Tcw
    S_old = sim3_from_se3(Tcw_old)                       # batched (F,)
    S_corr_inv = sim3_inverse(S_corr)
    S_grp = sim3_compose(S_old, S_corr_inv)              # S_cw' per KF
    in_g = group
    s_n = jnp.where(in_g, S_grp[0], S_old[0])
    R_n = jnp.where(in_g[:, None, None], S_grp[1], S_old[1])
    t_n = jnp.where(in_g[:, None], S_grp[2], S_old[2])

    # edges: chain + strong covisibility from PRE-correction poses
    # (scale-1 odometry measurements) + the corrected loop edge
    seq_i = jnp.arange(F - 1, dtype=jnp.int32) + 1
    seq_j = jnp.arange(F - 1, dtype=jnp.int32)
    seq_valid = m.kf_alive[seq_i] & m.kf_alive[seq_j] & (seq_i < m.n_kfs)
    cv = jnp.where(
        jnp.triu(jnp.ones((F, F), bool), 2)
        & m.kf_alive[:, None] & m.kf_alive[None, :],
        covis, 0.0,
    )
    topv, topidx = jax.lax.top_k(cv.reshape(-1), 256)
    cv_i = (topidx // F).astype(jnp.int32)
    cv_j = (topidx % F).astype(jnp.int32)
    cv_valid = topv >= cfg.loop.covis_edge_weight
    e_i = jnp.concatenate([seq_i, cv_i, kf_idx[None]])
    e_j = jnp.concatenate([seq_j, cv_j, jnp.maximum(cand, 0)[None]])
    rel_se3 = Tcw_old[e_i[:-1]] @ jax.vmap(se3_inverse)(Tcw_old[e_j[:-1]])
    # loop edge: corrected current Sim3 vs the candidate
    S_kf_corr = sim3_compose(sim3_from_se3(Tcw_old[kf_idx]), S_corr_inv)
    S_loop = sim3_compose(
        S_kf_corr, sim3_inverse(sim3_from_se3(Tcw_old[jnp.maximum(cand, 0)]))
    )
    e_s = jnp.concatenate([jnp.ones((F - 1 + 256,)), S_loop[0][None]])
    e_R = jnp.concatenate([rel_se3[:, :3, :3], S_loop[1][None]])
    e_t = jnp.concatenate([rel_se3[:, :3, 3], S_loop[2][None]])
    e_w = jnp.concatenate([
        jnp.ones((F - 1,)), jnp.ones((256,)), jnp.asarray([5.0])
    ])
    e_valid = jnp.concatenate([seq_valid, cv_valid, jnp.asarray([True])])
    node_fixed = (jnp.arange(F) == 0) | (jnp.arange(F) == cand)
    g = Sim3Graph(
        s=s_n, R=R_n, t=t_n,
        node_valid=m.kf_alive & (jnp.arange(F) < m.n_kfs),
        node_fixed=node_fixed,
        e_i=e_i, e_j=e_j, e_s=e_s, e_R=e_R, e_t=e_t,
        e_w=e_w, e_valid=e_valid,
    )
    s_o, R_o, t_o = optimize_pose_graph_sim3(
        g, n_iters=cfg.loop.pose_graph_iters, fix_scale=False,
    )
    Tcw_new = se3_from_sim3((s_o, R_o, t_o))
    Tcw_new = jnp.where(
        (m.kf_alive & (jnp.arange(F) < m.n_kfs))[:, None, None],
        Tcw_new, Tcw_old,
    )

    # propagate points via their reference KF's Sim3 delta:
    # p' = S_new_f^-1 ( S_old_f (p) )  (reference CorrectLoop's
    # eigP3Dw -> Srw -> corrected Swc path)
    ref = jnp.clip(m.p_first_kf, 0, F - 1)
    S_new_inv = sim3_inverse((s_o, R_o, t_o))
    s_a, R_a, t_a = (S_old[0][ref], S_old[1][ref], S_old[2][ref])
    pc = s_a[:, None] * jnp.einsum("pij,pj->pi", R_a, m.p_xyz) + t_a
    s_b, R_b, t_b = (S_new_inv[0][ref], S_new_inv[1][ref], S_new_inv[2][ref])
    p_new = s_b[:, None] * jnp.einsum("pij,pj->pi", R_b, pc) + t_b
    p_new = jnp.where(m.p_alive[:, None], p_new, m.p_xyz)
    # scale-invariance distance ranges follow the local scale change
    s_ratio = jnp.where(m.p_alive, S_old[0][ref] / jnp.maximum(
        s_o[ref], 1e-9), 1.0)
    m = m._replace(
        kf_Tcw=Tcw_new, p_xyz=p_new,
        p_min_dist=m.p_min_dist * s_ratio,
        p_max_dist=m.p_max_dist * s_ratio,
    )
    return search_and_fuse(cfg, cam, m, kf_idx, budget=1)


def _map_ba_problem(cfg: SLAMConfig, m: MapState):
    """Full-map BAProblem from the observation tables (KF0 fixed)."""
    from ..ops.schur import BAProblem

    F, K = m.kf_obs.shape
    e_cam = jnp.repeat(jnp.arange(F, dtype=jnp.int32), K)
    e_pt_raw = m.kf_obs.reshape(-1)
    e_valid = (
        m.kf_alive[:, None] & m.kf_valid & (m.kf_obs >= 0)
    ).reshape(-1)
    e_pt = jnp.maximum(e_pt_raw, 0)
    inv_sigma2 = (
        (1.0 / cfg.orb.scale_factor**2)
        ** m.kf_level.astype(jnp.float32)
    ).reshape(-1)
    return BAProblem(
        cam_Tcw=m.kf_Tcw,
        cam_fixed=jnp.arange(F) == 0,
        p_xyz=m.p_xyz,
        p_valid=m.p_alive,
        e_cam=e_cam,
        e_pt=e_pt,
        e_uv=m.kf_uv.reshape(-1, 2),
        e_ur=m.kf_ur.reshape(-1),
        e_w=inv_sigma2,
        e_valid=e_valid,
    )


def global_ba(
    cfg: SLAMConfig, cam: Pinhole, m: MapState, n_iters: int = 8
) -> MapState:
    """RunGlobalBundleAdjustment: JOINT Schur LM over the whole map.

    Uses the matrix-free Schur-CG solver (ops/schur.py solve_ba_cg) —
    the reduced camera system is solved by preconditioned CG whose
    matvec streams over the observation table, so the full 320-KF /
    32k-point map optimizes jointly without the dense coupling tensor
    (the r1 alternating block-coordinate fallback remains below for
    comparison)."""
    from ..ops.schur import solve_ba_cg

    prob = _map_ba_problem(cfg, m)
    cam_Tcw, p_xyz, _ = solve_ba_cg(
        cam, prob, n_iters=n_iters,
        huber_delta=cfg.local_ba.huber_delta,
    )
    return m._replace(kf_Tcw=cam_Tcw, p_xyz=p_xyz)


def global_ba_alternating(
    cfg: SLAMConfig, cam: Pinhole, m: MapState, n_rounds: int = 6
) -> MapState:
    """Block-coordinate GN fallback: cameras and points alternate;
    each half-step is a batched block-diagonal Newton step — same fixed
    point as joint BA when it converges, cheaper per round."""
    from ..ops.schur import _edge_residuals, _robust_weights

    F, K = m.kf_obs.shape
    P = m.capacity_points
    prob = _map_ba_problem(cfg, m)
    huber = cfg.local_ba.huber_delta

    def round_step(_, carry):
        cam_Tcw, p_xyz = carry
        # camera half-step (block-diagonal over cameras)
        r, J_cam, J_pt, z_ok = _edge_residuals(cam, cam_Tcw, p_xyz, prob)
        active = prob.e_valid & z_ok & prob.p_valid[prob.e_pt]
        _, w, _ = _robust_weights(r, prob.e_w, active, huber)
        wJc = w[:, None, None] * J_cam
        Hcc = jnp.zeros((F, 6, 6)).at[prob.e_cam].add(
            jnp.einsum("eij,eik->ejk", wJc, J_cam))
        g_c = jnp.zeros((F, 6)).at[prob.e_cam].add(
            jnp.einsum("eij,ei->ej", wJc, r))
        Hcc = Hcc + 1e-3 * jax.vmap(jnp.diag)(jax.vmap(jnp.diag)(Hcc)) \
            + 1e-6 * jnp.eye(6)
        delta_c = -jnp.linalg.solve(Hcc, g_c[..., None])[..., 0]
        movable = (~prob.cam_fixed) & m.kf_alive
        delta_c = delta_c * movable[:, None]
        cam_Tcw = exp_se3(delta_c) @ cam_Tcw
        # point half-step (block-diagonal over points)
        r, J_cam, J_pt, z_ok = _edge_residuals(cam, cam_Tcw, p_xyz, prob)
        active = prob.e_valid & z_ok & prob.p_valid[prob.e_pt]
        _, w, _ = _robust_weights(r, prob.e_w, active, huber)
        wJp = w[:, None, None] * J_pt
        Hpp = jnp.zeros((P, 3, 3)).at[prob.e_pt].add(
            jnp.einsum("eij,eik->ejk", wJp, J_pt))
        g_p = jnp.zeros((P, 3)).at[prob.e_pt].add(
            jnp.einsum("eij,ei->ej", wJp, r))
        Hpp = Hpp + 1e-3 * jax.vmap(jnp.diag)(jax.vmap(jnp.diag)(Hpp)) \
            + 1e-6 * jnp.eye(3)
        delta_p = -jnp.linalg.solve(Hpp, g_p[..., None])[..., 0]
        has_obs = jnp.einsum("pii->p", Hpp) > 1e-5
        delta_p = jnp.where((prob.p_valid & has_obs)[:, None], delta_p, 0.0)
        return cam_Tcw, p_xyz + delta_p

    cam_Tcw, p_xyz = jax.lax.fori_loop(
        0, n_rounds, round_step, (m.kf_Tcw, m.p_xyz)
    )
    return m._replace(kf_Tcw=cam_Tcw, p_xyz=p_xyz)


class RelocResult(NamedTuple):
    Tcw: jax.Array
    n_inliers: jax.Array
    accepted: jax.Array


RELOC_CANDS = 4   # retrieval candidates tried in parallel


def relocalize(
    cfg: SLAMConfig, cam: Pinhole, m: MapState, frame: Frame,
    key: jax.Array,
) -> RelocResult:
    """Tracking::Relocalization: multi-candidate retrieval -> descriptor
    matching -> batched 2D-3D PnP RANSAC -> motion-only refinement.

    Mirrors the reference's DetectRelocalizationCandidates (top
    candidates with a 0.75*best admission bar) + PnPsolver loop, all
    candidates evaluated in parallel via vmap. The PnP path needs no
    query depth — relocalization works for mono frames and depthless
    features (the r1 Horn path required per-feature depth)."""
    from ..ops.pnp import pnp_ransac
    from .mapstate import _descriptor_embedding

    emb = _descriptor_embedding(frame.desc, frame.valid)
    sim = m.kf_emb @ emb
    eligible = m.kf_alive & (jnp.arange(m.capacity_kfs) < m.n_kfs)
    score = jnp.where(eligible, sim, -jnp.inf)
    kscore, cands = jax.lax.top_k(score, RELOC_CANDS)
    # 0.75*best admission bar (KeyFrameDatabase)
    cand_ok = jnp.isfinite(kscore) & (kscore >= 0.75 * kscore[0])

    def per_candidate(cand, ok, k):
        dist = hamming_matrix(frame.desc, m.kf_desc[cand])
        gate = frame.valid[:, None] & m.kf_valid[cand][None, :] & ok
        mm = match_nn(dist, mask=gate, max_dist=cfg.matcher.th_low,
                      ratio=cfg.matcher.nn_ratio_reloc, mutual=True)
        mv = resolve_duplicates(mm.idx, mm.dist, mm.valid, dist.shape[1])
        # 2D-3D pairs: frame pixels vs the candidate's MAP POINTS
        obs = jnp.where(mv, m.kf_obs[cand][mm.idx], -1)
        has_pt = obs >= 0
        pw_pts = m.p_xyz[jnp.maximum(obs, 0)]
        res = pnp_ransac(
            cam, pw_pts, frame.uv, frame.level, has_pt & mv, k,
            n_hypotheses=cfg.loop.ransac_hypotheses,
            chi2_th=cfg.loop.ransac_inlier_chi2,
            scale_factor=cfg.orb.scale_factor,
        )
        Tcw0 = make_se3(res.R, res.t)
        r = pose_optimize(
            cam, Tcw0, pw_pts, frame.uv, frame.u_right, frame.level,
            has_pt & res.inliers, cfg.pose_opt, cfg.orb.scale_factor,
        )
        # guided second-chance SearchByProjection (the reference's
        # narrow-window top-up when the BoW matches alone fall short of
        # the 50-inlier bar): project the candidate's map points at the
        # refined pose, re-match in a window, re-optimize, and keep the
        # better solve. Acceptance uses the FULL configured bar.
        obs_c = m.kf_obs[cand]
        has_c = (obs_c >= 0) & m.kf_valid[cand]
        pw_c = m.p_xyz[jnp.maximum(obs_c, 0)]
        pc = pw_c @ r.Tcw[:3, :3].T + r.Tcw[:3, 3]
        zc = jnp.maximum(pc[:, 2], 1e-6)
        uv_pred = jnp.stack(
            [cam.fx * pc[:, 0] / zc + cam.cx,
             cam.fy * pc[:, 1] / zc + cam.cy], axis=-1,
        )
        proj_ok = has_c & (pc[:, 2] > 0.05) & \
            (uv_pred[:, 0] >= 0) & (uv_pred[:, 0] < cam.width) & \
            (uv_pred[:, 1] >= 0) & (uv_pred[:, 1] < cam.height)
        dist_g = hamming_matrix(frame.desc, m.p_desc[jnp.maximum(obs_c, 0)])
        gate_g = frame.valid[:, None] & proj_ok[None, :] & projection_gate(
            frame.uv, uv_pred, cfg.loop.guided_radius_px
        )
        mm_g = match_nn(dist_g, mask=gate_g, max_dist=cfg.matcher.th_high,
                        mutual=True)
        mv_g = resolve_duplicates(
            mm_g.idx, mm_g.dist, mm_g.valid, dist_g.shape[1]
        )
        r2 = pose_optimize(
            cam, r.Tcw, pw_c[mm_g.idx], frame.uv, frame.u_right,
            frame.level, mv_g, cfg.pose_opt, cfg.orb.scale_factor,
        )
        use2 = r2.n_inliers > r.n_inliers
        Tcw_best = jnp.where(use2, r2.Tcw, r.Tcw)
        n_best = jnp.maximum(r2.n_inliers, r.n_inliers)
        acc = ok & res.ok & (n_best >= cfg.tracking.min_inliers_reloc)
        return Tcw_best, n_best, acc

    keys = jax.random.split(key, RELOC_CANDS)
    Tcws, n_inl, accs = jax.vmap(per_candidate)(cands, cand_ok, keys)
    best = jnp.argmax(jnp.where(accs, n_inl, -1))
    accepted = accs[best]
    return RelocResult(
        Tcw=jnp.where(accepted, Tcws[best], jnp.eye(4)),
        n_inliers=n_inl[best],
        accepted=accepted,
    )
