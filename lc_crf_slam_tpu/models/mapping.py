"""Local mapping: window selection, local BA, culling, fusion.

TPU-native counterpart of the reference's `LocalMapping.cc` worker
thread (SURVEY.md §4.3): on each new keyframe — covisibility window
selection, local bundle adjustment over (covisible KFs + their points +
fixed observers) with the 5+10 LM schedule and chi2 pruning, map-point
culling (found/visible < 0.25, early-observation rule), duplicate
fusion (SearchInNeighbors/Fuse via batched projection + Hamming), and
keyframe culling (>=90% redundancy). Differences by design:
  - window membership and edges are fixed-capacity masked tables;
  - fusion re-points references with one gather (replace_map) instead
    of MapPoint::Replace pointer surgery;
  - scale-consistency in KF culling uses observation counts only
    (the reference also compares pyramid levels).
create_new_points supplies CreateNewMapPoints: epipolar-gated matching
of unassociated features against the best covisible neighbors + batched
DLT triangulation — the far-point source for RGB-D and the sole point
source for monocular.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..config import SLAMConfig
from ..geometry.camera import Pinhole
from ..geometry.se3 import se3_inverse
from ..ops.match import hamming_matrix, match_nn, projection_gate, resolve_duplicates
from ..ops.schur import BAProblem, solve_ba_with_outlier_rounds
from ..ops.triangulate import epipolar_gate, triangulate_pairs
from .mapstate import MapState, add_points, covisibility, obs_weight

BA_CAMS = 32          # local window + fixed observers
BA_POINTS = 4096
BA_EDGES = BA_CAMS * 1024


def _select_window(cfg: SLAMConfig, m: MapState, kf_idx: jax.Array):
    """Local KFs (covisibility-connected, reference GetVectorCovisible) +
    fixed observer KFs. Returns (cam_ids (C,), cam_fixed (C,), point_ids
    (P,), point_ok (P,))."""
    W = cfg.local_ba.max_local_kfs
    Ffix = min(cfg.local_ba.max_fixed_kfs, BA_CAMS - W)
    covis = covisibility(m)                       # (F, F)
    row = covis[kf_idx] * m.kf_alive              # (F,)
    row = row.at[kf_idx].set(0.0)
    w_top, nbr = jax.lax.top_k(row, W - 1)
    nbr_ok = w_top >= cfg.mapping.covisibility_min_weight
    local_ids = jnp.concatenate([kf_idx[None], jnp.where(nbr_ok, nbr, -1)])
    is_local = jnp.zeros((m.capacity_kfs,), bool).at[
        jnp.where(local_ids >= 0, local_ids, m.capacity_kfs - 1)
    ].set(local_ids >= 0)

    # points observed by the local window
    P = m.capacity_points
    obs = jnp.where(
        is_local[:, None, None] & m.kf_valid[:, :, None],
        m.kf_obs[:, :, None], -1,
    ).reshape(-1)
    pmask = jnp.zeros((P + 1,), bool).at[jnp.where(obs >= 0, obs, P)].set(True)
    pmask = pmask[:P] & m.p_alive
    psel_score = pmask.astype(jnp.float32)
    _, point_ids = jax.lax.top_k(psel_score, BA_POINTS)
    point_ok = pmask[point_ids]

    # fixed observers: KFs seeing selected points but not local
    sel_mask = jnp.zeros((P + 1,), bool).at[
        jnp.where(point_ok, point_ids, P)
    ].set(point_ok)
    sees = jnp.sum(
        (sel_mask[jnp.where(m.kf_obs >= 0, m.kf_obs, P)] & m.kf_valid),
        axis=1,
    ) * m.kf_alive  # (F,) count of selected points seen
    sees = jnp.where(is_local, 0, sees)
    f_top, fix_ids = jax.lax.top_k(sees.astype(jnp.float32), Ffix)
    fix_ok = f_top > 0
    fixed_ids = jnp.where(fix_ok, fix_ids, -1)

    cam_ids = jnp.concatenate([local_ids, fixed_ids])      # (C,)
    # gauge: KF0 is never optimized (reference pKF->mnId==0 fixed)
    cam_fixed = jnp.concatenate(
        [local_ids == 0, jnp.ones((Ffix,), bool)]
    )
    cam_fixed = cam_fixed | (cam_ids < 0)
    return cam_ids, cam_fixed, point_ids, point_ok


def _build_problem(
    cfg: SLAMConfig, m: MapState, cam_ids, cam_fixed, point_ids, point_ok
) -> BAProblem:
    C = cam_ids.shape[0]
    K = m.kf_obs.shape[1]
    P = m.capacity_points
    slot_of_point = jnp.full((P + 1,), -1, jnp.int32).at[
        jnp.where(point_ok, point_ids, P)
    ].set(jnp.where(point_ok, jnp.arange(BA_POINTS, dtype=jnp.int32), -1))

    kf_safe = jnp.maximum(cam_ids, 0)
    obs = m.kf_obs[kf_safe]            # (C, K)
    valid = (
        (cam_ids >= 0)[:, None]
        & m.kf_valid[kf_safe]
        & (obs >= 0)
    )
    pt_slot = slot_of_point[jnp.where(valid, obs, P)]
    valid &= pt_slot >= 0

    e_cam = jnp.broadcast_to(jnp.arange(C, dtype=jnp.int32)[:, None], (C, K))
    inv_sigma2 = (1.0 / cfg.orb.scale_factor**2) ** m.kf_level[
        kf_safe
    ].astype(jnp.float32)

    return BAProblem(
        cam_Tcw=m.kf_Tcw[kf_safe],
        cam_fixed=cam_fixed,
        p_xyz=m.p_xyz[point_ids],
        p_valid=point_ok,
        e_cam=e_cam.reshape(-1),
        e_pt=jnp.maximum(pt_slot, 0).reshape(-1),
        e_uv=m.kf_uv[kf_safe].reshape(-1, 2),
        e_ur=m.kf_ur[kf_safe].reshape(-1),
        e_w=inv_sigma2.reshape(-1),
        e_valid=valid.reshape(-1),
    )


def local_bundle_adjustment(
    cfg: SLAMConfig, cam: Pinhole, m: MapState, kf_idx: jax.Array
) -> MapState:
    """Optimizer::LocalBundleAdjustment equivalent; writes back poses,
    points, and prunes outlier observations."""
    cam_ids, cam_fixed, point_ids, point_ok = _select_window(cfg, m, kf_idx)
    prob = _build_problem(cfg, m, cam_ids, cam_fixed, point_ids, point_ok)
    cam_out, p_out, keep, stats = solve_ba_with_outlier_rounds(
        cam, prob,
        iters_1=cfg.local_ba.outer_iters_1,
        iters_2=cfg.local_ba.outer_iters_2,
        huber_delta=cfg.local_ba.huber_delta,
        chi2_mono=cfg.local_ba.chi2_mono,
        chi2_stereo=cfg.local_ba.chi2_stereo,
        grid=(BA_CAMS, m.kf_obs.shape[1]),
    )
    # write back optimized camera poses (non-fixed, real slots)
    upd_cam = (~cam_fixed) & (cam_ids >= 0)
    tgt_kf = jnp.where(upd_cam, cam_ids, m.capacity_kfs)
    m = m._replace(
        kf_Tcw=m.kf_Tcw.at[tgt_kf].set(cam_out, mode="drop")
    )
    # write back refined points
    tgt_pt = jnp.where(point_ok, point_ids, m.capacity_points)
    m = m._replace(p_xyz=m.p_xyz.at[tgt_pt].set(p_out, mode="drop"))
    # prune outlier observations (reference erases bad edges after BA)
    C, K = cam_ids.shape[0], m.kf_obs.shape[1]
    pruned = prob.e_valid & ~keep          # (C*K,)
    pruned = pruned.reshape(C, K)
    kf_safe = jnp.maximum(cam_ids, 0)
    old_obs_rows = m.kf_obs[kf_safe]       # BEFORE erasing (the r1-r4
    # code read kf_obs again after the erase below, so the decrement
    # targets were already -1 and n_obs never decremented — caught by
    # test_gba_slices_interleave_with_chunk_mapping's recount invariant)
    new_obs_rows = jnp.where(pruned, -1, old_obs_rows)
    m = m._replace(
        kf_obs=m.kf_obs.at[
            jnp.where(cam_ids >= 0, cam_ids, m.capacity_kfs)
        ].set(new_obs_rows, mode="drop")
    )
    # decrement n_obs of pruned points (by each entry's reference
    # observation weight)
    pruned_pts = jnp.where(pruned, old_obs_rows, -1).reshape(-1)
    w_pr = obs_weight(m.kf_ur[kf_safe]).reshape(-1)
    m = m._replace(
        p_n_obs=m.p_n_obs.at[
            jnp.where(pruned_pts >= 0, pruned_pts, m.capacity_points)
        ].add(-w_pr, mode="drop")
    )
    return m


def cull_points(cfg: SLAMConfig, m: MapState) -> MapState:
    """MapPointCulling: low found/visible ratio, or too few observations
    while mature. CRF-dynamic culling composes here in M3
    (SURVEY.md §4.3 [CRF])."""
    ratio = m.p_found.astype(jnp.float32) / jnp.maximum(
        m.p_visible.astype(jnp.float32), 1.0
    )
    bad_ratio = (ratio < cfg.mapping.cull_found_ratio) & (m.p_visible >= 4)
    mature = (m.n_kfs - m.p_first_kf) >= 2
    too_few = mature & (m.p_n_obs < cfg.mapping.cull_min_obs)
    dynamic = cfg.crf.enabled & (m.p_dyn > cfg.crf.dynamic_threshold)
    kill = m.p_alive & (bad_ratio | too_few | dynamic)
    # no tombstoning here: a culled dynamic point's slot keeps its
    # p_dyn/p_xyz/p_n_obs and continues to serve the keyframe spawn
    # veto until the allocator actually recycles the slot — at which
    # moment add_points snapshots it into the tombstone ring
    return m._replace(p_alive=m.p_alive & ~kill)


def fuse_duplicates(
    cfg: SLAMConfig, cam: Pinhole, m: MapState, kf_idx: jax.Array,
    loop_mode: bool = False,
) -> MapState:
    """SearchInNeighbors/Fuse for the target keyframe: features of kf_idx
    whose descriptor+position match another existing point get merged —
    the lower-observation point dies and all references re-point.

    `loop_mode` (post-loop SearchAndFuse): the survivor of a merge is
    chosen by CLEANER dynamic evidence first, observation count second.
    The old branch's twin usually has more observations, but it also
    carries the dynamic-evidence EMAs it accumulated while the drifted
    pose mis-projected it during the revisit approach; keeping it by
    observation count hands the tracker CRF-poisoned anchors (measured
    on the sweep-loop world: a lost frame and the map shredded to 82
    points)."""
    K = m.kf_obs.shape[1]
    Tcw = m.kf_Tcw[kf_idx]
    pc = m.p_xyz @ Tcw[:3, :3].T + Tcw[:3, 3]
    z = pc[:, 2]
    uvp = jnp.stack(
        [
            cam.fx * pc[:, 0] / jnp.maximum(z, 1e-6) + cam.cx,
            cam.fy * pc[:, 1] / jnp.maximum(z, 1e-6) + cam.cy,
        ],
        axis=-1,
    )
    vis = (
        m.p_alive & (z > 0.05)
        & (uvp[:, 0] >= 0) & (uvp[:, 0] < cam.width)
        & (uvp[:, 1] >= 0) & (uvp[:, 1] < cam.height)
    )
    _, cand_ids = jax.lax.top_k(vis.astype(jnp.float32), BA_POINTS)
    cand_ok = vis[cand_ids]

    f_uv = m.kf_uv[kf_idx]
    f_desc = m.kf_desc[kf_idx]
    f_valid = m.kf_valid[kf_idx]
    f_obs = m.kf_obs[kf_idx]
    f_depth = m.kf_depth[kf_idx]
    # reference direction: project each candidate POINT and find its best
    # feature (Fuse loops over points; the feature's existing point then
    # decides merge-vs-add)
    gate = projection_gate(uvp[cand_ids], f_uv, 2.5)          # (L, K)
    gate &= cand_ok[:, None] & f_valid[None, :]
    dc = jnp.abs(f_depth[None, :] - z[cand_ids][:, None]) <= 0.2 * jnp.maximum(
        f_depth[None, :], 0.5
    )
    gate &= jnp.where((f_depth > 0)[None, :], dc, True)
    dist = hamming_matrix(m.p_desc[cand_ids], f_desc)          # (L, K)
    dist = jnp.where(gate, dist, 10_000)
    best_f = jnp.argmin(dist, axis=1)                          # (L,)
    best_d = jnp.take_along_axis(dist, best_f[:, None], axis=1)[:, 0]
    good = (best_d <= cfg.matcher.th_low) & cand_ok
    # the point must not already be the feature's own observation
    existing = f_obs[best_f]                                   # (L,)
    P = m.capacity_points

    # case 1: feature has a different point -> merge (keep more-observed).
    # A DEAD existing point (lazy not-yet-condemned reference, see
    # mapstate.add_points) is no merge partner — the reference treats a
    # bad MapPoint as no match; merging with one transferred its stale
    # observation count to the survivor (recount-invariant drift).
    mergeable = good & (existing >= 0) & (existing != cand_ids) \
        & m.p_alive[jnp.maximum(existing, 0)]
    a = jnp.where(mergeable, existing, 0)
    b = jnp.where(mergeable, cand_ids, 0)
    keep_b = m.p_n_obs[b] >= m.p_n_obs[a]
    if loop_mode:
        pd_a, pd_b = m.p_dyn[a], m.p_dyn[b]
        keep_b = jnp.where(
            jnp.abs(pd_b - pd_a) > 0.1, pd_b < pd_a, keep_b
        )
    dup = jnp.where(mergeable, jnp.where(keep_b, a, b), -1)
    tgt = jnp.where(mergeable, jnp.where(keep_b, b, a), -1)
    # ONE merge per dup point per pass: several candidate rows can
    # nominate the same dup (several features of this KF match points
    # that all collide with it); without the dedupe every nominated
    # target gained the dup's FULL observation count while its entries
    # re-pointed to only one of them (replace_map scatter, last-writer
    # wins) — n_obs inflated without bound on hub points (caught by the
    # recount invariant: slots at stored ~2x recount and growing).
    L = dup.shape[0]
    rowi = jnp.arange(L, dtype=jnp.int32)
    first_row = jnp.full((P + 1,), L, jnp.int32).at[
        jnp.where(dup >= 0, dup, P)
    ].min(jnp.where(dup >= 0, rowi, L), mode="drop")
    keep_row = (dup < 0) | (first_row[jnp.maximum(dup, 0)] == rowi)
    dup = jnp.where(keep_row, dup, -1)
    tgt = jnp.where(keep_row, tgt, -1)
    replace_map = jnp.arange(P + 1, dtype=jnp.int32).at[
        jnp.where(dup >= 0, dup, P)
    ].set(jnp.where(dup >= 0, tgt, P).astype(jnp.int32))
    replace_map = replace_map.at[P].set(-1)
    new_kf_obs = jnp.where(
        m.kf_obs >= 0, replace_map[jnp.where(m.kf_obs >= 0, m.kf_obs, P)],
        m.kf_obs,
    )
    # reference MapPoint::Replace semantics: when a re-pointed entry
    # lands in a keyframe that ALREADY observes the survivor at another
    # feature, the duplicate match is ERASED (EraseMapPointMatch), not
    # kept — otherwise hub points accumulate several entries per KF and
    # their n_obs drifts from the observation table (recount invariant)
    from .mapstate import incidence_matrix, obs_weight

    inc = incidence_matrix(m)                        # pre-repoint, alive KFs
    survivor = new_kf_obs                            # value after re-point
    repointed = (m.kf_obs >= 0) & (survivor != m.kf_obs)
    already = jnp.take_along_axis(
        inc, jnp.maximum(survivor, 0), axis=1) > 0
    # ... and when several dups merge into ONE survivor from the same
    # keyframe, only the first re-pointed entry may stay (the others
    # are the same duplicate case, just created within this pass)
    F, Kf = m.kf_obs.shape
    fgrid = jnp.broadcast_to(jnp.arange(Kf, dtype=jnp.int32)[None, :],
                             (F, Kf))
    rgrid = jnp.broadcast_to(jnp.arange(F, dtype=jnp.int32)[:, None],
                             (F, Kf))
    key_pt = jnp.where(repointed, survivor, P)
    first_feat = jnp.full((F, P + 1), Kf, jnp.int32).at[
        rgrid, key_pt
    ].min(jnp.where(repointed, fgrid, Kf), mode="drop")
    intra_dup = repointed & (jnp.take_along_axis(
        first_feat, jnp.maximum(survivor, 0), axis=1) != fgrid)
    erase = repointed & (already | intra_dup)
    new_kf_obs = jnp.where(erase, -1, survivor)
    w_all = obs_weight(m.kf_ur)                      # (F, K)
    erased_w = jnp.zeros((P + 1,), jnp.int32).at[
        jnp.where(erase, jnp.maximum(survivor, 0), P)
    ].add(jnp.where(erase, w_all, 0))
    alive = m.p_alive.at[jnp.where(dup >= 0, dup, P)].set(False, mode="drop")
    gained = jnp.zeros((P + 1,), jnp.int32).at[
        jnp.where(dup >= 0, tgt, P)
    ].add(jnp.where(dup >= 0, m.p_n_obs[jnp.maximum(dup, 0)], 0))
    m = m._replace(
        kf_obs=new_kf_obs,
        p_alive=alive,
        p_n_obs=m.p_n_obs + gained[:P] - erased_w[:P],
    )
    if loop_mode:
        # a cross-branch merge certifies the twins as the same static
        # structure, and both twins' volatile statistics were
        # accumulated against the now-corrected (drifted) geometry —
        # stale by construction. Reset the survivor's found/visible
        # ratio and take the optimistic min of the evidence EMAs, else
        # post-loop culling shreds exactly the points the fusion just
        # consolidated (measured: 45 alive vs 107 undefended on the
        # sweep-loop world).
        dup_s = jnp.maximum(dup, 0)
        tgt_m = jnp.where(dup >= 0, tgt, P)

        def _emin(arr):
            return arr.at[tgt_m].min(arr[dup_s], mode="drop").at[
                tgt_m].min(arr[jnp.maximum(tgt, 0)], mode="drop")

        m = m._replace(
            p_visible=m.p_visible.at[tgt_m].set(1, mode="drop"),
            p_found=m.p_found.at[tgt_m].set(1, mode="drop"),
            p_dyn=_emin(m.p_dyn),
            p_err_ema=_emin(m.p_err_ema),
            p_depth_err_ema=_emin(m.p_depth_err_ema),
            p_flow_err=_emin(m.p_flow_err),
            p_last_seen=m.p_last_seen.at[tgt_m].max(
                m.p_last_seen[dup_s], mode="drop"),
        )

    # case 2: feature has no observation -> attach the point
    # (condemned features, -2, stay blocked; see mapstate.add_points).
    # Reference Fuse skips points ALREADY observed by this keyframe
    # (pMP->IsInKeyFrame): without the guard a hub point collects
    # several entries in one KF and its n_obs drifts from the table.
    surv_cand = replace_map[cand_ids]                   # post-merge id
    row_now = m.kf_obs[kf_idx]
    member = jnp.zeros((P + 1,), bool).at[
        jnp.where(row_now >= 0, row_now, P)
    ].set(row_now >= 0, mode="drop")
    addable = good & (existing == -1) \
        & ~member[jnp.clip(surv_cand, 0, P)]
    # resolve collisions (two points claiming one feature): lowest dist wins
    claim_d = jnp.full((m.kf_obs.shape[1],), 10_000, jnp.int32).at[
        jnp.where(addable, best_f, m.kf_obs.shape[1] - 1)
    ].min(jnp.where(addable, best_d, 10_000))
    win = addable & (best_d <= claim_d[best_f])
    add_pt = jnp.where(win, replace_map[jnp.where(win, cand_ids, P)], -1)
    # ... and one feature per point: two candidate rows can resolve to
    # the same post-merge survivor; only the first may attach (same
    # IsInKeyFrame rule as above, within this pass)
    Lr = add_pt.shape[0]
    rowi2 = jnp.arange(Lr, dtype=jnp.int32)
    first2 = jnp.full((P + 1,), Lr, jnp.int32).at[
        jnp.where(add_pt >= 0, add_pt, P)
    ].min(jnp.where(add_pt >= 0, rowi2, Lr), mode="drop")
    win &= (add_pt < 0) | (first2[jnp.clip(add_pt, 0, P)] == rowi2)
    add_pt = jnp.where(win, add_pt, -1)
    K_feat = m.kf_obs.shape[1]
    claimed = jnp.full((K_feat + 1,), -1, jnp.int32).at[
        jnp.where(win, best_f, K_feat)
    ].set(jnp.where(win, add_pt, -1))[:K_feat]
    row = m.kf_obs[kf_idx]
    new_row = jnp.where((row == -1) & (claimed >= 0), claimed, row)
    attached = (row == -1) & (claimed >= 0)
    m = m._replace(
        kf_obs=m.kf_obs.at[kf_idx].set(new_row),
        p_n_obs=m.p_n_obs.at[
            jnp.where(attached, claimed, P)
        ].add(obs_weight(m.kf_ur[kf_idx]), mode="drop"),
    )
    return m


def cull_keyframes(cfg: SLAMConfig, m: MapState, kf_idx: jax.Array) -> MapState:
    """KeyFrameCulling over the covisibility neighbors of kf_idx: a KF is
    redundant when >=90% of its observed points have >=4 total
    observations (i.e. seen by >=3 other KFs)."""
    covis = covisibility(m)
    row = covis[kf_idx] * m.kf_alive
    row = row.at[kf_idx].set(0.0)
    _, nbrs = jax.lax.top_k(row, cfg.local_ba.max_local_kfs)
    nbr_ok = (row[nbrs] >= cfg.mapping.covisibility_min_weight) & (nbrs != 0)

    obs = m.kf_obs[nbrs]                                    # (W, K)
    valid = m.kf_valid[nbrs] & (obs >= 0)
    # reference KeyFrameCulling counts the NUMBER OF OBSERVING
    # KEYFRAMES per point (not the stereo-weighted nObs that gates
    # TrackedMapPoints/culling thresholds) — with weighted p_n_obs the
    # old >=4 proxy fired after only two observing KFs. Exact KF counts
    # come from the incidence matrix.
    from .mapstate import incidence_matrix

    kf_counts = jnp.sum(incidence_matrix(m), axis=0)        # (P,)
    n_seen = kf_counts[jnp.maximum(obs, 0)]
    redundant_obs = valid & (n_seen >= 3.0)
    n_valid = jnp.sum(valid.astype(jnp.int32), axis=1)
    frac = jnp.sum(redundant_obs.astype(jnp.int32), axis=1) / jnp.maximum(
        n_valid, 1
    )
    kill = nbr_ok & (frac >= cfg.mapping.kf_cull_redundancy) & (n_valid > 20)
    F = m.capacity_kfs
    tgt = jnp.where(kill, nbrs, F)
    # anchor the culled KFs' poses to the (alive, covisible) triggering
    # keyframe so trajectory export keeps receiving loop / global-BA
    # corrections through them (reference: SaveTrajectoryTUM's
    # pKF->GetParent() walk while the ref KF is bad, SURVEY.md §6.4)
    Tca = jnp.einsum(
        "wij,jk->wik", m.kf_Tcw[nbrs], se3_inverse(m.kf_Tcw[kf_idx])
    )
    m = m._replace(
        kf_alive=m.kf_alive.at[tgt].set(False, mode="drop"),
        kf_anchor=m.kf_anchor.at[tgt].set(kf_idx, mode="drop"),
        kf_Tca=m.kf_Tca.at[tgt].set(Tca, mode="drop"),
    )
    # decrement observation counts of the killed KFs' points (by
    # reference observation weight)
    dead_obs = jnp.where(kill[:, None] & valid, obs, -1).reshape(-1)
    w_dead = obs_weight(m.kf_ur[nbrs]).reshape(-1)
    m = m._replace(
        p_n_obs=m.p_n_obs.at[
            jnp.where(dead_obs >= 0, dead_obs, m.capacity_points)
        ].add(-w_dead, mode="drop")
    )
    return m


TRIANG_NEIGHBORS = 4      # covisible partners searched for new points
TRIANG_CAP = 256          # new points per neighbor pair


def _triang_neighbors(cfg: SLAMConfig) -> int:
    n = getattr(cfg.mapping, "triang_neighbors", 0)
    return n if n > 0 else TRIANG_NEIGHBORS


def create_new_points(
    cfg: SLAMConfig, cam: Pinhole, m: MapState, kf_idx: jax.Array
) -> MapState:
    """CreateNewMapPoints: epipolar-constrained matching of unassociated
    features between the new keyframe and its best covisible neighbors,
    batched DLT triangulation with the reference's checks, point insertion
    with observations recorded in both keyframes.

    RGB-D already creates close points from depth at KF insertion; this
    adds the far/no-depth points — and is the sole point source for the
    monocular pipeline."""
    covis = covisibility(m)
    row = covis[kf_idx] * m.kf_alive
    row = row.at[kf_idx].set(0.0)
    n_nbrs = _triang_neighbors(cfg)
    _, nbrs = jax.lax.top_k(row, n_nbrs)
    nbr_ok_all = row[nbrs] >= cfg.mapping.covisibility_min_weight

    K = m.kf_obs.shape[1]
    uv1 = m.kf_uv[kf_idx]
    desc1 = m.kf_desc[kf_idx]
    lvl1 = m.kf_level[kf_idx]
    # free = never observed (-1); condemned features (-2: their culled
    # point's slot was recycled, see mapstate.add_points) stay blocked —
    # a rigid mover's features would otherwise re-triangulate
    # consistently between keyframes and re-ingest the mover
    free1 = m.kf_valid[kf_idx] & (m.kf_obs[kf_idx] == -1)
    T1 = m.kf_Tcw[kf_idx]
    Twc1 = se3_inverse(T1)
    c1 = Twc1[:3, 3]

    for n in range(n_nbrs):
        nb = nbrs[n]
        ok_nb = nbr_ok_all[n]
        uv2 = m.kf_uv[nb]
        desc2 = m.kf_desc[nb]
        free2 = m.kf_valid[nb] & (m.kf_obs[nb] == -1)
        T2 = m.kf_Tcw[nb]
        # baseline check (reference: skip if baseline too small vs depth)
        c2 = se3_inverse(T2)[:3, 3]
        baseline = jnp.linalg.norm(c1 - c2)
        ok_nb = ok_nb & (baseline > 0.01)

        gate = epipolar_gate(cam, T1, T2, uv1, uv2)
        gate &= free1[:, None] & free2[None, :]
        dist = hamming_matrix(desc1, desc2)
        mm = match_nn(dist, mask=gate, max_dist=cfg.matcher.th_low,
                      ratio=0.75, mutual=True)
        mv = resolve_duplicates(mm.idx, mm.dist, mm.valid, K)
        tri = triangulate_pairs(
            cam, T1, T2, uv1, uv2[mm.idx], mv & ok_nb, lvl1,
            cfg.orb.scale_factor,
        )
        create = tri.ok
        # cap per pair: strongest (lowest descriptor distance) first
        score = jnp.where(create, -mm.dist.astype(jnp.float32), -1e9)
        _, top = jax.lax.top_k(score, TRIANG_CAP)
        chosen = jnp.zeros((K,), bool).at[top].set(True)
        create &= chosen
        dvec = tri.xyz - c1[None, :]
        dist_c = jnp.linalg.norm(dvec, axis=-1)
        normal = -dvec / jnp.maximum(dist_c[:, None], 1e-9)
        max_d = dist_c * cfg.orb.scale_factor ** lvl1.astype(jnp.float32)
        min_d = max_d / cfg.orb.scale_factor ** (cfg.orb.n_levels - 1)
        m, new_ids = add_points(
            m, tri.xyz, desc1, normal, min_d, max_d, create, kf_idx,
            tomb_dyn_threshold=cfg.crf.dynamic_threshold,
            n_obs_init=0,
        )
        got = new_ids >= 0
        # record observations in both keyframes (n_obs += the two
        # entries' reference weights — triangulated features are
        # usually mono/far, weight 1 each)
        row1 = jnp.where(got, new_ids, m.kf_obs[kf_idx])
        m = m._replace(kf_obs=m.kf_obs.at[kf_idx].set(row1))
        feat2 = jnp.where(got, mm.idx, K)
        row2 = m.kf_obs[nb].at[feat2].set(
            jnp.where(got, new_ids, -1), mode="drop"
        )
        w_both = obs_weight(m.kf_ur[kf_idx]) + obs_weight(
            m.kf_ur[nb].at[feat2].get(mode="clip"))
        m = m._replace(
            kf_obs=m.kf_obs.at[nb].set(row2),
            p_n_obs=m.p_n_obs.at[
                jnp.where(got, new_ids, m.capacity_points)
            ].add(w_both, mode="drop"),
        )
        free1 = m.kf_valid[kf_idx] & (m.kf_obs[kf_idx] == -1)
    return m


REFRESH_KFS = 12      # observing-KF window per maintenance pass
REFRESH_POINTS = BA_POINTS


def refresh_point_stats(
    cfg: SLAMConfig, cam: Pinhole, m: MapState, kf_idx: jax.Array
) -> MapState:
    """MapPoint maintenance: ComputeDistinctiveDescriptors +
    UpdateNormalAndDepth, batched over the local window.

    The reference refreshes a point's representative descriptor
    (min-sum-of-Hamming over its observations) and viewing
    normal / scale range every time observations change
    (MapPoint.cc, SURVEY.md §3.1); freezing them at creation degrades
    matching after viewpoint change and fusion. Here each mapping pass
    gathers each local point's observations across the covisibility
    window's keyframes and recomputes all three. Deviation:
    the scale range uses the first gathered observation (the new KF or
    its closest covisible) instead of the point's creation KF — the same
    quantity after any real viewpoint drift."""
    W = REFRESH_KFS
    Np = REFRESH_POINTS
    P = m.capacity_points
    K = m.kf_obs.shape[1]

    covis = covisibility(m)
    row = covis[kf_idx] * m.kf_alive
    row = row.at[kf_idx].set(0.0)
    w_top, nbrs = jax.lax.top_k(row, W - 1)
    kfs = jnp.concatenate([kf_idx[None], jnp.where(w_top > 0, nbrs, -1)])

    kf_safe = jnp.maximum(kfs, 0)
    obs = m.kf_obs[kf_safe]                               # (W, K)
    ovalid = (kfs >= 0)[:, None] & m.kf_valid[kf_safe] & (obs >= 0)

    # local point set = points observed in the window
    pmask = jnp.zeros((P + 1,), bool).at[
        jnp.where(ovalid, obs, P).reshape(-1)
    ].set(True)[:P] & m.p_alive
    _, pids = jax.lax.top_k(pmask.astype(jnp.float32), Np)
    pok = pmask[pids]
    slot_of = jnp.full((P + 1,), Np, jnp.int32).at[
        jnp.where(pok, pids, P)
    ].set(jnp.where(pok, jnp.arange(Np, dtype=jnp.int32), Np))

    # Observation tables laid out PER WINDOW ROUND (w-major): one
    # scatter per array instead of the r4 formulation's W=12 sequential
    # scatter rounds with a running per-point rank counter (measured
    # ~16 ms device of the mapping pass). A point observes each window
    # KF at most once, so (w, slot) pairs never collide; per-round
    # camera centers broadcast with NO scatter at all. The old R=8
    # observation cap becomes "all W window KFs" — strictly more
    # faithful to MapPoint::ComputeDistinctiveDescriptors.
    slots = jnp.where(ovalid, slot_of[jnp.where(ovalid, obs, P)], Np)
    w_idx = jnp.broadcast_to(
        jnp.arange(W, dtype=jnp.int32)[:, None], slots.shape)
    descs = jnp.zeros((W, Np + 1, 8), jnp.uint32).at[
        w_idx, slots].set(m.kf_desc[kf_safe], mode="drop")
    levels = jnp.zeros((W, Np + 1), jnp.int32).at[
        w_idx, slots].set(m.kf_level[kf_safe], mode="drop")
    has = jnp.zeros((W, Np + 1), bool).at[
        w_idx, slots].set(slots < Np, mode="drop")
    descs, levels, has = descs[:, :Np], levels[:, :Np], has[:, :Np]
    Twc_all = jax.vmap(se3_inverse)(m.kf_Tcw)
    centers_w = Twc_all[kf_safe, :3, 3]                    # (W, 3)
    n_got = jnp.sum(has.astype(jnp.int32), axis=0)         # (Np,)

    # representative descriptor: min sum-of-Hamming to fellow observations
    x = descs[:, None, :, :] ^ descs[None, :, :, :]        # (W, W, Np, 8)
    d = jnp.sum(jax.lax.population_count(x), axis=-1).astype(jnp.int32)
    pair_ok = has[:, None, :] & has[None, :, :]
    dsum = jnp.sum(jnp.where(pair_ok, d, 0), axis=1)       # (W, Np)
    dsum = jnp.where(has, dsum, jnp.iinfo(jnp.int32).max)
    rep = jnp.argmin(dsum, axis=0)                         # (Np,)
    rep_desc = jnp.take_along_axis(descs, rep[None, :, None], axis=0)[0]

    # viewing normal: mean of unit point->camera directions
    pw = m.p_xyz[pids]                                     # (Np, 3)
    dirs = centers_w[:, None, :] - pw[None, :, :]          # (W, Np, 3)
    dirs = dirs / jnp.maximum(
        jnp.linalg.norm(dirs, axis=-1, keepdims=True), 1e-9)
    normal = jnp.sum(jnp.where(has[:, :, None], dirs, 0.0), axis=0)
    normal = normal / jnp.maximum(
        jnp.linalg.norm(normal, axis=-1, keepdims=True), 1e-9)

    # scale-invariance range from the FIRST observing window round
    # (the new KF or its closest covisible, as before)
    first_w = jnp.argmax(has, axis=0)                      # (Np,)
    c0 = centers_w[first_w]                                # (Np, 3)
    dist0 = jnp.linalg.norm(pw - c0, axis=-1)
    lvl0 = jnp.take_along_axis(levels, first_w[None, :], axis=0)[0]
    max_d = dist0 * cfg.orb.scale_factor ** lvl0.astype(jnp.float32)
    min_d = max_d / cfg.orb.scale_factor ** (cfg.orb.n_levels - 1)

    upd = pok & (n_got >= 2)
    tgt = jnp.where(upd, pids, P)
    return m._replace(
        p_desc=m.p_desc.at[tgt].set(rep_desc, mode="drop"),
        p_normal=m.p_normal.at[tgt].set(normal, mode="drop"),
        p_min_dist=m.p_min_dist.at[tgt].set(min_d, mode="drop"),
        p_max_dist=m.p_max_dist.at[tgt].set(max_d, mode="drop"),
    )


def mapping_step(
    cfg: SLAMConfig, cam: Pinhole, m: MapState, kf_idx: jax.Array
) -> MapState:
    """LocalMapping::Run body for one keyframe: triangulate -> fuse ->
    point maintenance -> local BA -> cull points -> cull keyframes."""
    m = create_new_points(cfg, cam, m, kf_idx)
    m = fuse_duplicates(cfg, cam, m, kf_idx)
    # SearchInNeighbors' reverse direction (reference LocalMapping.cc,
    # SURVEY.md §4.3 'Fuse into 1st+2nd-order neighbors'): project map
    # points into the top covisible neighbors too, so fresh
    # triangulations gain their 3rd+ observations NOW — the live
    # TrackedMapPoints(minObs) count behind NeedNewKeyFrame's
    # thRefRatio trigger depends on it (see config.fuse_reverse_neighbors)
    n_rev = cfg.mapping.fuse_reverse_neighbors
    if n_rev > 0:
        covis = covisibility(m)
        row = covis[kf_idx] * m.kf_alive
        row = row.at[kf_idx].set(0.0)
        w_top, nbrs = jax.lax.top_k(row, n_rev)
        for i in range(n_rev):
            ok = w_top[i] >= cfg.mapping.covisibility_min_weight
            # a no-op fuse (re-fusing the current KF) when the neighbor
            # slot is empty keeps shapes static
            tgt = jnp.where(ok, nbrs[i], kf_idx)
            m = fuse_duplicates(cfg, cam, m, tgt)
    m = refresh_point_stats(cfg, cam, m, kf_idx)
    m = local_bundle_adjustment(cfg, cam, m, kf_idx)
    m = cull_points(cfg, m)
    m = cull_keyframes(cfg, m, kf_idx)
    return m
