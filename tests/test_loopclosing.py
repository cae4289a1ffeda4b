"""Loop closing: detection, verification, correction, reloc (config 4
ladder: 'Loop closing + Sim3 pose-graph + global BA')."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lc_crf_slam_tpu.config import SLAMConfig, LoopConfig
from lc_crf_slam_tpu.geometry.camera import TUM3, project_points
from lc_crf_slam_tpu.geometry.se3 import exp_se3, se3_inverse
from lc_crf_slam_tpu.models.frame import frame_from_observations
from lc_crf_slam_tpu.models.loopclosing import (
    correct_loop,
    detect_loop,
    global_ba_alternating,
    relocalize,
    verify_loop,
)
from lc_crf_slam_tpu.models.mapstate import add_keyframe, add_points, empty_map
from lc_crf_slam_tpu.models.system import SLAMSystem
from lc_crf_slam_tpu.utils.evaluate import evaluate_ate
from lc_crf_slam_tpu.utils.synthetic import SyntheticWorld

RNG = np.random.default_rng(8)


def _observing_frame(pts_w, descs, Tcw, cfg, noise=0.0):
    """Project world points through Tcw into a Frame (with depth)."""
    pc = pts_w @ np.asarray(Tcw)[:3, :3].T + np.asarray(Tcw)[:3, 3]
    uv, z = project_points(TUM3, jnp.asarray(pc))
    uv = np.asarray(uv) + RNG.normal(0, noise, (len(pts_w), 2))
    return frame_from_observations(
        uv.astype(np.float32), np.asarray(z, np.float32), descs,
        cfg.map.max_features, TUM3,
    )


def _drifted_loop_map(cfg, n_mid=12, drift_t=(0.25, 0.1, -0.15)):
    """KF0 observes a cloud at the true pose; mid KFs wander off; the
    last KF re-observes the same cloud but its recorded pose carries
    accumulated drift. Returns (map, true last pose, drift transform)."""
    n_pts = 400
    pts = np.stack([
        RNG.uniform(-2, 2, n_pts), RNG.uniform(-1.5, 1.5, n_pts),
        RNG.uniform(2.5, 6, n_pts),
    ], -1).astype(np.float32)
    descs = RNG.integers(0, 2**32, (n_pts, 8), dtype=np.uint32)
    m = empty_map(cfg)
    # KF0 at identity with its points
    f0 = _observing_frame(pts, descs, np.eye(4), cfg)
    pw = pts
    m, ids = add_points(
        m, jnp.asarray(pw), jnp.asarray(descs[: cfg.map.max_features]),
        jnp.zeros((n_pts, 3)), jnp.zeros(n_pts), jnp.full((n_pts,), 100.0),
        jnp.ones(n_pts, bool), jnp.asarray(0),
    )
    obs0 = jnp.full((cfg.map.max_features,), -1, jnp.int32)
    obs0 = obs0.at[jnp.arange(n_pts)].set(ids[:n_pts])
    m, _ = add_keyframe(m, f0, jnp.eye(4), jnp.asarray(0.0), obs0)
    # mid keyframes looking elsewhere (distinct random descriptors)
    for i in range(1, n_mid + 1):
        pts_i = pts + np.array([8.0, 0, 0], np.float32)  # off to the side
        descs_i = RNG.integers(0, 2**32, (n_pts, 8), dtype=np.uint32)
        Ti = np.asarray(exp_se3(jnp.asarray(
            [0.3 * i / n_mid * 8, 0, 0, 0, 0.02 * i, 0], jnp.float32)))
        fi = _observing_frame(pts_i, descs_i, Ti, cfg)
        m, _ = add_keyframe(m, fi, jnp.asarray(Ti), jnp.asarray(float(i)),
                            jnp.full((cfg.map.max_features,), -1, jnp.int32))
    # loop keyframe: re-observes the SAME cloud from the true pose
    T_true = np.asarray(exp_se3(jnp.asarray(
        [0.05, 0.02, 0.0, 0.0, 0.03, 0.0], jnp.float32)))
    f_loop = _observing_frame(pts, descs, T_true, cfg)
    # but its recorded pose is drifted
    dT = np.eye(4, dtype=np.float32)
    dT[:3, 3] = drift_t
    T_drift = (T_true @ dT).astype(np.float32)
    m, kf_loop = add_keyframe(
        m, f_loop, jnp.asarray(T_drift), jnp.asarray(float(n_mid + 1)),
        jnp.full((cfg.map.max_features,), -1, jnp.int32),
    )
    return m, kf_loop, T_true, T_drift


class TestLoopDetection:
    def test_detects_revisit_and_rejects_connected(self):
        cfg = SLAMConfig(loop=LoopConfig(min_kfs_since_last=5))
        m, kf_loop, *_ = _drifted_loop_map(cfg)
        lc = detect_loop(cfg, m, kf_loop)
        assert bool(lc.valid)
        assert int(lc.cand) == 0, int(lc.cand)

    def test_no_candidate_in_unique_views(self):
        cfg = SLAMConfig(loop=LoopConfig(min_kfs_since_last=5))
        m, kf_loop, *_ = _drifted_loop_map(cfg)
        # query a MID keyframe (unique view): no loop
        lc = detect_loop(cfg, m, jnp.asarray(6))
        assert not bool(lc.valid) or int(lc.cand) != 0


class TestLoopVerifyCorrect:
    def test_verify_recovers_drift(self):
        cfg = SLAMConfig(loop=LoopConfig(min_kfs_since_last=5))
        m, kf_loop, T_true, T_drift = _drifted_loop_map(cfg)
        ver = verify_loop(cfg, TUM3, m, kf_loop, jnp.asarray(0),
                          jax.random.PRNGKey(0))
        assert bool(ver.accepted), int(ver.n_inliers)
        # corrected pose = recorded pose composed with correction
        T_corrected = np.asarray(
            m.kf_Tcw[kf_loop] @ se3_inverse(ver.T_corr)
        )
        np.testing.assert_allclose(
            T_corrected[:3, 3], T_true[:3, 3], atol=0.03
        )

    def test_correct_loop_moves_branch(self):
        cfg = SLAMConfig(loop=LoopConfig(min_kfs_since_last=5))
        m, kf_loop, T_true, T_drift = _drifted_loop_map(cfg)
        ver = verify_loop(cfg, TUM3, m, kf_loop, jnp.asarray(0),
                          jax.random.PRNGKey(0))
        err_before = np.linalg.norm(
            np.asarray(m.kf_Tcw[kf_loop])[:3, 3] - T_true[:3, 3]
        )
        m2 = correct_loop(cfg, TUM3, m, kf_loop, jnp.asarray(0), ver.T_corr)
        err_after = np.linalg.norm(
            np.asarray(m2.kf_Tcw[kf_loop])[:3, 3] - T_true[:3, 3]
        )
        assert err_after < 0.3 * err_before, (err_before, err_after)
        # anchor keyframes pinned
        np.testing.assert_allclose(
            np.asarray(m2.kf_Tcw[0]), np.asarray(m.kf_Tcw[0]), atol=1e-5
        )

    def test_search_and_fuse_merges_loop_duplicates(self):
        """CorrectLoop's SearchAndFuse: the drifted branch created its
        own copies of the loop branch's points; after correction the
        twins coincide and must be merged into one point each, with the
        loop KF's observations re-pointed at the survivors."""
        cfg = SLAMConfig(loop=LoopConfig(min_kfs_since_last=5))
        m, kf_loop, T_true, T_drift = _drifted_loop_map(cfg)
        alive_before_dup = int(np.asarray(m.p_alive).sum())
        # duplicate cloud as the drifted branch saw it: backproject the
        # loop KF's (true-pose) observations through its DRIFTED pose
        pts = np.asarray(m.p_xyz[:alive_before_dup])
        descs = np.asarray(m.p_desc[:alive_before_dup])
        pc = pts @ T_true[:3, :3].T + T_true[:3, 3]
        Twc_drift = np.linalg.inv(T_drift)
        pts_dup = (pc @ Twc_drift[:3, :3].T + Twc_drift[:3, 3]).astype(
            np.float32)
        m, dup_ids = add_points(
            m, jnp.asarray(pts_dup), jnp.asarray(descs),
            jnp.zeros((len(pts_dup), 3)), jnp.zeros(len(pts_dup)),
            jnp.full((len(pts_dup),), 100.0),
            jnp.ones(len(pts_dup), bool), kf_loop,
        )
        # the loop KF observes ITS copies
        m = m._replace(
            kf_obs=m.kf_obs.at[kf_loop, : len(pts_dup)].set(
                dup_ids[: len(pts_dup)]),
            p_n_obs=m.p_n_obs.at[dup_ids].add(1),
        )
        n_alive_dup = int(np.asarray(m.p_alive).sum())
        assert n_alive_dup == 2 * alive_before_dup
        ver = verify_loop(cfg, TUM3, m, kf_loop, jnp.asarray(0),
                          jax.random.PRNGKey(0))
        assert bool(ver.accepted)
        m2 = correct_loop(cfg, TUM3, m, kf_loop, jnp.asarray(0), ver.T_corr)
        alive_after = int(np.asarray(m2.p_alive).sum())
        # most twins merged (fuse is projection+descriptor gated, so a
        # few stragglers are fine)
        assert alive_after <= 1.25 * alive_before_dup, (
            alive_before_dup, n_alive_dup, alive_after)
        # loop KF observations now point at ALIVE points sitting on the
        # loop-branch geometry
        obs = np.asarray(m2.kf_obs[kf_loop][: len(pts_dup)])
        ok = obs >= 0
        assert ok.mean() > 0.8
        assert np.asarray(m2.p_alive)[obs[ok]].all()
        d = np.linalg.norm(
            np.asarray(m2.p_xyz)[obs[ok]] - pts[ok], axis=-1)
        assert np.median(d) < 0.05, np.median(d)


class TestGlobalBA:
    def test_reduces_reprojection_cost(self):
        from lc_crf_slam_tpu.models.mapping import _build_problem  # noqa
        cfg = SLAMConfig()
        m, kf_loop, *_ = _drifted_loop_map(cfg)
        # perturb points; GBA should pull them back toward consistency
        key = jax.random.PRNGKey(3)
        noise = 0.03 * jax.random.normal(key, m.p_xyz.shape)
        m_noisy = m._replace(
            p_xyz=jnp.where(m.p_alive[:, None], m.p_xyz + noise, m.p_xyz)
        )
        m_opt = global_ba_alternating(cfg, TUM3, m_noisy, n_rounds=5)
        d_before = np.linalg.norm(
            np.asarray(m_noisy.p_xyz - m.p_xyz), axis=-1
        )[np.asarray(m.p_alive)]
        d_after = np.linalg.norm(
            np.asarray(m_opt.p_xyz - m.p_xyz), axis=-1
        )[np.asarray(m.p_alive)]
        assert np.median(d_after) < 0.5 * np.median(d_before), (
            np.median(d_before), np.median(d_after)
        )


class TestAsyncGlobalBA:
    """Global BA off the hot path (reference RunGlobalBundleAdjustment
    detached thread, SURVEY.md §4.4): after a loop correction the budget
    runs as bounded per-frame slices, never all at once."""

    def _noisy_system(self, cfg):
        m, kf_loop, *_ = _drifted_loop_map(cfg)
        key = jax.random.PRNGKey(3)
        noise = 0.03 * jax.random.normal(key, m.p_xyz.shape)
        m = m._replace(
            p_xyz=jnp.where(m.p_alive[:, None], m.p_xyz + noise, m.p_xyz)
        )
        slam = SLAMSystem(TUM3, cfg, enable_mapping=False, enable_crf=False)
        slam.map = m
        slam.initialized = True
        return slam, int(kf_loop)

    def test_slices_are_bounded_and_drain(self):
        cfg = SLAMConfig()
        slam, kf_loop = self._noisy_system(cfg)
        before = np.asarray(slam.map.p_xyz)
        slam._gba_pending = {"left": cfg.loop.gba_total_iters,
                             "kf": kf_loop}
        pumps = 0
        while slam._gba_pending is not None:
            left0 = slam._gba_pending["left"]
            slam._pump_gba()          # ONE slice — a frame's worth
            pumps += 1
            assert pumps <= 10
            # each pump consumed exactly one slice of the budget
            if slam._gba_pending is not None:
                assert left0 - slam._gba_pending["left"] == \
                    cfg.loop.gba_slice_iters
        expect = -(-cfg.loop.gba_total_iters // cfg.loop.gba_slice_iters)
        assert pumps == expect, (pumps, expect)
        assert slam._gba_slices_run == expect
        # the sliced budget actually refined the map (same quality bar
        # as TestGlobalBA): perturbed points moved
        after = np.asarray(slam.map.p_xyz)
        alive = np.asarray(slam.map.p_alive)
        assert np.median(
            np.linalg.norm(after - before, axis=-1)[alive]) > 1e-4

    def test_trajectory_export_drains_pending_budget(self):
        """SaveTrajectoryTUM must not export half-refined poses: the
        reference joins its GBA thread at Shutdown before saving."""
        cfg = SLAMConfig()
        slam, kf_loop = self._noisy_system(cfg)
        slam.trajectory.append((0.0, np.eye(4), 0))
        slam._gba_pending = {"left": cfg.loop.gba_total_iters,
                             "kf": kf_loop}
        slam.get_trajectory()
        assert slam._gba_pending is None

    def test_sync_fallback_runs_whole_budget_inline(self):
        from lc_crf_slam_tpu.config import LoopConfig

        cfg = SLAMConfig(loop=LoopConfig(gba_slice_iters=0))
        slam, kf_loop = self._noisy_system(cfg)
        slam._gba_pending = {"left": cfg.loop.gba_total_iters,
                             "kf": kf_loop}
        slam._pump_gba()   # slice_iters=0 => drain in one call
        assert slam._gba_pending is None
        assert slam._gba_slices_run == 1


@pytest.mark.slow
class TestRelocalization:
    def test_recovers_after_teleport(self):
        """Track a sequence, then jump the camera far ahead: motion-model
        tracking fails and relocalization against keyframes recovers."""
        world = SyntheticWorld(cam=TUM3, n_frames=40, n_static=800,
                               n_dynamic=0, seed=9, trajectory="loop")
        from lc_crf_slam_tpu.config import TrackingConfig

        cfg = SLAMConfig(tracking=TrackingConfig(max_frames_between_kf=5))
        slam = SLAMSystem(TUM3, cfg)
        for k in range(12):
            f = world.frame(k)
            slam.track_observations(f.uv, f.depth, f.desc, f.timestamp)
        assert int(slam.map.n_kfs) >= 2
        # teleport: frame 2's view again (overlaps KFs), after garbage
        fg = world.frame(20)
        garbage = np.zeros((5, 2), np.float32)
        slam.track_observations(
            garbage, np.zeros(5, np.float32),
            np.zeros((5, 8), np.uint32), 98.0,
        )
        assert int(slam.ts.status) == 2
        f2 = world.frame(2)
        slam.track_observations(f2.uv, f2.depth, f2.desc, 99.0)
        assert int(slam.ts.status) == 1, "relocalization failed"
        T_true = np.linalg.inv(world.gt_pose_twc(2))
        err = np.linalg.norm(
            np.asarray(slam.ts.Tcw)[:3, 3] - T_true[:3, 3]
        )
        assert err < 0.05, err
