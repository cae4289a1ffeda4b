"""Trajectory export vs culled reference keyframes (VERDICT r2 #1).

The reference's System::SaveTrajectoryTUM walks pKF->GetParent() while
the reference KF is bad so every frame composes against a LIVE keyframe
that still receives loop / global-BA corrections (SURVEY.md §6.4). The
TPU build records, at cull time, the culled KF's pose relative to a
live anchor (MapState.kf_anchor / kf_Tca) and get_trajectory chains
through dead ancestors. These tests pin that behavior.
"""

import numpy as np
import jax.numpy as jnp

from lc_crf_slam_tpu.config import SLAMConfig
from lc_crf_slam_tpu.geometry.camera import TUM3
from lc_crf_slam_tpu.geometry.se3 import exp_se3, se3_inverse
from lc_crf_slam_tpu.models.system import SLAMSystem


def _pose(tx, ty=0.0, yaw=0.0):
    return np.asarray(
        exp_se3(jnp.asarray([tx, ty, 0.0, 0.0, yaw, 0.0], jnp.float32))
    )


class TestAnchorChainExport:
    def _system_with_kfs(self, poses):
        slam = SLAMSystem(TUM3, SLAMConfig(), enable_mapping=False,
                          enable_crf=False)
        m = slam.map
        F = m.capacity_kfs
        kf_Tcw = np.array(m.kf_Tcw)
        alive = np.zeros((F,), bool)
        for i, T in enumerate(poses):
            kf_Tcw[i] = T
            alive[i] = True
        slam.map = m._replace(
            kf_Tcw=jnp.asarray(kf_Tcw),
            kf_alive=jnp.asarray(alive),
            kf_time=jnp.arange(F, dtype=jnp.float32),
            n_kfs=jnp.asarray(len(poses), jnp.int32),
        )
        slam.initialized = True
        return slam

    def test_dead_ref_kf_composes_through_anchor(self):
        T0, T1, T2 = _pose(0.0), _pose(0.1), _pose(0.2)
        slam = self._system_with_kfs([T0, T1, T2])
        # frame tracked relative to KF1
        Tcw_f = _pose(0.12)
        Tcr = Tcw_f @ np.linalg.inv(T1)
        slam.trajectory.append((1.5, Tcr, 1))
        # cull KF1, anchored to KF2 (pose relative at cull time)
        m = slam.map
        slam.map = m._replace(
            kf_alive=m.kf_alive.at[1].set(False),
            kf_anchor=m.kf_anchor.at[1].set(2),
            kf_Tca=m.kf_Tca.at[1].set(jnp.asarray(T1 @ np.linalg.inv(T2))),
        )
        # a loop correction moves KF2 (KF1, dead, is pinned = stale)
        D = _pose(0.05, 0.02, 0.01)
        T2_new = T2 @ D
        slam.map = slam.map._replace(
            kf_Tcw=slam.map.kf_Tcw.at[2].set(jnp.asarray(T2_new))
        )
        ts, poses = slam.get_trajectory()
        # expected: Tcw = Tcr @ (T1 rel T2) @ T2_new  — the correction
        # reaches the frame THROUGH the dead KF's anchor
        Tcw_expect = Tcr @ (T1 @ np.linalg.inv(T2)) @ T2_new
        Twc_expect = np.linalg.inv(Tcw_expect)
        np.testing.assert_allclose(poses[0], Twc_expect, atol=1e-5)

    def test_multi_hop_chain(self):
        """Anchor chains survive the anchor itself being culled later."""
        T = [_pose(0.1 * i) for i in range(4)]
        slam = self._system_with_kfs(T)
        Tcw_f = _pose(0.05)
        Tcr = Tcw_f @ np.linalg.inv(T[1])
        slam.trajectory.append((0.5, Tcr, 1))
        m = slam.map
        # KF1 culled -> anchor KF2; later KF2 culled -> anchor KF3
        slam.map = m._replace(
            kf_alive=m.kf_alive.at[jnp.asarray([1, 2])].set(False),
            kf_anchor=m.kf_anchor.at[1].set(2).at[2].set(3),
            kf_Tca=m.kf_Tca
            .at[1].set(jnp.asarray(T[1] @ np.linalg.inv(T[2])))
            .at[2].set(jnp.asarray(T[2] @ np.linalg.inv(T[3]))),
        )
        D = _pose(0.0, 0.03, -0.02)
        T3_new = T[3] @ D
        slam.map = slam.map._replace(
            kf_Tcw=slam.map.kf_Tcw.at[3].set(jnp.asarray(T3_new))
        )
        ts, poses = slam.get_trajectory()
        Tcw_expect = (
            Tcr @ (T[1] @ np.linalg.inv(T[2]))
            @ (T[2] @ np.linalg.inv(T[3])) @ T3_new
        )
        np.testing.assert_allclose(
            poses[0], np.linalg.inv(Tcw_expect), atol=1e-5)

    def test_keyframe_export_skips_dead(self, tmp_path):
        T = [_pose(0.1 * i) for i in range(3)]
        slam = self._system_with_kfs(T)
        m = slam.map
        slam.map = m._replace(kf_alive=m.kf_alive.at[1].set(False))
        out = tmp_path / "kf.txt"
        slam.save_keyframe_trajectory_tum(str(out))
        lines = [ln for ln in out.read_text().splitlines() if ln.strip()]
        assert len(lines) == 2  # dead KF1 skipped


class TestCullRecordsAnchor:
    def test_cull_keyframes_sets_anchor_and_relative_pose(self):
        """cull_keyframes must leave a usable (anchor, Tca) record."""
        from lc_crf_slam_tpu.models.mapping import cull_keyframes
        from lc_crf_slam_tpu.models.mapstate import (
            add_keyframe, add_points, empty_map,
        )
        from lc_crf_slam_tpu.models.frame import frame_from_observations
        from lc_crf_slam_tpu.geometry.camera import project_points

        rng = np.random.default_rng(4)
        cfg = SLAMConfig()
        n_pts = 300
        pts = np.stack([
            rng.uniform(-2, 2, n_pts), rng.uniform(-1.5, 1.5, n_pts),
            rng.uniform(2.5, 6, n_pts),
        ], -1).astype(np.float32)
        descs = rng.integers(0, 2**32, (n_pts, 8), dtype=np.uint32)
        m = empty_map(cfg)
        m, ids = add_points(
            m, jnp.asarray(pts), jnp.asarray(descs),
            jnp.zeros((n_pts, 3)), jnp.zeros(n_pts),
            jnp.full((n_pts,), 100.0), jnp.ones(n_pts, bool),
            jnp.asarray(0),
        )
        obs = jnp.full((cfg.map.max_features,), -1, jnp.int32)
        obs = obs.at[jnp.arange(n_pts)].set(ids[:n_pts])
        # 5 keyframes all observing the same cloud -> massive redundancy
        poses = [_pose(0.01 * i) for i in range(5)]
        for i, T in enumerate(poses):
            pc = pts @ T[:3, :3].T + T[:3, 3]
            uv, z = project_points(TUM3, jnp.asarray(pc))
            f = frame_from_observations(
                np.asarray(uv, np.float32), np.asarray(z, np.float32),
                descs, cfg.map.max_features, TUM3,
            )
            m, _ = add_keyframe(m, f, jnp.asarray(T),
                                jnp.asarray(float(i)), obs)
        m2 = cull_keyframes(cfg, m, jnp.asarray(4))
        alive = np.asarray(m2.kf_alive[:5])
        assert not alive.all(), "redundant KFs should be culled"
        anchor = np.asarray(m2.kf_anchor)
        Tca = np.asarray(m2.kf_Tca)
        kf_Tcw = np.asarray(m.kf_Tcw)
        for k in np.where(~alive)[0]:
            assert anchor[k] == 4, (k, anchor[k])
            # Tca reconstructs the culled pose through the anchor
            np.testing.assert_allclose(
                Tca[k] @ kf_Tcw[4], kf_Tcw[k], atol=1e-5
            )
        # live KFs keep the no-anchor sentinel
        for k in np.where(alive)[0]:
            assert anchor[k] == -1
