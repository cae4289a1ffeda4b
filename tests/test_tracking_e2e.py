"""End-to-end tracking on synthetic sequences — the M1 acceptance slice
(SURVEY.md §8.2: sequence in -> trajectory out -> ATE evaluated)."""

import numpy as np
import pytest

from lc_crf_slam_tpu.config import SLAMConfig
from lc_crf_slam_tpu.geometry.camera import TUM3
from lc_crf_slam_tpu.models.system import SLAMSystem
from lc_crf_slam_tpu.utils.evaluate import evaluate_ate
from lc_crf_slam_tpu.utils.synthetic import SyntheticWorld


def run_observation_slam(world: SyntheticWorld, cfg=None, n=None):
    slam = SLAMSystem(world.cam, cfg or SLAMConfig())
    n = n or world.n_frames
    for k in range(n):
        f = world.frame(k)
        slam.track_rgbd.__self__  # no-op; keeps linters quiet
        slam.track_observations(f.uv, f.depth, f.desc, f.timestamp)
    ts_est, poses_est = slam.get_trajectory()
    ts_gt, poses_gt = world.groundtruth()
    ate = evaluate_ate(ts_est, poses_est, ts_gt[:n], poses_gt[:n])
    return slam, ate


class TestTrackingObservations:
    """Pipeline-only (front-end bypassed): static scene tracking."""

    def test_static_scene_ate(self):
        world = SyntheticWorld(
            cam=TUM3, n_frames=30, n_static=600, n_dynamic=0, seed=1
        )
        slam, ate = run_observation_slam(world)
        assert ate.rmse < 0.01, f"ATE {ate}"
        assert all(s.get("status", 1) == 1 for s in slam.stats[1:]), "lost tracking"

    def test_keyframes_created(self):
        from lc_crf_slam_tpu.config import TrackingConfig

        world = SyntheticWorld(
            cam=TUM3, n_frames=20, n_static=600, n_dynamic=0, seed=2,
            trajectory="line", depth_noise=0.003,
        )
        cfg = SLAMConfig(tracking=TrackingConfig(max_frames_between_kf=8))
        slam, ate = run_observation_slam(world, cfg=cfg)
        assert int(slam.map.n_kfs) >= 2, "no keyframes beyond init"
        assert ate.rmse < 0.03, f"ATE {ate}"

    def test_zero_noise_near_exact(self):
        """Regression test for the f32 small-angle/orthogonality bugs:
        with exact observations the trajectory must be exact."""
        world = SyntheticWorld(
            cam=TUM3, n_frames=20, n_static=500, n_dynamic=0, seed=3,
            pixel_noise=0.0, depth_noise=0.0, desc_flip_prob=0.0,
        )
        slam, ate = run_observation_slam(world)
        assert ate.rmse < 1e-4, f"ATE {ate}"

    def test_trajectory_export(self, tmp_path):
        world = SyntheticWorld(
            cam=TUM3, n_frames=10, n_static=400, n_dynamic=0, seed=4
        )
        slam, _ = run_observation_slam(world)
        p1 = str(tmp_path / "traj.txt")
        p2 = str(tmp_path / "kf.txt")
        slam.save_trajectory_tum(p1)
        slam.save_keyframe_trajectory_tum(p2)
        from lc_crf_slam_tpu.utils.io_tum import read_trajectory_tum

        ts, poses = read_trajectory_tum(p1)
        assert len(ts) == 10 and poses.shape == (10, 4, 4)

    def test_trajectory_tracks_corrected_keyframes(self):
        """SaveTrajectoryTUM semantics (reference src/System.cc): frame
        poses are stored relative to their reference keyframe, so a
        post-hoc keyframe correction (loop closure / global BA) must
        retroactively move every exported frame that referenced it."""
        import jax.numpy as jnp

        world = SyntheticWorld(
            cam=TUM3, n_frames=12, n_static=500, n_dynamic=0, seed=6
        )
        slam, _ = run_observation_slam(world)
        ts0, before = slam.get_trajectory()
        # rigidly shift every keyframe by a known world-frame delta
        # (what a loop correction does to the drifted segment)
        delta = np.eye(4)
        delta[:3, 3] = [0.5, -0.2, 0.1]
        T_corr = jnp.asarray(np.linalg.inv(delta))   # Tcw' = Tcw @ delta^-1
        slam.map = slam.map._replace(
            kf_Tcw=jnp.einsum("kij,jl->kil", slam.map.kf_Tcw, T_corr)
        )
        ts1, after = slam.get_trajectory()
        assert np.allclose(ts0, ts1)
        # every frame's Twc must have moved by exactly delta
        expect = np.einsum("ij,kjl->kil", delta, before)
        assert np.allclose(after, expect, atol=1e-5), (
            np.abs(after - expect).max()
        )

    def test_reset(self):
        world = SyntheticWorld(cam=TUM3, n_frames=5, n_static=300, n_dynamic=0)
        slam, _ = run_observation_slam(world, n=5)
        slam.reset()
        assert not slam.initialized and int(slam.map.n_points) == 0
        # can track again after reset
        f = world.frame(0)
        slam.track_observations(f.uv, f.depth, f.desc, 0.0)
        assert slam.initialized


@pytest.mark.slow
class TestTrackingImages:
    """Full pipeline including the image front-end."""

    def test_rendered_sequence_ate(self):
        """Full image pipeline accuracy over a whole trajectory."""
        world = SyntheticWorld(
            cam=TUM3, n_frames=20, n_static=500, n_dynamic=0, seed=5,
            pixel_noise=0.0, depth_noise=0.0,
        )
        slam = SLAMSystem(TUM3, SLAMConfig())
        for k in range(20):
            f = world.frame(k, render=True)
            slam.track_rgbd(f.image, f.depth_image, f.timestamp)
        ts_est, pe = slam.get_trajectory()
        gt_t, gt = world.groundtruth()
        ate = evaluate_ate(ts_est, pe, gt_t, gt)
        assert ate.rmse < 0.02, f"ATE {ate}"
        assert all(s.get("status", 1) == 1 for s in slam.stats[1:])

    def test_track_sequence_chunked(self):
        """Throughput mode (chunked lax.scan) matches per-frame quality."""
        from lc_crf_slam_tpu.config import TrackingConfig

        world = SyntheticWorld(
            cam=TUM3, n_frames=16, n_static=500, n_dynamic=0, seed=5,
            pixel_noise=0.0, depth_noise=0.0,
        )
        frames = [world.frame(k, render=True) for k in range(16)]
        grays = np.stack([f.image for f in frames])
        depths = np.stack([f.depth_image for f in frames])
        ts = [f.timestamp for f in frames]
        slam = SLAMSystem(
            TUM3, SLAMConfig(tracking=TrackingConfig(max_frames_between_kf=6))
        )
        poses = slam.track_sequence(grays, depths, ts, chunk=4)
        assert poses.shape == (15, 4, 4)
        ts_est, pe = slam.get_trajectory()
        gt_t, gt = world.groundtruth()
        ate = evaluate_ate(ts_est, pe, gt_t, gt)
        assert ate.rmse < 0.02, f"ATE {ate}"

    def test_track_sequence_relocalizes_after_blackout(self):
        """Throughput mode must not stay LOST forever: black frames kill
        tracking mid-sweep, and the camera then reappears in the START
        sector — which shares no covisibility with the mid-sweep
        reference keyframe, so the in-scan ref-KF fallback cannot
        recover. At the chunk boundary the driver re-runs the front-end
        on the chunk's last frame and relocalizes via global retrieval
        (Tracking::Relocalization — rare-path recovery on the host, not
        in the hot program)."""
        from lc_crf_slam_tpu.config import TrackingConfig
        from lc_crf_slam_tpu.geometry.camera import Pinhole

        qvga = Pinhole(fx=268.0, fy=270.0, cx=160.0, cy=120.0,
                       width=320, height=240, bf=20.0)
        # 96-frame sweep pacing keeps inter-frame yaw ~2.2 deg (inside
        # the matcher's capture range); by frame 35 the yaw is ~1.16 rad
        # > the ~1.08 rad QVGA FOV, so the mid-sweep reference KF shares
        # nothing with the start sector
        world = SyntheticWorld(
            cam=qvga, n_frames=96, n_static=1600, n_dynamic=0, seed=5,
            trajectory="sweep", pixel_noise=0.0, depth_noise=0.0,
        )
        frames = [world.frame(k, render=True) for k in range(36)]
        grays = [f.image for f in frames]
        depths = [f.depth_image for f in frames]
        black = np.zeros_like(grays[0])
        nodepth = np.zeros_like(depths[0])
        # sweep out, blackout, teleport back to the start sector
        # (yaw ~0): only retrieval-based reloc can reconnect
        seq_g = grays + [black, black] + grays[0:8]
        seq_d = depths + [nodepth, nodepth] + depths[0:8]
        ts = np.arange(len(seq_g), dtype=np.float64) / 30.0
        slam = SLAMSystem(
            qvga,
            SLAMConfig(tracking=TrackingConfig(max_frames_between_kf=4)),
        )
        slam.track_sequence(
            np.stack(seq_g).astype(np.float32),
            np.stack(seq_d).astype(np.float32), ts, chunk=4,
        )
        events = [s.get("event") for s in slam.stats]
        assert "chunk_lost" in events, events
        assert "chunk_reloc" in events, events
        assert int(slam.ts.status) == 1
        # recovered trajectory ends at the revisited frame's ground
        # truth (final sequence frame = start-sector frame 7)
        T_true = np.linalg.inv(world.gt_pose_twc(7))
        err = np.linalg.norm(
            np.asarray(slam.ts.Tcw)[:3, 3] - T_true[:3, 3])
        assert err < 0.06, err
