"""Tests: ATE/RPE evaluator, TUM IO round-trips, synthetic generator."""

import numpy as np
import jax.numpy as jnp

from lc_crf_slam_tpu.geometry import se3
from lc_crf_slam_tpu.geometry.camera import TUM3
from lc_crf_slam_tpu.utils.evaluate import evaluate_ate, evaluate_rpe
from lc_crf_slam_tpu.utils.io_tum import (
    write_trajectory_tum,
    read_trajectory_tum,
    associate,
)
from lc_crf_slam_tpu.utils.synthetic import SyntheticWorld

RNG = np.random.default_rng(3)


def _random_trajectory(n=50):
    ts = np.arange(n) / 30.0
    poses = np.tile(np.eye(4), (n, 1, 1))
    pos = np.cumsum(RNG.normal(0, 0.02, (n, 3)), axis=0)
    for i in range(n):
        w = 0.1 * np.sin(np.array([i / 10.0, i / 7.0, i / 13.0]))
        poses[i, :3, :3] = np.asarray(se3.exp_so3(jnp.asarray(w)))
        poses[i, :3, 3] = pos[i]
    return ts, poses


class TestATE:
    def test_identical_is_zero(self):
        ts, poses = _random_trajectory()
        r = evaluate_ate(ts, poses, ts, poses)
        assert r.rmse < 1e-6

    def test_rigid_offset_is_zero_after_alignment(self):
        ts, poses = _random_trajectory()
        w = jnp.asarray([0.3, -0.1, 0.2])
        R = np.asarray(se3.exp_so3(w))
        T = np.eye(4)
        T[:3, :3] = R
        T[:3, 3] = [1.0, 2.0, -0.5]
        moved = np.einsum("ij,njk->nik", T, poses)
        r = evaluate_ate(ts, moved, ts, poses)
        assert r.rmse < 1e-5

    def test_noise_gives_expected_magnitude(self):
        ts, poses = _random_trajectory(200)
        noisy = poses.copy()
        noisy[:, :3, 3] += RNG.normal(0, 0.05, (200, 3))
        r = evaluate_ate(ts, noisy, ts, poses)
        assert 0.05 < r.rmse < 0.14

    def test_rpe_zero_for_identical(self):
        ts, poses = _random_trajectory()
        t_err, r_err = evaluate_rpe(ts, poses, ts, poses, delta=0.5)
        assert t_err < 1e-6 and r_err < 1e-5


class TestTUMIO:
    def test_trajectory_roundtrip(self, tmp_path):
        ts, poses = _random_trajectory(20)
        path = str(tmp_path / "traj.txt")
        write_trajectory_tum(path, ts, poses)
        ts2, poses2 = read_trajectory_tum(path)
        np.testing.assert_allclose(ts2, ts, atol=1e-6)
        np.testing.assert_allclose(poses2, poses, atol=1e-5)

    def test_associate(self):
        a = [(i / 30.0, [f"a{i}"]) for i in range(30)]
        b = [(i / 30.0 + 0.003, [f"b{i}"]) for i in range(0, 30, 2)]
        m = associate(a, b)
        assert len(m) == 15
        for ta, fa, tb, fb in m:
            assert abs(ta - tb) < 0.02
            assert fa[0][1:] == fb[0][1:]


class TestSynthetic:
    def test_observations_consistent_with_gt(self):
        world = SyntheticWorld(cam=TUM3, n_frames=10, pixel_noise=0.0,
                               depth_noise=0.0, desc_flip_prob=0.0)
        f = world.frame(3)
        # Reproject GT world points through GT pose: must hit observed uv
        pts_w = world.points_at(3)[f.point_id]
        pc = pts_w @ f.T_cw[:3, :3].T + f.T_cw[:3, 3]
        u = TUM3.fx * pc[:, 0] / pc[:, 2] + TUM3.cx
        v = TUM3.fy * pc[:, 1] / pc[:, 2] + TUM3.cy
        np.testing.assert_allclose(f.uv[:, 0], u, atol=1e-3)
        np.testing.assert_allclose(f.uv[:, 1], v, atol=1e-3)
        np.testing.assert_allclose(f.depth, pc[:, 2], atol=1e-4)

    def test_descriptors_stable_across_frames(self):
        world = SyntheticWorld(cam=TUM3, n_frames=10, desc_flip_prob=0.0)
        f0, f5 = world.frame(0), world.frame(5)
        common = np.intersect1d(f0.point_id, f5.point_id)
        i0 = {p: i for i, p in enumerate(f0.point_id)}
        i5 = {p: i for i, p in enumerate(f5.point_id)}
        for p in common[:20]:
            np.testing.assert_array_equal(f0.desc[i0[p]], f5.desc[i5[p]])

    def test_dynamic_points_move(self):
        world = SyntheticWorld(cam=TUM3, n_frames=10)
        p0 = world.points_at(0)
        p9 = world.points_at(9)
        np.testing.assert_array_equal(
            p0[: world.n_static], p9[: world.n_static]
        )
        dyn_disp = np.linalg.norm(p9[world.n_static:] - p0[world.n_static:], axis=-1)
        assert np.all(dyn_disp > 0.1)

    def test_render(self):
        world = SyntheticWorld(cam=TUM3, n_frames=3, n_static=100, n_dynamic=0)
        f = world.frame(0, render=True)
        assert f.image.shape == (480, 640)
        # dots should be bright at observed locations
        ui = np.round(f.uv[:, 0]).astype(int)
        vi = np.round(f.uv[:, 1]).astype(int)
        assert np.mean(np.abs(f.image[vi, ui] - 132.5) > 95) > 0.55  # extreme centers (some occluded)
