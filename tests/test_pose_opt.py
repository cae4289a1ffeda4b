"""Motion-only pose optimization: convergence, robustness, schedule."""

import numpy as np
import jax.numpy as jnp

from lc_crf_slam_tpu.config import PoseOptConfig
from lc_crf_slam_tpu.geometry.camera import TUM3, project_stereo
from lc_crf_slam_tpu.geometry.se3 import exp_se3, se3_apply, log_se3, se3_inverse
from lc_crf_slam_tpu.models.ba import pose_optimize

RNG = np.random.default_rng(5)
CAM = TUM3


def _setup(n=200, noise=0.3, outlier_frac=0.0, mono_frac=0.0, seed=0):
    rng = np.random.default_rng(seed)
    pw = np.stack([
        rng.uniform(-2, 2, n), rng.uniform(-1.5, 1.5, n), rng.uniform(2, 6, n)
    ], axis=-1).astype(np.float32)
    xi_true = np.array([0.1, -0.05, 0.08, 0.02, -0.03, 0.01], np.float32)
    T_true = np.asarray(exp_se3(jnp.asarray(xi_true)))
    pc = pw @ T_true[:3, :3].T + T_true[:3, 3]
    uvr, z = project_stereo(CAM, jnp.asarray(pc))
    uvr = np.asarray(uvr)
    uv = uvr[:, :2] + rng.normal(0, noise, (n, 2))
    ur = uvr[:, 2] + rng.normal(0, noise, n)
    n_out = int(outlier_frac * n)
    if n_out:
        uv[:n_out] += rng.uniform(20, 80, (n_out, 2)) * rng.choice([-1, 1], (n_out, 2))
    n_mono = int(mono_frac * n)
    if n_mono:
        ur[n_out : n_out + n_mono] = -1.0
    level = rng.integers(0, 4, n)
    return (jnp.asarray(pw), jnp.asarray(uv, jnp.float32),
            jnp.asarray(ur, jnp.float32), jnp.asarray(level),
            jnp.ones(n, bool), T_true)


def _pose_err(T, T_true):
    d = np.asarray(log_se3(jnp.asarray(T) @ se3_inverse(jnp.asarray(T_true))))
    return np.linalg.norm(d[:3]), np.linalg.norm(d[3:])


class TestPoseOptimize:
    def test_converges_from_identity(self):
        pw, uv, ur, level, valid, T_true = _setup(noise=0.0)
        r = pose_optimize(CAM, jnp.eye(4), pw, uv, ur, level, valid)
        t_err, r_err = _pose_err(r.Tcw, T_true)
        assert t_err < 1e-3 and r_err < 1e-3, (t_err, r_err)
        assert int(r.n_inliers) == 200

    def test_noise_tolerance(self):
        pw, uv, ur, level, valid, T_true = _setup(noise=0.5)
        r = pose_optimize(CAM, jnp.eye(4), pw, uv, ur, level, valid)
        t_err, r_err = _pose_err(r.Tcw, T_true)
        assert t_err < 0.01 and r_err < 0.005, (t_err, r_err)

    def test_outlier_rejection(self):
        pw, uv, ur, level, valid, T_true = _setup(noise=0.3, outlier_frac=0.3)
        r = pose_optimize(CAM, jnp.eye(4), pw, uv, ur, level, valid)
        t_err, r_err = _pose_err(r.Tcw, T_true)
        assert t_err < 0.02 and r_err < 0.01, (t_err, r_err)
        inl = np.asarray(r.inliers)
        assert not inl[:50].any(), "outliers marked inlier"
        assert inl[60:].mean() > 0.9

    def test_mono_points(self):
        pw, uv, ur, level, valid, T_true = _setup(noise=0.2, mono_frac=0.5)
        r = pose_optimize(CAM, jnp.eye(4), pw, uv, ur, level, valid)
        t_err, r_err = _pose_err(r.Tcw, T_true)
        assert t_err < 0.01 and r_err < 0.005

    def test_respects_valid_mask(self):
        pw, uv, ur, level, valid, T_true = _setup(noise=0.1)
        # corrupt half the points but mark them invalid
        uv_np = np.array(uv)
        uv_np[:100] += 500.0
        valid = jnp.asarray(np.arange(200) >= 100)
        r = pose_optimize(CAM, jnp.eye(4), pw, jnp.asarray(uv_np), ur, level, valid)
        t_err, _ = _pose_err(r.Tcw, T_true)
        assert t_err < 0.01
        assert not np.asarray(r.inliers)[:100].any()

    def test_far_initialization(self):
        pw, uv, ur, level, valid, T_true = _setup(noise=0.1, seed=3)
        T0 = np.asarray(exp_se3(jnp.asarray([0.3, 0.2, -0.2, 0.1, -0.08, 0.05])))
        r = pose_optimize(CAM, jnp.asarray(T0), pw, uv, ur, level, valid)
        t_err, r_err = _pose_err(r.Tcw, T_true)
        assert t_err < 0.01 and r_err < 0.005, (t_err, r_err)

    def test_behind_camera_excluded(self):
        pw, uv, ur, level, valid, T_true = _setup(noise=0.1)
        pw_np = np.array(pw)
        pw_np[:20, 2] = -5.0  # behind camera
        r = pose_optimize(CAM, jnp.eye(4), jnp.asarray(pw_np), uv, ur, level, valid)
        assert not np.asarray(r.inliers)[:20].any()
        t_err, _ = _pose_err(r.Tcw, T_true)
        assert t_err < 0.05
