"""Triangulation ops + monocular two-view initialization."""

import numpy as np
import jax
import jax.numpy as jnp

from lc_crf_slam_tpu.geometry.camera import TUM3, project_points
from lc_crf_slam_tpu.geometry.se3 import exp_se3, se3_apply
from lc_crf_slam_tpu.models.initializer import initialize_mono
from lc_crf_slam_tpu.ops.triangulate import epipolar_gate, triangulate_pairs

RNG = np.random.default_rng(17)


def _two_views(n=200, baseline=0.3, noise=0.0):
    pts = np.stack([
        RNG.uniform(-2, 2, n), RNG.uniform(-1.5, 1.5, n),
        RNG.uniform(2.5, 6, n),
    ], -1).astype(np.float32)
    T1 = np.eye(4, dtype=np.float32)
    T2 = np.asarray(exp_se3(jnp.asarray(
        [baseline, 0.02, 0.01, 0.01, -0.05, 0.005], jnp.float32)))
    uv = []
    for T in (T1, T2):
        pc = pts @ T[:3, :3].T + T[:3, 3]
        u, _ = project_points(TUM3, jnp.asarray(pc))
        uv.append(np.asarray(u) + RNG.normal(0, noise, (n, 2)))
    return pts, T1, T2, uv[0].astype(np.float32), uv[1].astype(np.float32)


class TestTriangulation:
    def test_recovers_points(self):
        pts, T1, T2, uv1, uv2 = _two_views(noise=0.2)
        tri = triangulate_pairs(
            TUM3, jnp.asarray(T1), jnp.asarray(T2),
            jnp.asarray(uv1), jnp.asarray(uv2), jnp.ones(len(pts), bool),
        )
        ok = np.asarray(tri.ok)
        assert ok.mean() > 0.9
        err = np.linalg.norm(np.asarray(tri.xyz)[ok] - pts[ok], axis=-1)
        assert np.median(err) < 0.03, np.median(err)

    def test_rejects_no_parallax(self):
        pts, T1, _, uv1, _ = _two_views()
        # identical views: no parallax
        tri = triangulate_pairs(
            TUM3, jnp.asarray(T1), jnp.asarray(T1),
            jnp.asarray(uv1), jnp.asarray(uv1), jnp.ones(len(pts), bool),
        )
        assert int(tri.ok.sum()) == 0

    def test_epipolar_gate_accepts_true_pairs(self):
        pts, T1, T2, uv1, uv2 = _two_views(n=64)
        g = np.asarray(epipolar_gate(
            TUM3, jnp.asarray(T1), jnp.asarray(T2),
            jnp.asarray(uv1), jnp.asarray(uv2),
        ))
        diag = np.diag(g)
        assert diag.mean() > 0.95       # true pairs pass
        off = g[~np.eye(len(pts), dtype=bool)]
        assert off.mean() < 0.25        # most wrong pairs rejected


class TestMonoInit:
    def test_recovers_relative_pose_up_to_scale(self):
        pts, T1, T2, uv1, uv2 = _two_views(n=300, baseline=0.4, noise=0.3)
        res = initialize_mono(
            TUM3, jnp.asarray(uv1), jnp.asarray(uv2),
            jnp.ones(len(pts), bool), jax.random.PRNGKey(0),
        )
        assert bool(res.accepted), int(res.n_good)
        # direction of translation matches up to scale
        t_est = np.asarray(res.Tcw2)[:3, 3]
        t_true = T2[:3, 3]
        cos = np.dot(t_est, t_true) / (
            np.linalg.norm(t_est) * np.linalg.norm(t_true))
        assert cos > 0.99, cos
        # rotation close
        R_err = np.asarray(res.Tcw2)[:3, :3] @ T2[:3, :3].T
        ang = np.arccos(np.clip((np.trace(R_err) - 1) / 2, -1, 1))
        assert ang < 0.02, ang
        # triangulated structure matches GT up to the scale factor
        ok = np.asarray(res.ok)
        scale = np.median(pts[ok][:, 2]) / np.median(
            np.asarray(res.xyz)[ok][:, 2])
        err = np.linalg.norm(
            np.asarray(res.xyz)[ok] * scale - pts[ok], axis=-1)
        assert np.median(err) < 0.1, np.median(err)

    def test_rejects_pure_rotation(self):
        """No-translation pairs are degenerate for E: must not accept."""
        pts = np.stack([
            RNG.uniform(-2, 2, 200), RNG.uniform(-1.5, 1.5, 200),
            RNG.uniform(2.5, 6, 200),
        ], -1).astype(np.float32)
        T1 = np.eye(4, dtype=np.float32)
        T2 = np.asarray(exp_se3(jnp.asarray(
            [0, 0, 0, 0.02, -0.04, 0.01], jnp.float32)))
        uvs = []
        for T in (T1, T2):
            pc = pts @ T[:3, :3].T + T[:3, 3]
            u, _ = project_points(TUM3, jnp.asarray(pc))
            uvs.append(jnp.asarray(np.asarray(u), jnp.float32))
        res = initialize_mono(
            TUM3, uvs[0], uvs[1], jnp.ones(len(pts), bool),
            jax.random.PRNGKey(1),
        )
        assert not bool(res.accepted) or int(res.n_good) < 60
