"""Pose-graph optimization + batched Horn RANSAC unit tests."""

import numpy as np
import jax
import jax.numpy as jnp

from lc_crf_slam_tpu.geometry.se3 import exp_se3, se3_inverse
from lc_crf_slam_tpu.models.posegraph import (
    PoseGraph,
    edge_residuals,
    optimize_pose_graph,
)
from lc_crf_slam_tpu.ops.ransac import horn_ransac

RNG = np.random.default_rng(2)


def _chain_with_drift(n=20, drift=0.02):
    """Ground-truth loop trajectory + drifted odometry estimates."""
    gt = [np.eye(4, dtype=np.float32)]
    for i in range(1, n):
        ang = 2 * np.pi / n
        xi = np.array([0.3, 0.0, 0.02, 0.0, ang, 0.0], np.float32)
        gt.append(np.asarray(exp_se3(jnp.asarray(xi))) @ gt[-1])
    gt = np.stack(gt)
    # odometry with accumulating drift
    est = [gt[0]]
    for i in range(1, n):
        rel = gt[i] @ np.linalg.inv(gt[i - 1])
        noise = np.asarray(exp_se3(jnp.asarray(
            RNG.normal(0, drift, 6).astype(np.float32))))
        est.append(noise @ rel @ est[-1])
    return gt, np.stack(est)


class TestPoseGraph:
    def test_loop_closure_reduces_drift(self):
        n = 20
        gt, est = _chain_with_drift(n)
        F = 32
        Tcw = np.tile(np.eye(4, dtype=np.float32), (F, 1, 1))
        Tcw[:n] = est
        node_valid = np.zeros(F, bool); node_valid[:n] = True
        node_fixed = np.zeros(F, bool); node_fixed[0] = True
        # edges: sequential chain with measured rel from est (drifted),
        # plus one loop edge n-1 -> 0 with the TRUE relative pose
        e_i = np.arange(n - 1, dtype=np.int32)
        e_j = e_i + 1
        rel = np.stack([est[i + 1] @ np.linalg.inv(est[i]) for i in range(n - 1)])
        loop_rel = (gt[0] @ np.linalg.inv(gt[n - 1]))[None]
        g = PoseGraph(
            Tcw=jnp.asarray(Tcw),
            node_valid=jnp.asarray(node_valid),
            node_fixed=jnp.asarray(node_fixed),
            e_i=jnp.asarray(np.concatenate([e_j, [0]]).astype(np.int32)),
            e_j=jnp.asarray(np.concatenate([e_i, [n - 1]]).astype(np.int32)),
            e_rel=jnp.asarray(np.concatenate([rel, loop_rel]).astype(np.float32)),
            e_w=jnp.asarray(np.concatenate([np.ones(n - 1), [5.0]]).astype(np.float32)),
            e_valid=jnp.ones(n, bool),
        )
        err_before = np.linalg.norm(est[n - 1][:3, 3] - gt[n - 1][:3, 3])
        out = np.asarray(optimize_pose_graph(g, n_iters=15))
        err_after = np.linalg.norm(out[n - 1][:3, 3] - gt[n - 1][:3, 3])
        assert err_after < 0.5 * err_before, (err_before, err_after)
        # fixed node unmoved
        np.testing.assert_array_equal(out[0], est[0])

    def test_zero_residual_at_consistent_graph(self):
        gt, _ = _chain_with_drift(6, drift=0.0)
        F = 8
        Tcw = np.tile(np.eye(4, dtype=np.float32), (F, 1, 1))
        Tcw[:6] = gt
        e_i = np.arange(5, dtype=np.int32) + 1
        e_j = np.arange(5, dtype=np.int32)
        rel = np.stack([gt[i + 1] @ np.linalg.inv(gt[i]) for i in range(5)])
        g = PoseGraph(
            Tcw=jnp.asarray(Tcw),
            node_valid=jnp.asarray(np.arange(F) < 6),
            node_fixed=jnp.asarray(np.arange(F) == 0),
            e_i=jnp.asarray(e_i), e_j=jnp.asarray(e_j),
            e_rel=jnp.asarray(rel),
            e_w=jnp.ones(5), e_valid=jnp.ones(5, bool),
        )
        r = np.asarray(edge_residuals(g.Tcw, g))
        assert np.abs(r).max() < 1e-5


class TestHornRansac:
    def test_recovers_rigid_with_outliers(self):
        n = 100
        src = RNG.normal(0, 2, (n, 3)).astype(np.float32)
        R_true = np.asarray(exp_se3(jnp.asarray(
            [0, 0, 0, 0.3, -0.2, 0.5], jnp.float32)))[:3, :3]
        t_true = np.array([1.0, -0.5, 2.0], np.float32)
        dst = src @ R_true.T + t_true
        dst[:30] += RNG.uniform(0.5, 3.0, (30, 3)).astype(np.float32)  # outliers
        res = horn_ransac(
            jnp.asarray(src), jnp.asarray(dst), jnp.ones(n, bool),
            jax.random.PRNGKey(0), inlier_tol=0.05,
        )
        np.testing.assert_allclose(np.asarray(res.R), R_true, atol=1e-3)
        np.testing.assert_allclose(np.asarray(res.t), t_true, atol=1e-2)
        inl = np.asarray(res.inliers)
        assert not inl[:30].any() and inl[30:].mean() > 0.95

    def test_respects_valid_mask(self):
        n = 50
        src = RNG.normal(0, 2, (n, 3)).astype(np.float32)
        dst = src + np.array([0.5, 0, 0], np.float32)
        dst[:20] += 100.0  # garbage, masked out
        valid = np.arange(n) >= 20
        res = horn_ransac(
            jnp.asarray(src), jnp.asarray(dst), jnp.asarray(valid),
            jax.random.PRNGKey(1), inlier_tol=0.05,
        )
        np.testing.assert_allclose(np.asarray(res.t), [0.5, 0, 0], atol=1e-2)
        assert int(res.n_inliers) == 30
