"""CRF dynamic labeler: mean-field vs exact enumeration, energy model,
and end-to-end dynamic-scene labeling (acceptance config 2:
'CRF dynamic-point segmentation + tracking')."""

import itertools

import numpy as np
import jax.numpy as jnp
import pytest

from lc_crf_slam_tpu.config import SLAMConfig, CRFConfig
from lc_crf_slam_tpu.geometry.camera import TUM3
from lc_crf_slam_tpu.models.crf import knn_graph, mean_field, unary_energies
from lc_crf_slam_tpu.models.system import SLAMSystem
from lc_crf_slam_tpu.utils.evaluate import evaluate_ate
from lc_crf_slam_tpu.utils.synthetic import SyntheticWorld


def exact_marginals(u_static, u_dyn, pair_w):
    """Brute-force Potts marginals by label enumeration (tiny graphs).

    pair_w: (N, N) symmetric pairwise weights (cost when labels differ).
    """
    n = len(u_static)
    logps = []
    labels = list(itertools.product([0, 1], repeat=n))  # 1 = dynamic
    for lab in labels:
        e = sum(u_dyn[i] if lab[i] else u_static[i] for i in range(n))
        for i in range(n):
            for j in range(i + 1, n):
                if lab[i] != lab[j]:
                    e += pair_w[i][j]
        logps.append(-e)
    logps = np.array(logps)
    p = np.exp(logps - logps.max())
    p /= p.sum()
    marg = np.zeros(n)
    for lab, pi in zip(labels, p):
        for i in range(n):
            if lab[i]:
                marg[i] += pi
    return marg


class TestMeanField:
    def test_matches_exact_on_tiny_graph(self):
        """4 fully-connected tracks: mean-field marginals should rank and
        approximate the exact Potts marginals."""
        cfg = SLAMConfig(crf=CRFConfig(mean_field_iters=30))
        u_s = np.array([0.2, 0.3, 5.0, 4.0], np.float32)   # 2 static, 2 dyn
        u_d = np.array([3.0, 3.0, 3.0, 3.0], np.float32)
        # clustered positions: 0,1 together; 2,3 together
        xyz = jnp.asarray([[0, 0, 0], [0.1, 0, 0], [2, 0, 0], [2.1, 0, 0]],
                          jnp.float32)
        ok = jnp.ones(4, bool)
        nbr, w = knn_graph(cfg, xyz, ok)
        q = np.asarray(mean_field(cfg, jnp.asarray(u_s), jnp.asarray(u_d),
                                  nbr, w, ok))
        w_full = np.zeros((4, 4))
        nbr_np, w_np = np.asarray(nbr), np.asarray(w)
        for i in range(4):
            for k in range(nbr_np.shape[1]):
                w_full[i, nbr_np[i, k]] += w_np[i, k] / 2  # symmetrize approx
        w_full = w_full + w_full.T
        exact = exact_marginals(u_s, u_d, w_full)
        # static tracks low q, dynamic tracks high q; ordering matches
        assert q[0] < 0.2 and q[1] < 0.2
        assert q[2] > 0.7 and q[3] > 0.7
        np.testing.assert_allclose(q, exact, atol=0.25)

    def test_smoothing_flips_weak_outlier(self):
        """A weakly-dynamic-looking track surrounded by static neighbors
        should be smoothed to static."""
        cfg = SLAMConfig(crf=CRFConfig(mean_field_iters=20))
        n = 9
        u_s = np.full(n, 0.3, np.float32)
        u_s[4] = 4.4  # just above bias: alone it would flip dynamic
        u_d = np.full(n, 4.0, np.float32)
        xyz = jnp.asarray(
            [[0.1 * (i % 3), 0.1 * (i // 3), 0.0] for i in range(n)],
            jnp.float32,
        )
        ok = jnp.ones(n, bool)
        nbr, w = knn_graph(cfg, xyz, ok)
        q = np.asarray(mean_field(cfg, jnp.asarray(u_s), jnp.asarray(u_d),
                                  nbr, w, ok))
        assert q[4] < 0.5, f"outlier not smoothed: q={q[4]}"

    def test_unary_monotone_in_error(self):
        from lc_crf_slam_tpu.models.mapstate import empty_map

        cfg = SLAMConfig()
        m = empty_map(cfg)
        m = m._replace(
            p_err_ema=m.p_err_ema.at[:3].set(jnp.asarray([0.0, 1.0, 3.0]))
        )
        u_s, u_d = unary_energies(cfg, m, jnp.arange(3))
        u_s = np.asarray(u_s)
        assert u_s[0] < u_s[1] < u_s[2]
        assert np.all(np.asarray(u_d) == u_d[0])


@pytest.mark.slow
class TestCRFE2E:
    def test_dynamic_scene_labeling_and_ate(self):
        world = SyntheticWorld(cam=TUM3, n_frames=30, n_static=900,
                               n_dynamic=90, seed=4, dynamic_speed=0.03)
        slam = SLAMSystem(TUM3, SLAMConfig(), enable_crf=True)
        for k in range(30):
            f = world.frame(k)
            slam.track_observations(f.uv, f.depth, f.desc, f.timestamp)
        ts_est, pe = slam.get_trajectory()
        gt_t, pg = world.groundtruth()
        ate = evaluate_ate(ts_est, pe, gt_t, pg)
        assert ate.rmse < 0.005, f"ATE {ate}"
        # labeling quality vs GT
        m = slam.map
        npts = int(m.n_points)
        px = np.asarray(m.p_xyz[:npts])
        gt0 = world.points_at(0)
        nd = np.linalg.norm(px[:, None, :] - gt0[None, :, :], axis=-1)
        nid = nd.argmin(axis=1)
        ndist = nd.min(axis=1)
        is_dyn = (nid >= 900) & (ndist < 0.15)
        is_stat = (nid < 900) & (ndist < 0.15)
        lab = np.asarray(m.p_dyn[:npts]) > 0.5
        tp = (lab & is_dyn).sum()
        fp = (lab & is_stat).sum()
        assert tp > 0.45 * is_dyn.sum(), (tp, is_dyn.sum())
        assert fp < 0.15 * is_stat.sum(), (fp, is_stat.sum())

    def test_static_scene_no_false_dynamics(self):
        world = SyntheticWorld(cam=TUM3, n_frames=20, n_static=700,
                               n_dynamic=0, seed=6)
        slam = SLAMSystem(TUM3, SLAMConfig(), enable_crf=True)
        for k in range(20):
            f = world.frame(k)
            slam.track_observations(f.uv, f.depth, f.desc, f.timestamp)
        m = slam.map
        npts = int(m.n_points)
        frac_dyn = float((np.asarray(m.p_dyn[:npts]) > 0.5).mean())
        assert frac_dyn < 0.05, frac_dyn
        ts_est, pe = slam.get_trajectory()
        gt_t, pg = world.groundtruth()
        assert evaluate_ate(ts_est, pe, gt_t, pg).rmse < 0.005


@pytest.mark.slow
class TestCRFStress:
    def test_dynamic_defense_rescues_heavy_dynamic_scene(self):
        """The paper's headline claim in miniature (config 2/3 ladder):
        with ~25% of matched points on a coherently moving object, the
        undefended Huber LM tracker is captured by the compromise basin
        from frame 1 — the standard-chi2 inlier count PREFERS the
        captured pose (cluster fits exactly + far statics loosely), the
        ORB-SLAM2 failure mode on walking scenes (~0.1 m ATE here).
        The dynamic defense (tight-window consensus audit in
        ba.pose_consensus + CRF labeling/exclusion) restores ~mm
        accuracy."""
        import dataclasses

        from lc_crf_slam_tpu.config import TrackingConfig

        results = {}
        for defended in (False, True):
            world = SyntheticWorld(
                cam=TUM3, n_frames=60, n_static=700, n_dynamic=150,
                seed=4, dynamic_speed=0.03,
            )
            cfg = SLAMConfig(
                tracking=TrackingConfig(max_frames_between_kf=10))
            if not defended:
                cfg = dataclasses.replace(
                    cfg,
                    pose_opt=dataclasses.replace(
                        cfg.pose_opt, consensus_hypotheses=0
                    ),
                )
            slam = SLAMSystem(TUM3, cfg, enable_crf=defended)
            for k in range(60):
                f = world.frame(k)
                slam.track_observations(f.uv, f.depth, f.desc, f.timestamp)
            ts_est, pe = slam.get_trajectory()
            gt_t, gt = world.groundtruth()
            results[defended] = evaluate_ate(ts_est, pe, gt_t, gt).rmse
        # contrast floor 0.03 (was 0.05): the SaveTrajectoryTUM-style
        # relative export retroactively applies local-BA refinements to
        # every frame, which improves even the undefended trajectory —
        # the capture is still an order of magnitude above the defended
        # run, which the ratio gate pins
        assert results[False] > 0.03, (
            f"undefended tracker unexpectedly robust: {results}"
        )
        assert results[True] < 0.02, f"defense did not rescue: {results}"
        assert results[True] < 0.25 * results[False], results
