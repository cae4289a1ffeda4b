"""Mapping backend integration: local BA + culling + fusion in the loop.

Acceptance config 1 equivalent (BASELINE.json): RGB-D tracking + local BA
on a static scene.
"""

import numpy as np
import jax.numpy as jnp

from lc_crf_slam_tpu.config import SLAMConfig, TrackingConfig
from lc_crf_slam_tpu.geometry.camera import TUM3
from lc_crf_slam_tpu.models.mapping import (
    cull_points,
    fuse_duplicates,
    mapping_step,
)
from lc_crf_slam_tpu.models.system import SLAMSystem
from lc_crf_slam_tpu.utils.evaluate import evaluate_ate
from lc_crf_slam_tpu.utils.synthetic import SyntheticWorld


def _run(world, n, mapping, maxkf=10):
    cfg = SLAMConfig(tracking=TrackingConfig(max_frames_between_kf=maxkf))
    slam = SLAMSystem(TUM3, cfg, enable_mapping=mapping)
    for k in range(n):
        f = world.frame(k)
        slam.track_observations(f.uv, f.depth, f.desc, f.timestamp)
    ts_est, pe = slam.get_trajectory()
    ts_gt, pg = world.groundtruth()
    ate = evaluate_ate(ts_est, pe, ts_gt[:n], pg[:n])
    return slam, ate


class TestMappingE2E:
    def test_local_ba_improves_or_holds_ate(self):
        w1 = SyntheticWorld(cam=TUM3, n_frames=40, n_static=600, n_dynamic=0,
                            seed=1, depth_noise=0.01)
        _, ate_off = _run(w1, 40, mapping=False)
        w2 = SyntheticWorld(cam=TUM3, n_frames=40, n_static=600, n_dynamic=0,
                            seed=1, depth_noise=0.01)
        slam, ate_on = _run(w2, 40, mapping=True)
        assert ate_on.rmse < 0.01
        assert ate_on.rmse <= ate_off.rmse * 1.5, (ate_on, ate_off)
        # map stays healthy
        assert int(np.asarray(slam.map.p_alive).sum()) > 200
        assert all(s.get("status", 1) == 1 for s in slam.stats[1:])

    def test_ba_refines_noisy_points(self):
        """Map points carry depth-noise radial error at creation; local BA
        must shrink the error using multi-view constraints."""
        world = SyntheticWorld(cam=TUM3, n_frames=40, n_static=600,
                               n_dynamic=0, seed=2, depth_noise=0.01)
        slam, ate = _run(world, 40, mapping=True, maxkf=8)
        m = slam.map
        alive = np.asarray(m.p_alive)
        px = np.asarray(m.p_xyz)[alive]
        gt = world.points_at(0)[: world.n_static]
        d = np.linalg.norm(px[:, None, :] - gt[None, :, :], axis=-1).min(axis=1)
        # creation error is ~1% of depth (2-6 m) ≈ 2-6 cm; BA should beat it
        assert np.median(d) < 0.02, np.median(d)

    def test_cull_points_ratio(self):
        from lc_crf_slam_tpu.models.mapstate import empty_map

        cfg = SLAMConfig()
        m = empty_map(cfg)
        m = m._replace(
            p_alive=m.p_alive.at[:4].set(True),
            p_visible=m.p_visible.at[:4].set(jnp.asarray([10, 10, 2, 10])),
            p_found=m.p_found.at[:4].set(jnp.asarray([1, 9, 1, 10])),
            p_n_obs=m.p_n_obs.at[:4].set(5),
            n_kfs=jnp.asarray(1),
        )
        m2 = cull_points(cfg, m)
        alive = np.asarray(m2.p_alive[:4])
        np.testing.assert_array_equal(alive, [False, True, True, True])

    def test_fuse_merges_duplicates(self):
        """Two points at the same location with the same descriptor: the
        target keyframe's fuse pass must merge them."""
        from lc_crf_slam_tpu.models.frame import frame_from_observations
        from lc_crf_slam_tpu.models.mapstate import (
            add_keyframe,
            add_points,
            empty_map,
        )

        cfg = SLAMConfig()
        rng = np.random.default_rng(0)
        m = empty_map(cfg)
        desc = rng.integers(0, 2**32, (2, 8), dtype=np.uint32)
        desc[1] = desc[0]  # identical descriptors
        xyz = np.array([[0.5, 0.2, 3.0], [0.5, 0.2, 3.0]], np.float32)
        m, ids = add_points(
            m, jnp.asarray(xyz), jnp.asarray(desc),
            jnp.zeros((2, 3)), jnp.zeros(2), jnp.full((2,), 100.0),
            jnp.ones(2, bool), jnp.asarray(0),
        )
        m = m._replace(p_n_obs=m.p_n_obs.at[0].set(3).at[1].set(1))
        # keyframe at identity observing point 0
        u = TUM3.fx * 0.5 / 3.0 + TUM3.cx
        v = TUM3.fy * 0.2 / 3.0 + TUM3.cy
        frame = frame_from_observations(
            np.array([[u, v]], np.float32), np.array([3.0], np.float32),
            desc[:1], cfg.map.max_features, TUM3,
        )
        obs = jnp.full((cfg.map.max_features,), -1, jnp.int32).at[0].set(0)
        m, kf = add_keyframe(m, frame, jnp.eye(4), jnp.asarray(0.0), obs)
        m2 = fuse_duplicates(cfg, TUM3, m, kf)
        alive = np.asarray(m2.p_alive[:2])
        assert alive[0] and not alive[1], alive  # dup (fewer obs) dies

    def test_keyframe_culling_kills_redundant(self):
        """Insert keyframes at identical poses: redundancy culling should
        remove some."""
        world = SyntheticWorld(cam=TUM3, n_frames=30, n_static=600,
                               n_dynamic=0, seed=3)
        cfg = SLAMConfig(tracking=TrackingConfig(max_frames_between_kf=2))
        slam = SLAMSystem(TUM3, cfg, enable_mapping=True)
        for k in range(30):
            f = world.frame(k)
            slam.track_observations(f.uv, f.depth, f.desc, f.timestamp)
        n_created = int(slam.map.n_kfs)
        n_alive = int(np.asarray(slam.map.kf_alive).sum())
        assert n_created >= 8
        assert n_alive < n_created, (n_alive, n_created)
