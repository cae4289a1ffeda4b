"""Rendered loop-closure end-to-end gates (the fork's namesake: Loop
Closing + CRF dynamics, SURVEY.md §4.4 + §4.5 — reference LoopClosing.cc
driven by the full Tracking.cc image path).

Scenario: the camera yaw-sweeps away from its start sector (beyond the
FOV, so mid-sweep keyframes share no covisibility with the start) and
returns — a true revisit over a cylindrical point shell
(`SyntheticWorld(trajectory="sweep")`). QVGA intrinsics keep the
rotational flow in the matcher's capture range and the test fast.

Gates: the revisit must be DETECTED, geometrically verified and closed
(loop_log non-empty), with no accuracy damage (false or misaligned
corrections wreck ATE), and in the dynamic variant a textured rigid
mover in the start sector must be neutralized by the CRF defense while
the loop still closes — the combined claim in the system's name.
"""

import numpy as np
import pytest

from lc_crf_slam_tpu.config import SLAMConfig
from lc_crf_slam_tpu.geometry.camera import Pinhole
from lc_crf_slam_tpu.models.system import SLAMSystem
from lc_crf_slam_tpu.utils.evaluate import evaluate_ate
from lc_crf_slam_tpu.utils.synthetic import SyntheticWorld

QVGA = Pinhole(fx=268.0, fy=270.0, cx=160.0, cy=120.0,
               width=320, height=240, bf=20.0)
N = 96


def _run(billboard: bool):
    world = SyntheticWorld(
        cam=QVGA, n_frames=N, n_static=1600, n_dynamic=0, seed=3,
        trajectory="sweep", billboard=billboard, bb_speed=0.012,
        bb_center0=(-0.5, 0.0, 2.4), bb_size=(0.9, 1.2),
    )
    slam = SLAMSystem(QVGA, SLAMConfig(), enable_crf=True,
                      enable_mapping=True)
    for k in range(N):
        f = world.frame(k, render=True)
        slam.track_rgbd(f.image, f.depth_image, f.timestamp)
    ts_est, pe = slam.get_trajectory()
    gt_t, gt = world.groundtruth()
    ate = evaluate_ate(ts_est, pe, gt_t, gt).rmse
    lost = sum(1 for s in slam.stats if s.get("status", 1) != 1)
    return world, slam, ate, lost


@pytest.mark.slow
class TestRenderedLoopClosure:
    def test_sweep_closes_loop(self):
        world, slam, ate, lost = _run(billboard=False)
        # the revisit was detected, verified and corrected
        assert len(slam.loop_log) >= 1, slam.loop_log
        # ... early enough to be a genuine mid-run closure
        assert slam.loop_log[0]["kf"] < len(slam.kf_log)
        # and it did not damage the trajectory (false/misaligned
        # corrections blow ATE up by an order of magnitude)
        assert ate < 0.08, ate
        assert lost == 0, lost
        assert len(slam.kf_log) >= 15

    def test_sweep_with_dynamic_object_still_closes(self):
        """Mover in the start sector: CRF must neutralize it AND the
        loop must still close — dynamic features at the revisit would
        otherwise poison retrieval/verification (the paper's combined
        claim)."""
        world, slam, ate, lost = _run(billboard=True)
        assert len(slam.loop_log) >= 1, slam.loop_log
        assert ate < 0.10, ate
        assert lost <= 8, lost
        m = slam.map
        alive = np.asarray(m.p_alive)
        gtd = world.bb_gt_dynamic(np.asarray(m.p_xyz), n=N) & alive
        assert gtd.sum() <= 0.08 * max(alive.sum(), 1), (
            int(gtd.sum()), int(alive.sum()))
        # floor calibrated WITH post-loop group SearchAndFuse active:
        # cross-branch twins are now merged (measured 73 alive vs ~80
        # when duplicates survived), so the static map is deduplicated,
        # not shredded
        assert alive.sum() >= 55
