"""Rendered dynamic-scene end-to-end gate (VERDICT r1 #1, SURVEY.md §4.2+§4.5).

The product's headline claim, exercised as ONE pipeline on IMAGES:
front-end (pyramid/FAST/BRIEF) -> LK flow evidence -> consensus-audited
pose solves -> CRF labeling -> dynamic culling + spawn gating -> mapping.
The scenario is the synthetic analog of TUM walking_*: a textured rigid
billboard (~25-35%% of detected features, the walking-person share)
sweeping through a feature-dense static scene while the camera moves.

Gates: the defended ATE must be at least 4x better than the undefended
baseline (ORB-SLAM2-style, no CRF/no audit), the CRF must actually label
the mover mid-run, and the final map must be essentially mover-free.
"""

import dataclasses

import numpy as np
import pytest

from lc_crf_slam_tpu.config import SLAMConfig
from lc_crf_slam_tpu.geometry.camera import TUM3
from lc_crf_slam_tpu.models.system import SLAMSystem
from lc_crf_slam_tpu.utils.evaluate import evaluate_ate
from lc_crf_slam_tpu.utils.synthetic import SyntheticWorld

N_FRAMES = 40


def _world():
    # 60-frame trajectory normalization keeps inter-frame image motion in
    # the TUM-like 3-8 px band (LK's capture range); bb_speed 0.04 m/frame
    # gives the mover an ~8 px/frame flow mismatch at its 2.6 m depth.
    return SyntheticWorld(
        cam=TUM3, n_frames=60, n_static=1400, n_dynamic=0, seed=7,
        trajectory="line", billboard=True, bb_speed=0.04,
    )


def _run(defended: bool):
    world = _world()
    cfg = SLAMConfig()
    if not defended:
        cfg = dataclasses.replace(
            cfg,
            pose_opt=dataclasses.replace(
                cfg.pose_opt, consensus_hypotheses=0),
        )
    slam = SLAMSystem(TUM3, cfg, enable_crf=defended)
    init_dyn = None
    recalls = []
    for k in range(N_FRAMES):
        f = world.frame(k, render=True)
        slam.track_rgbd(f.image, f.depth_image, f.timestamp)
        m = slam.map
        if defended and k == 0:
            # the mover's points in the INITIAL map — the defense must
            # neutralize them (label dynamic, then cull)
            alive0 = np.asarray(m.p_alive)
            init_dyn = world.bb_gt_dynamic(np.asarray(m.p_xyz)) & alive0
        if defended and k in (2, 3, 4) and init_dyn is not None \
                and init_dyn.sum() >= 10:
            neutralized = (np.asarray(m.p_dyn) > 0.5) | ~np.asarray(
                m.p_alive)
            recalls.append(neutralized[init_dyn].mean())
    ts_est, poses = slam.get_trajectory()
    gt_t, gt = world.groundtruth()
    ate = evaluate_ate(ts_est, poses, gt_t, gt).rmse
    lost = sum(1 for s in slam.stats if s.get("status", 1) != 1)
    m = slam.map
    alive = np.asarray(m.p_alive)
    gtd = world.bb_gt_dynamic(np.asarray(m.p_xyz)) & alive
    return dict(
        ate=ate, lost=lost, alive=int(alive.sum()),
        dyn_alive=int(gtd.sum()),
        fp_rate=float(
            ((np.asarray(m.p_dyn) > 0.5) & alive & ~gtd).sum()
            / max((alive & ~gtd).sum(), 1)
        ),
        peak_recall=max(recalls) if recalls else 0.0,
    )


@pytest.mark.slow
class TestRenderedDynamicScene:
    def test_defended_beats_undefended_4x(self):
        d = _run(defended=True)
        u = _run(defended=False)
        # the mover must actually break the undefended tracker ...
        assert u["ate"] > 0.04, u
        # ... and the full defense chain must fix it, decisively
        assert d["ate"] < u["ate"] / 4.0, (d, u)
        assert d["ate"] < 0.03, d
        assert d["lost"] == 0, d
        # the defense neutralized the mover's initial-map points within
        # a few frames (CRF label -> cull), via the image pipeline's
        # flow evidence -> unary -> mean-field chain
        assert d["peak_recall"] >= 0.7, d
        # final map is essentially mover-free (culling + spawn gating),
        # without shredding the static map
        assert d["dyn_alive"] <= 0.10 * d["alive"], d
        assert d["fp_rate"] < 0.30, d
        assert d["alive"] >= 120, d

    def test_throughput_mode_parity_on_dynamic_world(self):
        """track_sequence (fused-chunk scan; KFs inserted in-scan) must
        hold the defended accuracy bar ON A DYNAMIC WORLD, not just the
        static one (VERDICT r1 item 10). CRF cadence differs (per chunk
        vs per frame), so the gate is the absolute defended bar, not
        bitwise pose equality."""
        world = _world()
        frames = [world.frame(k, render=True) for k in range(N_FRAMES)]
        grays = np.stack([f.image for f in frames]).astype(np.float32)
        depths = np.stack(
            [f.depth_image for f in frames]).astype(np.float32)
        ts = np.asarray([f.timestamp for f in frames])
        slam = SLAMSystem(TUM3, SLAMConfig(), enable_crf=True)
        poses = slam.track_sequence(grays, depths, ts, chunk=5)
        assert poses.shape == (N_FRAMES - 1, 4, 4)
        ts_est, pe = slam.get_trajectory()
        gt_t, gt = world.groundtruth()
        ate = evaluate_ate(ts_est, pe, gt_t, gt).rmse
        assert ate < 0.03, ate
        # keyframes were inserted mid-chunk (not only at chunk ends)
        assert len(slam.kf_log) >= 3
