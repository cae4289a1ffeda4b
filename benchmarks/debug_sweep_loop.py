"""Debug harness for the rendered RGB-D sweep loop e2e gate.

Replays tests/test_loopclosure_render_e2e.py::test_sweep_closes_loop
(static variant) with per-keyframe instrumentation of the loop-closing
ladder: detection validity/candidates, the current KF's similarity and
covisibility weight against the START-sector keyframes (the true loop
targets), host consistency streaks, and verification outcomes.

Env: REV=0 disables the reverse-direction neighbor fuse (A/B the
SearchInNeighbors reverse pass against loop-detection connectivity).
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=1")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")

import dataclasses as _dc

from lc_crf_slam_tpu.config import SLAMConfig
from lc_crf_slam_tpu.models.system import SLAMSystem
from lc_crf_slam_tpu.models.mapstate import covisibility
from lc_crf_slam_tpu.utils.evaluate import evaluate_ate
from lc_crf_slam_tpu.utils.synthetic import SyntheticWorld

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
from test_loopclosure_render_e2e import QVGA, N  # noqa: E402


def main():
    world = SyntheticWorld(
        cam=QVGA, n_frames=N, n_static=1600, n_dynamic=0, seed=3,
        trajectory="sweep", billboard=False,
    )
    cfg = SLAMConfig()
    if os.environ.get("REV") == "0":
        cfg = cfg.replace(mapping=_dc.replace(
            cfg.mapping, fuse_reverse_neighbors=0,
            interrupt_fuse_reverse_neighbors=0))
        print("### reverse fuse DISABLED")
    slam = SLAMSystem(QVGA, cfg, enable_crf=True, enable_mapping=True)

    covis_j = jax.jit(covisibility)
    orig_try = slam._try_close_loop

    def traced_try(pre=None):
        if pre is not None:
            kf, valid, cands, groups = pre
        else:
            lc = slam._detect_loop(slam.cfg, slam.map, slam.ts.ref_kf)
            kf, valid, cands, groups = (
                int(slam.ts.ref_kf), bool(lc.valid),
                np.asarray(lc.cands), np.asarray(lc.groups))
        n = int(slam.map.n_kfs)
        kf = int(kf)
        emb = np.asarray(slam.map.kf_emb)
        sim = emb[:n] @ emb[kf]
        cv = np.asarray(covis_j(slam.map))[kf, :n]
        alive = np.asarray(slam.map.kf_alive[:n])
        # replicate detect_loop's floor
        connected = cv > 0
        nbr = sim[connected & alive]
        min_score = min(nbr.min() if nbr.size else 0.0,
                        cfg.loop.min_score_cap)
        floor = max(min_score, cfg.loop.retrieval_floor)
        print(f"[KF {kf:3d}] n_kfs={n:3d} det_valid={bool(valid)} "
              f"cands={[int(c) for c in np.asarray(cands)]} "
              f"streaks={[int(s) for _, s in slam._consistent_groups]} "
              f"floor={floor:.3f}")
        start = ", ".join(
            f"{j}:s{sim[j]:.2f}/w{cv[j]:.0f}" for j in range(min(8, n)))
        print(f"        start-sector sim/weight: {start}")
        if bool(valid):
            for c in np.asarray(cands):
                if c < 0:
                    continue
                ver = slam._verify_loop(
                    slam.cfg, slam.cam, slam.map,
                    np.int32(kf), np.int32(c), jax.random.PRNGKey(0))
                print(f"        verify cand {int(c)}: "
                      f"acc={bool(ver.accepted)} "
                      f"n_inl={int(ver.n_inliers)} s={float(ver.s_corr):.3f}")
        return orig_try(pre=pre)

    slam._try_close_loop = traced_try

    if os.environ.get("THROUGHPUT"):
        print("### THROUGHPUT mode (chunk=15)")
        pf = [world.frame(k, render=True) for k in range(N)]
        grays = np.stack([f.image for f in pf]).astype(np.float32)
        depths = np.stack([f.depth_image for f in pf]).astype(np.float32)
        tss = np.asarray([f.timestamp for f in pf])
        slam.track_sequence(grays, depths, tss, chunk=15)
    else:
        for k in range(N):
            f = world.frame(k, render=True)
            slam.track_rgbd(f.image, f.depth_image, f.timestamp)
            st = slam.stats[-1] if slam.stats else {}
            if k % 8 == 0 or st.get("status") != 1:
                print(f"frame {k:3d} status={st.get('status')} "
                      f"n_kfs={int(slam.map.n_kfs)}")
    print("loop_log:", slam.loop_log)
    print("kf_log len:", len(slam.kf_log))
    ts_est, pe = slam.get_trajectory()
    gt_t, gt = world.groundtruth()
    res = evaluate_ate(ts_est, pe, gt_t, gt)
    lost = sum(1 for s in slam.stats if s.get("status", 1) != 1)
    print(f"ATE rmse: {res.rmse:.4f} lost={lost}")


if __name__ == "__main__":
    main()
