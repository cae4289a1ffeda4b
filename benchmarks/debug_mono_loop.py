"""Debug harness for the mono Sim3 loop e2e gate.

Replays tests/test_mono_sim3_loop_e2e.py (same world, same config, via
its make_world/make_config) with per-keyframe instrumentation of the
loop-closing ladder: detection scores/candidates, host consistency
streaks, and verification gate values for every candidate tried.

History: this harness pinned the r3 never-green cause — the r3 test's
forward-facing "loop" trajectory left every keyframe covisibility-
connected to every other (detection rightly rejects connected KFs) and
produced ~11 total keyframes against the 10-KF temporal separation
gate, so detection was structurally impossible on that world.
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_platforms", "cpu")

from lc_crf_slam_tpu.models.system import SLAMSystem
from lc_crf_slam_tpu.models.loopclosing import verify_loop
from lc_crf_slam_tpu.utils.evaluate import evaluate_ate

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
from test_mono_sim3_loop_e2e import (  # noqa: E402
    GAMMA, INJECT_FRAME, N, QVGA, _inject_scale_drift, make_config,
    make_world,
)


def main():
    world = make_world()
    slam = SLAMSystem(QVGA, make_config(), enable_crf=False,
                      enable_mapping=True)

    orig_try = slam._try_close_loop

    def traced_try(pre=None):
        kf = int(slam.ts.ref_kf)
        lc = slam._detect_loop(slam.cfg, slam.map, slam.ts.ref_kf)
        valid, cands, scores = jax.device_get(
            (lc.valid, lc.cands, lc.score))
        sim = np.asarray(slam.map.kf_emb @ slam.map.kf_emb[kf])
        n = int(slam.map.n_kfs)
        top = np.argsort(sim[:n])[::-1][:6]
        print(f"[KF {kf:3d}] n_kfs={n:3d} det_valid={bool(valid)} "
              f"cands={[int(c) for c in np.asarray(cands)]} "
              f"streaks={[int(s) for _, s in slam._consistent_groups]}")
        print("        sim top: "
              + " ".join(f"{i}:{sim[i]:.3f}" for i in top))
        if bool(valid):
            for c in np.asarray(cands):
                if c < 0:
                    continue
                slam._reloc_key, sub = jax.random.split(slam._reloc_key)
                ver = verify_loop(
                    slam.cfg, slam.cam, slam.map, slam.ts.ref_kf,
                    jnp.asarray(int(c), jnp.int32), sub)
                print(f"        verify cand {int(c)}: acc="
                      f"{bool(ver.accepted)} inl={int(ver.n_inliers)} "
                      f"s_corr={float(ver.s_corr):.4f}")
        return orig_try(pre=None)

    slam._try_close_loop = traced_try

    injected = False
    for k in range(N):
        f = world.frame(k)
        slam.track_observations_mono(f.uv, f.desc, f.timestamp)
        st = slam.stats[-1] if slam.stats else {}
        if k % 8 == 0 or st.get("status") == 2:
            print(f"frame {k:3d} status={st.get('status')} "
                  f"n_kfs={int(slam.map.n_kfs)} "
                  f"events={st.get('event', '')}")
        if not injected and slam.initialized and k >= INJECT_FRAME:
            _inject_scale_drift(slam, GAMMA)
            injected = True
            print(f"--- injected scale drift at frame {k} "
                  f"(n_kfs={int(slam.map.n_kfs)})")
    print("loop_log:", slam.loop_log)
    ts_est, pe = slam.get_trajectory()
    gt_t, gt = world.groundtruth()
    keep = np.asarray([int(r) >= 0 for _, _, r in slam.trajectory])
    res = evaluate_ate(ts_est[keep], pe[keep], gt_t, gt, with_scale=True)
    print("ATE rmse:", res.rmse)


if __name__ == "__main__":
    main()
