"""Per-stage device-time table for PERF.md (VERDICT r2 item 3).

Runs the billboard scenario to a realistic mid-run map state, then times
every jitted pipeline stage with a hard device fence (block_until_ready
+ host fetch) around REPS repetitions. This is the honest per-stage
cost — the in-system StageTimer measures dispatch wall-clock only,
which under async dispatch says nothing about device occupancy.

Usage: /opt/venv/bin/python benchmarks/stage_bench.py [--cpu] [--frames N]
Prints a table + one JSON line (stage -> ms).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--frames", type=int, default=12)
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--mapping-detail", action="store_true",
                    help="also time each mapping_step substage")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from lc_crf_slam_tpu import enable_compilation_cache
    enable_compilation_cache()
    from lc_crf_slam_tpu.config import SLAMConfig
    from lc_crf_slam_tpu.geometry.camera import TUM3
    from lc_crf_slam_tpu.models.system import SLAMSystem
    from lc_crf_slam_tpu.models.crf import crf_step
    from lc_crf_slam_tpu.models.frame import build_frame
    from lc_crf_slam_tpu.models.loopclosing import detect_loop, global_ba
    from lc_crf_slam_tpu.models.mapping import mapping_step
    from lc_crf_slam_tpu.models.tracking import insert_keyframe, track_step
    from lc_crf_slam_tpu.utils.synthetic import SyntheticWorld

    cfg = SLAMConfig()
    cam = TUM3
    world = SyntheticWorld(
        cam=cam, n_frames=60, n_static=1400, n_dynamic=0, seed=7,
        trajectory="line", billboard=True, bb_speed=0.04,
    )
    slam = SLAMSystem(cam, cfg, enable_crf=True, enable_mapping=True)
    frames = [world.frame(k, render=True) for k in range(args.frames + 1)]
    for k in range(args.frames):
        slam.track_rgbd(frames[k].image, frames[k].depth_image,
                        frames[k].timestamp)

    m, ts = slam.map, slam.ts
    gray = jnp.asarray(frames[args.frames].image, jnp.float32)
    depth = jnp.asarray(frames[args.frames].depth_image, jnp.float32)
    gray_prev = jnp.asarray(frames[args.frames - 1].image, jnp.float32)
    frame = slam._build_frame(cam, cfg, gray, depth)

    stages = {
        "frontend": lambda: slam._build_frame(cam, cfg, gray, depth),
        "track_step": lambda: slam._track(cfg, cam, m, ts, frame),
        "flow_evidence": lambda: slam._flow_evidence(
            cfg, cam, m, gray_prev, gray, ts.last_uv, ts.last_obs,
            ts.last_valid, ts.Tcw),
        "crf_step": lambda: slam._crf(cfg, m, ts.frame_idx),
        "insert_kf": lambda: slam._insert_kf(
            cfg, cam, m, ts, frame,
            jnp.full((frame.capacity,), -1, jnp.int32),
            jnp.asarray(0.0), None, None),
        "mapping_step": lambda: slam._mapping(cfg, cam, m, ts.ref_kf),
        "detect_loop": lambda: slam._detect_loop(cfg, m, ts.ref_kf),
        "global_ba": lambda: slam._global_ba(cfg, cam, m, 2),
    }

    if args.mapping_detail:
        from lc_crf_slam_tpu.models import mapping as mp

        for name, fn in [
            ("map/triangulate", mp.create_new_points),
            ("map/fuse", mp.fuse_duplicates),
            ("map/refresh", mp.refresh_point_stats),
            ("map/local_ba", mp.local_bundle_adjustment),
        ]:
            stages[name] = (
                lambda f=jax.jit(fn, static_argnums=(0, 1)):
                f(cfg, cam, m, ts.ref_kf)
            )
        stages["map/cull_pts"] = (
            lambda f=jax.jit(mp.cull_points, static_argnums=(0,)):
            f(cfg, m)
        )
        stages["map/cull_kfs"] = (
            lambda f=jax.jit(mp.cull_keyframes, static_argnums=(0,)):
            f(cfg, m, ts.ref_kf)
        )

    def fence(res):
        # block_until_ready does NOT block on the axon remote backend —
        # fence with a concrete (tiny) host fetch of one result leaf
        leaf = jax.tree.leaves(res)[0]
        return np.asarray(jnp.ravel(leaf)[0])

    out = {}
    for name, fn in stages.items():
        fence(fn())                          # compile + warm
        t0 = time.perf_counter()
        for _ in range(args.reps):
            fence(fn())
        out[name] = (time.perf_counter() - t0) / args.reps * 1e3

    dev = jax.devices()[0].platform
    n_pts = int(np.asarray(m.n_points))
    n_kfs = int(np.asarray(m.n_kfs))
    print(f"# device={dev} map: {n_pts} points / {n_kfs} KFs "
          f"after {args.frames} dynamic frames")
    print(f"{'stage':<16} {'ms/call':>9}")
    for name, ms in out.items():
        print(f"{name:<16} {ms:>9.3f}")
    per_frame = out["frontend"] + out["track_step"] + out["flow_evidence"] \
        + out["crf_step"]
    print(f"{'per-frame hot path':<16} {per_frame:>7.3f} ms "
          f"(~{1e3 / per_frame:.0f} fps serial)")
    print(json.dumps({"device": dev, "stages_ms": out}))


if __name__ == "__main__":
    main()
