"""M5 scaling harness: distributed BA + CRF timed at 1/2/4/8 devices.

SURVEY.md §8.2-M5 / BASELINE config 5: measure the wall-clock of the two
sharded backend kernels (block-sharded global bundle adjustment,
track-sharded CRF mean-field) as the mesh grows, and report parallel
efficiency  eff(n) = t(1) / (n * t(n))  against the >=0.7 target.

Each device count runs in its OWN subprocess because
`--xla_force_host_platform_device_count` is consumed at backend
initialization — a single process cannot re-mesh. On real multi-chip
hardware the same harness runs against the actual chips (no flag
needed); on a development host the virtual CPU mesh measures collective
/ partitioning overhead, and efficiency is additionally bounded by
physical cores (recorded in the output so the numbers aren't misread).

Usage:  python benchmarks/scaling.py [--devices 1,2,4,8] [--out FILE]
Worker: python benchmarks/scaling.py --worker N   (internal)
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# problem sizes: large enough that per-device compute dominates dispatch
N_CAMS = 48
N_PTS = 8192
OBS_PER_PT = 8
CRF_TRACKS = 8192
REPS = 5


def _build_ba_problem(seed=0):
    import numpy as np
    import jax.numpy as jnp
    from lc_crf_slam_tpu.ops.schur import BAProblem
    from lc_crf_slam_tpu.geometry.camera import TUM3

    rng = np.random.default_rng(seed)
    pts = rng.uniform([-4, -3, 2], [4, 3, 8], (N_PTS, 3))
    cams = []
    for i in range(N_CAMS):
        T = np.eye(4)
        T[:3, 3] = [0.08 * i, 0.02 * np.sin(i), 0.0]
        cams.append(T)
    cams = np.asarray(cams)
    e_pt = np.repeat(np.arange(N_PTS), OBS_PER_PT)
    e_cam = rng.integers(0, N_CAMS, e_pt.shape[0])
    cam = TUM3
    pc = np.einsum(
        "eij,ej->ei", cams[e_cam][:, :3, :3], pts[e_pt]
    ) + cams[e_cam][:, :3, 3]
    z = np.maximum(pc[:, 2], 1e-3)
    u = cam.fx * pc[:, 0] / z + cam.cx + rng.normal(0, 0.5, z.shape)
    v = cam.fy * pc[:, 1] / z + cam.cy + rng.normal(0, 0.5, z.shape)
    ur = u - cam.bf / z
    noisy = cams.copy()
    noisy[1:, :3, 3] += rng.normal(0, 0.02, (N_CAMS - 1, 3))
    fixed = np.zeros(N_CAMS, bool)
    fixed[0] = True
    return BAProblem(
        cam_Tcw=jnp.asarray(noisy, jnp.float32),
        cam_fixed=jnp.asarray(fixed),
        p_xyz=jnp.asarray(pts + rng.normal(0, 0.01, pts.shape), jnp.float32),
        p_valid=jnp.ones(N_PTS, bool),
        e_cam=jnp.asarray(e_cam, jnp.int32),
        e_pt=jnp.asarray(e_pt, jnp.int32),
        e_uv=jnp.asarray(np.stack([u, v], -1), jnp.float32),
        e_ur=jnp.asarray(ur, jnp.float32),
        e_w=jnp.ones(e_pt.shape[0], jnp.float32),
        e_valid=jnp.ones(e_pt.shape[0], bool),
    )


def _worker(n_dev: int) -> dict:
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={n_dev}"
    ).strip()
    sys.path.insert(0, REPO)
    import numpy as np
    import jax
    import jax.numpy as jnp

    # Force the virtual CPU mesh via jax.config (site customizations may
    # override the JAX_PLATFORMS env var) BEFORE the first backend query
    # consumes xla_force_host_platform_device_count. On a machine with
    # >= n_dev real chips, run with SCALING_REAL_CHIPS=1 instead.
    if not os.environ.get("SCALING_REAL_CHIPS"):
        jax.config.update("jax_platforms", "cpu")
    assert len(jax.devices()) >= n_dev, jax.devices()
    from lc_crf_slam_tpu.config import SLAMConfig
    from lc_crf_slam_tpu.parallel.mesh import make_mesh
    from lc_crf_slam_tpu.parallel.dist_ba import (
        dist_solve_ba_blocks, partition_point_blocks,
    )
    from lc_crf_slam_tpu.parallel.dist_crf import (
        dist_knn_graph, dist_mean_field,
    )
    from lc_crf_slam_tpu.geometry.camera import TUM3

    mesh = make_mesh(n_dev)
    out = {"n_devices": n_dev}

    # --- block-sharded global BA ---
    prob = partition_point_blocks(_build_ba_problem(), n_dev)
    f = jax.jit(
        lambda p: dist_solve_ba_blocks(TUM3, p, mesh, n_iters=6)
    )
    r = f(prob)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(REPS):
        jax.block_until_ready(f(prob))
    out["ba_s"] = (time.perf_counter() - t0) / REPS

    # --- track-sharded CRF ---
    rng = np.random.default_rng(1)
    cfg = SLAMConfig()
    xyz = jnp.asarray(rng.uniform(-3, 3, (CRF_TRACKS, 3)), jnp.float32)
    ok = jnp.asarray(rng.uniform(size=CRF_TRACKS) < 0.9)
    u_s = jnp.asarray(rng.gamma(2.0, 1.0, CRF_TRACKS), jnp.float32)
    u_d = jnp.full((CRF_TRACKS,), 4.0, jnp.float32)

    @jax.jit
    def label(xyz, ok, u_s, u_d):
        nbr, w = dist_knn_graph(cfg, xyz, ok, mesh)
        return dist_mean_field(cfg, u_s, u_d, nbr, w, ok, mesh)

    jax.block_until_ready(label(xyz, ok, u_s, u_d))
    t0 = time.perf_counter()
    for _ in range(REPS):
        jax.block_until_ready(label(xyz, ok, u_s, u_d))
    out["crf_s"] = (time.perf_counter() - t0) / REPS

    # --- PIPELINE frames/s with the front-end/flow sharded over the
    # "frames" mesh axis (SLAMSystem(mesh=...), the north-star metric:
    # BASELINE.json config 5 asks for the pipeline's own multi-device
    # story, not just backend kernels). The tracking scan stays
    # replicated (sequential by nature); the chunk's batched front-end
    # and forward-LK batches shard across devices.
    if not os.environ.get("SCALING_SKIP_PIPELINE"):
        from jax.sharding import Mesh
        from lc_crf_slam_tpu.geometry.camera import Pinhole
        from lc_crf_slam_tpu.models.system import SLAMSystem
        from lc_crf_slam_tpu.utils.synthetic import SyntheticWorld

        QVGA = Pinhole(fx=268.0, fy=270.0, cx=160.0, cy=120.0,
                       width=320, height=240, bf=20.0)
        n_pipe = 24
        world = SyntheticWorld(cam=QVGA, n_frames=n_pipe + 1, n_static=900,
                               n_dynamic=0, seed=7, trajectory="line",
                               billboard=True, bb_speed=0.04)
        pf = [world.frame(k, render=True) for k in range(n_pipe + 1)]
        grays = np.stack([f.image for f in pf]).astype(np.float32)
        depths = np.stack([f.depth_image for f in pf]).astype(np.float32)
        dts = np.arange(n_pipe + 1, dtype=np.float64) / 30.0
        mesh_p = Mesh(np.asarray(jax.devices()[:n_dev]), ("frames",))
        slam = SLAMSystem(QVGA, SLAMConfig(), enable_crf=True,
                          enable_mapping=True,
                          mesh=mesh_p if n_dev > 1 else None)

        def run_pipe():
            slam.reset()
            t0 = time.perf_counter()
            poses = slam.track_sequence(grays, depths, dts, chunk=8)
            _ = np.asarray(poses[-1])
            return time.perf_counter() - t0

        run_pipe()                      # compile
        best = min(run_pipe() for _ in range(3))
        out["pipeline_fps"] = n_pipe / best
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", default="1,2,4,8")
    ap.add_argument("--out", default=None)
    ap.add_argument("--worker", type=int, default=None)
    args = ap.parse_args()

    if args.worker is not None:
        print("RESULT " + json.dumps(_worker(args.worker)), flush=True)
        return

    rows = []
    for n in [int(x) for x in args.devices.split(",")]:
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--worker", str(n)],
            capture_output=True, text=True, timeout=1800,
            cwd=REPO,
        )
        line = [l for l in p.stdout.splitlines() if l.startswith("RESULT ")]
        if not line:
            print(f"n={n} FAILED:\n{p.stdout[-2000:]}\n{p.stderr[-2000:]}")
            continue
        rows.append(json.loads(line[-1][7:]))
        print(f"n={rows[-1]['n_devices']}: ba={rows[-1]['ba_s']*1e3:.1f} ms "
              f"crf={rows[-1]['crf_s']*1e3:.1f} ms", flush=True)

    if rows and rows[0]["n_devices"] == 1:
        for r in rows:
            n = r["n_devices"]
            r["ba_eff"] = rows[0]["ba_s"] / (n * r["ba_s"])
            r["crf_eff"] = rows[0]["crf_s"] / (n * r["crf_s"])
            if "pipeline_fps" in r and "pipeline_fps" in rows[0]:
                # pipeline speedup is NOT divided by n: only the
                # front-end/flow stages shard (Amdahl bound); report
                # the raw speedup and let the reader judge
                r["pipeline_speedup"] = (
                    r["pipeline_fps"] / rows[0]["pipeline_fps"]
                )
    report = {
        "problem": {
            "ba": {"cams": N_CAMS, "points": N_PTS,
                   "edges": N_PTS * OBS_PER_PT},
            "crf": {"tracks": CRF_TRACKS},
        },
        "host_cpus": os.cpu_count(),
        "platform": os.environ.get("JAX_PLATFORMS", "default"),
        "rows": rows,
    }
    print(json.dumps(report, indent=2))
    if args.out:
        with open(args.out, "w") as fh:
            json.dump(report, fh, indent=2)


if __name__ == "__main__":
    main()
