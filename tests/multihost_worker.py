"""Worker for the 2-process jax.distributed proof (see test_multihost.py).

Usage: python multihost_worker.py <process_id> <coordinator_port>
Each process contributes 2 virtual CPU devices -> a 4-device global mesh
spanning both processes; the map-block-sharded BA must equal the
single-process dense solve. Prints "MULTIHOST_OK <cost>" on success.
"""

import os
import sys

pid = int(sys.argv[1])
port = sys.argv[2]

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=2"
).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P  # noqa: E402

from lc_crf_slam_tpu.parallel.mesh import init_distributed  # noqa: E402
from lc_crf_slam_tpu.parallel.dist_ba import (  # noqa: E402
    dist_solve_ba_blocks, partition_point_blocks,
)
from lc_crf_slam_tpu.ops.schur import BAProblem, solve_ba  # noqa: E402
from lc_crf_slam_tpu.geometry.camera import TUM3  # noqa: E402
from lc_crf_slam_tpu.geometry.se3 import exp_se3  # noqa: E402


def make_problem(seed=0, C=6, Pn=192, obs_per_cam=96):
    rng = np.random.default_rng(seed)
    pts = np.stack([
        rng.uniform(-2, 2, Pn), rng.uniform(-1.5, 1.5, Pn),
        rng.uniform(3, 7, Pn),
    ], -1).astype(np.float32)
    cams = []
    for c in range(C):
        xi = np.zeros(6, np.float32)
        xi[0] = 0.1 * c
        xi[4] = 0.02 * c
        cams.append(np.asarray(exp_se3(jnp.asarray(xi))))
    cams = np.stack(cams)
    e_cam, e_pt, e_uv = [], [], []
    for c in range(C):
        ids = rng.choice(Pn, obs_per_cam, replace=False)
        pc = pts[ids] @ cams[c][:3, :3].T + cams[c][:3, 3]
        u = TUM3.fx * pc[:, 0] / pc[:, 2] + TUM3.cx
        v = TUM3.fy * pc[:, 1] / pc[:, 2] + TUM3.cy
        e_cam.append(np.full(obs_per_cam, c, np.int32))
        e_pt.append(ids.astype(np.int32))
        e_uv.append(np.stack([u, v], -1))
    e_cam = np.concatenate(e_cam)
    e_pt = np.concatenate(e_pt)
    e_uv = (np.concatenate(e_uv)
            + rng.normal(0, 0.3, (C * obs_per_cam, 2))).astype(np.float32)
    # perturb geometry so the solver has real work
    cams_n = cams.copy()
    for c in range(1, C):
        dxi = rng.normal(0, 0.01, 6).astype(np.float32)
        cams_n[c] = np.asarray(exp_se3(jnp.asarray(dxi))) @ cams_n[c]
    pts_n = pts + rng.normal(0, 0.02, pts.shape).astype(np.float32)
    E = C * obs_per_cam
    return BAProblem(
        cam_Tcw=jnp.asarray(cams_n),
        cam_fixed=jnp.asarray(np.arange(C) == 0),
        p_xyz=jnp.asarray(pts_n),
        p_valid=jnp.ones((Pn,), bool),
        e_cam=jnp.asarray(e_cam), e_pt=jnp.asarray(e_pt),
        e_uv=jnp.asarray(e_uv),
        e_ur=jnp.full((E,), -1.0, jnp.float32),
        e_w=jnp.ones((E,), jnp.float32),
        e_valid=jnp.ones((E,), bool),
    )


def main():
    init_distributed(f"localhost:{port}", num_processes=2, process_id=pid)
    assert jax.process_count() == 2, jax.process_count()
    devs = jax.devices()
    assert len(devs) == 4, devs
    mesh = Mesh(np.asarray(devs), ("edge",))

    prob = make_problem()
    # single-process dense reference on local devices only
    cam_ref, p_ref, stats_ref = jax.jit(
        lambda pr: solve_ba(TUM3, pr, n_iters=8)
    )(prob)
    cost_ref = float(stats_ref.cost)

    probp = partition_point_blocks(prob, mesh.size)
    edge_sh = NamedSharding(mesh, P("edge"))
    repl_sh = NamedSharding(mesh, P())

    def to_global(leaf, spec_edge):
        arr = np.asarray(leaf)
        if not spec_edge:
            return jax.make_array_from_process_local_data(repl_sh, arr)
        # each process feeds its half of the leading axis
        n = arr.shape[0]
        half = n // 2
        local = arr[pid * half:(pid + 1) * half]
        return jax.make_array_from_process_local_data(edge_sh, local)

    edge_leaves = {"p_xyz", "p_valid", "e_cam", "e_pt", "e_uv", "e_ur",
                   "e_w", "e_valid"}
    probg = BAProblem(**{
        k: to_global(v, k in edge_leaves)
        for k, v in probp._asdict().items()
    })
    cam_d, p_d, stats_d = dist_solve_ba_blocks(TUM3, probg, mesh, n_iters=8)
    cost_d = float(stats_d.cost)
    cam_d = np.asarray(jax.device_get(cam_d))
    err = np.abs(cam_d - np.asarray(cam_ref)).max()
    assert err < 1e-3, (err, cost_ref, cost_d)
    assert abs(cost_d - cost_ref) / max(cost_ref, 1e-9) < 0.05, (
        cost_ref, cost_d)
    print(f"MULTIHOST_OK pid={pid} cost={cost_d:.4f} "
          f"ref={cost_ref:.4f} cam_err={err:.2e}", flush=True)


if __name__ == "__main__":
    main()
