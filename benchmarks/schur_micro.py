"""Decompose the grid-path LM iteration at production local-BA sizes
(C=32, P=4096, K=1024): which stage dominates 5 ms/iter?"""

import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp

from lc_crf_slam_tpu import enable_compilation_cache

enable_compilation_cache()

from lc_crf_slam_tpu.geometry.camera import TUM3
from lc_crf_slam_tpu.ops.schur import (
    BAProblem, _edge_residuals, _robust_weights, inv3x3, solve_ba,
)

C, P, K = 32, 4096, 1024
E = C * K
rng = np.random.default_rng(0)

pts = rng.uniform([-4, -3, 2], [4, 3, 8], (P, 3))
cams = np.tile(np.eye(4), (C, 1, 1))
cams[:, 0, 3] = 0.05 * np.arange(C)
e_cam = np.repeat(np.arange(C), K)
e_pt = rng.integers(0, P, E)
cam = TUM3
pc = np.einsum("eij,ej->ei", cams[e_cam][:, :3, :3], pts[e_pt]) + cams[e_cam][:, :3, 3]
z = np.maximum(pc[:, 2], 1e-3)
u = cam.fx * pc[:, 0] / z + cam.cx
v = cam.fy * pc[:, 1] / z + cam.cy
prob = BAProblem(
    cam_Tcw=jnp.asarray(cams, jnp.float32),
    cam_fixed=jnp.zeros(C, bool).at[0].set(True),
    p_xyz=jnp.asarray(pts + rng.normal(0, 0.01, pts.shape), jnp.float32),
    p_valid=jnp.ones(P, bool),
    e_cam=jnp.asarray(e_cam, jnp.int32),
    e_pt=jnp.asarray(e_pt, jnp.int32),
    e_uv=jnp.asarray(np.stack([u, v], -1), jnp.float32),
    e_ur=jnp.asarray(u - cam.bf / z, jnp.float32),
    e_w=jnp.ones(E, jnp.float32),
    e_valid=jnp.ones(E, bool),
)


def timed(label, f, *args, reps=10):
    out = f(*args)
    _ = np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
    _ = np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
    dt = (time.perf_counter() - t0) / reps
    print(f"{label:34s} {dt*1e3:7.2f} ms", flush=True)


timed("solve_ba grid 8 iters",
      jax.jit(lambda p: solve_ba(cam, p, 8, grid=(C, K))), prob)
timed("solve_ba grid 1 iter",
      jax.jit(lambda p: solve_ba(cam, p, 1, grid=(C, K))), prob)

# stages
pt_grid = jnp.where(prob.e_valid, prob.e_pt, P).reshape(C, K)
onehot = (pt_grid[:, None, :] == jnp.arange(P)[None, :, None]).astype(jnp.float32)


@jax.jit
def stage_resid(cam_Tcw, p_xyz):
    r, J_cam, J_pt, z_ok = _edge_residuals(cam, cam_Tcw, p_xyz, prob)
    return r.sum() + J_cam.sum() + J_pt.sum()


@jax.jit
def stage_edgeblocks(cam_Tcw, p_xyz):
    r, J_cam, J_pt, z_ok = _edge_residuals(cam, cam_Tcw, p_xyz, prob)
    active = prob.e_valid & z_ok
    _, w, _ = _robust_weights(r, prob.e_w, active, 2.8)
    wJc = w[:, None, None] * J_cam
    Hcc_e = jnp.einsum("eij,eik->ejk", wJc, J_cam)
    g_c_e = jnp.einsum("eij,ei->ej", wJc, r)
    wJp = w[:, None, None] * J_pt
    Hpp_e = jnp.einsum("eij,eik->ejk", wJp, J_pt)
    g_p_e = jnp.einsum("eij,ei->ej", wJp, r)
    W_e = jnp.einsum("eij,eik->ejk", wJc, J_pt)
    return (Hcc_e.sum() + g_c_e.sum() + Hpp_e.sum() + g_p_e.sum()
            + W_e.sum())


@jax.jit
def stage_onehot_acc(cam_Tcw, p_xyz, onehot):
    r, J_cam, J_pt, z_ok = _edge_residuals(cam, cam_Tcw, p_xyz, prob)
    active = prob.e_valid & z_ok
    _, w, _ = _robust_weights(r, prob.e_w, active, 2.8)
    wJc = w[:, None, None] * J_cam
    wJp = w[:, None, None] * J_pt
    Hpp_e = jnp.einsum("eij,eik->ejk", wJp, J_pt)
    g_p_e = jnp.einsum("eij,ei->ej", wJp, r)
    W_e = jnp.einsum("eij,eik->ejk", wJc, J_pt)
    pe = jnp.concatenate(
        [Hpp_e.reshape(C, K, 9), g_p_e.reshape(C, K, 3),
         W_e.reshape(C, K, 18)], axis=-1)
    acc = jnp.einsum("cpk,cke->cpe", onehot, pe)
    return acc.sum()


@jax.jit
def stage_schur(Wpc, Hpp_inv, Hcc, g_c, g_p):
    Tpc = jnp.einsum("pcia,pab->pcib", Wpc, Hpp_inv)
    S_red = jnp.einsum("pcia,pdja->cidj", Tpc, Wpc)
    S = -S_red
    S = S.at[jnp.arange(C), :, jnp.arange(C), :].add(Hcc)
    S = S.reshape(C * 6, C * 6) + jnp.eye(C * 6)
    rhs = (g_c - jnp.einsum("pcia,pa->ci", Tpc, g_p)).reshape(C * 6)
    delta_c = -jnp.linalg.solve(S, rhs).reshape(C, 6)
    return delta_c.sum()


Wpc = jnp.asarray(rng.normal(0, 1, (P, C, 6, 3)), jnp.float32)
Hpp_inv = jnp.asarray(
    np.tile(np.eye(3, dtype=np.float32), (P, 1, 1)))
Hcc = jnp.asarray(np.tile(np.eye(6, dtype=np.float32) * 10, (C, 1, 1)))
g_c = jnp.zeros((C, 6))
g_p = jnp.zeros((P, 3))

timed("  residuals+jacobians", stage_resid, prob.cam_Tcw, prob.p_xyz)
timed("  + edge blocks", stage_edgeblocks, prob.cam_Tcw, prob.p_xyz)
timed("  + onehot acc", stage_onehot_acc, prob.cam_Tcw, prob.p_xyz, onehot)
timed("  schur+solve (synthetic)", stage_schur, Wpc, Hpp_inv, Hcc, g_c, g_p)
