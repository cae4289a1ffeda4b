"""Sparse Schur-complement Levenberg-Marquardt bundle adjustment.

The TPU-native replacement for the reference's vendored g2o
(SURVEY.md §3.2: SparseOptimizer + BlockSolver + Schur complement over
landmark blocks). Design per SURVEY.md §8.3#1: fixed-capacity edge
tables + segment ops instead of pointer graphs —
  - per-edge residuals/Jacobians batched over all observations,
  - Hessian blocks assembled scatter-free: a (P, C) edge-index table
    (one scatter per solve) turns every LM iteration into gathers +
    dense einsum reductions (TPU scatter-add in the iteration body
    measured ~15 ms/iter; this path is ~1 ms),
  - the camera-point coupling W held as a dense (P, C) block tensor
    (local windows are small: C<=32, P<=4096 -> ~10 MB, MXU-friendly),
  - Schur reduction S = Hcc - W Hpp^-1 W^T as one einsum,
  - dense Cholesky/LU solve of the reduced (6C, 6C) camera system,
  - point back-substitution, all inside an LM accept/reject loop.
Fixed cameras (gauge) enter with zeroed camera Jacobians.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..geometry.camera import Pinhole
from ..geometry.se3 import exp_se3, hat_so3


class BAProblem(NamedTuple):
    """Fixed-capacity bundle-adjustment problem.

    C cameras, P points, E observations (edges). Invalid slots are masked.
    """

    cam_Tcw: jax.Array    # (C, 4, 4)
    cam_fixed: jax.Array  # (C,) bool — gauge/anchor cameras
    p_xyz: jax.Array      # (P, 3)
    p_valid: jax.Array    # (P,) bool
    e_cam: jax.Array      # (E,) int32 camera slot
    e_pt: jax.Array       # (E,) int32 point slot
    e_uv: jax.Array       # (E, 2) observed pixels
    e_ur: jax.Array       # (E,) observed virtual-right u (-1 = mono)
    e_w: jax.Array        # (E,) information weight (inv sigma^2 by level)
    e_valid: jax.Array    # (E,) bool


class BAStats(NamedTuple):
    cost: jax.Array        # robust total cost after optimization
    n_edges: jax.Array     # active edges
    edge_chi2: jax.Array   # (E,) final per-edge chi2 (for outlier pruning)


def inv3x3(M: jax.Array) -> jax.Array:
    """Batched closed-form (adjugate) 3x3 inverse.

    `jnp.linalg.inv` on (N, 3, 3) lowers to batched LU on TPU
    (~7 ms for N=4096 measured on v5e); the adjugate is pure
    elementwise VPU work (~0.1 ms). Inputs here are damped SPD point
    Hessians, so det is safely bounded away from 0."""
    a, b, c = M[..., 0, 0], M[..., 0, 1], M[..., 0, 2]
    d, e, f = M[..., 1, 0], M[..., 1, 1], M[..., 1, 2]
    g, h, i = M[..., 2, 0], M[..., 2, 1], M[..., 2, 2]
    A = e * i - f * h
    B = c * h - b * i
    Cc = b * f - c * e
    D = f * g - d * i
    E = a * i - c * g
    F = c * d - a * f
    G = d * h - e * g
    H = b * g - a * h
    I = a * e - b * d
    det = a * A + b * D + c * G
    adj = jnp.stack(
        [jnp.stack([A, B, Cc], -1),
         jnp.stack([D, E, F], -1),
         jnp.stack([G, H, I], -1)], -2,
    )
    return adj / det[..., None, None]


def _edge_residuals(cam: Pinhole, cam_Tcw, p_xyz, prob: BAProblem):
    """Residual (E, 3), camera Jacobian (E, 3, 6), point Jacobian (E, 3, 3),
    and positive-depth mask (E,)."""
    T = cam_Tcw[prob.e_cam]             # (E, 4, 4)
    pw = p_xyz[prob.e_pt]               # (E, 3)
    R = T[:, :3, :3]
    pc = jnp.einsum("eij,ej->ei", R, pw) + T[:, :3, 3]
    x, y, z = pc[:, 0], pc[:, 1], pc[:, 2]
    z_ok = z > 1e-3
    zs = jnp.where(z_ok, z, 1.0)
    inv_z = 1.0 / zs
    inv_z2 = inv_z * inv_z
    u = cam.fx * x * inv_z + cam.cx
    v = cam.fy * y * inv_z + cam.cy
    ur = u - cam.bf * inv_z
    is_stereo = prob.e_ur >= 0
    r = jnp.stack(
        [
            u - prob.e_uv[:, 0],
            v - prob.e_uv[:, 1],
            jnp.where(is_stereo, ur - prob.e_ur, 0.0),
        ],
        axis=-1,
    )
    zero = jnp.zeros_like(z)
    du = jnp.stack([cam.fx * inv_z, zero, -cam.fx * x * inv_z2], -1)
    dv = jnp.stack([zero, cam.fy * inv_z, -cam.fy * y * inv_z2], -1)
    dr = du + jnp.stack([zero, zero, cam.bf * inv_z2], -1)
    dr = jnp.where(is_stereo[:, None], dr, 0.0)
    d_pc = jnp.stack([du, dv, dr], axis=-2)  # (E, 3, 3)
    I3 = jnp.broadcast_to(jnp.eye(3, dtype=pc.dtype), (pc.shape[0], 3, 3))
    J_cam = d_pc @ jnp.concatenate([I3, -hat_so3(pc)], axis=-1)  # (E, 3, 6)
    J_pt = d_pc @ R                                              # (E, 3, 3)
    return r, J_cam, J_pt, z_ok


def _robust_weights(r, e_w, active, huber_delta):
    chi2 = jnp.sum(r * r, axis=-1) * e_w
    s = jnp.sqrt(jnp.maximum(chi2, 1e-12))
    w_huber = jnp.where(s <= huber_delta, 1.0, huber_delta / s)
    w = jnp.where(active, e_w * w_huber, 0.0)
    rho = jnp.where(
        s <= huber_delta, chi2, 2.0 * huber_delta * s - huber_delta * huber_delta
    )
    cost = jnp.sum(jnp.where(active, rho, 0.0))
    return chi2, w, cost


def _grid_edge_comps(cam: Pinhole, cam_Tcw, p_xyz, prob: BAProblem,
                     grid: Tuple[int, int]):
    """Per-edge residual/Jacobian COMPONENTS for camera-major grids,
    every term a (C, K) array.

    The batched-block einsum formulation materializes (E, 3, 6)-shaped
    operands whose trailing dims tile to (8, 128) — a ~50x padding
    blowup per materialization that made assembly ~1 ms/term-group on
    v5e. Component arrays keep everything in perfectly-tiled (C, K)
    planes, and XLA fuses the whole chain without materializing a
    single padded block tensor. Returns (r (3 comps), J_cam (3x6),
    J_pt (3x3), active) as nested lists of (C, K) arrays."""
    C, K = grid
    R = cam_Tcw[:, :3, :3]                           # (C, 3, 3)
    t = cam_Tcw[:, :3, 3]                            # (C, 3)
    pw = p_xyz[prob.e_pt].reshape(C, K, 3)
    pc = [
        sum(R[:, i, j, None] * pw[:, :, j] for j in range(3)) + t[:, i, None]
        for i in range(3)
    ]
    x, y, z = pc
    z_ok = z > 1e-3
    zs = jnp.where(z_ok, z, 1.0)
    inv_z = 1.0 / zs
    inv_z2 = inv_z * inv_z
    u = cam.fx * x * inv_z + cam.cx
    v = cam.fy * y * inv_z + cam.cy
    e_uv = prob.e_uv.reshape(C, K, 2)
    e_ur = prob.e_ur.reshape(C, K)
    is_stereo = e_ur >= 0
    zero = jnp.zeros_like(z)
    r = [
        u - e_uv[:, :, 0],
        v - e_uv[:, :, 1],
        jnp.where(is_stereo, (u - cam.bf * inv_z) - e_ur, 0.0),
    ]
    # d(pc) rows: du, dv, dr (each 3 comps)
    du = [cam.fx * inv_z, zero, -cam.fx * x * inv_z2]
    dv = [zero, cam.fy * inv_z, -cam.fy * y * inv_z2]
    dr = [jnp.where(is_stereo, du[0], 0.0),
          zero,
          jnp.where(is_stereo, du[2] + cam.bf * inv_z2, 0.0)]
    d_pc = [du, dv, dr]
    # J_cam = d_pc @ [I3 | -hat(pc)]  (translation-first SE3 tangent):
    # -hat(pc) columns are (0, -z, y), (z, 0, -x), (-y, x, 0)
    J_cam = [
        [d[0], d[1], d[2],
         d[2] * y - d[1] * z,
         d[0] * z - d[2] * x,
         d[1] * x - d[0] * y]
        for d in d_pc
    ]
    # J_pt = d_pc @ R
    J_pt = [
        [sum(d[m] * R[:, m, j, None] for m in range(3)) for j in range(3)]
        for d in d_pc
    ]
    active = prob.e_valid.reshape(C, K) & z_ok \
        & prob.p_valid[prob.e_pt].reshape(C, K)
    return r, J_cam, J_pt, active


def _grid_cost(cam: Pinhole, cam_Tcw, p_xyz, prob: BAProblem, huber_delta,
               grid: Tuple[int, int]):
    """(chi2 (E,), robust cost) via the component formulation."""
    r, _, _, active = _grid_edge_comps(cam, cam_Tcw, p_xyz, prob, grid)
    C, K = grid
    e_w = prob.e_w.reshape(C, K)
    hd = huber_delta if jnp.ndim(huber_delta) == 0 \
        else huber_delta.reshape(C, K)
    chi2 = (r[0] * r[0] + r[1] * r[1] + r[2] * r[2]) * e_w
    s = jnp.sqrt(jnp.maximum(chi2, 1e-12))
    rho = jnp.where(s <= hd, chi2, 2.0 * hd * s - hd * hd)
    cost = jnp.sum(jnp.where(active, rho, 0.0))
    return chi2.reshape(-1), cost


def _lm_step_grid(cam: Pinhole, cam_Tcw, p_xyz, prob: BAProblem, lam,
                  huber_delta, grid: Tuple[int, int], onehot: jax.Array):
    """One assemble + Schur solve + back-substitution on the grid fast
    path, all in component arrays (see _grid_edge_comps). Numerics match
    the generic einsum path up to f32 accumulation order
    (tests/test_schur_ba.py::TestGridFastPath)."""
    C, K = grid
    P = p_xyz.shape[0]
    r, Jc, Jp, active = _grid_edge_comps(cam, cam_Tcw, p_xyz, prob, grid)
    e_w = prob.e_w.reshape(C, K)
    hd = huber_delta if jnp.ndim(huber_delta) == 0 \
        else huber_delta.reshape(C, K)
    chi2 = (r[0] * r[0] + r[1] * r[1] + r[2] * r[2]) * e_w
    s = jnp.sqrt(jnp.maximum(chi2, 1e-12))
    w = jnp.where(active, e_w * jnp.where(s <= hd, 1.0, hd / s), 0.0)
    # gauge: fixed cameras contribute no camera Jacobian
    not_fixed = 1.0 - prob.cam_fixed.astype(w.dtype)[:, None]
    Jc = [[Jc[i][j] * not_fixed for j in range(6)] for i in range(3)]

    # camera blocks + gradient: reduce over K per camera
    Hcc = jnp.stack(
        [sum(w * Jc[i][a] * Jc[i][b] for i in range(3)).sum(axis=1)
         for a in range(6) for b in range(6)], axis=-1
    ).reshape(C, 6, 6)
    g_c = jnp.stack(
        [sum(w * Jc[i][a] * r[i] for i in range(3)).sum(axis=1)
         for a in range(6)], axis=-1
    )                                                   # (C, 6)

    # point blocks / point gradient / coupling, scattered to point slots
    # by ONE one-hot matmul (C, P, K) x (C, K, 30)
    pe = jnp.stack(
        [sum(w * Jp[i][a] * Jp[i][b] for i in range(3))
         for a in range(3) for b in range(3)]
        + [sum(w * Jp[i][a] * r[i] for i in range(3)) for a in range(3)]
        + [sum(w * Jc[i][a] * Jp[i][b] for i in range(3))
           for a in range(6) for b in range(3)], axis=-1
    )                                                   # (C, K, 30)
    acc = jnp.einsum("cpk,cke->cpe", onehot, pe)        # (C, P, 30)
    hp = jnp.sum(acc[..., :12], axis=0)                 # (P, 12)
    # damped 3x3 point-block inverse, component-wise adjugate
    lam_ = lam
    H = [hp[:, 3 * a + b] for a in range(3) for b in range(3)]
    Hd = [H[i] + (lam_ * H[i] + 1e-6 if i in (0, 4, 8) else 0.0)
          for i in range(9)]
    A_ = Hd[4] * Hd[8] - Hd[5] * Hd[7]
    B_ = Hd[2] * Hd[7] - Hd[1] * Hd[8]
    C_ = Hd[1] * Hd[5] - Hd[2] * Hd[4]
    D_ = Hd[5] * Hd[6] - Hd[3] * Hd[8]
    E_ = Hd[0] * Hd[8] - Hd[2] * Hd[6]
    F_ = Hd[2] * Hd[3] - Hd[0] * Hd[5]
    G_ = Hd[3] * Hd[7] - Hd[4] * Hd[6]
    Hh = Hd[1] * Hd[6] - Hd[0] * Hd[7]
    I_ = Hd[0] * Hd[4] - Hd[1] * Hd[3]
    det = Hd[0] * A_ + Hd[1] * D_ + Hd[2] * G_
    Hinv = [A_ / det, B_ / det, C_ / det,
            D_ / det, E_ / det, F_ / det,
            G_ / det, Hh / det, I_ / det]               # row-major (a,b)
    g_p = [hp[:, 9 + a] for a in range(3)]              # 3 x (P,)
    # coupling W[c,p,(i,a)] as 18 (C, P) planes
    W = [acc[:, :, 12 + ia] for ia in range(18)]
    # T[c,p,(i,b)] = sum_a W[(i,a)] Hinv[(a,b)]
    T = [sum(W[i * 3 + a] * Hinv[a * 3 + b][None, :] for a in range(3))
         for i in range(6) for b in range(3)]           # 18 x (C, P)

    # S_red[(c,i),(d,j)] = sum_a sum_p T[(i,a)][c,p] W[(j,a)][d,p]
    S_red = jnp.zeros((C * 6, C * 6), cam_Tcw.dtype)
    for a in range(3):
        M = jnp.stack([T[i * 3 + a] for i in range(6)], axis=1
                      ).reshape(C * 6, P)
        N = jnp.stack([W[j * 3 + a] for j in range(6)], axis=1
                      ).reshape(C * 6, P)
        S_red = S_red + M @ N.T
    diag_c = jax.vmap(jnp.diag)(jax.vmap(jnp.diag)(Hcc))
    Hcc_d = (Hcc + lam * diag_c).reshape(C * 6 // 6, 6, 6)
    S = -S_red
    blk = jnp.arange(C)
    S = S.reshape(C, 6, C, 6).at[blk, :, blk, :].add(Hcc_d).reshape(
        C * 6, C * 6)
    fixed_diag = jnp.repeat(
        prob.cam_fixed.astype(S.dtype), 6
    ) + (jnp.abs(jnp.diagonal(S)) < 1e-8).astype(S.dtype)
    S = S + jnp.diag(fixed_diag + 1e-6)

    # rhs[c,i] = g_c[c,i] - sum_a sum_p T[(i,a)][c,p] g_p[a][p]
    rhs = g_c - jnp.stack(
        [sum((T[i * 3 + a] * g_p[a][None, :]).sum(axis=1)
             for a in range(3)) for i in range(6)], axis=-1)
    delta_c = -jnp.linalg.solve(S, rhs.reshape(C * 6)).reshape(C, 6)
    delta_c = delta_c * (1.0 - prob.cam_fixed.astype(delta_c.dtype))[:, None]

    # back-substitute: dp[a] = -sum_b Hinv[(a,b)] (g_p[b] + Wt_dc[b])
    Wt_dc = [
        sum((W[i * 3 + a] * delta_c[:, i, None]).sum(axis=0)
            for i in range(6)) for a in range(3)
    ]                                                   # 3 x (P,)
    rhs_p = [g_p[b] + Wt_dc[b] for b in range(3)]
    delta_p = jnp.stack(
        [-sum(Hinv[a * 3 + b] * rhs_p[b] for b in range(3))
         for a in range(3)], axis=-1)                   # (P, 3)
    has_obs = H[0] + H[4] + H[8] > 0
    delta_p = jnp.where((prob.p_valid & has_obs)[:, None], delta_p, 0.0)

    cam_new = exp_se3(delta_c) @ cam_Tcw
    p_new = p_xyz + delta_p
    return cam_new, p_new


def _edge_table(prob: BAProblem, C: int, P: int) -> jax.Array:
    """(P, C) int32 edge-index table: entry [p, c] is the edge observing
    point p from camera c, or E (out of bounds) if none.

    In any BA problem a (point, camera) pair has at most one edge, so
    the bipartite edge list inverts into this dense table with ONE
    scatter — built once per solve and reused by every LM iteration,
    which then needs only gathers + dense einsums (TPU scatter-adds in
    the iteration body were ~15 ms/iter; gathers + MXU reductions are
    ~1 ms)."""
    E = prob.e_cam.shape[0]
    idx_p = jnp.where(prob.e_valid, prob.e_pt, P)
    tbl = jnp.full(((P + 1) * C,), E, jnp.int32).at[
        idx_p * C + prob.e_cam
    ].set(jnp.arange(E, dtype=jnp.int32), mode="drop")
    return tbl[: P * C].reshape(P, C)


def _lm_step(cam: Pinhole, cam_Tcw, p_xyz, prob: BAProblem, lam,
             huber_delta, tbl):
    """One assemble + Schur solve + back-substitution (GENERIC edge
    lists); returns candidate (cam_Tcw', p_xyz'). `tbl` is the (P, C)
    edge table from _edge_table. Camera-major grid problems take
    _lm_step_grid instead — the component-array fast path."""
    C = cam_Tcw.shape[0]
    P = p_xyz.shape[0]
    r, J_cam, J_pt, z_ok = _edge_residuals(cam, cam_Tcw, p_xyz, prob)
    active = prob.e_valid & z_ok & prob.p_valid[prob.e_pt]
    _, w, _ = _robust_weights(r, prob.e_w, active, huber_delta)
    # gauge: fixed cameras contribute no camera Jacobian
    J_cam = J_cam * (1.0 - prob.cam_fixed[prob.e_cam].astype(J_cam.dtype))[:, None, None]

    if True:
        take = lambda a: jnp.take(a, tbl, axis=0, mode="fill", fill_value=0)
        w_g = take(w)                      # (P, C)
        Jc_g = take(J_cam)                 # (P, C, 3, 6)
        Jp_g = take(J_pt)                  # (P, C, 3, 3)
        r_g = take(r)                      # (P, C, 3)
        wJc_g = w_g[..., None, None] * Jc_g
        Hcc = jnp.einsum("pcij,pcik->cjk", wJc_g, Jc_g)
        g_c = jnp.einsum("pcij,pci->cj", wJc_g, r_g)
        wJp_g = w_g[..., None, None] * Jp_g
        Hpp = jnp.einsum("pcij,pcik->pjk", wJp_g, Jp_g)
        g_p = jnp.einsum("pcij,pci->pj", wJp_g, r_g)
        # coupling W as dense (P, C) blocks
        Wpc = jnp.einsum("pcij,pcik->pcjk", wJc_g, Jp_g)  # (P, C, 6, 3)

    # damped point-block inverse
    diag_p = jax.vmap(jnp.diag)(jax.vmap(jnp.diag)(Hpp))
    Hpp_d = Hpp + lam * diag_p + 1e-6 * jnp.eye(3)
    Hpp_inv = inv3x3(Hpp_d)

    # Schur complement on the MXU: S = Hcc_d - W Hpp^-1 W^T
    Tpc = jnp.einsum("pcia,pab->pcib", Wpc, Hpp_inv)  # (P, C, 6, 3)
    S_red = jnp.einsum("pcia,pdja->cidj", Tpc, Wpc)   # (C, 6, C, 6)
    diag_c = jax.vmap(jnp.diag)(jax.vmap(jnp.diag)(Hcc))
    Hcc_d = Hcc + lam * diag_c
    S = -S_red
    S = S.at[jnp.arange(C), :, jnp.arange(C), :].add(Hcc_d)
    S = S.reshape(C * 6, C * 6)
    # keep fixed/empty camera blocks invertible
    fixed_diag = jnp.repeat(
        prob.cam_fixed.astype(S.dtype), 6
    ) + (jnp.abs(jnp.diagonal(S)) < 1e-8).astype(S.dtype)
    S = S + jnp.diag(fixed_diag + 1e-6)

    rhs = (g_c - jnp.einsum("pcia,pa->ci", Tpc, g_p)).reshape(C * 6)
    delta_c = -jnp.linalg.solve(S, rhs).reshape(C, 6)
    delta_c = delta_c * (1.0 - prob.cam_fixed.astype(delta_c.dtype))[:, None]

    # back-substitute points: dp = -Hpp^-1 (g_p + sum_c W^T dc)
    Wt_dc = jnp.einsum("pcia,ci->pa", Wpc, delta_c)
    delta_p = -jnp.einsum("pab,pb->pa", Hpp_inv, g_p + Wt_dc)
    has_obs = jnp.einsum("pii->p", Hpp) > 0
    delta_p = jnp.where((prob.p_valid & has_obs)[:, None], delta_p, 0.0)

    cam_new = exp_se3(delta_c) @ cam_Tcw
    p_new = p_xyz + delta_p
    return cam_new, p_new


def solve_ba(
    cam: Pinhole,
    prob: BAProblem,
    n_iters: int = 10,
    huber_delta: float = 2.7955,
    init_lambda: float = 1e-4,
    huber_delta_mono: float | None = 2.4477,
    grid: Tuple[int, int] | None = None,
) -> Tuple[jax.Array, jax.Array, BAStats]:
    """LM loop with accept/reject. Returns (cam_Tcw', p_xyz', stats).

    `grid=(C, K)` (static) selects the streaming one-hot assembly fast
    path for camera-major edge layouts — see _lm_step.

    Huber delta is per-edge: `huber_delta` (sqrt(7.815)) on stereo edges,
    `huber_delta_mono` (sqrt(5.991)) on mono edges, mirroring the
    reference's local BA kernels; pass huber_delta_mono=None to apply one
    scalar to all edges."""
    if huber_delta_mono is not None:
        huber_delta = jnp.where(
            prob.e_ur >= 0, huber_delta, huber_delta_mono
        )

    def total_cost(cam_Tcw, p_xyz):
        if grid is not None:
            return _grid_cost(cam, cam_Tcw, p_xyz, prob, huber_delta, grid)
        r, _, _, z_ok = _edge_residuals(cam, cam_Tcw, p_xyz, prob)
        active = prob.e_valid & z_ok & prob.p_valid[prob.e_pt]
        chi2, _, cost = _robust_weights(r, prob.e_w, active, huber_delta)
        return chi2, cost

    C = prob.cam_Tcw.shape[0]
    P = prob.p_xyz.shape[0]
    tbl = None if grid is not None else _edge_table(prob, C, P)
    onehot = None
    if grid is not None:
        Cg, K = grid
        assert Cg == C and Cg * K == prob.e_cam.shape[0]
        pt_grid = jnp.where(prob.e_valid, prob.e_pt, P).reshape(Cg, K)
        onehot = (
            pt_grid[:, None, :] == jnp.arange(P)[None, :, None]
        ).astype(jnp.float32)                              # (C, P, K)

    def body(_, carry):
        cam_Tcw, p_xyz, lam, f_old = carry
        if grid is not None:
            cam_new, p_new = _lm_step_grid(
                cam, cam_Tcw, p_xyz, prob, lam, huber_delta, grid, onehot)
        else:
            cam_new, p_new = _lm_step(
                cam, cam_Tcw, p_xyz, prob, lam, huber_delta, tbl)
        _, f_new = total_cost(cam_new, p_new)
        # finite guard: see solve_ba_cg's body
        accept = (f_new < f_old) \
            & jnp.all(jnp.isfinite(cam_new)) & jnp.all(jnp.isfinite(p_new))
        cam_Tcw = jnp.where(accept, cam_new, cam_Tcw)
        p_xyz = jnp.where(accept, p_new, p_xyz)
        lam = jnp.clip(
            jnp.where(accept, lam * 0.5, lam * 5.0), 1e-9, 1e6
        )
        # carry by acceptance, NOT minimum: min(NaN, f_old) is NaN and
        # would wedge every later comparison
        return cam_Tcw, p_xyz, lam, jnp.where(accept, f_new, f_old)

    _, f0 = total_cost(prob.cam_Tcw, prob.p_xyz)
    cam_Tcw, p_xyz, _, _ = jax.lax.fori_loop(
        0, n_iters, body,
        (prob.cam_Tcw, prob.p_xyz,
         jnp.asarray(init_lambda, jnp.float32), f0),
    )
    chi2, cost = total_cost(cam_Tcw, p_xyz)
    stats = BAStats(
        cost=cost,
        n_edges=jnp.sum(prob.e_valid.astype(jnp.int32)),
        edge_chi2=chi2,
    )
    return cam_Tcw, p_xyz, stats


def solve_ba_cg(
    cam: Pinhole,
    prob: BAProblem,
    n_iters: int = 10,
    cg_iters: int = 48,
    huber_delta: float = 2.7955,
    init_lambda: float = 1e-4,
    huber_delta_mono: float | None = 2.4477,
) -> Tuple[jax.Array, jax.Array, BAStats]:
    """JOINT Schur-complement LM at full-map scale, matrix-free.

    Replaces the reference's g2o GlobalBundleAdjustemnt (SURVEY.md §3.1)
    for problems where `solve_ba`'s dense (P, C, 6, 3) coupling tensor
    would not fit: the reduced camera system S = Hcc - W Hpp^-1 W^T is
    never materialized. Each CG matvec streams over the edge table —
    gather camera block, project through the edge's 6x3 coupling block
    into its point, apply the damped 3x3 point-inverse, scatter back —
    O(E) memory and MXU-batched 6x3 GEMMs. The block-Jacobi
    preconditioner (exact diagonal 6x6 blocks of S) is also assembled
    edge-wise. Same LM accept/reject and per-edge Huber as solve_ba.
    """
    if huber_delta_mono is not None:
        huber_delta = jnp.where(prob.e_ur >= 0, huber_delta, huber_delta_mono)
    C = prob.cam_Tcw.shape[0]
    P = prob.p_xyz.shape[0]
    e_cam, e_pt = prob.e_cam, prob.e_pt

    def total_cost(cam_Tcw, p_xyz):
        r, _, _, z_ok = _edge_residuals(cam, cam_Tcw, p_xyz, prob)
        active = prob.e_valid & z_ok & prob.p_valid[prob.e_pt]
        _, _, cost = _robust_weights(r, prob.e_w, active, huber_delta)
        return cost

    def lm_step(cam_Tcw, p_xyz, lam):
        r, J_cam, J_pt, z_ok = _edge_residuals(cam, cam_Tcw, p_xyz, prob)
        active = prob.e_valid & z_ok & prob.p_valid[prob.e_pt]
        _, w, _ = _robust_weights(r, prob.e_w, active, huber_delta)
        J_cam = J_cam * (
            1.0 - prob.cam_fixed[prob.e_cam].astype(J_cam.dtype)
        )[:, None, None]
        wJc = w[:, None, None] * J_cam
        # block-diagonal Hessians + gradients (scatter-add)
        Hcc = jnp.zeros((C, 6, 6)).at[e_cam].add(
            jnp.einsum("eij,eik->ejk", wJc, J_cam))
        g_c = jnp.zeros((C, 6)).at[e_cam].add(
            jnp.einsum("eij,ei->ej", wJc, r))
        Hpp = jnp.zeros((P, 3, 3)).at[e_pt].add(
            jnp.einsum("eij,eik->ejk", w[:, None, None] * J_pt, J_pt))
        g_p = jnp.zeros((P, 3)).at[e_pt].add(
            jnp.einsum("eij,ei->ej", w[:, None, None] * J_pt, r))
        # per-edge coupling block B_e = J_cam^T W J_pt  (6, 3)
        B = jnp.einsum("eij,eik->ejk", wJc, J_pt)          # (E, 6, 3)
        diag_p = jax.vmap(jnp.diag)(jax.vmap(jnp.diag)(Hpp))
        Hpp_inv = inv3x3(Hpp + lam * diag_p + 1e-6 * jnp.eye(3))
        diag_c = jax.vmap(jnp.diag)(jax.vmap(jnp.diag)(Hcc))
        Hcc_d = Hcc + lam * diag_c

        def WHW(x):
            """(W Hpp^-1 W^T x) streamed over edges; x: (C, 6)."""
            z = jnp.zeros((P, 3)).at[e_pt].add(
                jnp.einsum("eji,ej->ei", B, x[e_cam]))
            v = jnp.einsum("pab,pb->pa", Hpp_inv, z)
            return jnp.zeros((C, 6)).at[e_cam].add(
                jnp.einsum("eab,eb->ea", B, v[e_pt]))

        def matvec(x):
            y = jnp.einsum("cab,cb->ca", Hcc_d, x) - WHW(x)
            # keep fixed / observation-free cameras well-posed
            pin = prob.cam_fixed | (jnp.einsum("cii->c", Hcc) < 1e-8)
            return jnp.where(pin[:, None], x, y + 1e-6 * x)

        # exact block-diagonal of S for the preconditioner, edge-wise:
        # D_c = Hcc_d(c) - sum_e B_e Hpp_inv(p(e)) B_e^T
        S_diag = Hcc_d - jnp.zeros((C, 6, 6)).at[e_cam].add(
            jnp.einsum("eab,ebc,edc->ead", B, Hpp_inv[e_pt], B))
        pin = prob.cam_fixed | (jnp.einsum("cii->c", Hcc) < 1e-8)
        S_diag = jnp.where(
            pin[:, None, None],
            jnp.broadcast_to(jnp.eye(6), (C, 6, 6)), S_diag + 1e-6 * jnp.eye(6),
        )
        Pinv = jnp.linalg.inv(S_diag)

        rhs = g_c - jnp.zeros((C, 6)).at[e_cam].add(
            jnp.einsum("eab,eb->ea", B,
                       jnp.einsum("pab,pb->pa", Hpp_inv, g_p)[e_pt]))
        rhs = jnp.where(pin[:, None], 0.0, rhs)

        b = -rhs
        x0 = jnp.zeros((C, 6))
        r_cg = b
        z = jnp.einsum("cij,cj->ci", Pinv, r_cg)
        p = z

        def cg_body(_, s):
            x, r_cg, z, p = s
            Ap = matvec(p)
            rz = jnp.sum(r_cg * z)
            alpha = rz / jnp.maximum(jnp.sum(p * Ap), 1e-20)
            x = x + alpha * p
            r_new = r_cg - alpha * Ap
            z_new = jnp.einsum("cij,cj->ci", Pinv, r_new)
            beta = jnp.sum(r_new * z_new) / jnp.maximum(rz, 1e-20)
            return x, r_new, z_new, z_new + beta * p

        delta_c, *_ = jax.lax.fori_loop(
            0, cg_iters, cg_body, (x0, r_cg, z, p))
        delta_c = delta_c * (1.0 - prob.cam_fixed.astype(delta_c.dtype))[:, None]
        # back-substitute points edge-wise:
        # dp = -Hpp^-1 (g_p + sum_e B_e^T dc(e))
        Wt_dc = jnp.zeros((P, 3)).at[e_pt].add(
            jnp.einsum("eji,ej->ei", B, delta_c[e_cam]))
        delta_p = -jnp.einsum("pab,pb->pa", Hpp_inv, g_p + Wt_dc)
        has_obs = jnp.einsum("pii->p", Hpp) > 0
        delta_p = jnp.where((prob.p_valid & has_obs)[:, None], delta_p, 0.0)
        return exp_se3(delta_c) @ cam_Tcw, p_xyz + delta_p

    def body(_, carry):
        cam_Tcw, p_xyz, lam = carry
        cam_new, p_new = lm_step(cam_Tcw, p_xyz, lam)
        f_old = total_cost(cam_Tcw, p_xyz)
        f_new = total_cost(cam_new, p_new)
        # a non-finite candidate must NEVER be adopted: the robust cost
        # only sums ACTIVE edges, so an inf/NaN in a weakly-constrained
        # coordinate can hide from f_new while poisoning the state (a
        # loop closure on a degraded map fed such a state to the
        # budgeted GBA and NaN'd the whole trajectory — drift-world
        # probe, r5)
        accept = (f_new < f_old) \
            & jnp.all(jnp.isfinite(cam_new)) & jnp.all(jnp.isfinite(p_new))
        cam_Tcw = jnp.where(accept, cam_new, cam_Tcw)
        p_xyz = jnp.where(accept, p_new, p_xyz)
        lam = jnp.clip(jnp.where(accept, lam * 0.5, lam * 5.0), 1e-9, 1e6)
        return cam_Tcw, p_xyz, lam

    cam_Tcw, p_xyz, _ = jax.lax.fori_loop(
        0, n_iters, body,
        (prob.cam_Tcw, prob.p_xyz, jnp.asarray(init_lambda, jnp.float32)),
    )
    cost = total_cost(cam_Tcw, p_xyz)
    stats = BAStats(
        cost=cost,
        n_edges=jnp.sum(prob.e_valid.astype(jnp.int32)),
        edge_chi2=jnp.zeros_like(prob.e_w),
    )
    return cam_Tcw, p_xyz, stats


def solve_ba_with_outlier_rounds(
    cam: Pinhole,
    prob: BAProblem,
    iters_1: int = 5,
    iters_2: int = 10,
    huber_delta: float = 2.7955,
    chi2_mono: float = 5.991,
    chi2_stereo: float = 7.815,
    grid: Tuple[int, int] | None = None,
):
    """The reference's LocalBundleAdjustment schedule: 5 LM iterations,
    prune chi2 outliers, 10 more iterations. Returns the pruned edge mask
    too (used to drop bad observations from the map)."""
    cam_Tcw, p_xyz, stats = solve_ba(cam, prob, iters_1, huber_delta,
                                     grid=grid)
    chi2_th = jnp.where(prob.e_ur >= 0, chi2_stereo, chi2_mono)
    keep = prob.e_valid & (stats.edge_chi2 < chi2_th)
    prob2 = prob._replace(
        cam_Tcw=cam_Tcw, p_xyz=p_xyz, e_valid=keep
    )
    cam_Tcw, p_xyz, stats2 = solve_ba(cam, prob2, iters_2, huber_delta,
                                      grid=grid)
    keep2 = keep & (stats2.edge_chi2 < chi2_th)
    return cam_Tcw, p_xyz, keep2, stats2
