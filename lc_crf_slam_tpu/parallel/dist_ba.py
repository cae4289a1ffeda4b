"""Distributed bundle adjustment: Schur reduction over ICI collectives.

SURVEY.md §6.7/§6.8: observations (edges) shard across devices; each
device assembles partial camera/point Hessian blocks for its edge shard,
the blocks are `psum`-reduced over the mesh ('edge' axis), and the small
reduced camera system is solved replicated. This is the BA analog of
data-parallel gradient aggregation — the reduced system rides ICI, the
dense solve stays local.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..geometry.camera import Pinhole
from ..geometry.se3 import exp_se3
from ..ops.schur import (
    BAProblem,
    BAStats,
    _edge_residuals,
    _robust_weights,
    inv3x3,
)


def _partial_blocks(cam: Pinhole, cam_Tcw, p_xyz, prob: BAProblem,
                    huber_delta: float):
    """Local-edge-shard block assembly (runs inside shard_map)."""
    C = cam_Tcw.shape[0]
    P_ = p_xyz.shape[0]
    r, J_cam, J_pt, z_ok = _edge_residuals(cam, cam_Tcw, p_xyz, prob)
    active = prob.e_valid & z_ok & prob.p_valid[prob.e_pt]
    if isinstance(huber_delta, tuple):   # (stereo, mono) per-edge split
        huber_delta = jnp.where(prob.e_ur >= 0, huber_delta[0], huber_delta[1])
    _, w, cost = _robust_weights(r, prob.e_w, active, huber_delta)
    J_cam = J_cam * (
        1.0 - prob.cam_fixed[prob.e_cam].astype(J_cam.dtype)
    )[:, None, None]
    wJc = w[:, None, None] * J_cam
    Hcc = jnp.zeros((C, 6, 6)).at[prob.e_cam].add(
        jnp.einsum("eij,eik->ejk", wJc, J_cam))
    g_c = jnp.zeros((C, 6)).at[prob.e_cam].add(
        jnp.einsum("eij,ei->ej", wJc, r))
    Hpp = jnp.zeros((P_, 3, 3)).at[prob.e_pt].add(
        jnp.einsum("eij,eik->ejk", w[:, None, None] * J_pt, J_pt))
    g_p = jnp.zeros((P_, 3)).at[prob.e_pt].add(
        jnp.einsum("eij,ei->ej", w[:, None, None] * J_pt, r))
    Wpc = jnp.zeros((P_ * C, 6, 3)).at[prob.e_pt * C + prob.e_cam].add(
        jnp.einsum("eij,eik->ejk", wJc, J_pt)).reshape(P_, C, 6, 3)
    return Hcc, g_c, Hpp, g_p, Wpc, cost


def _solve_from_blocks(cam_Tcw, p_xyz, prob, blocks, lam):
    """Replicated Schur solve + back-substitution from reduced blocks."""
    Hcc, g_c, Hpp, g_p, Wpc = blocks
    C = cam_Tcw.shape[0]
    diag_p = jax.vmap(jnp.diag)(jax.vmap(jnp.diag)(Hpp))
    Hpp_inv = inv3x3(Hpp + lam * diag_p + 1e-6 * jnp.eye(3))
    Tpc = jnp.einsum("pcia,pab->pcib", Wpc, Hpp_inv)
    S_red = jnp.einsum("pcia,pdja->cidj", Tpc, Wpc)
    diag_c = jax.vmap(jnp.diag)(jax.vmap(jnp.diag)(Hcc))
    S = -S_red
    S = S.at[jnp.arange(C), :, jnp.arange(C), :].add(Hcc + lam * diag_c)
    S = S.reshape(C * 6, C * 6)
    fixed_diag = jnp.repeat(prob.cam_fixed.astype(S.dtype), 6) + (
        jnp.abs(jnp.diagonal(S)) < 1e-8
    ).astype(S.dtype)
    S = S + jnp.diag(fixed_diag + 1e-6)
    rhs = (g_c - jnp.einsum("pcia,pa->ci", Tpc, g_p)).reshape(C * 6)
    delta_c = -jnp.linalg.solve(S, rhs).reshape(C, 6)
    delta_c = delta_c * (1.0 - prob.cam_fixed.astype(delta_c.dtype))[:, None]
    Wt_dc = jnp.einsum("pcia,ci->pa", Wpc, delta_c)
    delta_p = -jnp.einsum("pab,pb->pa", Hpp_inv, g_p + Wt_dc)
    has_obs = jnp.einsum("pii->p", Hpp) > 0
    delta_p = jnp.where((prob.p_valid & has_obs)[:, None], delta_p, 0.0)
    return exp_se3(delta_c) @ cam_Tcw, p_xyz + delta_p


def partition_point_blocks(prob: BAProblem, n_shards: int) -> BAProblem:
    """Host-side repartition of a BA problem into contiguous point blocks.

    Pads points to a multiple of `n_shards`, groups edges by the shard
    that owns their point (shard = pt // points_per_shard), rewrites
    `e_pt` to LOCAL point indices, and pads every shard's edge list to a
    common length so the edge arrays shard evenly over the mesh. The
    returned problem is only valid for `dist_solve_ba_blocks`.
    """
    import numpy as np

    P_ = int(prob.p_xyz.shape[0])
    pps = -(-P_ // n_shards)  # ceil
    P_pad = pps * n_shards
    p_xyz = np.zeros((P_pad, 3), np.float32)
    p_xyz[:P_] = np.asarray(prob.p_xyz)
    p_valid = np.zeros((P_pad,), bool)
    p_valid[:P_] = np.asarray(prob.p_valid)

    e_pt = np.asarray(prob.e_pt)
    e_valid = np.asarray(prob.e_valid)
    shard = np.where(e_valid, e_pt // pps, 0)
    order = np.argsort(shard, kind="stable")
    counts = np.bincount(shard[order], minlength=n_shards)
    E_pad = max(int(counts.max()), 1)

    def pack(arr, fill):
        arr = np.asarray(arr)[order]
        out = np.full((n_shards, E_pad) + arr.shape[1:], fill, arr.dtype)
        off = 0
        for s in range(n_shards):
            c = counts[s]
            out[s, :c] = arr[off:off + c]
            off += c
        return out.reshape((n_shards * E_pad,) + arr.shape[1:])

    e_pt_local = pack(e_pt - shard * pps, 0)
    return BAProblem(
        cam_Tcw=prob.cam_Tcw, cam_fixed=prob.cam_fixed,
        p_xyz=jnp.asarray(p_xyz), p_valid=jnp.asarray(p_valid),
        e_cam=jnp.asarray(pack(prob.e_cam, 0)),
        e_pt=jnp.asarray(np.clip(e_pt_local, 0, pps - 1)),
        e_uv=jnp.asarray(pack(prob.e_uv, 0.0)),
        e_ur=jnp.asarray(pack(prob.e_ur, -1.0)),
        e_w=jnp.asarray(pack(prob.e_w, 0.0)),
        e_valid=jnp.asarray(pack(e_valid, False)),
    )


def dist_solve_ba_blocks(
    cam: Pinhole,
    prob: BAProblem,
    mesh: Mesh,
    n_iters: int = 10,
    huber_delta: float = 2.7955,
    init_lambda: float = 1e-4,
    huber_delta_mono: float | None = 2.4477,
) -> Tuple[jax.Array, jax.Array, BAStats]:
    """Map-block-sharded LM bundle adjustment (SURVEY.md §6.7/§8.2-M5).

    Each device OWNS a contiguous point block: its positions, 3x3 point
    Hessians, the (pps, C, 6, 3) coupling blocks, the damped point-block
    inverses, and the point back-substitution all stay device-local, so
    per-device memory scales as P/n. Only the reduced camera system
    (C*6 x C*6 Schur complement + rhs + scalar cost) is psum-reduced
    over ICI — communication is independent of the map size, which is
    what lets the global-BA map grow with the mesh. Contrast
    `dist_solve_ba` (edge sharding): there every device still holds the
    full point state and full (P, C) coupling tensor.

    `prob` must come from `partition_point_blocks(prob, mesh.size)`.
    Replaces the reference's single-threaded g2o GlobalBundleAdjustemnt
    (SURVEY.md §3.1 Optimizer.cc) at scale.
    """
    n = mesh.size
    if huber_delta_mono is not None:
        huber_delta = (huber_delta, huber_delta_mono)

    p_specs = BAProblem(
        cam_Tcw=P(), cam_fixed=P(), p_xyz=P("edge"), p_valid=P("edge"),
        e_cam=P("edge"), e_pt=P("edge"), e_uv=P("edge"), e_ur=P("edge"),
        e_w=P("edge"), e_valid=P("edge"),
    )

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(p_specs,),
        out_specs=(P(), P("edge"), P()),
    )
    def run(prob_l):
        C = prob_l.cam_Tcw.shape[0]
        pps = prob_l.p_xyz.shape[0]
        hd = huber_delta
        if isinstance(hd, tuple):
            hd = jnp.where(prob_l.e_ur >= 0, hd[0], hd[1])

        def local_cost(cam_Tcw, p_l):
            pl = prob_l._replace(cam_Tcw=cam_Tcw, p_xyz=p_l)
            r, _, _, z_ok = _edge_residuals(cam, cam_Tcw, p_l, pl)
            active = pl.e_valid & z_ok & pl.p_valid[pl.e_pt]
            _, _, cost = _robust_weights(r, pl.e_w, active, hd)
            return jax.lax.psum(cost, "edge")

        def step(cam_Tcw, p_l, lam):
            pl = prob_l._replace(cam_Tcw=cam_Tcw, p_xyz=p_l)
            r, J_cam, J_pt, z_ok = _edge_residuals(cam, cam_Tcw, p_l, pl)
            active = pl.e_valid & z_ok & pl.p_valid[pl.e_pt]
            _, w, _ = _robust_weights(r, pl.e_w, active, hd)
            J_cam = J_cam * (
                1.0 - pl.cam_fixed[pl.e_cam].astype(J_cam.dtype)
            )[:, None, None]
            wJc = w[:, None, None] * J_cam
            Hcc = jnp.zeros((C, 6, 6)).at[pl.e_cam].add(
                jnp.einsum("eij,eik->ejk", wJc, J_cam))
            g_c = jnp.zeros((C, 6)).at[pl.e_cam].add(
                jnp.einsum("eij,ei->ej", wJc, r))
            Hpp = jnp.zeros((pps, 3, 3)).at[pl.e_pt].add(
                jnp.einsum("eij,eik->ejk", w[:, None, None] * J_pt, J_pt))
            g_p = jnp.zeros((pps, 3)).at[pl.e_pt].add(
                jnp.einsum("eij,ei->ej", w[:, None, None] * J_pt, r))
            Wpc = jnp.zeros((pps * C, 6, 3)).at[pl.e_pt * C + pl.e_cam].add(
                jnp.einsum("eij,eik->ejk", wJc, J_pt)).reshape(pps, C, 6, 3)

            diag_p = jax.vmap(jnp.diag)(jax.vmap(jnp.diag)(Hpp))
            Hpp_inv = inv3x3(Hpp + lam * diag_p + 1e-6 * jnp.eye(3))
            Tpc = jnp.einsum("pcia,pab->pcib", Wpc, Hpp_inv)
            # the ONLY cross-device reduction: C6xC6 Schur + camera grads
            S_red = jax.lax.psum(
                jnp.einsum("pcia,pdja->cidj", Tpc, Wpc), "edge")
            Hcc = jax.lax.psum(Hcc, "edge")
            g_c = jax.lax.psum(g_c, "edge")
            rhs_red = jax.lax.psum(
                jnp.einsum("pcia,pa->ci", Tpc, g_p), "edge")

            diag_c = jax.vmap(jnp.diag)(jax.vmap(jnp.diag)(Hcc))
            S = -S_red
            S = S.at[jnp.arange(C), :, jnp.arange(C), :].add(
                Hcc + lam * diag_c)
            S = S.reshape(C * 6, C * 6)
            fixed_diag = jnp.repeat(pl.cam_fixed.astype(S.dtype), 6) + (
                jnp.abs(jnp.diagonal(S)) < 1e-8
            ).astype(S.dtype)
            S = S + jnp.diag(fixed_diag + 1e-6)
            rhs = (g_c - rhs_red).reshape(C * 6)
            delta_c = -jnp.linalg.solve(S, rhs).reshape(C, 6)
            delta_c = delta_c * (
                1.0 - pl.cam_fixed.astype(delta_c.dtype))[:, None]
            # point back-substitution: fully local to the owning device
            Wt_dc = jnp.einsum("pcia,ci->pa", Wpc, delta_c)
            delta_p = -jnp.einsum("pab,pb->pa", Hpp_inv, g_p + Wt_dc)
            has_obs = jnp.einsum("pii->p", Hpp) > 0
            delta_p = jnp.where(
                (pl.p_valid & has_obs)[:, None], delta_p, 0.0)
            return exp_se3(delta_c) @ cam_Tcw, p_l + delta_p

        def body(_, carry):
            cam_Tcw, p_l, lam = carry
            f_old = local_cost(cam_Tcw, p_l)
            cam_new, p_new = step(cam_Tcw, p_l, lam)
            f_new = local_cost(cam_new, p_new)
            accept = f_new < f_old
            cam_Tcw = jnp.where(accept, cam_new, cam_Tcw)
            p_l = jnp.where(accept, p_new, p_l)
            lam = jnp.clip(jnp.where(accept, lam * 0.5, lam * 5.0),
                           1e-9, 1e6)
            return cam_Tcw, p_l, lam

        cam_Tcw, p_l, _ = jax.lax.fori_loop(
            0, n_iters, body,
            (prob_l.cam_Tcw, prob_l.p_xyz,
             jnp.asarray(init_lambda, jnp.float32)),
        )
        return cam_Tcw, p_l, local_cost(cam_Tcw, p_l)

    cam_Tcw, p_xyz, cost = run(prob)
    stats = BAStats(
        cost=cost,
        n_edges=jnp.sum(prob.e_valid.astype(jnp.int32)),
        edge_chi2=jnp.zeros_like(prob.e_w),
    )
    return cam_Tcw, p_xyz, stats


def dist_solve_ba(
    cam: Pinhole,
    prob: BAProblem,
    mesh: Mesh,
    n_iters: int = 10,
    huber_delta: float = 2.7955,
    init_lambda: float = 1e-4,
    huber_delta_mono: float | None = 2.4477,
) -> Tuple[jax.Array, jax.Array, BAStats]:
    """Edge-sharded LM bundle adjustment over a device mesh.

    Same semantics as ops.schur.solve_ba; edge arrays of `prob` must have
    length divisible by the mesh size (pad with e_valid=False).
    """
    if huber_delta_mono is not None:
        # per-edge Huber (stereo vs mono), resolved shard-locally from e_ur
        huber_delta = (huber_delta, huber_delta_mono)
    e_spec = BAProblem(
        cam_Tcw=P(), cam_fixed=P(), p_xyz=P(), p_valid=P(),
        e_cam=P("edge"), e_pt=P("edge"), e_uv=P("edge"), e_ur=P("edge"),
        e_w=P("edge"), e_valid=P("edge"),
    )

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(), P(), e_spec),
        out_specs=(P(), P(), P(), P(), P(), P()),
    )
    def reduced_blocks(cam_Tcw, p_xyz, prob_l):
        out = _partial_blocks(cam, cam_Tcw, p_xyz, prob_l, huber_delta)
        return jax.tree.map(lambda x: jax.lax.psum(x, "edge"), out)

    def total_cost(cam_Tcw, p_xyz):
        # cost is part of the reduced blocks (cheap: reuse assembly)
        *_, cost = reduced_blocks(cam_Tcw, p_xyz, prob)
        return cost

    def body(_, carry):
        cam_Tcw, p_xyz, lam = carry
        Hcc, g_c, Hpp, g_p, Wpc, f_old = reduced_blocks(cam_Tcw, p_xyz, prob)
        cam_new, p_new = _solve_from_blocks(
            cam_Tcw, p_xyz, prob, (Hcc, g_c, Hpp, g_p, Wpc), lam
        )
        f_new = total_cost(cam_new, p_new)
        accept = f_new < f_old
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
