"""Schur-complement LM bundle adjustment: synthetic problems with known
optimum (SURVEY.md §5: 'LM solver on synthetic BA problems')."""

import numpy as np
import jax
import jax.numpy as jnp

from lc_crf_slam_tpu.geometry.camera import TUM3, project_stereo
from lc_crf_slam_tpu.geometry.se3 import exp_se3, se3_apply
from lc_crf_slam_tpu.ops.schur import (
    BAProblem,
    solve_ba,
    solve_ba_with_outlier_rounds,
)

CAM = TUM3


def make_problem(
    n_cams=6, n_pts=200, seed=0, pix_noise=0.0, pose_noise=0.02,
    pt_noise=0.02, outlier_frac=0.0, mono_frac=0.0,
    cap_c=8, cap_p=256, cap_e=2048,
):
    """Cameras on an arc looking at a cloud; perturbed initial values."""
    rng = np.random.default_rng(seed)
    pts = np.stack([
        rng.uniform(-2.5, 2.5, n_pts),
        rng.uniform(-1.8, 1.8, n_pts),
        rng.uniform(3, 7, n_pts),
    ], -1).astype(np.float32)
    cams_true = []
    for i in range(n_cams):
        t = i / max(n_cams - 1, 1)
        xi = np.array([0.4 * t, 0.1 * np.sin(3 * t), 0.05 * t,
                       0.02 * np.sin(2 * t), 0.15 * t - 0.05, 0.01 * t])
        cams_true.append(np.asarray(exp_se3(jnp.asarray(xi, jnp.float32))))
    cams_true = np.stack(cams_true)

    e_cam, e_pt, e_uv, e_ur, e_w = [], [], [], [], []
    for c in range(n_cams):
        pc = pts @ cams_true[c, :3, :3].T + cams_true[c, :3, 3]
        uvr, z = project_stereo(CAM, jnp.asarray(pc))
        uvr = np.asarray(uvr)
        vis = (
            (z > 0.3) & (uvr[:, 0] > 5) & (uvr[:, 0] < 635)
            & (uvr[:, 1] > 5) & (uvr[:, 1] < 475)
        )
        for p in np.nonzero(np.asarray(vis))[0]:
            uv = uvr[p, :2] + rng.normal(0, pix_noise, 2)
            ur = uvr[p, 2] + rng.normal(0, pix_noise)
            if rng.random() < mono_frac:
                ur = -1.0
            if rng.random() < outlier_frac:
                uv = uv + rng.uniform(15, 60, 2) * rng.choice([-1, 1], 2)
            e_cam.append(c)
            e_pt.append(p)
            e_uv.append(uv)
            e_ur.append(ur)
            e_w.append(1.0)
    E = len(e_cam)
    assert E <= cap_e, E

    def pad(x, cap, fill=0):
        x = np.asarray(x, np.float32 if np.asarray(x).dtype.kind == "f" else None)
        out = np.full((cap,) + np.asarray(x).shape[1:], fill, np.asarray(x).dtype)
        out[: len(x)] = x
        return out

    # perturbed initial state (camera 0 fixed = gauge anchor)
    cams_init = cams_true.copy()
    for c in range(1, n_cams):
        xi = rng.normal(0, pose_noise, 6).astype(np.float32)
        cams_init[c] = np.asarray(exp_se3(jnp.asarray(xi))) @ cams_init[c]
    pts_init = pts + rng.normal(0, pt_noise, pts.shape).astype(np.float32)

    cam_Tcw = np.tile(np.eye(4, dtype=np.float32), (cap_c, 1, 1))
    cam_Tcw[:n_cams] = cams_init
    cam_fixed = np.ones(cap_c, bool)
    cam_fixed[1:n_cams] = False
    p_xyz = np.zeros((cap_p, 3), np.float32)
    p_xyz[:n_pts] = pts_init
    p_valid = np.zeros(cap_p, bool)
    p_valid[:n_pts] = True

    prob = BAProblem(
        cam_Tcw=jnp.asarray(cam_Tcw),
        cam_fixed=jnp.asarray(cam_fixed),
        p_xyz=jnp.asarray(p_xyz),
        p_valid=jnp.asarray(p_valid),
        e_cam=jnp.asarray(pad(np.asarray(e_cam, np.int32), cap_e)),
        e_pt=jnp.asarray(pad(np.asarray(e_pt, np.int32), cap_e)),
        e_uv=jnp.asarray(pad(np.asarray(e_uv, np.float32), cap_e)),
        e_ur=jnp.asarray(pad(np.asarray(e_ur, np.float32), cap_e, fill=-1.0)),
        e_w=jnp.asarray(pad(np.asarray(e_w, np.float32), cap_e)),
        e_valid=jnp.asarray(np.arange(cap_e) < E),
    )
    return prob, cams_true, pts, n_cams, n_pts


def cam_errs(cam_out, cams_true, n_cams):
    return np.linalg.norm(
        np.asarray(cam_out)[:n_cams, :3, 3] - cams_true[:, :3, 3], axis=-1
    )


class TestSchurBA:
    def test_perfect_observations_recover_gt(self):
        prob, cams_true, pts, nc, npts = make_problem()
        cam_out, p_out, stats = solve_ba(CAM, prob, n_iters=15)
        ce = cam_errs(cam_out, cams_true, nc)
        pe = np.linalg.norm(np.asarray(p_out)[:npts] - pts, axis=-1)
        assert ce.max() < 1e-3, ce
        assert np.median(pe) < 1e-3, np.median(pe)
        assert float(stats.cost) < 1.0

    def test_noisy_observations(self):
        prob, cams_true, pts, nc, npts = make_problem(pix_noise=0.5, seed=1)
        cam_out, p_out, stats = solve_ba(CAM, prob, n_iters=15)
        ce = cam_errs(cam_out, cams_true, nc)
        assert ce.max() < 0.01, ce

    def test_outlier_rounds(self):
        prob, cams_true, pts, nc, npts = make_problem(
            pix_noise=0.3, outlier_frac=0.15, seed=2
        )
        cam_out, p_out, keep, stats = solve_ba_with_outlier_rounds(CAM, prob)
        ce = cam_errs(cam_out, cams_true, nc)
        assert ce.max() < 0.01, ce
        # most outliers pruned
        n_active = int(jnp.sum(prob.e_valid))
        n_kept = int(jnp.sum(keep))
        assert n_kept < n_active
        assert n_kept > 0.7 * n_active

    def test_mono_edges(self):
        prob, cams_true, pts, nc, npts = make_problem(
            pix_noise=0.3, mono_frac=0.5, seed=3
        )
        cam_out, p_out, stats = solve_ba(CAM, prob, n_iters=15)
        ce = cam_errs(cam_out, cams_true, nc)
        assert ce.max() < 0.01, ce

    def test_fixed_cameras_unmoved(self):
        prob, cams_true, pts, nc, npts = make_problem(seed=4)
        cam_out, _, _ = solve_ba(CAM, prob, n_iters=10)
        np.testing.assert_array_equal(
            np.asarray(cam_out)[0], np.asarray(prob.cam_Tcw)[0]
        )

    def test_points_refine_toward_gt(self):
        """The tracking-drift scenario: points with radial depth error,
        cameras near GT — BA must pull points toward GT positions."""
        prob, cams_true, pts, nc, npts = make_problem(
            pose_noise=0.002, pt_noise=0.05, pix_noise=0.2, seed=5
        )
        pe0 = np.linalg.norm(np.asarray(prob.p_xyz)[:npts] - pts, axis=-1)
        _, p_out, _ = solve_ba(CAM, prob, n_iters=15)
        pe1 = np.linalg.norm(np.asarray(p_out)[:npts] - pts, axis=-1)
        assert np.median(pe1) < 0.3 * np.median(pe0), (
            np.median(pe0), np.median(pe1)
        )

    def test_jit_compiles(self):
        prob, cams_true, pts, nc, npts = make_problem(seed=6)
        f = jax.jit(lambda p: solve_ba(CAM, p, n_iters=5), static_argnums=())
        cam_out, p_out, stats = f(prob)
        assert np.isfinite(float(stats.cost))


class TestGridFastPath:
    """Streaming one-hot assembly (grid=(C, K)) == generic gather path."""

    def test_matches_generic(self):
        prob, cams_true, pts, nc, npts = make_problem(
            pix_noise=0.3, mono_frac=0.3, seed=9)
        # re-grid: camera-major layout with K slots per camera
        C, K = 8, 320
        e_cam = np.asarray(prob.e_cam)
        order = []
        valid = np.zeros(C * K, bool)
        idx = np.zeros(C * K, np.int32)
        for c in range(C):
            mine = np.nonzero(
                (e_cam == c) & np.asarray(prob.e_valid))[0]
            assert len(mine) <= K
            idx[c * K: c * K + len(mine)] = mine
            valid[c * K: c * K + len(mine)] = True
        gp = BAProblem(
            cam_Tcw=prob.cam_Tcw, cam_fixed=prob.cam_fixed,
            p_xyz=prob.p_xyz, p_valid=prob.p_valid,
            e_cam=jnp.asarray(
                np.repeat(np.arange(C, dtype=np.int32), K)),
            e_pt=jnp.asarray(np.asarray(prob.e_pt)[idx]),
            e_uv=jnp.asarray(np.asarray(prob.e_uv)[idx]),
            e_ur=jnp.asarray(np.where(
                valid, np.asarray(prob.e_ur)[idx], -1.0
            ).astype(np.float32)),
            e_w=jnp.asarray(np.asarray(prob.e_w)[idx]),
            e_valid=jnp.asarray(valid),
        )
        cam_g, p_g, _ = solve_ba(CAM, gp, n_iters=8, grid=(C, K))
        cam_n, p_n, _ = solve_ba(CAM, gp, n_iters=8)
        np.testing.assert_allclose(
            np.asarray(cam_g)[:nc], np.asarray(cam_n)[:nc], atol=1e-4)
        # points: identical up to f32 accumulation order (a few weakly
        # constrained points drift ~1e-3 under different summation trees)
        d = np.abs(np.asarray(p_g)[:npts] - np.asarray(p_n)[:npts])
        assert np.percentile(d, 99) < 1e-3, np.percentile(d, 99)
        assert d.max() < 2e-2, d.max()
        ce = cam_errs(cam_g, cams_true, nc)
        assert ce.max() < 0.02, ce


class TestJointCG:
    """Matrix-free joint Schur CG (solve_ba_cg) — full-map global BA."""

    def test_matches_dense_schur(self):
        from lc_crf_slam_tpu.ops.schur import solve_ba_cg

        prob, cams_true, pts, nc, npts = make_problem(pix_noise=0.3, seed=5)
        cam_d, p_d, _ = solve_ba(CAM, prob, n_iters=12)
        cam_c, p_c, _ = solve_ba_cg(CAM, prob, n_iters=12)
        np.testing.assert_allclose(
            np.asarray(cam_c)[:nc, :3, 3], np.asarray(cam_d)[:nc, :3, 3],
            atol=2e-3,
        )
        ce = cam_errs(cam_c, cams_true, nc)
        assert ce.max() < 0.01, ce

    def test_large_problem_smoke(self):
        """A problem size whose dense (P, C, 6, 3) coupling tensor would
        be ~0.9 GB — must run matrix-free."""
        from lc_crf_slam_tpu.ops.schur import BAProblem, solve_ba_cg

        rng = np.random.default_rng(0)
        C, P = 64, 20000
        pts = rng.uniform([-4, -3, 2], [4, 3, 9], (P, 3)).astype(np.float32)
        cams = np.tile(np.eye(4, dtype=np.float32), (C, 1, 1))
        cams[:, 0, 3] = 0.05 * np.arange(C)
        e_pt = np.repeat(np.arange(P), 4)
        e_cam = rng.integers(0, C, e_pt.shape[0])
        pc = np.einsum("eij,ej->ei", cams[e_cam][:, :3, :3], pts[e_pt]) \
            + cams[e_cam][:, :3, 3]
        z = np.maximum(pc[:, 2], 1e-3)
        u = CAM.fx * pc[:, 0] / z + CAM.cx
        v = CAM.fy * pc[:, 1] / z + CAM.cy
        noisy = cams.copy()
        noisy[1:, :3, 3] += rng.normal(0, 0.01, (C - 1, 3)).astype(np.float32)
        fixed = np.zeros(C, bool); fixed[0] = True
        prob = BAProblem(
            cam_Tcw=jnp.asarray(noisy),
            cam_fixed=jnp.asarray(fixed),
            p_xyz=jnp.asarray(pts + rng.normal(0, 0.005, pts.shape)
                              .astype(np.float32)),
            p_valid=jnp.ones(P, bool),
            e_cam=jnp.asarray(e_cam, jnp.int32),
            e_pt=jnp.asarray(e_pt, jnp.int32),
            e_uv=jnp.asarray(np.stack([u, v], -1), jnp.float32),
            e_ur=jnp.full(e_pt.shape[0], -1.0, jnp.float32),
            e_w=jnp.ones(e_pt.shape[0], jnp.float32),
            e_valid=jnp.ones(e_pt.shape[0], bool),
        )
        cam_c, p_c, stats = solve_ba_cg(CAM, prob, n_iters=4, cg_iters=24)
        assert np.isfinite(float(stats.cost))
        err = np.linalg.norm(
            np.asarray(cam_c)[1:, :3, 3] - cams[1:, :3, 3], axis=-1)
        assert err.max() < 5e-3, err.max()
