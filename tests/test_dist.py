"""Distributed tests on the forced 8-device CPU mesh (SURVEY.md §5)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lc_crf_slam_tpu.geometry.camera import TUM3
from lc_crf_slam_tpu.ops.schur import solve_ba
from lc_crf_slam_tpu.parallel.mesh import make_mesh
from lc_crf_slam_tpu.parallel.dist_ba import (
    dist_solve_ba,
    dist_solve_ba_blocks,
    partition_point_blocks,
)

from test_schur_ba import make_problem, cam_errs


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "conftest must force 8 CPU devices"
    return make_mesh(8)


class TestDistBA:
    def test_matches_single_device(self, mesh):
        prob, cams_true, pts, nc, npts = make_problem(seed=0)
        cam_s, p_s, _ = solve_ba(TUM3, prob, n_iters=10)
        cam_d, p_d, _ = dist_solve_ba(TUM3, prob, mesh, n_iters=10)
        np.testing.assert_allclose(
            np.asarray(cam_d)[:nc, :3, 3], np.asarray(cam_s)[:nc, :3, 3],
            atol=1e-4,
        )
        valid = np.asarray(prob.p_valid)
        np.testing.assert_allclose(
            np.asarray(p_d)[valid], np.asarray(p_s)[valid], atol=1e-3
        )

    def test_recovers_gt(self, mesh):
        prob, cams_true, pts, nc, npts = make_problem(seed=1, pix_noise=0.3)
        cam_d, p_d, stats = dist_solve_ba(TUM3, prob, mesh, n_iters=12)
        ce = cam_errs(cam_d, cams_true, nc)
        assert ce.max() < 0.01, ce

    def test_jit_compiles(self, mesh):
        prob, *_ = make_problem(seed=2)
        f = jax.jit(lambda p: dist_solve_ba(TUM3, p, mesh, n_iters=3))
        cam_d, p_d, stats = f(prob)
        assert np.isfinite(float(stats.cost))


class TestDistBABlocks:
    """Point-block (map-block) sharded global BA — SURVEY.md §8.2-M5."""

    def test_matches_single_device(self, mesh):
        prob, cams_true, pts, nc, npts = make_problem(seed=0)
        cam_s, p_s, _ = solve_ba(TUM3, prob, n_iters=10)
        probb = partition_point_blocks(prob, mesh.size)
        cam_d, p_d, _ = dist_solve_ba_blocks(TUM3, probb, mesh, n_iters=10)
        np.testing.assert_allclose(
            np.asarray(cam_d)[:nc, :3, 3], np.asarray(cam_s)[:nc, :3, 3],
            atol=1e-4,
        )
        # point state is sharded+padded; compare the valid prefix
        valid = np.asarray(prob.p_valid)
        P_ = valid.shape[0]
        np.testing.assert_allclose(
            np.asarray(p_d)[:P_][valid], np.asarray(p_s)[valid], atol=1e-3
        )

    def test_recovers_gt(self, mesh):
        prob, cams_true, pts, nc, npts = make_problem(seed=1, pix_noise=0.3)
        probb = partition_point_blocks(prob, mesh.size)
        cam_d, p_d, stats = dist_solve_ba_blocks(
            TUM3, probb, mesh, n_iters=12)
        ce = cam_errs(cam_d, cams_true, nc)
        assert ce.max() < 0.01, ce
        assert np.isfinite(float(stats.cost))


class TestDistCRF:
    def _toy(self, n=512, seed=0):
        from lc_crf_slam_tpu.config import SLAMConfig

        rng = np.random.default_rng(seed)
        cfg = SLAMConfig()
        xyz = jnp.asarray(rng.uniform(-3, 3, (n, 3)), jnp.float32)
        ok = jnp.asarray(rng.uniform(size=n) < 0.9)
        u_s = jnp.asarray(rng.gamma(2.0, 1.0, n), jnp.float32)
        u_d = jnp.full((n,), 4.0, jnp.float32)
        return cfg, xyz, ok, u_s, u_d

    def test_knn_matches_single_device(self, mesh):
        from lc_crf_slam_tpu.models.crf import knn_graph
        from lc_crf_slam_tpu.parallel.dist_crf import dist_knn_graph

        cfg, xyz, ok, *_ = self._toy()
        nbr_s, w_s = knn_graph(cfg, xyz, ok)
        nbr_d, w_d = dist_knn_graph(cfg, xyz, ok, mesh)
        # neighbor SETS must agree (top-k tie order may differ)
        ws = np.sort(np.asarray(w_s), axis=-1)
        wd = np.sort(np.asarray(w_d), axis=-1)
        np.testing.assert_allclose(wd, ws, atol=1e-5)
        ns = np.sort(np.asarray(nbr_s), axis=-1)
        nd = np.sort(np.asarray(nbr_d), axis=-1)
        same = (ns == nd).all(axis=-1)
        assert same.mean() > 0.99, same.mean()

    def test_mean_field_matches_single_device(self, mesh):
        from lc_crf_slam_tpu.models.crf import knn_graph, mean_field
        from lc_crf_slam_tpu.parallel.dist_crf import dist_mean_field

        cfg, xyz, ok, u_s, u_d = self._toy(seed=3)
        nbr, w = knn_graph(cfg, xyz, ok)
        q_s = mean_field(cfg, u_s, u_d, nbr, w, ok)
        q_d = dist_mean_field(cfg, u_s, u_d, nbr, w, ok, mesh)
        np.testing.assert_allclose(
            np.asarray(q_d), np.asarray(q_s), atol=1e-5
        )

    def test_jit_end_to_end(self, mesh):
        from lc_crf_slam_tpu.parallel.dist_crf import (
            dist_knn_graph, dist_mean_field,
        )

        cfg, xyz, ok, u_s, u_d = self._toy(seed=5)

        @jax.jit
        def label(xyz, ok, u_s, u_d):
            nbr, w = dist_knn_graph(cfg, xyz, ok, mesh)
            return dist_mean_field(cfg, u_s, u_d, nbr, w, ok, mesh)

        q = label(xyz, ok, u_s, u_d)
        q = np.asarray(q)
        assert np.isfinite(q).all() and (q >= 0).all() and (q <= 1).all()


class TestShardedPipeline:
    """Mesh-sharded track_sequence == single-device track_sequence.

    VERDICT r4 weak #3: the only correctness check on the mesh path was
    the dryrun's isfinite — a pipeline that gathered wrong shards would
    pass. This pins pose equality over a multi-chunk run on the forced
    8-device CPU mesh (chunk=8, one frame per device)."""

    @pytest.mark.slow
    def test_sharded_pipeline_matches_single_device(self, mesh):
        from jax.sharding import Mesh

        from lc_crf_slam_tpu.config import SLAMConfig
        from lc_crf_slam_tpu.geometry.camera import Pinhole
        from lc_crf_slam_tpu.models.system import SLAMSystem
        from lc_crf_slam_tpu.utils.synthetic import SyntheticWorld

        QVGA = Pinhole(fx=268.0, fy=270.0, cx=160.0, cy=120.0,
                       width=320, height=240, bf=20.0)
        n = 16   # two full chunks of 8
        world = SyntheticWorld(cam=QVGA, n_frames=n + 1, n_static=700,
                               n_dynamic=0, seed=3, trajectory="line",
                               billboard=True, bb_speed=0.04)
        fr = [world.frame(k, render=True) for k in range(n + 1)]
        grays = np.stack([f.image for f in fr]).astype(np.float32)
        depths = np.stack([f.depth_image for f in fr]).astype(np.float32)
        dts = np.arange(n + 1, dtype=np.float64) / 30.0

        mesh_p = Mesh(np.asarray(jax.devices()[:8]), ("frames",))
        poses = {}
        kfs = {}
        for name, m in (("single", None), ("sharded", mesh_p)):
            slam = SLAMSystem(QVGA, SLAMConfig(), enable_crf=True,
                              enable_mapping=True, mesh=m)
            poses[name] = slam.track_sequence(grays, depths, dts, chunk=8)
            kfs[name] = len(slam.kf_log)

        assert kfs["sharded"] == kfs["single"], (
            f"KF decisions diverged: {kfs}"
        )
        # pose equality: translation to 1e-4 m, rotation via frobenius
        t_err = np.linalg.norm(
            poses["sharded"][:, :3, 3] - poses["single"][:, :3, 3], axis=-1
        )
        r_err = np.linalg.norm(
            poses["sharded"][:, :3, :3] - poses["single"][:, :3, :3],
            axis=(-2, -1),
        )
        assert t_err.max() < 1e-4, f"translation diverged: {t_err}"
        assert r_err.max() < 1e-4, f"rotation diverged: {r_err}"
