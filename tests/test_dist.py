"""Distributed tests on the forced 8-device CPU mesh (SURVEY.md §5)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lc_crf_slam_tpu.geometry.camera import TUM3
from lc_crf_slam_tpu.ops.schur import solve_ba
from lc_crf_slam_tpu.parallel.mesh import make_mesh
from lc_crf_slam_tpu.parallel.dist_ba import dist_solve_ba

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
