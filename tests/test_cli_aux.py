"""CLI, checkpointing, viewer, stereo matching — the L7/L8/aux layers."""

import json
import subprocess
import sys

import numpy as np
import jax.numpy as jnp
import pytest

from lc_crf_slam_tpu.config import SLAMConfig
from lc_crf_slam_tpu.geometry.camera import TUM3
from lc_crf_slam_tpu.ops.stereo import stereo_match


class TestCLI:
    @pytest.mark.slow
    def test_synthetic_run_end_to_end(self, tmp_path):
        out = tmp_path / "traj.txt"
        viz = tmp_path / "map.png"
        ckpt = tmp_path / "ckpt.npz"
        r = subprocess.run(
            [sys.executable, "-m", "lc_crf_slam_tpu.run_slam",
             "--synthetic", "--frames", "15", "--dynamic", "40", "--cpu",
             "--out", str(out), "--kf-out", str(tmp_path / "kf.txt"),
             "--viz", str(viz), "--checkpoint", str(ckpt)],
            capture_output=True, text=True, timeout=900,
            cwd="/root/repo",
        )
        assert r.returncode == 0, r.stderr[-2000:]
        summary = json.loads(r.stdout.strip().splitlines()[-1])
        assert summary["frames"] == 15
        assert summary["ate_rmse_m"] < 0.01
        assert out.exists() and viz.exists() and ckpt.exists()

    def test_help_and_arg_validation(self):
        from lc_crf_slam_tpu.run_slam import build_argparser

        ap = build_argparser()
        with pytest.raises(SystemExit):
            ap.parse_args([])  # neither --seq nor --synthetic
        args = ap.parse_args(["--synthetic", "--frames", "5"])
        assert args.frames == 5


class TestCheckpoint:
    def test_roundtrip(self, tmp_path):
        from lc_crf_slam_tpu.models.mapstate import empty_map
        from lc_crf_slam_tpu.models.tracking import empty_track_state
        from lc_crf_slam_tpu.utils.checkpoint import (
            load_checkpoint,
            save_checkpoint,
        )

        cfg = SLAMConfig()
        m = empty_map(cfg)
        m = m._replace(
            p_xyz=m.p_xyz.at[0].set(jnp.asarray([1.0, 2.0, 3.0])),
            n_points=jnp.asarray(1),
        )
        ts = empty_track_state(cfg)
        path = str(tmp_path / "c.npz")
        save_checkpoint(path, m, ts, meta={"frame": 7})
        m2, ts2, meta = load_checkpoint(path)
        np.testing.assert_array_equal(np.asarray(m2.p_xyz[0]), [1, 2, 3])
        assert int(m2.n_points) == 1
        assert int(meta["frame"]) == 7
        for a, b in zip(m, m2):
            assert np.asarray(a).shape == np.asarray(b).shape

    def test_trajectory_roundtrip(self, tmp_path):
        """Resume must restore the per-frame trajectory log so the final
        export covers pre-checkpoint frames (reference has no analog —
        SURVEY.md §6.4 upgrade)."""
        from lc_crf_slam_tpu.models.mapstate import empty_map
        from lc_crf_slam_tpu.models.tracking import empty_track_state
        from lc_crf_slam_tpu.utils.checkpoint import (
            load_checkpoint,
            save_checkpoint,
        )

        cfg = SLAMConfig()
        m = empty_map(cfg)
        ts = empty_track_state(cfg)
        Tcr = np.eye(4)
        Tcr[:3, 3] = [0.1, 0.2, 0.3]
        traj = [(0.0, np.eye(4), 0), (0.5, Tcr, 1)]
        kf_log = [(0.0, 0), (0.5, 1)]
        path = str(tmp_path / "c.npz")
        save_checkpoint(path, m, ts, trajectory=traj, kf_log=kf_log)
        _, _, meta = load_checkpoint(path)
        assert len(meta["trajectory"]) == 2
        t1, T1, r1 = meta["trajectory"][1]
        assert t1 == 0.5 and r1 == 1
        np.testing.assert_allclose(T1, Tcr)
        assert meta["kf_log"] == [(0.0, 0), (0.5, 1)]


class TestStereo:
    def test_matches_give_correct_depth(self):
        rng = np.random.default_rng(0)
        K = 64
        depth_true = rng.uniform(0.5, 5.0, K).astype(np.float32)
        u_l = rng.uniform(100, 500, K).astype(np.float32)
        v = rng.uniform(50, 430, K).astype(np.float32)
        disp = TUM3.bf / depth_true
        uv_l = jnp.asarray(np.stack([u_l, v], -1))
        uv_r = jnp.asarray(np.stack([u_l - disp, v], -1))
        desc = jnp.asarray(
            rng.integers(0, 2**32, (K, 8), dtype=np.uint32))
        lvl = jnp.zeros(K, jnp.int32)
        ok = jnp.ones(K, bool)
        ur, d = stereo_match(TUM3, uv_l, lvl, desc, ok, uv_r, lvl, desc, ok)
        good = np.asarray(d) > 0
        assert good.mean() > 0.9
        np.testing.assert_allclose(
            np.asarray(d)[good], depth_true[good], rtol=0.02
        )

    def test_row_gate_rejects_vertical_offsets(self):
        rng = np.random.default_rng(1)
        K = 16
        uv_l = jnp.asarray(rng.uniform(100, 400, (K, 2)), jnp.float32)
        uv_r = jnp.asarray(
            np.asarray(uv_l) + np.array([-20.0, 30.0], np.float32))
        desc = jnp.asarray(rng.integers(0, 2**32, (K, 8), dtype=np.uint32))
        lvl = jnp.zeros(K, jnp.int32)
        ok = jnp.ones(K, bool)
        ur, d = stereo_match(TUM3, uv_l, lvl, desc, ok, uv_r, lvl, desc, ok)
        assert float(jnp.sum(d > 0)) == 0


class TestGraftEntry:
    def test_dryrun_multichip_driver_env(self):
        """The driver invokes dryrun_multichip with JAX_PLATFORMS=cpu and
        forced host device count; it must build a genuine N-device mesh."""
        import os
        import subprocess
        import sys

        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
        r = subprocess.run(
            [sys.executable, "-c",
             "import importlib.util;"
             "spec = importlib.util.spec_from_file_location("
             "'ge', '/root/repo/__graft_entry__.py');"
             "ge = importlib.util.module_from_spec(spec);"
             "spec.loader.exec_module(ge);"
             "ge.dryrun_multichip(8)"],
            capture_output=True, text=True, timeout=600, env=env,
            cwd="/root/repo",
        )
        assert r.returncode == 0, r.stderr[-1500:]
        assert "dryrun_multichip(8): OK" in r.stdout
