"""Native C++ loader + real dataset-path CLI (config-1-shaped e2e on an
exported TUM-format sequence — exercises association, PNG decode, the
image front-end, and ATE without network access)."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from lc_crf_slam_tpu.geometry.camera import TUM3
from lc_crf_slam_tpu.utils.native_loader import (
    NativeTUMLoader,
    build_native_runtime,
)
from lc_crf_slam_tpu.utils.synthetic import SyntheticWorld


@pytest.fixture(scope="module")
def tum_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("tumseq"))
    world = SyntheticWorld(cam=TUM3, n_frames=8, n_static=500, n_dynamic=0,
                           seed=13, pixel_noise=0.0, depth_noise=0.0)
    world.export_tum_sequence(d)
    return d, world


class TestNativeLoader:
    def test_build(self):
        assert build_native_runtime(), "native runtime failed to build"

    def test_matches_python_loader(self, tum_dir):
        d, world = tum_dir
        assert build_native_runtime()
        from lc_crf_slam_tpu.utils.io_tum import TUMSequence

        seq = TUMSequence(d)
        entries = [
            (t_rgb, os.path.join(d, rp), t_d, os.path.join(d, dp))
            for t_rgb, rp, t_d, dp in seq.entries
        ]
        ldr = NativeTUMLoader(entries, TUM3.width, TUM3.height)
        for k, (t, gray, depth) in enumerate(ldr):
            t_ref, gray_ref, depth_ref = seq[k]
            assert abs(t - t_ref) < 1e-9
            # cv2 grayscale uses the same BT.601 luma
            assert np.abs(gray - gray_ref).max() < 1.0
            np.testing.assert_allclose(depth, depth_ref, atol=1e-4)
        ldr.close()

    def test_out_of_order_safe_shutdown(self, tum_dir):
        d, _ = tum_dir
        from lc_crf_slam_tpu.utils.io_tum import TUMSequence

        seq = TUMSequence(d)
        entries = [
            (t_rgb, os.path.join(d, rp), t_d, os.path.join(d, dp))
            for t_rgb, rp, t_d, dp in seq.entries
        ]
        ldr = NativeTUMLoader(entries, TUM3.width, TUM3.height, n_threads=8)
        it = iter(ldr)
        next(it)  # consume one frame only
        ldr.close()  # must not deadlock with frames still queued


@pytest.mark.slow
class TestDatasetCLI:
    def test_cli_on_exported_sequence(self, tum_dir):
        d, world = tum_dir
        out = os.path.join(d, "traj.txt")
        r = subprocess.run(
            [sys.executable, "-m", "lc_crf_slam_tpu.run_slam",
             "--seq", d, "--cpu", "--out", out,
             "--kf-out", os.path.join(d, "kf.txt")],
            capture_output=True, text=True, timeout=900, cwd="/root/repo",
        )
        assert r.returncode == 0, r.stderr[-2000:]
        summary = json.loads(r.stdout.strip().splitlines()[-1])
        assert summary["frames"] == 8
        assert "ate_rmse_m" in summary
        # image front-end on rendered synthetic: plumbing-level gate
        assert summary["ate_rmse_m"] < 0.5
        assert "native prefetching loader" in r.stderr
