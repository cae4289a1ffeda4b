"""Golden tests: Pallas kernels vs their jnp reference implementations
(interpret mode on CPU; the same kernels compile for TPU)."""

import numpy as np
import jax.numpy as jnp

from lc_crf_slam_tpu.ops.fast import fast_score_dual
from lc_crf_slam_tpu.ops.pallas_fast import fast_score_dual_pallas
from lc_crf_slam_tpu.utils.synthetic import SyntheticWorld
from lc_crf_slam_tpu.geometry.camera import TUM3

RNG = np.random.default_rng(21)


class TestPallasFAST:
    def _compare(self, img):
        hi_ref, lo_ref = fast_score_dual(jnp.asarray(img), 20.0, 7.0)
        hi_p, lo_p = fast_score_dual_pallas(
            jnp.asarray(img), 20.0, 7.0, interpret=True
        )
        # border handling differs within 5 px (roll-wrap vs edge-pad);
        # the detection margin (19) excludes it anyway
        s = np.s_[5:-5, 5:-5]
        np.testing.assert_allclose(
            np.asarray(hi_p)[s], np.asarray(hi_ref)[s], atol=1e-2
        )
        np.testing.assert_allclose(
            np.asarray(lo_p)[s], np.asarray(lo_ref)[s], atol=1e-2
        )

    def test_golden_random_image(self):
        img = (RNG.random((256, 256)) * 255).astype(np.float32)
        self._compare(img)

    def test_golden_rendered_frame(self):
        world = SyntheticWorld(cam=TUM3, n_frames=2, n_static=200,
                               n_dynamic=0)
        f = world.frame(0, render=True)
        self._compare(f.image.astype(np.float32))

    def test_non_tile_multiple_shape(self):
        img = (RNG.random((200, 300)) * 255).astype(np.float32)
        self._compare(img)
