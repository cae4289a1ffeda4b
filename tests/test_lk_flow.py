"""Pyramidal LK optical flow tests."""

import numpy as np
import jax
import jax.numpy as jnp

from lc_crf_slam_tpu.ops.lk_flow import lk_track

RNG = np.random.default_rng(12)


def _textured(H=160, W=200, smooth=3):
    import cv2

    img = RNG.random((H, W)).astype(np.float32) * 200
    return cv2.GaussianBlur(img, (0, 0), smooth)


class TestLK:
    def test_pure_translation(self):
        img = _textured()
        shift = np.array([3.4, -2.2], np.float32)
        M = np.float32([[1, 0, shift[0]], [0, 1, shift[1]]])
        import cv2

        img2 = cv2.warpAffine(img, M, (img.shape[1], img.shape[0]))
        uv = jnp.asarray(RNG.uniform(30, 130, (32, 2)), jnp.float32)
        res = lk_track(jnp.asarray(img), jnp.asarray(img2), uv,
                       jnp.ones(32, bool))
        ok = np.asarray(res.ok)
        assert ok.mean() > 0.8
        flow = np.asarray(res.uv_next) - np.asarray(uv)
        np.testing.assert_allclose(
            flow[ok], np.tile(shift, (ok.sum(), 1)), atol=0.3
        )

    def test_large_motion_needs_pyramid(self):
        img = _textured(smooth=5)
        shift = np.array([14.0, 9.0], np.float32)
        import cv2

        M = np.float32([[1, 0, shift[0]], [0, 1, shift[1]]])
        img2 = cv2.warpAffine(img, M, (img.shape[1], img.shape[0]))
        uv = jnp.asarray(RNG.uniform(40, 120, (16, 2)), jnp.float32)
        res = lk_track(jnp.asarray(img), jnp.asarray(img2), uv,
                       jnp.ones(16, bool), n_levels=3)
        ok = np.asarray(res.ok)
        flow = np.asarray(res.uv_next) - np.asarray(uv)
        good = ok & (np.linalg.norm(flow - shift, axis=-1) < 1.0)
        assert good.mean() > 0.6, flow[:5]

    def test_flat_region_flagged(self):
        img = np.full((120, 120), 80.0, np.float32)
        uv = jnp.asarray([[60.0, 60.0]])
        res = lk_track(jnp.asarray(img), jnp.asarray(img), uv,
                       jnp.ones(1, bool))
        # zero-gradient window: result should at least not explode
        assert np.isfinite(np.asarray(res.uv_next)).all()

    def test_identity_flow_zero(self):
        img = _textured()
        uv = jnp.asarray(RNG.uniform(30, 100, (16, 2)), jnp.float32)
        res = lk_track(jnp.asarray(img), jnp.asarray(img), uv,
                       jnp.ones(16, bool))
        flow = np.asarray(res.uv_next) - np.asarray(uv)
        assert np.abs(flow).max() < 0.05
