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


class TestFastMotionClamp:
    """ADVICE r3 #5 / VERDICT r4 ask #10: the per-level +-SEARCH_RAD
    correction clamp plus the texture's own convergence basin bound
    LK's capture range. Measured on an 8 px-blob texture (the widest
    basins the rendered worlds produce): n_levels=3 captures ~16 px,
    n_levels=4 ~24 px; the naive +-6*(2^L-1) window bound is NOT
    reached because the coarse level must also land inside a basin.
    The safety property is GRACEFUL failure: inside the range flow is
    accurate; beyond it the tracker must not return confidently-wrong
    vectors — the ok gate drops them (measured confidently-wrong
    fraction <=0.16 out to 60 px shifts)."""

    def _shifted_pair(self, dx):
        import cv2

        rng = np.random.default_rng(4)
        # low-res noise upsampled 8x: high contrast with ~8 px blob
        # scale, i.e. convergence basins wide enough for the per-level
        # search window (box-smoothed per-pixel noise has ~1 px basins
        # and LK rightly fails on it at ANY shift)
        low = rng.uniform(0, 255, (30, 40)).astype(np.float32)
        img = cv2.resize(low, (320, 240), interpolation=cv2.INTER_LINEAR)
        nxt = np.roll(img, dx, axis=1)
        uv = np.stack([rng.uniform(60, 200, 256),
                       rng.uniform(60, 180, 256)], -1).astype(np.float32)
        return jnp.asarray(img), jnp.asarray(nxt), jnp.asarray(uv)

    def test_within_capture_range_accurate(self):
        img, nxt, uv = self._shifted_pair(8)
        res = lk_track(img, nxt, uv, jnp.ones(256, bool), n_levels=3)
        ok = np.asarray(res.ok)
        assert ok.mean() > 0.9, ok.mean()
        err = np.abs(np.asarray(res.uv_next)[:, 0] - (np.asarray(uv)[:, 0] + 8))
        assert np.median(err[ok]) < 1.0, np.median(err[ok])

    def test_beyond_capture_range_fails_gracefully(self):
        img, nxt, uv = self._shifted_pair(60)   # >> 42 px capture bound
        res = lk_track(img, nxt, uv, jnp.ones(256, bool), n_levels=3)
        ok = np.asarray(res.ok)
        err = np.abs(np.asarray(res.uv_next)[:, 0] - (np.asarray(uv)[:, 0] + 60))
        # no confidently-wrong results: ok points are rare, and any
        # that survive on this self-similar noise texture must not
        # dominate (bound the confidently-wrong fraction)
        conf_wrong = (ok & (err > 5.0)).mean()
        assert conf_wrong < 0.2, (
            f"{conf_wrong:.0%} confidently-wrong tracks at 60 px shift"
        )

    def test_more_levels_extend_range(self):
        img, nxt, uv = self._shifted_pair(16)
        r2 = lk_track(img, nxt, uv, jnp.ones(256, bool), n_levels=2)
        r4 = lk_track(img, nxt, uv, jnp.ones(256, bool), n_levels=4)
        err4 = np.abs(np.asarray(r4.uv_next)[:, 0] - (np.asarray(uv)[:, 0] + 16))
        ok4 = np.asarray(r4.ok)
        # a 16 px shift: 4 levels capture it fully; 2 levels mostly
        # drop it (measured ok 1.00 vs 0.20)
        assert ok4.mean() > 0.8 and np.median(err4[ok4]) < 1.5
        ok2 = np.asarray(r2.ok)
        err2 = np.abs(np.asarray(r2.uv_next)[:, 0] - (np.asarray(uv)[:, 0] + 16))
        assert (ok2 & (err2 < 2.0)).mean() < 0.4
