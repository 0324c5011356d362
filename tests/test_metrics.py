"""Metric tests: PSNR identities and SSIM vs skimage when available."""

import numpy as np
import pytest

from vsr_tpu.utils.metrics import flow_epe, psnr, ssim


class TestPSNR:
    def test_identical_is_inf(self):
        img = np.random.default_rng(0).integers(0, 256, (32, 32, 3))
        assert psnr(img, img) == float("inf")

    def test_known_value(self):
        a = np.zeros((16, 16))
        b = np.full((16, 16), 16.0)
        # mse = 256 -> psnr = 20*log10(255/16)
        assert psnr(a, b) == pytest.approx(20 * np.log10(255 / 16), rel=1e-6)

    def test_monotonic_in_noise(self):
        rng = np.random.default_rng(1)
        img = rng.integers(0, 256, (64, 64, 3)).astype(np.float64)
        small = img + rng.normal(0, 1, img.shape)
        big = img + rng.normal(0, 8, img.shape)
        assert psnr(img, small) > psnr(img, big)


class TestSSIM:
    def test_identical_is_one(self):
        img = np.random.default_rng(2).integers(0, 256, (80, 80, 3))
        assert ssim(img, img) == pytest.approx(1.0, abs=1e-9)

    def test_matches_skimage_when_available(self):
        skimage = pytest.importorskip("skimage.metrics")
        rng = np.random.default_rng(3)
        a = rng.integers(0, 256, (128, 128)).astype(np.float64)
        b = np.clip(a + rng.normal(0, 12, a.shape), 0, 255)
        ref = skimage.structural_similarity(
            a, b, data_range=255, win_size=65, gaussian_weights=False)
        mine = ssim(a, b, win_size=65)
        assert mine == pytest.approx(ref, abs=0.02)

    def test_degrades_with_noise(self):
        rng = np.random.default_rng(4)
        img = rng.integers(0, 256, (100, 100, 3)).astype(np.float64)
        noisy = np.clip(img + rng.normal(0, 25, img.shape), 0, 255)
        s = ssim(img, noisy)
        assert 0.0 < s < 0.99

    def test_small_image_window_shrinks(self):
        img = np.random.default_rng(5).integers(0, 256, (20, 20, 3))
        assert ssim(img, img) == pytest.approx(1.0, abs=1e-9)


class TestFlowEPE:
    def test_zero(self):
        f = np.zeros((4, 4, 2))
        assert flow_epe(f, f) == 0.0

    def test_unit_offset(self):
        a = np.zeros((4, 4, 2))
        b = np.ones((4, 4, 2))
        assert flow_epe(a, b) == pytest.approx(np.sqrt(2))


class TestVFID:
    def test_frechet_identical_distributions(self):
        from vsr_tpu.utils.metrics import frechet_distance

        rng = np.random.default_rng(6)
        acts = rng.standard_normal((200, 16))
        d = frechet_distance(acts, acts.copy())
        assert d == pytest.approx(0.0, abs=1e-6)

    def test_frechet_shifted_mean(self):
        from vsr_tpu.utils.metrics import frechet_distance

        rng = np.random.default_rng(7)
        a = rng.standard_normal((500, 8))
        b = a + 2.0  # mean shift of 2 in every dim -> ||diff||^2 = 8*4 = 32
        d = frechet_distance(a, b)
        assert d == pytest.approx(32.0, rel=0.05)

    def test_i3d_features(self):
        import jax
        import jax.numpy as jnp
        from vsr_tpu.models.i3d import InceptionI3d

        model = InceptionI3d()
        video = jnp.zeros((1, 9, 64, 64, 3))
        # init with the logits head so both call modes share one param tree
        params = model.init(jax.random.PRNGKey(0), video, features_only=False)
        feats = model.apply(params, video)
        assert feats.shape == (1, 1024)
        logits = model.apply(params, video, features_only=False)
        assert logits.shape == (1, 400)
