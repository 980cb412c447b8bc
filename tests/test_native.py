"""Native preprocessing library tests: build, cv2-parity, and fallback."""

import numpy as np
import pytest

from dynmm_tpu import native


@pytest.fixture(scope="module")
def nlib():
    l = native.lib()
    if l is None:
        pytest.skip("no C++ toolchain available")
    return l


class TestResizeParity:
    def test_bilinear_matches_cv2(self, nlib, rng):
        import cv2

        img = rng.standard_normal((37, 53, 3)).astype(np.float32)
        ours = native.resize(img, 64, 80, nearest=False)
        ref = cv2.resize(img, (80, 64), interpolation=cv2.INTER_LINEAR)
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)

    def test_bilinear_downscale_matches_cv2(self, nlib, rng):
        import cv2

        img = rng.standard_normal((64, 80, 1)).astype(np.float32)
        ours = native.resize(img[:, :, 0], 30, 40, nearest=False)
        ref = cv2.resize(img[:, :, 0], (40, 30), interpolation=cv2.INTER_LINEAR)
        # cv2 downscaling INTER_LINEAR uses the same half-pixel sampling
        np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-4)

    def test_nearest_matches_cv2_float(self, nlib, rng):
        import cv2

        img = rng.standard_normal((41, 59)).astype(np.float32)
        ours = native.resize(img, 480, 640, nearest=True)
        ref = cv2.resize(img, (640, 480), interpolation=cv2.INTER_NEAREST)
        np.testing.assert_array_equal(ours, ref)

    def test_nearest_matches_cv2_int_labels(self, nlib, rng):
        import cv2

        lab = rng.integers(0, 40, (480, 640)).astype(np.int32)
        ours = native.resize(lab, 60, 80, nearest=True)
        ref = cv2.resize(lab, (80, 60), interpolation=cv2.INTER_NEAREST)
        np.testing.assert_array_equal(ours, ref)


class TestNormalize:
    def test_rgb(self, nlib, rng):
        img = (rng.random((16, 20, 3)) * 255).astype(np.float32)
        mean = np.array([0.485, 0.456, 0.406], np.float32)
        std = np.array([0.229, 0.224, 0.225], np.float32)
        ours = native.normalize_rgb(img, mean, std)
        ref = (img / 255.0 - mean) / std
        np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)

    def test_rgb_flip(self, nlib, rng):
        img = (rng.random((8, 10, 3)) * 255).astype(np.float32)
        mean = np.zeros(3, np.float32)
        std = np.ones(3, np.float32)
        ours = native.normalize_rgb(img, mean, std, flip=True)
        np.testing.assert_allclose(ours, img[:, ::-1] / 255.0, rtol=1e-6)

    def test_depth_keep_zeros(self, nlib):
        depth = np.array([[0.0, 2000.0], [1000.0, 0.0]], np.float32)
        ours = native.normalize_depth(depth, 1000.0, 500.0, keep_zeros=True)
        np.testing.assert_allclose(ours, [[0.0, 2.0], [0.0, 0.0]])
        ours2 = native.normalize_depth(depth, 1000.0, 500.0, keep_zeros=False)
        np.testing.assert_allclose(ours2, [[-2.0, 2.0], [0.0, -2.0]])


class TestSpaceToDepth:
    def test_matches_numpy_reference(self, nlib, rng):
        """Native s2d must be layout-identical to the numpy transpose form
        in models/resnet.py::space_to_depth_host (the packed-stem kernel
        re-tiling depends on this exact (row parity, col parity, c)
        channel order)."""
        for n, h, w, c in ((1, 6, 8, 3), (2, 480, 64, 1), (3, 8, 10, 4)):
            x = rng.standard_normal((n, h, w, c)).astype(np.float32)
            ref = np.ascontiguousarray(
                x.reshape(n, h // 2, 2, w // 2, 2, c)
                .transpose(0, 1, 3, 2, 4, 5)
                .reshape(n, h // 2, w // 2, 4 * c)
            )
            np.testing.assert_array_equal(native.space_to_depth(x), ref)

    def test_host_helper_uses_native(self, nlib, rng):
        """space_to_depth_host routes float32 through the native kernel and
        still equals the numpy fallback (non-f32 input exercises it)."""
        from dynmm_tpu.models.resnet import space_to_depth_host

        x = rng.standard_normal((2, 8, 12, 3)).astype(np.float32)
        np.testing.assert_array_equal(
            space_to_depth_host(x),
            space_to_depth_host(x.astype(np.float64)).astype(np.float32),
        )
