"""Data-pipeline tests: normalization semantics, multi-scale labels,
augmentation determinism, eval-noise injection probabilities."""

import numpy as np
import pytest

from dynmm_tpu.data.seg_preprocessing import (
    RGB_MEAN,
    RGB_STD,
    SegPreprocessor,
    _hsv_to_rgb,
    _rgb_to_hsv,
    inject_eval_noise,
)


def sample(h=64, w=80):
    rng = np.random.default_rng(0)
    return {
        "image": (rng.random((h, w, 3)) * 255).astype(np.uint8),
        "depth": (rng.random((h, w)) * 5000).astype(np.float32),
        "label": rng.integers(0, 6, (h, w)).astype(np.uint8),
    }


class TestNormalize:
    def test_train_output_keys_and_scales(self):
        pre = SegPreprocessor(2000.0, 800.0, 48, 64, phase="train")
        out = pre(sample(), np.random.default_rng(1))
        assert out["image"].shape == (48, 64, 3)
        assert out["depth"].shape == (48, 64, 1)
        assert out["label"].shape == (48, 64)
        assert set(out["label_down"]) == {8, 16, 32}
        assert out["label_down"][8].shape == (6, 8)
        # normalized rgb roughly zero-centered
        assert abs(out["image"].mean()) < 3.0

    def test_refined_vs_raw_depth(self):
        s = sample()
        s["depth"][0, 0] = 0.0
        pre_raw = SegPreprocessor(2000.0, 800.0, None, None, phase="test",
                                  depth_mode="raw")
        out = pre_raw(dict(s), np.random.default_rng(0))
        assert out["depth"][0, 0, 0] == 0.0  # invalid stays zero
        pre_ref = SegPreprocessor(2000.0, 800.0, None, None, phase="test")
        out2 = pre_ref(dict(s), np.random.default_rng(0))
        np.testing.assert_allclose(out2["depth"][0, 0, 0], -2.5)

    def test_test_phase_keeps_label_orig(self):
        pre = SegPreprocessor(2000.0, 800.0, 48, 64, phase="test")
        s = sample()
        out = pre(dict(s), np.random.default_rng(0))
        assert out["label_orig"].shape == s["label"].shape  # untouched size
        assert out["image"].shape == (48, 64, 3)

    def test_rgb_normalization_values(self):
        pre = SegPreprocessor(0.0, 1.0, None, None, phase="test")
        s = sample()
        out = pre(dict(s), np.random.default_rng(0))
        expected = (s["image"].astype(np.float32) / 255.0 - RGB_MEAN) / RGB_STD
        np.testing.assert_allclose(out["image"], expected, rtol=1e-5, atol=1e-5)


class TestHSV:
    def test_roundtrip(self, rng):
        img = (rng.random((16, 16, 3)) * 255).astype(np.float32)
        back = _hsv_to_rgb(_rgb_to_hsv(img))
        np.testing.assert_allclose(back, img, rtol=1e-4, atol=1e-3)


class TestAugmentationDeterminism:
    def test_same_seed_same_output(self):
        pre = SegPreprocessor(2000.0, 800.0, 48, 64, phase="train")
        a = pre(sample(), np.random.default_rng(7))
        b = pre(sample(), np.random.default_rng(7))
        np.testing.assert_array_equal(a["image"], b["image"])
        np.testing.assert_array_equal(a["label"], b["label"])

    def test_crop_within_rescaled_bounds(self):
        pre = SegPreprocessor(2000.0, 800.0, 32, 32, phase="train",
                              scale_range=(1.2, 1.4))
        out = pre(sample(40, 40), np.random.default_rng(3))
        assert out["image"].shape == (32, 32, 3)


class TestEvalNoise:
    def test_application_probability_one_third(self):
        rng = np.random.default_rng(0)
        image = np.ones((4, 4, 3), np.float32)
        depth = np.ones((4, 4, 1), np.float32)
        changed = 0
        n = 600
        for _ in range(n):
            im2, _ = inject_eval_noise(image, depth, mode=0, noise=1.0, rng=rng)
            changed += int(not np.array_equal(im2, image))
        assert 0.25 < changed / n < 0.42  # p = 0.33

    def test_mode_targets(self):
        rng = np.random.default_rng(1)
        image = np.ones((4, 4, 3), np.float32)
        depth = np.ones((4, 4, 1), np.float32)
        any_img = any_dep = False
        for _ in range(200):
            im2, dp2 = inject_eval_noise(image, depth, mode=2, noise=1.0, rng=rng)
            img_changed = not np.array_equal(im2, image)
            dep_changed = not np.array_equal(dp2, depth)
            assert not (img_changed and dep_changed)  # either-or per batch
            any_img |= img_changed
            any_dep |= dep_changed
        assert any_img and any_dep

    def test_amplitude_scaling(self):
        rng = np.random.default_rng(2)
        image = np.full((64, 64, 3), 10.0, np.float32)
        depth = np.ones((1, 1, 1), np.float32)
        deltas = []
        for _ in range(100):
            im2, _ = inject_eval_noise(image, depth, mode=0, noise=0.5, rng=rng)
            if not np.array_equal(im2, image):
                deltas.append(np.std(im2 - image))
        # std of injected noise ≈ noise * mean|x| = 0.5 * 10
        assert 3.5 < np.mean(deltas) < 6.5


class TestPackStemBatch:
    """pack_stem_batch (SegLoader post hook): channel-guarded s2d packing."""

    def test_packs_raw_and_is_noop_on_packed(self):
        from dynmm_tpu.data.seg_preprocessing import pack_stem_batch
        from dynmm_tpu.models.resnet import space_to_depth_host

        rng = np.random.default_rng(0)
        batch = {
            "image": rng.standard_normal((2, 8, 12, 3)).astype(np.float32),
            "depth": rng.standard_normal((2, 8, 12, 1)).astype(np.float32),
            "label": rng.integers(0, 5, (2, 8, 12)).astype(np.int32),
        }
        packed = pack_stem_batch(batch)
        np.testing.assert_array_equal(
            packed["image"], space_to_depth_host(batch["image"])
        )
        np.testing.assert_array_equal(
            packed["depth"], space_to_depth_host(batch["depth"])
        )
        np.testing.assert_array_equal(packed["label"], batch["label"])
        # idempotent: packed channels (12/4) fail the raw C==3/1 guard
        again = pack_stem_batch(packed)
        np.testing.assert_array_equal(again["image"], packed["image"])
        np.testing.assert_array_equal(again["depth"], packed["depth"])

    def test_odd_dims_untouched(self):
        from dynmm_tpu.data.seg_preprocessing import pack_stem_batch

        rng = np.random.default_rng(1)
        batch = {
            "image": rng.standard_normal((1, 7, 12, 3)).astype(np.float32),
            "depth": rng.standard_normal((1, 7, 12, 1)).astype(np.float32),
        }
        out = pack_stem_batch(batch)
        np.testing.assert_array_equal(out["image"], batch["image"])
        np.testing.assert_array_equal(out["depth"], batch["depth"])
