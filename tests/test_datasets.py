"""Dataset pipeline tests: the NYUv2 .mat converter round-trips through the
prepared-layout reader; secondary datasets read the same layout with their
own constants."""

import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")
h5py = pytest.importorskip("h5py")


def make_fake_nyu_mat(tmp_path, n=3, h=24, w=32):
    """Synthesize nyu_depth_v2_labeled.mat + splits.mat + classMapping40.mat
    with the official layouts (images (N,3,W,H), depths/labels (N,W,H))."""
    from scipy.io import savemat

    rng = np.random.default_rng(0)
    mat = tmp_path / "nyu_depth_v2_labeled.mat"
    with h5py.File(mat, "w") as f:
        f["images"] = rng.integers(0, 255, (n, 3, w, h), dtype=np.uint8)
        f["depths"] = rng.random((n, w, h)).astype(np.float32) * 9.0
        f["rawDepths"] = rng.random((n, w, h)).astype(np.float32) * 9.0
        f["labels"] = rng.integers(0, 895, (n, w, h)).astype(np.uint16)
    savemat(tmp_path / "splits.mat", {
        "trainNdxs": np.array([[1], [3]]),
        "testNdxs": np.array([[2]]),
    })
    savemat(tmp_path / "classMapping40.mat", {
        "mapClass": (np.arange(894) % 40 + 1).astype(np.uint16)[None, :],
    })
    return mat


class TestPrepareNYUv2:
    def test_convert_and_read_back(self, tmp_path):
        from dynmm_tpu.data.nyuv2 import NYUv2Dataset
        from dynmm_tpu.data.prepare_nyuv2 import convert

        make_fake_nyu_mat(tmp_path)
        out = tmp_path / "prepared"
        convert(
            str(out),
            str(tmp_path / "nyu_depth_v2_labeled.mat"),
            str(tmp_path / "splits.mat"),
            str(tmp_path / "classMapping40.mat"),
        )
        train = NYUv2Dataset(str(out), split="train")
        test = NYUv2Dataset(str(out), split="test")
        assert len(train) == 2 and len(test) == 1
        s = train[0]
        assert s["image"].shape == (24, 32, 3)
        assert s["depth"].shape == (24, 32)
        assert s["label"].shape == (24, 32)
        assert s["label"].max() <= 40
        # depth is mm uint16 content
        assert s["depth"].max() <= 9000 + 1

    def test_raw_depth_mode(self, tmp_path):
        from dynmm_tpu.data.nyuv2 import NYUv2Dataset
        from dynmm_tpu.data.prepare_nyuv2 import convert

        make_fake_nyu_mat(tmp_path)
        out = tmp_path / "prepared"
        convert(
            str(out),
            str(tmp_path / "nyu_depth_v2_labeled.mat"),
            str(tmp_path / "splits.mat"),
            str(tmp_path / "classMapping40.mat"),
        )
        raw = NYUv2Dataset(str(out), split="train", depth_mode="raw")
        assert raw[0]["depth"].shape == (24, 32)


class TestSecondaryDatasets:
    def _write_prepared(self, root, label_dir, n_classes, h=16, w=20):
        rng = np.random.default_rng(1)
        for sub in ("rgb", "depth", label_dir):
            os.makedirs(os.path.join(root, "test", sub), exist_ok=True)
        names = []
        for i in range(2):
            name = f"{i:04d}"
            names.append(name)
            cv2.imwrite(
                os.path.join(root, "test", "rgb", f"{name}.png"),
                rng.integers(0, 255, (h, w, 3), dtype=np.uint8),
            )
            cv2.imwrite(
                os.path.join(root, "test", "depth", f"{name}.png"),
                rng.integers(0, 5000, (h, w), dtype=np.uint16),
            )
            cv2.imwrite(
                os.path.join(root, "test", label_dir, f"{name}.png"),
                rng.integers(0, n_classes + 1, (h, w), dtype=np.uint8),
            )
        with open(os.path.join(root, "test.txt"), "w") as f:
            f.write("\n".join(names) + "\n")

    def test_sunrgbd(self, tmp_path):
        from dynmm_tpu.data.other_datasets import SUNRGBDDataset

        self._write_prepared(str(tmp_path), "labels_37", 37)
        ds = SUNRGBDDataset(str(tmp_path), split="test")
        assert ds.n_classes_without_void == 37
        assert ds.cameras == ("realsense", "kv2", "kv1", "xtion")
        assert ds.depth_mean > 10000  # SUNRGBD-specific stats
        s = ds[0]
        assert s["image"].shape == (16, 20, 3)

    def test_cityscapes(self, tmp_path):
        from dynmm_tpu.data.other_datasets import CityscapesDataset

        self._write_prepared(str(tmp_path), "labels_19", 19)
        # cityscapes layout (prepare_cityscapes): 16-bit disparity pngs in
        # disparity_raw/ ('raw' mode) + metric float16 .npy in depth_raw/
        # ('refined' mode)
        rng = np.random.default_rng(3)
        for sub in ("disparity_raw", "depth_raw"):
            os.makedirs(os.path.join(str(tmp_path), "test", sub), exist_ok=True)
        for name in ("0000", "0001"):
            cv2.imwrite(
                os.path.join(str(tmp_path), "test", "disparity_raw",
                             f"{name}.png"),
                rng.integers(0, 30000, (16, 20), dtype=np.uint16),
            )
            np.save(
                os.path.join(str(tmp_path), "test", "depth_raw",
                             f"{name}.npy"),
                rng.uniform(0, 80, (16, 20)).astype(np.float16),
            )
        for mode in ("refined", "raw"):
            ds = CityscapesDataset(str(tmp_path), split="test",
                                   depth_mode=mode)
            assert ds.n_classes_without_void == 19
            s = ds[0]
            assert s["label"].max() <= 19
            assert s["depth"].shape == (16, 20)

    def test_seg_pipeline_over_prepared_data(self, tmp_path):
        """Full path: prepared pngs → preprocessor → batched loader."""
        from dynmm_tpu.data.other_datasets import SUNRGBDDataset
        from dynmm_tpu.data.seg_preprocessing import SegLoader, SegPreprocessor

        self._write_prepared(str(tmp_path), "labels_37", 37)
        ds = SUNRGBDDataset(str(tmp_path), split="test")
        pre = SegPreprocessor(ds.depth_mean, ds.depth_std, 16, 16, phase="test")
        loader = SegLoader(ds, pre, batch_size=2)
        batch = next(iter(loader))
        assert batch["image"].shape == (2, 16, 16, 3)
        assert batch["label_orig"].shape == (2, 16, 20)


class TestCameraFiltering:
    def test_filter_camera_narrows_and_restores(self, tmp_path):
        from dynmm_tpu.data.other_datasets import SUNRGBDDataset

        rng = np.random.default_rng(2)
        root = str(tmp_path)
        for sub in ("rgb", "depth", "labels_37"):
            os.makedirs(os.path.join(root, "test", sub), exist_ok=True)
        names, cams = [], []
        for i in range(4):
            name = f"{i:04d}"
            names.append(name)
            cams.append("kv1" if i % 2 == 0 else "xtion")
            cv2.imwrite(os.path.join(root, "test", "rgb", f"{name}.png"),
                        rng.integers(0, 255, (8, 8, 3), dtype=np.uint8))
            cv2.imwrite(os.path.join(root, "test", "depth", f"{name}.png"),
                        rng.integers(0, 5000, (8, 8), dtype=np.uint16))
            cv2.imwrite(os.path.join(root, "test", "labels_37", f"{name}.png"),
                        rng.integers(0, 38, (8, 8), dtype=np.uint8))
        with open(os.path.join(root, "test.txt"), "w") as f:
            f.write("\n".join(names) + "\n")
        with open(os.path.join(root, "test_cameras.txt"), "w") as f:
            f.write("\n".join(cams) + "\n")

        ds = SUNRGBDDataset(root, split="test")
        assert len(ds) == 4
        with ds.filter_camera("kv1"):
            assert len(ds) == 2
        with ds.filter_camera("xtion"):
            assert len(ds) == 2
        with ds.filter_camera("realsense"):
            assert len(ds) == 0
        assert len(ds) == 4  # restored


class TestClassColors:
    """VERDICT r2 item 9: predict.py colors must match the reference's
    published NYUv2 palette (nyuv2/nyuv2.py:27-328), not a random table."""

    def _ref_base(self):
        import importlib.util

        path = "/root/reference/FusionDynMM/src/datasets/nyuv2/nyuv2.py"
        if not os.path.exists(path):
            pytest.skip("reference mount unavailable")
        spec = importlib.util.spec_from_file_location("_ref_nyuv2", path)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod.NYUv2Base

    def test_40_class_palette_matches_reference(self):
        from dynmm_tpu.data.nyuv2 import class_colors

        ref = np.asarray(self._ref_base().CLASS_COLORS_40, np.uint8)
        np.testing.assert_array_equal(class_colors(41), ref)
        assert tuple(class_colors(41)[0]) == (0, 0, 0)  # void stays black

    def test_13_class_palette_matches_reference(self):
        from dynmm_tpu.data.nyuv2 import class_colors

        ref = np.asarray(self._ref_base().CLASS_COLORS_13, np.uint8)
        np.testing.assert_array_equal(class_colors(14), ref)

    def test_894_class_palette_matches_reference(self):
        from dynmm_tpu.data.nyuv2 import voc_colormap

        ref = np.asarray(self._ref_base().CLASS_COLORS_894, np.uint8)
        np.testing.assert_array_equal(voc_colormap(895), ref)
