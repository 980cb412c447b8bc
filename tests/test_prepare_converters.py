"""Synthetic round-trip tests for the offline dataset converters
(SUNRGBD + Cityscapes, VERDICT r1 item 8): build miniature raw downloads,
run the converters, and read the prepared layout back through the dataset
classes, asserting pixel-exact content and split/camera bookkeeping."""

import json
import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")
h5py = pytest.importorskip("h5py")
from scipy.io import savemat

from dynmm_tpu.data.other_datasets import CityscapesDataset, SUNRGBDDataset
from dynmm_tpu.data.prepare_cityscapes import (
    CLASS_MAPPING_REDUCED, convert as convert_cityscapes, disparity_to_depth,
)
from dynmm_tpu.data.prepare_sunrgbd import convert as convert_sunrgbd
from dynmm_tpu.data.prepare_nyuv2 import MAP_40_TO_13


# --------------------------------------------------------------- SUNRGBD
def _make_sunrgbd_raw(tmp_path, n=4):
    toolbox = tmp_path / "SUNRGBDtoolbox"
    data = tmp_path / "SUNRGBD"
    rng = np.random.default_rng(0)
    metas, labels = [], []
    cameras = ["kv1", "kv2", "xtion", "realsense"]
    for i in range(n):
        cam = cameras[i % len(cameras)]
        real = f"{cam}/set/sample{i:02d}"
        d = data / real
        (d / "image").mkdir(parents=True)
        (d / "depth_bfx").mkdir()
        (d / "depth").mkdir()
        rgb = rng.integers(0, 255, (12, 16, 3), dtype=np.uint8)
        depth = rng.integers(0, 60000, (12, 16), dtype=np.uint16)
        raw = rng.integers(0, 60000, (12, 16), dtype=np.uint16)
        cv2.imwrite(str(d / "image" / "img.jpg"),
                    rgb, [cv2.IMWRITE_JPEG_QUALITY, 100])
        cv2.imwrite(str(d / "depth_bfx" / "d.png"), depth)
        cv2.imwrite(str(d / "depth" / "d.png"), raw)
        label = rng.integers(0, 38, (12, 16)).astype(np.uint8)
        labels.append((depth, label))
        metas.append((f"/n/fs/sun3d/data/SUNRGBD/{real}/image/img.jpg",
                      "img.jpg", "d.png"))

    meta_arr = np.zeros((n,), dtype=[("rgbpath", "O"), ("rgbname", "O"),
                                     ("depthname", "O")])
    for i, m in enumerate(metas):
        meta_arr[i] = m
    (toolbox / "Metadata").mkdir(parents=True)
    (toolbox / "traintestSUNRGBD").mkdir()
    savemat(str(toolbox / "Metadata" / "SUNRGBDMeta.mat"),
            {"SUNRGBDMeta": meta_arr})
    # first half of the samples are train
    alltrain = np.array(
        ["/".join(metas[i][0].split("/")[:-2]) for i in range(n // 2)],
        dtype=object,
    )
    savemat(str(toolbox / "traintestSUNRGBD" / "allsplit.mat"),
            {"alltrain": alltrain})

    with h5py.File(str(toolbox / "Metadata" / "SUNRGBD2Dseg.mat"), "w") as f:
        g = f.create_group("SUNRGBD2Dseg")
        refs = []
        for i, (_, label) in enumerate(labels):
            ds = f.create_dataset(f"lab{i}", data=label.transpose(1, 0))
            refs.append(ds.ref)
        g.create_dataset(
            "seglabel", data=np.array(refs, dtype=h5py.ref_dtype)[:, None]
        )
    return toolbox, data, labels


def test_sunrgbd_roundtrip(tmp_path):
    toolbox, data, labels = _make_sunrgbd_raw(tmp_path)
    out = tmp_path / "prepared"
    convert_sunrgbd(str(out), str(toolbox), str(data))

    for split, expect_n in (("train", 2), ("test", 2)):
        ds = SUNRGBDDataset(str(out), split=split)
        assert len(ds) == expect_n
        sample = ds[0]
        assert sample["image"].shape == (12, 16, 3)
        assert sample["depth"].shape == (12, 16)
        assert sample["label"].max() <= 37
    # refined depth + labels are pixel-exact (depth_bfx png copied losslessly)
    ds = SUNRGBDDataset(str(out), split="train")
    np.testing.assert_array_equal(
        ds.load_depth(0).astype(np.uint16), labels[0][0]
    )
    np.testing.assert_array_equal(ds.load_label(0), labels[0][1])
    # camera bookkeeping feeds the per-camera eval protocol
    assert ds.sample_cameras == ["kv1", "kv2"]
    with ds.filter_camera("kv2"):
        assert len(ds) == 1


# ------------------------------------------------------------- Cityscapes
def _make_cityscapes_raw(tmp_path, n=3):
    root = tmp_path / "raw"
    rng = np.random.default_rng(1)
    recorded = []
    for i, split in enumerate(["train", "val", "test"][:n]):
        base = f"city_{i:06d}_000019"
        for sub, suffix in [("leftImg8bit", "leftImg8bit.png"),
                            ("disparity", "disparity.png"),
                            ("camera", "camera.json"),
                            ("gtFine", "gtFine_labelIds.png")]:
            (root / sub / split / "city").mkdir(parents=True, exist_ok=True)
        rgb = rng.integers(0, 255, (10, 20, 3), dtype=np.uint8)
        disp = rng.integers(0, 30000, (10, 20), dtype=np.uint16)
        label = rng.choice([0, 7, 23, 26, 33], size=(10, 20)).astype(np.uint8)
        cv2.imwrite(str(root / "leftImg8bit" / split / "city" /
                        f"{base}_leftImg8bit.png"), rgb)
        cv2.imwrite(str(root / "disparity" / split / "city" /
                        f"{base}_disparity.png"), disp)
        cv2.imwrite(str(root / "gtFine" / split / "city" /
                        f"{base}_gtFine_labelIds.png"), label)
        cam = {"extrinsic": {"baseline": 0.22}, "intrinsic": {"fx": 2262.52}}
        with open(root / "camera" / split / "city" /
                  f"{base}_camera.json", "w") as f:
            json.dump(cam, f)
        recorded.append((split, base, disp, label, cam))
    return root, recorded


def test_cityscapes_roundtrip(tmp_path):
    root, recorded = _make_cityscapes_raw(tmp_path)
    out = tmp_path / "prepared"
    convert_cityscapes(str(out), str(root))

    split_raw, base, disp, label, cam = recorded[0]
    ds = CityscapesDataset(str(out), split="train", depth_mode="raw")
    assert len(ds) == 1
    np.testing.assert_array_equal(
        ds.load_depth(0).astype(np.uint16), disp
    )
    np.testing.assert_array_equal(
        ds.load_label(0), CLASS_MAPPING_REDUCED[label.astype(np.int32)]
    )
    # 33-class variant keeps the original ids
    ds33 = CityscapesDataset(str(out), split="train", depth_mode="raw",
                             n_classes=33)
    np.testing.assert_array_equal(ds33.load_label(0), label)
    # metric depth derivation
    ds_m = CityscapesDataset(str(out), split="train", depth_mode="refined")
    got = ds_m.load_depth(0)
    want = disparity_to_depth(
        disp, cam["extrinsic"]["baseline"], cam["intrinsic"]["fx"]
    ).astype(np.float16).astype(np.float32)
    np.testing.assert_allclose(got, want, rtol=1e-3)
    # 'val' renamed 'valid'
    assert os.path.exists(out / "valid.txt")


def test_cityscapes_mapping_table():
    """Spot checks against the cityscapesscripts trainId semantics."""
    assert CLASS_MAPPING_REDUCED[0] == 0      # unlabeled -> void
    assert CLASS_MAPPING_REDUCED[7] == 1      # road
    assert CLASS_MAPPING_REDUCED[23] == 11    # sky
    assert CLASS_MAPPING_REDUCED[26] == 14    # car
    assert CLASS_MAPPING_REDUCED[33] == 19    # bicycle
    assert CLASS_MAPPING_REDUCED[9] == 0      # parking (ignoreInEval)
    assert (CLASS_MAPPING_REDUCED <= 19).all()


def test_nyuv2_class13_table():
    """40→13 table matches the reference's class13Mapping.mat contents."""
    assert MAP_40_TO_13.shape == (41,)
    assert MAP_40_TO_13[0] == 0
    # wall(1)->12, floor(2)->5, bed(4)->1, ceiling(22)->3, tv(25)->11
    assert MAP_40_TO_13[1] == 12
    assert MAP_40_TO_13[2] == 5
    assert MAP_40_TO_13[4] == 1
    assert MAP_40_TO_13[22] == 3
    assert MAP_40_TO_13[25] == 11
    assert MAP_40_TO_13.max() == 13
