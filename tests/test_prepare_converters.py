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


# ----------------------------------------------------------- SceneNetRGBD
def _pb_varint(n):
    out = b""
    while True:
        b7 = n & 0x7F
        n >>= 7
        out += bytes([b7 | (0x80 if n else 0)])
        if not n:
            return out


def _pb_field(fnum, payload):
    """Length-delimited field (wire type 2)."""
    return _pb_varint((fnum << 3) | 2) + _pb_varint(len(payload)) + payload


def _pb_int(fnum, val):
    return _pb_varint(fnum << 3) + _pb_varint(val)


def _encode_trajectories(trajs):
    """Encode [(render_path, [(iid, wnid, itype)], [frame_nums])] as a
    scenenet.proto Trajectories message."""
    msg = b""
    for render_path, instances, frames in trajs:
        t = b""
        for iid, wnid, itype in instances:
            inst = _pb_int(1, iid) + _pb_field(2, wnid.encode()) \
                + _pb_int(4, itype)
            t += _pb_field(2, inst)
        for fn in frames:
            t += _pb_field(3, _pb_int(1, fn))
        t += _pb_field(4, render_path.encode())
        msg += _pb_field(1, t)
    return msg


def _make_scenenet_raw(tmp_path):
    from dynmm_tpu.data.prepare_scenenet import parse_trajectories

    root = tmp_path / "scenenet_raw"
    rng = np.random.default_rng(2)
    recorded = {}
    # trajectory '0/123': background + chair(03001627->4) + bed(02920259->1)
    # trajectory '0/999': instance png indexes past the instance list -> the
    # reference discards the whole trajectory
    for split_dir, pb_name, paths in [
        ("train", "scenenet_rgbd_train_0.pb", ["0/123", "0/999"]),
        ("val", "scenenet_rgbd_val.pb", ["1/7"]),
    ]:
        trajs = []
        for rp in paths:
            d = root / split_dir / rp
            for sub in ("photo", "depth", "instance"):
                (d / sub).mkdir(parents=True)
            frames = [0, 25]
            hi = 3 if rp == "0/999" else 2  # 3 exceeds the instance list
            for fn in frames:
                rgb = rng.integers(0, 255, (8, 12, 3), dtype=np.uint8)
                depth = rng.integers(0, 9000, (8, 12), dtype=np.uint16)
                inst = rng.integers(0, hi + 1, (8, 12)).astype(np.uint8)
                inst[0, 0] = hi
                cv2.imwrite(str(d / "photo" / f"{fn}.jpg"), rgb)
                cv2.imwrite(str(d / "depth" / f"{fn}.png"), depth)
                cv2.imwrite(str(d / "instance" / f"{fn}.png"), inst)
                recorded[(rp, fn)] = (depth, inst)
            trajs.append(
                (rp,
                 [(0, "", 1), (1, "03001627", 2), (2, "02920259", 4)],
                 frames)
            )
        payload = _encode_trajectories(trajs)
        (root / pb_name).write_bytes(payload)
        # the wire-format reader inverts the encoder exactly
        parsed = parse_trajectories(payload)
        assert [t.render_path for t in parsed] == paths
        assert parsed[0].instances[1].semantic_wordnet_id == "03001627"
        assert [v.frame_num for v in parsed[0].views] == [0, 25]
    return root, recorded


def test_scenenet_roundtrip(tmp_path):
    from dynmm_tpu.data.other_datasets import SceneNetRGBDDataset
    from dynmm_tpu.data.prepare_scenenet import convert as convert_scenenet

    root, recorded = _make_scenenet_raw(tmp_path)
    out = tmp_path / "prepared"
    counts = convert_scenenet(str(out), str(root), n_views_train=2,
                              n_views_test=2)
    # bad trajectory 0/999 dropped entirely; 0/123 contributes both views
    assert counts == {"train": 2, "test": 2}

    ds = SceneNetRGBDDataset(str(out), split="train")
    assert len(ds) == 2
    assert all(i.startswith("0_123_") for i in ds.ids)
    idx = ds.ids.index("0_123_0")
    depth, inst = recorded[("0/123", 0)]
    np.testing.assert_array_equal(ds.load_depth(idx).astype(np.uint16), depth)
    # label = instance -> {0: void, 1: chair=4, 2: bed=1}
    expect = np.array([0, 4, 1], np.uint8)[inst]
    np.testing.assert_array_equal(ds.load_label(idx), expect)
    sample = ds[idx]
    assert sample["image"].shape == (8, 12, 3)
    assert sample["label"].max() <= 13


def test_scenenet_min_classes_filter(tmp_path):
    from dynmm_tpu.data.prepare_scenenet import convert as convert_scenenet

    root, _ = _make_scenenet_raw(tmp_path)
    out = tmp_path / "prepared_minclass"
    # every synthetic view has 3 distinct classes; demanding 4 keeps none
    counts = convert_scenenet(str(out), str(root), n_views_train=2,
                              n_views_test=2, min_classes_in_view=4)
    assert counts == {"train": 0, "test": 0}
