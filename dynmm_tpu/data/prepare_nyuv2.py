#!/usr/bin/env python
"""Offline NYUv2 conversion: ``nyu_depth_v2_labeled.mat`` (+ ``splits.mat``,
``classMapping40.mat``) → the prepared png directory layout consumed by
``NYUv2Dataset``.

Mirrors the semantics of the reference converter
(``FusionDynMM/src/datasets/nyuv2/prepare_dataset.py:105-284``): transpose the
mat's (C, W, H) image layout to (H, W, C); depth meters → millimeters uint16;
894-class labels mapped to 40 via ``classMapping40.mat``'s ``mapClass`` (with
0 kept as void); train/test split indices from ``splits.mat`` (1-based).

Usage:
    python -m dynmm_tpu.data.prepare_nyuv2 <output_dir> \
        --mat nyu_depth_v2_labeled.mat --splits splits.mat \
        --class-mapping classMapping40.mat
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def convert(output_dir: str, mat_path: str, splits_path: str,
            mapping_path: str) -> None:
    import cv2
    import h5py
    from scipy.io import loadmat

    splits = loadmat(splits_path)
    train_ids = splits["trainNdxs"][:, 0] - 1
    test_ids = splits["testNdxs"][:, 0] - 1

    mapping = loadmat(mapping_path)
    map_894_to_40 = np.concatenate([[0], mapping["mapClass"][0]]).astype(np.uint8)

    with h5py.File(mat_path, "r") as f:
        images = np.asarray(f["images"])      # (N, 3, W, H)
        depths = np.asarray(f["depths"])      # (N, W, H) meters
        labels = np.asarray(f["labels"])      # (N, W, H) 0..894
        raw_depths = np.asarray(f["rawDepths"]) if "rawDepths" in f else None

    for split, ids in (("train", train_ids), ("test", test_ids)):
        for sub in ("rgb", "depth", "depth_raw", "labels_40"):
            os.makedirs(os.path.join(output_dir, split, sub), exist_ok=True)
        names = []
        for i in ids:
            name = f"{i:04d}"
            names.append(name)
            rgb = np.transpose(images[i], (2, 1, 0))  # HWC
            cv2.imwrite(
                os.path.join(output_dir, split, "rgb", f"{name}.png"),
                cv2.cvtColor(rgb, cv2.COLOR_RGB2BGR),
            )
            depth_mm = (np.transpose(depths[i], (1, 0)) * 1000.0).astype(np.uint16)
            cv2.imwrite(
                os.path.join(output_dir, split, "depth", f"{name}.png"), depth_mm
            )
            if raw_depths is not None:
                raw_mm = (np.transpose(raw_depths[i], (1, 0)) * 1000.0).astype(np.uint16)
                cv2.imwrite(
                    os.path.join(output_dir, split, "depth_raw", f"{name}.png"),
                    raw_mm,
                )
            label_894 = np.transpose(labels[i], (1, 0)).astype(np.int32)
            label_40 = map_894_to_40[label_894]
            cv2.imwrite(
                os.path.join(output_dir, split, "labels_40", f"{name}.png"),
                label_40,
            )
        with open(os.path.join(output_dir, f"{split}.txt"), "w") as f:
            f.write("\n".join(names) + "\n")
        print(f"{split}: {len(names)} samples")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("output_dir")
    ap.add_argument("--mat", default="nyu_depth_v2_labeled.mat")
    ap.add_argument("--splits", default="splits.mat")
    ap.add_argument("--class-mapping", default="classMapping40.mat")
    args = ap.parse_args()
    convert(args.output_dir, args.mat, args.splits, args.class_mapping)


if __name__ == "__main__":
    main()
