"""Model factory + data preparation for the segmentation CLIs — equivalents
of ``FusionDynMM/src/build_model.py:18-218`` and ``src/prepare_data.py:18-163``.
"""

from __future__ import annotations

import numpy as np

from dynmm_tpu.cli.seg_args import decoder_channels, nr_decoder_blocks
from dynmm_tpu.data.nyuv2 import NYUv2Dataset, SyntheticSegDataset
from dynmm_tpu.data.seg_preprocessing import SegLoader, SegPreprocessor
from dynmm_tpu.models.esanet import ESANet, ESANetConfig
from dynmm_tpu.models.one_modality import ESANetOneModality
from dynmm_tpu.models.skip_gate import SkipGateESANet
from dynmm_tpu.models.skip_local import SkipESANet


def build_config(args, n_classes: int) -> ESANetConfig:
    encoder_depth = args.encoder_depth
    if encoder_depth in (None, "None"):
        encoder_depth = args.encoder
    import jax.numpy as jnp

    dtype = jnp.bfloat16 if getattr(args, "dtype", "float32") == "bfloat16" else None
    return ESANetConfig(
        height=args.height,
        width=args.width,
        num_classes=n_classes,
        encoder_rgb=args.encoder,
        encoder_depth=encoder_depth,
        encoder_block=args.encoder_block,
        channels_decoder=decoder_channels(args),
        nr_decoder_blocks=nr_decoder_blocks(args),
        activation=args.activation,
        encoder_decoder_fusion=args.encoder_decoder_fusion,
        context_module=args.context_module,
        fuse_depth_in_rgb_encoder=args.fuse_depth_in_rgb_encoder,
        upsampling=args.upsampling,
        dtype=dtype,
        quant=(getattr(args, "quant", "none")
               if getattr(args, "quant", "none") != "none" else None),
    )


def build_model(args, n_classes: int):
    """→ model instance (flax module). Mirrors build_model.py dispatch:
    --dynamic --global-gate → SkipGateESANet; --dynamic → SkipESANet;
    else ESANet (rgbd) / ESANetOneModality (rgb|depth)."""
    cfg = build_config(args, n_classes)
    if args.dynamic:
        block_rule = tuple(int(s) for s in args.block_rule)
        assert len(block_rule) == 4
        if args.global_gate:
            return SkipGateESANet(cfg)
        if cfg.quant is not None:
            raise NotImplementedError(
                "--quant supports global-gate / static models only")
        return SkipESANet(cfg, block_rule=block_rule)
    if args.modality == "rgbd":
        return ESANet(cfg)
    input_channels = 3 if args.modality == "rgb" else 1
    return ESANetOneModality(
        cfg,
        input_channels=input_channels,
        weighting_in_encoder=args.fuse_depth_in_rgb_encoder,
    )


def make_dataset(args, split: str):
    if args.dataset == "nyuv2":
        return NYUv2Dataset(
            args.dataset_dir,
            split=split,
            depth_mode="raw" if args.raw_depth else "refined",
        )
    if args.dataset == "synthetic":
        n_train = getattr(args, "synthetic_n", 16)
        return SyntheticSegDataset(
            n=n_train if split == "train" else max(1, n_train // 2),
            height=args.height,
            width=args.width,
            split=split,
            mixed_modality_frac=getattr(args, "synthetic_mixed_frac", 0.0),
        )
    from dynmm_tpu.data.other_datasets import DATASETS

    if args.dataset in DATASETS:
        return DATASETS[args.dataset](
            args.dataset_dir,
            split=split,
            depth_mode="raw" if args.raw_depth else "refined",
        )
    raise NotImplementedError(f"Unknown dataset {args.dataset}")


def prepare_data(args, with_input_orig: bool = False):
    """(train_loader, valid_loader) — mirrors prepare_data.py semantics:
    train shuffles and drops the ragged tail; valid uses a (possibly larger)
    batch and keeps order."""
    train_ds = make_dataset(args, "train")
    valid_ds = make_dataset(args, "test")
    from jax._src import xla_bridge as _xb

    # multi-host: each process loads only its own devices' rows; the
    # trainer assembles global batches with make_global_batch
    # (jax.make_array_from_process_local_data — SURVEY §5.8). Only probe
    # process_count when the backend is already up (a multi-host launcher
    # will have called jax.distributed.initialize before prepare_data);
    # probing would otherwise initialize jax before the CLI imports torch.
    if _xb.backends_are_initialized():
        import jax

        if jax.process_count() > 1:
            from dynmm_tpu.parallel import ProcessShard

            train_ds = ProcessShard(train_ds)
            valid_ds = ProcessShard(valid_ds)
    depth_mean = getattr(train_ds, "depth_mean", 0.0)
    depth_std = getattr(train_ds, "depth_std", 1.0)
    depth_mode = "raw" if args.raw_depth else "refined"

    train_pre = SegPreprocessor(
        depth_mean, depth_std, args.height, args.width, phase="train",
        depth_mode=depth_mode,
        scale_range=(args.aug_scale_min, args.aug_scale_max),
    )
    valid_pre = SegPreprocessor(
        depth_mean, depth_std, args.height, args.width, phase="test",
        depth_mode=depth_mode,
    )
    batch_valid = args.batch_size_valid or args.batch_size
    # --packed_stem: space-to-depth pack in the prefetch thread so the
    # host copy overlaps the device step (validation keeps loop-side
    # packing — eval noise must be injected on the RAW layout first so
    # seeded noise draws are identical with and without packing)
    post = None
    if getattr(args, "packed_stem", False):
        from dynmm_tpu.data.seg_preprocessing import pack_stem_batch

        post = pack_stem_batch
    train_loader = SegLoader(
        train_ds, train_pre, batch_size=args.batch_size, shuffle=True,
        drop_last=True, post=post,
    )
    valid_loader = SegLoader(valid_ds, valid_pre, batch_size=batch_valid)
    if getattr(args, "valid_full_res", False):
        # third loader evaluating at the dataset's native resolution
        # (prepare_data.py:117-161; the reference uses it for cityscapes)
        full_res_pre = SegPreprocessor(
            depth_mean, depth_std, None, None, phase="test",
            depth_mode=depth_mode,
        )
        valid_full = SegLoader(
            make_dataset(args, "test"), full_res_pre, batch_size=batch_valid
        )
        return train_loader, valid_loader, valid_full
    return train_loader, valid_loader


def compute_depth_stats(dataset, depth_mode: str = "refined") -> dict:
    """Train-split depth mean/std (dataset_base.py:210-263): raw mode
    excludes invalid zero pixels from the statistics."""
    pixel_sum, pixel_nr = 0.0, 0
    for i in range(len(dataset)):
        depth = dataset[i]["depth"] if isinstance(dataset[i], dict) else dataset.load_depth(i)
        valid = depth[depth > 0] if depth_mode == "raw" else depth.reshape(-1)
        pixel_sum += float(valid.sum())
        pixel_nr += valid.size
    mean = pixel_sum / max(pixel_nr, 1)
    sq_sum = 0.0
    for i in range(len(dataset)):
        depth = dataset[i]["depth"] if isinstance(dataset[i], dict) else dataset.load_depth(i)
        valid = depth[depth > 0] if depth_mode == "raw" else depth.reshape(-1)
        sq_sum += float(np.square(valid - mean).sum())
    std = float(np.sqrt(sq_sum / max(pixel_nr, 1)))
    return {"mean": mean, "std": std}


def compute_class_weights(dataset, n_classes: int, mode: str, c: float = 1.02):
    """Class weights over a map-style dataset (dataset_base.py:147-208):
    linear = pixel counts; median_frequency = median(freq)/freq with freq =
    pixels_of_class / pixels_of_images_containing_class; logarithmic =
    1/log(c + p)."""
    n_pixels = np.zeros(n_classes + 1)
    n_image_pixels_with_class = np.zeros(n_classes + 1)
    for i in range(len(dataset)):
        label = dataset[i]["label"] if isinstance(dataset[i], dict) else dataset.load_label(i)
        h, w = label.shape
        dist = np.bincount(label.flatten(), minlength=n_classes + 1)[: n_classes + 1]
        n_pixels += dist
        n_image_pixels_with_class += (dist > 0) * h * w
    n_pixels = n_pixels[1:]
    n_image_pixels_with_class = n_image_pixels_with_class[1:]
    if mode == "linear":
        return n_pixels
    if mode == "median_frequency":
        freq = n_pixels / np.maximum(n_image_pixels_with_class, 1)
        freq = np.where(freq > 0, freq, np.nan)
        w = np.nanmedian(freq) / freq
        return np.nan_to_num(w, nan=1.0)
    if mode == "logarithmic":
        p = n_pixels / n_pixels.sum()
        return 1.0 / np.log(c + p)
    if mode == "None":
        return np.ones(n_classes)
    raise ValueError(mode)
