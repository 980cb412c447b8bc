#!/usr/bin/env python
"""Segmentation evaluation CLI — public surface mirrors the reference
``FusionDynMM/eval.py``:

    python eval.py --dynamic --global-gate --hard --ckpt_path ...
    python eval.py --dynamic --global-gate --baseline --hard --ckpt_path ...
    python eval.py ... --num_runs 10 --mode 0|1|2 --noise 0.3   # robustness

Per run r the RNG is reseeded with r (eval.py:78-79); Gaussian noise is
injected per batch with probability 1/3 scaled by noise·mean(|x|)
(eval.py:91-102). Reports mean±std mIoU over runs.
"""

from __future__ import annotations

import argparse

import numpy as np


def main():
    from dynmm_tpu.utils.platform import maybe_force_cpu, setup_compilation_cache
    maybe_force_cpu()
    setup_compilation_cache()
    import jax

    from dynmm_tpu.cli.seg_args import ArgumentParserRGBDSegmentation
    from dynmm_tpu.cli.seg_build import build_model, prepare_data
    from dynmm_tpu.core.resource import GateStats
    from dynmm_tpu.models.skip_gate import flop_table
    from dynmm_tpu.train.seg import SegTrainConfig, SegTrainer

    parser = ArgumentParserRGBDSegmentation(
        description="Efficient RGBD Indoor Semantic Segmentation (Evaluation, TPU)",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    parser.set_common_args()
    parser.add_argument("--ckpt_path", required=True, type=str,
                        help="Path to the checkpoint of the trained model "
                             "(.msgpack native or .pth torch).")
    parser.add_argument("--hard", action="store_true",
                        help="use hard gates during inference time")
    parser.add_argument("--mode", type=int, default=-1,
                        help="-1: no noise, 0: rgb, 1: depth, 2: both")
    parser.add_argument("--num_runs", "--num-runs", type=int, default=1)
    parser.add_argument("--noise", type=float, default=0.0)
    parser.add_argument("--ini", action="store_true")
    parser.add_argument("--per_class_iou", "--per-class-iou",
                        action="store_true",
                        help="print the per-class IoU table of the last run")
    parser.add_argument(
        "--output_res", default="full", choices=("full", "quarter"),
        help="'quarter' scores the quarter-res serving chain (predict.py "
        "--output_res quarter): argmax the native H/4 logits, nearest-"
        "resize the class map to label resolution. Quantifies the accuracy "
        "cost of the 2x-faster serving knob; 'full' is the reference-parity "
        "chain (full-res logits -> bilinear resize -> argmax).",
    )
    parser.add_argument(
        "--capacity_factor", type=float, default=0.0,
        help="> 0 scores the STRICT capacity-factor serving mode (bench's "
        "*_strict candidates): branch ratios are estimated on "
        "--calib_batches clean batches (skip_gate.gate_only), each depth "
        "stage then runs at a single static capacity ceil(bs*P(k>=i)*F) "
        "with MoE drop semantics — zero lax.cond boundaries; overflow "
        "samples lose that stage's depth contribution. Quantifies the "
        "accuracy cost of the throughput knob exactly like --output_res/"
        "--quant. Requires --dynamic --global-gate --hard. 1.25 is the "
        "benched point.",
    )
    args = parser.parse_args()
    if args.capacity_factor > 0 and not (
            args.dynamic and args.global_gate and args.hard
            and not args.baseline and args.modality == "rgbd"):
        parser.error("--capacity_factor requires --dynamic --global-gate "
                     "--hard (non-baseline, rgbd)")

    args.pretrained_on_imagenet = False
    _, data_loader, *extra_loaders = prepare_data(args, with_input_orig=True)
    if args.valid_full_res:
        # evaluate at the dataset's native resolution (reference eval.py:51-54)
        data_loader = extra_loaders[0]
    n_classes = data_loader.dataset.n_classes_without_void

    model = build_model(args, n_classes)
    cfg = SegTrainConfig(
        dynamic=args.dynamic,
        global_gate=args.global_gate,
        baseline=args.baseline,
        soft_eval=not args.hard,
        modality=args.modality,
        debug=args.debug,
        packed_stem=args.packed_stem,
        low_res_eval=args.output_res == "quarter",
    )
    trainer = SegTrainer(model, cfg, np.ones(n_classes, np.float32))

    sample = next(iter(data_loader))
    state = trainer.init_state(jax.random.PRNGKey(0), sample)
    from dynmm_tpu.utils.torch_import import load_any_checkpoint

    state["params"], state["model_state"] = load_any_checkpoint(
        args.ckpt_path, model, state["params"], state["model_state"]
    )
    print(f"Loaded checkpoint from {args.ckpt_path}")

    if getattr(args, "quant", "none") == "int8":
        # abs-max PTQ calibration on clean batches, then score the int8
        # twin — the accuracy knob is quantified exactly like --dtype /
        # --output_res (same checkpoint, same metric chain)
        import dataclasses

        calib_model = model.clone(
            cfg=dataclasses.replace(model.cfg, quant="calib", dtype=None))
        from dynmm_tpu.utils.quantize import pack_weights

        qcoll = trainer.calibrate_quant(
            calib_model, state, data_loader, n_batches=args.calib_batches,
            estimator=args.calib_estimator,
            percentile=args.calib_percentile)
        packed = pack_weights({"params": state["params"], "quant": qcoll})
        state["params"] = packed["params"]
        state["model_state"] = {**state["model_state"],
                                "quant": packed["quant"]}
        print(f"Calibrated int8 scales on {args.calib_batches} batches "
              f"({args.calib_estimator}"
              + (f" p{args.calib_percentile}"
                 if args.calib_estimator == "percentile" else "") + ")")

    if args.capacity_factor > 0:
        # estimate deployment branch ratios on clean batches (stems + gate
        # only), then rebuild the trainer with the strict capacity schedule
        # active — a fresh trainer so no cached exact-mode eval step leaks
        import dataclasses
        import itertools

        import jax.numpy as jnp

        from dynmm_tpu.models.skip_gate import capacity_ladders

        gate_fn = jax.jit(lambda v, r, d: model.apply(
            v, r, d, method=model.gate_only))
        variables = {"params": state["params"], **state["model_state"]}
        stats = GateStats()
        for b in itertools.islice(iter(data_loader), args.calib_batches):
            stats.append(gate_fn(variables, jnp.asarray(b["image"]),
                                 jnp.asarray(b["depth"])))
        ratios = stats.branch_ratios()
        sched = capacity_ladders(ratios, args.batch_size,
                                 capacity_factor=args.capacity_factor)
        print(f"capacity-factor serving: estimated ratios "
              f"{np.round(ratios, 3)}, strict schedule {sched} "
              f"(factor {args.capacity_factor})")
        cfg = dataclasses.replace(
            cfg, serve_capacity_factor=args.capacity_factor)
        trainer = SegTrainer(model, cfg, np.ones(n_classes, np.float32))
        trainer.serve_ratios = ratios

    result = np.zeros(args.num_runs)
    cms: dict = {}
    for r in range(args.num_runs):
        stats = GateStats() if args.dynamic else None
        cms = {}
        miou, _ = trainer.validate(
            state,
            data_loader,
            noise_mode=args.mode,
            noise=args.noise,
            run_seed=r,
            collect_weights=stats,
            ini_stage=args.ini,
            out_cms=cms,
        )
        camera = list(miou)[0]
        result[r] = miou[camera] * 100
        print(f"Run {r}, mIoU: {result[r]:0.2f}")
        if len(miou) > 1:  # multi-camera datasets: per-camera breakdown
            per_cam = " | ".join(f"{c}: {v*100:0.2f}" for c, v in miou.items())
            print(f"  per-camera mIoU  {per_cam}")
        if args.dynamic and args.global_gate and stats is not None and stats.weights.size:
            table = flop_table(args.encoder, "depth_enc")
            total = flop_table(args.encoder, "total")
            print(
                f"  branch ratios {np.round(stats.branch_ratios(), 3)} | "
                f"Depth Encoder Flop {stats.selection_flops(table):.4f}G | "
                f"Total Flop {stats.selection_flops(total):.4f}G"
            )
    print(result)
    print(f"Mean {result.mean():.2f}, Std {result.std():.2f}")
    if args.per_class_iou and cms:
        from dynmm_tpu.train.metrics import ConfusionMatrix

        names = getattr(
            data_loader.dataset, "class_names",
            [f"class_{i}" for i in range(n_classes)],
        )
        total = ConfusionMatrix(n_classes)
        for m in cms.values():
            total.matrix += m
        print("per-class IoU (last run, all cameras):")
        for name, v in zip(names, total.iou()):
            print(f"  {name:<20} {v*100:6.2f}")


if __name__ == "__main__":
    main()
