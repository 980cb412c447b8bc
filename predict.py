#!/usr/bin/env python
"""Batch inference CLI: run a trained fusion-level DynMM over a directory of
RGB-D samples (prepared-dataset layout) and write colored segmentation maps
plus a routing/throughput report.

The serving-side complement to train.py/eval.py (the reference has no serving
entry point; its closest analogue is the samples loop in eval.py):

    python predict.py --ckpt_path ckpt.msgpack --dataset_dir datasets/nyuv2 \
        --split test --out_dir preds/ [--num 16] [--dtype bfloat16] [--quant int8]
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np


def main():
    from dynmm_tpu.utils.platform import maybe_force_cpu, setup_compilation_cache

    maybe_force_cpu()
    setup_compilation_cache()
    import jax
    import jax.numpy as jnp

    from dynmm_tpu.cli.seg_args import ArgumentParserRGBDSegmentation
    from dynmm_tpu.cli.seg_build import build_model, make_dataset
    from dynmm_tpu.core.resource import GateStats
    from dynmm_tpu.data.nyuv2 import class_colors
    from dynmm_tpu.data.seg_preprocessing import SegLoader, SegPreprocessor
    from dynmm_tpu.models.skip_gate import flop_table
    from dynmm_tpu.nn.layers import first_argmax
    from dynmm_tpu.utils.torch_import import load_any_checkpoint

    parser = ArgumentParserRGBDSegmentation(
        description="Batch RGB-D segmentation inference (TPU)",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    parser.set_common_args()
    parser.add_argument("--ckpt_path", required=True)
    parser.add_argument("--split", default="test")
    parser.add_argument("--out_dir", default="./preds")
    parser.add_argument("--num", type=int, default=0, help="limit sample count")
    parser.add_argument(
        "--export_path", default="",
        help="serialize the serving forward (weights baked in) to this "
        "path as a StableHLO artifact (jax.export) and exit — the "
        "TPU-native deploy analogue of the reference's ONNX export patches",
    )
    parser.add_argument(
        "--export_platforms", default="",
        help="comma-separated jax.export platforms for --export_path "
        "(e.g. 'tpu,cpu' builds a TPU-servable artifact from a CPU "
        "host); default: the current backend only",
    )
    parser.add_argument(
        "--serve_mode", default="batchmax",
        choices=("batchmax", "dense", "compact", "switch", "switch_host"),
        help="execution strategy (docs/DESIGN.md measured economics): "
        "batchmax = batch-adaptive depth skipping; dense = static graph, "
        "hard gate weights; compact = per-sample bucket compaction "
        "(forward_routed_compact); switch = real per-stage skipping, "
        "batch_size 1 only; switch_host = two-phase host dispatch (tiny "
        "gate program resolves k on the host, then one of 5 fully STATIC "
        "path programs runs — zero cond boundaries), batch_size 1 only",
    )
    parser.add_argument(
        "--output_res", default="full", choices=("full", "quarter"),
        help="'quarter' serves the decoder's native H/4 logits (skipping "
        "the two 40-channel x2 learned upsamples, the tail's dominant HBM "
        "traffic), argmaxes at H/4 and nearest-upsamples the tiny uint8 "
        "class map on the host. Faster; class boundaries are nearest- "
        "rather than learned-upsampled (accuracy knob, documented in "
        "docs/DESIGN.md). 'full' matches the reference's eval chain.",
    )
    parser.add_argument(
        "--capacity_factor", type=float, default=0.0,
        help="with --serve_mode compact: > 0 serves the STRICT capacity-"
        "factor schedule (MoE drop semantics, zero lax.cond boundaries) — "
        "branch ratios estimated on --calib_batches batches, stage i runs "
        "at ceil(bs*P(k>=i)*F). Score the accuracy cost with eval.py "
        "--capacity_factor. 0 keeps the exact (0, bs/2, bs) ladder.",
    )
    args = parser.parse_args()
    if args.capacity_factor > 0 and args.serve_mode != "compact":
        parser.error("--capacity_factor applies to --serve_mode compact")
    args.dynamic = True
    args.global_gate = True

    ds = make_dataset(args, args.split)
    n_classes = ds.n_classes_without_void
    pre = SegPreprocessor(
        getattr(ds, "depth_mean", 0.0), getattr(ds, "depth_std", 1.0),
        args.height, args.width, phase="test",
    )
    post = None
    if (args.packed_stem and args.height % 2 == 0 and args.width % 2 == 0):
        # pack in the prefetch thread (overlapped with the device step)
        from dynmm_tpu.data.seg_preprocessing import pack_stem_batch

        post = pack_stem_batch
    loader = SegLoader(ds, pre, batch_size=args.batch_size, post=post)
    model = build_model(args, n_classes)

    sample = next(iter(loader))
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.asarray(sample["image"][:1]),
        jnp.asarray(sample["depth"][:1]),
        train=False,
    )
    params, model_state = load_any_checkpoint(
        args.ckpt_path, model, variables["params"],
        {k: v for k, v in variables.items() if k != "params"},
    )
    variables = {"params": params, **model_state}
    print(f"Loaded checkpoint from {args.ckpt_path}")

    if getattr(args, "quant", "none") == "int8":
        # abs-max PTQ calibration on clean preprocessed batches (packed
        # exactly like the serving feed), then serve the int8 twin
        import dataclasses

        from dynmm_tpu.utils.quantize import (calibrate, pack_weights,
                                              select_scales)

        calib_model = model.clone(
            cfg=dataclasses.replace(model.cfg, quant="calib", dtype=None))

        def _calib_batches():
            for i, b in enumerate(loader):
                if i >= args.calib_batches:
                    break
                yield (jnp.asarray(b["image"]), jnp.asarray(b["depth"]))

        qcoll = select_scales(
            calibrate(calib_model, variables, _calib_batches(),
                      train=False, hard=True),
            estimator=args.calib_estimator,
            percentile=args.calib_percentile)
        variables = pack_weights({**variables, "quant": qcoll})
        print(f"Calibrated int8 scales on {args.calib_batches} batches "
              f"({args.calib_estimator})")

    if args.serve_mode in ("switch", "switch_host") and args.batch_size != 1:
        parser.error(f"--serve_mode {args.serve_mode} requires --batch_size 1 "
                     "(forward_switch routes the whole batch by sample 0)")
    if args.serve_mode == "switch_host" and args.export_path:
        parser.error("--serve_mode switch_host is a two-phase host-dispatch "
                     "pipeline (gate program + 5 path programs) and cannot "
                     "be exported as one artifact; export with --serve_mode "
                     "switch instead")
    serve_method = {
        "batchmax": model.forward_switch_batched,
        "dense": None,  # __call__ with hard one-hot weights (bit-equal)
        "compact": model.forward_routed_compact,
        "switch": model.forward_switch,
        "switch_host": model.forward_switch,  # via per-path static programs
    }[args.serve_mode]
    low_res = args.output_res == "quarter"
    if args.serve_mode == "switch_host":
        # Phase 1: a tiny gate program resolves k on the host. Phase 2: one
        # of 5 fully static path programs (Python-int force_path compiles
        # plain control flow — zero lax.cond boundaries, the bs=1 cond tax
        # measured ~0.38 ms in tools/perf_bs1_latency.py). Path programs
        # compile lazily on first use.
        def _gate_k(mdl, r, d):
            import jax.numpy as _jnp

            rs, ds = mdl._stems(r, d, False)
            w = mdl.gate_weights(rs, ds, hard=True)
            return _jnp.argmax(w[0]).astype(_jnp.int32), w

        gate_fn = jax.jit(
            lambda v, r, d: model.apply(v, r, d, method=_gate_k))
        path_fns = {
            kk: jax.jit(
                lambda v, r, d, kk=kk: model.apply(
                    v, r, d, force_path=kk, low_res=low_res,
                    method=model.forward_switch,
                )
            )
            for kk in range(5)
        }

        def fwd(v, r, d):
            k, w = gate_fn(v, r, d)
            return path_fns[int(k)](v, r, d), w
    elif args.serve_mode == "compact" and args.capacity_factor > 0:
        # strict capacity-factor serving: estimate the deployment's branch
        # ratios (stems + gate only), derive the single-rung schedule, and
        # compile the zero-cond compact forward with drop semantics
        import itertools

        from dynmm_tpu.core.resource import GateStats as _GS
        from dynmm_tpu.models.skip_gate import capacity_ladders

        gate_fn = jax.jit(lambda v, r, d: model.apply(
            v, r, d, method=model.gate_only))
        gstats = _GS()
        for b in itertools.islice(iter(loader), args.calib_batches):
            gstats.append(gate_fn(variables, jnp.asarray(b["image"]),
                                  jnp.asarray(b["depth"])))
        ratios = gstats.branch_ratios()
        print(f"capacity-factor serving: estimated ratios "
              f"{np.round(ratios, 3)}, strict schedule "
              f"{capacity_ladders(ratios, args.batch_size, capacity_factor=args.capacity_factor)}")

        # caps from the trace-time batch shape: tail batches retrace with
        # their own (smaller) static schedule instead of tripping the
        # rung <= bs assertion
        def _fwd(v, r, d):
            caps = capacity_ladders(
                ratios, r.shape[0], capacity_factor=args.capacity_factor)
            return model.apply(
                v, r, d, caps=caps, strict_caps=True, return_weight=True,
                low_res=low_res, method=model.forward_routed_compact,
            )

        fwd = jax.jit(_fwd)
    elif serve_method is None:
        fwd = jax.jit(
            lambda v, r, d: model.apply(
                v, r, d, train=False, hard=True, return_weight=True,
                low_res=low_res,
            )
        )
    else:
        fwd = jax.jit(
            lambda v, r, d: model.apply(
                v, r, d, return_weight=True, low_res=low_res,
                method=serve_method,
            )
        )

    if args.export_path:
        from dynmm_tpu.utils.serve_export import (export_serving_fn,
                                                  save_serving_artifact)

        h, w = args.height, args.width
        if post is not None:  # packed serving artifact expects packed feed
            h, w = h // 2, w // 2
            rgb_shape = (args.batch_size, h, w, 12)
            depth_shape = (args.batch_size, h, w, 4)
        else:
            rgb_shape = (args.batch_size, h, w, 3)
            depth_shape = (args.batch_size, h, w, 1)
        platforms = tuple(
            p for p in args.export_platforms.split(",") if p
        ) or None
        payload = export_serving_fn(
            lambda v, r, d: fwd(v, r, d)[0], variables,
            rgb_shape, depth_shape, platforms=platforms,
        )
        save_serving_artifact(args.export_path, payload)
        print(f"exported serving artifact ({len(payload)} bytes, "
              f"mode={args.serve_mode}, rgb={rgb_shape}) to "
              f"{args.export_path}")
        return

    colors = class_colors(n_classes + 1)
    os.makedirs(args.out_dir, exist_ok=True)
    stats = GateStats()
    n_done, t_model = 0, 0.0
    for batch in loader:
        t0 = time.perf_counter()
        image, depth = batch["image"], batch["depth"]
        logits, weight = fwd(
            variables, jnp.asarray(image), jnp.asarray(depth)
        )
        # first_argmax: the variadic argmax reduce costs +16.3 ms on the
        # bs=8 logits map in-graph vs +3.6 ms for this form
        # (tools/perf_argmax_net.py); same extraction as the eval step
        pred = np.asarray(first_argmax(logits, axis=-1))
        if low_res:  # nearest-upsample the tiny class map on the host
            scale = args.height // pred.shape[1]
            pred = pred.repeat(scale, axis=1).repeat(scale, axis=2)
        t_model += time.perf_counter() - t0
        stats.append(weight)
        for img in pred:
            colored = colors[img + 1]  # prediction class c = label c+1
            try:
                import cv2

                cv2.imwrite(
                    os.path.join(args.out_dir, f"pred_{n_done:05d}.png"),
                    colored[:, :, ::-1],
                )
            except Exception:
                np.save(os.path.join(args.out_dir, f"pred_{n_done:05d}.npy"), img)
            n_done += 1
            if args.num and n_done >= args.num:
                break
        if args.num and n_done >= args.num:
            break

    ratios = stats.branch_ratios()
    table = flop_table(args.encoder, "total")
    print(f"wrote {n_done} predictions to {args.out_dir}")
    print(f"path distribution: {np.round(ratios, 3)}")
    print(f"expected total GFLOPs/sample: {stats.expected_flops(table):.3f}")
    print(f"model throughput: {n_done / max(t_model, 1e-9):.2f} frames/sec "
          "(incl. host sync; see bench.py for on-device numbers)")


if __name__ == "__main__":
    main()
