#!/usr/bin/env python
"""Segmentation training CLI — public surface mirrors the reference
``FusionDynMM/train.py`` (same flags, same workflow):

    python train.py --dynamic --global-gate --loss-ratio 1e-4 \
                    --temp 1.0 --end-temp 0.001 --epoch-ini 0 --epoch-hard 500

The lr is scaled by batch_size/8 like the reference (train.py:43-49); args
are snapshotted to args.json + argsv.txt in the checkpoint dir (train.py:64-69).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import warnings
from datetime import datetime



def main():
    from dynmm_tpu.utils.platform import maybe_force_cpu, setup_compilation_cache
    maybe_force_cpu()
    setup_compilation_cache()
    from dynmm_tpu.cli.seg_args import ArgumentParserRGBDSegmentation
    from dynmm_tpu.cli.seg_build import (
        build_model,
        compute_class_weights,
        prepare_data,
    )
    from dynmm_tpu.train.seg import SegTrainConfig, SegTrainer

    parser = ArgumentParserRGBDSegmentation(
        description="Efficient RGBD Indoor Semantic Segmentation (Training, TPU)",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    parser.set_common_args()
    args = parser.parse_args()

    if getattr(args, "quant", "none") != "none":
        parser.error("--quant is a serving-time knob (eval.py/predict.py); "
                     "training stays float")

    if args.batch_size != 8:
        args.lr = args.lr * args.batch_size / 8
        warnings.warn(
            f"Adapting learning rate to {args.lr} because provided batch size "
            "differs from default batch size of 8."
        )

    training_starttime = datetime.now().strftime("%d_%m_%Y-%H_%M_%S-%f")
    ckpt_dir = os.path.join(
        args.results_dir, args.dataset, f"checkpoints_{training_starttime}"
    )
    os.makedirs(ckpt_dir, exist_ok=True)
    with open(os.path.join(ckpt_dir, "args.json"), "w") as f:
        json.dump(vars(args), f, sort_keys=True, indent=4)
    with open(os.path.join(ckpt_dir, "argsv.txt"), "w") as f:
        f.write(" ".join(sys.argv) + "\n")

    print("preparing data")
    # prepare_data returns a third full-res loader when --valid_full_res is
    # set (cli/seg_build.py); train validates at training res like the
    # reference, so the extra loader is accepted but unused here.
    train_loader, valid_loader, *_ = prepare_data(args)
    n_classes = train_loader.dataset.n_classes_without_void
    class_weights = compute_class_weights(
        train_loader.dataset, n_classes, args.class_weighting,
        args.c_for_logarithmic_weighting,
    )

    print("building model")
    model = build_model(args, n_classes)
    cfg = SegTrainConfig(
        epochs=args.epochs,
        lr=args.lr,
        optimizer=args.optimizer,
        momentum=args.momentum,
        weight_decay=args.weight_decay,
        batch_size=args.batch_size,
        loss_ratio=args.loss_ratio,
        flop_budget=args.flop_budget,
        temp=args.temp,
        end_temp=args.end_temp,
        epoch_ini=args.epoch_ini,
        epoch_hard=args.epoch_hard,
        eval_every=args.eval_every,
        save_every=args.save_every,
        baseline=args.baseline,
        freeze=args.freeze,
        soft_eval=args.soft_eval,
        dynamic=args.dynamic,
        global_gate=args.global_gate,
        grad_accum=args.grad_accum,
        modality=args.modality,
        debug=args.debug,
        packed_stem=args.packed_stem,
    )
    import jax

    mesh = None
    if jax.device_count() > 1 or args.mesh_data > 1 or args.mesh_model > 1:
        from dynmm_tpu.parallel import make_mesh

        mesh = make_mesh(args.mesh_data or None, args.mesh_model)
        print(f"Using device mesh {dict(mesh.shape)}")
    trainer = SegTrainer(model, cfg, class_weights, mesh=mesh)

    sample = next(iter(train_loader))
    state = trainer.init_state(jax.random.PRNGKey(0), sample)

    start_epoch, best_miou, best_miou_epoch = 0, 0.0, 0
    if args.last_ckpt:
        from dynmm_tpu.utils.checkpoint import load_ckpt

        state, epoch_last, best_miou, best_miou_epoch = load_ckpt(
            args.last_ckpt, state
        )
        start_epoch = epoch_last + 1
        print(f"=> loaded checkpoint '{args.last_ckpt}' (epoch {epoch_last})")
    if args.pretrained_scenenet:
        from dynmm_tpu.utils.torch_import import import_scenenet_pretrain

        state["params"], state["model_state"] = import_scenenet_pretrain(
            args.pretrained_scenenet, state["params"], state["model_state"],
            context_module=args.context_module,
        )
        print(f"Loaded pretrained SceneNet weights: {args.pretrained_scenenet}")
    if args.finetune:
        from dynmm_tpu.utils.torch_import import load_any_checkpoint

        state["params"], state["model_state"] = load_any_checkpoint(
            args.finetune, model, state["params"], state["model_state"]
        )
        print(f"Loaded weights for finetuning: {args.finetune}")
    if args.he_init:
        from dynmm_tpu.utils.init import apply_he_init

        state["params"] = apply_he_init(
            state["params"], jax.random.PRNGKey(42), n_classes
        )
        print("Applied He init.")

    if args.freeze and args.dynamic:
        print("Freeze everything but the soft gates")

    print("start training")
    trainer.fit(
        state,
        train_loader,
        valid_loader,
        ckpt_dir,
        start_epoch=start_epoch,
        best_miou=best_miou,
        best_miou_epoch=best_miou_epoch,
    )
    print("Training completed")


if __name__ == "__main__":
    main()
