#!/usr/bin/env python
"""Train/eval modality-level DynMM on MM-IMDB — mirrors
``ModalityDynMM/multimedia/imdb_dyn.py``: 2-branch router (text expert vs
image+text late fusion), gate MLP(4396,128,2), soft/hard gates, λ resource
loss (``--reg``); eval always forces hard gates and reports f1 + FLOPs +
branch-selection ratio."""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))


def main():
    from dynmm_tpu.utils.platform import maybe_force_cpu
    maybe_force_cpu()
    import jax
    import jax.numpy as jnp

    from dynmm_tpu.data.imdb import imdb_loaders, synthetic_imdb_loaders
    from dynmm_tpu.models.modality import IMDB_FLOPS_M, IMDBDynMMNet
    from dynmm_tpu.train.adapters import dynmm_adapter
    from dynmm_tpu.train.experts import inject_expert, load_expert
    from dynmm_tpu.train.supervised import SupervisedConfig, SupervisedTrainer
    from dynmm_tpu.utils.checkpoint import load_checkpoint, save_checkpoint

    ap = argparse.ArgumentParser(
        "imdb", formatter_class=argparse.ArgumentDefaultsHelpFormatter
    )
    ap.add_argument("--n-runs", type=int, default=1)
    ap.add_argument("--data", type=str, default="imdb")
    ap.add_argument("--n-epochs", type=int, default=50)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--wd", type=float, default=1e-2)
    ap.add_argument("--reg", type=float, default=0.1, help="reg loss weight (λ)")
    ap.add_argument("--freeze", action="store_true")
    ap.add_argument("--eval-only", action="store_true")
    ap.add_argument("--hard", action="store_true", help="hard gates in training")
    ap.add_argument("--no-pretrain", action="store_true")
    ap.add_argument("--infer-mode", type=int, default=0)
    ap.add_argument("--data-path", type=str, default="./data/multimodal_imdb.hdf5")
    ap.add_argument("--synthetic", action="store_true")
    ap.add_argument("--robust", action="store_true",
                    help="noise-robustness sweep over the test set")
    ap.add_argument("--measure", action="store_true",
                    help="measure inference latency (test_time harness)")
    ap.add_argument("--routed", action="store_true",
                    help="with --measure: time the bucket-compacted routed "
                         "forward (per-sample expert dispatch; results match "
                         "dense hard eval — tests/test_modality_routed.py)")
    args = ap.parse_args()

    if args.synthetic or not os.path.exists(args.data_path):
        print("using synthetic MM-IMDB data")
        loaders = synthetic_imdb_loaders(batch_size=128)
    else:
        loaders = imdb_loaders(args.data_path, batch_size=128)
    train_loader, valid_loader, test_loader = loaders

    log1, log2 = np.zeros((args.n_runs, 1)), np.zeros((args.n_runs, 3))
    for n in range(args.n_runs):
        model = IMDBDynMMNet()
        batch = next(iter(train_loader))
        variables = model.init(
            jax.random.PRNGKey(n), [jnp.asarray(x) for x in batch.inputs]
        )
        if not args.no_pretrain:
            for sub, path in (
                ("text_encoder", "./log/imdb/encoder_text.msgpack"),
                ("text_head", "./log/imdb/head_text.msgpack"),
                ("image_encoder", "./log/imdb/encoder_image.msgpack"),
                ("image_head", "./log/imdb/head_image.msgpack"),
                ("branch3", "./log/imdb/best_lf.msgpack"),
            ):
                if os.path.exists(path):
                    variables = inject_expert(variables, sub, load_expert(path))
                    print(f"loaded expert {path}")

        filename = os.path.join(
            "./log", args.data,
            f"DynMMNet_freeze{args.freeze}_reg_{args.reg}.msgpack",
        )
        cfg = SupervisedConfig(
            task="multilabel", objective="bce_with_logits",
            epochs=args.n_epochs, lr=args.lr, weight_decay=args.wd,
            additional_loss=True, lossw=args.reg, early_stop=True,
        )
        trainer = SupervisedTrainer(
            dynmm_adapter(model, temp=1.0, hard=args.hard,
                          infer_mode=args.infer_mode),
            cfg,
            trainable_pred=(lambda p: "gate" in p) if args.freeze else None,
        )
        state = trainer.init_state(variables)
        if not args.eval_only:
            state, _ = trainer.fit(state, train_loader, valid_loader)
            save_checkpoint(filename, {
                "params": state["params"], "model_state": state["model_state"],
            }, epoch=0)
        elif os.path.exists(filename):
            payload = load_checkpoint(filename, {
                "params": state["params"], "model_state": state["model_state"],
            })
            state.update(payload["state"])

        print(f"Testing model {filename}:")
        hard_trainer = SupervisedTrainer(
            dynmm_adapter(model, temp=1.0, hard=True,
                          infer_mode=args.infer_mode),
            cfg,
        )
        hard_trainer.tx = trainer.tx
        metrics = hard_trainer.evaluate(state, test_loader, collect_weights=True)
        stats = metrics["gate_stats"]
        ratio = stats.branch_ratios()[1] if stats.weights.size else 0.0
        flops = stats.expected_flops(IMDB_FLOPS_M) if stats.weights.size else 0.0
        print(
            f"f1_micro: {metrics['f1_micro']*100:.2f} | "
            f"f1_macro: {metrics['f1_macro']*100:.2f} | "
            f"Total Flops {flops:.2f}M | branch ratio {ratio:.3f}"
        )
        log1[n] = ratio
        log2[n] = metrics["f1_micro"], metrics["f1_macro"], flops

        if args.robust:
            from dynmm_tpu.train.robustness import (
                relative_robustness, robustness_sweep)

            curves = robustness_sweep(
                lambda l: hard_trainer.evaluate(state, l),
                test_loader,
                {"text": [0], "image": [1], "both": [0, 1]},
            )
            for mod, curve in curves.items():
                rr = relative_robustness(curve["f1_macro"])
                print(f"robustness ({mod}): f1_macro curve "
                      f"{[round(v, 3) for v in curve['f1_macro']]} | "
                      f"relative robustness {rr:.3f}")
        if args.measure:
            import jax as _jax
            from dynmm_tpu.utils.profiling import test_time

            variables = {"params": state["params"], **state["model_state"]}
            if args.routed:
                fwd = _jax.jit(lambda b: model.apply(
                    variables, b["inputs"],
                    method=model.forward_routed_compact)[0])
            else:
                fwd = _jax.jit(lambda b: model.apply(
                    variables, b["inputs"], hard=True)[0])
            mean, std = test_time(
                fwd, test_loader,
                lambda b: {"inputs": [_jax.numpy.asarray(x) for x in b.inputs]},
            )
            print(f"Time measured over 10 reps: {mean:.4f} ± {std:.4f}s per pass")

    print("-" * 60)
    print(f"Finish {args.n_runs} runs")
    print(
        f"Test f1 micro {log2[:,0].mean()*100:.2f} ± {log2[:,0].std()*100:.2f} | "
        f"f1 macro {log2[:,1].mean()*100:.2f} ± {log2[:,1].std()*100:.2f} | "
        f"Flop saving {log2[:,2].mean():.2f} ± {log2[:,2].std():.2f}M | "
        f"Branch selection ratio {log1.mean():.3f} ± {log1.std():.3f}"
    )


if __name__ == "__main__":
    main()
