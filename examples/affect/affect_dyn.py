#!/usr/bin/env python
"""Train/eval CMU-MOSEI modality-level DynMM — mirrors
``ModalityDynMM/affect/affect_dyn.py``: DynMMNetV2 router (text transformer
vs tri-modal late-fusion transformer), gate Transformer(409,10)+Linear,
L1 regression training with λ resource loss, posneg-classification eval
reporting Accuracy/Loss/Corr/FLOP/branch-ratio."""

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

    from dynmm_tpu.data.affect import mosei_loaders, synthetic_mosei_loaders
    from dynmm_tpu.models.modality import MOSEI_FLOPS_M, MoseiDynMMNetV2
    from dynmm_tpu.train.adapters import dynmm_adapter
    from dynmm_tpu.train.experts import inject_expert, load_expert
    from dynmm_tpu.train.supervised import SupervisedConfig, SupervisedTrainer
    from dynmm_tpu.utils.checkpoint import load_checkpoint, save_checkpoint

    ap = argparse.ArgumentParser(
        "dynamic multimodal network on mosei",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    ap.add_argument("--data", type=str, default="mosei")
    ap.add_argument("--n-runs", type=int, default=1)
    ap.add_argument("--enc", type=str, default="transformer")
    ap.add_argument("--n-epochs", type=int, default=50)
    ap.add_argument("--temp", type=float, default=1.0)
    ap.add_argument("--hard-gate", action="store_true")
    ap.add_argument("--reg", type=float, default=0.0, help="reg loss weight (λ)")
    ap.add_argument("--lr", type=float, default=1e-6)
    ap.add_argument("--wd", type=float, default=1e-4)
    ap.add_argument("--infer-mode", type=int, default=0)
    ap.add_argument("--eval-only", action="store_true")
    ap.add_argument("--freeze", action="store_true")
    ap.add_argument("--data-path", type=str, default="./data/mosei_senti_data.pkl")
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
        print("using synthetic MOSEI data")
        loaders = synthetic_mosei_loaders(batch_size=32)
    else:
        loaders = mosei_loaders(args.data_path, batch_size=32)
    train_loader, valid_loader, test_loader = loaders

    log = np.zeros((args.n_runs, 5))
    for n in range(args.n_runs):
        model = MoseiDynMMNetV2()
        batch = next(iter(train_loader))
        variables = model.init(
            jax.random.PRNGKey(n),
            [jnp.asarray(x) for x in batch.inputs],
            [jnp.asarray(l) for l in batch.lengths],
        )
        # two-step workflow: graft pretrained expert branches when available
        b1 = f"./log/{args.data}/reg_{args.enc}_encoder_text.msgpack"
        b1h = f"./log/{args.data}/reg_{args.enc}_head_text.msgpack"
        b2 = f"./log/{args.data}/lf_tran.msgpack"
        if os.path.exists(b1):
            variables = inject_expert(variables, "text_encoder", load_expert(b1))
            print(f"Loading model {b1}")
        if os.path.exists(b1h):
            variables = inject_expert(variables, "text_head", load_expert(b1h))
        if os.path.exists(b2):
            variables = inject_expert(variables, "branch2", load_expert(b2))
            print(f"Loading model {b2}")

        filename = os.path.join(
            "./log", args.data,
            f"dyn_enc_{args.enc}_reg_{args.reg}freeze{args.freeze}.msgpack",
        )
        cfg = SupervisedConfig(
            task="posneg-classification", objective="l1",
            epochs=args.n_epochs, lr=args.lr, weight_decay=args.wd,
            additional_loss=True, lossw=args.reg, early_stop=True,
        )
        trainer = SupervisedTrainer(
            dynmm_adapter(model, temp=args.temp, hard=args.hard_gate,
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
            dynmm_adapter(model, temp=args.temp, hard=True,
                          infer_mode=args.infer_mode),
            cfg,
        )
        hard_trainer.tx = trainer.tx
        metrics = hard_trainer.evaluate(state, test_loader, collect_weights=True)
        stats = metrics["gate_stats"]
        flops = stats.expected_flops(MOSEI_FLOPS_M) if stats.weights.size else 0.0
        ratio = stats.branch_ratios()[1] if stats.weights.size else 0.0
        print(
            f"Accuracy {metrics['accuracy']*100:.2f} | Loss {metrics['loss']:.4f} "
            f"| Corr {metrics['corr']:.3f} | Total Flops {flops:.2f}M | ratio {ratio:.3f}"
        )
        log[n] = metrics["accuracy"], metrics["loss"], metrics["corr"], flops, ratio

        if args.robust:
            from dynmm_tpu.train.robustness import (
                relative_robustness, robustness_sweep)

            curves = robustness_sweep(
                lambda l: hard_trainer.evaluate(state, l),
                test_loader,
                {"visual": [0], "audio": [1], "text": [2]},
            )
            for mod, curve in curves.items():
                rr = relative_robustness(curve["accuracy"])
                print(f"robustness ({mod}): accuracy curve "
                      f"{[round(v, 3) for v in curve['accuracy']]} | "
                      f"relative robustness {rr:.3f}")
        if args.measure:
            import jax as _jax
            from dynmm_tpu.utils.profiling import test_time

            variables = {"params": state["params"], **state["model_state"]}
            if args.routed:
                fwd = _jax.jit(lambda b: model.apply(
                    variables, b["inputs"], b["lengths"],
                    method=model.forward_routed_compact)[0])
            else:
                fwd = _jax.jit(lambda b: model.apply(
                    variables, b["inputs"], b["lengths"], hard=True)[0])
            mean, std = test_time(
                fwd, test_loader,
                lambda b: {
                    "inputs": [_jax.numpy.asarray(x) for x in b.inputs],
                    "lengths": [_jax.numpy.asarray(l) for l in b.lengths],
                },
            )
            print(f"Time measured over 10 reps: {mean:.4f} ± {std:.4f}s per pass")

    print("-" * 60)
    print(f"Finish {args.n_runs} runs")
    print(f"Test Accuracy {log[:,0].mean()*100:.2f} ± {log[:,0].std()*100:.2f}")
    print(f"Loss {log[:,1].mean():.4f} ± {log[:,1].std():.4f}")
    print(f"Corr {log[:,2].mean():.4f} ± {log[:,2].std():.4f}")
    print(f"FLOP {log[:,3].mean():.2f} ± {log[:,3].std():.2f}")
    print(f"Ratio {log[:,4].mean():.3f} ± {log[:,4].std():.2f}")


if __name__ == "__main__":
    main()
