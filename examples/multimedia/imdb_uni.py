#!/usr/bin/env python
"""Train/eval unimodal MM-IMDB experts — mirrors the reference CLI
``ModalityDynMM/multimedia/imdb_uni.py``: text expert ``MLP(300,512,512)`` +
``MLP(512,512,23)`` head, image expert ``MLP(4096,1024,512)`` +
``MLP(512,512,23)``; BCE-with-logits multilabel, AdamW lr 1e-4 wd 0.01,
early stop; reports f1 micro/macro over n runs. Checkpoints land in
``./log/imdb`` for the DynMM router to load.
"""

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
    from dynmm_tpu.models.modality.mmdl import EncoderHead
    from dynmm_tpu.nn.mlp import MLP
    from dynmm_tpu.train.adapters import unimodal_adapter
    from dynmm_tpu.train.experts import save_expert
    from dynmm_tpu.train.supervised import SupervisedConfig, SupervisedTrainer

    ap = argparse.ArgumentParser(
        "imdb_uni", formatter_class=argparse.ArgumentDefaultsHelpFormatter
    )
    ap.add_argument("--n-runs", type=int, default=1)
    ap.add_argument("--mod", type=int, default=0, help="0: text, 1: image")
    ap.add_argument("--n-epochs", type=int, default=50)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--wd", type=float, default=1e-2)
    ap.add_argument("--data-path", type=str, default="./data/multimodal_imdb.hdf5")
    ap.add_argument("--synthetic", action="store_true",
                    help="use the synthetic dataset (no hdf5 needed)")
    ap.add_argument("--eval-only", action="store_true")
    args = ap.parse_args()

    if args.synthetic or not os.path.exists(args.data_path):
        print("using synthetic MM-IMDB data")
        loaders = synthetic_imdb_loaders(batch_size=128)
    else:
        loaders = imdb_loaders(args.data_path, batch_size=128)
    train_loader, valid_loader, test_loader = loaders

    mod_name = ["text", "image"][args.mod]
    log = np.zeros((args.n_runs, 2))
    for n in range(args.n_runs):
        if args.mod == 0:
            model = EncoderHead(MLP(512, 512), MLP(512, 23))
        else:
            model = EncoderHead(MLP(1024, 512), MLP(512, 23))

        batch = next(iter(train_loader))
        variables = model.init(
            jax.random.PRNGKey(n), jnp.asarray(batch.inputs[args.mod])
        )
        cfg = SupervisedConfig(
            task="multilabel", objective="bce_with_logits",
            epochs=args.n_epochs, lr=args.lr, weight_decay=args.wd,
            early_stop=True,
        )
        trainer = SupervisedTrainer(unimodal_adapter(model, args.mod), cfg)
        state = trainer.init_state(variables)
        if not args.eval_only:
            state, _ = trainer.fit(state, train_loader, valid_loader)
            os.makedirs("./log/imdb", exist_ok=True)
            save_expert(
                f"./log/imdb/encoder_{mod_name}.msgpack",
                state["params"]["encoder"],
                state["model_state"].get("batch_stats", {}).get("encoder"),
            )
            save_expert(
                f"./log/imdb/head_{mod_name}.msgpack",
                state["params"]["head"],
                state["model_state"].get("batch_stats", {}).get("head"),
            )
        metrics = trainer.evaluate(state, test_loader)
        print(f"run {n}: {metrics}")
        log[n] = metrics["f1_micro"], metrics["f1_macro"]

    print(
        f"Test f1 micro {log[:,0].mean()*100:.2f} ± {log[:,0].std()*100:.2f} | "
        f"f1 macro {log[:,1].mean()*100:.2f} ± {log[:,1].std()*100:.2f}"
    )


if __name__ == "__main__":
    main()
