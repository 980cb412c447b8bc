#!/usr/bin/env python
"""Train/eval MM-IMDB two-modality fusion experts — mirrors
``ModalityDynMM/multimedia/imdb_mm.py``: ``--fuse`` 0 = ef (concat-early +
MaxOut_MLP), 1 = lf (MaxOut encoders + Concat + Linear), 2 = lrtf
(LowRankTensorFusion), 3 = mim (MultiplicativeInteractions2Modal).
The lf expert is branch 3 of the DynMM router (saved as ``best_lf``)."""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))


def build_expert(fuse: int):
    from dynmm_tpu.models.modality.mmdl import MMDL
    from dynmm_tpu.nn.fusions import (
        Concat,
        ConcatEarly,
        LowRankTensorFusion,
        MultiplicativeInteractions2Modal,
    )
    from dynmm_tpu.nn.mlp import Identity, LinearHead, MaxOut_MLP, MLP

    if fuse == 0:  # early fusion
        return MMDL(
            encoders=[Identity(), Identity()],
            fusion=Concat(),
            head=MaxOut_MLP(23, first_hidden=512, second_hidden=512),
        ), "ef"
    if fuse == 1:  # late fusion (the DynMM branch-3 expert)
        return MMDL(
            encoders=[
                MaxOut_MLP(512, first_hidden=512, linear_layer=False),
                MaxOut_MLP(512, first_hidden=1024, second_hidden=512,
                           linear_layer=False),
            ],
            fusion=Concat(),
            head=LinearHead(23),
        ), "lf"
    if fuse == 2:  # low-rank tensor fusion
        return MMDL(
            encoders=[
                MaxOut_MLP(512, first_hidden=512, linear_layer=False),
                MaxOut_MLP(512, first_hidden=1024, second_hidden=512,
                           linear_layer=False),
            ],
            fusion=LowRankTensorFusion(output_dim=512, rank=16),
            head=LinearHead(23),
        ), "lrtf"
    # multiplicative interactions
    return MMDL(
        encoders=[
            MaxOut_MLP(512, first_hidden=512, linear_layer=False),
            MaxOut_MLP(512, first_hidden=1024, second_hidden=512,
                       linear_layer=False),
        ],
        fusion=MultiplicativeInteractions2Modal(output_dim=512),
        head=LinearHead(23),
    ), "mim"


def main():
    from dynmm_tpu.utils.platform import maybe_force_cpu
    maybe_force_cpu()
    import jax
    import jax.numpy as jnp

    from dynmm_tpu.data.imdb import imdb_loaders, synthetic_imdb_loaders
    from dynmm_tpu.train.adapters import mmdl_adapter
    from dynmm_tpu.train.experts import save_expert
    from dynmm_tpu.train.supervised import SupervisedConfig, SupervisedTrainer

    ap = argparse.ArgumentParser(
        "imdb_mm", formatter_class=argparse.ArgumentDefaultsHelpFormatter
    )
    ap.add_argument("--n-runs", type=int, default=1)
    ap.add_argument("--fuse", type=int, default=1, help="0 ef / 1 lf / 2 lrtf / 3 mim")
    ap.add_argument("--n-epochs", type=int, default=50)
    ap.add_argument("--lr", type=float, default=8e-3)
    ap.add_argument("--wd", type=float, default=1e-2)
    ap.add_argument("--data-path", type=str, default="./data/multimodal_imdb.hdf5")
    ap.add_argument("--synthetic", action="store_true")
    args = ap.parse_args()

    if args.synthetic or not os.path.exists(args.data_path):
        print("using synthetic MM-IMDB data")
        loaders = synthetic_imdb_loaders(batch_size=128)
    else:
        loaders = imdb_loaders(args.data_path, batch_size=128)
    train_loader, valid_loader, test_loader = loaders

    log = np.zeros((args.n_runs, 2))
    for n in range(args.n_runs):
        model, name = build_expert(args.fuse)
        batch = next(iter(train_loader))
        variables = model.init(
            jax.random.PRNGKey(n), [jnp.asarray(x) for x in batch.inputs]
        )
        cfg = SupervisedConfig(
            task="multilabel", objective="bce_with_logits",
            epochs=args.n_epochs, lr=args.lr, weight_decay=args.wd,
        )
        trainer = SupervisedTrainer(mmdl_adapter(model), cfg)
        state = trainer.init_state(variables)
        state, _ = trainer.fit(state, train_loader, valid_loader)
        os.makedirs("./log/imdb", exist_ok=True)
        save_expert(
            f"./log/imdb/best_{name}.msgpack",
            state["params"],
            state["model_state"].get("batch_stats"),
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
