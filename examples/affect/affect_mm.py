#!/usr/bin/env python
"""Train/eval tri-modal CMU-MOSEI fusion experts — mirrors
``ModalityDynMM/affect/affect_mm.py`` variants 0-5: ef_gru, lf_gru, ef_tran,
lf_tran (the DynMM branch-2 expert), mult (cross-modal transformer), lrtf."""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

FUSION_NAMES = {0: "ef_gru", 1: "lf_gru", 2: "ef_tran", 3: "lf_tran",
                4: "mult", 5: "lrtf"}


def build_expert(fusion: int):
    from dynmm_tpu.models.modality.mmdl import MMDL, EncoderHead
    from dynmm_tpu.models.mult import MULTModel
    from dynmm_tpu.nn.fusions import Concat, ConcatEarly, LowRankTensorFusion
    from dynmm_tpu.nn.mlp import MLP, Identity
    from dynmm_tpu.nn.sequence import GRU, GRUWithLinear, Transformer

    class SeqIdentity(Identity):
        def __call__(self, x, lengths=None, train=False):
            return x

    class SeqHead(EncoderHead):
        pass

    if fusion == 0:  # early fusion + GRU
        return MMDL(
            encoders=[SeqIdentity(), SeqIdentity(), SeqIdentity()],
            fusion=ConcatEarly(),
            head=SeqHead(GRU(hidden_dim=512, dropout=True), MLP(256, 1),
                         sequence=True),
            has_padding=True,
        )
    if fusion == 1:  # late fusion + GRU
        return MMDL(
            encoders=[
                GRU(hidden_dim=64, dropout=True),
                GRU(hidden_dim=128, dropout=True),
                GRU(hidden_dim=512, dropout=True),
            ],
            fusion=Concat(),
            head=MLP(512, 1),
            has_padding=True,
        )
    if fusion == 2:  # early fusion + transformer
        return MMDL(
            encoders=[SeqIdentity(), SeqIdentity(), SeqIdentity()],
            fusion=ConcatEarly(),
            head=SeqHead(Transformer(dim=300), MLP(128, 1), sequence=True),
            has_padding=True,
        )
    if fusion == 3:  # late fusion + transformer (DynMM branch 2)
        return MMDL(
            encoders=[
                Transformer(dim=60),
                Transformer(dim=120),
                Transformer(dim=120),
            ],
            fusion=Concat(),
            head=MLP(128, 1),
            has_padding=True,
        )
    if fusion == 4:  # MULT cross-modal transformer
        return MMDL(
            encoders=[SeqIdentity(), SeqIdentity(), SeqIdentity()],
            fusion=MULTModel(embed_dim=40, num_heads=10, layers=4, output_dim=1),
            head=SeqIdentity(),
            has_padding=True,
        )
    # low-rank tensor fusion over GRUWithLinear encodings
    return MMDL(
        encoders=[
            GRUWithLinear(hidden_dim=64, out_dim=32, dropout=True),
            GRUWithLinear(hidden_dim=128, out_dim=32, dropout=True),
            GRUWithLinear(hidden_dim=512, out_dim=128, dropout=True),
        ],
        fusion=LowRankTensorFusion(output_dim=128, rank=32),
        head=MLP(512, 1),
        has_padding=True,
    )


def main():
    from dynmm_tpu.utils.platform import maybe_force_cpu
    maybe_force_cpu()
    import jax
    import jax.numpy as jnp

    from dynmm_tpu.data.affect import mosei_loaders, synthetic_mosei_loaders
    from dynmm_tpu.train.adapters import mmdl_adapter
    from dynmm_tpu.train.experts import save_expert
    from dynmm_tpu.train.supervised import SupervisedConfig, SupervisedTrainer

    ap = argparse.ArgumentParser(
        "multimodal network on mosi/mosei",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    ap.add_argument("--data", type=str, default="mosei")
    ap.add_argument("--n-runs", type=int, default=1)
    ap.add_argument("--fusion", type=int, default=3, help="0-5")
    ap.add_argument("--n-epochs", type=int, default=1000)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--wd", type=float, default=1e-4)
    ap.add_argument("--data-path", type=str, default="./data/mosei_senti_data.pkl")
    ap.add_argument("--synthetic", action="store_true")
    ap.add_argument("--eval-only", action="store_true")
    args = ap.parse_args()

    if args.synthetic or not os.path.exists(args.data_path):
        print("using synthetic MOSEI data")
        loaders = synthetic_mosei_loaders(batch_size=32)
    else:
        loaders = mosei_loaders(args.data_path, batch_size=32)
    train_loader, valid_loader, test_loader = loaders

    name = FUSION_NAMES[args.fusion]
    print(f"Fusion model {name}")
    log = np.zeros((args.n_runs, 3))
    for n in range(args.n_runs):
        model = build_expert(args.fusion)
        batch = next(iter(train_loader))
        variables = model.init(
            jax.random.PRNGKey(n),
            [jnp.asarray(x) for x in batch.inputs],
            [jnp.asarray(l) for l in batch.lengths],
        )
        cfg = SupervisedConfig(
            task="posneg-classification", objective="l1",
            epochs=args.n_epochs, lr=args.lr, weight_decay=args.wd,
        )
        trainer = SupervisedTrainer(mmdl_adapter(model), cfg)
        state = trainer.init_state(variables)
        if not args.eval_only:
            state, _ = trainer.fit(state, train_loader, valid_loader)
            os.makedirs(f"./log/{args.data}", exist_ok=True)
            save_expert(
                f"./log/{args.data}/{name}.msgpack",
                state["params"],
                state["model_state"].get("batch_stats"),
            )
        metrics = trainer.evaluate(state, test_loader)
        print(f"run {n}: {metrics}")
        log[n] = metrics["accuracy"], metrics["loss"], metrics["corr"]

    print(f"Test Accuracy {log[:,0].mean()*100:.2f} ± {log[:,0].std()*100:.2f}")
    print(f"Loss {log[:,1].mean():.4f} ± {log[:,1].std():.4f}")
    print(f"Corr {log[:,2].mean():.4f} ± {log[:,2].std():.4f}")


if __name__ == "__main__":
    main()
