#!/usr/bin/env python
"""Train/eval unimodal CMU-MOSEI/MOSI experts — mirrors
``ModalityDynMM/affect/affect_uni.py``: GRU or Transformer encoder per
modality (visual 35-d: gru 64/32 tran 120/64; audio 74-d: gru 128/64 tran
120/64; text 300-d: gru 512/256 tran 120/64) + MLP head; L1 regression,
posneg-classification eval; AdamW lr 1e-4 wd 0.01."""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

HIDDEN = {  # (gru h1, gru h2, tran h1, tran h2)
    0: (64, 32, 120, 64),
    1: (128, 64, 120, 64),
    2: (512, 256, 120, 64),
}
MOD_NAMES = {0: "visual", 1: "audio", 2: "text"}


def main():
    from dynmm_tpu.utils.platform import maybe_force_cpu
    maybe_force_cpu()
    import jax
    import jax.numpy as jnp

    from dynmm_tpu.data.affect import mosei_loaders, synthetic_mosei_loaders
    from dynmm_tpu.models.modality.mmdl import EncoderHead
    from dynmm_tpu.nn.mlp import MLP
    from dynmm_tpu.nn.sequence import GRU, Transformer
    from dynmm_tpu.train.adapters import unimodal_adapter
    from dynmm_tpu.train.experts import save_expert
    from dynmm_tpu.train.supervised import SupervisedConfig, SupervisedTrainer

    ap = argparse.ArgumentParser(
        "unimodal network on mosi/mosei",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    ap.add_argument("--n-runs", type=int, default=1)
    ap.add_argument("--mod", type=int, default=2, help="0 visual / 1 audio / 2 text")
    ap.add_argument("--enc", type=str, default="transformer", help="gru | transformer")
    ap.add_argument("--hidden-dim1", type=int, default=0)
    ap.add_argument("--hidden-dim2", type=int, default=0)
    ap.add_argument("--data", type=str, default="mosei")
    ap.add_argument("--n-epochs", type=int, default=100)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--data-path", type=str, default="./data/mosei_senti_data.pkl")
    ap.add_argument("--clf", action="store_true",
                    help="classification model (CE, 2 classes); else regression")
    ap.add_argument("--synthetic", action="store_true")
    ap.add_argument("--eval-only", action="store_true")
    args = ap.parse_args()

    if args.synthetic or not os.path.exists(args.data_path):
        print("using synthetic MOSEI data")
        loaders = synthetic_mosei_loaders(batch_size=32)
    else:
        loaders = mosei_loaders(args.data_path, batch_size=32)
    train_loader, valid_loader, test_loader = loaders
    if args.clf:
        # binarize the scalar sentiment into posneg classes for CE training
        from dynmm_tpu.data.loader import ArrayLoader

        def binarize(l, shuffle):
            return ArrayLoader(
                l.inputs, (l.label.reshape(-1) >= 0).astype(np.int64),
                lengths=l.lengths, batch_size=l.batch_size, shuffle=shuffle,
                drop_last=shuffle, pad_tail=not shuffle,
            )

        train_loader = binarize(train_loader, True)
        valid_loader = binarize(valid_loader, False)
        test_loader = binarize(test_loader, False)

    g1, g2, t1, t2 = HIDDEN[args.mod]
    h1 = args.hidden_dim1 or (g1 if args.enc == "gru" else t1)
    h2 = args.hidden_dim2 or (g2 if args.enc == "gru" else t2)
    mod_name = MOD_NAMES[args.mod]

    log = np.zeros((args.n_runs, 3))
    for n in range(args.n_runs):
        if args.enc == "gru":
            encoder = GRU(hidden_dim=h1, dropout=True)
        else:
            encoder = Transformer(dim=h1)
        output_dim = 2 if args.clf else 1
        model = EncoderHead(encoder, MLP(h2, output_dim), sequence=True)

        batch = next(iter(train_loader))
        variables = model.init(
            jax.random.PRNGKey(n),
            jnp.asarray(batch.inputs[args.mod]),
            jnp.asarray(batch.lengths[args.mod]),
        )
        if args.clf:
            cfg = SupervisedConfig(
                task="classification", objective="cross_entropy",
                epochs=args.n_epochs, lr=args.lr, weight_decay=0.01,
            )
        else:
            cfg = SupervisedConfig(
                task="posneg-classification", objective="l1",
                epochs=args.n_epochs, lr=args.lr, weight_decay=0.01,
            )
        trainer = SupervisedTrainer(unimodal_adapter(model, args.mod), cfg)
        state = trainer.init_state(variables)
        if not args.eval_only:
            state, _ = trainer.fit(state, train_loader, valid_loader)
            os.makedirs(f"./log/{args.data}", exist_ok=True)
            save_expert(
                f"./log/{args.data}/reg_{args.enc}_encoder_{mod_name}.msgpack",
                state["params"]["encoder"],
                state["model_state"].get("batch_stats", {}).get("encoder"),
            )
            save_expert(
                f"./log/{args.data}/reg_{args.enc}_head_{mod_name}.msgpack",
                state["params"]["head"],
                state["model_state"].get("batch_stats", {}).get("head"),
            )
        metrics = trainer.evaluate(state, test_loader)
        print(f"run {n}: {metrics}")
        log[n] = metrics["accuracy"], metrics["loss"], metrics.get("corr", 0.0)

    print(f"Test Accuracy {log[:,0].mean()*100:.2f} ± {log[:,0].std()*100:.2f}")
    print(f"Loss {log[:,1].mean():.4f} ± {log[:,1].std():.2f}")
    print(f"Corr {log[:,2].mean():.4f} ± {log[:,2].std():.2f}")


if __name__ == "__main__":
    main()
