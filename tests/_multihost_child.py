"""Worker for the two-process ``jax.distributed`` CPU test.

Driven by ``tests/test_multiprocess_distributed.py`` (SURVEY §5.8 /
VERDICT r4 item 6: the multi-host feed had only ever run with
``process_count == 1``). Each worker forces the CPU backend with 4 local
devices, joins the coordination service (2 processes → 8 global devices),
serves its own ``ProcessShard`` slice of a deterministic synthetic
dataset, and runs ONE data-parallel train epoch of the tiny flagship
through ``SegTrainer`` — so ``jax.make_array_from_process_local_data``
executes with a real ``process_count == 2``. Prints a RESULT line the
parent compares across processes (data-parallel replicas must agree
bit-for-bit on the loss and the post-step param checksum).
"""

import argparse


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--coordinator", required=True)
    ap.add_argument("--process_id", type=int, required=True)
    ap.add_argument("--num_processes", type=int, default=2)
    ap.add_argument("--local_devices", type=int, default=4)
    args = ap.parse_args()

    import torch  # noqa: F401  (import order: torch before jax backend init)

    import jax

    # the axon TPU plugin ignores JAX_PLATFORMS env vars — force CPU via
    # config before the backend initializes (tests/conftest.py does the same)
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", args.local_devices)
    jax.distributed.initialize(
        coordinator_address=args.coordinator,
        num_processes=args.num_processes,
        process_id=args.process_id,
    )
    assert jax.process_count() == args.num_processes
    n_global = args.num_processes * args.local_devices
    assert len(jax.devices()) == n_global, jax.devices()
    assert len(jax.local_devices()) == args.local_devices

    import jax.numpy as jnp
    import numpy as np

    from dynmm_tpu.data.nyuv2 import SyntheticSegDataset
    from dynmm_tpu.data.seg_preprocessing import SegLoader, SegPreprocessor
    from dynmm_tpu.models.esanet import ESANetConfig
    from dynmm_tpu.models.skip_gate import SkipGateESANet
    from dynmm_tpu.parallel import ProcessShard, make_mesh
    from dynmm_tpu.train.seg import SegTrainConfig, SegTrainer

    h = w = 64
    cfg_m = ESANetConfig(
        height=h, width=w, num_classes=5,
        encoder_rgb="resnet18", encoder_depth="resnet18",
        encoder_block="BasicBlock",
        channels_decoder=(32, 32, 32), nr_decoder_blocks=(1, 1, 1),
        fuse_depth_in_rgb_encoder="add", upsampling="bilinear",
        context_module="None",
    )
    ds = SyntheticSegDataset(n=16, height=h, width=w, n_classes=5,
                             split="train")
    shard = ProcessShard(ds)  # live runtime process_index/count
    assert len(shard) == 16 // args.num_processes
    # train-phase prep (emits the label_down pyramid the train step needs);
    # each host's aug randomness only affects its own slice of the global
    # batch — the replica invariant (identical loss/params across
    # processes) holds regardless because the assembled batch is global
    pre = SegPreprocessor(2000.0, 800.0, h, w, phase="train")
    loader = SegLoader(shard, pre, batch_size=4, shuffle=False,
                       drop_last=True)

    mesh = make_mesh(n_global, 1)
    cfg = SegTrainConfig(epochs=1, lr=0.01, loss_ratio=1e-4, dynamic=True)
    model = SkipGateESANet(cfg_m)
    trainer = SegTrainer(model, cfg, np.ones(5, np.float32), mesh=mesh)
    state = trainer.init_state(jax.random.PRNGKey(0),
                               next(iter(loader)))
    state, logs = trainer.train_one_epoch(state, loader, 0, 0.01, 1.0)
    loss = float(logs["loss_train_total"])
    assert np.isfinite(loss)
    chk = float(sum(
        jnp.sum(jnp.abs(leaf.astype(jnp.float32)))
        for leaf in jax.tree_util.tree_leaves(state["params"])))
    print(f"RESULT process={jax.process_index()} "
          f"loss={loss:.8f} checksum={chk:.4f}", flush=True)


if __name__ == "__main__":
    main()
