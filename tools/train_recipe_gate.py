#!/usr/bin/env python
"""Train the benchmark gate by the reference's own published recipe
(VERDICT r3 items 2+4).

The round-1..3 bench gate came from a self-distillation shortcut
(tools/train_bench_gate.py); its [0.5, 0, 0, 0.5, 0] branch ratios were a
synthetic artifact. This tool runs the reference's two-stage workflow
end-to-end through the real ``train.py`` CLI (reference ``README.md:83-89``,
``FusionDynMM/train.py:189-197``), at a reduced epoch count, on the
synthetic NYUv2 set with input-dependent modality value
(``--synthetic_mixed_frac``: half the samples need depth, half don't):

  stage A ("hard-loss1e-4"): --dynamic --global-gate --loss-ratio 1e-4
                             --epoch-hard 0            (hard gate throughout)
  stage B ("temp1-0.001-loss1e-4-inifromhard"):
                             --finetune <stage-A best>
                             --temp 1.0 --end-temp 0.001
                             --epoch-ini 0 --epoch-hard <epochs>
                             --loss-ratio 1e-4         (soft, annealed)

Then it freezes the gate TOGETHER WITH everything upstream of its input
(both encoder stems' conv1/bn1, the stem SE fusion) plus their BN running
stats into ``bench_assets/gate_recipe.msgpack`` — swapping only the 27K-param
gate into a random backbone would feed it out-of-distribution stem features
and make its decisions meaningless. Held-out hard-path ratios are computed
with the FULL trained model on an unseen synthetic stream and stored as
provenance alongside both stages' flags and training logs
(``bench_assets/gate_recipe_logs/``).

Usage (real TPU, ~10 min with a warm .jax_cache):

    ENCODER=resnet34 EPOCHS_A=30 EPOCHS_B=60 python tools/train_recipe_gate.py
    ENCODER=resnet50 python tools/train_recipe_gate.py   # r50 variant
"""

import glob
import os
import shutil
import subprocess
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))

ENCODER = os.environ.get("ENCODER", "resnet34")
EPOCHS_A = int(os.environ.get("EPOCHS_A", "30"))
EPOCHS_B = int(os.environ.get("EPOCHS_B", "60"))
# The reference publishes multiple DynMM operating points by sweeping the
# flop-loss weight (README.md:83-89 names it in each config string). 1e-4 is
# their R34 best-accuracy point; on R50 it exerts ~4e-4 of pressure against a
# CE of ~5, so the gate goes all-heavy — raise it to trade accuracy for skips.
LOSS_RATIO = os.environ.get("LOSS_RATIO", "1e-4")
SYN_N = int(os.environ.get("SYN_N", "64"))
MIX = float(os.environ.get("MIX", "0.5"))
H = int(os.environ.get("H", "480"))
W = int(os.environ.get("W", "640"))
WORKDIR = os.environ.get("WORKDIR", "/tmp/recipe_gate_" + ENCODER)

BASE_FLAGS = [
    "--dataset", "synthetic",
    "--synthetic_n", str(SYN_N),
    "--synthetic_mixed_frac", str(MIX),
    "--height", str(H), "--width", str(W),
    "--batch_size", "8",
    "--encoder", ENCODER,
    "--dynamic", "--global-gate",
    "--loss-ratio", LOSS_RATIO,
    "--eval-every", "10",
    # no periodic saves: the single ckpt_epoch_* each stage leaves behind is
    # the trainer's final best-state save (reference "ckpt_best" semantics)
    "--save-every", "100000",
]
# NOTE: no --encoder_block flag for resnet50 — like the reference CLI
# (src/args.py:110-115 only offers BasicBlock/NonBottleneck1D), the factory
# always uses Bottleneck blocks for resnet50 (models/resnet.py:492-494).


def run_stage(name: str, extra_flags, results_dir: str) -> str:
    """Run one train.py stage; returns its checkpoint directory."""
    cmd = [sys.executable, "train.py", *BASE_FLAGS, *extra_flags,
           "--results_dir", results_dir]
    print(f"[{name}] {' '.join(cmd)}", flush=True)
    subprocess.run(cmd, cwd=REPO, check=True)
    dirs = sorted(glob.glob(os.path.join(results_dir, "synthetic",
                                         "checkpoints_*")))
    assert dirs, f"no checkpoint dir produced by {name}"
    return dirs[-1]


def last_ckpt(ckpt_dir: str) -> str:
    cks = sorted(
        glob.glob(os.path.join(ckpt_dir, "ckpt_epoch_*.msgpack")),
        key=lambda p: int(p.rsplit("_", 1)[1].split(".")[0]),
    )
    assert cks, f"no checkpoints in {ckpt_dir}"
    return cks[-1]


def select_subtree(tree: dict) -> dict:
    """Gate + everything upstream of its input, from a params or
    batch_stats dict."""
    out = {}
    for key in ("gate_layer", "se_layer0"):
        if key in tree:
            out[key] = tree[key]
    for enc in ("encoder_rgb", "encoder_depth"):
        if enc in tree:
            sel = {k: v for k, v in tree[enc].items() if k in ("conv1", "bn1")}
            if sel:
                out[enc] = sel
    return out


def main():
    from bench import setup_compilation_cache

    setup_compilation_cache()

    # STAGE_A_CKPT: resume after an interrupted run — reuse a finished
    # stage-A checkpoint instead of re-training it (stage A is ~half the
    # wall clock). Stage B always reruns from scratch.
    ck_a = os.environ.get("STAGE_A_CKPT", "")
    if ck_a:
        assert os.path.exists(ck_a), ck_a
        dir_a = os.path.dirname(ck_a)
        # only clear a stale stage_b when we are about to RE-TRAIN it —
        # with STAGE_B_CKPT set the existing dir IS the input (an earlier
        # ordering bug here deleted a finished stage-B checkpoint)
        stale_b = os.path.join(WORKDIR, "stage_b")
        if not os.environ.get("STAGE_B_CKPT") and os.path.exists(stale_b):
            shutil.rmtree(stale_b)
    else:
        if os.path.exists(WORKDIR):
            shutil.rmtree(WORKDIR)
        os.makedirs(WORKDIR)
        dir_a = run_stage(
            "stage A (hard-loss1e-4)",
            ["--epoch-ini", "0", "--epoch-hard", "0",
             "--epochs", str(EPOCHS_A)],
            os.path.join(WORKDIR, "stage_a"),
        )
        ck_a = last_ckpt(dir_a)
    # STAGE_B_CKPT: re-run only the analysis/freeze phase on a finished
    # stage-B checkpoint (e.g. after fixing a freeze-phase bug).
    ck_b = os.environ.get("STAGE_B_CKPT", "")
    if ck_b:
        assert os.path.exists(ck_b), ck_b
        dir_b = os.path.dirname(ck_b)
    else:
        dir_b = run_stage(
            f"stage B (temp1-0.001-loss{LOSS_RATIO}-inifromhard)",
            ["--finetune", ck_a,
             "--temp", "1.0", "--end-temp", "0.001",
             "--epoch-ini", "0", "--epoch-hard", str(EPOCHS_B),
             "--epochs", str(EPOCHS_B)],
            os.path.join(WORKDIR, "stage_b"),
        )
        ck_b = last_ckpt(dir_b)
    print(f"stage A ckpt: {ck_a}\nstage B ckpt: {ck_b}", flush=True)

    # ---- load the final model and measure held-out hard-path ratios ----
    import torch  # noqa: F401  (import order: before jax backend init)
    import jax
    import jax.numpy as jnp
    import flax.serialization

    from dynmm_tpu.cli.seg_args import ArgumentParserRGBDSegmentation
    from dynmm_tpu.cli.seg_build import build_model
    from dynmm_tpu.data.nyuv2 import SyntheticSegDataset
    from dynmm_tpu.data.seg_preprocessing import SegLoader, SegPreprocessor
    from dynmm_tpu.utils.checkpoint import load_checkpoint

    parser = ArgumentParserRGBDSegmentation()
    parser.set_common_args()
    args = parser.parse_args(BASE_FLAGS)
    model = build_model(args, 40)

    rgb0 = jnp.zeros((1, 64, 64, 3), jnp.float32)
    d0 = jnp.zeros((1, 64, 64, 1), jnp.float32)
    template = model.init(jax.random.PRNGKey(0), rgb0, d0, train=False)
    payload = load_checkpoint(ck_b)
    state = payload["state"]
    params = flax.serialization.from_state_dict(
        template["params"], state["params"])
    model_state = flax.serialization.from_state_dict(
        {k: v for k, v in template.items() if k != "params"},
        state["model_state"],
    )
    variables = {"params": params, **model_state}

    held = SyntheticSegDataset(
        n=32, height=H, width=W, seed=7, split="test",
        mixed_modality_frac=MIX,
    )
    pre = SegPreprocessor(
        held.depth_mean, held.depth_std, H, W, phase="test")
    loader = SegLoader(held, pre, batch_size=8)

    @jax.jit
    def hard_paths(rgb, depth):
        _, weight = model.apply(
            variables, rgb, depth, train=False, hard=True,
            return_weight=True,
        )
        return jnp.argmax(weight, axis=-1)

    counts = np.zeros(5, np.int64)
    for batch in loader:
        p = np.asarray(hard_paths(jnp.asarray(batch["image"]),
                                  jnp.asarray(batch["depth"])))
        counts += np.bincount(p, minlength=5)
    ratios = counts / counts.sum()
    print(f"held-out branch ratios: {np.array2string(ratios, precision=3)}",
          flush=True)

    # ---- freeze the asset -------------------------------------------------
    sel_params = select_subtree(
        flax.serialization.to_state_dict(params))
    sel_stats = select_subtree(
        flax.serialization.to_state_dict(model_state.get("batch_stats", {})))
    # NB: only the numeric subtree goes through tree_map(np.asarray) — a
    # numpy str_ array in provenance round-trips to an unreadable 'str160'
    # dtype under flax msgpack (caught by the CPU smoke run, round 4)
    asset = {
        "subtree": jax.tree_util.tree_map(
            np.asarray, {"params": sel_params, "batch_stats": sel_stats}),
        "branch_ratios": ratios.astype(np.float32),
        "provenance": {
            "recipe": "README.md:83-89 two-stage (hard-loss -> "
                      f"temp1-0.001-loss{LOSS_RATIO}-inifromhard), "
                      "reduced epochs",
            "encoder": ENCODER,
            "epochs_a": EPOCHS_A,
            "epochs_b": EPOCHS_B,
            "synthetic_n": SYN_N,
            "mixed_modality_frac": MIX,
            "loss_ratio": float(LOSS_RATIO),
            "temp_start": 1.0,
            "temp_end": 0.001,
        },
    }
    out_dir = os.path.join(REPO, "bench_assets")
    os.makedirs(out_dir, exist_ok=True)
    suffix = "" if ENCODER == "resnet34" else f"_{ENCODER}"
    path = os.path.join(out_dir, f"gate_recipe{suffix}.msgpack")
    with open(path, "wb") as f:
        f.write(flax.serialization.msgpack_serialize(asset))
    print(f"saved {path}", flush=True)

    log_dir = os.path.join(out_dir, f"gate_recipe{suffix}_logs")
    os.makedirs(log_dir, exist_ok=True)
    for stage, d in (("stage_a", dir_a), ("stage_b", dir_b)):
        for fname in ("logs.csv", "argsv.txt"):
            src = os.path.join(d, fname)
            if os.path.exists(src):
                shutil.copy(src, os.path.join(log_dir, f"{stage}_{fname}"))
    print(f"logs copied to {log_dir}", flush=True)


if __name__ == "__main__":
    main()
