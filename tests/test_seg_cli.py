"""Subprocess smoke tests for the public train.py / eval.py CLI surface
(synthetic dataset, tiny config, --debug)."""

import glob
import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow  # full CLI drive; -m "not slow" skips

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

TINY_FLAGS = [
    "--dataset", "synthetic", "--height", "64", "--width", "64",
    "--encoder", "resnet18", "--encoder_block", "BasicBlock",
    "--decoder_channels_mode", "constant", "--channels_decoder", "32",
    "--nr_decoder_blocks", "1", "--context_module", "None",
    "--upsampling", "bilinear", "--batch_size", "2", "--debug",
]


def run_cli(script, args, cwd):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    env["DYNMM_FORCE_CPU"] = "1"
    return subprocess.run(
        [sys.executable, os.path.join(REPO, script), *args],
        cwd=cwd, env=env, capture_output=True, text=True, timeout=1200,
    )


@pytest.mark.parametrize(
    "extra",
    [
        ["--dynamic", "--global-gate", "--loss-ratio", "1e-4",
         "--temp", "1.0", "--end-temp", "0.001", "--epochs", "2",
         "--eval-every", "1", "--packed_stem"],  # packed train+valid feed
        ["--epochs", "1", "--eval-every", "1"],  # static ESANet
        ["--dynamic", "--block-rule", "1122", "--epochs", "1",
         "--eval-every", "1"],                    # local-gate SkipESANet
        ["--modality", "rgb", "--epochs", "1", "--eval-every", "1"],
    ],
    ids=["skipgate", "static", "skiplocal", "rgb-only"],
)
def test_train_cli(tmp_path, extra):
    result = run_cli("train.py", TINY_FLAGS + extra + ["--results_dir", str(tmp_path)], tmp_path)
    assert result.returncode == 0, result.stderr[-4000:]
    assert "Training completed" in result.stdout
    assert glob.glob(str(tmp_path / "synthetic" / "*" / "logs.csv"))


def test_train_cli_resume_last_ckpt(tmp_path):
    """--last_ckpt resumes epoch counting and optimizer state through the
    real CLI (reference: train.py:131-137 → utils.load_ckpt)."""
    flags = ["--dynamic", "--global-gate", "--epochs", "2",
             "--eval-every", "1", "--save-every", "1"]
    result = run_cli(
        "train.py", TINY_FLAGS + flags + ["--results_dir", str(tmp_path)],
        tmp_path,
    )
    assert result.returncode == 0, result.stderr[-4000:]
    resumes = glob.glob(
        str(tmp_path / "synthetic" / "*" / "ckpt_latest.msgpack")
    ) or glob.glob(str(tmp_path / "synthetic" / "*" / "ckpt_epoch_*.msgpack"))
    assert resumes, "resume checkpoint must exist"

    result = run_cli(
        "train.py",
        TINY_FLAGS + ["--dynamic", "--global-gate", "--epochs", "3",
                      "--eval-every", "1", "--last_ckpt", resumes[-1],
                      "--results_dir", str(tmp_path / "resumed")],
        tmp_path,
    )
    assert result.returncode == 0, result.stderr[-4000:]
    assert "loaded checkpoint" in result.stdout
    assert "Training completed" in result.stdout


def test_train_cli_mesh(tmp_path):
    """--mesh-data/--mesh-model drive the pjit mesh path through the real
    CLI (8 virtual CPU devices via DYNMM_CPU_DEVICES; batch 4 = data axis)."""
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    env["DYNMM_FORCE_CPU"] = "1"
    env["DYNMM_CPU_DEVICES"] = "8"
    flags = [f if f != "2" else "4" for f in TINY_FLAGS]  # batch_size 4
    result = subprocess.run(
        [sys.executable, os.path.join(REPO, "train.py"), *flags,
         "--dynamic", "--global-gate", "--epochs", "1", "--eval-every", "1",
         "--mesh-data", "4", "--mesh-model", "2",
         "--results_dir", str(tmp_path)],
        cwd=tmp_path, env=env, capture_output=True, text=True, timeout=1200,
    )
    assert result.returncode == 0, result.stderr[-4000:]
    assert "Using device mesh" in result.stdout
    assert "Training completed" in result.stdout


def test_train_then_eval_roundtrip(tmp_path):
    result = run_cli(
        "train.py",
        TINY_FLAGS
        + ["--dynamic", "--global-gate", "--epochs", "1", "--eval-every", "1",
           "--results_dir", str(tmp_path)],
        tmp_path,
    )
    assert result.returncode == 0, result.stderr[-4000:]
    ckpts = glob.glob(str(tmp_path / "synthetic" / "*" / "ckpt_epoch_*.msgpack"))
    assert ckpts

    result = run_cli(
        "eval.py",
        TINY_FLAGS + ["--dynamic", "--global-gate", "--hard",
                      "--ckpt_path", ckpts[0]],
        tmp_path,
    )
    assert result.returncode == 0, result.stderr[-4000:]
    assert "Mean" in result.stdout
    mean_exact = [ln for ln in result.stdout.splitlines()
                  if ln.startswith("Mean")][0]

    # strict capacity-factor serving chain (--capacity_factor): a generous
    # factor covers every participant count, so the scored mIoU equals the
    # exact chain's bit for bit
    result = run_cli(
        "eval.py",
        TINY_FLAGS + ["--dynamic", "--global-gate", "--hard",
                      "--capacity_factor", "8.0", "--ckpt_path", ckpts[0]],
        tmp_path,
    )
    assert result.returncode == 0, result.stderr[-4000:]
    assert "capacity-factor serving" in result.stdout
    mean_strict = [ln for ln in result.stdout.splitlines()
                   if ln.startswith("Mean")][0]
    assert mean_strict == mean_exact

    # noise-robustness sweep path
    result = run_cli(
        "eval.py",
        TINY_FLAGS + ["--dynamic", "--global-gate", "--hard",
                      "--ckpt_path", ckpts[0], "--num_runs", "2",
                      "--mode", "2", "--noise", "0.5"],
        tmp_path,
    )
    assert result.returncode == 0, result.stderr[-4000:]
    assert "Run 1" in result.stdout

    # quarter-res serving-chain scoring (accuracy side of the
    # predict.py --output_res quarter knob): H/4 argmax + nearest resize
    result = run_cli(
        "eval.py",
        TINY_FLAGS + ["--dynamic", "--global-gate", "--hard",
                      "--output_res", "quarter", "--ckpt_path", ckpts[0]],
        tmp_path,
    )
    assert result.returncode == 0, result.stderr[-4000:]
    assert "Mean" in result.stdout


def test_eval_with_torch_checkpoint(tmp_path):
    """eval.py must load a reference-format .pth checkpoint (torch importer
    path): export a tiny model to torch format, then evaluate from it."""
    import subprocess

    script = f"""
import os
os.environ['DYNMM_FORCE_CPU'] = '1'
from dynmm_tpu.utils.platform import maybe_force_cpu
maybe_force_cpu()
import jax, jax.numpy as jnp
from dynmm_tpu.models.esanet import ESANetConfig
from dynmm_tpu.models.skip_gate import SkipGateESANet
from dynmm_tpu.utils.torch_export import save_torch_checkpoint

cfg = ESANetConfig(height=64, width=64, num_classes=40,
                   encoder_rgb='resnet18', encoder_depth='resnet18',
                   encoder_block='BasicBlock', channels_decoder=(32, 32, 32),
                   nr_decoder_blocks=(1, 1, 1), context_module='None',
                   upsampling='bilinear')
m = SkipGateESANet(cfg)
v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
           jnp.zeros((1, 64, 64, 1)), train=False)
save_torch_checkpoint(r'{tmp_path}/ref.pth', v['params'], v['batch_stats'])
print('saved')
"""
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    env["DYNMM_FORCE_CPU"] = "1"
    r = subprocess.run([sys.executable, "-c", script], env=env, cwd=tmp_path,
                       capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]

    result = run_cli(
        "eval.py",
        TINY_FLAGS + ["--dynamic", "--global-gate", "--hard",
                      "--ckpt_path", str(tmp_path / "ref.pth")],
        tmp_path,
    )
    assert result.returncode == 0, result.stderr[-3000:]
    assert "Loaded checkpoint" in result.stdout and "Mean" in result.stdout


def test_predict_cli(tmp_path):
    """predict.py writes colored predictions + routing report from a trained
    checkpoint."""
    result = run_cli(
        "train.py",
        TINY_FLAGS + ["--dynamic", "--global-gate", "--epochs", "1",
                      "--eval-every", "1", "--results_dir", str(tmp_path)],
        tmp_path,
    )
    assert result.returncode == 0, result.stderr[-3000:]
    ckpts = glob.glob(str(tmp_path / "synthetic" / "*" / "ckpt_epoch_*.msgpack"))

    result = run_cli(
        "predict.py",
        TINY_FLAGS + ["--ckpt_path", ckpts[0], "--num", "3",
                      "--out_dir", str(tmp_path / "preds")],
        tmp_path,
    )
    assert result.returncode == 0, result.stderr[-3000:]
    assert "path distribution" in result.stdout
    outs = os.listdir(tmp_path / "preds")
    assert len(outs) == 3

    # every serve mode must produce byte-identical maps (all four
    # execution strategies are bit-equal to dense hard eval by design);
    # --packed_stem (loader-thread space-to-depth packing) likewise
    for mode, extra in (("compact", []), ("dense", []),
                        ("batchmax", ["--packed_stem"])):
        tag = mode + ("_packed" if extra else "")
        result = run_cli(
            "predict.py",
            TINY_FLAGS + ["--ckpt_path", ckpts[0], "--num", "3",
                          "--serve_mode", mode, *extra,
                          "--out_dir", str(tmp_path / f"preds_{tag}")],
            tmp_path,
        )
        assert result.returncode == 0, result.stderr[-3000:]
        for f in sorted(outs):
            a = (tmp_path / "preds" / f).read_bytes()
            b = (tmp_path / f"preds_{tag}" / f).read_bytes()
            assert a == b, f"{tag} diverged on {f}"

    # strict capacity-factor compact serving: a generous factor never
    # drops, so the maps stay byte-identical to the exact chains above
    result = run_cli(
        "predict.py",
        TINY_FLAGS + ["--ckpt_path", ckpts[0], "--num", "3",
                      "--serve_mode", "compact", "--capacity_factor", "8.0",
                      "--out_dir", str(tmp_path / "preds_strict")],
        tmp_path,
    )
    assert result.returncode == 0, result.stderr[-3000:]
    assert "capacity-factor serving" in result.stdout
    for f in sorted(outs):
        a = (tmp_path / "preds" / f).read_bytes()
        b = (tmp_path / "preds_strict" / f).read_bytes()
        assert a == b, f"strict caps diverged on {f}"

    # --output_res quarter: H/4 logits + host nearest-upsample of the class
    # map. Maps are full-size but boundary pixels may differ from the
    # learned-upsample chain (documented accuracy knob) — assert size only.
    result = run_cli(
        "predict.py",
        TINY_FLAGS + ["--ckpt_path", ckpts[0], "--num", "3",
                      "--serve_mode", "compact", "--output_res", "quarter",
                      "--out_dir", str(tmp_path / "preds_quarter")],
        tmp_path,
    )
    assert result.returncode == 0, result.stderr[-3000:]
    import cv2

    for f in sorted(os.listdir(tmp_path / "preds_quarter")):
        img = cv2.imread(str(tmp_path / "preds_quarter" / f))
        assert img.shape[:2] == (64, 64), f"{f}: {img.shape}"

    # switch vs switch_host at batch_size 1: the two-phase host-dispatch
    # pipeline (gate program → one of 5 static path programs, zero cond
    # boundaries) must reproduce the in-graph cond path byte-for-byte
    for mode in ("switch", "switch_host"):
        result = run_cli(
            "predict.py",
            TINY_FLAGS + ["--ckpt_path", ckpts[0], "--num", "2",
                          "--batch_size", "1", "--serve_mode", mode,
                          "--out_dir", str(tmp_path / f"preds_{mode}")],
            tmp_path,
        )
        assert result.returncode == 0, result.stderr[-3000:]
    switch_outs = sorted(os.listdir(tmp_path / "preds_switch"))
    assert len(switch_outs) == 2
    for f in switch_outs:
        a = (tmp_path / "preds_switch" / f).read_bytes()
        b = (tmp_path / "preds_switch_host" / f).read_bytes()
        assert a == b, f"switch_host diverged on {f}"


def _make_prepared_sunrgbd(root, n_per_cam=2, hw=(64, 64)):
    """Tiny SUNRGBD-prepared layout: 2 cameras, labels_37, native res hw."""
    import cv2
    import numpy as np

    rng = np.random.default_rng(0)
    h, w = hw
    for split in ("train", "test"):
        ids, cams = [], []
        for cam in ("kv1", "kv2"):
            for i in range(n_per_cam):
                sid = f"{cam}_{split}_{i}"
                for sub, img in (
                    ("rgb", rng.integers(0, 255, (h, w, 3), dtype=np.uint8)),
                    ("depth", rng.integers(1, 60000, (h, w), dtype=np.uint16)),
                    ("depth_raw",
                     rng.integers(1, 60000, (h, w), dtype=np.uint16)),
                    ("labels_37",
                     rng.integers(0, 38, (h, w)).astype(np.uint8)),
                ):
                    d = os.path.join(root, split, sub)
                    os.makedirs(d, exist_ok=True)
                    cv2.imwrite(os.path.join(d, f"{sid}.png"), img)
                ids.append(sid)
                cams.append(cam)
        with open(os.path.join(root, f"{split}.txt"), "w") as f:
            f.write("\n".join(ids) + "\n")
        with open(os.path.join(root, f"{split}_cameras.txt"), "w") as f:
            f.write("\n".join(cams) + "\n")


def test_eval_multicamera_fullres_per_class_iou(tmp_path):
    """Multi-camera eval (per-camera mIoU breakdown), --valid_full_res
    (native-resolution forward) and --per_class_iou (VERDICT r1 weak 8)."""
    data_dir = tmp_path / "sunrgbd_prepared"
    _make_prepared_sunrgbd(str(data_dir))

    flags = [
        "--dataset", "sunrgbd", "--dataset_dir", str(data_dir),
        "--height", "32", "--width", "32",
        "--encoder", "resnet18", "--encoder_block", "BasicBlock",
        "--decoder_channels_mode", "constant", "--channels_decoder", "32",
        "--nr_decoder_blocks", "1", "--context_module", "None",
        "--upsampling", "bilinear", "--batch_size", "2",
        "--class_weighting", "None",
    ]
    result = run_cli(
        "train.py",
        flags + ["--epochs", "1", "--eval-every", "1", "--debug",
                 "--results_dir", str(tmp_path)],
        tmp_path,
    )
    assert result.returncode == 0, result.stderr[-4000:]
    ckpts = glob.glob(str(tmp_path / "sunrgbd" / "*" / "ckpt_epoch_*.msgpack"))
    assert ckpts

    result = run_cli(
        "eval.py",
        flags + ["--hard", "--valid_full_res", "--per_class_iou",
                 "--ckpt_path", ckpts[0]],
        tmp_path,
    )
    assert result.returncode == 0, result.stderr[-4000:]
    # per-camera breakdown printed for the 2-camera dataset
    assert "per-camera mIoU" in result.stdout
    assert "kv1" in result.stdout and "kv2" in result.stdout
    # per-class IoU table covers all 37 classes
    assert "per-class IoU" in result.stdout
    assert result.stdout.count("class_") == 37


def test_eval_cli_bf16(tmp_path):
    """--dtype bfloat16 is the shipped serving configuration (VERDICT r2
    item 6): eval.py must run the hard-gate path in bf16 end to end."""
    result = run_cli(
        "train.py",
        TINY_FLAGS
        + ["--dynamic", "--global-gate", "--epochs", "1", "--eval-every", "1",
           "--results_dir", str(tmp_path)],
        tmp_path,
    )
    assert result.returncode == 0, result.stderr[-4000:]
    ckpts = glob.glob(str(tmp_path / "synthetic" / "*" / "ckpt_epoch_*.msgpack"))
    assert ckpts

    result = run_cli(
        "eval.py",
        TINY_FLAGS + ["--dynamic", "--global-gate", "--hard",
                      "--dtype", "bfloat16", "--ckpt_path", ckpts[0]],
        tmp_path,
    )
    assert result.returncode == 0, result.stderr[-4000:]
    assert "Mean" in result.stdout


def test_eval_cli_int8(tmp_path):
    """--quant int8: abs-max calibration on clean batches, then the int8
    twin scores through the same metric chain (the accuracy knob for the
    quantized serving path, nn/quant.py)."""
    result = run_cli(
        "train.py",
        TINY_FLAGS
        + ["--dynamic", "--global-gate", "--epochs", "1", "--eval-every", "1",
           "--results_dir", str(tmp_path)],
        tmp_path,
    )
    assert result.returncode == 0, result.stderr[-4000:]
    ckpts = glob.glob(str(tmp_path / "synthetic" / "*" / "ckpt_epoch_*.msgpack"))
    assert ckpts

    result = run_cli(
        "eval.py",
        TINY_FLAGS + ["--dynamic", "--global-gate", "--hard",
                      "--quant", "int8", "--calib_batches", "2",
                      "--ckpt_path", ckpts[0]],
        tmp_path,
    )
    assert result.returncode == 0, result.stderr[-4000:]
    assert "Calibrated int8 scales" in result.stdout
    assert "Mean" in result.stdout

    # percentile estimator (--calib_estimator): clipped activation scales
    # through the same chain (utils/quantize.select_scales)
    result = run_cli(
        "eval.py",
        TINY_FLAGS + ["--dynamic", "--global-gate", "--hard",
                      "--quant", "int8", "--calib_batches", "2",
                      "--calib_estimator", "percentile",
                      "--calib_percentile", "99.9",
                      "--ckpt_path", ckpts[0]],
        tmp_path,
    )
    assert result.returncode == 0, result.stderr[-4000:]
    assert "percentile p99.9" in result.stdout
    assert "Mean" in result.stdout

    # predict.py serves the int8 twin (batchmax strategy, quarter-res map)
    result = run_cli(
        "predict.py",
        TINY_FLAGS + ["--ckpt_path", ckpts[0], "--quant", "int8",
                      "--calib_batches", "1", "--num", "2",
                      "--output_res", "quarter",
                      "--out_dir", str(tmp_path / "preds_int8")],
        tmp_path,
    )
    assert result.returncode == 0, result.stderr[-4000:]
    assert "Calibrated int8 scales" in result.stdout
    assert "path distribution" in result.stdout
