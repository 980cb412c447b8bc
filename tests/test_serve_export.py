"""StableHLO serving-artifact export (utils/serve_export.py): the TPU-native
deploy analogue of the reference's ONNX export patches (SURVEY §2.2
external_code/). Round-trip: export with baked weights → deserialize →
outputs match the live model (to recompilation-level float noise — the
artifact's graph is re-optimized at load, so last-ulp differences are
expected; class maps must be identical)."""

import glob
import os
import subprocess
import sys

import numpy as np

import jax
import jax.numpy as jnp

from dynmm_tpu.models.esanet import ESANetConfig
from dynmm_tpu.models.skip_gate import SkipGateESANet
from dynmm_tpu.utils.serve_export import (export_serving_fn, load_serving_fn,
                                          save_serving_artifact)

import pytest

slow = pytest.mark.slow  # heavier round-trips; -m "not slow" skips

CFG = ESANetConfig(
    height=64, width=64, num_classes=5,
    encoder_rgb="resnet18", encoder_depth="resnet18",
    encoder_block="BasicBlock",
    channels_decoder=(32, 32, 32), nr_decoder_blocks=(1, 1, 1),
    fuse_depth_in_rgb_encoder="SE-add", context_module="None",
    upsampling="bilinear",
)


@slow
def test_export_roundtrip_matches_live_model(tmp_path):
    model = SkipGateESANet(CFG)
    rng = np.random.default_rng(0)
    rgb = jnp.asarray(rng.standard_normal((2, 64, 64, 3)).astype(np.float32))
    depth = jnp.asarray(rng.standard_normal((2, 64, 64, 1)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), rgb, depth, train=False)

    def apply_fn(v, r, d):
        return model.apply(v, r, d, train=False, hard=True)

    payload = export_serving_fn(
        apply_fn, variables, rgb.shape, depth.shape
    )
    path = tmp_path / "serving.stablehlo"
    save_serving_artifact(str(path), payload)
    assert path.stat().st_size > 1000

    fn = load_serving_fn(str(path))
    got = np.asarray(fn(rgb, depth))
    want = np.asarray(apply_fn(variables, rgb, depth))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(got.argmax(-1), want.argmax(-1))

    # multi-platform artifact (tpu+cpu) exports from a CPU-only host and
    # still replays on cpu — the cross-compile deploy path
    payload2 = export_serving_fn(
        apply_fn, variables, rgb.shape, depth.shape,
        platforms=("cpu", "tpu"),
    )
    path2 = tmp_path / "serving_xplat.stablehlo"
    save_serving_artifact(str(path2), payload2)
    fn2 = load_serving_fn(str(path2))
    np.testing.assert_array_equal(
        np.asarray(fn2(rgb, depth)).argmax(-1), want.argmax(-1)
    )


@slow
def test_export_modality_router(tmp_path):
    """Generic arity: the IMDB 2-branch router (text 300-d, image 4096-d
    inputs) exports and replays with identical branch outputs."""
    from dynmm_tpu.models.modality.imdb import IMDBDynMMNet

    model = IMDBDynMMNet(dropout_rate=0.0)
    rng = np.random.default_rng(0)
    text = jnp.asarray(rng.standard_normal((4, 300)).astype(np.float32))
    image = jnp.asarray(rng.standard_normal((4, 4096)).astype(np.float32))
    variables = model.init(
        jax.random.PRNGKey(0), [text, image], train=False
    )

    def apply_fn(v, t, i):
        out, _, _ = model.apply(v, [t, i], hard=True, train=False)
        return out

    payload = export_serving_fn(
        apply_fn, variables, text.shape, image.shape
    )
    path = tmp_path / "imdb.stablehlo"
    save_serving_artifact(str(path), payload)
    fn = load_serving_fn(str(path))
    np.testing.assert_allclose(
        np.asarray(fn(text, image)),
        np.asarray(apply_fn(variables, text, image)),
        rtol=1e-5, atol=1e-6,
    )

# ---------------------------------------------------------------------------
# int8 chain export (VERDICT r4 item 4): the fastest serving configuration
# (--quant int8) must be provably exportable — export through the real
# predict.py CLI, reload the artifact, and reproduce the in-process int8
# class maps byte-for-byte. In the FAST suite by design: the export path is
# the deploy contract for the headline chain.

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

TINY_FLAGS = [
    "--dataset", "synthetic", "--height", "64", "--width", "64",
    "--encoder", "resnet18", "--encoder_block", "BasicBlock",
    "--decoder_channels_mode", "constant", "--channels_decoder", "32",
    "--nr_decoder_blocks", "1", "--context_module", "None",
    "--upsampling", "bilinear", "--batch_size", "2", "--debug",
]


def _run_cli(script_or_code, args, cwd, code=False):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env["DYNMM_FORCE_CPU"] = "1"
    cmd = ([sys.executable, "-c", script_or_code] if code
           else [sys.executable, os.path.join(REPO, script_or_code), *args])
    return subprocess.run(cmd, cwd=cwd, env=env, capture_output=True,
                          text=True, timeout=1200)


def test_int8_export_cli_byte_equal(tmp_path):
    """predict.py --quant int8 --serve_mode dense --export_path → reload the
    StableHLO artifact (int8 scales baked in with the weights) → class maps
    byte-equal to the in-process int8 predict run."""
    r = _run_cli(
        "train.py",
        TINY_FLAGS + ["--dynamic", "--global-gate", "--epochs", "1",
                      "--eval-every", "1", "--results_dir", str(tmp_path)],
        tmp_path,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    ckpts = glob.glob(
        str(tmp_path / "synthetic" / "*" / "ckpt_epoch_*.msgpack"))
    assert ckpts

    # in-process int8 maps (dense strategy, full-res)
    r = _run_cli(
        "predict.py",
        TINY_FLAGS + ["--ckpt_path", ckpts[0], "--quant", "int8",
                      "--calib_batches", "1", "--serve_mode", "dense",
                      "--num", "2", "--out_dir", str(tmp_path / "preds")],
        tmp_path,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    assert "Calibrated int8 scales" in r.stdout
    outs = sorted(os.listdir(tmp_path / "preds"))
    assert len(outs) == 2

    # export the same chain (same ckpt, same calibration feed)
    art = tmp_path / "int8_dense.stablehlo"
    r = _run_cli(
        "predict.py",
        TINY_FLAGS + ["--ckpt_path", ckpts[0], "--quant", "int8",
                      "--calib_batches", "1", "--serve_mode", "dense",
                      "--export_path", str(art)],
        tmp_path,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    assert "exported serving artifact" in r.stdout
    assert art.stat().st_size > 1000

    # reload and drive the artifact over the identical serving feed,
    # writing maps exactly like predict.py's loop
    driver = f"""
from dynmm_tpu.utils.platform import maybe_force_cpu
maybe_force_cpu()
import os
import numpy as np
import jax.numpy as jnp
from dynmm_tpu.cli.seg_build import SyntheticSegDataset
from dynmm_tpu.data.nyuv2 import class_colors
from dynmm_tpu.data.seg_preprocessing import SegLoader, SegPreprocessor
from dynmm_tpu.nn.layers import first_argmax
from dynmm_tpu.utils.serve_export import load_serving_fn

ds = SyntheticSegDataset(n=8, height=64, width=64, split="test")
pre = SegPreprocessor(getattr(ds, "depth_mean", 0.0),
                      getattr(ds, "depth_std", 1.0), 64, 64, phase="test")
loader = SegLoader(ds, pre, batch_size=2)
fn = load_serving_fn(r'{art}')
batch = next(iter(loader))
logits = fn(jnp.asarray(batch["image"]), jnp.asarray(batch["depth"]))
pred = np.asarray(first_argmax(logits, axis=-1))
colors = class_colors(ds.n_classes_without_void + 1)
os.makedirs(r'{tmp_path / "preds_art"}', exist_ok=True)
import cv2
for i, img in enumerate(pred):
    cv2.imwrite(os.path.join(r'{tmp_path / "preds_art"}',
                             f"pred_{{i:05d}}.png"),
                colors[img + 1][:, :, ::-1])
print("replayed", len(pred))
"""
    r = _run_cli(driver, [], tmp_path, code=True)
    assert r.returncode == 0, r.stderr[-3000:]
    assert "replayed 2" in r.stdout
    for f in outs:
        a = (tmp_path / "preds" / f).read_bytes()
        b = (tmp_path / "preds_art" / f).read_bytes()
        assert a == b, f"int8 artifact diverged on {f}"
