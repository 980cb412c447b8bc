"""StableHLO serving-artifact export (utils/serve_export.py): the TPU-native
deploy analogue of the reference's ONNX export patches (SURVEY §2.2
external_code/). Round-trip: export with baked weights → deserialize →
outputs match the live model (to recompilation-level float noise — the
artifact's graph is re-optimized at load, so last-ulp differences are
expected; class maps must be identical)."""

import numpy as np

import jax
import jax.numpy as jnp

from dynmm_tpu.models.esanet import ESANetConfig
from dynmm_tpu.models.skip_gate import SkipGateESANet
from dynmm_tpu.utils.serve_export import (export_serving_fn, load_serving_fn,
                                          save_serving_artifact)

import pytest

pytestmark = pytest.mark.slow  # full CLI/parity/mesh drive; -m "not slow" skips

CFG = ESANetConfig(
    height=64, width=64, num_classes=5,
    encoder_rgb="resnet18", encoder_depth="resnet18",
    encoder_block="BasicBlock",
    channels_decoder=(32, 32, 32), nr_decoder_blocks=(1, 1, 1),
    fuse_depth_in_rgb_encoder="SE-add", context_module="None",
    upsampling="bilinear",
)


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
