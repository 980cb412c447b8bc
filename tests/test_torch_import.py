"""Tests for the PyTorch checkpoint importer: key translation, tensor layout
transforms, and round-trip into a real SkipGateESANet param tree."""

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

from dynmm_tpu.models.esanet import ESANetConfig
from dynmm_tpu.models.skip_gate import SkipGateESANet
from dynmm_tpu.utils.torch_import import (
    import_torch_checkpoint,
    load_torch_module_pickle,
    state_dict_to_trees,
    translate_seg_key,
)


class TestKeyTranslation:
    @pytest.mark.parametrize(
        "torch_key,expected",
        [
            ("encoder_rgb.conv1.weight", "encoder_rgb.conv1.weight"),
            ("encoder_rgb.layer1.0.conv1.weight", "encoder_rgb.layer1.block0.conv1.weight"),
            ("encoder_rgb.layer2.0.downsample.0.weight", "encoder_rgb.layer2.block0.ds_conv.weight"),
            ("encoder_rgb.layer2.0.downsample.1.running_mean", "encoder_rgb.layer2.block0.ds_bn.running_mean"),
            ("encoder_depth.layer3.5.conv1x3_2.bias", "encoder_depth.layer3.block5.conv1x3_2.bias"),
            ("se_layer1.se_rgb.fc.0.weight", "se_layer1.se_rgb.fc1.weight"),
            ("se_layer1.se_depth.fc.2.bias", "se_layer1.se_depth.fc2.bias"),
            ("skip_layer1.0.conv.weight", "skip_layer1.conv.weight"),
            ("context_module.features.0.1.conv.weight", "context_module.feature0.conv.weight"),
            ("context_module.final_conv.bn.weight", "context_module.final_conv.bn.weight"),
            ("decoder.decoder_module_1.decoder_blocks.0.conv3x1_1.weight",
             "decoder.decoder_module_1.decoder_blocks0.conv3x1_1.weight"),
            ("decoder.decoder_module_2.side_output.bias", "decoder.decoder_module_2.side_output.bias"),
            ("decoder.upsample1.conv.weight", "decoder.upsample1.conv.weight"),
            ("gate_layer.conv.0.weight", "gate_layer.conv1.weight"),
            ("gate_layer.conv.1.running_var", "gate_layer.bn1.running_var"),
            ("gate_layer.conv.3.bias", "gate_layer.conv2.bias"),
            ("gate_layer.conv.4.weight", "gate_layer.bn2.weight"),
            ("gate_layer.fc.weight", "gate_layer.fc.weight"),
        ],
    )
    def test_translation(self, torch_key, expected):
        assert translate_seg_key(torch_key) == expected


class TestTensorTransforms:
    def test_conv_bn_linear_layouts(self):
        sd = {
            "m.conv1.weight": np.zeros((8, 3, 7, 7), np.float32),     # conv OIHW
            "m.bn1.weight": np.ones(8, np.float32),                   # BN scale
            "m.bn1.bias": np.zeros(8, np.float32),
            "m.bn1.running_mean": np.zeros(8, np.float32),
            "m.bn1.running_var": np.ones(8, np.float32),
            "m.bn1.num_batches_tracked": np.array(5),
            "m.fc.weight": np.zeros((23, 512), np.float32),           # linear
            "m.dw.weight": np.zeros((16, 1, 3, 3), np.float32),       # depthwise
        }
        params, stats = state_dict_to_trees(sd)
        assert params["m"]["conv1"]["kernel"].shape == (7, 7, 3, 8)
        assert params["m"]["bn1"]["scale"].shape == (8,)
        assert stats["m"]["bn1"]["mean"].shape == (8,)
        assert "num_batches_tracked" not in str(params)
        assert params["m"]["fc"]["kernel"].shape == (512, 23)
        assert params["m"]["dw"]["kernel"].shape == (3, 3, 1, 16)


SMALL = ESANetConfig(
    height=64, width=64, num_classes=5,
    encoder_rgb="resnet18", encoder_depth="resnet18",
    encoder_block="NonBottleneck1D",
    channels_decoder=(64, 64, 64), nr_decoder_blocks=(1, 1, 1),
    fuse_depth_in_rgb_encoder="SE-add",
)


class TestFullImport:
    def test_import_into_skipgate(self, tmp_path):
        """Construct a torch-style state_dict covering a few representative
        tensors, save as a .pth dict checkpoint, import, and verify the values
        land at the right leaves with the right transforms."""
        model = SkipGateESANet(SMALL)
        rgb = jnp.zeros((1, 64, 64, 3))
        depth = jnp.zeros((1, 64, 64, 1))
        variables = model.init(jax.random.PRNGKey(0), rgb, depth, train=False)
        params = variables["params"]
        stats = variables["batch_stats"]

        rng = np.random.default_rng(0)
        stem = rng.standard_normal((64, 3, 7, 7)).astype(np.float32)
        gate_fc = rng.standard_normal((5, 8, 1, 1)).astype(np.float32)
        nbt_w = rng.standard_normal((64, 64, 3, 1)).astype(np.float32)
        bn_mean = rng.standard_normal(64).astype(np.float32)
        sd = {
            "encoder_rgb.conv1.weight": torch.tensor(stem),
            "encoder_rgb.layer1.0.conv3x1_1.weight": torch.tensor(nbt_w),
            "encoder_rgb.bn1.running_mean": torch.tensor(bn_mean),
            "gate_layer.fc.weight": torch.tensor(gate_fc),
        }
        path = tmp_path / "ckpt.pth"
        torch.save({"epoch": 3, "state_dict": sd, "optimizer": {}}, path)

        new_params, new_state = import_torch_checkpoint(
            str(path), params, {"batch_stats": stats}
        )
        np.testing.assert_allclose(
            np.asarray(new_params["encoder_rgb"]["conv1"]["kernel"]),
            stem.transpose(2, 3, 1, 0),
        )
        np.testing.assert_allclose(
            np.asarray(
                new_params["encoder_rgb"]["layer1"]["block0"]["conv3x1_1"]["kernel"]
            ),
            nbt_w.transpose(2, 3, 1, 0),
        )
        np.testing.assert_allclose(
            np.asarray(new_state["batch_stats"]["encoder_rgb"]["bn1"]["mean"]),
            bn_mean,
        )
        np.testing.assert_allclose(
            np.asarray(new_params["gate_layer"]["fc"]["kernel"]),
            gate_fc.transpose(2, 3, 1, 0),
        )
        # untouched leaves stay identical
        np.testing.assert_array_equal(
            np.asarray(new_params["gate_layer"]["conv1"]["kernel"]),
            np.asarray(params["gate_layer"]["conv1"]["kernel"]),
        )

    def test_all_torch_keys_consume(self, tmp_path):
        """Every conv/bn tensor name the reference architecture produces must
        translate to an existing leaf: simulate with a full fake state_dict
        derived from our own tree via inverse mapping of representative
        modules — here we check the reverse property: importing a state_dict
        with a bogus key reports it instead of silently dropping."""
        model = SkipGateESANet(SMALL)
        variables = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
            jnp.zeros((1, 64, 64, 1)), train=False,
        )
        sd = {"totally.bogus.weight": torch.zeros(3, 3)}
        path = tmp_path / "bogus.pth"
        torch.save({"state_dict": sd}, path)
        with pytest.raises(KeyError):
            import_torch_checkpoint(
                str(path), variables["params"],
                {"batch_stats": variables["batch_stats"]}, strict=True,
            )


class _PickleNet(torch.nn.Module):
    def __init__(self):
        super().__init__()
        self.fc = torch.nn.Linear(4, 2)
        self.bn = torch.nn.BatchNorm1d(2)


class TestModulePickle:
    def test_stub_unpickle_recovers_state(self, tmp_path):
        """Whole-module pickles (ModalityDynMM style) must be readable even
        when the defining class is unimportable."""
        net = _PickleNet()
        path = tmp_path / "whole.pt"
        torch.save(net, path)

        # simulate "class not importable": delete from this test module's ns
        state = load_torch_module_pickle(str(path))
        assert "fc.weight" in state and state["fc.weight"].shape == (2, 4)
        assert "bn.running_mean" in state


class TestModalityKeyTranslation:
    def test_gate_and_mlp_branches_import(self, tmp_path):
        """MultiBench-structured modality checkpoints (MLP attrs fc/fc2) load
        into the IMDB router's gate and MLP branches; structurally-different
        modules (MaxOut internals) are reported, not silently dropped."""
        import jax
        import jax.numpy as jnp

        from dynmm_tpu.models.modality import IMDBDynMMNet
        from dynmm_tpu.utils.torch_import import translate_modality_key

        assert translate_modality_key("gate.fc.weight") == "gate.fc1.weight"
        assert translate_modality_key("gate.fc2.bias") == "gate.fc2.bias"
        assert (
            translate_modality_key("branch3.encoders.0.lin.weight")
            == "branch3.encoders_0.lin.weight"
        )

        model = IMDBDynMMNet()
        text, image = jnp.zeros((1, 300)), jnp.zeros((1, 4096))
        variables = model.init(
            jax.random.PRNGKey(0), [text, image], method=model.init_all
        )
        rng_np = np.random.default_rng(0)
        gw = rng_np.standard_normal((2, 128)).astype(np.float32)
        tw = rng_np.standard_normal((512, 300)).astype(np.float32)
        sd = {
            "gate.fc2.weight": torch.tensor(gw),
            "text_encoder.fc.weight": torch.tensor(tw),
        }
        path = tmp_path / "modality.pth"
        torch.save({"state_dict": sd}, path)
        new_params, _ = import_torch_checkpoint(
            str(path), variables["params"],
            {"batch_stats": variables["batch_stats"]},
            translate=translate_modality_key,
        )
        np.testing.assert_allclose(
            np.asarray(new_params["gate"]["fc2"]["kernel"]), gw.T
        )
        np.testing.assert_allclose(
            np.asarray(new_params["text_encoder"]["fc1"]["kernel"]), tw.T
        )
