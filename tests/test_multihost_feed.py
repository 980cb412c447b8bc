"""Multi-host input-pipeline readiness (SURVEY §5.8, VERDICT r3 item 6):
ProcessShard dataset views + make_global_batch
(jax.make_array_from_process_local_data) on the 8-device virtual CPU mesh,
plus the recipe-gate asset plumbing (subtree merge, mixed eval batch)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dynmm_tpu.data.nyuv2 import SyntheticSegDataset
from dynmm_tpu.parallel import ProcessShard, make_global_batch, make_mesh


class _ListDS:
    def __init__(self, items):
        self.items = items
        self.n_classes_without_void = 40  # delegated attribute

    def __len__(self):
        return len(self.items)

    def __getitem__(self, i):
        return self.items[i]


class TestProcessShard:
    def test_partition_covers_and_is_disjoint(self):
        ds = _ListDS(list(range(19)))
        seen = []
        for pi in range(4):
            shard = ProcessShard(ds, process_index=pi, process_count=4)
            assert len(shard) == 4  # 19 // 4, ragged tail dropped
            seen += [shard[i] for i in range(len(shard))]
        assert seen == list(range(16))
        assert len(set(seen)) == len(seen)

    def test_attribute_delegation_and_bounds(self):
        shard = ProcessShard(_ListDS(list(range(8))), process_index=1,
                             process_count=2)
        assert shard.n_classes_without_void == 40
        assert shard[0] == 4
        with pytest.raises(IndexError):
            shard[4]

    def test_defaults_to_live_runtime(self):
        # single-process runtime: the shard is the whole dataset
        shard = ProcessShard(_ListDS(list(range(6))))
        assert len(shard) == 6 and shard[5] == 5


class TestMakeGlobalBatch:
    def test_matches_shard_batch_values_and_layout(self):
        from dynmm_tpu.parallel import shard_batch

        mesh = make_mesh(4, 2)
        x = np.arange(8 * 3 * 5, dtype=np.float32).reshape(8, 3, 5)
        y = np.arange(8, dtype=np.int32)
        ga = make_global_batch((x, y), mesh)
        sb = shard_batch((x, y), mesh)
        for g, s, ref in zip(ga, sb, (x, y)):
            assert g.shape == ref.shape
            np.testing.assert_array_equal(np.asarray(g), ref)
            assert g.sharding == s.sharding

    def test_feeds_sharded_compute(self):
        mesh = make_mesh(8, 1)
        (x,) = make_global_batch(
            (np.ones((16, 4), np.float32),), mesh)
        with jax.set_mesh(mesh):
            out = jax.jit(lambda a: (a * 2).sum())(x)
        assert float(out) == 128.0


class TestMixedSyntheticDataset:
    def test_default_generation_unchanged(self):
        a = SyntheticSegDataset(n=2, height=64, width=64)[0]
        b = SyntheticSegDataset(n=2, height=64, width=64,
                                mixed_modality_frac=0.0)[0]
        for k in ("image", "depth", "label"):
            np.testing.assert_array_equal(a[k], b[k])

    def test_depth_needed_matches_generation(self):
        ds = SyntheticSegDataset(n=64, height=64, width=64,
                                 mixed_modality_frac=0.5)
        n_hard = 0
        for i in range(64):
            s = ds[i]
            hard = ds.depth_needed(i)
            n_hard += hard
            depth_span = float(s["depth"].max() - s["depth"].min())
            if hard:
                # informative depth: class-dependent, wide span
                assert depth_span > 500.0
            else:
                # near-flat depth
                assert depth_span < 500.0
        assert 16 <= n_hard <= 48  # ~half at frac 0.5

    def test_rgb_ambiguous_only_on_depth_needed(self):
        ds = SyntheticSegDataset(n=32, height=64, width=64, seed=3,
                                 mixed_modality_frac=0.5)
        for i in range(32):
            s = ds[i]
            lab, img = s["label"].astype(int), s["image"].astype(np.float32)
            # mean image value per label class should separate adjacent
            # classes on easy samples but collapse pairs on hard ones
            classes = [c for c in np.unique(lab) if c > 0]
            pair = None
            for c in classes:
                mate = c + 1 if c % 2 == 1 else c - 1
                if mate in classes:
                    pair = (min(c, mate), max(c, mate))
                    break
            if pair is None:
                continue
            m0 = img[lab == pair[0]].mean()
            m1 = img[lab == pair[1]].mean()
            if ds.depth_needed(i):
                assert abs(m0 - m1) < 3.0  # pair shares rgb appearance
            else:
                assert abs(m0 - m1) > 3.0


class TestRecipeGateAsset:
    def test_merge_subtree_and_eval_batch(self, tmp_path):
        import flax.serialization

        import bench

        # fabricate a tiny variables tree + asset subtree
        variables = {
            "params": {
                "gate_layer": {"fc": {"kernel": np.zeros((2, 2), np.float32)}},
                "encoder_rgb": {
                    "conv1": {"kernel": np.zeros((3, 3), np.float32)},
                    "layer1": {"w": np.zeros((4,), np.float32)},
                },
            },
            "batch_stats": {
                "encoder_rgb": {"bn1": {"mean": np.zeros((3,), np.float32)}},
            },
        }
        asset = {
            "subtree": {
                "params": {
                    "gate_layer": {"fc": {"kernel": np.ones((2, 2),
                                                            np.float32)}},
                    "encoder_rgb": {"conv1": {"kernel": 2 * np.ones(
                        (3, 3), np.float32)}},
                },
                "batch_stats": {
                    "encoder_rgb": {"bn1": {"mean": 3 * np.ones(
                        (3,), np.float32)}},
                },
            },
            "branch_ratios": np.array([0.5, 0, 0, 0, 0.5], np.float32),
            "provenance": {"recipe": "test"},
        }
        with open(tmp_path / "gate_recipe.msgpack", "wb") as f:
            f.write(flax.serialization.msgpack_serialize(asset))

        merged, ratios, prov = bench.load_recipe_gate(
            variables, asset_dir=str(tmp_path))
        assert prov["recipe"] == "test"
        np.testing.assert_allclose(np.asarray(ratios),
                                   [0.5, 0, 0, 0, 0.5])
        assert (merged["params"]["gate_layer"]["fc"]["kernel"] == 1).all()
        assert (merged["params"]["encoder_rgb"]["conv1"]["kernel"] == 2).all()
        # untouched leaves stay
        assert (merged["params"]["encoder_rgb"]["layer1"]["w"] == 0).all()
        assert (merged["batch_stats"]["encoder_rgb"]["bn1"]["mean"] == 3).all()

    def test_recipe_eval_batch_exact_mix(self):
        import bench

        rgb, depth = bench.make_recipe_eval_batch(4, 64, 64)
        assert rgb.shape == (4, 64, 64, 3) and depth.shape == (4, 64, 64, 1)
        assert rgb.dtype == np.float32
        # exactly half the batch has (normalized) informative depth: its
        # per-sample std is far above the flat samples'
        stds = depth.reshape(4, -1).std(axis=1)
        assert (stds > np.median(stds)).sum() == 2
        assert stds.max() / stds.min() > 3
