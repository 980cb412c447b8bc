"""Fused stem SE-fusion + maxpool kernel vs the unfused jnp oracle.

Interpret mode runs everywhere (conftest forces CPU); the same code path
compiles on the TPU (exercised by tools/perf_stem.py and bench.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dynmm_tpu.kernels.stem_fuse import (
    channel_sums,
    fused_stem_fusion,
    reference_stem_fusion,
    se_gate_from_sums,
    stem_se_fusion_pool,
)

C = 64
RED = 16  # SE reduction


def _mk(bs=2, h=40, w=32, seed=0):
    rng = np.random.default_rng(seed)
    rgb = jnp.asarray(rng.standard_normal((bs, h, w, C)).astype(np.float32))
    depth = jnp.asarray(rng.standard_normal((bs, h, w, C)).astype(np.float32))
    ws = []
    for _ in range(2):  # rgb then depth SE mlp
        ws += [
            jnp.asarray(rng.standard_normal((C, C // RED)).astype(np.float32)
                        * 0.2),
            jnp.asarray(rng.standard_normal((C // RED,)).astype(np.float32)),
            jnp.asarray(rng.standard_normal((C // RED, C)).astype(np.float32)
                        * 0.2),
            jnp.asarray(rng.standard_normal((C,)).astype(np.float32)),
        ]
    return rgb, depth, ws


class TestChannelSums:
    def test_matches_sum(self):
        rgb, depth, _ = _mk()
        sr, sd = channel_sums(rgb, depth, tile_rows=10, interpret=True)
        # tiled accumulation reorders float adds: tolerance is absolute
        np.testing.assert_allclose(
            np.asarray(sr), np.asarray(rgb.sum(axis=(1, 2))),
            rtol=1e-5, atol=1e-3)
        np.testing.assert_allclose(
            np.asarray(sd), np.asarray(depth.sum(axis=(1, 2))),
            rtol=1e-5, atol=1e-3)


class TestFusedStemCell:
    @pytest.mark.parametrize("h,w,out_rows", [(40, 32, 10), (48, 64, 4)])
    def test_matches_oracle(self, h, w, out_rows):
        rgb, depth, ws = _mk(h=h, w=w)
        ref_f, ref_d = reference_stem_fusion(rgb, depth, *ws)

        sums_r, sums_d = channel_sums(rgb, depth, tile_rows=h // 4,
                                      interpret=True)
        s_r = se_gate_from_sums(sums_r, h * w, *ws[:4])
        s_d = se_gate_from_sums(sums_d, h * w, *ws[4:])
        out_f, out_d = fused_stem_fusion(
            rgb, depth, s_r.astype(rgb.dtype), s_d.astype(rgb.dtype),
            out_rows=out_rows, interpret=True)

        assert out_f.shape == ref_f.shape == (2, h // 2, w // 2, C)
        np.testing.assert_allclose(np.asarray(out_d), np.asarray(ref_d),
                                   rtol=1e-6, atol=1e-6)
        np.testing.assert_allclose(np.asarray(out_f), np.asarray(ref_f),
                                   rtol=1e-5, atol=1e-5)

    def test_end_to_end_wrapper(self):
        rgb, depth, ws = _mk(h=48, w=64, seed=3)
        ref_f, ref_d = reference_stem_fusion(rgb, depth, *ws)
        out_f, out_d = stem_se_fusion_pool(rgb, depth, *ws, interpret=True)
        np.testing.assert_allclose(np.asarray(out_f), np.asarray(ref_f),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(out_d), np.asarray(ref_d),
                                   rtol=1e-6, atol=1e-6)

    def test_negative_rows_edge(self):
        """Edge replication must equal −inf padding even when the map is all
        negative (max at the border picks in-window values, never the pad)."""
        rgb, depth, ws = _mk(h=40, w=32, seed=5)
        rgb = -jnp.abs(rgb) - 1.0
        depth = -jnp.abs(depth) - 1.0
        ref_f, ref_d = reference_stem_fusion(rgb, depth, *ws)
        out_f, out_d = stem_se_fusion_pool(rgb, depth, *ws, interpret=True)
        np.testing.assert_allclose(np.asarray(out_f), np.asarray(ref_f),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(out_d), np.asarray(ref_d),
                                   rtol=1e-6, atol=1e-6)
