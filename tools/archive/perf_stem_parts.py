#!/usr/bin/env python
"""Decompose the fused stem kernel's 2.4 ms (vs XLA's 1.66, HBM floor ~0.9):
pass-1 sums alone, pass-2 alone, pass-2 variants without the col-pool /
without the second map, to locate the VPU overhead."""

import functools
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from _harness import measure_all, scan_bench


def main():
    from bench import setup_compilation_cache
    setup_compilation_cache()
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from dynmm_tpu.kernels import stem_fuse as sf

    rng = np.random.default_rng(0)
    b, h, w, c = 8, 240, 320, 64
    rgb = jnp.asarray(rng.standard_normal((b, h, w, c)).astype(np.float32))
    dep = jnp.asarray(rng.standard_normal((b, h, w, c)).astype(np.float32))
    s_r = jnp.asarray(rng.random((b, c)).astype(np.float32))
    s_d = jnp.asarray(rng.random((b, c)).astype(np.float32))

    out_rows = sf._pick_out_rows(h)
    n_tiles = h // (2 * out_rows)
    wf, cf = w // 4, 4 * c

    def build_variant(body, out_c):
        """pallas_call with the standard fuse-pool plumbing but a custom
        kernel body(band_rgb, band_dep, s_r, s_d) -> (out1, out2)."""
        def kern(sr_ref, sd_ref, rgb_ref, dep_ref, rh_ref, dh_ref,
                 o1_ref, o2_ref):
            rgbb = jnp.concatenate([rh_ref[0], rgb_ref[0]], axis=0)
            depb = jnp.concatenate([dh_ref[0], dep_ref[0]], axis=0)
            o1, o2 = body(rgbb, depb, sr_ref[0, 0], sd_ref[0, 0])
            o1_ref[0] = o1
            o2_ref[0] = o2

        def run(rgb4, dep4, srf, sdf, halo_r, halo_d):
            gate_spec = pl.BlockSpec((1, 8, cf), lambda i, j: (i, 0, 0),
                                     memory_space=pltpu.VMEM)
            blk = pl.BlockSpec((1, 2 * out_rows, wf, cf),
                               lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM)
            halo = pl.BlockSpec((1, 1, wf, cf), lambda i, j: (i, j, 0, 0),
                                memory_space=pltpu.VMEM)
            outs = pl.BlockSpec((1, out_rows, wf, out_c),
                                lambda i, j: (i, j, 0, 0),
                                memory_space=pltpu.VMEM)
            return pl.pallas_call(
                kern,
                grid=(b, n_tiles),
                in_specs=[gate_spec, gate_spec, blk, blk, halo, halo],
                out_specs=[outs, outs],
                out_shape=[jax.ShapeDtypeStruct(
                    (b, h // 2, wf, out_c), jnp.float32)] * 2,
            )(srf, sdf, rgb4, dep4, halo_r, halo_d)

        return run

    rgb4 = rgb.reshape(b, h, wf, cf)
    dep4 = dep.reshape(b, h, wf, cf)
    halo_idx = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32),
         2 * out_rows * jnp.arange(1, n_tiles, dtype=jnp.int32) - 1])
    halo_r = jnp.take(rgb4, halo_idx, axis=1)
    halo_d = jnp.take(dep4, halo_idx, axis=1)
    srf = jnp.broadcast_to(jnp.tile(s_r, (1, 4))[:, None, :], (b, 8, cf))
    sdf = jnp.broadcast_to(jnp.tile(s_d, (1, 4))[:, None, :], (b, 8, cf))

    def body_full(rgbb, depb, sr, sd):
        fused = rgbb * sr[None, None, :] + depb * sd[None, None, :]
        fm = sf._row_pool(fused, out_rows)
        dm = sf._row_pool(depb, out_rows)
        return (sf._col_pool_folded(fm, c), sf._col_pool_folded(dm, c))

    def body_nocol(rgbb, depb, sr, sd):
        fused = rgbb * sr[None, None, :] + depb * sd[None, None, :]
        fm = sf._row_pool(fused, out_rows)
        dm = sf._row_pool(depb, out_rows)
        return fm[..., : 2 * c], dm[..., : 2 * c]

    def body_noscale(rgbb, depb, sr, sd):
        fm = sf._row_pool(rgbb, out_rows)
        dm = sf._row_pool(depb, out_rows)
        return (sf._col_pool_folded(fm, c), sf._col_pool_folded(dm, c))

    def body_copyonly(rgbb, depb, sr, sd):
        return (rgbb[1 : out_rows + 1, :, : 2 * c],
                depb[1 : out_rows + 1, :, : 2 * c])

    runs, argsets = {}, {}
    args6 = (rgb4, dep4, srf, sdf, halo_r, halo_d)
    for name, bodyf, oc in [
        ("k_full", body_full, 2 * c),
        ("k_nocol", body_nocol, 2 * c),
        ("k_noscale", body_noscale, 2 * c),
        ("k_copyonly", body_copyonly, 2 * c),
    ]:
        f = build_variant(bodyf, oc)
        runs[name] = scan_bench(lambda *a, f=f: f(*a)[0])
        argsets[name] = args6

    runs["sums_only"] = scan_bench(
        lambda r, d: sf.channel_sums(r, d)[0] + 0.0)
    argsets["sums_only"] = (rgb, dep)
    runs["xla_unfused"] = scan_bench(
        lambda r, d: sf.reference_stem_fusion(
            r, d,
            *( [jnp.zeros((c, c // 16)), jnp.zeros((c // 16,)),
                jnp.zeros((c // 16, c)), jnp.zeros((c,))] * 2))[0])
    argsets["xla_unfused"] = (rgb, dep)

    measure_all(runs, argsets)


if __name__ == "__main__":
    main()
