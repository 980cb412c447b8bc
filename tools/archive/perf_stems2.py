#!/usr/bin/env python
"""Where do the stems' 4.1 ms go? (cell alone is 1.5 ms, stem convs should
be ~0.5 — ~2 ms unaccounted). Interleaved decomposition."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from _harness import measure_all, scan_bench


def main():
    from bench import make_eval_batch, setup_compilation_cache
    setup_compilation_cache()
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship

    model = _flagship(480, 640)
    rng = np.random.default_rng(0)
    rgb0, depth0 = make_eval_batch(rng, 8, 480, 640)
    rgb, depth = jnp.asarray(rgb0), jnp.asarray(depth0)
    variables = model.init(jax.random.PRNGKey(0), rgb, depth, train=False)

    def conv_rgb(mdl, r, d):
        return mdl.encoder_rgb.stem(r, False)

    def conv_both(mdl, r, d):
        return (mdl.encoder_rgb.stem(r, False)
                + mdl.encoder_depth.stem(d, False))

    def stems_full(mdl, r, d):
        a, b = mdl._stems(r, d, False)
        return a + b[:, :1, :1, :1] * 1e-30

    def cell_from_convs(mdl, r, d):
        x = mdl.encoder_rgb.stem(r, False)
        y = mdl.encoder_depth.stem(d, False)
        a, b = mdl.se_layer0_mod.fuse_and_pool(x, y)
        return a + b[:, :1, :1, :1] * 1e-30

    cands = {
        "conv_rgb": conv_rgb,
        "conv_both": conv_both,
        "stems_full": stems_full,
        "cell_from_convs": cell_from_convs,
    }
    runs, argsets = {}, {}
    for k, f in cands.items():
        runs[k] = scan_bench(
            lambda r, d, v, f=f: model.apply(v, r, d, method=f))
        argsets[k] = (rgb, depth, variables)
    meds = measure_all(runs, argsets)
    print(f"\n  stem convs (both):    {meds['conv_both']*1e3:7.3f}")
    print(f"  + cell (fuse+pools):  "
          f"{(meds['cell_from_convs']-meds['conv_both'])*1e3:7.3f}")
    print(f"  stems_full:           {meds['stems_full']*1e3:7.3f}")


if __name__ == "__main__":
    main()
