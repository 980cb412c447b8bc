#!/usr/bin/env python
"""Why does whole-model bf16 buy only ~14% on a memory-bound model?
Per-part fp32 vs bf16, interleaved. If a part fails to reach ~1.7-2x, its
bf16 lowering is keeping fp32 layouts/copies somewhere."""

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

    h, w = 480, 640
    m32 = _flagship(h, w)
    m16 = _flagship(h, w, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    rgb0, depth0 = make_eval_batch(rng, 8, h, w)
    rgb, depth = jnp.asarray(rgb0), jnp.asarray(depth0)
    variables = m32.init(jax.random.PRNGKey(0), rgb, depth, train=False)
    rgb16 = rgb.astype(jnp.bfloat16)
    depth16 = depth.astype(jnp.bfloat16)

    def stems(m):
        return lambda mdl, r, d: mdl._stems(r, d, False)[0]

    def thru_enc(mdl, r, d):
        rp, dp = mdl._stems(r, d, False)
        fused = rp
        skips = []
        for i in (1, 2, 3):
            x = getattr(mdl.encoder_rgb, f"layer{i}")(fused, False)
            dp = getattr(mdl.encoder_depth, f"layer{i}")(dp, False)
            fused = mdl.fuse(i, x, dp)
            skips.append(mdl.skip(i, fused, False))
        x = mdl.encoder_rgb.layer4(fused, False)
        dp = mdl.encoder_depth.layer4(dp, False)
        return mdl.fuse(4, x, dp)

    cands = {
        "full_fp32": lambda r, d, v: m32.apply(v, r, d, train=False,
                                               baseline=True),
        "full_bf16": lambda r, d, v: m16.apply(v, r, d, train=False,
                                               baseline=True),
        "full_bf16_bf16in": lambda r, d, v: m16.apply(
            v, r.astype(jnp.bfloat16), d.astype(jnp.bfloat16),
            train=False, baseline=True),
        "stems_fp32": lambda r, d, v: m32.apply(
            v, r, d, method=lambda mdl, r, d: mdl._stems(r, d, False)[0]),
        "stems_bf16": lambda r, d, v: m16.apply(
            v, r, d, method=lambda mdl, r, d: mdl._stems(r, d, False)[0]),
        "enc_fp32": lambda r, d, v: m32.apply(v, r, d, method=thru_enc),
        "enc_bf16": lambda r, d, v: m16.apply(v, r, d, method=thru_enc),
    }
    runs, argsets = {}, {}
    for k, f in cands.items():
        runs[k] = scan_bench(f)
        argsets[k] = (rgb, depth, variables)

    meds = measure_all(runs, argsets)
    print("\nbf16 speedups:")
    for a, b in (("full_fp32", "full_bf16"),
                 ("full_fp32", "full_bf16_bf16in"),
                 ("stems_fp32", "stems_bf16"), ("enc_fp32", "enc_bf16")):
        print(f"  {b:<18} {meds[a]/meds[b]:.2f}x vs {a}")
    dec32 = meds["full_fp32"] - meds["enc_fp32"]
    dec16 = meds["full_bf16"] - meds["enc_bf16"]
    print(f"  decoder fp32 {dec32*1e3:.2f} ms -> bf16 {dec16*1e3:.2f} ms")


if __name__ == "__main__":
    main()
