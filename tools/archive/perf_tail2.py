#!/usr/bin/env python
"""In-model tail cost: time the FULL flagship model with the final two C=40
upsamples (a) shift, (b) dilated, (c) naive, (d) replaced by identity — all
in one process so chip-speed drift can't confound. Inner decoder upsamples
stay shift. Identity run bounds the in-model cost of the two ops."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    from bench import make_scan_bench, measure, setup_compilation_cache

    setup_compilation_cache()
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship
    import dynmm_tpu.nn.layers as L

    h, w = 480, 640
    bs = int(os.environ.get("BS", "8"))
    model = _flagship(h, w)
    rng = np.random.default_rng(0)
    rgb = jnp.asarray(rng.standard_normal((bs, h, w, 3)).astype(np.float32))
    depth = jnp.asarray(rng.standard_normal((bs, h, w, 1)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), rgb, depth, train=False)

    @jax.jit
    def nop(v, r, d):
        return jnp.sum(r[0, 0, 0])

    def full(v, r, d):
        return model.apply(v, r, d, train=False, hard=True)

    orig_fused = L.learned3x3_zeropad_fused

    def make_patched(final_mode):
        def patched(x, k3, bias, impl="shift"):
            if x.shape[-1] != 40:
                return orig_fused(x, k3, bias, impl=impl)
            if final_mode == "identity":
                return x
            if final_mode == "naive":
                h2, w2 = x.shape[1] * 2, x.shape[2] * 2
                xx = L.resize_nearest(x, (h2, w2))
                c = x.shape[-1]
                dn = jax.lax.conv_dimension_numbers(
                    xx.shape, (3, 3, 1, c), ("NHWC", "HWIO", "NHWC"))
                out = jax.lax.conv_general_dilated(
                    xx, k3[:, :, None, :], (1, 1), ((1, 1), (1, 1)),
                    dimension_numbers=dn, feature_group_count=c)
                return out + bias
            return orig_fused(x, k3, bias, impl=final_mode)
        return patched

    def part(name, reps=3):
        t = measure(make_scan_bench(full), nop, variables, rgb, depth,
                    reps=reps)
        print(f"{name:<46} {t*1e3:8.3f} ms  ({bs/t:7.1f} fps)", flush=True)
        return t

    for mode in ["shift", "dilated", "naive", "identity"]:
        L.learned3x3_zeropad_fused = make_patched(mode)
        part(f"full model, final C=40 ups = {mode}")
    L.learned3x3_zeropad_fused = orig_fused


if __name__ == "__main__":
    main()
