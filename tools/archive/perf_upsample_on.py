"""A/B: pallas_upsample (kernels/upsample.py on the three lane-aligned
512/256/128-ch decoder-module upsamples ONLY) vs the default XLA lowering,
in-model, interleaved — VERDICT r3 item 1a. Measures the dense fp32 full-res
baseline and the dense bf16 packed q4 class-map chain (the headline serving
configuration), both ways.

Outcome feeds docs/DESIGN.md: default-on if it wins, formal closure of the
Pallas-upsample axis if it loses. Note the q4 chain never runs the final
40-ch logits upsamples (the case kernels/upsample.py already falls back on);
what pallas_upsample changes there is only the three in-decoder 512/256/128
ch x2 upsamples.
"""

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
from tools._harness import measure_all, scan_bench


def main():
    from bench import setup_compilation_cache
    setup_compilation_cache()
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship
    from dynmm_tpu.models.resnet import space_to_depth_host

    print(f"devices: {jax.devices()}", flush=True)
    BS = 8
    H, W = 480, 640
    rng = np.random.default_rng(0)
    rgb = rng.normal(size=(BS, H, W, 3)).astype(np.float32)
    depth = rng.normal(size=(BS, H, W, 1)).astype(np.float32)
    rgb_p = jnp.asarray(space_to_depth_host(rgb))
    depth_p = jnp.asarray(space_to_depth_host(depth))

    def flagship(dtype=None, pallas_upsample=False):
        return _flagship(H, W, dtype=dtype, pallas_upsample=pallas_upsample)

    variables = flagship().init(
        jax.random.PRNGKey(0), jnp.asarray(rgb), jnp.asarray(depth),
        train=False)

    runs, argsets = {}, {}
    for pu in (False, True):
        suff = "pallas" if pu else "xla"
        m32 = flagship(None, pu)
        m16 = flagship(jnp.bfloat16, pu)

        def fp32_full(r, d, v, m=m32):
            return m.apply(v, r, d, train=False, baseline=True)

        def bf16_q4(r, d, v, m=m16):
            out = m.apply(v, r, d, train=False, baseline=True, low_res=True)
            return out.astype(jnp.float32)

        runs[f"fp32_full_{suff}"] = scan_bench(fp32_full)
        argsets[f"fp32_full_{suff}"] = (
            jnp.asarray(rgb), jnp.asarray(depth), variables)
        runs[f"bf16_packed_q4_{suff}"] = scan_bench(bf16_q4)
        argsets[f"bf16_packed_q4_{suff}"] = (rgb_p, depth_p, variables)

    res = measure_all(runs, argsets)
    it = max(1, int(os.environ.get("BENCH_SCAN_ITERS", "20")))
    print()
    for vname in ("fp32_full", "bf16_packed_q4"):
        a = res[f"{vname}_xla"] / it
        b = res[f"{vname}_pallas"] / it
        print(f"{vname}: xla {a*1e3:.2f} ms  pallas-upsample {b*1e3:.2f} ms  "
              f"ratio xla/pallas {a/b:.3f}x", flush=True)


if __name__ == "__main__":
    main()
