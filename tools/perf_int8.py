"""Probe: does int8 beat bf16 on this chip at our conv shapes?

The flagship is HBM-bound (docs/DESIGN.md roofline: dense bf16 runs at
~1.06x its byte floor), so quantized int8 activations+weights would cut the
byte demand ~2x vs bf16 and the v5e MXU runs int8 at 2x the bf16 rate —
IF XLA lowers int8 convs natively at these shapes. This probe times the
primitive convs (encoder-stage shapes, NHWC) in fp32 / bf16 / int8
(preferred_element_type=int32) plus a requantize chain, interleaved
(tools/_harness.py).

Decides VERDICT r4 item 1: whether an int8 serving path is worth building
or the >=3x target gets a roofline-cap proof instead.
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
    from jax import lax

    print(f"devices: {jax.devices()}", flush=True)
    BS = 8
    # (H, W, C): the three encoder stage map shapes + the decoder's widest
    shapes = [(120, 160, 64), (60, 80, 128), (30, 40, 256), (15, 20, 512)]
    dn = lax.conv_dimension_numbers((BS, 1, 1, 1), (3, 3, 1, 1),
                                    ("NHWC", "HWIO", "NHWC"))

    runs, argsets = {}, {}
    rng = np.random.default_rng(0)
    for (h, w, c) in shapes:
        x32 = rng.normal(size=(BS, h, w, c)).astype(np.float32)
        k32 = (rng.normal(size=(3, 3, c, c)) / np.sqrt(9 * c)).astype(
            np.float32)
        x8 = (x32 * 16).clip(-127, 127).astype(np.int8)
        k8 = (k32 * 64).clip(-127, 127).astype(np.int8)

        def conv(x, k, prec=None):
            return lax.conv_general_dilated(
                x, k, (1, 1), "SAME", dimension_numbers=dn,
                preferred_element_type=prec)

        tag = f"{h}x{w}x{c}"
        runs[f"fp32_{tag}"] = scan_bench(lambda x, k: conv(x, k))
        argsets[f"fp32_{tag}"] = (jnp.asarray(x32), jnp.asarray(k32))
        runs[f"bf16_{tag}"] = scan_bench(lambda x, k: conv(x, k))
        argsets[f"bf16_{tag}"] = (jnp.asarray(x32, jnp.bfloat16),
                                  jnp.asarray(k32, jnp.bfloat16))

        # int8 scan carry must stay float: wrap with a cast-in/requant-out
        # chain (exactly what a quantized serving layer would run)
        def int8_chain(xf, k8=jnp.asarray(k8)):
            xq = jnp.clip(jnp.round(xf * 16.0), -127, 127).astype(jnp.int8)
            acc = conv(xq, k8, jnp.int32)
            return acc.astype(jnp.float32) * (1.0 / (16.0 * 64.0))

        runs[f"int8_{tag}"] = scan_bench(int8_chain)
        argsets[f"int8_{tag}"] = (jnp.asarray(x32),)
        # bf16 with the same cast chain, for a fair fused comparison
        def bf16_chain(xf, kb=jnp.asarray(k32, jnp.bfloat16)):
            return conv(xf.astype(jnp.bfloat16), kb).astype(jnp.float32)

        runs[f"bf16c_{tag}"] = scan_bench(bf16_chain)
        argsets[f"bf16c_{tag}"] = (jnp.asarray(x32),)

    res = measure_all(runs, argsets)
    print()
    for (h, w, c) in shapes:
        tag = f"{h}x{w}x{c}"
        f32, b16 = res[f"fp32_{tag}"], res[f"bf16_{tag}"]
        i8, b16c = res[f"int8_{tag}"], res[f"bf16c_{tag}"]
        it = max(1, int(os.environ.get("BENCH_SCAN_ITERS", "20")))
        print(f"{tag}: fp32 {f32/it*1e6:7.1f} us  bf16 {b16/it*1e6:7.1f} us  "
              f"int8+requant {i8/it*1e6:7.1f} us  bf16+cast {b16c/it*1e6:7.1f} us  "
              f"int8/bf16chain {b16c/i8:.2f}x", flush=True)


if __name__ == "__main__":
    main()
