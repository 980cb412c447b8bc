#!/usr/bin/env python
"""Decompose the flagship decoder (~55% of step time) into its pieces on the
real TPU: the 3 DecoderModules, the NBt1D stacks, the upsamples, and the
final conv→×4 logits chain — fp32 vs bf16 — to find what is far from its
roofline. Scan-in-jit timing; all numbers from ONE process (chip speed
drifts ~40% across sessions, so only within-run ratios are meaningful)."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

SCAN_ITERS = int(os.environ.get("BENCH_SCAN_ITERS", "30"))
BS = int(os.environ.get("BS", "8"))


def main():
    from bench import setup_compilation_cache

    setup_compilation_cache()
    import jax
    import jax.numpy as jnp

    from dynmm_tpu.models.esanet import DecoderModule
    from dynmm_tpu.models.resnet import NonBottleneck1D
    from dynmm_tpu.nn.layers import Upsample, torch_conv

    rng = np.random.default_rng(0)

    def scan_bench(apply_fn, x):
        """apply_fn(x) -> out; any other operands must be closed over."""

        @jax.jit
        def run(x):
            def body(carry, _):
                out = apply_fn(carry)
                carry = carry + 1e-30 * jnp.mean(
                    out[0] if isinstance(out, tuple) else out
                ).astype(carry.dtype)
                return carry, ()
            carry, _ = jax.lax.scan(body, x, None, length=SCAN_ITERS)
            return jnp.sum(carry[(0,) * carry.ndim].astype(jnp.float32))

        @jax.jit
        def nop(x):
            return jnp.sum(x[(0,) * x.ndim].astype(jnp.float32))

        float(run(x)); float(nop(x))
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter(); float(run(x))
            tot = time.perf_counter() - t0
            t0 = time.perf_counter(); float(nop(x))
            ovh = time.perf_counter() - t0
            best = min(best, max(tot - ovh, 1e-9) / SCAN_ITERS)
        return best

    def arr(shape, dtype=np.float32):
        return jnp.asarray(rng.standard_normal(shape).astype(np.float32)).astype(dtype)

    def bench_module(name, mod, x, *extra):
        v = mod.init(jax.random.PRNGKey(0), x, *extra)
        t = scan_bench(lambda xx: mod.apply(v, xx, *extra), x)
        print(f"{name:<44} {t*1e3:8.3f} ms", flush=True)
        return t

    specs = [
        ("dm1 512ch @15x20 (3 blocks + up + skip)", 512, (15, 20, 512), (30, 40, 512)),
        ("dm2 256ch @30x40", 256, (30, 40, 512), (60, 80, 256)),
        ("dm3 128ch @60x80", 128, (60, 80, 256), (120, 160, 128)),
    ]
    for dt_label, dt in [("fp32", None), ("bf16", jnp.bfloat16)]:
        tot = 0.0
        for name, ch, in_shape, skip_shape in specs:
            mod = DecoderModule(ch, 3, 40, "learned-3x3-zeropad", dtype=dt)
            x = arr((BS,) + in_shape, dt or np.float32)
            skip = arr((BS,) + skip_shape, dt or np.float32)
            tot += bench_module(f"{name} [{dt_label}]", mod, x, skip, False)

        class Tail(__import__("flax.linen", fromlist=["nn"]).Module):
            dtype = dt

            @__import__("flax.linen", fromlist=["nn"]).compact
            def __call__(self, x):
                x = torch_conv(40, 3, padding=1, dtype=self.dtype, name="conv_out")(x)
                x = Upsample(mode="learned-3x3-zeropad", channels=40,
                             dtype=self.dtype, name="up1")(x)
                return Upsample(mode="learned-3x3-zeropad", channels=40,
                                dtype=self.dtype, name="up2")(x)

        tot += bench_module(
            f"tail conv_out + 2x up (C=40) [{dt_label}]",
            Tail(), arr((BS, 120, 160, 128), dt or np.float32))
        print(f"  == decoder total [{dt_label}]: {tot*1e3:.3f} ms", flush=True)

    # -- pieces inside dm1 ---------------------------------------------------
    import flax.linen as nn

    x512 = arr((BS, 15, 20, 512))
    bench_module("3x NBt1D@512 @15x20", nn.Sequential([
        NonBottleneck1D(512, name=f"b{i}") for i in range(3)]), x512)
    bench_module("1x NBt1D@512 @15x20", NonBottleneck1D(512), x512)
    bench_module("upsample 512ch 15x20->30x40 (shift)",
                 Upsample(mode="learned-3x3-zeropad", channels=512), x512)
    bench_module("upsample 512ch (naive)",
                 Upsample(mode="learned-3x3-zeropad", channels=512, fused=False),
                 x512)
    x40 = arr((BS, 240, 320, 40))
    bench_module("upsample 40ch 240x320->480x640 (shift)",
                 Upsample(mode="learned-3x3-zeropad", channels=40), x40)
    bench_module("upsample 40ch (naive)",
                 Upsample(mode="learned-3x3-zeropad", channels=40, fused=False),
                 x40)
    bench_module("conv3x3 512->512 @15x20",
                 torch_conv(512, 3, padding=1, use_bias=False), x512)
    x256in = arr((BS, 30, 40, 512))
    bench_module("conv3x3 512->256 @30x40",
                 torch_conv(256, 3, padding=1, use_bias=False), x256in)


if __name__ == "__main__":
    main()
