#!/usr/bin/env python
"""Isolate the decoder-tail pathology: conv_out + up1 + up2 measures ~6.6 ms
while its standalone pieces sum to ~0.5 ms. Time every prefix/suffix of the
chain to find where the composition goes wrong."""

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
    import flax.linen as nn

    from dynmm_tpu.nn.layers import Upsample, torch_conv

    rng = np.random.default_rng(0)

    def scan_bench(apply_fn, x):
        @jax.jit
        def run(x):
            def body(carry, _):
                out = apply_fn(carry)
                carry = carry + 1e-30 * jnp.mean(out).astype(carry.dtype)
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

    def arr(shape):
        return jnp.asarray(rng.standard_normal(shape).astype(np.float32))

    def bench(name, mod, x):
        v = mod.init(jax.random.PRNGKey(0), x)
        t = scan_bench(lambda xx: mod.apply(v, xx), x)
        print(f"{name:<46} {t*1e3:8.3f} ms", flush=True)
        return t

    class Chain(nn.Module):
        with_conv: bool = True
        n_up: int = 2
        impl: str = "shift"

        @nn.compact
        def __call__(self, x):
            if self.with_conv:
                x = torch_conv(40, 3, padding=1, name="conv_out")(x)
            for i in range(self.n_up):
                x = Upsample(mode="learned-3x3-zeropad", channels=40,
                             fused=self.impl != "naive",
                             fused_impl=self.impl, name=f"up{i}")(x)
            return x

    x128 = arr((BS, 120, 160, 128))
    x40 = arr((BS, 120, 160, 40))
    x40b = arr((BS, 240, 320, 40))

    bench("conv_out only (128->40 @120x160)", Chain(True, 0), x128)
    bench("up1 only @120x160x40 (shift)", Chain(False, 1), x40)
    bench("up1 only @120x160x40 (naive)", Chain(False, 1, "naive"), x40)
    bench("up2 only @240x320x40 (shift)", Chain(False, 1), x40b)
    bench("up1+up2 @120x160x40 (shift)", Chain(False, 2), x40)
    bench("up1+up2 @120x160x40 (naive)", Chain(False, 2, "naive"), x40)
    bench("conv+up1 (shift)", Chain(True, 1), x128)
    bench("conv+up1+up2 (shift)", Chain(True, 2), x128)
    bench("conv+up1+up2 (naive)", Chain(True, 2, "naive"), x128)
    bench("conv+up1+up2 (dilated)", Chain(True, 2, "dilated"), x128)


if __name__ == "__main__":
    main()
