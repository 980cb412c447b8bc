#!/usr/bin/env python
"""Isolate the device-argmax anomaly seen in perf_upsample_tail.py:
returning `jnp.argmax(logits, -1)` from the bs=8 bf16 packed net cost
+16.8 ms, while the bs=1 fp32 probe measured +0.03 ms.

Microbench: argmax over a (8, 480, 640, 40) map — the predict.py /
eval-step class-map extraction (reference: FusionDynMM/eval.py argmax
post-processing) — across dtypes and lowering strategies, interleaved:

  am_bf16      jnp.argmax(x_bf16, -1)
  am_f32       jnp.argmax(x_f32, -1)
  am_bf16_f32  jnp.argmax(x_bf16.astype(f32), -1)
  trick_bf16   max+compare+iota-dot extraction (no variadic reduce)
  trick_f32    same on fp32
  nop          overhead floor

The trick: m = max(x, -1, keepdims); idx = max(iota * (x == m), -1).
Ties resolve to the LAST max index, unlike argmax's first — for a
first-index tie-break use (C-1) - max((C-1-iota) * (x==m)).
"""

import json as js
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

ITERS = int(os.environ.get("BENCH_SCAN_ITERS", "20"))
ROUNDS = int(os.environ.get("ROUNDS", "5"))


def main():
    import bench as bench_mod
    from bench import measure_interleaved, setup_compilation_cache

    bench_mod.SCAN_ITERS = ITERS
    setup_compilation_cache()
    import jax
    import jax.numpy as jnp

    shape = (8, 480, 640, 40)
    x_np = np.random.default_rng(0).standard_normal(shape).astype(np.float32)
    x32 = jnp.asarray(x_np)
    x16 = x32.astype(jnp.bfloat16)

    def scan_bench(fn):
        @jax.jit
        def run(x):
            def body(c, _):
                out = fn(x + c.astype(x.dtype))
                return (1e-30 * out[0, 0, 0]).astype(jnp.float32), ()
            c, _ = jax.lax.scan(body, jnp.float32(0.0), None,
                                length=bench_mod.SCAN_ITERS)
            return c
        return run

    def trick(x):
        c = x.shape[-1]
        m = jnp.max(x, axis=-1, keepdims=True)
        iota = jnp.arange(c - 1, -1, -1, dtype=x.dtype)
        hit = (x >= m).astype(x.dtype) * iota
        return (c - 1) - jnp.max(hit, axis=-1).astype(jnp.float32)

    runs16 = {
        "am_bf16": scan_bench(lambda x: jnp.argmax(x, -1).astype(jnp.float32)),
        "am_bf16_f32": scan_bench(
            lambda x: jnp.argmax(x.astype(jnp.float32), -1).astype(jnp.float32)),
        "trick_bf16": scan_bench(trick),
    }
    runs32 = {
        "am_f32": scan_bench(lambda x: jnp.argmax(x, -1).astype(jnp.float32)),
        "trick_f32": scan_bench(trick),
    }

    @jax.jit
    def nop(x):
        return jnp.sum(x[0, 0, 0])

    meds = {}
    meds.update(measure_interleaved(runs16, nop, x16, rounds=ROUNDS))
    meds.update(measure_interleaved(runs32, nop, x32, rounds=ROUNDS))

    # correctness cross-check (ties broken identically on random data)
    a = np.asarray(jnp.argmax(x16, -1))
    b = np.asarray(trick(x16)).astype(np.int64)
    mismatch = int((a != b).sum())
    print(f"trick vs argmax mismatches (bf16): {mismatch}", file=sys.stderr)

    for k, t in meds.items():
        print(f"{k}: {t*1e3:.3f} ms", file=sys.stderr)
    out = {k: round(v * 1e3, 3) for k, v in meds.items()}
    out["trick_mismatch"] = mismatch
    print(js.dumps(out))


if __name__ == "__main__":
    main()
