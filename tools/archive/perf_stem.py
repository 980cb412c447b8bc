#!/usr/bin/env python
"""Fused stem SE-fusion+maxpool kernel vs XLA's unfused graph at flagship
shapes ((8, 240, 320, 64) fp32 — the 1.75 ms cell from perf_decompose2)."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

ITERS = int(os.environ.get("BENCH_SCAN_ITERS", "30"))
ROUNDS = int(os.environ.get("ROUNDS", "4"))
BS = int(os.environ.get("BS", "8"))


def main():
    from bench import setup_compilation_cache
    setup_compilation_cache()
    import jax
    import jax.numpy as jnp

    from dynmm_tpu.kernels.stem_fuse import (
        reference_stem_fusion, stem_se_fusion_pool)

    rng = np.random.default_rng(0)
    h, w, c = 240, 320, 64
    rgb = jnp.asarray(rng.standard_normal((BS, h, w, c)).astype(np.float32))
    dep = jnp.asarray(rng.standard_normal((BS, h, w, c)).astype(np.float32))
    ws = []
    for _ in range(2):
        ws += [
            jnp.asarray(rng.standard_normal((c, c // 16)).astype(np.float32) * 0.2),
            jnp.asarray(rng.standard_normal((c // 16,)).astype(np.float32)),
            jnp.asarray(rng.standard_normal((c // 16, c)).astype(np.float32) * 0.2),
            jnp.asarray(rng.standard_normal((c,)).astype(np.float32)),
        ]

    # exactness on TPU
    ref_f, ref_d = jax.jit(reference_stem_fusion)(rgb, dep, *ws)
    out_f, out_d = jax.jit(stem_se_fusion_pool)(rgb, dep, *ws)
    df = float(jnp.abs(out_f - ref_f).max())
    dd = float(jnp.abs(out_d - ref_d).max())
    print(f"exactness: fused max|diff|={df:.2e}  depth max|diff|={dd:.2e}")
    assert df < 1e-4 and dd < 1e-6

    def scan_bench(f):
        @jax.jit
        def run(r, d):
            def body(cv, _):
                o1, o2 = f(r + cv, d)
                return 1e-30 * (jnp.sum(o1[0, 0, 0]) + jnp.sum(o2[0, 0, 0])), ()
            cv, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=ITERS)
            return cv
        return run

    @jax.jit
    def nop(r, d):
        return jnp.sum(r[0, 0, 0])

    cands = {
        "xla_unfused": lambda r, d: reference_stem_fusion(r, d, *ws),
        "pallas_fused": lambda r, d: stem_se_fusion_pool(r, d, *ws),
    }
    runs = {k: scan_bench(f) for k, f in cands.items()}
    for k, run in runs.items():
        t0 = time.time()
        float(run(rgb, dep))
        print(f"compiled {k} ({time.time()-t0:.0f}s)", flush=True)
    float(nop(rgb, dep))

    raw = {k: [] for k in runs}
    names = list(runs)
    for rnd in range(ROUNDS):
        for k in (names if rnd % 2 == 0 else names[::-1]):
            t0 = time.perf_counter(); float(runs[k](rgb, dep))
            tot = time.perf_counter() - t0
            t0 = time.perf_counter(); float(nop(rgb, dep))
            ov = time.perf_counter() - t0
            raw[k].append(max(tot - ov, 1e-9) / ITERS)
    for k in names:
        r = np.array(raw[k])
        print(f"{k:<14} {np.median(r)*1e3:8.3f} ms (min {r.min()*1e3:.3f})",
              flush=True)


if __name__ == "__main__":
    main()
