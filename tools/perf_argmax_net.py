#!/usr/bin/env python
"""Bisect the in-net device-argmax anomaly (perf_upsample_tail.py found
net+argmax = 26.2 ms vs net 9.4 ms at bs=8 bf16 packed, while the
standalone argmax over the same (8,480,640,40) map is 0.3 ms —
perf_argmax.py). Candidates, interleaved:

  base        net -> logits (status quo)
  am_only     net -> argmax(logits)              [the 26 ms repro]
  am_both     net -> (logits, argmax(logits))    [what eval actually returns]
  am_barrier  net -> argmax(optimization_barrier(logits))
  am_trick    net -> max/compare/iota extraction (no variadic reduce)
  eval_like   net -> (logits, argmax(resize(logits, full)))  [train/seg.py:328]

RESOLVED (2026-08-18, anchor fp32 159 TFLOP/s): base 10.06, am_only
26.41, am_both 23.37, am_barrier 23.35, am_trick 13.64, eval_like 23.21.
The barrier does NOT help → the +16.3 ms is the variadic argmax reduce
itself, not a fusion/rematerialization artifact; the max/compare/iota
form costs +3.6 ms and ships as ``nn.layers.first_argmax`` in the eval
step and predict.py (reference post-processing: FusionDynMM/eval.py
argmax chain). Note the earlier "standalone argmax = 0.3 ms"
(perf_argmax.py) is DCE-suspect: its probe reads only out[0,0,0], which
XLA can narrow through a standalone reduce but evidently not through
the net-producing graph here.
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
    from bench import (load_trained_gate, make_eval_batch, make_scan_bench,
                       measure_interleaved, setup_compilation_cache)

    bench_mod.SCAN_ITERS = ITERS
    setup_compilation_cache()
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship
    from dynmm_tpu.models.resnet import space_to_depth_host
    from dynmm_tpu.nn.layers import first_argmax, resize_bilinear

    h, w = 480, 640
    model16 = _flagship(h, w, dtype=jnp.bfloat16)
    model = _flagship(h, w)
    rng = np.random.default_rng(0)
    rgb0, depth0 = make_eval_batch(rng, 8, h, w)
    rgb_p = jnp.asarray(space_to_depth_host(rgb0))
    depth_p = jnp.asarray(space_to_depth_host(depth0))
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(rgb0),
                           jnp.asarray(depth0), train=False)
    variables, _ = load_trained_gate(variables)

    @jax.jit
    def nop(v, r, d):
        return jnp.sum(r[0, 0, 0])

    def net(v, r, d):
        return model16.apply(v, r, d, train=False, baseline=True)

    def trick(x):
        c = x.shape[-1]
        m = jnp.max(x, axis=-1, keepdims=True)
        iota = jnp.arange(c - 1, -1, -1, dtype=x.dtype)
        hit = (x >= m).astype(x.dtype) * iota
        return ((c - 1) - jnp.max(hit, axis=-1)).astype(jnp.int32)

    runs = {
        "base": make_scan_bench(net),
        "am_only": make_scan_bench(
            lambda v, r, d: jnp.argmax(net(v, r, d), -1).astype(jnp.int32)),
        # tuple outputs break the rank-generic probe; fold both consumers
        # into one array so the logits keep >=2 consumers like in real eval
        "am_both": make_scan_bench(
            lambda v, r, d: (lambda o: (
                jnp.argmax(o, -1).astype(jnp.float32) + o[0, 0, 0, 0]
            ))(net(v, r, d))),
        "am_barrier": make_scan_bench(
            lambda v, r, d: jnp.argmax(
                jax.lax.optimization_barrier(net(v, r, d)), -1
            ).astype(jnp.int32)),
        "am_trick": make_scan_bench(lambda v, r, d: trick(net(v, r, d))),
        "eval_like": make_scan_bench(
            lambda v, r, d: (lambda o: (
                jnp.argmax(resize_bilinear(o, (h, w)), -1).astype(jnp.float32)
                + o[0, 0, 0, 0]
            ))(net(v, r, d))),
        # the shipped fix: nn.layers.first_argmax on the real eval chain
        "eval_like_trick": make_scan_bench(
            lambda v, r, d: (lambda o: (
                first_argmax(resize_bilinear(o, (h, w)), -1
                             ).astype(jnp.float32) + o[0, 0, 0, 0]
            ))(net(v, r, d))),
    }
    args = (variables, rgb_p, depth_p)
    meds = measure_interleaved(runs, nop, *args, rounds=ROUNDS)
    anchor = bench_mod.measure_matmul_anchor()
    print(f"anchor: {anchor}", file=sys.stderr)
    for k, t in meds.items():
        print(f"bs=8 bf16 packed {k}: {t*1e3:.3f} ms", file=sys.stderr)
    print(js.dumps({k: round(v * 1e3, 3) for k, v in meds.items()}))


if __name__ == "__main__":
    main()
