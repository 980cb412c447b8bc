#!/usr/bin/env python
"""Isolate the dynamic-routing overhead seen in the r2 bench:

  batch-max routed (dynamic k) 17.2 ms  vs  forced k=3 (static) 12.1 ms
  routed compact 19.9 ms                vs  dense baseline 14.8 ms

Probes (all scan-bench, same batch, one process):
  a) dense hard (gate computed, dense mix)          — reference point
  b) dense baseline (no gate)                        — gate cost by diff
  c) switch_batched force_path=3 (static k)          — path cost
  d) switch_batched dynamic k from the real gate     — (d-c) = dispatch cost
  e) switch_batched k from a TRIVIAL dynamic source  — gate-dependency vs
     switch-dispatch split
  f) routed compact (per-sample buckets)             — compaction overhead
  g) stream variants of (b,d,f)                      — stream-vs-scan check
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    from bench import (N_BATCHES, make_eval_batch, make_scan_bench,
                       make_stream_bench, measure, load_trained_gate,
                       setup_compilation_cache)

    setup_compilation_cache()
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship

    h, w = 480, 640
    bs = 8
    model = _flagship(h, w)
    rng = np.random.default_rng(0)
    rgb0, depth0 = make_eval_batch(rng, bs, h, w)
    rgb, depth = jnp.asarray(rgb0), jnp.asarray(depth0)
    variables = model.init(jax.random.PRNGKey(0), rgb, depth, train=False)
    variables, _ = load_trained_gate(variables)

    eval_rng = np.random.default_rng(1234)
    batches = [make_eval_batch(eval_rng, bs, h, w) for _ in range(N_BATCHES)]
    rgbs = jnp.asarray(np.stack([b[0] for b in batches]))
    depths = jnp.asarray(np.stack([b[1] for b in batches]))

    @jax.jit
    def nop(v, r, d):
        return jnp.sum(r[0, 0, 0])

    @jax.jit
    def nop_stream(v, r, d):
        return jnp.sum(r[0, 0, 0, 0])

    def part(name, fn, reps=3):
        t = measure(make_scan_bench(fn), nop, variables, rgb, depth, reps=reps)
        print(f"{name:<52} {t*1e3:8.3f} ms ({bs/t:7.1f} fps)", flush=True)
        return t

    def part_stream(name, fn, reps=3):
        t = measure(make_stream_bench(fn, N_BATCHES), nop_stream,
                    variables, rgbs, depths, reps=reps, iters=N_BATCHES)
        print(f"{name:<52} {t*1e3:8.3f} ms ({bs/t:7.1f} fps)", flush=True)
        return t

    part("a) dense hard (gate + dense mix)",
         lambda v, r, d: model.apply(v, r, d, train=False, hard=True))
    part("b) dense baseline (no gate)",
         lambda v, r, d: model.apply(v, r, d, train=False, baseline=True))
    part("c) switch_batched force_path=3 (static)",
         lambda v, r, d: model.apply(
             v, r, d, force_path=3, method=model.forward_switch_batched))
    part("d) switch_batched dynamic k (real gate)",
         lambda v, r, d: model.apply(
             v, r, d, method=model.forward_switch_batched))

    # e) dynamic k from a trivial input-dependent source: bypass the gate,
    # overriding gate_weights via baseline=True and patching k via closure is
    # invasive; instead call the underlying switch path with a synthetic
    # weight tensor exercised through the same code path.
    def trivial_k(v, r, d):
        def f(m, r, d):
            rgb_s, depth_s = m._stems(r, d, False)
            # k=3 for every sample, but data-dependent (not foldable)
            k = (jnp.sum(r[0, 0, 0]) * 0).astype(jnp.int32) + 3
            weight = jax.nn.one_hot(jnp.full((r.shape[0],), 3), 5,
                                    dtype=r.dtype)
            rgb1 = m.encoder_rgb.layer1(rgb_s, False)

            def make_path(n_fused):
                def path(ops):
                    r1, dd, ww = ops
                    skips = []
                    fused = None
                    for i in (1, 2, 3):
                        rr = r1 if i == 1 else getattr(
                            m.encoder_rgb, f"layer{i}")(fused, False)
                        if i <= n_fused:
                            dd = getattr(m.encoder_depth, f"layer{i}")(dd, False)
                            bf = m.fuse(i, rr, dd)
                            wi = ww[:, :i].sum(axis=1)[:, None, None, None]
                            fused = wi * rr + (1.0 - wi) * bf
                        else:
                            fused = rr
                        skips.append(m.skip(i, fused, False))
                    rr = m.encoder_rgb.layer4(fused, False)
                    if n_fused >= 4:
                        dd = m.encoder_depth.layer4(dd, False)
                        bf = m.fuse(4, rr, dd)
                        w4 = ww[:, 4][:, None, None, None]
                        fused = (1.0 - w4) * rr + w4 * bf
                    else:
                        fused = rr
                    return fused, skips[0], skips[1], skips[2]
                return path

            fused, s1, s2, s3 = jax.lax.switch(
                k, [make_path(n) for n in range(5)], (rgb1, depth_s, weight))
            return m.head(fused, [s1, s2, s3], False)
        return model.apply(v, r, d, method=f)

    part("e) switch_batched dynamic k=3 (no gate dep)", trivial_k)
    part("f) routed compact (per-sample buckets)",
         lambda v, r, d: model.apply(v, r, d,
                                     method=model.forward_routed_compact))

    part_stream("g1) STREAM dense baseline",
                lambda v, r, d: model.apply(v, r, d, train=False,
                                            baseline=True))
    part_stream("g2) STREAM switch_batched dynamic",
                lambda v, r, d: model.apply(
                    v, r, d, method=model.forward_switch_batched))
    part_stream("g3) STREAM routed compact",
                lambda v, r, d: model.apply(
                    v, r, d, method=model.forward_routed_compact))


if __name__ == "__main__":
    main()
