#!/usr/bin/env python
"""Post-rework measurement (split-conv gate + per-stage-cond routing):
cumulative stage decomposition and all routing strategies, high scan iters.
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
    bs = int(os.environ.get("BS", "8"))
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

    def part(name, fn, reps=4):
        t = measure(make_scan_bench(fn), nop, variables, rgb, depth, reps=reps)
        print(f"{name:<52} {t*1e3:8.3f} ms ({bs/t:7.1f} fps)", flush=True)
        return t

    def part_stream(name, fn, reps=3):
        t = measure(make_stream_bench(fn, N_BATCHES), nop_stream,
                    variables, rgbs, depths, reps=reps, iters=N_BATCHES)
        print(f"{name:<52} {t*1e3:8.3f} ms ({bs/t:7.1f} fps)", flush=True)
        return t

    def m_apply(f):
        return lambda v, r, d: model.apply(v, r, d, method=f)

    # cumulative decomposition
    part("stems", m_apply(lambda m, r, d: m._stems(r, d, False)[0]))

    def stems_gate(m, r, d):
        rp, dp = m._stems(r, d, False)
        return m.gate_weights(rp, dp, hard=True)

    part("stems+gate", m_apply(stems_gate))

    def rgb_enc(m, r, d):
        rp, dp = m._stems(r, d, False)
        x = rp
        for i in (1, 2, 3, 4):
            x = getattr(m.encoder_rgb, f"layer{i}")(x, False)
        return x

    part("stems+rgb encoder", m_apply(rgb_enc))

    def both_enc(m, r, d):
        rp, dp = m._stems(r, d, False)
        x, y = rp, dp
        for i in (1, 2, 3, 4):
            x = getattr(m.encoder_rgb, f"layer{i}")(x, False)
            y = getattr(m.encoder_depth, f"layer{i}")(y, False)
            x = m.fuse(i, x, y)
        return x

    part("stems+both encoders+fuse", m_apply(both_enc))

    def enc_ctx(m, r, d):
        rp, dp = m._stems(r, d, False)
        x, y = rp, dp
        skips = []
        for i in (1, 2, 3, 4):
            x = getattr(m.encoder_rgb, f"layer{i}")(x, False)
            y = getattr(m.encoder_depth, f"layer{i}")(y, False)
            x = m.fuse(i, x, y)
            if i < 4:
                skips.append(m.skip(i, x, False))
        return m.context_module(x, False)

    part("encoders+context", m_apply(enc_ctx))
    part("dense baseline (full static)",
         lambda v, r, d: model.apply(v, r, d, train=False, baseline=True))
    part("dense hard (gate + mix)",
         lambda v, r, d: model.apply(v, r, d, train=False, hard=True))
    part("switch_batched dynamic (per-stage conds)",
         lambda v, r, d: model.apply(v, r, d,
                                     method=model.forward_switch_batched))
    part("routed compact (sorted prefix conds)",
         lambda v, r, d: model.apply(v, r, d,
                                     method=model.forward_routed_compact))
    for kf in (0, 3, 4):
        part(f"switch_batched force_path={kf}",
             lambda v, r, d, kf=kf: model.apply(
                 v, r, d, force_path=kf,
                 method=model.forward_switch_batched))

    part_stream("STREAM dense baseline",
                lambda v, r, d: model.apply(v, r, d, train=False,
                                            baseline=True))
    part_stream("STREAM routed compact",
                lambda v, r, d: model.apply(
                    v, r, d, method=model.forward_routed_compact))
    part_stream("STREAM switch_batched dynamic",
                lambda v, r, d: model.apply(
                    v, r, d, method=model.forward_switch_batched))

    # bs=1 switch latency
    rgb1, depth1 = rgb[:1], depth[:1]
    t = measure(
        make_scan_bench(
            lambda v, r, d: model.apply(v, r, d, method=model.forward_switch)
        ),
        nop, variables, rgb1, depth1, reps=3,
    )
    print(f"{'bs=1 forward_switch (per-stage conds)':<52} {t*1e3:8.3f} ms "
          f"({1/t:7.1f} fps)", flush=True)


if __name__ == "__main__":
    main()
