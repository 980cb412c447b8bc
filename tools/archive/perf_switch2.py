#!/usr/bin/env python
"""Second-round dispatch microprobes (follows tools/perf_switch.py):

  d4) gate computed + real mixing, but STATIC k=3        — gate+mix cost only
  d5) real gate, switch collapsed to 2 branches (k<4?3:4) — branch-count
  d6) real gate, 4 sequential lax.conds per depth stage   — dispatch shape
  d7) real gate, switch, but branches take PRE-MIXED weight columns
  g)  gate subgraph alone (stems + gate)                  — true gate cost
  s)  stems alone / stems+layer1                          — stage decompose
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    from bench import (make_eval_batch, make_scan_bench, measure,
                       load_trained_gate, setup_compilation_cache)

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

    @jax.jit
    def nop(v, r, d):
        return jnp.sum(r[0, 0, 0])

    def part(name, fn, reps=4):
        t = measure(make_scan_bench(fn), nop, variables, rgb, depth, reps=reps)
        print(f"{name:<56} {t*1e3:8.3f} ms ({bs/t:7.1f} fps)", flush=True)
        return t

    def switch_like(m, r, d, mode):
        train = False
        rgb_s, depth_s = m._stems(r, d, train)
        weight = m.gate_weights(rgb_s, depth_s, hard=True, train=train)
        k_dyn = jnp.max(jnp.argmax(weight, axis=-1)).astype(jnp.int32)
        rgb1 = m.encoder_rgb.layer1(rgb_s, train)

        def make_path(n_fused):
            def path(ops):
                r1, dd, ww = ops
                skips = []
                fused = None
                for i in (1, 2, 3):
                    rr = r1 if i == 1 else getattr(
                        m.encoder_rgb, f"layer{i}")(fused, train)
                    if i <= n_fused:
                        dd = getattr(m.encoder_depth, f"layer{i}")(dd, train)
                        bf = m.fuse(i, rr, dd)
                        wi = ww[:, :i].sum(axis=1)[:, None, None, None]
                        fused = wi * rr + (1.0 - wi) * bf
                    else:
                        fused = rr
                    skips.append(m.skip(i, fused, train))
                rr = m.encoder_rgb.layer4(fused, train)
                if n_fused >= 4:
                    dd = m.encoder_depth.layer4(dd, train)
                    bf = m.fuse(4, rr, dd)
                    w4 = ww[:, 4][:, None, None, None]
                    fused = (1.0 - w4) * rr + w4 * bf
                else:
                    fused = rr
                return fused, skips[0], skips[1], skips[2]
            return path

        if mode == "d4":  # gate + real mixing, STATIC dispatch
            fused, s1, s2, s3 = make_path(3)((rgb1, depth_s, weight))
        elif mode == "d5":  # 2-branch switch on the same dynamic k
            two = jnp.where(k_dyn >= 4, 1, 0).astype(jnp.int32)
            fused, s1, s2, s3 = jax.lax.switch(
                two, [make_path(3), make_path(4)], (rgb1, depth_s, weight))
        elif mode == "d6":  # per-stage sequential conds
            skips = []
            fused = rgb1
            dd = depth_s
            for i in (1, 2, 3):
                rr = fused if i == 1 else getattr(
                    m.encoder_rgb, f"layer{i}")(fused, train)

                def fuse_i(ops, i=i):
                    rr, dd, ww = ops
                    d2 = getattr(m.encoder_depth, f"layer{i}")(dd, train)
                    bf = m.fuse(i, rr, d2)
                    wi = ww[:, :i].sum(axis=1)[:, None, None, None]
                    return wi * rr + (1.0 - wi) * bf, d2

                def skip_i(ops, i=i):
                    rr, dd, ww = ops
                    zshape = (bs, rr.shape[1], rr.shape[2],
                              m.encoder_depth.down_channels[4 * (2 ** (i - 1))])
                    return rr, jnp.zeros(zshape, rr.dtype)

                fused, dd = jax.lax.cond(
                    k_dyn >= i, fuse_i, skip_i, (rr, dd, weight))
                skips.append(m.skip(i, fused, train))
            rr = m.encoder_rgb.layer4(fused, train)

            def fuse_4(ops):
                rr, dd, ww = ops
                d2 = m.encoder_depth.layer4(dd, train)
                bf = m.fuse(4, rr, d2)
                w4 = ww[:, 4][:, None, None, None]
                return (1.0 - w4) * rr + w4 * bf

            fused = jax.lax.cond(
                k_dyn >= 4, fuse_4, lambda ops: ops[0], (rr, dd, weight))
            s1, s2, s3 = skips
        else:  # d7: full 5-way switch, dynamic (same as bench 'd')
            fused, s1, s2, s3 = jax.lax.switch(
                k_dyn, [make_path(n) for n in range(5)],
                (rgb1, depth_s, weight))
        return m.head(fused, [s1, s2, s3], train)

    part("d4) gate + mixing, STATIC k=3",
         lambda v, r, d: model.apply(v, r, d,
                                     method=lambda m, r, d: switch_like(m, r, d, "d4")))
    part("d5) gate, 2-branch dynamic switch",
         lambda v, r, d: model.apply(v, r, d,
                                     method=lambda m, r, d: switch_like(m, r, d, "d5")))
    part("d6) gate, per-stage sequential conds",
         lambda v, r, d: model.apply(v, r, d,
                                     method=lambda m, r, d: switch_like(m, r, d, "d6")))
    part("d7) gate, 5-way dynamic switch (bench d)",
         lambda v, r, d: model.apply(v, r, d,
                                     method=lambda m, r, d: switch_like(m, r, d, "d7")))

    def stems_only(m, r, d):
        return m._stems(r, d, False)[0]

    def stems_gate(m, r, d):
        rp, dp = m._stems(r, d, False)
        return m.gate_weights(rp, dp, hard=True)

    def stems_layer1(m, r, d):
        rp, dp = m._stems(r, d, False)
        return m.encoder_rgb.layer1(rp, False)

    part("s1) stems only",
         lambda v, r, d: model.apply(v, r, d, method=stems_only))
    part("s2) stems + gate",
         lambda v, r, d: model.apply(v, r, d, method=stems_gate))
    part("s3) stems + rgb layer1",
         lambda v, r, d: model.apply(v, r, d, method=stems_layer1))


if __name__ == "__main__":
    main()
