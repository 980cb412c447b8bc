#!/usr/bin/env python
"""Why does the gate cost ~1.1 ms in-model but 0.44 ms standalone?

Discriminates producer effects: the same gate computation is measured on
(a) fresh device arrays, (b) maxpool outputs, (c) the real model's stem
outputs (via model.apply), each ± BN folding. If (a) is cheap and (c) is
expensive, the cost is a layout/fusion interaction with the producer, not
the gate math."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from _harness import measure_all, scan_bench


def main():
    from bench import make_eval_batch, load_trained_gate, setup_compilation_cache
    setup_compilation_cache()
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship
    from dynmm_tpu.nn.layers import max_pool_3x3_s2

    h, w = 480, 640
    model = _flagship(h, w)
    rng = np.random.default_rng(0)
    rgb0, depth0 = make_eval_batch(rng, 8, h, w)
    rgb, depth = jnp.asarray(rgb0), jnp.asarray(depth0)
    variables = model.init(jax.random.PRNGKey(0), rgb, depth, train=False)
    variables, _ = load_trained_gate(variables)
    gp = variables["params"]["gate_layer"]
    gs = variables["batch_stats"]["gate_layer"]

    xr = jnp.asarray(
        rng.standard_normal((8, 120, 160, 64)).astype(np.float32))
    xd = jnp.asarray(
        rng.standard_normal((8, 120, 160, 64)).astype(np.float32))
    xr2 = jnp.asarray(
        rng.standard_normal((8, 240, 320, 64)).astype(np.float32))
    xd2 = jnp.asarray(
        rng.standard_normal((8, 240, 320, 64)).astype(np.float32))

    def conv(inp, k, stride=2):
        dn = jax.lax.conv_dimension_numbers(
            inp.shape, k.shape, ("NHWC", "HWIO", "NHWC"))
        return jax.lax.conv_general_dilated(
            inp, k, (stride, stride), ((0, 0), (0, 0)), dimension_numbers=dn)

    def bn(x, p, s):
        inv = 1.0 / jnp.sqrt(s["var"] + 1e-5)
        return (x - s["mean"]) * inv * p["scale"] + p["bias"]

    def gate_raw(r, d):
        k = gp["conv1"]["kernel"]
        x = conv(r, k[:, :, :64]) + conv(d, k[:, :, 64:]) + gp["conv1"]["bias"]
        x = jnp.tanh(bn(x, gp["bn1"], gs["bn1"]))
        x = conv(x, gp["conv2"]["kernel"]) + gp["conv2"]["bias"]
        x = jnp.tanh(bn(x, gp["bn2"], gs["bn2"]))
        x = x.mean(axis=(1, 2), keepdims=True)
        return (x[:, 0, 0] @ gp["fc"]["kernel"][0, 0])

    def fold(kname, bname):
        p, s = gp[kname], gs[bname]
        g = gp[bname]["scale"] / jnp.sqrt(s["var"] + 1e-5)
        k = p["kernel"] * g[None, None, None, :]
        b = (p["bias"] - s["mean"]) * g + gp[bname]["bias"]
        return k, b

    def gate_folded(r, d):
        k1, b1 = fold("conv1", "bn1")
        x = conv(r, k1[:, :, :64]) + conv(d, k1[:, :, 64:]) + b1
        x = jnp.tanh(x)
        k2, b2 = fold("conv2", "bn2")
        x = jnp.tanh(conv(x, k2) + b2)
        x = x.mean(axis=(1, 2), keepdims=True)
        return (x[:, 0, 0] @ gp["fc"]["kernel"][0, 0])

    err = float(jnp.abs(gate_raw(xr, xd) - gate_folded(xr, xd)).max())
    print(f"BN-fold exactness: max|diff| = {err:.2e}")

    def stems_only(v, r, d):
        return model.apply(v, r, d,
                           method=lambda m, r, d: m._stems(r, d, False)[0])

    def stems_gate(v, r, d):
        def f(m, r, d):
            rp, dp = m._stems(r, d, False)
            return m.gate_weights(rp, dp, hard=True)
        return model.apply(v, r, d, method=f)

    cands = {
        "g_fresh": gate_raw,
        "g_fresh_folded": gate_folded,
        "g_after_maxpool": lambda r, d: gate_raw(
            max_pool_3x3_s2(r), max_pool_3x3_s2(d)),
        "maxpool_only": lambda r, d: max_pool_3x3_s2(r) + max_pool_3x3_s2(d),
        "conv1_fresh": lambda r, d: conv(r, gp["conv1"]["kernel"][:, :, :64])
            + conv(d, gp["conv1"]["kernel"][:, :, 64:]),
    }
    runs, argsets = {}, {}
    for k, f in cands.items():
        runs[k] = scan_bench(f)
        argsets[k] = ((xr2, xd2) if k in ("g_after_maxpool", "maxpool_only")
                      else (xr, xd))
    runs["m_stems"] = scan_bench(lambda r, d, v: stems_only(v, r, d))
    argsets["m_stems"] = (rgb, depth, variables)
    runs["m_stems_gate"] = scan_bench(lambda r, d, v: stems_gate(v, r, d))
    argsets["m_stems_gate"] = (rgb, depth, variables)

    meds = measure_all(runs, argsets)
    print(f"\n  gate marginal in-model: "
          f"{(meds['m_stems_gate']-meds['m_stems'])*1e3:.3f} ms; "
          f"standalone {meds['g_fresh']*1e3:.3f}; "
          f"after-maxpool {(meds['g_after_maxpool'])*1e3:.3f}")


if __name__ == "__main__":
    main()
