#!/usr/bin/env python
"""The rgb stem conv (7×7/2, 3→64, 480×640) measures 2.75 ms at bs=8 —
11× off MXU peak even in its s2d-2 form (4×4, 12→64). Equivalence-packed
variants hunting lane density; every variant's output (in standard NHWC
(8,240,320,64) layout, unpack included) is exactness-checked against the
plain conv before timing.

  v_plain   7×7/2 pad 3 on (8,480,640,3)
  v_s2d2    4×4/1 on s2d-2 input (12 ch)  [current production path]
  v_s2d4    3×3/1 on s2d-4 input (48 ch) → 256 out (2×2 out pixels) → unpack
  v_s2d8    3×3/1 on s2d-8 input (192 ch) → 1024 out (4×4) → unpack
  *_bf16    winner in bf16
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from _harness import measure_all, scan_bench

KH = KW = 7
CIN, COUT = 3, 64
PAD = 3


def build(jnp, jax):
    def conv(x, k, stride, pad):
        dn = jax.lax.conv_dimension_numbers(
            x.shape, k.shape, ("NHWC", "HWIO", "NHWC"))
        return jax.lax.conv_general_dilated(
            x, k, (stride, stride), pad, dimension_numbers=dn)

    def s2d(x, f):
        b, h, w, c = x.shape
        x = x.reshape(b, h // f, f, w // f, f, c)
        return x.transpose(0, 1, 3, 2, 4, 5).reshape(
            b, h // f, w // f, f * f * c)

    def make_packed_kernel(K, S):
        """Kernel for the s2d-(2S) formulation: 3×3 conv, in (2S)²·CIN,
        out S²·COUT. out(S·I+u) taps raw row 2(S·I+u)+di−PAD =
        2S(I+a)+p."""
        Kn = np.asarray(K)
        f = 2 * S
        K2 = np.zeros((3, 3, f * f * CIN, S * S * COUT), np.float32)
        for u in range(S):
            for v in range(S):
                for di in range(KH):
                    for dj in range(KW):
                        t_r = 2 * u + di - PAD
                        t_c = 2 * v + dj - PAD
                        a, p = divmod(t_r, f)
                        b_, q = divmod(t_c, f)
                        assert -1 <= a <= 1 and -1 <= b_ <= 1
                        cin = (p * f + q) * CIN
                        cout = (u * S + v) * COUT
                        K2[a + 1, b_ + 1, cin:cin + CIN,
                           cout:cout + COUT] += Kn[di, dj]
        return K2

    def v_plain(x, K):
        return conv(x, K, 2, ((PAD, PAD - 1), (PAD, PAD - 1)))

    def make_vs2d(S):
        def f(x, K2):
            b, h, w, _ = x.shape
            xf = s2d(x, 2 * S)  # (b, h/2S, w/2S, (2S)^2*CIN)
            y = conv(xf, jnp.asarray(K2), 1, ((1, 1), (1, 1)))
            hb, wb = h // (2 * S), w // (2 * S)
            y = y.reshape(b, hb, wb, S, S, COUT)
            y = y.transpose(0, 1, 3, 2, 4, 5)
            return y.reshape(b, h // 2, w // 2, COUT)
        return f

    return conv, s2d, make_packed_kernel, v_plain, make_vs2d


def main():
    from bench import setup_compilation_cache
    setup_compilation_cache()
    import jax
    import jax.numpy as jnp

    from dynmm_tpu.models.resnet import _s2d_kernel, _space_to_depth

    conv_, s2d, make_packed_kernel, v_plain, make_vs2d = build(jnp, jax)

    rng = np.random.default_rng(0)
    x = jnp.asarray(
        rng.standard_normal((8, 480, 640, CIN)).astype(np.float32))
    K = jnp.asarray(
        rng.standard_normal((KH, KW, CIN, COUT)).astype(np.float32) * 0.1)

    def v_s2d2(x, K):
        xp = _space_to_depth(x)
        wp = _s2d_kernel(K)
        dn = jax.lax.conv_dimension_numbers(
            xp.shape, wp.shape, ("NHWC", "HWIO", "NHWC"))
        return jax.lax.conv_general_dilated(
            xp, wp, (1, 1), ((2, 1), (2, 1)), dimension_numbers=dn)

    K4 = make_packed_kernel(K, 2)
    K8 = make_packed_kernel(K, 4)
    v4 = make_vs2d(2)
    v8 = make_vs2d(4)

    ref = np.asarray(v_plain(x, K))
    for name, out in (("v_s2d2", v_s2d2(x, K)),
                      ("v_s2d4", v4(x, K4)), ("v_s2d8", v8(x, K8))):
        err = np.abs(np.asarray(out) - ref).max()
        print(f"exactness {name}: {err:.2e}")
        assert err < 5e-4, name

    bf16 = jnp.bfloat16
    cands = {
        "v_plain": lambda xx: v_plain(xx, K),
        "v_s2d2": lambda xx: v_s2d2(xx, K),
        "v_s2d4": lambda xx: v4(xx, K4),
        "v_s2d8": lambda xx: v8(xx, K8),
        "v_s2d4_bf16": lambda xx: v4(
            xx.astype(bf16), jnp.asarray(K4).astype(bf16)),
    }
    runs, argsets = {}, {}
    for k, f in cands.items():
        runs[k] = scan_bench(lambda xx, f=f: f(xx))
        argsets[k] = (x,)
    measure_all(runs, argsets)


if __name__ == "__main__":
    main()
