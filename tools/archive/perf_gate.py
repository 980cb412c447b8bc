#!/usr/bin/env python
"""Gate head micro-bench: equivalence transforms of GlobalGate's conv1
(5×5/2, 128→8, VALID, on 120×160) hunting MXU efficiency.

The gate costs 1.08 ms of the 11.5 ms bs=8 step (tools/perf_decompose2.py)
— conv1 0.77 ms, rest 0.31 ms — while the skippable depth encoder is only
1.2 ms, so the gate must shrink ~4× for routing to ever pay at bs=8.

Variants (all mathematically identical, kernels derived from the same K):
  v0_split     — current: two VALID stride-2 convs (rgb/depth) summed
  v0_concat    — one conv on the concatenated input (the naive form)
  v1_s2d2      — space-to-depth 2: 3×3/1 conv on (60,80,512), zero-padded taps
  v3_s2d8      — s2d 8 + 2×2 conv, 4×4 output pixels packed into channels
                 (out = 16·8 = 128 → full MXU lanes)
  vmm_s2d8     — v3 expressed as one dot_general over flattened 2×2 windows
  *_bf16       — winner precision variant

Exactness is asserted (CPU or TPU) before timing.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

ITERS = int(os.environ.get("BENCH_SCAN_ITERS", "50"))
ROUNDS = int(os.environ.get("ROUNDS", "4"))
BS = int(os.environ.get("BS", "8"))
H, W, C = 120, 160, 64  # per-modality gate input (post-stem maxpool)
HID = 8
KS = 5


def build_variants(jnp, jax):
    def conv(inp, k, stride, pad="VALID"):
        dn = jax.lax.conv_dimension_numbers(
            inp.shape, k.shape, ("NHWC", "HWIO", "NHWC"))
        return jax.lax.conv_general_dilated(
            inp, k, window_strides=(stride, stride),
            padding=pad if isinstance(pad, str) else pad,
            dimension_numbers=dn)

    def v0_split(rgb, depth, K):
        return conv(rgb, K[:, :, :C], 2) + conv(depth, K[:, :, C:], 2)

    def v0_concat(rgb, depth, K):
        return conv(jnp.concatenate([rgb, depth], -1), K, 2)

    def s2d(x, f):
        b, h, w, c = x.shape
        x = x.reshape(b, h // f, f, w // f, f, c)
        return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // f, w // f,
                                                     f * f * c)

    def make_k_s2d2(K):
        # out(i,j) = sum_{di,dj} x[2i+di, 2j+dj] K[di,dj]
        # di = 2a+p (a in 0..2, p in 0..1); x2[i+a, j+b, (p,q,c)]
        K2 = np.zeros((3, 3, 4 * 2 * C, HID), np.float32)
        Kn = np.asarray(K)
        for di in range(KS):
            for dj in range(KS):
                a, p = divmod(di, 2)
                b_, q = divmod(dj, 2)
                # s2d channel layout: (p, q, c) -> (p*2+q)*2C + c
                K2[a, b_, (p * 2 + q) * 2 * C:(p * 2 + q + 1) * 2 * C] = \
                    Kn[di, dj]
        return jnp.asarray(K2)

    def v1_s2d2(rgb, depth, K2):
        x = jnp.concatenate([rgb, depth], -1)  # (B,120,160,128)
        x2 = s2d(x, 2)  # (B,60,80,512)
        return conv(x2, K2, 1)[:, :58, :78]

    def make_k_s2d8(K):
        # out(4I+u, 4J+v, o): taps x[8I + 2u+di, 8J + 2v+dj]
        # t=2u+di = 8a+p -> x8[I+a, J+b, (p,q,c)]; out ch = (u,v,o)
        Kn = np.asarray(K)
        K8 = np.zeros((2, 2, 8 * 8 * 2 * C, 16 * HID), np.float32)
        for u in range(4):
            for v in range(4):
                for di in range(KS):
                    for dj in range(KS):
                        a, p = divmod(2 * u + di, 8)
                        b_, q = divmod(2 * v + dj, 8)
                        cin = (p * 8 + q) * 2 * C
                        cout = (u * 4 + v) * HID
                        K8[a, b_, cin:cin + 2 * C,
                           cout:cout + HID] += Kn[di, dj]
        return jnp.asarray(K8)

    def v3_s2d8(rgb, depth, K8):
        x = jnp.concatenate([rgb, depth], -1)  # (B,120,160,128)
        x8 = s2d(x, 8)  # (B,15,20,8192)
        y = conv(x8, K8, 1, pad=((0, 1), (0, 1)))  # (B,15,20,128)
        b = y.shape[0]
        # unpack (u,v,o): (B,15,20,4,4,HID) -> (B,60,80,HID)
        y = y.reshape(b, 15, 20, 4, 4, HID).transpose(0, 1, 3, 2, 4, 5)
        return y.reshape(b, 60, 80, HID)[:, :58, :78]

    return v0_split, v0_concat, (make_k_s2d2, v1_s2d2), (make_k_s2d8, v3_s2d8)


def main():
    from bench import setup_compilation_cache
    setup_compilation_cache()
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    rgb = jnp.asarray(rng.standard_normal((BS, H, W, C)).astype(np.float32))
    depth = jnp.asarray(rng.standard_normal((BS, H, W, C)).astype(np.float32))
    K = jnp.asarray(
        rng.standard_normal((KS, KS, 2 * C, HID)).astype(np.float32) * 0.05)

    v0_split, v0_concat, (mk2, v1), (mk8, v3) = build_variants(jnp, jax)
    K2, K8 = mk2(K), mk8(K)

    # exactness
    ref = np.asarray(v0_split(rgb, depth, K))
    for name, out in [
        ("v0_concat", v0_concat(rgb, depth, K)),
        ("v1_s2d2", v1(rgb, depth, K2)),
        ("v3_s2d8", v3(rgb, depth, K8)),
    ]:
        err = np.abs(np.asarray(out) - ref).max()
        print(f"exactness {name}: max |diff| = {err:.2e}")
        assert err < 2e-4, name

    bf16 = jnp.bfloat16
    cands = {
        "v0_split": lambda r, d: v0_split(r, d, K),
        "v0_concat": lambda r, d: v0_concat(r, d, K),
        "v1_s2d2": lambda r, d: v1(r, d, K2),
        "v3_s2d8": lambda r, d: v3(r, d, K8),
        "v0_split_bf16": lambda r, d: v0_split(
            r.astype(bf16), d.astype(bf16), K.astype(bf16)),
        "v3_s2d8_bf16": lambda r, d: v3(
            r.astype(bf16), d.astype(bf16), K8.astype(bf16)),
    }

    def scan_bench(f):
        @jax.jit
        def run(r, d):
            def body(c, _):
                out = f(r + c, d)
                return 1e-30 * jnp.sum(out.astype(jnp.float32)), ()
            c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=ITERS)
            return c
        return run

    @jax.jit
    def nop(r, d):
        return jnp.sum(r[0, 0, 0])

    runs = {k: scan_bench(f) for k, f in cands.items()}
    for k, run in runs.items():
        t0 = time.time()
        float(run(rgb, depth))
        print(f"compiled {k} ({time.time()-t0:.0f}s)", flush=True)
    float(nop(rgb, depth))

    raw = {k: [] for k in runs}
    names = list(runs)
    for rnd in range(ROUNDS):
        order = names[rnd % len(names):] + names[:rnd % len(names)]
        for k in order:
            t0 = time.perf_counter(); float(runs[k](rgb, depth))
            tot = time.perf_counter() - t0
            t0 = time.perf_counter(); float(nop(rgb, depth))
            ov = time.perf_counter() - t0
            raw[k].append(max(tot - ov, 1e-9) / ITERS)
    print(f"\n{'variant':<16} {'median':>9} {'min':>9}")
    for k in names:
        r = np.array(raw[k])
        print(f"{k:<16} {np.median(r)*1e3:9.3f} {r.min()*1e3:9.3f}",
              flush=True)


if __name__ == "__main__":
    main()
