#!/usr/bin/env python
"""Micro-costs of the dynamic-dispatch primitives on this TPU runtime:
lax.cond boundaries, batch-row permutes, hard-gate mixing. These set the
floor for any in-graph routing strategy (tools/perf_compact_bisect.py showed
switch_batched = dense + 4.5 ms and compact = dense + 41 ms; this probe
attributes those gaps).

Sections:
  cond:    y = body(x) vs cond(p, body, body)(x) vs 4 chained conds, at
           fp32/bf16 operand sizes matching depth-encoder stages.
  permute: take vs one-hot matmul (2D-reshaped) vs 4D dot_general vs
           unrolled dynamic-index stack, on the (8,480,640,40) logits map.
  mix:     per-sample weighted mixing muls (the dense-hard vs baseline gap).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

ITERS = int(os.environ.get("BENCH_SCAN_ITERS", "30"))
ROUNDS = int(os.environ.get("ROUNDS", "4"))


def main():
    from bench import setup_compilation_cache
    setup_compilation_cache()
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)

    def scan_bench(f, *args0):
        @jax.jit
        def run(*args):
            def body(c, _):
                out = f(args[0] + c, *args[1:])
                return 1e-30 * jnp.sum(out[(0,) * out.ndim]), ()
            c, _ = jax.lax.scan(body, jnp.zeros((), args[0].dtype), None,
                                length=ITERS)
            return c
        return run

    @jax.jit
    def nop(*args):
        return jnp.sum(args[0][(0,) * args[0].ndim])

    cands = {}
    argsets = {}

    # ---------------- cond costs on a stage-1-sized operand ----------------
    x1 = jnp.asarray(
        rng.standard_normal((8, 120, 160, 64)).astype(np.float32))
    pred = jnp.bool_(True)

    def heavy(x):
        # ~stage-ish elementwise chain; keeps the operand hot
        return jnp.tanh(x) * 1.0001 + 0.0001

    def c_plain(x):
        return heavy(x)

    def c_cond1(x):
        return jax.lax.cond(x[0, 0, 0, 0] > -1e9, heavy, heavy, x)

    def c_cond4(x):
        for _ in range(4):
            x = jax.lax.cond(x[0, 0, 0, 0] > -1e9, heavy, heavy, x)
        return x

    def c_cond4_tiny_out(x):
        # branches return only a small delta (stage-4-sized), x passes outside
        small = x[:, :30, :40, :]
        for _ in range(4):
            d = jax.lax.cond(
                x[0, 0, 0, 0] > -1e9,
                lambda s: jnp.tanh(s),
                lambda s: s,
                small,
            )
            small = d
        return x + jnp.pad(small, ((0, 0), (0, 90), (0, 120), (0, 0)))

    for n, f in [("cond_plain", c_plain), ("cond_x1", c_cond1),
                 ("cond_x4", c_cond4), ("cond_x4_smallop", c_cond4_tiny_out)]:
        cands[n] = f
        argsets[n] = (x1,)

    xb = x1.astype(jnp.bfloat16)
    cands["cond_x4_bf16"] = c_cond4
    argsets["cond_x4_bf16"] = (xb,)

    # ---------------- permute variants on the logits map ----------------
    xl = jnp.asarray(
        rng.standard_normal((8, 480, 640, 40)).astype(np.float32))
    perm = jnp.asarray(np.array([3, 1, 7, 0, 5, 2, 6, 4], np.int32))

    def p_take(x, p):
        return jnp.take(x, p, axis=0)

    def p_mm2d(x, p):
        n = x.shape[0]
        oh = jax.nn.one_hot(p, n, dtype=x.dtype)
        return jax.lax.dot_general(
            oh, x.reshape(n, -1), (((1,), (0,)), ((), ()))
        ).reshape(x.shape)

    def p_mm4d(x, p):
        oh = jax.nn.one_hot(p, x.shape[0], dtype=x.dtype)
        return jax.lax.dot_general(oh, x, (((1,), (0,)), ((), ())))

    def p_stack(x, p):
        rows = [jax.lax.dynamic_index_in_dim(x, p[i], 0, keepdims=False)
                for i in range(x.shape[0])]
        return jnp.stack(rows, axis=0)

    def p_none(x, p):
        return x * 1.0001

    for n, f in [("perm_none", p_none), ("perm_take", p_take),
                 ("perm_mm2d", p_mm2d), ("perm_mm4d", p_mm4d),
                 ("perm_stack", p_stack)]:
        cands[n] = f
        argsets[n] = (xl, perm)

    # ---------------- per-sample mixing cost ----------------
    w = jnp.asarray(rng.random((8, 5)).astype(np.float32))

    def mix(x, w):
        wi = w[:, :2].sum(axis=1)[:, None, None, None]
        return wi * x + (1.0 - wi) * jnp.tanh(x)

    cands["mix_stage1"] = mix
    argsets["mix_stage1"] = (x1, w)

    runs = {k: scan_bench(f) for k, f in cands.items()}
    for k in runs:
        t0 = time.time()
        float(runs[k](*argsets[k]))
        print(f"compiled {k} ({time.time()-t0:.0f}s)", flush=True)
    float(nop(x1))

    raw = {k: [] for k in runs}
    names = list(runs)
    for rnd in range(ROUNDS):
        order = names[rnd % len(names):] + names[:rnd % len(names)]
        for k in order:
            t0 = time.perf_counter(); float(runs[k](*argsets[k]))
            tot = time.perf_counter() - t0
            t0 = time.perf_counter(); float(nop(*argsets[k]))
            ov = time.perf_counter() - t0
            raw[k].append(max(tot - ov, 1e-9) / ITERS)
        print(f"round {rnd} done", flush=True)

    print(f"\n{'candidate':<20} {'median':>9} {'min':>9}")
    for k in names:
        r = np.array(raw[k])
        print(f"{k:<20} {np.median(r)*1e3:9.3f} {r.min()*1e3:9.3f}",
              flush=True)


if __name__ == "__main__":
    main()
