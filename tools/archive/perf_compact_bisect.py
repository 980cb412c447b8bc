#!/usr/bin/env python
"""Bisect forward_routed_compact's overhead on the real TPU: is the 44.8 ms
step (tools/perf_decompose2.py, vs 11.5 dense) the row gathers, the
lax.cond ladder, or the partial-batch stage compute?

Candidates (bs=8 480×640, trained gate, mixed eval batch):
  dense          — baseline (always-fuse)
  switch_batched — per-stage conds, batch-max k, no sort
  gather_only    — dense forward + take(order)/take(inv) permutes (isolates
                   the gather cost without any conds)
  permute_only   — same but one-hot-matmul permutes (the fix candidate)
  compact_take   — forward_routed_compact with jnp.take permutes (pre-fix)
  compact_mm     — forward_routed_compact with matmul permutes, caps (0,bs)
  compact_mm_4   — matmul permutes, caps (4,bs): real partial-batch compute
                   (eval stream is ~half easy, so depth stages run at cap 4)
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

ITERS = int(os.environ.get("BENCH_SCAN_ITERS", "20"))
ROUNDS = int(os.environ.get("ROUNDS", "4"))
BS = 8


def main():
    from bench import (make_eval_batch, make_scan_bench,
                       load_trained_gate, setup_compilation_cache)
    import bench as bench_mod

    bench_mod.SCAN_ITERS = ITERS
    setup_compilation_cache()
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship
    from dynmm_tpu.core import routing

    h, w = 480, 640
    model = _flagship(h, w)
    rng = np.random.default_rng(0)
    rgb0, depth0 = make_eval_batch(rng, BS, h, w)
    rgb, depth = jnp.asarray(rgb0), jnp.asarray(depth0)
    variables = model.init(jax.random.PRNGKey(0), rgb, depth, train=False)
    variables, _ = load_trained_gate(variables)

    @jax.jit
    def nop(v, r, d):
        return jnp.sum(r[0, 0, 0])

    def dense(v, r, d):
        return model.apply(v, r, d, train=False, baseline=True)

    def switch_batched(v, r, d):
        return model.apply(v, r, d, method=model.forward_switch_batched)

    def make_gather_probe(via_matmul):
        def f(v, r, d):
            def m(mdl, r, d):
                out, wgt = mdl(r, d, train=False, hard=True,
                               return_weight=True)
                k = jnp.argmax(wgt, axis=-1).astype(jnp.int32)
                order = jnp.argsort(-k)
                inv = jnp.argsort(order)
                r2 = routing.permute_rows(out, order, via_matmul=via_matmul)
                return routing.permute_rows(r2, inv, via_matmul=via_matmul)
            return model.apply(v, r, d, method=m)
        return f

    def make_compact(via_matmul, caps):
        def f(v, r, d):
            import dynmm_tpu.core.routing as rt
            orig = rt.permute_rows
            # permute impl is a default arg read at trace time via the
            # module-level function; patch for the take variant
            if not via_matmul:
                import functools
                rt_patch = functools.partial(orig, via_matmul=False)
                import dynmm_tpu.models.skip_gate as sg
                sg.permute_rows, saved = rt_patch, sg.permute_rows
                try:
                    return model.apply(
                        v, r, d, caps=caps,
                        method=model.forward_routed_compact)
                finally:
                    sg.permute_rows = saved
            return model.apply(v, r, d, caps=caps,
                               method=model.forward_routed_compact)
        return f

    candidates = {
        "dense": dense,
        "switch_batched": switch_batched,
        "gather_only": make_gather_probe(False),
        "permute_only": make_gather_probe(True),
        "compact_take": make_compact(False, (0, BS)),
        "compact_mm": make_compact(True, (0, BS)),
        "compact_mm_4": make_compact(True, (4, BS)),
    }
    runs = {k: make_scan_bench(f) for k, f in candidates.items()}

    for k, run in runs.items():
        t0 = time.time()
        float(run(variables, rgb, depth))
        print(f"compiled {k} ({time.time()-t0:.0f}s)", flush=True)
    float(nop(variables, rgb, depth))

    raw = {k: [] for k in runs}
    names = list(runs)
    for rnd in range(ROUNDS):
        order = names[rnd % len(names):] + names[:rnd % len(names)]
        for k in order:
            t0 = time.perf_counter(); float(runs[k](variables, rgb, depth))
            tot = time.perf_counter() - t0
            t0 = time.perf_counter(); float(nop(variables, rgb, depth))
            ov = time.perf_counter() - t0
            raw[k].append(max(tot - ov, 1e-9) / ITERS)
        print(f"round {rnd} done", flush=True)

    print(f"\n{'candidate':<16} {'median':>9} {'min':>9} {'max':>9}")
    for k in names:
        r = np.array(raw[k])
        print(f"{k:<16} {np.median(r)*1e3:9.3f} {r.min()*1e3:9.3f} "
              f"{r.max()*1e3:9.3f}", flush=True)


if __name__ == "__main__":
    main()
