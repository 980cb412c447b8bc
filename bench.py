"""Benchmark: NYUv2 fusion-level DynMM (SkipGateESANet R34-NBt1D, 480×640)
inference throughput on one TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "frames/sec", "vs_baseline": N}

value        = batched (bs=8, the reference's eval batch) hard-gate eval
               throughput via batch-adaptive routing (bit-equal to dense
               hard-gate eval; depth stages beyond the batch's max selected
               path are skipped). Gate decisions come from the live gate.
vs_baseline  = value / static-baseline throughput measured identically on the
               same chip (baseline = always-fuse path 4 = static ESANet
               compute, no gate). The reference repo publishes no throughput
               numbers (SURVEY §6), so the static model on identical hardware
               is the baseline; with an untrained gate this hovers near 1.0
               (gate cost ≈ skipped work) — it becomes meaningful with
               trained gates that pick cheap paths.

Timing methodology: this environment reaches the TPU through a high-latency
tunnel where per-call host timing is meaningless, so each measurement runs
N iterations *inside one jit* via ``lax.scan`` (iterations chained through a
data dependency so XLA cannot hoist the body) and reads back one scalar; a
no-op jit call of the same arity calibrates the fixed round-trip overhead.

Extra diagnostics (per-path latency, batched dense throughput) go to stderr;
stdout stays one JSON line.
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

import numpy as np

SCAN_ITERS = int(os.environ.get("BENCH_SCAN_ITERS", "10"))


def setup_compilation_cache():
    """Persist compiled programs across bench runs (first compile of the
    5-branch switch graph is minutes; later runs are instant)."""
    import jax

    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


class _SkipDiagnostics(Exception):
    pass


def log(msg: str):
    print(msg, file=sys.stderr, flush=True)


def make_scan_bench(apply_fn):
    """Wrap apply_fn(variables, rgb, depth)->logits in an N-iteration scan
    with an artificial data dependency; returns jitted fn -> scalar."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(variables, rgb, depth):
        def body(carry, _):
            out = apply_fn(variables, carry, depth)
            # chain: negligible perturbation keeps a true data dependency
            carry = carry + 1e-30 * jnp.mean(out)
            return carry, ()
        carry, _ = jax.lax.scan(body, rgb, None, length=SCAN_ITERS)
        return jnp.sum(carry[0, 0, 0])

    return run


def measure(run, nop, *args, reps: int = 3) -> float:
    """Seconds per iteration, overhead-corrected, best of ``reps``."""
    float(run(*args))  # compile + warm
    float(nop(*args))
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        float(run(*args))
        total = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(nop(*args))
        overhead = time.perf_counter() - t0
        best = min(best, max(total - overhead, 1e-9) / SCAN_ITERS)
    return best


def main():
    setup_compilation_cache()
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship

    h, w = 480, 640
    model = _flagship(h, w)
    rng = np.random.default_rng(0)
    rgb = jnp.asarray(rng.standard_normal((1, h, w, 3)).astype(np.float32))
    depth = jnp.asarray(rng.standard_normal((1, h, w, 1)).astype(np.float32))

    log(f"devices: {jax.devices()}")
    variables = model.init(jax.random.PRNGKey(0), rgb, depth, train=False)

    @jax.jit
    def nop(variables, rgb, depth):
        return jnp.sum(rgb[0, 0, 0])

    bs = 8
    rgb8 = jnp.tile(rgb, (bs, 1, 1, 1))
    depth8 = jnp.tile(depth, (bs, 1, 1, 1))

    # Headline: batched hard-gate eval throughput via batch-adaptive routing
    # (bit-equal to dense hard-gate eval — tests/test_switch_batched.py — but
    # depth stages beyond the batch's max selected path are skipped).
    fd = make_scan_bench(
        lambda v, r, d: model.apply(v, r, d, method=model.forward_switch_batched)
    )
    td = measure(fd, nop, variables, rgb8, depth8)
    log(f"bs={bs} routed hard: {td*1e3:.2f} ms/batch ({bs/td:.1f} fps)")

    # Baseline: static ESANet compute (always-fuse) at the same batch.
    fb = make_scan_bench(
        lambda v, r, d: model.apply(v, r, d, train=False, baseline=True)
    )
    tb = measure(fb, nop, variables, rgb8, depth8)
    log(f"bs={bs} dense baseline: {tb*1e3:.2f} ms/batch ({bs/tb:.1f} fps)")

    # Diagnostics: bs=1 latency-mode switch routing + per-path latency.
    # Each adds a multi-minute compile on a cold cache; opt in via BENCH_FULL=1.
    try:
        if os.environ.get("BENCH_FULL", "0") in ("", "0", "false"):
            raise _SkipDiagnostics
        fdd = make_scan_bench(
            lambda v, r, d: model.apply(v, r, d, train=False, hard=True)
        )
        tdd = measure(fdd, nop, variables, rgb8, depth8, reps=1)
        log(f"bs={bs} dense hard: {tdd*1e3:.2f} ms/batch ({bs/tdd:.1f} fps)")
        t_dyn = measure(
            make_scan_bench(
                lambda v, r, d: model.apply(v, r, d, method=model.forward_switch)
            ),
            nop, variables, rgb, depth, reps=1,
        )
        t_base = measure(
            make_scan_bench(
                lambda v, r, d: model.apply(
                    v, r, d, baseline=True, method=model.forward_switch
                )
            ),
            nop, variables, rgb, depth, reps=1,
        )
        log(f"bs=1 switch: dynamic {t_dyn*1e3:.2f} ms ({1/t_dyn:.1f} fps) | "
            f"static-baseline {t_base*1e3:.2f} ms ({1/t_base:.1f} fps)")
        for k in (0, 4):
            fk = make_scan_bench(
                functools.partial(
                    lambda v, r, d, k: model.apply(
                        v, r, d, force_path=k, method=model.forward_switch
                    ),
                    k=k,
                )
            )
            tk = measure(fk, nop, variables, rgb, depth, reps=1)
            log(f"  path k={k}: {tk*1e3:.2f} ms ({1/tk:.1f} fps)")
        # bf16 compute (params fp32, activations bf16) at the same batch
        model_bf16 = _flagship(h, w, dtype=jnp.bfloat16)
        fbf = make_scan_bench(
            lambda v, r, d: model_bf16.apply(v, r, d, train=False, hard=True)
        )
        tbf = measure(fbf, nop, variables, rgb8, depth8, reps=1)
        log(f"bs={bs} dense hard bf16: {tbf*1e3:.2f} ms/batch ({bs/tbf:.1f} fps)")
    except _SkipDiagnostics:
        log("diagnostics skipped (set BENCH_FULL=1 to enable)")
    except Exception as e:  # diagnostics must never kill the bench
        log(f"diagnostics failed: {e}")

    print(
        json.dumps(
            {
                "metric": "nyuv2_skipgate_r34nbt1d_480x640_bs8_hardgate_fps",
                "value": round(bs / td, 3),
                "unit": "frames/sec",
                "vs_baseline": round(tb / td, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
