"""Shared contention-robust measurement harness for the tools/ probes.

Absolute step times on this chip swing ~2× across a day (tunnel/chip
contention), so probes round-robin reps over all candidates and report
medians; ratios between candidates are the quantities to trust. See
tools/perf_clean.py for the original methodology notes.
"""

import os
import time

import numpy as np

ITERS = int(os.environ.get("BENCH_SCAN_ITERS", "20"))
ROUNDS = int(os.environ.get("ROUNDS", "4"))


def scan_bench(f, iters: int = None):
    """Wrap f(*args)->array into an N-iteration on-device scan benchmark.
    The first arg must be a float array (perturbed to chain iterations)."""
    import jax
    import jax.numpy as jnp

    iters = iters or ITERS

    @jax.jit
    def run(*args):
        def body(c, _):
            out = f(args[0] + c, *args[1:])
            return (1e-30 * jnp.sum(out[(0,) * out.ndim])
                    ).astype(args[0].dtype), ()
        c, _ = jax.lax.scan(body, jnp.zeros((), args[0].dtype), None,
                            length=iters)
        return c

    return run


def measure_all(runs: dict, argsets: dict, rounds: int = None,
                iters: int = None, label: str = "") -> dict:
    """Compile all candidates, interleave reps, return {name: median_sec}.

    runs: {name: jitted fn}; argsets: {name: args tuple}. A per-candidate
    no-op jit of the same arity calibrates the host round-trip."""
    import jax
    import jax.numpy as jnp

    rounds = rounds or ROUNDS
    iters = iters or ITERS

    @jax.jit
    def nop(*args):
        return jnp.sum(args[0][(0,) * args[0].ndim])

    for k, run in runs.items():
        t0 = time.time()
        float(run(*argsets[k]))
        print(f"{label}compiled {k} ({time.time()-t0:.0f}s)", flush=True)

    raw = {k: [] for k in runs}
    names = list(runs)
    for rnd in range(rounds):
        order = names[rnd % len(names):] + names[:rnd % len(names)]
        for k in order:
            t0 = time.perf_counter(); float(runs[k](*argsets[k]))
            tot = time.perf_counter() - t0
            t0 = time.perf_counter(); float(nop(*argsets[k]))
            ov = time.perf_counter() - t0
            raw[k].append(max(tot - ov, 1e-9) / iters)
        print(f"{label}round {rnd} done", flush=True)

    meds = {}
    print(f"\n{label}{'candidate':<22} {'median':>9} {'min':>9} {'max':>9}")
    for k in names:
        r = np.array(raw[k])
        meds[k] = float(np.median(r))
        print(f"{label}{k:<22} {np.median(r)*1e3:9.3f} {r.min()*1e3:9.3f} "
              f"{r.max()*1e3:9.3f}", flush=True)
    return meds
