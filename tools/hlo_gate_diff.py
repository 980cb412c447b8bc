#!/usr/bin/env python
"""Dump optimized HLO for stems vs stems+gate and diff the expensive ops —
the gate costs ~0 standalone but +1.3 ms in-model (tools/perf_gate2.py);
whatever XLA adds between these two programs is the cost."""

import os
import re
import sys
from collections import Counter

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def op_histogram(hlo_text):
    """{opcode: [total_bytes_of_outputs]} for heavyweight ops."""
    hist = Counter()
    bytes_per = Counter()
    for m in re.finditer(
            r"= ([a-z0-9]+)\[([\d,]*)\][^)]*?\s+(fusion|copy|transpose|"
            r"convolution|custom-call|reduce-window|reduce|dot|bitcast)\(",
            hlo_text):
        dtype, dims, opcode = m.groups()
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        itemsize = 2 if dtype in ("bf16", "f16") else 4
        hist[opcode] += 1
        bytes_per[opcode] += n * itemsize
    return hist, bytes_per


def main():
    from bench import make_eval_batch, load_trained_gate, setup_compilation_cache
    setup_compilation_cache()
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship

    h, w = 480, 640
    model = _flagship(h, w)
    rng = np.random.default_rng(0)
    rgb0, depth0 = make_eval_batch(rng, 8, h, w)
    rgb, depth = jnp.asarray(rgb0), jnp.asarray(depth0)
    variables = model.init(jax.random.PRNGKey(0), rgb, depth, train=False)
    variables, _ = load_trained_gate(variables)

    def stems_only(v, r, d):
        return model.apply(v, r, d,
                           method=lambda m, r, d: m._stems(r, d, False)[0])

    def stems_gate(v, r, d):
        def f(m, r, d):
            rp, dp = m._stems(r, d, False)
            return m.gate_weights(rp, dp, hard=True)
        return model.apply(v, r, d, method=f)

    texts = {}
    for name, fn in (("stems", stems_only), ("stems_gate", stems_gate)):
        lowered = jax.jit(fn).lower(variables, rgb, depth)
        compiled = lowered.compile()
        txt = compiled.as_text()
        texts[name] = txt
        path = f"/tmp/hlo_{name}.txt"
        with open(path, "w") as f:
            f.write(txt)
        hist, byts = op_histogram(txt)
        print(f"\n== {name} ({len(txt.splitlines())} lines -> {path})")
        for op in sorted(byts, key=byts.get, reverse=True):
            print(f"  {op:<14} x{hist[op]:<4} {byts[op]/1e6:10.1f} MB")

    # big ops present only in stems_gate
    def big_lines(txt, min_mb=5):
        out = []
        for line in txt.splitlines():
            m = re.search(r"= ([a-z0-9]+)\[([\d,]+)\]", line)
            if not m:
                continue
            n = 1
            for d in m.group(2).split(","):
                n *= int(d)
            sz = n * (2 if m.group(1) in ("bf16", "f16") else 4)
            if sz >= min_mb * 1e6:
                opm = re.search(r"\]\S*\s+([a-z-]+)\(", line)
                out.append((round(sz / 1e6), opm.group(1) if opm else "?",
                            line.strip()[:110]))
        return out

    a = {x[2] for x in big_lines(texts["stems"])}
    print("\n== big ops only in stems_gate:")
    for sz, op, line in big_lines(texts["stems_gate"]):
        if line not in a:
            print(f"  {sz:>5} MB {op:<14} {line}")


if __name__ == "__main__":
    main()
