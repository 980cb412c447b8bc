#!/usr/bin/env python
"""Diff the optimized HLO of dense_base (no gate) vs dense_hard (gate +
per-sample one-hot mixing) as name-insensitive (opcode, dtype, shape)
multisets — earlier line-string diffs were fooled by SSA renumbering.
Finds what XLA actually adds for the gate+mix path (measured +1.1-1.8 ms,
tools/perf_inmodel.py, while the gate is ~0 standalone)."""

import os
import re
import sys
from collections import Counter

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

OP_RE = re.compile(
    r"= ([a-z0-9]+)\[([\d,]*)\](?:\{[^}]*\})?\s+([a-z-]+)\(")


def op_multiset(hlo_text):
    ops = Counter()
    for m in OP_RE.finditer(hlo_text):
        dtype, dims, opcode = m.groups()
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        itemsize = 2 if dtype in ("bf16", "f16", "s16", "u16") else 4
        ops[(opcode, dtype, dims, n * itemsize)] += 1
    return ops


def summarize(name, ops):
    by_op = Counter()
    for (opcode, dtype, dims, sz), cnt in ops.items():
        by_op[opcode] += sz * cnt
    total = sum(by_op.values())
    print(f"\n== {name}: total op-output bytes {total/1e9:.2f} GB")
    for op, b in by_op.most_common(12):
        print(f"  {op:<16} {b/1e6:10.1f} MB")
    return total


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

    def dense_base(v, r, d):
        return model.apply(v, r, d, train=False, baseline=True)

    def dense_hard(v, r, d):
        return model.apply(v, r, d, train=False, hard=True)

    sets, texts = {}, {}
    for name, fn in (("dense_base", dense_base), ("dense_hard", dense_hard)):
        txt = jax.jit(fn).lower(variables, rgb, depth).compile().as_text()
        texts[name] = txt
        with open(f"/tmp/hlo_{name}.txt", "w") as f:
            f.write(txt)
        sets[name] = op_multiset(txt)
        summarize(name, sets[name])

    diff = sets["dense_hard"] - sets["dense_base"]
    gone = sets["dense_base"] - sets["dense_hard"]
    print("\n== ops added in dense_hard (count x size):")
    for (opcode, dtype, dims, sz), cnt in sorted(
            diff.items(), key=lambda kv: -kv[0][3] * kv[1])[:25]:
        print(f"  +{cnt} x {sz/1e6:8.1f} MB  {opcode:<14} {dtype}[{dims}]")
    print("\n== ops removed vs dense_base:")
    for (opcode, dtype, dims, sz), cnt in sorted(
            gone.items(), key=lambda kv: -kv[0][3] * kv[1])[:15]:
        print(f"  -{cnt} x {sz/1e6:8.1f} MB  {opcode:<14} {dtype}[{dims}]")


if __name__ == "__main__":
    main()
