"""Batched hard-routing execution utilities (TPU-native).

The reference routes per sample with Python control flow
(``ModalityDynMM/multimedia/imdb_dyn.py:103-114`` picks a branch per input;
``affect_dyn.py:152-166`` via ``infer_mode``), which XLA's trace-once model
cannot express directly. The TPU-native equivalent used across this repo:

  sort the batch by routing decision  →  each branch's participants form a
  contiguous PREFIX/SUFFIX  →  run each branch once on a static-capacity
  slice picked from a small ladder of ``lax.cond``s  →  reassemble.

Compared with dense (all branches on all samples) this recovers the per-
sample compute savings while keeping every shape static. Every ``lax.cond``
boundary has a real cost (operand copies — measured ~1-2 ms at seg's
480×640 bs=8 maps, negligible at the modality models' KB-sized operands),
so the ladder granularity is a caller knob.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp


def permute_rows(x, perm, via_matmul: bool = True):
    """Permute axis 0 of ``x`` by index vector ``perm``.

    ``jnp.take`` lowers to a generic gather — measured 12.8 ms for one
    permute of the (8, 480, 640, 40) logits map on this TPU runtime, and a
    one-hot matmul over a *reshaped* (n, −1) view is even worse (27.7 ms —
    the reshape forces a full relayout). A dot_general over the original
    dims costs 0.03 ms (tools/perf_dispatch.py): contract perm's one-hot
    with axis 0 and let XLA keep the tiled layout. Exact for a true
    permutation (each output row = 1·x[perm[i]] + Σ 0·x[j]); note 0·NaN in
    *other* rows would propagate, so inputs must be NaN-free.
    """
    n = x.shape[0]
    # the one-hot contraction does n²·D MACs — a win at small batch (0.03 ms
    # at seg's bs=8) but a 147 GFLOP matmul at bs=4096; gathers of small rows
    # are fine, it's multi-MB rows that crater (12.8 ms for 24.5 MB rows)
    # jnp.issubdtype, not dtype.kind: numpy's bfloat16 extension dtype has
    # kind 'V', and bf16 is the documented serving dtype — a kind check would
    # silently route it onto the slow gather path.
    if (
        not via_matmul
        or x.ndim == 1
        or not jnp.issubdtype(x.dtype, jnp.floating)
        or n > 256
    ):
        return jnp.take(x, perm, axis=0)
    p = jax.nn.one_hot(perm, n, dtype=x.dtype)  # (n, n), row i picks perm[i]
    return jax.lax.dot_general(p, x, (((1,), (0,)), ((), ())))


def scatter_rows(contrib, order, n: int):
    """Place sorted-prefix rows back at their original batch positions.

    ``contrib``: (cap, *D) — rows computed for sorted positions 0..cap-1,
    i.e. original samples ``order[0..cap-1]``. Returns (n, *D) with
    ``out[order[p]] = contrib[p]`` for p < cap and zeros elsewhere. Same
    dot_general-over-original-dims trick as :func:`permute_rows` (a gather/
    scatter of multi-MB rows runs at ~13 GB/s on this runtime; the one-hot
    contraction keeps the tiled layout). 0·row must be exact, so inputs
    must be NaN-free (true for all routed activations).
    """
    cap = contrib.shape[0]
    s = jax.nn.one_hot(order[:cap], n, dtype=contrib.dtype)  # (cap, n)
    return jax.lax.dot_general(s, contrib, (((0,), (0,)), ((), ())))


def _slice_tree(tree, lo: int, hi: int):
    return jax.tree_util.tree_map(lambda a: a[lo:hi], tree)


def _ladder(caps: Sequence[int], n, make_branch, operands):
    """Chained 2-way ``lax.cond``s picking the smallest capacity ≥ n.

    ``make_branch(cap)`` returns a function of ``operands`` whose output
    shape must not depend on ``cap`` (pad inside the branch).
    """
    caps = sorted(set(int(c) for c in caps))

    def choose(ladder, ops):
        cap = ladder[0]
        if len(ladder) == 1:
            return make_branch(cap)(ops)
        return jax.lax.cond(
            n <= cap, make_branch(cap), lambda o: choose(ladder[1:], o), ops
        )

    return choose(caps, operands)


def compact_two_branch(
    k,
    inputs,
    cheap_fn: Callable,
    expensive_fn: Callable,
    out_shape: tuple,
    caps: Optional[Sequence[int]] = None,
    dtype=jnp.float32,
):
    """Per-sample 2-way routed execution with bucket compaction.

    Args:
      k: (B,) int — 1 routes a sample to ``expensive_fn``, 0 to ``cheap_fn``.
      inputs: pytree of arrays with leading batch dim B.
      cheap_fn / expensive_fn: ``fn(inputs_slice) -> (n, *out_shape)`` — run
        a branch on a contiguous slice of the (sorted) batch.
      out_shape: per-sample output shape (e.g. ``(num_classes,)``).
      caps: capacity ladder, ascending, ending at B. Default quartiles
        ``(0, B//4, B//2, 3B//4, B)``. Any ladder is exact; granularity only
        trades dispatch overhead against wasted padding compute.

    Returns (B, *out_shape) outputs in the caller's sample order. Each
    sample's value equals running its selected branch alone (same math as a
    dense one-hot mix — see tests/test_modality_routed.py).
    """
    bs = k.shape[0]
    if caps is None:
        caps = (0, bs // 4, bs // 2, (3 * bs) // 4, bs)
    caps = [int(c) for c in caps] + [bs]
    for c in caps:
        if not 0 <= c <= bs:
            raise ValueError(
                f"capacity ladder entry {c} outside [0, batch={bs}]; "
                f"caps={caps[:-1]}"
            )

    order = jnp.argsort(-k)  # expensive-branch samples first
    inv = jnp.argsort(order)
    sorted_inputs = jax.tree_util.tree_map(
        lambda a: permute_rows(a, order)
        if jnp.issubdtype(a.dtype, jnp.floating)
        else jnp.take(a, order, axis=0),
        inputs,
    )
    n_exp = jnp.sum(k).astype(jnp.int32)
    n_cheap = (bs - n_exp).astype(jnp.int32)

    def exp_branch(cap):
        def br(ops):
            if cap == 0:
                return jnp.zeros((bs,) + out_shape, dtype)
            out = expensive_fn(_slice_tree(ops, 0, cap))
            pad = jnp.zeros((bs - cap,) + out_shape, out.dtype)
            return jnp.concatenate([out.astype(dtype), pad], axis=0)

        return br

    def cheap_branch(cap):
        def br(ops):
            if cap == 0:
                return jnp.zeros((bs,) + out_shape, dtype)
            out = cheap_fn(_slice_tree(ops, bs - cap, bs))
            pad = jnp.zeros((bs - cap,) + out_shape, out.dtype)
            return jnp.concatenate([pad, out.astype(dtype)], axis=0)

        return br

    out_e = _ladder(caps, n_exp, exp_branch, sorted_inputs)
    out_c = _ladder(caps, n_cheap, cheap_branch, sorted_inputs)
    idx = jnp.arange(bs)
    sel = (idx < n_exp).reshape((bs,) + (1,) * len(out_shape))
    out_sorted = jnp.where(sel, out_e, out_c)
    return permute_rows(out_sorted, inv)
