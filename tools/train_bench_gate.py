#!/usr/bin/env python
"""Train the flagship gate for the benchmark (VERDICT r1 item 4).

The round-1 bench ran an untrained gate, making the routed-vs-baseline ratio
uninformative. This trains ONLY the gate (27K params) by self-distillation on
synthetic data: the teacher is the always-fuse path of the SAME randomly
initialized network (seed 0, the bench's init), the student is the soft-mixed
routed forward, loss = CE(student, teacher argmax) + λ·E[depth-encoder
GFLOPs] (the reference's resource loss, model_skip_mod_globalgate.py:314-322).
Half of each batch gets near-zero (uninformative) depth, half gets
rgb-correlated depth — so the optimal routing is input-dependent: skipping
depth barely changes the teacher's prediction for uninformative-depth samples
but does for informative ones.

Writes bench_assets/gate_trained.msgpack (gate params) + prints the held-out
branch distribution. bench.py loads this to report a trained-gate headline.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

STEPS = int(os.environ.get("STEPS", "300"))
LAM = float(os.environ.get("LAM", "0.05"))
LR = float(os.environ.get("LR", "3e-3"))


def make_batch(rng, bs, h, w):
    rgb = rng.standard_normal((bs, h, w, 3)).astype(np.float32)
    # half the batch: depth correlated with rgb (informative); half: near-zero
    base = rgb.mean(axis=-1, keepdims=True)
    depth = np.where(
        (np.arange(bs) % 2 == 0)[:, None, None, None],
        base + 0.3 * rng.standard_normal((bs, h, w, 1)).astype(np.float32),
        0.02 * rng.standard_normal((bs, h, w, 1)).astype(np.float32),
    )
    return rgb, depth


def main():
    from bench import setup_compilation_cache

    setup_compilation_cache()
    import jax
    import jax.numpy as jnp
    import optax
    import flax.serialization

    from __graft_entry__ import _flagship
    from dynmm_tpu.models.skip_gate import flop_table

    h, w = 480, 640
    bs = 8
    model = _flagship(h, w)
    rng = np.random.default_rng(0)
    rgb0, depth0 = make_batch(rng, bs, h, w)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.asarray(rgb0), jnp.asarray(depth0),
        train=False,
    )
    params = variables["params"]
    rest = {k: v for k, v in variables.items() if k != "params"}
    gate0 = params["gate_layer"]
    other = {k: v for k, v in params.items() if k != "gate_layer"}
    table = jnp.asarray(flop_table("resnet34"), jnp.float32)

    tx = optax.adam(LR)
    opt_state = tx.init(gate0)

    @jax.jit
    def teacher(rgb, depth):
        out = model.apply(
            {"params": {**other, "gate_layer": gate0}, **rest},
            rgb, depth, train=False, baseline=True,
        )
        return jnp.argmax(out, axis=-1)

    @jax.jit
    def train_step(gate, opt_state, rgb, depth, labels):
        def loss_fn(g):
            pred, weight = model.apply(
                {"params": {**other, "gate_layer": g}, **rest},
                rgb, depth, train=False, temp=1.0, return_weight=True,
            )
            ce = optax.softmax_cross_entropy_with_integer_labels(
                pred, labels
            ).mean()
            resource = (weight.mean(axis=0) * table).mean()
            return ce + LAM * resource, (ce, resource, weight)

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(gate)
        updates, opt_state = tx.update(grads, opt_state)
        gate = optax.apply_updates(gate, updates)
        return gate, opt_state, loss, aux

    @jax.jit
    def hard_paths(gate, rgb, depth):
        _, weight = model.apply(
            {"params": {**other, "gate_layer": gate}, **rest},
            rgb, depth, train=False, hard=True, return_weight=True,
        )
        return jnp.argmax(weight, axis=-1)

    gate = gate0
    for step in range(STEPS):
        rgb, depth = make_batch(rng, bs, h, w)
        labels = teacher(jnp.asarray(rgb), jnp.asarray(depth))
        gate, opt_state, loss, (ce, res, _) = train_step(
            gate, opt_state, jnp.asarray(rgb), jnp.asarray(depth), labels
        )
        if step % 25 == 0:
            print(f"step {step:4d} loss {float(loss):.4f} "
                  f"ce {float(ce):.4f} resource {float(res):.3f}G",
                  flush=True)

    # held-out distribution (fixed seed, the bench's eval stream)
    eval_rng = np.random.default_rng(1234)
    counts = np.zeros(5, np.int64)
    for _ in range(8):
        rgb, depth = make_batch(eval_rng, bs, h, w)
        p = np.asarray(hard_paths(gate, jnp.asarray(rgb), jnp.asarray(depth)))
        counts += np.bincount(p, minlength=5)
    ratios = counts / counts.sum()
    print(f"held-out branch ratios: {np.array2string(ratios, precision=3)}")

    out_dir = os.path.join(os.path.dirname(__file__), "..", "bench_assets")
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, "gate_trained.msgpack")
    payload = {
        "gate_params": flax.serialization.to_state_dict(gate),
        "branch_ratios": ratios.astype(np.float32),
    }
    with open(path, "wb") as f:
        f.write(flax.serialization.msgpack_serialize(
            __import__("jax").tree_util.tree_map(np.asarray, payload)))
    print(f"saved {path}")


if __name__ == "__main__":
    main()
