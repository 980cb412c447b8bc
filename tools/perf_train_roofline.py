#!/usr/bin/env python
"""Roofline + decomposition for the TRAINING step (round 3): the benched
131 ms/step (bs=8 fp32) sits ~2.5x above a naive 2x-forward traffic
estimate — find out whether that is real headroom or inherent.

Measures (interleaved):
  fwd_loss      — forward + multi-scale loss only (no grad)
  grad          — value_and_grad of the same loss (no optimizer)
  full_step     — the trainer's real step (grad + SGD update + BN stats)
plus XLA cost_analysis bytes/flops for each (scan body counted once), and
a device-timeline trace of full_step.

BS/ITERS/DTYPE env-overridable.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

ITERS = int(os.environ.get("BENCH_SCAN_ITERS", "4"))
ROUNDS = int(os.environ.get("ROUNDS", "4"))
BS = int(os.environ.get("BS", "8"))
DTYPE = os.environ.get("DTYPE", "float32")
HBM_BW = 819e9
MXU_PEAK = 197e12


def main():
    import bench as bench_mod
    from bench import measure_interleaved, setup_compilation_cache

    bench_mod.SCAN_ITERS = ITERS
    setup_compilation_cache()
    import jax
    import jax.numpy as jnp

    from dynmm_tpu.cli.seg_args import ArgumentParserRGBDSegmentation
    from dynmm_tpu.cli.seg_build import build_model
    from dynmm_tpu.train.seg import SegTrainConfig, SegTrainer

    parser = ArgumentParserRGBDSegmentation()
    parser.set_common_args()
    args = parser.parse_args([
        "--dataset", "synthetic", "--height", "480", "--width", "640",
        "--batch_size", str(BS), "--dynamic", "--global-gate",
        "--loss-ratio", "1e-4", "--dtype", DTYPE,
    ])
    model = build_model(args, 40)
    cfg = SegTrainConfig(batch_size=BS, loss_ratio=1e-4, dynamic=True,
                         global_gate=True)
    trainer = SegTrainer(model, cfg, np.ones(40, np.float32))

    rng = np.random.default_rng(0)
    image = jnp.asarray(
        rng.standard_normal((BS, 480, 640, 3)).astype(np.float32))
    depth = jnp.asarray(
        rng.standard_normal((BS, 480, 640, 1)).astype(np.float32))
    targets = [jnp.asarray(rng.integers(0, 41, (BS, 480 // r, 640 // r))
                           .astype(np.int32)) for r in (1, 8, 16, 32)]
    state = trainer.init_state(
        jax.random.PRNGKey(0),
        {"image": np.asarray(image), "depth": np.asarray(depth)})
    step = trainer._get_train_step((False, False, False))
    from dynmm_tpu.train.seg_losses import multiscale_ce

    flags = dict(hard=False, baseline=False, ini=False)

    def loss_fn(params, model_state, image, depth, targets, temp, sub):
        preds, loss_flop, new_state = trainer._model_train_out(
            {"params": params, **model_state}, image, depth, temp, flags, sub)
        loss_seg, per_scale = multiscale_ce(
            preds, targets, trainer.class_weights)
        total = loss_seg + cfg.loss_ratio * jnp.maximum(
            loss_flop - cfg.flop_budget, 0.0)
        return total, (per_scale, loss_flop, new_state)

    def scan_over(fn_body):
        @jax.jit
        def run(state, image, depth, *targets):
            def body(carry, _):
                st, rng, c = carry
                rng, sub = jax.random.split(rng)
                st, probe = fn_body(st, image + c, depth + c, list(targets),
                                    sub)
                return (st, rng, 1e-30 * probe.astype(jnp.float32)), ()
            (_, _, c), _ = jax.lax.scan(
                body, (state, jax.random.PRNGKey(1), jnp.float32(0.0)),
                None, length=ITERS)
            return c
        return run

    def fwd_body(st, image, depth, targets, sub):
        total, _aux = loss_fn(
            st["params"], st["model_state"], image, depth, targets, 1.0, sub)
        return st, total

    def grad_body(st, image, depth, targets, sub):
        (total, _aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            st["params"], st["model_state"], image, depth, targets, 1.0, sub)
        probe = total + sum(
            jnp.sum(g) * 0.0 for g in jax.tree_util.tree_leaves(grads))
        return st, probe

    def full_body(st, image, depth, targets, sub):
        st, total, _ps, _lf = step(st, image, depth, targets, 1e-3, 1.0, sub)
        return st, total

    runs = {
        "fwd_loss": scan_over(fwd_body),
        "grad": scan_over(grad_body),
        "full_step": scan_over(full_body),
    }

    @jax.jit
    def nop(state, image, depth, *targets):
        return jnp.sum(image[0, 0, 0])

    costs = {}
    for k, run in runs.items():
        ca = run.lower(state, image, depth, *targets).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        costs[k] = {"flops": ca.get("flops", 0.0),
                    "bytes": ca.get("bytes accessed", 0.0)}
        print(f"cost {k}: {costs[k]['flops']/1e9:.0f} GFLOP "
              f"{costs[k]['bytes']/1e9:.2f} GB", file=sys.stderr, flush=True)

    meds = measure_interleaved(runs, nop, state, image, depth, *targets,
                               rounds=ROUNDS)
    anchor = bench_mod.measure_matmul_anchor()
    print(f"anchor: {anchor}", file=sys.stderr)

    for k in ("fwd_loss", "grad", "full_step"):
        t, c = meds[k], costs[k]
        floor = max(c["bytes"] / HBM_BW, c["flops"] / MXU_PEAK)
        print(f"{k:<10} {t*1e3:8.2f} ms  {c['bytes']/1e9:7.2f} GB "
              f"{c['flops']/1e9:7.0f} GFLOP  floor {floor*1e3:7.2f} ms  "
              f"x_floor {t/floor:5.2f}  {c['bytes']/t/1e9:6.0f} GB/s",
              file=sys.stderr)

    # device timeline of the full step
    import gzip
    import json as js
    d = "/tmp/train_trace"
    with jax.profiler.trace(d):
        float(runs["full_step"](state, image, depth, *targets))
    base = os.path.join(d, "plugins", "profile")
    run_d = sorted(os.listdir(base))[-1]
    (path,) = [os.path.join(base, run_d, f)
               for f in os.listdir(os.path.join(base, run_d))
               if f.endswith(".trace.json.gz")]
    with gzip.open(path) as f:
        tr = js.load(f)
    dev_pids = {e["pid"] for e in tr["traceEvents"]
                if e.get("ph") == "M" and e.get("name") == "process_name"
                and "device:TPU" in e["args"].get("name", "")}
    whiles = [e["dur"] for e in tr["traceEvents"]
              if e.get("ph") == "X" and e.get("pid") in dev_pids
              and e["name"].startswith("while")]
    if whiles:
        print(f"device while: {max(whiles)/ITERS/1e3:.2f} ms/iter",
              file=sys.stderr)

    print(js.dumps({k: round(v * 1e3, 2) for k, v in meds.items()}))


if __name__ == "__main__":
    main()
