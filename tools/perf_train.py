#!/usr/bin/env python
"""Training-step throughput of the flagship on one chip: fwd+bwd+SGD update
(the reference's training regime — multi-scale supervision, soft gate, temp
annealing) timed with the scan-in-jit pattern (state carried through the
scan, so every step's update feeds the next)."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

ITERS = int(os.environ.get("BENCH_SCAN_ITERS", "10"))
BS = int(os.environ.get("BS", "8"))


def main():
    from bench import setup_compilation_cache
    setup_compilation_cache()
    import jax
    import jax.numpy as jnp

    from dynmm_tpu.cli.seg_args import ArgumentParserRGBDSegmentation
    from dynmm_tpu.cli.seg_build import build_model
    from dynmm_tpu.train.seg import SegTrainConfig, SegTrainer

    argv = [
        "--dataset", "synthetic", "--height", "480", "--width", "640",
        "--batch_size", str(BS), "--dynamic", "--global-gate",
        "--loss-ratio", "1e-4",
    ]
    parser = ArgumentParserRGBDSegmentation()
    parser.set_common_args()
    args = parser.parse_args(argv)
    model = build_model(args, 40)
    cfg = SegTrainConfig(batch_size=BS, loss_ratio=1e-4, dynamic=True,
                         global_gate=True)
    trainer = SegTrainer(model, cfg, np.ones(40, np.float32))

    rng = np.random.default_rng(0)
    image = jnp.asarray(
        rng.standard_normal((BS, 480, 640, 3)).astype(np.float32))
    depth = jnp.asarray(
        rng.standard_normal((BS, 480, 640, 1)).astype(np.float32))
    label = jnp.asarray(rng.integers(0, 41, (BS, 480, 640)).astype(np.int32))
    downs = [
        jnp.asarray(rng.integers(0, 41, (BS, 480 // r, 640 // r))
                    .astype(np.int32))
        for r in (8, 16, 32)
    ]
    targets = [label] + downs

    state = trainer.init_state(
        jax.random.PRNGKey(0),
        {"image": np.asarray(image), "depth": np.asarray(depth)})
    step = trainer._get_train_step((False, False, False))

    @jax.jit
    def run(state, image, depth, *targets):
        def body(carry, _):
            st, rng = carry
            rng, sub = jax.random.split(rng)
            st, total, per_scale, loss_flop = step(
                st, image, depth, list(targets), 1e-3, 1.0, sub)
            return (st, rng), total
        (st, _), totals = jax.lax.scan(
            body, (state, jax.random.PRNGKey(1)), None, length=ITERS)
        return totals[-1]

    @jax.jit
    def nop(state, image, depth, *targets):
        return jnp.sum(image[0, 0, 0])

    t0 = time.time()
    float(run(state, image, depth, *targets))
    print(f"compiled ({time.time()-t0:.0f}s)", flush=True)
    float(nop(state, image, depth, *targets))

    best = np.inf
    for _ in range(4):
        t0 = time.perf_counter(); float(run(state, image, depth, *targets))
        tot = time.perf_counter() - t0
        t0 = time.perf_counter(); float(nop(state, image, depth, *targets))
        ov = time.perf_counter() - t0
        best = min(best, max(tot - ov, 1e-9) / ITERS)
    print(f"train step (dynamic global-gate, bs={BS}, 480x640, "
          f"multi-scale loss): {best*1e3:.2f} ms/step "
          f"({BS/best:.1f} samples/s)")


if __name__ == "__main__":
    main()
