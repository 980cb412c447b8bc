#!/usr/bin/env python
"""Stems with and without the fused kernel, interleaved — the decisive
in-model comparison. Standalone the kernel's pass-2 runs at the copy floor
(tools/perf_stem_parts.py), yet end-to-end it trails XLA; hypothesis: XLA
hands custom calls default-layout (linear) operands, so feeding the
TILED stem-conv outputs into pallas costs a hidden relayout copy per map —
an overhead every in-model kernel pays on conv-adjacent tensors."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from _harness import measure_all, scan_bench


def main():
    from bench import make_eval_batch, setup_compilation_cache
    setup_compilation_cache()
    import jax
    import jax.numpy as jnp

    from dynmm_tpu.models.esanet import ESANetConfig
    from dynmm_tpu.models.skip_gate import SkipGateESANet

    def build(use_pallas):
        cfg = ESANetConfig(
            height=480, width=640, num_classes=40,
            encoder_rgb="resnet34", encoder_depth="resnet34",
            encoder_block="NonBottleneck1D",
            channels_decoder=(512, 256, 128), nr_decoder_blocks=(3, 3, 3),
            fuse_depth_in_rgb_encoder="SE-add",
            upsampling="learned-3x3-zeropad",
            use_pallas=use_pallas,
        )
        return SkipGateESANet(cfg)

    m_xla = build(False)
    m_pal = build(True)
    rng = np.random.default_rng(0)
    rgb0, depth0 = make_eval_batch(rng, 8, 480, 640)
    rgb, depth = jnp.asarray(rgb0), jnp.asarray(depth0)
    variables = m_xla.init(jax.random.PRNGKey(0), rgb, depth, train=False)

    # keep BOTH outputs alive so neither variant DCEs the depth pool
    def stems_fn(model):
        def f(mdl, r, d):
            a, b = mdl._stems(r, d, False)
            return a + b[:, :1, :1, :1] * 1e-30
        return lambda r, d, v: model.apply(v, r, d, method=f)

    def full_fn(model):
        return lambda r, d, v: model.apply(v, r, d, train=False,
                                           baseline=True)

    runs = {
        "stems_xla": scan_bench(stems_fn(m_xla)),
        "stems_pallas": scan_bench(stems_fn(m_pal)),
        "full_xla": scan_bench(full_fn(m_xla)),
        "full_pallas": scan_bench(full_fn(m_pal)),
    }
    argsets = {k: (rgb, depth, variables) for k in runs}
    meds = measure_all(runs, argsets)
    print(f"\n  stems kernel delta: "
          f"{(meds['stems_pallas']-meds['stems_xla'])*1e3:+.3f} ms; "
          f"full delta {(meds['full_pallas']-meds['full_xla'])*1e3:+.3f} ms")


if __name__ == "__main__":
    main()
