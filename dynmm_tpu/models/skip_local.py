"""SkipESANet — fusion-level DynMM with *local* per-stage gates
(reference ``FusionDynMM/src/models/model_skip_mod.py:20-324``).

Four independent ``SqueezeAndExciteReweigh`` gates, one per fusion point;
gate i is computed from the stage-i rgb/depth features and controls the
*next* block's fusion. ``block_rule[i]`` ∈ {0: rgb only, 1: always fuse,
2: dynamic}. Gates chain: ``prev_weight`` multiplies the downstream fuse
probability so a skipped stage forces later skips, unless ``ini_stage``
breaks the dependency (:257-299). Fusion is the plain add variant.

The gates sample Gumbel noise, so forwards take a PRNG key.
Returns logits only (no resource loss — matching the reference).
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from dynmm_tpu.models.esanet import ESANetConfig, _DualEncoderParts
from dynmm_tpu.nn.layers import SqueezeAndExciteReweigh, max_pool_3x3_s2


class SkipESANet(_DualEncoderParts):
    """Local-gate fusion-level DynMM. ``cfg.fuse_depth_in_rgb_encoder`` is
    ignored for the branch mixing (always plain add, per the reference)."""

    block_rule: Sequence[int] = (1, 1, 1, 1)

    def setup(self):
        super().setup()
        ch = self.encoder_rgb.down_channels
        self.gate_layer0 = SqueezeAndExciteReweigh(
            64, activation=self.cfg.act, dtype=self.cfg.dtype, name="gate_layer0"
        )
        self.gate_layer1 = SqueezeAndExciteReweigh(
            ch[4], activation=self.cfg.act, dtype=self.cfg.dtype, name="gate_layer1"
        )
        self.gate_layer2 = SqueezeAndExciteReweigh(
            ch[8], activation=self.cfg.act, dtype=self.cfg.dtype, name="gate_layer2"
        )
        self.gate_layer3 = SqueezeAndExciteReweigh(
            ch[16], activation=self.cfg.act, dtype=self.cfg.dtype, name="gate_layer3"
        )

    def __call__(
        self,
        rgb,
        depth,
        rng: jax.Array,
        train: bool = False,
        temp: float = 1.0,
        hard: bool = False,
        ini_stage: bool = False,
        random_policy: bool = False,
        test: bool = False,
        return_weights: bool = False,
    ):
        keys = jax.random.split(rng, 4)
        gate_kwargs = dict(random_policy=random_policy, test=test)

        rgb = self.encoder_rgb.stem(rgb, train)
        depth = self.encoder_depth.stem(depth, train)
        # two consumers (gate + pools): barrier stops XLA fusion from
        # re-materializing the stem tails per consumer (see
        # SkipGateESANet._stems / tools/hlo_gate_diff.py)
        rgb, depth = jax.lax.optimization_barrier((rgb, depth))
        fused = rgb + depth
        # gate 0 sees stem features; SE temp comes in via logits scaling
        weight = self.gate_layer0(
            keys[0], rgb, depth, temp=temp, hard=hard, **gate_kwargs
        )
        weights = [weight]
        rgb = max_pool_3x3_s2(fused)
        depth = max_pool_3x3_s2(depth)

        skips = []
        fused = rgb
        prev_weight = None
        for i in (1, 2, 3, 4):
            rgb = getattr(self.encoder_rgb, f"layer{i}")(fused, train)
            depth = getattr(self.encoder_depth, f"layer{i}")(depth, train)
            branch0, branch1 = rgb, rgb + depth
            rule = self.block_rule[i - 1]
            w = weights[i - 1]
            # NOTE: rules 0/1 deliberately do NOT reset prev_weight — the
            # reference carries the last dynamic gate's weight through static
            # blocks (model_skip_mod.py:257-299); replicated exactly.
            if rule == 0:
                fused = branch0
            elif rule == 1:
                fused = branch1
            else:
                w0 = w[:, 0][:, None, None, None]
                w1 = w[:, 1][:, None, None, None]
                fused = w0 * branch0 + w1 * branch1
                prev_weight = w[:, 1] if not ini_stage else None
            if i < 4:
                gate = getattr(self, f"gate_layer{i}")
                weights.append(
                    gate(
                        keys[i], rgb, depth, temp=temp, hard=hard,
                        prev_weight=prev_weight, **gate_kwargs,
                    )
                )
                skips.append(self.skip(i, fused, train))

        out = self.head(fused, skips, train)
        if return_weights:
            return out, weights
        return out
