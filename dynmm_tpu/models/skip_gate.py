"""SkipGateESANet — fusion-level DynMM with a global 5-way gate (the paper's
headline model; reference ``FusionDynMM/src/models/model_skip_mod_globalgate.py``).

One gate, computed after the stem from both modality features, picks among
**5 paths = "fuse depth for the first k stages", k ∈ {0..4}** (hard path k
runs depth-encoder stages 1..k and skips the rest; forward_flop semantics at
model_skip_mod_globalgate.py:324-372). Soft/training forward computes both
branches per block and mixes with *cumulative* gate weights: block i's
rgb-only branch is weighted by ``Σ_{j<i} w_j`` (the probability the gate chose
a path that stops fusing before block i, :277-302); block 4 uses ``w_4``
directly for the fused branch (:309-310 — replicated exactly, including that
it is *not* written as 1−Σ).

Execution strategies (the TPU-native part):

* ``__call__`` (soft / masked dense): every branch computed, gate weights mix —
  one static graph, jit-compiled, used for training and batched hard eval
  (hard one-hot weights make the mix exact).
* ``forward_switch`` (hard, batch=1): ``jax.lax.switch`` over 5 path functions
  that only *run* depth stages 1..k — XLA compiles all 5 subgraphs, executes
  one, so step time actually drops with k. This is what the ≥3× throughput
  target benches.

Resource loss: ``(weight.mean(0) * depth_enc_flop).mean()`` (:314-322);
per-architecture GFLOP tables at :217-223.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from dynmm_tpu.core.gates import diff_softmax
from dynmm_tpu.core.resource import expected_cost_loss
from dynmm_tpu.models.esanet import ESANetConfig, _DualEncoderParts
from dynmm_tpu.nn.layers import BN_EPS, BN_MOMENTUM, max_pool_3x3_s2, torch_conv

Dtype = Any

# Analytic per-path GFLOP tables (model_skip_mod_globalgate.py:217-223).
# depth_enc: cost of the depth encoder under hard path k (k = number of depth
# stages executed); total: whole-network cost per hard path.
FLOP_TABLES = {
    "resnet34": {
        "gate": np.array([0.0, 3.27, 7.27, 13.15, 16.02]),
        "depth_enc": np.array([0.2506752, 3.1113216, 6.9470208, 12.66432, 15.538944]),
        "total": np.array(
            [22.37101509, 25.23166149, 29.06736069, 34.78465989, 37.65928389]
        ),
    },
    "resnet50": {
        "depth_enc": np.array(
            [0.2506752, 4.39420573, 10.72382115, 19.71582947, 24.679084]
        ),
        "total": np.array(
            [32.5854654, 36.728995928, 43.058611352, 52.050619672, 57.0138742]
        ),
    },
}


def flop_table(encoder_rgb: str, key: str = "depth_enc") -> np.ndarray:
    name = "resnet34" if encoder_rgb == "resnet34" else "resnet50"
    return FLOP_TABLES[name][key]


class GlobalGate(nn.Module):
    """Gate net (model_skip_mod_globalgate.py:375-394): concat(rgb64, depth64)
    at 1/4 res → 2 × (5×5/2 conv → BN → tanh) → global avg pool → 1×1 conv to
    ``branch_num`` logits → DiffSoftmax."""

    branch_num: int = 5
    hidden_dim: int = 8
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, rgb, depth, temp: float = 1.0, hard: bool = False,
                 train: bool = False):
        x = jnp.concatenate([rgb, depth], axis=-1)
        x = torch_conv(
            self.hidden_dim, 5, stride=2, padding=0, dtype=self.dtype, name="conv1"
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=BN_MOMENTUM, epsilon=BN_EPS,
            dtype=self.dtype, name="bn1",
        )(x)
        x = jnp.tanh(x)
        x = torch_conv(
            self.hidden_dim, 5, stride=2, padding=0, dtype=self.dtype, name="conv2"
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=BN_MOMENTUM, epsilon=BN_EPS,
            dtype=self.dtype, name="bn2",
        )(x)
        x = jnp.tanh(x)
        x = x.mean(axis=(1, 2), keepdims=True)  # adaptive avg pool → (B,1,1,C)
        logits = torch_conv(
            self.branch_num, 1, use_bias=False, dtype=self.dtype, name="fc"
        )(x)
        logits = logits[:, 0, 0, :]
        return diff_softmax(logits, tau=temp, hard=hard, axis=-1)


class SkipGateESANet(_DualEncoderParts):
    """Fusion-level DynMM segmentation net. See module docstring."""

    def setup(self):
        super().setup()
        self.gate_layer = GlobalGate(
            branch_num=5, dtype=self.cfg.dtype, name="gate_layer"
        )

    # ------------------------------------------------------------------ utils
    def _stems(self, rgb, depth, train: bool):
        rgb = self.encoder_rgb.stem(rgb, train)
        depth = self.encoder_depth.stem(depth, train)
        fused = self.fuse(0, rgb, depth)
        return max_pool_3x3_s2(fused), max_pool_3x3_s2(depth)

    def gate_weights(
        self,
        rgb,
        depth,
        temp: float = 1.0,
        hard: bool = False,
        train: bool = False,
        baseline: bool = False,
        ini_stage: bool = False,
        rng: Optional[jax.Array] = None,
    ):
        """(batch, 5) path weights after the stem. ``baseline`` forces path 4
        (static ESANet); ``ini_stage`` draws uniform-random one-hot paths
        (warm-up exploration, :267-270)."""
        bs = rgb.shape[0]
        if baseline:
            return jnp.zeros((bs, 5), rgb.dtype).at[:, 4].set(1.0)
        if ini_stage:
            idx = jax.random.randint(rng, (bs,), 0, 5)
            return jax.nn.one_hot(idx, 5, dtype=rgb.dtype)
        return self.gate_layer(rgb, depth, temp=temp, hard=hard, train=train)

    # ------------------------------------------------------------- soft/dense
    def __call__(
        self,
        rgb,
        depth,
        train: bool = False,
        temp: float = 1.0,
        hard: bool = False,
        baseline: bool = False,
        ini_stage: bool = False,
        rng: Optional[jax.Array] = None,
        return_weight: bool = False,
    ):
        """Dense forward: both branches computed per block, mixed by the
        cumulative gate weights. Returns ``(pred, resource_loss)`` in train
        mode, ``pred`` (or ``(pred, weight)``) in eval — mirroring the
        reference's ``forward(.., test=...)`` contract."""
        rgb, depth = self._stems(rgb, depth, train)
        weight = self.gate_weights(
            rgb, depth, temp=temp, hard=hard, train=train,
            baseline=baseline, ini_stage=ini_stage, rng=rng,
        )

        skips = []
        fused = rgb
        for i in (1, 2, 3):
            rgb = getattr(self.encoder_rgb, f"layer{i}")(fused, train)
            depth = getattr(self.encoder_depth, f"layer{i}")(depth, train)
            branch_fuse = self.fuse(i, rgb, depth)
            # cumulative probability the gate stopped fusing before block i
            w = weight[:, :i].sum(axis=1)[:, None, None, None]
            fused = w * rgb + (1.0 - w) * branch_fuse
            skips.append(self.skip(i, fused, train))

        rgb = self.encoder_rgb.layer4(fused, train)
        depth = self.encoder_depth.layer4(depth, train)
        branch_fuse = self.fuse(4, rgb, depth)
        w4 = weight[:, 4][:, None, None, None]
        fused = (1.0 - w4) * rgb + w4 * branch_fuse

        out = self.head(fused, skips, train)

        if train:
            table = jnp.asarray(
                flop_table(self.cfg.encoder_rgb), dtype=weight.dtype
            )
            loss = expected_cost_loss(weight, table)
            return out, loss
        if return_weight:
            return out, weight
        return out

    # ------------------------------------------------ batched adaptive skips
    def forward_switch_batched(
        self,
        rgb,
        depth,
        temp: float = 1.0,
        baseline: bool = False,
        return_weight: bool = False,
        force_path: Optional[int] = None,
    ):
        """Hard-gate batched inference with batch-adaptive depth skipping.

        Per-sample mixing is identical to the dense forward (so results are
        bit-equal), but the depth encoder only runs stages 1..max(k) over the
        batch: ``lax.switch`` on the *batch maximum* path selects one of 5
        subgraphs in which stages beyond max(k) — where every sample's fused
        weight is zero — are skipped entirely. With the paper's trained gates
        most batches choose cheap paths, so this recovers the FLOP savings
        that plain dense execution throws away.
        """
        train = False
        rgb, depth = self._stems(rgb, depth, train)
        weight = self.gate_weights(rgb, depth, temp=temp, hard=True,
                                   train=train, baseline=baseline)
        if force_path is not None:  # static path override (benchmarks/tests)
            weight = jnp.zeros_like(weight).at[:, force_path].set(1.0)
            k_max = jnp.int32(force_path)
        else:
            k_max = jnp.max(jnp.argmax(weight, axis=-1)).astype(jnp.int32)
        rgb1 = self.encoder_rgb.layer1(rgb, train)

        def make_path(n_fused: int):
            def path(operands):
                r1, d, w = operands
                skips = []
                fused = None
                for i in (1, 2, 3):
                    r = r1 if i == 1 else getattr(
                        self.encoder_rgb, f"layer{i}"
                    )(fused, train)
                    if i <= n_fused:
                        d = getattr(self.encoder_depth, f"layer{i}")(d, train)
                        branch_fuse = self.fuse(i, r, d)
                        wi = w[:, :i].sum(axis=1)[:, None, None, None]
                        fused = wi * r + (1.0 - wi) * branch_fuse
                    else:
                        fused = r
                    skips.append(self.skip(i, fused, train))
                r = self.encoder_rgb.layer4(fused, train)
                if n_fused >= 4:
                    d = self.encoder_depth.layer4(d, train)
                    branch_fuse = self.fuse(4, r, d)
                    w4 = w[:, 4][:, None, None, None]
                    fused = (1.0 - w4) * r + w4 * branch_fuse
                else:
                    fused = r
                return fused, skips[0], skips[1], skips[2]

            return path

        fused, s1, s2, s3 = jax.lax.switch(
            k_max, [make_path(n) for n in range(5)], (rgb1, depth, weight)
        )
        out = self.head(fused, [s1, s2, s3], train)
        if return_weight:
            return out, weight
        return out

    # ------------------------------- per-sample bucket-compacted routing
    def forward_routed_compact(
        self,
        rgb,
        depth,
        temp: float = 1.0,
        baseline: bool = False,
        return_weight: bool = False,
    ):
        """Hard-gate batched inference with PER-SAMPLE depth skipping.

        ``forward_switch_batched`` skips at batch-max granularity — one
        expensive sample forfeits the whole batch's savings. Here each depth
        stage i runs only on the participating samples (``k ≥ i``, a
        monotone-shrinking set): participants are gathered into a
        power-of-2-capacity buffer chosen by ``lax.switch`` over
        ``{0,1,2,...,bs}``, the stage + SE fusion run on that bucket, and the
        results scatter back into original batch order. Per-sample mixing
        uses the same cumulative hard one-hot weights as the dense forward,
        so non-participants reduce to exactly ``rgb`` and results match dense
        hard eval (``tests/test_routed_compact.py``).

        Static shapes throughout: the capacity switch compiles
        len(caps) subgraphs per stage; padding lanes compute on zeros and
        their scatter is the identity (their mix weight is 1·rgb).
        """
        train = False
        rgb, depth = self._stems(rgb, depth, train)
        weight = self.gate_weights(rgb, depth, temp=temp, hard=True,
                                   train=train, baseline=baseline)
        k = jnp.argmax(weight, axis=-1).astype(jnp.int32)
        bs = rgb.shape[0]

        caps = [0]
        c = 1
        while c < bs:
            caps.append(c)
            c *= 2
        caps.append(bs)
        caps = sorted(set(caps))
        caps_arr = jnp.asarray(caps, jnp.int32)

        h4, w4 = self.cfg.height // 4, self.cfg.width // 4
        ch = self.encoder_depth.down_channels
        stage_shapes = {
            1: (h4, w4, ch[4]),
            2: (h4 // 2, w4 // 2, ch[8]),
            3: (h4 // 4, w4 // 4, ch[16]),
            4: (h4 // 8, w4 // 8, ch[32]),
        }

        def bucketed_depth_fuse(i, depth_buf, rgb_i):
            m = k >= i
            idx = jnp.argsort(jnp.logical_not(m))  # participants first
            ci = jnp.searchsorted(caps_arr, m.sum().astype(jnp.int32))
            out_shape = (bs,) + stage_shapes[i]

            def make_branch(cap):
                def br(_):
                    if cap == 0:
                        return rgb_i, jnp.zeros(out_shape, depth_buf.dtype)
                    sel = idx[:cap]
                    d_part = getattr(self.encoder_depth, f"layer{i}")(
                        jnp.take(depth_buf, sel, axis=0), train
                    )
                    r_part = jnp.take(rgb_i, sel, axis=0)
                    fuse_part = self.fuse(i, r_part, d_part)
                    if i < 4:
                        wc = jnp.take(weight[:, :i].sum(axis=1), sel)
                        mixed = (
                            wc[:, None, None, None] * r_part
                            + (1.0 - wc)[:, None, None, None] * fuse_part
                        )
                    else:
                        w4 = jnp.take(weight[:, 4], sel)
                        mixed = (
                            (1.0 - w4)[:, None, None, None] * r_part
                            + w4[:, None, None, None] * fuse_part
                        )
                    fused = rgb_i.at[sel].set(mixed)
                    d_next = jnp.zeros(out_shape, depth_buf.dtype).at[sel].set(
                        d_part
                    )
                    return fused, d_next

                return br

            return jax.lax.switch(ci, [make_branch(c) for c in caps], ())

        skips = []
        fused = rgb
        depth_buf = depth
        for i in (1, 2, 3):
            rgb_i = getattr(self.encoder_rgb, f"layer{i}")(fused, train)
            fused, depth_buf = bucketed_depth_fuse(i, depth_buf, rgb_i)
            skips.append(self.skip(i, fused, train))
        rgb4 = self.encoder_rgb.layer4(fused, train)
        fused, _ = bucketed_depth_fuse(4, depth_buf, rgb4)
        out = self.head(fused, skips, train)
        if return_weight:
            return out, weight
        return out

    # ------------------------------------------------------ hard, real skips
    def forward_switch(
        self,
        rgb,
        depth,
        temp: float = 1.0,
        baseline: bool = False,
        return_weight: bool = False,
        force_path: Optional[int] = None,
    ):
        """Hard-gate inference with *real* compute skipping via
        ``jax.lax.switch`` over 5 path subgraphs (eval only; depth stages
        > k are never executed). Designed for small batches — the gate
        decision is taken from sample 0, so use batch=1 for per-sample
        routing (the reference's eval regime)."""
        train = False
        rgb, depth = self._stems(rgb, depth, train)
        weight = self.gate_weights(rgb, depth, temp=temp, hard=True,
                                   train=train, baseline=baseline)
        if force_path is not None:  # static path override (benchmarks/tests)
            k = jnp.int32(force_path)
        else:
            k = jnp.argmax(weight[0]).astype(jnp.int32)

        # rgb stage 1 is identical across all 5 paths — hoist it out of the
        # switch so the MXU has work to overlap with the scalar-core branch
        # resolution (the gate→switch sync otherwise stalls the pipeline).
        rgb1 = self.encoder_rgb.layer1(rgb, train)

        def make_path(n_fused: int):
            def path(operands):
                r1, d = operands
                skips = []
                fused = None
                for i in (1, 2, 3):
                    r = r1 if i == 1 else getattr(
                        self.encoder_rgb, f"layer{i}"
                    )(fused, train)
                    if i <= n_fused:
                        d = getattr(self.encoder_depth, f"layer{i}")(d, train)
                        fused = self.fuse(i, r, d)
                    else:
                        fused = r
                    skips.append(self.skip(i, fused, train))
                r = self.encoder_rgb.layer4(fused, train)
                if n_fused >= 4:
                    d = self.encoder_depth.layer4(d, train)
                    fused = self.fuse(4, r, d)
                else:
                    fused = r
                return fused, skips[0], skips[1], skips[2]

            return path

        fused, s1, s2, s3 = jax.lax.switch(
            k, [make_path(n) for n in range(5)], (rgb1, depth)
        )
        out = self.head(fused, [s1, s2, s3], train)
        if return_weight:
            return out, weight
        return out
