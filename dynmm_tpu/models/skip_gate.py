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
from dynmm_tpu.core.routing import permute_rows
from dynmm_tpu.models.esanet import ESANetConfig, _DualEncoderParts
from dynmm_tpu.nn.layers import (BN_EPS, BN_MOMENTUM, TorchBatchNorm,
                                 max_pool_3x3_s2, torch_conv)

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


def capacity_ladders(branch_ratios, bs: int,
                     capacity_factor: Optional[float] = None) -> tuple:
    """Per-stage capacity schedule for ``forward_routed_compact`` from a
    trained gate's held-out branch ratios.

    Stage ``i``'s expected participant count is ``bs * P(k >= i)``; the
    common-case rung sits at that count (rounded up) so the usual batch
    resolves in at most ONE ``lax.cond``, and the mandatory ``bs`` rung
    keeps ANY batch exact (a surprise-heavy batch just runs at full
    capacity). An always-on stage gets the single rung ``(bs,)`` — zero
    cond boundaries; a never-on stage gets ``(0, bs)``. With the shared
    default ladder ``(0, bs//2, bs)`` every stage pays up to two cond
    boundaries (~0.15 ms each at bs=8 480x640); a 2-path gate pays 8 of
    them, this schedule pays ~3.

    With ``capacity_factor`` set, returns a STRICT single-rung schedule
    (zero conds, pass ``strict_caps=True``): rung ``i`` is
    ``ceil(bs · P(k ≥ i) · factor)`` clipped to ``bs`` — the MoE expert
    capacity formula. Rungs are made non-increasing across stages so an
    overflow-dropped row can never re-enter a later stage with zeroed
    features. Live stages keep a rung ≥ 1."""
    r = np.asarray(branch_ratios, dtype=np.float64)
    assert r.shape == (5,)
    if capacity_factor is not None:
        rungs = []
        for i in range(1, 5):
            p = float(r[i:].sum())
            c = 0 if p <= 0 else min(
                bs, int(np.ceil(p * bs * capacity_factor - 1e-9)))
            if rungs:
                c = min(c, rungs[-1])
            rungs.append(c)
        return tuple((c,) for c in rungs)
    out = []
    for i in range(1, 5):
        exp = int(np.ceil(float(r[i:].sum()) * bs - 1e-9))
        if exp >= bs:
            out.append((bs,))
        else:
            out.append((exp, bs))
    return tuple(out)




class _GateConvParams(nn.Module):
    """Param holder matching ``nn.Conv``'s tree layout ((5,5,2C,hidden)
    kernel + bias, identical names/init/RNG folding) so checkpoints are
    unchanged, while the forward computes the conv as a SPLIT sum
    ``conv(rgb, K[:, :, :C]) + conv(depth, K[:, :, C:])`` — mathematically
    identical to conv(concat(rgb, depth), K) but it never materializes the
    concatenated map (314 MB/batch of HBM write+read at 480×640 bs=8)."""

    in_channels: int
    out_channels: int
    kernel_size: int = 5

    def setup(self):
        self.kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (self.kernel_size, self.kernel_size, self.in_channels,
             self.out_channels),
        )
        self.bias = self.param(
            "bias", nn.initializers.zeros, (self.out_channels,)
        )


class GlobalGate(nn.Module):
    """Gate net (model_skip_mod_globalgate.py:375-394): concat(rgb64, depth64)
    at 1/4 res → 2 × (5×5/2 conv → BN → tanh) → global avg pool → 1×1 conv to
    ``branch_num`` logits → DiffSoftmax.

    TPU lowering: the first conv runs as a split sum over the two modality
    maps (no concat materialization — see ``_GateConvParams``). The gate
    always computes in fp32 regardless of the model dtype: its 8-channel
    conv outputs pad 8→16 sublanes under bf16's (16, 128) tiling and the
    bf16 gate measured +1.46 ms in-context vs fp32's +0.87
    (tools/perf_routed_decomp.py); fp32 also keeps hard selections closest
    to the fp32 oracle (the bf16 casts of the input maps fuse into the
    first conv, so no extra HBM pass)."""

    branch_num: int = 5
    hidden_dim: int = 8
    dtype: Optional[Dtype] = None  # accepted for config symmetry; unused

    @nn.compact
    def __call__(self, rgb, depth, temp: float = 1.0, hard: bool = False,
                 train: bool = False):
        c = rgb.shape[-1]
        p1 = _GateConvParams(2 * c, self.hidden_dim, name="conv1")
        kernel, bias = p1.kernel, p1.bias
        # ≥ fp32 regardless of the model compute dtype (see docstring), but
        # FOLLOW wider params: the float64 torch-parity tests cast the whole
        # param tree to f64, and a hard f32 input cast would then feed
        # mismatched dtypes into the split conv
        gate_dtype = jnp.promote_types(jnp.float32, kernel.dtype)
        rgb = rgb.astype(gate_dtype)
        depth = depth.astype(gate_dtype)

        def conv5s2(inp, k):
            dn = jax.lax.conv_dimension_numbers(
                inp.shape, k.shape, ("NHWC", "HWIO", "NHWC")
            )
            return jax.lax.conv_general_dilated(
                inp, k.astype(gate_dtype), window_strides=(2, 2),
                padding=((0, 0), (0, 0)), dimension_numbers=dn,
            )

        x = conv5s2(rgb, kernel[:, :, :c]) + conv5s2(depth, kernel[:, :, c:])
        x = x + bias.astype(gate_dtype)
        x = TorchBatchNorm(
            use_running_average=not train, momentum=BN_MOMENTUM, epsilon=BN_EPS,
            dtype=None, name="bn1",
        )(x)
        x = jnp.tanh(x)
        x = torch_conv(
            self.hidden_dim, 5, stride=2, padding=0, dtype=None, name="conv2"
        )(x)
        x = TorchBatchNorm(
            use_running_average=not train, momentum=BN_MOMENTUM, epsilon=BN_EPS,
            dtype=None, name="bn2",
        )(x)
        x = jnp.tanh(x)
        x = x.mean(axis=(1, 2), keepdims=True)  # adaptive avg pool → (B,1,1,C)
        logits = torch_conv(
            self.branch_num, 1, use_bias=False, dtype=None, name="fc"
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
        if self.cfg.fuse_depth_in_rgb_encoder == "SE-add":
            out = self.se_layer0_mod.fuse_and_pool(rgb, depth)
        else:
            fused = self.fuse(0, rgb, depth)
            out = max_pool_3x3_s2(fused), max_pool_3x3_s2(depth)
        # The pooled maps have TWO consumers (gate + encoders); without a
        # barrier XLA fusion re-materializes the whole 157 MB stem tail for
        # the gate, which is why the ~free gate head measured +1.1 ms
        # in-model (tools/hlo_gate_diff.py found the duplicated
        # add/maximum/reduce-window chain). The barrier is an identity that
        # pins the pooled maps as materialized once.
        return jax.lax.optimization_barrier(out)

    def _fuse_mixed(self, i: int, rgb, depth, w_rgb):
        """``w·rgb + (1−w)·fuse(rgb, depth)`` with the mix folded into the
        fusion itself (exact algebra, zero extra full-map traffic):
        SE-add fusion folds into the per-sample SE scales
        (``SqueezeAndExciteFusionAdd.fuse_mixed``); plain add fusion
        simplifies to ``rgb + (1−w)·depth``. ``w_rgb``: (B,) weight on the
        unfused rgb branch (the cumulative gate weight for blocks 1-3, and
        ``1−w4`` for block 4 — the reference's :309-310 quirk)."""
        if self.cfg.fuse_depth_in_rgb_encoder == "SE-add":
            return getattr(self, f"se_layer{i}_mod").fuse_mixed(
                rgb, depth, w_rgb)
        w = w_rgb[:, None, None, None].astype(rgb.dtype)
        return rgb + (1.0 - w) * depth

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

    def gate_only(self, rgb, depth, temp: float = 1.0):
        """Stems + hard gate, nothing else — (batch, 5) one-hot path weights.

        The cheap program for estimating a deployment's branch ratios before
        deriving a capacity schedule (``capacity_ladders``): eval/predict's
        ``--capacity_factor`` runs this over the calibration batches, and
        predict's ``switch_host`` phase-1 resolves k from it on the host."""
        rgb, depth = self._stems(rgb, depth, False)
        return self.gate_weights(rgb, depth, temp=temp, hard=True,
                                 train=False)

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
        low_res: bool = False,
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
            # cumulative probability the gate stopped fusing before block i,
            # folded into the fusion's scale vectors (see _fuse_mixed)
            fused = self._fuse_mixed(i, rgb, depth, weight[:, :i].sum(axis=1))
            skips.append(self.skip(i, fused, train))

        rgb = self.encoder_rgb.layer4(fused, train)
        depth = self.encoder_depth.layer4(depth, train)
        fused = self._fuse_mixed(4, rgb, depth, 1.0 - weight[:, 4])

        out = self.head(fused, skips, train, low_res=low_res)

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
        low_res: bool = False,
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

        # Per-stage sequential lax.cond: measured ≈ free next to a static
        # path on v5e, whereas a 5-way lax.switch costs +4 ms/batch
        # (tools/perf_switch2.py d6 vs d7). Skipped stages thread a zero
        # depth buffer that no later true-branch ever reads (k_max monotone).
        fused = rgb
        skips = []
        for i in (1, 2, 3):
            r = self.encoder_rgb.layer1(fused, train) if i == 1 else getattr(
                self.encoder_rgb, f"layer{i}"
            )(fused, train)

            def fuse_i(ops, i=i):
                r, d, w = ops
                d = getattr(self.encoder_depth, f"layer{i}")(d, train)
                return self._fuse_mixed(i, r, d, w[:, :i].sum(axis=1)), d

            def skip_i(ops, i=i):
                r, d, w = ops
                c = self.encoder_depth.down_channels[4 * (2 ** (i - 1))]
                z = jnp.zeros((r.shape[0], r.shape[1], r.shape[2], c), r.dtype)
                return r, z

            fused, depth = jax.lax.cond(
                k_max >= i, fuse_i, skip_i, (r, depth, weight)
            )
            skips.append(self.skip(i, fused, train))

        r = self.encoder_rgb.layer4(fused, train)

        def fuse_4(ops):
            r, d, w = ops
            d = self.encoder_depth.layer4(d, train)
            return self._fuse_mixed(4, r, d, 1.0 - w[:, 4])

        fused = jax.lax.cond(
            k_max >= 4, fuse_4, lambda ops: ops[0], (r, depth, weight)
        )
        out = self.head(fused, skips, train, low_res=low_res)
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
        caps: Optional[tuple] = None,
        low_res: bool = False,
        strict_caps: bool = False,
    ):
        """Hard-gate batched inference with PER-SAMPLE depth skipping.

        ``forward_switch_batched`` skips at batch-max granularity — one
        expensive sample forfeits the whole batch's savings. Here ONLY the
        depth stream is permuted into descending-path order right after the
        gate, so stage ``i``'s participants (``k ≥ i``, a monotone-shrinking
        set) are always a PREFIX of it. Each depth stage runs on a static
        prefix whose capacity is picked from a ladder of 2-way ``lax.cond``s;
        its per-sample contribution ``d_p · s_d`` is then SCATTERED back to
        original batch positions with a one-hot dot_general
        (``core.routing.scatter_rows``) and added to the UNSORTED rgb stream
        — the separable mix algebra ``mixed = rgb·s_r' + depth·s_d'``
        (``SqueezeAndExciteFusionAdd.fuse_mixed``) gives non-participants
        ``s_r' = 1, s_d' = 0`` automatically, so the rgb stream, skips,
        decoder and logits all stay in caller order. vs the earlier
        sort-everything design this removes the two 157 MB stem permutes'
        rgb half and the 196 MB logits unpermute (~1.1 ms fp32 / ~0.6 ms
        bf16 of pure data movement at 480×640 bs=8); per-stage scatters
        touch only stage-sized maps. Padding rows inside a capacity prefix
        carry mix weight 1·rgb (cumulative hard one-hot), so any capacity
        ≥ n_i is exact and results match dense hard eval
        (``tests/test_routed_compact.py``).

        ``caps``: capacity ladder (ascending, must end with the batch size).
        A ``lax.cond`` boundary costs ~0.15 ms at bs=8 480×640 on v5e
        (tools/perf_dispatch.py), so the default ladder ``(0, bs//2, bs)``
        adds a half-batch rung: mixed batches then run depth stages at half
        capacity once the sorted participant prefix fits. Any ladder is
        exact.

        ``caps`` may also be a tuple of FOUR ladders (one per depth stage
        1-4) — a per-stage capacity schedule, the MoE capacity-factor idea
        applied to depth stages. A trained gate concentrates its mass on a
        couple of paths, so most stages have a statically predictable
        participant count: a single-rung ladder ``(bs,)`` for an
        always-on stage compiles to NO cond at all, ``(0, bs)`` for a
        never-on stage to one. ``capacity_ladders`` derives the schedule
        from held-out branch ratios; exactness never depends on the ratios
        (a mispredicted rung just falls through to the ``bs`` rung).

        ``strict_caps``: MoE capacity-factor semantics — ladders need not
        end at ``bs``, so a single-rung schedule compiles with ZERO cond
        boundaries. Participants beyond a stage's final rung gracefully
        degrade instead of erroring: they lose that stage's depth
        contribution (their rgb stream continues with ``s_d' = 0``, like a
        lower-k path; at a 0 rung the whole stage reduces to identity
        rgb). Overflow never occurs when the rungs cover the batch's
        actual counts — ``capacity_ladders(..., capacity_factor=f)``
        sizes rungs at ``ceil(bs · P(k ≥ i) · f)`` exactly like an MoE
        router's expert capacity. Use only for throughput serving where
        the drop semantics are acceptable; the default (exact) mode never
        drops.
        """
        train = False
        rgb, depth = self._stems(rgb, depth, train)
        weight = self.gate_weights(rgb, depth, temp=temp, hard=True,
                                   train=train, baseline=baseline)
        k = jnp.argmax(weight, axis=-1).astype(jnp.int32)
        bs = rgb.shape[0]

        order = jnp.argsort(-k)  # participants-first for every depth stage
        depth_s = permute_rows(depth, order)  # ONLY depth is compacted
        w_s = jnp.take(weight, order, axis=0)  # (bs, 5) — gather is fine
        # n_i = #samples running depth stage i, i = 1..4
        counts = jnp.sum(k[:, None] >= jnp.arange(1, 5)[None, :], axis=0)

        if caps is None:
            caps = (0, bs // 2, bs)
        if isinstance(caps[0], (tuple, list)):
            assert len(caps) == 4, "per-stage caps need 4 ladders (stages 1-4)"
            ladders = [sorted(set(c)) for c in caps]
        else:
            ladders = [sorted(set(caps))] * 4
        for lad in ladders:
            assert lad[0] >= 0 and lad[-1] <= bs
            if not strict_caps:
                assert lad[-1] == bs, (
                    "exact mode needs the bs fallback rung; pass "
                    "strict_caps=True for capacity-factor drop semantics")

        def prefix_depth_fuse(i, depth_buf, rgb_i):
            n = counts[i - 1]
            if i < 4:
                w_u = weight[:, :i].sum(axis=1)  # unsorted rgb-side weight
            else:
                w_u = 1.0 - weight[:, 4]

            def with_cap(cap):
                def br(ops):
                    r, d = ops
                    if cap == 0:
                        # n == 0 ⇒ every sample's w_u == 1 ⇒ mixed == rgb
                        z = jnp.zeros(
                            (bs, r.shape[1], r.shape[2],
                             self.encoder_depth.down_channels[
                                 4 * (2 ** (i - 1))]),
                            r.dtype,
                        )
                        return r, z
                    d_p = getattr(self.encoder_depth, f"layer{i}")(
                        d[:cap], train
                    )
                    if i < 4:
                        w_sp = w_s[:cap, :i].sum(axis=1)
                    else:
                        w_sp = 1.0 - w_s[:cap, 4]
                    mixed = self._fuse_mixed_scatter(
                        i, r, d_p, w_u, w_sp, order
                    )
                    if cap == bs:
                        return mixed, d_p
                    pad = jnp.zeros((bs - cap,) + d_p.shape[1:], d_p.dtype)
                    return mixed, jnp.concatenate([d_p, pad], axis=0)

                return br

            def choose(ladder, ops):
                cap = ladder[0]
                if len(ladder) == 1:
                    return with_cap(cap)(ops)
                return jax.lax.cond(
                    n <= cap,
                    with_cap(cap),
                    lambda o: choose(ladder[1:], o),
                    ops,
                )

            return choose(ladders[i - 1], (rgb_i, depth_buf))

        skips = []
        fused = rgb
        depth_buf = depth_s
        for i in (1, 2, 3):
            rgb_i = getattr(self.encoder_rgb, f"layer{i}")(fused, train)
            fused, depth_buf = prefix_depth_fuse(i, depth_buf, rgb_i)
            skips.append(self.skip(i, fused, train))
        rgb4 = self.encoder_rgb.layer4(fused, train)
        fused, _ = prefix_depth_fuse(4, depth_buf, rgb4)
        out = self.head(fused, skips, train, low_res=low_res)  # caller order
        if return_weight:
            return out, weight
        return out

    def _fuse_mixed_scatter(self, i: int, rgb, d_p, w_rgb_unsorted,
                            w_rgb_sorted_prefix, order):
        """``_fuse_mixed`` for the compacted-depth layout: ``rgb`` is the
        FULL batch in caller order, ``d_p`` the depth stage output on the
        sorted participant prefix (cap rows, original samples
        ``order[:cap]``). Exact algebra: ``mixed = rgb·s_r' +
        scatter(d_p·s_d')`` with ``s_r' = w + (1−w)·s_r`` computed from
        unsorted weights and ``s_d' = (1−w)·s_d`` from sorted-prefix
        weights; rows with w == 1 (non-participants and prefix padding)
        contribute ``s_d' = 0``, so the scatter writes zeros there."""
        from dynmm_tpu.core.routing import scatter_rows

        bs = rgb.shape[0]
        if self.cfg.fuse_depth_in_rgb_encoder == "SE-add":
            mod = getattr(self, f"se_layer{i}_mod")
            s_r = mod.se_rgb.scale(rgb)                      # (bs, C)
            w_u = w_rgb_unsorted[:, None].astype(s_r.dtype)
            s_r = w_u + (1.0 - w_u) * s_r
            s_d = mod.se_depth.scale(d_p)                    # (cap, C)
            w_sp = w_rgb_sorted_prefix[:, None].astype(s_d.dtype)
            contrib = d_p * ((1.0 - w_sp) * s_d)[:, None, None, :]
            return (rgb * s_r[:, None, None, :]
                    + scatter_rows(contrib, order, bs))
        w_sp = w_rgb_sorted_prefix.astype(d_p.dtype)
        contrib = (1.0 - w_sp)[:, None, None, None] * d_p
        return rgb + scatter_rows(contrib, order, bs)

    # ------------------------------------------------------ hard, real skips
    def forward_switch(
        self,
        rgb,
        depth,
        temp: float = 1.0,
        baseline: bool = False,
        return_weight: bool = False,
        force_path: Optional[int] = None,
        low_res: bool = False,
    ):
        """Hard-gate inference with *real* compute skipping via
        ``jax.lax.switch`` over 5 path subgraphs (eval only; depth stages
        > k are never executed). Designed for small batches — the gate
        decision is taken from sample 0, so use batch=1 for per-sample
        routing (the reference's eval regime)."""
        if force_path is None and rgb.shape[0] != 1:
            raise ValueError(
                "forward_switch routes the WHOLE batch by sample 0's gate "
                f"decision; got batch={rgb.shape[0]}. Use batch=1, pass "
                "force_path, or use forward_switch_batched / "
                "forward_routed_compact for per-sample batched routing."
            )
        train = False
        rgb, depth = self._stems(rgb, depth, train)
        weight = self.gate_weights(rgb, depth, temp=temp, hard=True,
                                   train=train, baseline=baseline)
        # A Python-int force_path compiles a fully STATIC path graph (plain
        # control flow, zero cond boundaries) — the unit the host-dispatch
        # serve mode (predict.py --serve_mode switch_host) and the per-path
        # benches execute. Traced/dynamic values keep the in-graph conds.
        static_k = force_path if isinstance(force_path, int) else None
        if force_path is not None:  # path override (benchmarks/tests)
            k = jnp.int32(force_path)
        else:
            k = jnp.argmax(weight[0]).astype(jnp.int32)

        # Per-stage 2-way lax.cond instead of one 5-way lax.switch: on v5e
        # the multi-way switch costs +4 ms/step while chained conds measure
        # ≈ a static path (tools/perf_switch2.py d6 vs d7). Depth stages
        # beyond k never execute; hard path k fuses directly (no mixing),
        # matching the reference's test-time forward.
        fused = rgb
        skips = []
        for i in (1, 2, 3):
            r = self.encoder_rgb.layer1(fused, train) if i == 1 else getattr(
                self.encoder_rgb, f"layer{i}"
            )(fused, train)

            def fuse_i(ops, i=i):
                r, d = ops
                d = getattr(self.encoder_depth, f"layer{i}")(d, train)
                return self.fuse(i, r, d), d

            def skip_i(ops, i=i):
                r, d = ops
                c = self.encoder_depth.down_channels[4 * (2 ** (i - 1))]
                z = jnp.zeros((r.shape[0], r.shape[1], r.shape[2], c), r.dtype)
                return r, z

            if static_k is not None:
                fused, depth = (fuse_i if static_k >= i else skip_i)((r, depth))
            else:
                fused, depth = jax.lax.cond(k >= i, fuse_i, skip_i, (r, depth))
            skips.append(self.skip(i, fused, train))

        r = self.encoder_rgb.layer4(fused, train)

        def fuse_4(ops):
            r, d = ops
            d = self.encoder_depth.layer4(d, train)
            return self.fuse(4, r, d)

        if static_k is not None:
            fused = fuse_4((r, depth)) if static_k >= 4 else r
        else:
            fused = jax.lax.cond(k >= 4, fuse_4, lambda ops: ops[0],
                                 (r, depth))
        out = self.head(fused, skips, train, low_res=low_res)
        if return_weight:
            return out, weight
        return out
