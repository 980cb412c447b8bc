"""Fused stem SE-fusion + maxpool Pallas kernels.

The flagship's hottest memory-bound cell is the stem-resolution fusion
(``_stems`` in models/skip_gate.py, reference ``model.py:200-233``):

    s_r = sigmoid(mlp(mean_HW(rgb)));  s_d = sigmoid(mlp(mean_HW(depth)))
    fused = rgb*s_r + depth*s_d
    out   = maxpool3x3s2(fused), maxpool3x3s2(depth)

at (B, 240, 320, 64) — 19.6 MB/sample/modality, > the 16 MB VMEM, so the
single-pass ``kernels/se.py`` can't apply and XLA streams the maps from HBM
~6× (mean, scale+add, two pools ≈ 1.2 GB/batch → measured 1.75 ms at bs=8,
tools/perf_decompose2.py). The reduction forces a two-pass structure; these
kernels hit the two-pass traffic floor (~0.7 GB):

  * ``_sums_kernel``      — one read of both maps → per-sample channel sums.
  * ``_fuse_pool_kernel`` — second read; scale+add+both maxpools in VMEM,
    writing only the two pooled outputs. Row bands are pipeline-managed
    blocks; the 1-row top halo arrives as a thin host-gathered side input
    (edge rows replicated — equivalent to −inf padding under max).

Mosaic constraints shape the layout (all hit while bringing this up):
  * blocks' sublane dim must be 8-aligned or whole → the per-sample gate
    vectors ride in (1, 8, C) broadcast blocks;
  * strided sublane slices (``x[:, 0::2]``) lower to an unsupported gather →
    the W dimension is FOLDED into lanes on the host (free bitcast
    ``(B,H,W,C) → (B,H,W/4,4C)``; 4·64 = 2×128 full lane tiles, which also
    removes the C=64 lane-padding waste), and the stride-2 pooling becomes
    128-aligned half-slices + ``pltpu.roll`` half-swaps + an iota lane mask;
  * stride-2 row selection uses outer-dim reshape views, not strided slices.

Exactness: tests/test_stem_fuse_kernel.py (interpret mode) and
tools/perf_stem.py (on-chip) check against the unfused jnp oracle.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# --------------------------------------------------------------- pass 1: sums
def _sums_kernel(rgb_ref, depth_ref, sr_ref, sd_ref):
    """Grid (B, nH); accumulates folded-channel sums over the H tiles."""
    h = pl.program_id(1)
    pr = jnp.sum(rgb_ref[0], axis=(0, 1), dtype=jnp.float32)
    pd = jnp.sum(depth_ref[0], axis=(0, 1), dtype=jnp.float32)
    pr = jnp.broadcast_to(pr[None, :], sr_ref.shape[1:])[None]
    pd = jnp.broadcast_to(pd[None, :], sd_ref.shape[1:])[None]

    @pl.when(h == 0)
    def _init():
        sr_ref[:] = pr
        sd_ref[:] = pd

    @pl.when(h != 0)
    def _acc():
        sr_ref[:] = sr_ref[:] + pr
        sd_ref[:] = sd_ref[:] + pd


def channel_sums(rgb, depth, tile_rows: int | None = None,
                 interpret: bool = False):
    """Per-sample channel sums of two (B, H, W, C) maps in one HBM pass."""
    b, h, w, c = rgb.shape
    if w % 4 == 0:  # fold W into lanes: full 128-lane tiles for C=64
        rgb = rgb.reshape(b, h, w // 4, 4 * c)
        depth = depth.reshape(b, h, w // 4, 4 * c)
        fold = 4
    else:
        fold = 1
    wf, cf = rgb.shape[2], rgb.shape[3]
    if tile_rows is None:
        tile_rows = next(t for t in range(30, 0, -1) if h % t == 0)
    assert h % tile_rows == 0, (h, tile_rows)
    grid = (b, h // tile_rows)
    blk = pl.BlockSpec((1, tile_rows, wf, cf), lambda i, j: (i, j, 0, 0),
                       memory_space=pltpu.VMEM)
    out = pl.BlockSpec((1, 8, cf), lambda i, j: (i, 0, 0),
                       memory_space=pltpu.VMEM)
    sr, sd = pl.pallas_call(
        _sums_kernel,
        grid=grid,
        in_specs=[blk, blk],
        out_specs=[out, out],
        out_shape=[jax.ShapeDtypeStruct((b, 8, cf), jnp.float32)] * 2,
        interpret=interpret,
    )(rgb, depth)
    sr, sd = sr[:, 0], sd[:, 0]
    if fold == 4:
        sr = sr.reshape(b, 4, c).sum(axis=1)
        sd = sd.reshape(b, 4, c).sum(axis=1)
    return sr, sd


# ------------------------------------------------------- pass 2: fuse + pool
def _row_pool(x, t):
    """max(x[2i], x[2i+1], x[2i+2]) for i<t, via outer-dim reshape views
    (strided outer slices are not assumed; reshapes of leading dims are
    free)."""
    ra = jnp.max(x[0 : 2 * t].reshape((t, 2) + x.shape[1:]), axis=1)
    rb = x[1 : 2 * t + 1].reshape((t, 2) + x.shape[1:])[:, 1]
    return jnp.maximum(ra, rb)


def _col_pool_folded(m, c):
    """Stride-2 W maxpool (window 3, left pad) of a lane-folded (T, W/4, 4C)
    band → (T, W/4, 2C). Lane groups are [v0|v1|v2|v3]·C with vk = column
    4j+k; output groups [o0|o1] with o_p = out column 2j+p."""
    two_c = 2 * c
    h0 = m[..., :two_c]   # (S0|S1) — 128-aligned lane slice
    h1 = m[..., two_c:]   # (S2|S3)
    swap0 = pltpu.roll(h0, c, axis=m.ndim - 1)  # (S1|S0)
    swap1 = pltpu.roll(h1, c, axis=m.ndim - 1)  # (S3|S2)
    m01 = jnp.maximum(h0, swap0)  # max(v4j, v4j+1) in both halves
    m23 = jnp.maximum(h1, swap1)  # max(v4j+2, v4j+3) in both halves
    # previous odd column v[4j-1]: sublane-shift h1 down by one; the first
    # window's pad slot takes v1 (∈ its window, so max is unchanged)
    hp = jnp.concatenate([h0[:, :1], h1[:, :-1]], axis=1)
    s3p = pltpu.roll(hp, c, axis=m.ndim - 1)     # lanes 0:C hold v[4j-1]
    out_even = jnp.maximum(m01, s3p)             # valid in lanes 0:C
    lane = jax.lax.broadcasted_iota(jnp.int32, m01.shape, m01.ndim - 1)
    s1both = jnp.where(lane < c, swap0, h0)      # v[4j+1] in both halves
    out_odd = jnp.maximum(s1both, m23)           # valid everywhere
    return jnp.where(lane < c, out_even, out_odd)


def _fuse_pool_kernel(sr_ref, sd_ref, rgb_ref, dep_ref, rgb_h_ref, dep_h_ref,
                      fused_ref, dpool_ref, *, out_rows: int, channels: int):
    """Grid (B, nTiles), all inputs pipeline-managed (a first manual-DMA
    version serialized transfers against compute and LOST to XLA, 2.6 vs
    1.55 ms). Tile i's band = halo row (source row 2·T·i − 1, gathered on
    the host; tile 0's slot holds row 0 — max-equivalent replica of the
    oracle's −inf pad) + block rows [2·T·i, 2·T·i + 2T). Out row t pools
    band rows 2t, 2t+1, 2t+2; the bottom edge needs no halo."""
    rgb = jnp.concatenate([rgb_h_ref[0], rgb_ref[0]], axis=0)
    dep = jnp.concatenate([dep_h_ref[0], dep_ref[0]], axis=0)
    s_r = sr_ref[0, 0][None, None, :]
    s_d = sd_ref[0, 0][None, None, :]
    fused = rgb * s_r + dep * s_d
    fm = _row_pool(fused, out_rows)
    dm = _row_pool(dep, out_rows)
    fused_ref[0] = _col_pool_folded(fm, channels)
    dpool_ref[0] = _col_pool_folded(dm, channels)


def _pick_out_rows(h: int, max_rows: int = 12) -> int:
    """Largest divisor of h//2 ≤ max_rows (keeps double-buffered blocks in VMEM)
    whose DMA band (2t+1 rows) fits within the source height."""
    best = 1
    for t in range(2, max_rows + 1):
        if (h // 2) % t == 0 and 2 * t + 1 <= h:
            best = t
    return best


def fused_stem_fusion(rgb, depth, s_r, s_d, out_rows: int | None = None,
                      interpret: bool = False):
    """Scale-add two (B, H, W, C) maps by per-sample channel vectors and
    maxpool(3,2,1) both the fused map and the raw depth map in one HBM pass.

    s_r, s_d: (B, C) sigmoid gates (computed by the caller from
    ``channel_sums`` — see ``stem_se_fusion_pool``). Requires W % 4 == 0
    (the lane-folded layout) and H % 4 == 0."""
    b, h, w, c = rgb.shape
    assert w % 4 == 0 and h % 4 == 0, (h, w)
    if out_rows is None:
        out_rows = _pick_out_rows(h)
    assert h % (2 * out_rows) == 0, (h, out_rows)
    n_tiles = h // (2 * out_rows)
    wf, cf = w // 4, 4 * c
    rgb_f = rgb.reshape(b, h, wf, cf)
    depth_f = depth.reshape(b, h, wf, cf)
    # thin halo side-input: tile i needs source row 2·T·i − 1; tile 0's slot
    # carries row 0 (max-equivalent replica of −inf padding)
    halo_idx = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32),
         2 * out_rows * jnp.arange(1, n_tiles, dtype=jnp.int32) - 1])
    rgb_halo = jnp.take(rgb_f, halo_idx, axis=1)    # (B, nT, wf, cf)
    depth_halo = jnp.take(depth_f, halo_idx, axis=1)
    kern = functools.partial(
        _fuse_pool_kernel, out_rows=out_rows, channels=c
    )
    gate_spec = pl.BlockSpec((1, 8, cf), lambda i, j: (i, 0, 0),
                             memory_space=pltpu.VMEM)
    blk_spec = pl.BlockSpec((1, 2 * out_rows, wf, cf),
                            lambda i, j: (i, j, 0, 0),
                            memory_space=pltpu.VMEM)
    halo_spec = pl.BlockSpec((1, 1, wf, cf), lambda i, j: (i, j, 0, 0),
                             memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, out_rows, wf, 2 * c),
                            lambda i, j: (i, j, 0, 0),
                            memory_space=pltpu.VMEM)
    fused, dpool = pl.pallas_call(
        kern,
        grid=(b, n_tiles),
        in_specs=[gate_spec, gate_spec, blk_spec, blk_spec,
                  halo_spec, halo_spec],
        out_specs=[out_spec, out_spec],
        out_shape=[
            jax.ShapeDtypeStruct((b, h // 2, wf, 2 * c), rgb.dtype)
        ] * 2,
        interpret=interpret,
    )(
        jnp.broadcast_to(jnp.tile(s_r, (1, 4))[:, None, :], (b, 8, cf)),
        jnp.broadcast_to(jnp.tile(s_d, (1, 4))[:, None, :], (b, 8, cf)),
        rgb_f,
        depth_f,
        rgb_halo,
        depth_halo,
    )
    return (fused.reshape(b, h // 2, w // 2, c),
            dpool.reshape(b, h // 2, w // 2, c))


def se_gate_from_sums(sums, hw: int, w1, b1, w2, b2):
    """sigmoid(relu(mean @ w1 + b1) @ w2 + b2) — the tiny SE MLP on (B, C)."""
    mean = sums / float(hw)
    hmid = jax.nn.relu(mean @ w1 + b1)
    return jax.nn.sigmoid(hmid @ w2 + b2)


def stem_se_fusion_pool(rgb, depth, wr1, br1, wr2, br2, wd1, bd1, wd2, bd2,
                        interpret: bool = False):
    """The full fused stem cell: SE-recalibrated add + both maxpools.

    Two HBM passes total (the reduction forces ≥2). Pass 1 — the channel
    means — runs as a plain XLA reduce: measured 0.45 ms at flagship shapes
    vs 1.39 for the Pallas ``channel_sums`` version (the revisited-output
    accumulation defeats Mosaic's input pipelining —
    tools/perf_stem_parts.py). Pass 2 is the Pallas scale+add+dual-maxpool,
    which runs at the copy floor (0.89 ms ≈ 0.84 copy-only). Returns
    (pooled_fused, pooled_depth)."""
    b, h, w, c = rgb.shape
    # two consumers (reduce + pallas call): pin the maps as materialized so
    # XLA fusion can't re-materialize the producer chain per consumer
    rgb, depth = jax.lax.optimization_barrier((rgb, depth))
    sums_r = jnp.sum(rgb, axis=(1, 2), dtype=jnp.float32)
    sums_d = jnp.sum(depth, axis=(1, 2), dtype=jnp.float32)
    s_r = se_gate_from_sums(sums_r, h * w, wr1, br1, wr2, br2).astype(rgb.dtype)
    s_d = se_gate_from_sums(sums_d, h * w, wd1, bd1, wd2, bd2).astype(rgb.dtype)
    return fused_stem_fusion(rgb, depth, s_r, s_d, interpret=interpret)


def reference_stem_fusion(rgb, depth, wr1, br1, wr2, br2, wd1, bd1, wd2, bd2):
    """Unfused jnp oracle: SqueezeAndExciteFusionAdd + max_pool_3x3_s2."""
    from dynmm_tpu.nn.layers import max_pool_3x3_s2

    def se(x, w1, b1, w2, b2):
        s = jax.nn.sigmoid(
            jax.nn.relu(x.mean(axis=(1, 2)) @ w1 + b1) @ w2 + b2)
        return x * s[:, None, None, :]

    fused = se(rgb, wr1, br1, wr2, br2) + se(depth, wd1, bd1, wd2, bd2)
    return max_pool_3x3_s2(fused), max_pool_3x3_s2(depth)
