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

  * ``_sums_kernel``   — one read of both maps → per-sample channel sums.
  * ``_fuse_pool_kernel`` — second read; scale+add+both maxpools in VMEM,
    writing only the two pooled outputs. Inputs stay in HBM; row bands are
    manually DMA'd with a 1-row halo (edge rows replicated — equivalent to
    −inf padding under max). The tiny SE matmuls ((B,64)·(64,4)) run in XLA
    between the two calls.

Exactness: tests/test_stem_fuse_kernel.py checks bit-level agreement with
the unfused jnp oracle on CPU (interpret mode) and TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _sums_kernel(rgb_ref, depth_ref, sr_ref, sd_ref):
    """Grid (B, nH); accumulates channel sums over the H tiles."""
    h = pl.program_id(1)
    pr = jnp.sum(rgb_ref[0], axis=(0, 1), dtype=jnp.float32)[None, :]
    pd = jnp.sum(depth_ref[0], axis=(0, 1), dtype=jnp.float32)[None, :]

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
    if tile_rows is None:
        tile_rows = next(t for t in range(30, 0, -1) if h % t == 0)
    assert h % tile_rows == 0, (h, tile_rows)
    grid = (b, h // tile_rows)
    blk = pl.BlockSpec((1, tile_rows, w, c), lambda i, j: (i, j, 0, 0),
                       memory_space=pltpu.VMEM)
    out = pl.BlockSpec((1, c), lambda i, j: (i, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _sums_kernel,
        grid=grid,
        in_specs=[blk, blk],
        out_specs=[out, out],
        out_shape=[jax.ShapeDtypeStruct((b, c), jnp.float32)] * 2,
        interpret=interpret,
    )(rgb, depth)


def _pool_rows_cols(x, out_rows: int, out_w: int):
    """maxpool 3×3 stride 2 pad 1 of a (2·out_rows+2, W, C) band whose row 0
    is the halo row (edge-replicated at boundaries). W edges use replicated
    shifts — identical to −inf padding under max."""
    r0 = x[0 : 2 * out_rows : 2]      # rows 2t      (halo offset: global 2r-1)
    r1 = x[1 : 2 * out_rows + 1 : 2]  # rows 2t+1    (global 2r)
    r2 = x[2 : 2 * out_rows + 2 : 2]  # rows 2t+2    (global 2r+1)
    m = jnp.maximum(jnp.maximum(r0, r1), r2)  # (out_rows, W, C)
    a = m[:, 0::2]                    # v[2j]
    bq = m[:, 1::2]                   # v[2j+1]
    left = jnp.concatenate([bq[:, :1], bq[:, :-1]], axis=1)  # v[2j-1]
    return jnp.maximum(jnp.maximum(a, bq), left)[:, :out_w]


def _fuse_pool_kernel(sr_ref, sd_ref, rgb_hbm, depth_hbm, fused_ref,
                      dpool_ref, rgb_s, dep_s, sem_r, sem_d, *,
                      out_rows: int, src_h: int):
    """Grid (B, nTiles). Tile i's band = source rows [2·T·i − 1, 2·T·i + 2T)
    (T = out_rows): out row t of the tile pools band rows 2t, 2t+1, 2t+2.
    Only tile 0 lacks its top halo row (global row −1); under max, replicating
    row 0 there is identical to the oracle's −inf padding. The bottom edge
    never needs a halo (out row H/2−1 pools rows H−3..H−1)."""
    i = pl.program_id(1)
    b = pl.program_id(0)
    band = 2 * out_rows + 1

    @pl.when(i == 0)
    def _dma_first():
        for hbm, s, sem in ((rgb_hbm, rgb_s, sem_r),
                            (depth_hbm, dep_s, sem_d)):
            cp = pltpu.make_async_copy(
                hbm.at[b, pl.ds(0, band - 1)], s.at[pl.ds(1, band - 1)], sem)
            cp.start()
            cp.wait()
            s[0] = s[1]  # synthetic row −1 (max-equivalent edge replica)

    @pl.when(i != 0)
    def _dma_rest():
        start = 2 * out_rows * i - 1
        for hbm, s, sem in ((rgb_hbm, rgb_s, sem_r),
                            (depth_hbm, dep_s, sem_d)):
            cp = pltpu.make_async_copy(
                hbm.at[b, pl.ds(start, band)], s.at[pl.ds(0, band)], sem)
            cp.start()
            cp.wait()

    rgb = rgb_s[:]
    dep = dep_s[:]
    s_r = sr_ref[0][None, None, :]
    s_d = sd_ref[0][None, None, :]
    fused = rgb * s_r + dep * s_d
    w_out = fused_ref.shape[2]
    fused_ref[0] = _pool_rows_cols(fused, out_rows, w_out)
    dpool_ref[0] = _pool_rows_cols(dep, out_rows, w_out)


def _pick_out_rows(h: int, max_rows: int = 12) -> int:
    """Largest divisor of h//2 that keeps the row band within VMEM budget."""
    best = 1
    for t in range(2, max_rows + 1):
        if (h // 2) % t == 0:
            best = t
    return best


def fused_stem_fusion(rgb, depth, s_r, s_d, out_rows: int | None = None,
                      interpret: bool = False):
    """Scale-add two (B, H, W, C) maps by per-sample channel vectors and
    maxpool(3,2,1) both the fused map and the raw depth map in one HBM pass.

    s_r, s_d: (B, C) sigmoid gates (computed by the caller from
    ``channel_sums`` — see ``stem_se_fusion_pool``)."""
    b, h, w, c = rgb.shape
    if out_rows is None:
        out_rows = _pick_out_rows(h)
    assert h % (2 * out_rows) == 0, (h, out_rows)
    n_tiles = h // (2 * out_rows)
    ho, wo = h // 2, w // 2
    band = 2 * out_rows + 1
    kern = functools.partial(
        _fuse_pool_kernel, out_rows=out_rows, src_h=h
    )
    gate_spec = pl.BlockSpec((1, c), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, out_rows, wo, c), lambda i, j: (i, j, 0, 0),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        grid=(b, n_tiles),
        in_specs=[
            gate_spec,
            gate_spec,
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[out_spec, out_spec],
        out_shape=[jax.ShapeDtypeStruct((b, ho, wo, c), rgb.dtype)] * 2,
        scratch_shapes=[
            pltpu.VMEM((band, w, c), rgb.dtype),
            pltpu.VMEM((band, w, c), rgb.dtype),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(s_r, s_d, rgb, depth)


def se_gate_from_sums(sums, hw: int, w1, b1, w2, b2):
    """sigmoid(relu(mean @ w1 + b1) @ w2 + b2) — the tiny SE MLP on (B, C)."""
    mean = sums / float(hw)
    hmid = jax.nn.relu(mean @ w1 + b1)
    return jax.nn.sigmoid(hmid @ w2 + b2)


def stem_se_fusion_pool(rgb, depth, wr1, br1, wr2, br2, wd1, bd1, wd2, bd2,
                        interpret: bool = False):
    """The full fused stem cell: SE-recalibrated add + both maxpools.

    Two HBM passes total (reduction forces ≥2): ``channel_sums`` then
    ``fused_stem_fusion``. Returns (pooled_fused, pooled_depth)."""
    b, h, w, c = rgb.shape
    sums_r, sums_d = channel_sums(rgb, depth, interpret=interpret)
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
