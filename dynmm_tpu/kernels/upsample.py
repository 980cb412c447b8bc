"""Fused learned-3x3 upsample Pallas kernel.

The decoder's ×2 upsampling (``model.py:360-410``) is nearest ×2 followed by
a depthwise 3×3 conv. Unfused, XLA materializes the 4×-larger nearest
intermediate in HBM and reads it back for the depthwise conv — at the
decoder's output resolutions (up to 480×640×40) that is the single largest
HBM-traffic term in the whole inference graph. This kernel computes output
tiles directly from the source map: DMA a source row band into VMEM, expand
it in-register (``pltpu.repeat``) and apply the 9-tap stencil as shifted
multiply-adds. One HBM read of x + one write of y; no intermediate.

Zero-padding semantics ('learned-3x3-zeropad'): the *upsampled* map is
zero-padded by 1, which maps to zero-padding the source by 1 — done by the
wrapper with a cheap XLA pad.

STATUS: CLOSED (round 4). Numerically exact in interpret mode (tests) and
compiles+runs on TPU for lane-aligned channel counts (C % 128 == 0 — the
three decoder-module upsamples at 512/256/128 channels; the 40-channel
logits upsamples hit Mosaic lane-padding limits). Measured IN-MODEL on the
exact decoder upsamples it targets it is 0.93-0.98× of XLA's fused
dilated-depthwise lowering (tools/archive/perf_upsample_on.py) — XLA's
default graph is already at the byte floor and the custom call pays an
operand relayout on conv-adjacent tiled tensors. The in-model routing was
removed; the kernel stays as a measured artifact with kernel-level tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# tap groups: output parity p sums source offsets p+e with the original
# 3-tap kernel partitioned as G(0) = ({0}, {1,2}), G(1) = ({0,1}, {2}).
_GROUPS = {0: ({0: (0,), 1: (1, 2)}), 1: ({0: (0, 1), 1: (2,)})}


def _interleave(a, b, axis: int):
    """Element-interleave two equal arrays along ``axis``."""
    stacked = jnp.stack([a, b], axis=axis + 1)
    shape = list(a.shape)
    shape[axis] *= 2
    return stacked.reshape(shape)


def _kernel(x_hbm, k_ref, b_ref, out_ref, scratch, sem, *, tile_rows: int,
            src_w: int, src_wp: int, channels: int):
    """Grid over output row tiles. x_hbm: padded source (H+2, W+2, C) in ANY;
    out block (T, 2W, C); scratch (T//2+2, W+2, C).

    Parity decomposition: out[2a+rp, 2b+cp] is a 2×2 stencil over the source
    with tap weights pre-combined from the 3×3 kernel — 16 source-resolution
    MACs instead of 36 upsampled-resolution ones, and no input interleave.
    """
    b = pl.program_id(0)
    i = pl.program_id(1)
    t_half = tile_rows // 2
    s0 = i * t_half

    dma = pltpu.make_async_copy(x_hbm.at[b, pl.ds(s0, t_half + 2)], scratch, sem)
    dma.start()
    dma.wait()

    src = scratch[:]  # (T/2+2, W+2, C)
    k = k_ref[:]      # (3, 3, C)
    w = src_w

    def combined(rp, cp, e, f):
        total = None
        for du in _GROUPS[rp][e]:
            for dv in _GROUPS[cp][f]:
                total = k[du, dv] if total is None else total + k[du, dv]
        return total  # (C,)

    parts = {}
    for rp in (0, 1):
        for cp in (0, 1):
            acc = None
            for e in (0, 1):
                for f in (0, 1):
                    wgt = combined(rp, cp, e, f)[None, None, :]
                    block = src[rp + e : rp + e + t_half, cp + f : cp + f + w, :]
                    term = wgt * block
                    acc = term if acc is None else acc + term
            parts[(rp, cp)] = acc  # (T/2, W, C)

    row0 = _interleave(parts[(0, 0)], parts[(0, 1)], axis=1)  # (T/2, 2W, C)
    row1 = _interleave(parts[(1, 0)], parts[(1, 1)], axis=1)
    out = _interleave(row0, row1, axis=0)                     # (T, 2W, C)
    out_ref[0] = out + b_ref[:][None, None, :]


def _pick_tile(out_h: int, out_w: int = 0, channels: int = 0,
               max_tile: int = 32, budget_bytes: int = 1_500_000) -> int:
    """Largest even divisor of out_h that is ≤ max_tile AND whose output
    block (tile × out_w × C fp32) stays under ``budget_bytes`` — the VPU
    temporaries and double buffering multiply the block several times inside
    the 16 MB scoped VMEM."""
    best = 2
    for t in range(2, min(out_h, max_tile) + 1, 2):
        if out_h % t != 0:
            continue
        if out_w and channels and t * out_w * channels * 4 > budget_bytes:
            continue
        best = t
    return best


def fused_learned_upsample(x, kernel, bias, interpret: bool = False):
    """x (H, W, C) or (N, H, W, C); kernel (3, 3, C) depthwise; bias (C,).
    Returns the learned-3x3-zeropad ×2 upsample (..., 2H, 2W, C). Batches are
    a native leading grid dimension (HBM refs forbid vmap-style blocking)."""
    squeeze = x.ndim == 3
    if squeeze:
        x = x[None]
    n, h, w, c = x.shape
    # pad width so the (rows, W+2+pad, C) DMA slices stay sublane-aligned (8)
    wp = -(-(w + 2) // 8) * 8
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, wp - w - 1), (0, 0)))
    tile = _pick_tile(2 * h, 2 * w, c)
    n_tiles = (2 * h) // tile

    kern = functools.partial(
        _kernel, tile_rows=tile, src_w=w, src_wp=wp, channels=c
    )
    out = pl.pallas_call(
        kern,
        grid=(n, n_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec((3, 3, c), lambda b, i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c,), lambda b, i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, tile, 2 * w, c), lambda b, i: (b, i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((n, 2 * h, 2 * w, c), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((tile // 2 + 2, wp, c), x.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(xp, kernel, bias)
    return out[0] if squeeze else out


def reference_learned_upsample(x, kernel, bias):
    """Unfused jnp math (numerical oracle): nearest ×2 then depthwise 3×3
    with zero padding. x (..., H, W, C)."""
    n_batch = x.ndim == 4
    if not n_batch:
        x = x[None]
    n, h, w, c = x.shape
    up = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
    dw = kernel.reshape(3, 3, 1, c)
    dn = jax.lax.conv_dimension_numbers(up.shape, dw.shape, ("NHWC", "HWIO", "NHWC"))
    out = jax.lax.conv_general_dilated(
        up, dw, (1, 1), ((1, 1), (1, 1)), dimension_numbers=dn,
        feature_group_count=c,
    ) + bias
    return out if n_batch else out[0]
