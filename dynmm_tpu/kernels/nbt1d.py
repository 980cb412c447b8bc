"""Fused NonBottleneck1D residual block (inference) Pallas kernel.

The NBt1D block (ERFNet factorized residual, ``resnet.py:87-147``) chains
four skinny convs: 3×1 → relu → 1×3 → BN → relu → 3×1 → relu → 1×3 → BN →
(+x) → relu. XLA cannot fuse across convolutions, so the unfused graph makes
four full HBM round-trips of the activation per block — and NBt1D blocks are
most of the encoder *and* decoder FLOPs. This kernel keeps a row band in VMEM
and evaluates the whole block with shifted matmuls (each 1D conv tap is a
(rows·cols, C) @ (C, C) MXU matmul), reading x once and writing the output
once.

Inference-only: BN running stats are pre-folded to per-channel affine
(scale, shift) by the wrapper; no custom VJP is defined (training uses the
XLA path).

Alignment: C must be lane-aligned (% 128) for Mosaic's sublane slicing —
covers stages 2-4 (128/256/512) and the decoder (512/256/128); stage 1
(C=64) falls back to XLA.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _row_conv(x, w, b, rows_out):
    """3×1 conv over rows via 3 shifted matmuls. x (R+2, W', C); w (3, C, C)."""
    acc = None
    for d in range(3):
        term = jnp.dot(
            x[d : d + rows_out], w[d], preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        acc = term if acc is None else acc + term
    return acc + b


def _col_conv(x, w, b, cols_out):
    """1×3 conv over cols via 3 shifted matmuls. x (R, W+2, C); w (3, C, C)."""
    acc = None
    for d in range(3):
        term = jnp.dot(
            x[:, d : d + cols_out], w[d], preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        acc = term if acc is None else acc + term
    return acc + b


def _kernel(x_hbm, w1, b1, w2, b2, s1, t1, w3, b3, w4, b4, s2, t2,
            out_ref, scratch, sem, *, tile_rows: int, width: int,
            width_pad: int, channels: int):
    """Grid (N, row_tiles). x_hbm: (N, H+4, Wp, C) zero-padded source.
    out block (1, T, W, C); scratch (T+4, Wp, C)."""
    n = pl.program_id(0)
    i = pl.program_id(1)
    t = tile_rows

    dma = pltpu.make_async_copy(x_hbm.at[n, pl.ds(i * t, t + 4)], scratch, sem)
    dma.start()
    dma.wait()

    x = scratch[:]  # (T+4, Wp, C); logical cols [2, 2+W) are real
    w = width

    # pair 1: rows halo 2→1, cols halo 2→1
    h = _row_conv(x, w1[:], b1[:], t + 2)                # (T+2, Wp, C)
    h = jnp.maximum(h, 0.0)
    # conv1x3_1 zero-pads its *input* columns: positions outside the image
    # must be 0, not relu(bias) computed through the input padding
    col0 = jax.lax.broadcasted_iota(jnp.int32, (t + 2, w + 4, 1), 1)
    h = jnp.where((col0 >= 2) & (col0 < w + 2), h[:, 0 : w + 4], 0.0)
    h = _col_conv(h, w2[:], b2[:], w + 2)                # (T+2, W+2, C)
    h = h * s1[:] + t1[:]
    h = jnp.maximum(h, 0.0)

    # zero the halo positions that fall outside the image: the torch block's
    # inter-conv zero padding applies to the *activation*, so boundary halos
    # must be 0, not values extrapolated through the input padding.
    n_tiles = pl.num_programs(1)
    local_row = jax.lax.broadcasted_iota(jnp.int32, (t + 2, w + 2, 1), 0)
    global_row = i * t + local_row  # padded-row index − 1
    row_ok = (global_row >= 1) & (global_row <= n_tiles * t)
    local_col = jax.lax.broadcasted_iota(jnp.int32, (t + 2, w + 2, 1), 1)
    col_ok = (local_col >= 1) & (local_col <= w)
    h = jnp.where(row_ok & col_ok, h, 0.0)

    # pair 2: rows halo 1→0, cols halo 1→0
    h = _row_conv(h, w3[:], b3[:], t)                    # (T, W+2, C)
    h = jnp.maximum(h, 0.0)
    # conv1x3_2 zero-pads its input columns: kill the relu(b3) halo values
    col2 = jax.lax.broadcasted_iota(jnp.int32, (t, w + 2, 1), 1)
    h = jnp.where((col2 >= 1) & (col2 <= w), h, 0.0)
    h = _col_conv(h, w4[:], b4[:], w)                    # (T, W, C)
    h = h * s2[:] + t2[:]

    identity = x[2 : 2 + t, 2 : 2 + w]
    out_ref[0] = jnp.maximum(h + identity.astype(h.dtype), 0.0)


def _pick_tile(h: int, width: int, channels: int) -> int:
    """Row-tile size under the 16 MB scoped-VMEM budget: the four (3, C, C)
    weight mats are resident (12.6 MB at C=512), and the out block is double
    buffered while scratch + intermediates cost ≈4× more block-sized buffers.
    """
    weights = 4 * 3 * channels * channels * 4
    budget = max(200_000, (13_000_000 - weights) // 6)
    best = 1
    for t in range(1, min(h, 32) + 1):
        if h % t != 0:
            continue
        if t * width * channels * 4 > budget:
            continue
        best = t
    return best


def fold_bn(scale, bias, mean, var, eps: float = 1e-3):
    """BN running stats → per-channel affine (s, t): y = x·s + t."""
    s = scale / jnp.sqrt(var + eps)
    return s, bias - mean * s


def fused_nbt1d(x, w1, b1, w2, b2, s1, t1, w3, b3, w4, b4, s2, t2,
                interpret: bool = False):
    """Fused stride-1 NBt1D residual block (inference).

    x (N, H, W, C) or (H, W, C); w{1,3} (3, C, C) row-conv taps;
    w{2,4} (3, C, C) col-conv taps; b* (C,); (s1,t1)/(s2,t2) folded BN affine.
    """
    squeeze = x.ndim == 3
    if squeeze:
        x = x[None]
    n, h, w, c = x.shape
    wp = -(-(w + 4) // 8) * 8
    xp = jnp.pad(x, ((0, 0), (2, 2), (2, wp - w - 2), (0, 0)))
    tile = _pick_tile(h, wp, c)
    vecs = [b1, b2, s1, t1, b3, b4, s2, t2]
    vecs = [v.reshape(1, 1, -1) for v in vecs]
    b1, b2, s1, t1, b3, b4, s2, t2 = vecs

    kern = functools.partial(
        _kernel, tile_rows=tile, width=w, width_pad=wp, channels=c
    )
    mat = lambda: pl.BlockSpec((3, c, c), lambda nn, i: (0, 0, 0),
                               memory_space=pltpu.VMEM)
    vec = lambda: pl.BlockSpec((1, 1, c), lambda nn, i: (0, 0, 0),
                               memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kern,
        grid=(n, h // tile),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM),
                  mat(), vec(), mat(), vec(), vec(), vec(),
                  mat(), vec(), mat(), vec(), vec(), vec()],
        out_specs=pl.BlockSpec(
            (1, tile, w, c), lambda nn, i: (nn, i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((n, h, w, c), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((tile + 4, wp, c), x.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(xp, w1, b1, w2, b2, s1, t1, w3, b3, w4, b4, s2, t2)
    return out[0] if squeeze else out


# --------------------------------------------------------------- two-pass
def _pair_kernel(x_hbm, wr, br, wc, bc, s, tt, idn_hbm, out_ref, scratch,
                 idsc, sem, sem2, *, tile_rows: int, width: int,
                 channels: int, add_identity: bool, final_relu: bool,
                 relu_after_affine: bool):
    """One conv pair: 3×1 → relu → (boundary col mask) → 1×3 → BN-affine
    [→ +identity] [→ relu]. Grid (N, row_tiles); x_hbm zero-padded by 1."""
    n = pl.program_id(0)
    i = pl.program_id(1)
    t = tile_rows
    w = width

    dma = pltpu.make_async_copy(x_hbm.at[n, pl.ds(i * t, t + 2)], scratch, sem)
    dma.start()
    if add_identity:
        dma2 = pltpu.make_async_copy(
            idn_hbm.at[n, pl.ds(i * t, t)], idsc, sem2
        )
        dma2.start()
        dma2.wait()
    dma.wait()

    x = scratch[:]  # (T+2, Wp, C); real cols [1, 1+W)
    h = _row_conv(x, wr[:], br[:], t)          # (T, Wp, C)
    h = jnp.maximum(h, 0.0)
    # 1×3 conv zero-pads its input cols: zero everything outside the image
    col = jax.lax.broadcasted_iota(jnp.int32, (t, w + 2, 1), 1)
    h = jnp.where((col >= 1) & (col <= w), h[:, 0 : w + 2], 0.0)
    h = _col_conv(h, wc[:], bc[:], w)          # (T, W, C)
    h = h * s[:] + tt[:]
    if relu_after_affine:
        h = jnp.maximum(h, 0.0)
    if add_identity:
        h = h + idsc[:][:, 0:w]
    if final_relu:
        h = jnp.maximum(h, 0.0)
    out_ref[0] = h


def _pick_tile_pair(h: int, width: int, channels: int) -> int:
    weights = 2 * 3 * channels * channels * 4
    budget = max(200_000, (13_000_000 - weights) // 6)
    best = 1
    for t in range(1, min(h, 32) + 1):
        if h % t == 0 and t * width * channels * 4 <= budget:
            best = t
    return best


def _run_pair(x, identity, wr, br, wc, bc, s, tt, *, add_identity,
              final_relu, relu_after_affine, interpret):
    n, h, w, c = x.shape
    wp = -(-(w + 2) // 8) * 8
    wi = -(-w // 8) * 8  # identity DMA needs an 8-aligned width too
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, wp - w - 1), (0, 0)))
    tile = _pick_tile_pair(h, wp, c)
    vecs = [v.reshape(1, 1, -1) for v in (br, bc, s, tt)]
    br, bc, s, tt = vecs
    if identity is None:
        identity = jnp.zeros((n, h, wi, c), x.dtype)  # DCE'd (not consumed)
    elif wi != w:
        identity = jnp.pad(identity, ((0, 0), (0, 0), (0, wi - w), (0, 0)))

    kern = functools.partial(
        _pair_kernel, tile_rows=tile, width=w, channels=c,
        add_identity=add_identity, final_relu=final_relu,
        relu_after_affine=relu_after_affine,
    )
    mat = lambda: pl.BlockSpec((3, c, c), lambda nn, i: (0, 0, 0),
                               memory_space=pltpu.VMEM)
    vec = lambda: pl.BlockSpec((1, 1, c), lambda nn, i: (0, 0, 0),
                               memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        grid=(n, h // tile),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM),
                  mat(), vec(), mat(), vec(), vec(), vec(),
                  pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec(
            (1, tile, w, c), lambda nn, i: (nn, i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((n, h, w, c), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((tile + 2, wp, c), x.dtype),
            pltpu.VMEM((tile, wi, c), x.dtype),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(xp, wr, br, wc, bc, s, tt, identity)


def fused_nbt1d_twopass(x, w1, b1, w2, b2, s1, t1, w3, b3, w4, b4, s2, t2,
                        interpret: bool = False):
    """NBt1D block as two pair kernels: only 2 of the 4 (3,C,C) weight mats
    are VMEM-resident per pass, so tiles stay large at C=512. Two HBM
    round-trips instead of the mono kernel's one (XLA's graph does four)."""
    squeeze = x.ndim == 3
    if squeeze:
        x = x[None]
    h = _run_pair(x, None, w1, b1, w2, b2, s1, t1, add_identity=False,
                  final_relu=False, relu_after_affine=True,
                  interpret=interpret)
    out = _run_pair(h, x, w3, b3, w4, b4, s2, t2, add_identity=True,
                    final_relu=True, relu_after_affine=False,
                    interpret=interpret)
    return out[0] if squeeze else out


def reference_nbt1d(x, w1, b1, w2, b2, s1, t1, w3, b3, w4, b4, s2, t2):
    """Unfused oracle with the same parameterization (folded BN)."""
    squeeze = x.ndim == 3
    if squeeze:
        x = x[None]
    c = x.shape[-1]

    def conv(h, wk, bk, axis):
        k = wk.transpose(1, 0, 2)  # (C, 3, C)
        if axis == 0:
            kern = k.reshape(c, 3, 1, c).transpose(1, 2, 0, 3)  # (3,1,C,C)
            pad = ((1, 1), (0, 0))
        else:
            kern = k.reshape(c, 1, 3, c).transpose(1, 2, 0, 3)  # (1,3,C,C)
            pad = ((0, 0), (1, 1))
        dn = jax.lax.conv_dimension_numbers(h.shape, kern.shape,
                                            ("NHWC", "HWIO", "NHWC"))
        return jax.lax.conv_general_dilated(
            h, kern, (1, 1), pad, dimension_numbers=dn
        ) + bk

    h = jnp.maximum(conv(x, w1, b1, 0), 0.0)
    h = conv(h, w2, b2, 1) * s1 + t1
    h = jnp.maximum(h, 0.0)
    h = jnp.maximum(conv(h, w3, b3, 0), 0.0)
    h = conv(h, w4, b4, 1) * s2 + t2
    out = jnp.maximum(h + x, 0.0)
    return out[0] if squeeze else out
