"""Pallas single-pass frame composition + MXU bilinear warp.

The XLA render path composes a frame with ~10 full-frame select passes
(each a round trip through HBM). The Pallas kernel here writes each env's
grayscale breakout frame in ONE pass: the brick band is upsampled from the
[rows, cols] luma grid inside VMEM, sprites are iota-compare masks, and
the only HBM traffic is the final frame write.

The 84x84 warp is two static bilinear matrices applied as matmuls
(out = Wy @ img @ Wx^T) — MXU work instead of jax.image.resize's
gather-based resampler.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

F32 = jnp.float32
U8 = jnp.uint8


# ---------------------------------------------------------------------------
# Bilinear warp as two MXU matmuls
# ---------------------------------------------------------------------------

def _bilinear_matrix(out_size: int, in_size: int) -> np.ndarray:
    """W [out, in] reproducing jax.image.resize(..., 'bilinear'): a
    half-pixel-centers triangle filter, widened by the scale factor when
    downsampling (antialiasing), rows normalized to 1."""
    w = np.zeros((out_size, in_size), np.float64)
    scale = out_size / in_size
    kernel_scale = min(scale, 1.0)       # widen support when downsampling
    for o in range(out_size):
        src = (o + 0.5) / scale - 0.5
        i = np.arange(in_size)
        weights = np.maximum(0.0, 1.0 - np.abs((i - src) * kernel_scale))
        total = weights.sum()
        if total > 0:
            w[o] = weights / total
    return w.astype(np.float32)


_WARP_CACHE = {}


def warp_matmul(frames: jnp.ndarray, size: int = 84) -> jnp.ndarray:
    """uint8 [..., H, W] -> [..., size, size] via two dense matmuls."""
    *lead, h, w = frames.shape
    key = (h, w, size)
    if key not in _WARP_CACHE:
        # cache numpy, not device arrays: a jnp constant created inside a
        # trace is a tracer and would leak across jit boundaries
        _WARP_CACHE[key] = (_bilinear_matrix(size, h),
                            _bilinear_matrix(size, w))
    wy, wx = (jnp.asarray(m) for m in _WARP_CACHE[key])
    x = frames.astype(F32)
    out = jnp.einsum("oh,...hw,pw->...op", wy, x, wx,
                     preferred_element_type=F32,
                     precision=jax.lax.Precision.HIGHEST)
    return jnp.clip(jnp.round(out), 0, 255).astype(U8)


# ---------------------------------------------------------------------------
# Breakout single-pass grayscale render kernel
# ---------------------------------------------------------------------------

# geometry constants (games/breakout.py)
_H, _W = 160, 240
_BAND_Y0, _BAND_ROWS, _BAND_COLS = 43, 24, 18
_CELL_H, _CELL_W = 4, 12
_PADDLE_H = 4.0

# column-upsample matrix: out[:, c*12+j] = in[:, c] for c < 18
_COL_EXPAND = np.zeros((24, _BAND_COLS * _CELL_W), np.float32)
for _c in range(_BAND_COLS):
    _COL_EXPAND[_c, _c * _CELL_W:(_c + 1) * _CELL_W] = 1.0


def _luma_u32(packed):
    p = jnp.asarray(packed, jnp.uint32)
    r = (p & 0xFF).astype(F32)
    g = ((p >> 8) & 0xFF).astype(F32)
    b = ((p >> 16) & 0xFF).astype(F32)
    return 0.299 * r + 0.587 * g + 0.114 * b


def _breakout_kernel(data_ref, base_ref, expand_ref, out_ref):
    """One program = one env's full frame.

    data_ref: f32[1, 32, 24] — rows 0..23: brick luma grid (-1 = empty;
    cols padded 18->24); row 24: per-env scalars (paddle_x, half_w,
    paddle_luma, ball_luma, radius, bx0..3, by0..3, show0..3 as +/-1).
    base_ref: f32[160, 240] static background luma.
    """
    # Mosaic iota must be integer; cast to f32 for the sprite compares
    ys = jax.lax.broadcasted_iota(jnp.int32, (_H, _W), 0).astype(F32)
    xs = jax.lax.broadcasted_iota(jnp.int32, (_H, _W), 1).astype(F32)
    img = base_ref[:]

    band = data_ref[0, :_BAND_ROWS, :]                   # [24, 24]
    band = jnp.repeat(band, _CELL_H, axis=0)             # [96, 24] sublane
    # lane-axis upsample: Mosaic can't reshape across lanes, so expand
    # columns with a static 0/1 matrix on the MXU
    band = jnp.dot(band, expand_ref[:], preferred_element_type=F32)
    band_full = jnp.pad(
        band,
        ((_BAND_Y0, _H - _BAND_Y0 - _BAND_ROWS * _CELL_H),
         (12, _W - 12 - _BAND_COLS * _CELL_W)),
        constant_values=-1.0)
    img = jnp.where(band_full >= 0.0, band_full, img)

    scal = data_ref[0, _BAND_ROWS, :]                    # [24]
    px = scal[0]
    half = scal[1]
    pad_luma = scal[2]
    ball_luma = scal[3]
    r = scal[4]
    pm = ((ys >= 143.0) & (ys < 143.0 + _PADDLE_H)
          & (xs >= px - half) & (xs < px + half))
    img = jnp.where(pm, pad_luma, img)

    for i in range(4):
        bx = scal[5 + i]
        by = scal[9 + i]
        show = scal[13 + i] > 0.0
        m = ((xs >= bx - r) & (xs < bx + r)
             & (ys >= by - r) & (ys < by + r) & show)
        img = jnp.where(m, ball_luma, img)

    # Mosaic has no f32->u8 cast; go through i32
    out_ref[0] = jnp.clip(img, 0.0, 255.0).astype(jnp.int32).astype(U8)


def _breakout_static_base(config) -> jnp.ndarray:
    """Background + walls luma [160, 240] (config colors; computed once
    per config on the host)."""
    bg = float(_luma_u32(np.asarray(config.bg_color)))
    frame = float(_luma_u32(np.asarray(config.frame_color)))
    base = np.full((_H, _W), bg, np.float32)
    base[15:, :12] = frame
    base[15:, 228:] = frame
    base[15:18, :] = frame
    return jnp.asarray(base)


def make_breakout_gray_renderer(config, interpret=False):
    """Factory: precompute the static background + color lumas on the
    host, return a jit-safe fn(states) -> u8[N, 160, 240].

    The returned function runs the Pallas kernel; pass interpret=True on
    non-TPU backends (tests), or use the XLA path in games/breakout.py.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    base = _breakout_static_base(config)
    pad_luma = float(np.asarray(_luma_u32(np.asarray(config.paddle_color))))
    ball_luma = float(np.asarray(_luma_u32(np.asarray(config.ball_color))))

    def render(states):
        n = states.score.shape[0]
        # brick luma grid via the one-hot MXU scatter (vectorized)
        rows = jnp.clip(states.brick_row, 0, _BAND_ROWS - 1)
        cols = jnp.clip(states.brick_col, 0, _BAND_COLS - 1)
        show = (states.brick_alive & states.brick_exists).astype(F32)
        row1h = (rows[..., None] == jnp.arange(_BAND_ROWS)).astype(F32)
        col1h = (cols[..., None] == jnp.arange(_BAND_COLS)).astype(F32)
        luma = _luma_u32(states.brick_color) * show
        grid = jnp.einsum("ebr,eb,ebc->erc", row1h, luma, col1h,
                          preferred_element_type=F32,
                          precision=jax.lax.Precision.HIGHEST)
        occ = jnp.einsum("ebr,eb,ebc->erc", row1h, show, col1h,
                         preferred_element_type=F32,
                         precision=jax.lax.Precision.HIGHEST)
        grid = jnp.where(occ > 0, grid, -1.0)
        grid = jnp.pad(grid, ((0, 0), (0, 0), (0, 24 - _BAND_COLS)),
                       constant_values=-1.0)          # [E, 24, 24]

        showb = ((states.ball_alive & ~states.reset[:, None]).astype(F32)
                 * 2 - 1)
        scal = jnp.concatenate([
            states.paddle_x[:, None],
            (states.paddle_width * 0.5)[:, None],
            jnp.full((n, 1), pad_luma, F32),
            jnp.full((n, 1), ball_luma, F32),
            states.ball_radius[:, None],
            states.ball_x, states.ball_y, showb,
        ], axis=1).astype(F32)                         # [E, 17]
        scal = jnp.pad(scal, ((0, 0), (0, 24 - scal.shape[1])))
        # pack scalars as row 24 of the per-env data block ([E, 32, 24])
        data = jnp.concatenate(
            [grid, scal[:, None, :],
             jnp.zeros((n, 32 - _BAND_ROWS - 1, 24), F32)], axis=1)

        return pl.pallas_call(
            _breakout_kernel,
            grid=(n,),
            in_specs=[
                pl.BlockSpec((1, 32, 24), lambda e: (e, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((_H, _W), lambda e: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((24, _BAND_COLS * _CELL_W), lambda e: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, _H, _W), lambda e: (e, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n, _H, _W), U8),
            interpret=interpret,
        )(data, base, jnp.asarray(_COL_EXPAND))

    return render
