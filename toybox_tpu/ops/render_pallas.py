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


# ---------------------------------------------------------------------------
# Generic per-env frame-composition kernel builder
# ---------------------------------------------------------------------------

def _frame_call(frame, data, aux, rows, cols, hw, interpret, fused,
                warp_to=None):
    """Run a per-env frame-composition function as a Pallas kernel.

    frame(d[rows, cols], *aux) -> f32 luma image [H, W] in [0, 255].
    data: f32[N, (2*rows if fused else rows), cols] per-env inputs.
    fused=True composes TWO frames per program and writes only their
    elementwise max — the DeepMind max-pool folded into the render, so a
    skip-step renders once instead of render+render+maximum. Exact:
    u8-truncation is monotone, so max-then-cast == cast-then-max.
    warp_to=S additionally applies the bilinear 84x84-style warp INSIDE
    the kernel (two f32 MXU matmuls, matching warp_matmul), so only the
    [S, S] frame ever leaves VMEM — ~10x less HBM write traffic.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    H, W = hw
    n = data.shape[0]
    blk_rows = data.shape[1]
    assert blk_rows == (2 * rows if fused else rows)
    # Per-program launch overhead is a real fraction of these small
    # frames: compose several envs per grid step (unrolled) to amortize
    # it. B*H*W f32 intermediates stay well inside VMEM.
    B = next(b for b in (8, 4, 2, 1) if n % b == 0)

    if warp_to is not None:
        wy = jnp.asarray(_bilinear_matrix(warp_to, H))       # [S, H]
        wxt = jnp.asarray(_bilinear_matrix(warp_to, W).T)    # [W, S]
        aux = list(aux) + [wy, wxt]
        oh = ow = warp_to
    else:
        oh, ow = H, W

    def kernel(data_ref, *refs):
        *aux_refs, out_ref = refs
        a = [r[:] for r in aux_refs]
        if warp_to is not None:
            *a, wy_v, wxt_v = a
        for b in range(B):
            d = data_ref[b]
            img = frame(d[:rows], *a)
            if fused:
                img = jnp.maximum(img, frame(d[rows:], *a))
            if warp_to is not None:
                # the unfused path warps u8-truncated frames — truncate
                # first so the matmul sees identical values
                img = img.astype(jnp.int32).astype(F32)
                # same math as warp_matmul: f32 HIGHEST so bf16 MXU
                # passes don't perturb the rounding vs the XLA path
                img = jax.lax.dot_general(
                    wy_v, img, (((1,), (0,)), ((), ())),
                    preferred_element_type=F32,
                    precision=jax.lax.Precision.HIGHEST)
                img = jax.lax.dot_general(
                    img, wxt_v, (((1,), (0,)), ((), ())),
                    preferred_element_type=F32,
                    precision=jax.lax.Precision.HIGHEST)
                img = jnp.clip(jnp.round(img), 0.0, 255.0)
            # Mosaic has no f32->u8 cast; go through i32
            out_ref[b] = img.astype(jnp.int32).astype(U8)

    in_specs = [pl.BlockSpec((B, blk_rows, cols), lambda e: (e, 0, 0),
                             memory_space=pltpu.VMEM)]
    for arr in aux:
        in_specs.append(pl.BlockSpec(arr.shape, lambda e: (0, 0),
                                     memory_space=pltpu.VMEM))
    return pl.pallas_call(
        kernel,
        grid=(n // B,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((B, oh, ow), lambda e: (e, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, oh, ow), U8),
        interpret=interpret,
    )(data, *aux)


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


def _make_breakout_frame(pad_luma, ball_luma):
    """Close over the config-static sprite lumas. d f32[48, 24]:
    rows 0..23: brick luma grid (-1 = empty; cols padded 18->24);
    row 24 lanes 0..15: sprite y-low (lane 0 paddle, lanes 1..4 balls);
    row 25: sprite y-high; row 26: sprite show (+/-1);
    rows 32..47 cols 0/1: sprite x-low / x-high as columns.

    Sprites ride ONE outer-product MXU matmul V = R @ C (paddle weight 1,
    balls weight 4 — balls drawn last in the XLA render, so they win
    overlaps; bf16 is exact on 0/1 masks x small power-of-two weights),
    replacing the per-sprite full-frame select passes of the round-1
    kernel (~30 VPU sweeps -> 1 dot + 2 selects)."""
    BF16 = jnp.bfloat16

    def frame(d, base, expand):
        img = base

        band = d[:_BAND_ROWS, :]                         # [24, 24]
        band = jnp.repeat(band, _CELL_H, axis=0)         # [96, 24] sublane
        # lane-axis upsample: Mosaic can't reshape across lanes, so
        # expand columns with a static 0/1 matrix on the MXU. HIGHEST so
        # the MXU's bf16 passes don't perturb fractional brick lumas
        # (off-by-1 u8 truncation vs the XLA render otherwise).
        band = jnp.dot(band, expand, preferred_element_type=F32,
                       precision=jax.lax.Precision.HIGHEST)
        band_full = jnp.pad(
            band,
            ((_BAND_Y0, _H - _BAND_Y0 - _BAND_ROWS * _CELL_H),
             (12, _W - 12 - _BAND_COLS * _CELL_W)),
            constant_values=-1.0)
        img = jnp.where(band_full >= 0.0, band_full, img)

        ys16 = jax.lax.broadcasted_iota(jnp.int32, (_H, 16), 0).astype(F32)
        ylo = d[24:25, :16]
        yhi = d[25:26, :16]
        show = d[26:27, :16]
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 16), 1)
        wgt = jnp.where(lane == 0, 1.0,
                        jnp.where(lane < 5, 4.0, 0.0))
        R = (((ys16 >= ylo) & (ys16 < yhi) & (show > 0.0)).astype(F32)
             * wgt)                                      # [160, 16]

        xs16 = jax.lax.broadcasted_iota(jnp.int32, (16, _W), 1).astype(F32)
        xlo = d[32:48, 0:1]
        xhi = d[32:48, 1:2]
        C = ((xs16 >= xlo) & (xs16 < xhi)).astype(BF16)  # [16, 240]

        V = jnp.dot(R.astype(BF16), C,
                    preferred_element_type=F32)          # [160, 240]
        img = jnp.where(V >= 4.0, ball_luma,
                        jnp.where(V >= 1.0, pad_luma, img))

        return jnp.clip(img, 0.0, 255.0)

    return frame


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


def _breakout_prep(config):
    """Host-side factory: fn(states) -> f32[N, 48, 24] kernel data
    (concat-only assembly — see the SI prep note on .at[].set cost)."""

    def prep(states):
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

        # sprite table: paddle at lane/row 0, balls at 1..4
        r = states.ball_radius
        bx, by = states.ball_x, states.ball_y
        showb = ((states.ball_alive & ~states.reset[:, None]).astype(F32)
                 * 2 - 1)                              # [E, 4]
        one = jnp.ones((n, 1), F32)
        pad11 = jnp.zeros((n, 11), F32)
        pad8 = jnp.zeros((n, 24 - 16), F32)
        ylo = jnp.concatenate([one * 143.0, by - r[:, None], pad11, pad8],
                              axis=1)[:, None]         # row 24
        yhi = jnp.concatenate([one * (143.0 + _PADDLE_H),
                               by + r[:, None], pad11, pad8],
                              axis=1)[:, None]         # row 25
        shw = jnp.concatenate([one, showb, -jnp.ones((n, 11), F32), pad8],
                              axis=1)[:, None]         # row 26
        half = (states.paddle_width * 0.5)[:, None]
        xlo = jnp.concatenate([states.paddle_x[:, None] - half,
                               bx - r[:, None],
                               jnp.zeros((n, 11), F32)], axis=1)
        xhi = jnp.concatenate([states.paddle_x[:, None] + half,
                               bx + r[:, None],
                               jnp.zeros((n, 11), F32)], axis=1)
        xcols = jnp.concatenate(
            [xlo[:, :, None], xhi[:, :, None],
             jnp.zeros((n, 16, 22), F32)], axis=2)     # rows 32..47
        return jnp.concatenate(
            [grid, ylo, yhi, shw,
             jnp.zeros((n, 5, 24), F32),               # rows 27..31
             xcols], axis=1)

    return prep


def _breakout_aux(config):
    return [_breakout_static_base(config), jnp.asarray(_COL_EXPAND)]


def _breakout_lumas(config):
    return (float(_luma_u32(np.asarray(config.paddle_color))),
            float(_luma_u32(np.asarray(config.ball_color))))


def make_breakout_gray_renderer(config, interpret=False):
    """Factory: precompute the static background + color lumas on the
    host, return a jit-safe fn(states) -> u8[N, 160, 240].

    The returned function runs the Pallas kernel; pass interpret=True on
    non-TPU backends (tests), or use the XLA path in games/breakout.py.
    """
    prep, aux = _breakout_prep(config), _breakout_aux(config)
    frame = _make_breakout_frame(*_breakout_lumas(config))

    def render(states):
        return _frame_call(frame, prep(states), aux,
                           48, 24, (_H, _W), interpret, fused=False)

    return render


def make_breakout_gray_maxpool_renderer(config, interpret=False,
                                        warp_to=None):
    """fn(states1, states2) -> u8[N, 160, 240] == max(render(s1),
    render(s2)) — the skip-step max-pool fused into one kernel sweep.
    warp_to=84 additionally warps in-kernel -> u8[N, 84, 84]."""
    prep, aux = _breakout_prep(config), _breakout_aux(config)
    frame = _make_breakout_frame(*_breakout_lumas(config))

    def render2(s1, s2):
        data = jnp.concatenate([prep(s1), prep(s2)], axis=1)
        return _frame_call(frame, data, aux,
                           48, 24, (_H, _W), interpret, fused=True,
                           warp_to=warp_to)

    return render2


# ---------------------------------------------------------------------------
# Amidar single-pass grayscale render kernel
# ---------------------------------------------------------------------------

# geometry constants (games/amidar.py)
_AM_H, _AM_W = 250, 160
_AM_BH, _AM_BW = 31, 32          # board tiles
_AM_TPH, _AM_TPW = 5, 4          # tile pixels
_AM_X0, _AM_Y0 = 16, 45          # board origin

# lane-axis column upsample: out[:, 4c+k] = in[:, c]
_AM_EXPAND = np.zeros((_AM_BW, _AM_BW * _AM_TPW), np.float32)
for _c in range(_AM_BW):
    _AM_EXPAND[_c, _c * _AM_TPW:(_c + 1) * _AM_TPW] = 1.0


def _make_amidar_frame(lum):
    """Close over the (config-static) lumas. d f32[50, 32]:
    rows 0..30 = tile CODE grid (0 bg / 1 inner-painted / 2 painted /
    3 unpainted); row 32 = sprite y (8 enemies + player at lane 8);
    row 33 = show (+/-1); rows 34..42 col 0 = sprite x (as a column,
    for the col-mask matrix).

    TPU cost model applied here:
    - the column upsample rides the MXU on tile CODES in bf16 (exact for
      0..3) — one MXU pass instead of the f32 three-pass on lumas; the
      code -> luma decode is 3 selects on the small [155,128] band;
    - sprites are ONE outer-product matmul instead of nine full-image
      rect passes: V = R @ C with the player's weight 1024 so it wins
      overlaps (drawn last in the XLA render). bf16 is exact: 0/1 masks,
      weights 1/1024, and every sum that meets a threshold is
      representable;
    - no final clip: every composed value is already a luma in [0, 255]."""
    BF16 = jnp.bfloat16
    bg_l, inner_l, painted_l, unpainted_l, player_l, enemy_l = lum

    def frame(d, expand):
        codes = d[:_AM_BH, :]                            # [31, 32] f32
        band = jnp.repeat(codes, _AM_TPH, axis=0)        # [155, 32]
        c = jnp.dot(band.astype(BF16), expand,
                    preferred_element_type=F32)          # [155, 128]
        band_l = jnp.where(
            c < 0.5, bg_l,
            jnp.where(c < 1.5, inner_l,
                      jnp.where(c < 2.5, painted_l, unpainted_l)))
        img = jnp.pad(
            band_l,
            ((_AM_Y0, _AM_H - _AM_Y0 - _AM_BH * _AM_TPH),
             (_AM_X0, _AM_W - _AM_X0 - _AM_BW * _AM_TPW)),
            constant_values=bg_l)                        # [250, 160]

        ys16 = jax.lax.broadcasted_iota(
            jnp.int32, (_AM_H, 16), 0).astype(F32)
        sy_row = d[32:33, :16]
        show_row = d[33:34, :16]
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 16), 1)
        wgt = jnp.where(lane == 8, 1024.0, jnp.where(lane < 8, 1.0, 0.0))
        R = (((ys16 >= sy_row) & (ys16 < sy_row + _AM_TPH)
              & (show_row > 0.0)).astype(F32) * wgt)     # [250, 16]

        xs16 = jax.lax.broadcasted_iota(
            jnp.int32, (16, _AM_W), 1).astype(F32)
        sx_col = d[34:50, 0:1]                           # [16, 1]
        C = ((xs16 >= sx_col)
             & (xs16 < sx_col + _AM_TPW)).astype(BF16)   # [16, 160]

        V = jnp.dot(R.astype(BF16), C,
                    preferred_element_type=F32)          # [250, 160]
        img = jnp.where(V >= 0.5,
                        jnp.where(V >= 1024.0, player_l, enemy_l),
                        img)

        return img

    return frame


def _amidar_prep_frame(config):
    """Host-side factory: (prep(states) -> f32[N, 50, 32], frame, aux)."""
    import toybox_tpu.games.amidar as am

    def _luma_rgba(c):
        r, g, b = (float(v) for v in np.asarray(c)[:3])
        return 0.299 * r + 0.587 * g + 0.114 * b

    lum = {k: _luma_rgba(getattr(config, k))
           for k in ("bg_color", "unpainted_color", "painted_color",
                     "inner_painted_color", "player_color", "enemy_color")}
    inner_masks = jnp.asarray(config.inner_masks)
    frame = _make_amidar_frame(
        (lum["bg_color"], lum["inner_painted_color"], lum["painted_color"],
         lum["unpainted_color"], lum["player_color"], lum["enemy_color"]))
    aux = [jnp.asarray(_AM_EXPAND, jnp.bfloat16)]

    def prep(states):
        n = states.score.shape[0]
        inner = jnp.einsum(
            "eb,bt->et", states.box_painted.astype(F32), inner_masks,
            preferred_element_type=F32,
            precision=jax.lax.Precision.HIGHEST) > 0.5     # [E, 992]
        t = states.tiles
        code = jnp.where(
            t == am.EMPTY, jnp.where(inner, 1.0, 0.0),
            jnp.where(t == am.PAINTED, 2.0, 3.0)).astype(F32)
        grid = code.reshape(n, _AM_BH, _AM_BW)

        def spx(wx):
            return (_AM_X0 + wx // am.WORLD_PER_PIXEL).astype(F32)

        def spy(wy):
            return (_AM_Y0 + wy // am.WORLD_PER_PIXEL).astype(F32)

        # sprite table: 8 enemies + player at index 8
        sprite_x = jnp.concatenate(
            [spx(states.enemy_x), spx(states.player_x)[:, None]], axis=1)
        sprite_y = jnp.concatenate(
            [spy(states.enemy_y), spy(states.player_y)[:, None]], axis=1)
        show = jnp.concatenate(
            [states.enemy_exists.astype(F32) * 2.0 - 1.0,
             jnp.ones((n, 1), F32)], axis=1)              # [E, 9]

        # Keep the bulk grid as one contiguous leading block and confine
        # the .at[].set sprite updates to a small [N, 19, 32] tail: update
        # chains into the full custom-call operand cost ~10x the kernel
        # (see the SI prep note), but on a 2.4MB tail they are free.
        tail = jnp.zeros((n, 50 - _AM_BH, _AM_BW), F32)
        tail = tail.at[:, 1, :9].set(sprite_y)            # row 32
        tail = tail.at[:, 2, :9].set(show)                # row 33
        tail = tail.at[:, 3:12, 0].set(sprite_x)          # rows 34..42
        return jnp.concatenate([grid, tail], axis=1)

    return prep, frame, aux


def make_amidar_gray_renderer(config, interpret=False):
    """fn(states) -> u8[N, 250, 160] — pixel-parity with
    luma2d(amidar.render) (games/amidar.py render: tile grid upsample +
    sprite rects), composed in one VMEM pass."""
    prep, frame, aux = _amidar_prep_frame(config)

    def render(states):
        return _frame_call(frame, prep(states), aux,
                           50, _AM_BW, (_AM_H, _AM_W), interpret,
                           fused=False)

    return render


def make_amidar_gray_maxpool_renderer(config, interpret=False,
                                      warp_to=None):
    """fn(states1, states2) -> u8[N, 250, 160] == max of both renders.
    warp_to=84 additionally warps in-kernel -> u8[N, 84, 84]."""
    prep, frame, aux = _amidar_prep_frame(config)

    def render2(s1, s2):
        data = jnp.concatenate([prep(s1), prep(s2)], axis=1)
        return _frame_call(frame, data, aux,
                           50, _AM_BW, (_AM_H, _AM_W), interpret,
                           fused=True, warp_to=warp_to)

    return render2


# ---------------------------------------------------------------------------
# Space Invaders single-pass grayscale render kernel
# ---------------------------------------------------------------------------

_SI_H, _SI_W = 210, 320
_SI_ROWS = _SI_COLS = 6
_SI_DX, _SI_DY = 32, 18          # formation cell
_SI_EW, _SI_EH = 16, 10          # enemy sprite
_SI_BAND_H = _SI_ROWS * _SI_DY   # 108
_SI_BAND_W = _SI_COLS * _SI_DX   # 192
SHIELD_ROWS, _SHIELD_W = 18, 16  # games/space_invaders.py SHIELD_H/W


def _make_si_frame(shield_xs, shield_y, lum):
    """Close over the config-static shield placement and lumas.

    d f32[64, 48]:
    rows 0..17, cols 0..47 = shield alpha (3 shields side by side);
    rows 40..45, cols 0..5 = formation show grid;
    row 32 lanes 0,1 = formation anchor (ax, ay);
    row 33 lanes 6..12 = sprite y (ufo, ship, ship laser, 4 enemy lasers);
    row 34 lanes 6..12 = sprite show (+/-1);
    rows 54..60 col 0 = sprite x.

    TPU cost model applied here:
    - the formation AND the ufo/ship/laser sprites are composed by ONE
      outer-product matmul V = Rall @ Call ([210,16]@[16,320]): lanes
      0..5 carry the formation's separable row/col interval maps (show-
      weighted via a tiny [210,6]@[6,6] matmul), lanes 6..12 the seven
      sprites with draw-order priority weights (formation 1 < ufo 8 <
      ship 64 < lasers 512, matching the XLA render order). bf16 inputs
      are exact (0/1 masks x power-of-two weights) — one MXU pass;
    - shields are placed with static pads (free), no placement matmul;
    - decode needs no modular arithmetic: thresholds are checked in
      priority order, so lower bits only matter when higher bits are 0;
    - no final clip: every composed value is already a luma in [0,255]."""
    BF16 = jnp.bfloat16
    enemy_l, shield_l, ufo_l, ship_l, laser_l = lum

    def frame(d):
        scal = d[32, :]

        # --- formation row/col interval maps (lanes 0..5) --------------
        # cover[y,x] = sum_{r,c} rowm[y,r] * show[r,c] * colm[c,x]
        # (formation cells never overlap, so cover is 0/1)
        ax = scal[0]
        ay = scal[1]
        yr = jax.lax.broadcasted_iota(
            jnp.int32, (_SI_H, _SI_COLS), 0).astype(F32)
        rr6 = jax.lax.broadcasted_iota(
            jnp.int32, (_SI_H, _SI_COLS), 1).astype(F32)
        rel_y = yr - ay - rr6 * _SI_DY
        rowm = ((rel_y >= 0.0) & (rel_y < _SI_EH)).astype(BF16)  # [210, 6]
        xc = jax.lax.broadcasted_iota(
            jnp.int32, (_SI_COLS, _SI_W), 1).astype(F32)
        cc6 = jax.lax.broadcasted_iota(
            jnp.int32, (_SI_COLS, _SI_W), 0).astype(F32)
        rel_x = xc - ax - cc6 * _SI_DX
        colm = ((rel_x >= 0.0) & (rel_x < _SI_EW)).astype(F32)  # [6, 320]
        show = d[40:46, :_SI_COLS].astype(BF16)                 # [6, 6]
        rowf = jnp.dot(rowm, show, preferred_element_type=F32)  # [210, 6]

        # --- sprite interval masks (lanes 6..12) -----------------------
        ys16 = jax.lax.broadcasted_iota(
            jnp.int32, (_SI_H, 16), 0).astype(F32)
        sy_row = d[33:34, :16]
        show_row = d[34:35, :16]
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 16), 1)
        h_row = jnp.where(lane < 8, 10.0, 8.0)
        wgt = jnp.where(lane == 6, 8.0,
                        jnp.where(lane == 7, 64.0,
                                  jnp.where((lane >= 8) & (lane < 13),
                                            512.0, 0.0)))
        Rs = (((ys16 >= sy_row) & (ys16 < sy_row + h_row)
               & (show_row > 0.0)).astype(F32) * wgt)    # [210, 16]

        xs16 = jax.lax.broadcasted_iota(
            jnp.int32, (16, _SI_W), 1).astype(F32)
        sx_col = d[48:64, 0:1]                           # [16, 1]
        lane_c = jax.lax.broadcasted_iota(jnp.int32, (16, 1), 0)
        w_col = jnp.where(lane_c < 8, 16.0, 2.0)
        in_lane = ((lane_c >= 6) & (lane_c < 13)).astype(F32)
        Cs = (((xs16 >= sx_col) & (xs16 < sx_col + w_col)).astype(F32)
              * in_lane)                                 # [16, 320]

        Rall = (jnp.pad(rowf, ((0, 0), (0, 16 - _SI_COLS))) + Rs)
        Call = (jnp.pad(colm, ((0, 16 - _SI_COLS), (0, 0))) + Cs)
        V = jnp.dot(Rall.astype(BF16), Call.astype(BF16),
                    preferred_element_type=F32)          # [210, 320]

        # --- shields: static pads, weight 2 in the cover sum -----------
        sh = d[:SHIELD_ROWS, :48]
        band = jnp.zeros((SHIELD_ROWS, _SI_W), F32)
        for s, sx_ in enumerate(shield_xs):
            seg = sh[:, s * 16:s * 16 + _SHIELD_W]
            band += jnp.pad(seg, ((0, 0), (sx_, _SI_W - sx_ - _SHIELD_W)))
        sh_full = jnp.pad(
            band * 2.0,
            ((shield_y, _SI_H - shield_y - SHIELD_ROWS), (0, 0)))
        V = V + sh_full

        # One priority-ordered select chain: every sum that meets a
        # threshold is exact, and the max sum of lower-priority weights
        # is < each next weight, so thresholds decode the draw order.
        img = jnp.where(
            V >= 512.0, laser_l,
            jnp.where(V >= 64.0, ship_l,
                      jnp.where(V >= 8.0, ufo_l,
                                jnp.where(V >= 2.0, shield_l,
                                          jnp.where(V >= 0.5, enemy_l,
                                                    0.0)))))

        return img

    return frame


def _si_prep_frame(config):
    """Host-side factory: (prep(states) -> f32[N, 64, 48], frame)."""
    import toybox_tpu.games.space_invaders as si

    sp = config.shield_pos_static
    n_shields = len(sp)
    assert n_shields <= 3, "pallas SI renderer supports <= 3 shields"
    ys_set = {y for _, y in sp}
    assert len(ys_set) <= 1, "pallas SI renderer needs one shield row"
    shield_y = int(next(iter(ys_set))) if sp else 0
    shield_xs = [int(x) for x, _ in sp]
    assert all(0 <= x <= _SI_W - si.SHIELD_W for x in shield_xs)

    lum = (float(_luma_u32(_pack_rgba(si.ENEMY_COLOR))),
           float(_luma_u32(_pack_rgba(si.SHIELD_COLOR))),
           float(_luma_u32(_pack_rgba(si.UFO_COLOR))),
           float(_luma_u32(_pack_rgba(si.SHIP_COLOR))),
           float(_luma_u32(_pack_rgba(si.LASER_COLOR))))
    frame = _make_si_frame(shield_xs, shield_y, lum)

    def prep(states):
        # Assemble the kernel operand with CONCATENATION ONLY. The obvious
        # zeros().at[rows, lanes].set(...) assembly makes XLA materialize
        # the [N, 64, 48] custom-call operand through a chain of
        # dynamic-update-slice fusions that costs ~10x the kernel itself
        # (measured on the chip: 1.8 ms/call/prep at N=1024 vs ~0.1 ms for
        # the same values built from contiguous row blocks).
        n = states.score.shape[0]
        show = (states.enemy_alive | (states.enemy_death_counter >= 0))
        show = show.reshape(n, _SI_ROWS, _SI_COLS).astype(F32)

        sa = states.shield_alpha.astype(F32)             # [N, S, 18, 16]
        alpha = sa.transpose(0, 2, 1, 3).reshape(n, SHIELD_ROWS,
                                                 n_shields * 16)
        if n_shields < 3:
            alpha = jnp.concatenate(
                [alpha, jnp.zeros((n, SHIELD_ROWS, 48 - n_shields * 16),
                                  F32)], axis=2)

        f = lambda x: x.astype(F32)
        anchor = jnp.stack([f(states.enemy_x[:, 0]),
                            f(states.enemy_y[:, 0])], axis=1)   # [N, 2]

        # sprite table: ufo, ship, ship laser, 4 enemy lasers
        sprite_x = jnp.stack(
            [f(states.ufo_x), f(states.ship_x), f(states.ship_laser_x),
             f(states.elaser_x[:, 0]), f(states.elaser_x[:, 1]),
             f(states.elaser_x[:, 2]), f(states.elaser_x[:, 3])], axis=1)
        sprite_y = jnp.stack(
            [f(states.ufo_y), f(states.ship_y), f(states.ship_laser_y),
             f(states.elaser_y[:, 0]), f(states.elaser_y[:, 1]),
             f(states.elaser_y[:, 2]), f(states.elaser_y[:, 3])], axis=1)
        sprite_show = jnp.stack(
            [(states.ufo_appearance_counter == 0).astype(F32),
             (states.ship_alive
              | (states.ship_death_counter >= 0)).astype(F32),
             states.ship_laser_alive.astype(F32),
             states.elaser_alive[:, 0].astype(F32),
             states.elaser_alive[:, 1].astype(F32),
             states.elaser_alive[:, 2].astype(F32),
             states.elaser_alive[:, 3].astype(F32)], axis=1) * 2 - 1

        def zrows(r):
            return jnp.zeros((n, r, 48), F32)

        pad6 = jnp.zeros((n, 6), F32)
        pad35 = jnp.zeros((n, 48 - 13), F32)
        row32 = jnp.concatenate(
            [anchor, jnp.zeros((n, 46), F32)], axis=1)[:, None]
        row33 = jnp.concatenate([pad6, sprite_y, pad35], axis=1)[:, None]
        row34 = jnp.concatenate([pad6, sprite_show, pad35],
                                axis=1)[:, None]
        show48 = jnp.concatenate(
            [show, jnp.zeros((n, _SI_ROWS, 48 - _SI_COLS), F32)], axis=2)
        sx48 = jnp.concatenate(
            [sprite_x[:, :, None], jnp.zeros((n, 7, 47), F32)], axis=2)
        return jnp.concatenate(
            [alpha,            # rows 0..17
             zrows(14),        # rows 18..31
             row32, row33, row34,
             zrows(5),         # rows 35..39
             show48,           # rows 40..45
             zrows(8),         # rows 46..53
             sx48,             # rows 54..60
             zrows(3)], axis=1)

    return prep, frame


def make_si_gray_renderer(config, interpret=False):
    """fn(states) -> u8[N, 210, 320] — pixel-parity with
    luma2d(space_invaders.render)."""
    prep, frame = _si_prep_frame(config)

    def render(states):
        return _frame_call(frame, prep(states), [],
                           64, 48, (_SI_H, _SI_W), interpret, fused=False)

    return render


def make_si_gray_maxpool_renderer(config, interpret=False,
                                  warp_to=None):
    """fn(states1, states2) -> u8[N, 210, 320] == max of both renders.
    warp_to=84 additionally warps in-kernel -> u8[N, 84, 84]."""
    prep, frame = _si_prep_frame(config)

    def render2(s1, s2):
        data = jnp.concatenate([prep(s1), prep(s2)], axis=1)
        return _frame_call(frame, data, [],
                           64, 48, (_SI_H, _SI_W), interpret, fused=True,
                           warp_to=warp_to)

    return render2


def _pack_rgba(c):
    c = np.asarray(c, np.uint32)
    return int(c[0] | (c[1] << 8) | (c[2] << 16) | (c[3] << 24))
