"""Shared helpers for game engine modules.

Every game module exposes the same functional protocol (SURVEY.md §7 design
stance — state is a SoA pytree, step is pure):

- ``GAME_NAME: str``, ``WIDTH/HEIGHT: int`` (framebuffer dims),
  ``LEGAL_ACTIONS: list[int]`` (ALE subset)
- ``Config`` / ``State`` flax.struct dataclasses (arrays only; shapes static)
- ``default_config() -> Config``
- ``new_game(config) -> State``            (reference Toybox.new_game)
- ``step(config, state, input) -> State``  (one engine frame; jit/vmap-safe)
- ``render(config, state) -> uint8[H,W,4]`` RGBA framebuffer
- ``state_to_json / state_from_json``, ``config_to_json / config_from_json``
  (host-side, reference JSON schema — SURVEY.md §2.2)
- ``schema() -> dict`` JSON Schema with the reference's ``required`` keys
- ``query(config, state, name, args)``     (query_state_json contract)

Score/lives/level live in uniform field names so the env layer is generic.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

F32 = jnp.float32
I32 = jnp.int32
U8 = jnp.uint8
U32 = jnp.uint32
BOOL = jnp.bool_


def rect_mask(h: int, w: int, x0, y0, x1, y1):
    """Boolean [h, w] mask of pixels with x in [x0, x1) and y in [y0, y1)."""
    ys = jax.lax.broadcasted_iota(F32, (h, w), 0)
    xs = jax.lax.broadcasted_iota(F32, (h, w), 1)
    return (xs >= x0) & (xs < x1) & (ys >= y0) & (ys < y1)


def paint(img, mask, color):
    """Overwrite masked pixels with an RGBA color. img uint8[H,W,4]."""
    color = jnp.asarray(color, U8)
    return jnp.where(mask[..., None], color, img)


def paint_rects(img, xywh, colors, alive):
    """Rasterize N axis-aligned rects (top-left x,y + w,h float) in order.

    Later rects overwrite earlier ones. Implemented as a scan of full-frame
    masked writes — correct and fusable; the batched hot path uses the
    renderer in ops/render.py instead.
    """
    h, w = img.shape[:2]

    def body(im, args):
        box, color, ok = args
        m = rect_mask(h, w, box[0], box[1], box[0] + box[2], box[1] + box[3]) & ok
        return paint(im, m, color), None

    img, _ = jax.lax.scan(body, img, (jnp.asarray(xywh, F32),
                                      jnp.asarray(colors, U8),
                                      jnp.asarray(alive, BOOL)))
    return img


def circle_mask(h: int, w: int, cx, cy, r):
    ys = jax.lax.broadcasted_iota(F32, (h, w), 0) + 0.5
    xs = jax.lax.broadcasted_iota(F32, (h, w), 1) + 0.5
    return (xs - cx) ** 2 + (ys - cy) ** 2 <= r * r


def to_grayscale(rgba_img):
    """RGBA uint8 [H,W,4] -> grayscale uint8 [H,W,1] (luma weights)."""
    f = rgba_img[..., :3].astype(F32)
    g = 0.299 * f[..., 0] + 0.587 * f[..., 1] + 0.114 * f[..., 2]
    return jnp.clip(g, 0, 255).astype(U8)[..., None]


def luma2d(rgba_img):
    """RGBA uint8 [..., H, W, 4] -> grayscale uint8 [..., H, W].

    Channel-free output: a trailing dim of 1 would sit in the 128-wide
    lane slot on TPU (see the breakout layout note) — the hot obs path
    keeps images strictly 2-D per env."""
    f = rgba_img[..., :3].astype(F32)
    g = 0.299 * f[..., 0] + 0.587 * f[..., 1] + 0.114 * f[..., 2]
    return jnp.clip(g, 0, 255).astype(U8)
