"""Batched, jit-compatible interventions — pytree surgery over the env axis.

The reference's intervention API decodes one env's state to typed Python
objects, mutates, and re-encodes (SURVEY.md §3.3). On TPU the state of N
envs is a stacked SoA pytree, so the same *property paths* the reference
uses ('bricks[5].alive', 'paddle.position.x' — core.py:271-304) resolve
directly to (field, index) coordinates in the State dataclass, and an
intervention becomes a functional update applicable to thousands of envs
inside jit:

    states = batched_set(states, "breakout", "bricks[5].alive", False)
    states = batched_set(states, "breakout", "paddle.position.x", xs,
                         env_mask=done)   # per-env values, masked

Reads go through batched_get. Paths are resolved at trace time (they are
static strings); the data movement is one masked select.
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp

from toybox_tpu.interventions.core import parse_property_access

# path-template -> state field. '{i}' segments consume an integer index.
# Each entry: (field_name, needs_index, transform/inverse pair or None)
_BREAKOUT = {
    ("score",): "score",
    ("lives",): "lives",
    ("level",): "level",
    ("is_dead",): "is_dead",
    ("reset",): "reset",
    ("paddle", "position", "x"): "paddle_x",
    ("paddle", "position", "y"): "paddle_y",
    ("paddle", "velocity", "x"): "paddle_vx",
    ("paddle_width",): "paddle_width",
    ("paddle_speed",): "paddle_speed",
    ("ball_radius",): "ball_radius",
    ("balls", int, "position", "x"): "ball_x",
    ("balls", int, "position", "y"): "ball_y",
    ("balls", int, "velocity", "x"): "ball_vx",
    ("balls", int, "velocity", "y"): "ball_vy",
    ("bricks", int, "alive"): "brick_alive",
    ("bricks", int, "destructible"): "brick_destructible",
    ("bricks", int, "points"): "brick_points",
    ("bricks", int, "depth"): "brick_depth",
    ("bricks", int, "color"): "brick_color",
    ("bricks", int, "position", "x"): "brick_x",
    ("bricks", int, "position", "y"): "brick_y",
    ("bricks", int, "size", "x"): "brick_w",
    ("bricks", int, "size", "y"): "brick_h",
}

_AMIDAR = {
    ("score",): "score",
    ("lives",): "lives",
    ("level",): "level",
    ("jumps",): "jumps",
    ("jump_timer",): "jump_timer",
    ("chase_timer",): "chase_timer",
    ("player", "position", "x"): "player_x",
    ("player", "position", "y"): "player_y",
    ("enemies", int, "position", "x"): "enemy_x",
    ("enemies", int, "position", "y"): "enemy_y",
    ("enemies", int, "caught"): "enemy_caught",
}

_SPACE_INVADERS = {
    ("score",): "score",
    ("lives",): "lives",
    ("level",): "level",
    ("life_display_timer",): "life_display_timer",
    ("enemy_shot_delay",): "enemy_shot_delay",
    ("ship", "x"): "ship_x",
    ("ship", "y"): "ship_y",
    ("ship", "alive"): "ship_alive",
    ("ufo", "x"): "ufo_x",
    ("ufo", "y"): "ufo_y",
    ("ufo", "appearance_counter"): "ufo_appearance_counter",
    ("enemies", int, "alive"): "enemy_alive",
    ("enemies", int, "x"): "enemy_x",
    ("enemies", int, "y"): "enemy_y",
}

_TABLES = {
    "breakout": _BREAKOUT,
    "amidar": _AMIDAR,
    "space_invaders": _SPACE_INVADERS,
}


def _resolve(game: str, path: str):
    """'bricks[5].alive' -> (field_name, entity_index | None)."""
    parts = parse_property_access(path)
    shape = tuple(int if isinstance(p, int) else p for p in parts)
    table = _TABLES[game]
    if shape not in table:
        raise KeyError(
            f"no batched mapping for {path!r} in {game}; "
            f"known shapes: {sorted(str(k) for k in table)}")
    field = table[shape]
    idx = next((p for p in parts if isinstance(p, int)), None)
    return field, idx


def batched_get(states, game: str, path: str):
    """Read a property across all envs: returns [N] (or [N, ...])."""
    field, idx = _resolve(game, path)
    arr = getattr(states, field)
    return arr if idx is None else arr[:, idx]


def batched_set(states, game: str, path: str, value,
                env_mask: Optional[Any] = None):
    """Functional set across the env axis (jit/vmap-safe).

    value: scalar (broadcast) or per-env [N] array.
    env_mask: optional bool[N] restricting which envs are edited.
    """
    field, idx = _resolve(game, path)
    arr = getattr(states, field)
    value = jnp.asarray(value, arr.dtype)
    if idx is None:
        new = jnp.broadcast_to(value, arr.shape)
    else:
        new = arr.at[:, idx].set(value)
    if env_mask is not None:
        m = jnp.asarray(env_mask).reshape((-1,) + (1,) * (arr.ndim - 1))
        new = jnp.where(m, new, arr)
    return states.replace(**{field: new})
