"""Core value types shared by all games.

TPU-first equivalents of the reference's ctoybox value types
(reference toybox/interventions/core.py: Vec2D, Color, Direction;
ctoybox.Input per toybox/envs/atari/constants.py:1-13). Geometry is plain
``jnp`` arrays — these classes only exist where the *reference API surface*
needs named types (Input struct for action decode, Direction string enum
for interventions).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

__all__ = ["Input", "Direction", "rgba", "DIRECTIONS"]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Input:
    """Per-frame input struct — mirror of ctoybox.Input.

    Fields are bools (python or traced jnp bool arrays), so an Input can be
    built statically on the host or decoded from an ALE action under jit.
    Class constants mirror ctoybox (reference toybox/envs/atari/constants.py:3-12
    uses ``Input._NOOP.upper()`` == "NOOP" etc.).
    """

    left: Any = False
    right: Any = False
    up: Any = False
    down: Any = False
    button1: Any = False
    button2: Any = False

    _NOOP = "noop"
    _UP = "up"
    _DOWN = "down"
    _LEFT = "left"
    _RIGHT = "right"
    _BUTTON1 = "button1"
    _BUTTON2 = "button2"

    def as_arrays(self) -> "Input":
        return Input(*(jnp.asarray(v, jnp.bool_) for v in (
            self.left, self.right, self.up, self.down, self.button1, self.button2)))


class Direction:
    """String direction enum (reference toybox/interventions/core.py:119-147)."""

    Up = "Up"
    Down = "Down"
    Left = "Left"
    Right = "Right"

    ALL = (Up, Down, Left, Right)

    # Integer codes used inside device state arrays.
    CODE = {Up: 0, Down: 1, Left: 2, Right: 3}
    FROM_CODE = {v: k for k, v in CODE.items()}

    # Unit vectors in tile space, indexed by code: (dx, dy).
    VECTORS = ((0, -1), (0, 1), (-1, 0), (1, 0))


DIRECTIONS = Direction.ALL


def rgba(r: int, g: int, b: int, a: int = 255) -> jnp.ndarray:
    return jnp.array([r, g, b, a], dtype=jnp.uint8)
