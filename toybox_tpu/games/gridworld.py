"""Gridworld — diagnostic configurable grid game, pure-JAX engine.

Behavioral contract from the reference defaults
(toybox/interventions/defaults/gridworld_{config,state}_default.json,
SURVEY.md §2.2): char-coded grid, per-tile {color, goal, reward, walkable},
a consumed reward tile turns into ``reward_becomes``, reaching a goal ends
the game. One action moves the player one tile (frameskip (0,0) in the
reference env, toybox/envs/atari/gridworld.py:10).

State is int-coded: tile property tables live in state (they are
intervenable in the reference schema). Grid shape is static per config.
"""

from __future__ import annotations

import json

import jax.numpy as jnp
import numpy as np
from flax import struct

from toybox_tpu.core import jsonutil, rng
from toybox_tpu.core.actions import LEGAL_ACTIONS as _LEGAL
from toybox_tpu.core.types import Input
from toybox_tpu.games.common import BOOL, F32, I32, U8, paint, rect_mask

GAME_NAME = "gridworld"
LEGAL_ACTIONS = _LEGAL["gridworld"]

MAX_TILE_TYPES = 8
TILE_PX = 16  # render scale: one grid cell = 16x16 px (design choice)

_DEFAULT_CONFIG_JSON = {
    "reward_becomes": "0",
    "grid": ["111111111", "1000R0001", "101111101", "100010001",
             "10001R111", "1000100G1", "111111111"],
    "player_start": [2, 4],
    "player_color": {"r": 255, "g": 0, "b": 0, "a": 255},
    "game_size": [9, 7],
    "tiles": {
        "0": {"color": {"r": 255, "g": 255, "b": 255, "a": 255},
              "goal": False, "reward": 0, "walkable": True},
        "1": {"color": {"r": 0, "g": 0, "b": 0, "a": 255},
              "goal": False, "reward": 0, "walkable": False},
        "G": {"color": {"r": 0, "g": 255, "b": 0, "a": 255},
              "goal": True, "reward": 10, "walkable": True},
        "R": {"color": {"r": 255, "g": 255, "b": 0, "a": 255},
              "goal": False, "reward": 1, "walkable": True},
    },
}


@struct.dataclass
class Config:
    grid: jnp.ndarray          # i32[H, W] initial tile codes
    player_start: jnp.ndarray  # i32[2] (x, y)
    player_color: jnp.ndarray  # u8[4]
    reward_becomes: jnp.ndarray  # i32 tile code
    tile_color: jnp.ndarray    # u8[T, 4]
    tile_goal: jnp.ndarray     # bool[T]
    tile_reward: jnp.ndarray   # i32[T]
    tile_walkable: jnp.ndarray  # bool[T]
    # host-only metadata (static): char for each code slot
    tile_chars: tuple = struct.field(pytree_node=False, default=())


@struct.dataclass
class State:
    grid: jnp.ndarray        # i32[H, W]
    player: jnp.ndarray      # i32[2] (x, y)
    score: jnp.ndarray       # i32
    lives: jnp.ndarray       # i32 (1 until goal; ALE game_over = lives <= 0)
    level: jnp.ndarray       # i32
    game_over: jnp.ndarray   # bool
    reward_becomes: jnp.ndarray
    player_color: jnp.ndarray
    tile_color: jnp.ndarray
    tile_goal: jnp.ndarray
    tile_reward: jnp.ndarray
    tile_walkable: jnp.ndarray
    rng: jnp.ndarray         # u32[4] (unused by dynamics; uniform protocol)


def config_from_json(d: dict) -> Config:
    chars = sorted(d["tiles"].keys())
    assert len(chars) <= MAX_TILE_TYPES
    code = {c: i for i, c in enumerate(chars)}
    h = len(d["grid"])
    w = len(d["grid"][0])
    grid = np.array([[code[c] for c in row] for row in d["grid"]], dtype=np.int32)
    pad = MAX_TILE_TYPES - len(chars)
    tc = np.zeros((MAX_TILE_TYPES, 4), np.uint8)
    tg = np.zeros(MAX_TILE_TYPES, bool)
    tr = np.zeros(MAX_TILE_TYPES, np.int32)
    tw = np.zeros(MAX_TILE_TYPES, bool)
    for c, i in code.items():
        t = d["tiles"][c]
        tc[i] = jsonutil.color_from_json(t["color"])
        tg[i] = t["goal"]
        tr[i] = t["reward"]
        tw[i] = t["walkable"]
    del pad
    return Config(
        grid=jnp.asarray(grid),
        player_start=jnp.asarray(d["player_start"], I32),
        player_color=jnp.asarray(jsonutil.color_from_json(d["player_color"])),
        reward_becomes=jnp.asarray(code[d["reward_becomes"]], I32),
        tile_color=jnp.asarray(tc),
        tile_goal=jnp.asarray(tg),
        tile_reward=jnp.asarray(tr),
        tile_walkable=jnp.asarray(tw),
        tile_chars=tuple(chars),
    )


def default_config() -> Config:
    return config_from_json(_DEFAULT_CONFIG_JSON)


def config_to_json(config: Config) -> dict:
    chars = config.tile_chars
    grid_np = np.asarray(config.grid)
    tiles = {}
    for i, c in enumerate(chars):
        tiles[c] = {
            "color": jsonutil.color_to_json(np.asarray(config.tile_color)[i]),
            "goal": bool(np.asarray(config.tile_goal)[i]),
            "reward": int(np.asarray(config.tile_reward)[i]),
            "walkable": bool(np.asarray(config.tile_walkable)[i]),
        }
    return {
        "reward_becomes": chars[int(config.reward_becomes)],
        "grid": ["".join(chars[v] for v in row) for row in grid_np],
        "player_start": np.asarray(config.player_start).tolist(),
        "player_color": jsonutil.color_to_json(config.player_color),
        "game_size": [grid_np.shape[1], grid_np.shape[0]],
        "tiles": tiles,
    }


def new_game(config: Config, seed=None) -> State:
    key = rng.seed(jnp.uint32(0 if seed is None else seed))
    z = jnp.asarray(0, I32)
    return State(
        grid=config.grid,
        player=config.player_start,
        score=z,
        lives=jnp.asarray(1, I32),
        level=z,
        game_over=jnp.asarray(False, BOOL),
        reward_becomes=config.reward_becomes,
        player_color=config.player_color,
        tile_color=config.tile_color,
        tile_goal=config.tile_goal,
        tile_reward=config.tile_reward,
        tile_walkable=config.tile_walkable,
        rng=key,
    )


def step(config: Config, state: State, inp: Input) -> State:
    h, w = state.grid.shape
    dx = jnp.asarray(inp.right, I32) - jnp.asarray(inp.left, I32)
    dy = jnp.asarray(inp.down, I32) - jnp.asarray(inp.up, I32)
    # one axis at a time; vertical wins if both pressed
    dx = jnp.where(dy != 0, 0, dx)
    nx = jnp.clip(state.player[0] + dx, 0, w - 1)
    ny = jnp.clip(state.player[1] + dy, 0, h - 1)
    code = state.grid[ny, nx]
    ok = state.tile_walkable[code] & ~state.game_over
    nx = jnp.where(ok, nx, state.player[0])
    ny = jnp.where(ok, ny, state.player[1])
    code = state.grid[ny, nx]
    reward = jnp.where(ok, state.tile_reward[code], 0)
    goal = ok & state.tile_goal[code]
    consumed = ok & (reward > 0) & ~state.tile_goal[code]
    new_grid = jnp.where(consumed,
                         state.grid.at[ny, nx].set(state.reward_becomes),
                         state.grid)
    game_over = state.game_over | goal
    return state.replace(
        grid=new_grid,
        player=jnp.stack([nx, ny]),
        score=state.score + reward,
        lives=jnp.where(game_over, 0, 1).astype(I32),
        game_over=game_over,
    )


def render(config: Config, state: State) -> jnp.ndarray:
    h, w = state.grid.shape
    ph, pw = h * TILE_PX, w * TILE_PX
    # per-pixel tile code via integer downscale, then gather color
    cell = jnp.repeat(jnp.repeat(state.grid, TILE_PX, axis=0), TILE_PX, axis=1)
    img = state.tile_color[cell]  # u8[ph, pw, 4]
    px = state.player[0] * TILE_PX
    py = state.player[1] * TILE_PX
    m = rect_mask(ph, pw, px, py, px + TILE_PX, py + TILE_PX)
    return paint(img, m, state.player_color)


WIDTH = len(_DEFAULT_CONFIG_JSON["grid"][0]) * TILE_PX
HEIGHT = len(_DEFAULT_CONFIG_JSON["grid"]) * TILE_PX


def state_to_json(config: Config, state: State) -> dict:
    chars = config.tile_chars
    n = len(chars)
    tiles = []
    for i in range(n):
        tiles.append({
            "color": jsonutil.color_to_json(np.asarray(state.tile_color)[i]),
            "goal": bool(np.asarray(state.tile_goal)[i]),
            "reward": int(np.asarray(state.tile_reward)[i]),
            "walkable": bool(np.asarray(state.tile_walkable)[i]),
        })
    return {
        "reward_becomes": int(state.reward_becomes),
        "grid": np.asarray(state.grid).tolist(),
        "score": int(state.score),
        "player_color": jsonutil.color_to_json(state.player_color),
        "game_over": bool(state.game_over),
        "player": np.asarray(state.player).tolist(),
        "tiles": tiles,
    }


def state_from_json(config: Config, d: dict) -> State:
    n = len(d["tiles"])
    tc = np.zeros((MAX_TILE_TYPES, 4), np.uint8)
    tg = np.zeros(MAX_TILE_TYPES, bool)
    tr = np.zeros(MAX_TILE_TYPES, np.int32)
    tw = np.zeros(MAX_TILE_TYPES, bool)
    for i, t in enumerate(d["tiles"]):
        tc[i] = jsonutil.color_from_json(t["color"])
        tg[i] = t["goal"]
        tr[i] = t["reward"]
        tw[i] = t["walkable"]
    go = bool(d["game_over"])
    return State(
        grid=jnp.asarray(np.array(d["grid"], np.int32)),
        player=jnp.asarray(d["player"], I32),
        score=jnp.asarray(d["score"], I32),
        lives=jnp.asarray(0 if go else 1, I32),
        level=jnp.asarray(0, I32),
        game_over=jnp.asarray(go, BOOL),
        reward_becomes=jnp.asarray(d["reward_becomes"], I32),
        player_color=jnp.asarray(jsonutil.color_from_json(d["player_color"])),
        tile_color=jnp.asarray(tc),
        tile_goal=jnp.asarray(tg),
        tile_reward=jnp.asarray(tr),
        tile_walkable=jnp.asarray(tw),
        rng=rng.seed(jnp.uint32(0)),
    )


def schema() -> dict:
    return {
        "type": "object",
        "required": ["reward_becomes", "grid", "score", "player_color",
                     "game_over", "player", "tiles"],
    }


def query(config: Config, state: State, name: str, args=None):
    raise ValueError(f"unknown gridworld query: {name}")


def lives(state: State):
    return state.lives


def score(state: State):
    return state.score
