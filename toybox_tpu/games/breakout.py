"""Breakout — pure-JAX engine (SoA state, jit/vmap-safe step).

Behavioral contract re-derived from the reference (no engine source is
vendored there; SURVEY.md §2.1-2.2):

- default state/config values: toybox/interventions/defaults/breakout_*.json
  (6 rows x 18 cols of 12x4 bricks at x=12+12c, y=43+4r; depth 5-r;
  paddle (120,143) width 24 speed 4; ball radius 2; serve from one of 4
  seeded start positions with velocity (-speed*cos(a), speed*sin(a)))
- live schema keys: score, lives, level, rand, is_dead, reset, paddle,
  paddle_width, paddle_speed, ball_radius, balls, bricks
  (toybox/interventions/breakout.py:38-41)
- dynamics spec: ball speed slow->fast after hitting a brick at depth >=
  ball_speed_row_depth; paddle reflects at paddle_discrete_segments
  discrete angles; reward = row_scores by row; life lost when ball exits
  bottom (is_dead/reset flags); FIRE serves (SURVEY.md §2.2)
- native queries: breakout_bricks_remaining, breakout_channel_count
  (baselines/baselines/run_get_seed_state.py:266,270)

Collision tie-breaking and sub-stepping are this implementation's own
design (the reference's Rust internals are not observable); all quantities
and flags match the reference JSON schema exactly.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from toybox_tpu.core import jsonutil, rng
from toybox_tpu.core.actions import LEGAL_ACTIONS as _LEGAL
from toybox_tpu.core.types import Input
from toybox_tpu.games.common import BOOL, F32, I32, U8

GAME_NAME = "breakout"
WIDTH = 240
HEIGHT = 160
LEGAL_ACTIONS = _LEGAL["breakout"]

# Board geometry (from the default brick layout: bricks span x in [12, 228)).
LEFT_WALL = 12.0
RIGHT_WALL = 228.0
TOP_WALL = 15.0
BOTTOM = float(HEIGHT)
PADDLE_HEIGHT = 4.0

N_ROWS = 6
N_COLS = 18
MAX_BRICKS = 144          # capacity: add_row interventions can exceed 108
DEFAULT_BRICKS = N_ROWS * N_COLS
MAX_BALLS = 4
SUBSTEPS = 2              # fast ball moves 4px/frame vs 4px brick height

_DEFAULT_CONFIG_JSON = {
    "paddle_discrete_segments": 5,
    "ball_start_positions": [
        {"x": 24.0, "y": 80.0, "angle_degrees": 30.0},
        {"x": 120.0, "y": 80.0, "angle_degrees": 30.0},
        {"x": 120.0, "y": 80.0, "angle_degrees": 150.0},
        {"x": 216.0, "y": 80.0, "angle_degrees": 150.0},
    ],
    "start_lives": 5,
    "row_scores": [7, 7, 4, 4, 1, 1],
    "ball_speed_row_depth": 3,
    "ball_speed_slow": 2.0,
    "ball_speed_fast": 4.0,
    "bg_color": {"r": 0, "g": 0, "b": 0, "a": 255},
    "frame_color": {"r": 144, "g": 144, "b": 144, "a": 255},
    "paddle_color": {"r": 200, "g": 72, "b": 72, "a": 255},
    "ball_color": {"r": 200, "g": 72, "b": 72, "a": 255},
    "row_colors": [
        {"r": 200, "g": 72, "b": 72, "a": 255},
        {"r": 198, "g": 108, "b": 58, "a": 255},
        {"r": 180, "g": 122, "b": 48, "a": 255},
        {"r": 162, "g": 162, "b": 42, "a": 255},
        {"r": 72, "g": 160, "b": 72, "a": 255},
        {"r": 66, "g": 72, "b": 200, "a": 255},
    ],
    "rand": {"state": [11972506314117325106, 12454289224450883102]},
}


@struct.dataclass
class Config:
    paddle_discrete_segments: jnp.ndarray  # i32
    ball_start_pos: jnp.ndarray            # f32[4, 2]
    ball_start_angle: jnp.ndarray          # f32[4] degrees
    start_lives: jnp.ndarray               # i32
    row_scores: jnp.ndarray                # i32[N_ROWS]
    row_colors: jnp.ndarray                # u8[N_ROWS, 4]
    ball_speed_row_depth: jnp.ndarray      # i32
    ball_speed_slow: jnp.ndarray           # f32
    ball_speed_fast: jnp.ndarray           # f32
    bg_color: jnp.ndarray                  # u8[4]
    frame_color: jnp.ndarray
    paddle_color: jnp.ndarray
    ball_color: jnp.ndarray
    rand: jnp.ndarray                      # u32[4]


@struct.dataclass
class State:
    score: jnp.ndarray        # i32
    lives: jnp.ndarray        # i32
    level: jnp.ndarray        # i32
    rng: jnp.ndarray          # u32[4]
    is_dead: jnp.ndarray      # bool
    reset: jnp.ndarray        # bool  (ball waiting to be served)
    paddle_pos: jnp.ndarray   # f32[2] (center x, top y)
    paddle_vel: jnp.ndarray   # f32[2]
    paddle_width: jnp.ndarray  # f32
    paddle_speed: jnp.ndarray  # f32
    ball_radius: jnp.ndarray   # f32
    ball_pos: jnp.ndarray     # f32[MAX_BALLS, 2]
    ball_vel: jnp.ndarray     # f32[MAX_BALLS, 2]
    ball_alive: jnp.ndarray   # bool[MAX_BALLS] (= exists in reference list)
    brick_pos: jnp.ndarray    # f32[MAX_BRICKS, 2] top-left
    brick_size: jnp.ndarray   # f32[MAX_BRICKS, 2]
    brick_points: jnp.ndarray  # i32[MAX_BRICKS]
    brick_depth: jnp.ndarray   # i32[MAX_BRICKS]
    brick_row: jnp.ndarray     # i32[MAX_BRICKS]
    brick_col: jnp.ndarray     # i32[MAX_BRICKS]
    brick_alive: jnp.ndarray   # bool[MAX_BRICKS]
    brick_destructible: jnp.ndarray  # bool[MAX_BRICKS]
    brick_color: jnp.ndarray   # u8[MAX_BRICKS, 4]
    brick_exists: jnp.ndarray  # bool[MAX_BRICKS] (capacity mask, not in JSON)


def config_from_json(d: dict) -> Config:
    starts = d["ball_start_positions"]
    return Config(
        paddle_discrete_segments=jnp.asarray(d["paddle_discrete_segments"], I32),
        ball_start_pos=jnp.asarray([[s["x"], s["y"]] for s in starts], F32),
        ball_start_angle=jnp.asarray([s["angle_degrees"] for s in starts], F32),
        start_lives=jnp.asarray(d["start_lives"], I32),
        row_scores=jnp.asarray(d["row_scores"], I32),
        row_colors=jnp.asarray(
            np.stack([jsonutil.color_from_json(c) for c in d["row_colors"]])),
        ball_speed_row_depth=jnp.asarray(d["ball_speed_row_depth"], I32),
        ball_speed_slow=jnp.asarray(d["ball_speed_slow"], F32),
        ball_speed_fast=jnp.asarray(d["ball_speed_fast"], F32),
        bg_color=jnp.asarray(jsonutil.color_from_json(d["bg_color"])),
        frame_color=jnp.asarray(jsonutil.color_from_json(d["frame_color"])),
        paddle_color=jnp.asarray(jsonutil.color_from_json(d["paddle_color"])),
        ball_color=jnp.asarray(jsonutil.color_from_json(d["ball_color"])),
        rand=jnp.asarray(rng.from_u64_pair(d["rand"]["state"])),
    )


def default_config() -> Config:
    return config_from_json(_DEFAULT_CONFIG_JSON)


def config_to_json(config: Config) -> dict:
    pos = np.asarray(config.ball_start_pos, np.float64)
    ang = np.asarray(config.ball_start_angle, np.float64)
    return {
        "paddle_discrete_segments": int(config.paddle_discrete_segments),
        "ball_start_positions": [
            {"x": float(p[0]), "y": float(p[1]), "angle_degrees": float(a)}
            for p, a in zip(pos, ang)],
        "start_lives": int(config.start_lives),
        "row_scores": np.asarray(config.row_scores).tolist(),
        "ball_speed_row_depth": int(config.ball_speed_row_depth),
        "bg_color": jsonutil.color_to_json(config.bg_color),
        "rand": {"state": rng.to_u64_pair(config.rand)},
        "row_colors": [jsonutil.color_to_json(c)
                       for c in np.asarray(config.row_colors)],
        "frame_color": jsonutil.color_to_json(config.frame_color),
        "paddle_color": jsonutil.color_to_json(config.paddle_color),
        "ball_color": jsonutil.color_to_json(config.ball_color),
        "ball_speed_fast": float(config.ball_speed_fast),
        "ball_speed_slow": float(config.ball_speed_slow),
    }


def _serve_vector(config: Config, idx):
    """Ball start pos/vel for start-position index idx (traced)."""
    p = config.ball_start_pos[idx]
    a = config.ball_start_angle[idx] * (math.pi / 180.0)
    speed = config.ball_speed_slow
    # Serve launches up into the brick rows (screen +y is down): angle 30deg
    # from x=24 heads up-right, 150deg from x=216 up-left — the config pairs
    # start x with an angle pointing toward the board center.
    vel = jnp.stack([speed * jnp.cos(a), -speed * jnp.sin(a)])
    return p, vel


def _default_bricks(config: Config):
    r = np.arange(DEFAULT_BRICKS, dtype=np.int32) % N_ROWS
    c = np.arange(DEFAULT_BRICKS, dtype=np.int32) // N_ROWS
    rows = np.zeros(MAX_BRICKS, np.int32)
    cols = np.zeros(MAX_BRICKS, np.int32)
    rows[:DEFAULT_BRICKS] = r
    cols[:DEFAULT_BRICKS] = c
    exists = np.zeros(MAX_BRICKS, bool)
    exists[:DEFAULT_BRICKS] = True
    rows_j = jnp.asarray(rows)
    cols_j = jnp.asarray(cols)
    pos = jnp.stack([12.0 + 12.0 * cols_j.astype(F32),
                     43.0 + 4.0 * rows_j.astype(F32)], axis=-1)
    size = jnp.broadcast_to(jnp.asarray([12.0, 4.0], F32), (MAX_BRICKS, 2))
    points = config.row_scores[jnp.clip(rows_j, 0, N_ROWS - 1)]
    colors = config.row_colors[jnp.clip(rows_j, 0, N_ROWS - 1)]
    depth = (N_ROWS - 1 - rows_j).astype(I32)
    ex = jnp.asarray(exists)
    return dict(
        brick_pos=pos, brick_size=size,
        brick_points=jnp.where(ex, points, 0).astype(I32),
        brick_depth=jnp.where(ex, depth, 0).astype(I32),
        brick_row=rows_j, brick_col=cols_j,
        brick_alive=ex, brick_destructible=ex,
        brick_color=jnp.where(ex[:, None], colors, 0).astype(U8),
        brick_exists=ex,
    )


def new_game(config: Config, seed=None) -> State:
    if seed is None:
        key = config.rand
    else:
        key = rng.seed(jnp.uint32(seed))
    key, start_idx = rng.randint(key, 4)
    pos, vel = _serve_vector(config, start_idx)
    ball_pos = jnp.zeros((MAX_BALLS, 2), F32).at[0].set(pos)
    ball_vel = jnp.zeros((MAX_BALLS, 2), F32).at[0].set(vel)
    ball_alive = jnp.zeros(MAX_BALLS, BOOL).at[0].set(True)
    return State(
        score=jnp.asarray(0, I32),
        lives=config.start_lives.astype(I32),
        level=jnp.asarray(1, I32),
        rng=key,
        is_dead=jnp.asarray(True, BOOL),
        reset=jnp.asarray(True, BOOL),
        paddle_pos=jnp.asarray([120.0, 143.0], F32),
        paddle_vel=jnp.zeros(2, F32),
        paddle_width=jnp.asarray(24.0, F32),
        paddle_speed=jnp.asarray(4.0, F32),
        ball_radius=jnp.asarray(2.0, F32),
        ball_pos=ball_pos, ball_vel=ball_vel, ball_alive=ball_alive,
        **_default_bricks(config),
    )


def _reflect_paddle(config, state, bpos, bvel):
    """Discrete-segment paddle reflection. Returns (new_vel, hit)."""
    r = state.ball_radius
    px, py = state.paddle_pos[0], state.paddle_pos[1]
    half = state.paddle_width * 0.5
    hit = ((bvel[1] > 0)
           & (bpos[1] + r >= py)
           & (bpos[1] - r <= py + PADDLE_HEIGHT)
           & (jnp.abs(bpos[0] - px) <= half + r))
    nseg = jnp.maximum(config.paddle_discrete_segments, 1).astype(F32)
    frac = jnp.clip((bpos[0] - (px - half)) / jnp.maximum(state.paddle_width, 1e-6),
                    0.0, 0.999)
    seg = jnp.floor(frac * nseg)
    # leftmost segment bounces up-left at 150deg, rightmost up-right at 30deg
    angle_deg = 150.0 - seg * (120.0 / jnp.maximum(nseg - 1.0, 1.0))
    a = angle_deg * (math.pi / 180.0)
    speed = jnp.sqrt(jnp.sum(bvel * bvel))
    out = jnp.stack([speed * jnp.cos(a), -speed * jnp.sin(a)])
    return jnp.where(hit, out, bvel), hit


def _ball_substep(config: Config, state: State, bpos, bvel, balive):
    """Advance one ball by vel/SUBSTEPS and resolve collisions.

    Returns (bpos, bvel, balive, score_delta, speedup, bricks_alive).
    """
    r = state.ball_radius
    bpos = bpos + bvel / SUBSTEPS

    # walls
    vx = jnp.where(bpos[0] - r < LEFT_WALL, jnp.abs(bvel[0]),
                   jnp.where(bpos[0] + r > RIGHT_WALL, -jnp.abs(bvel[0]), bvel[0]))
    vy = jnp.where(bpos[1] - r < TOP_WALL, jnp.abs(bvel[1]), bvel[1])
    bvel = jnp.stack([vx, vy])
    bpos = jnp.stack([
        jnp.clip(bpos[0], LEFT_WALL + r, RIGHT_WALL - r),
        jnp.maximum(bpos[1], TOP_WALL + r),
    ])

    # paddle
    bvel, pad_hit = _reflect_paddle(config, state, bpos, bvel)

    # bricks: AABB overlap against all bricks
    bl = state.brick_pos                     # [N,2]
    bs = state.brick_size
    hit = (state.brick_alive & state.brick_exists
           & (bpos[0] + r > bl[:, 0]) & (bpos[0] - r < bl[:, 0] + bs[:, 0])
           & (bpos[1] + r > bl[:, 1]) & (bpos[1] - r < bl[:, 1] + bs[:, 1]))
    hit = hit & balive
    any_hit = jnp.any(hit)
    # nearest hit brick decides the reflection axis
    center = bl + bs * 0.5
    d2 = jnp.sum((center - bpos) ** 2, axis=-1)
    d2 = jnp.where(hit, d2, jnp.inf)
    bidx = jnp.argmin(d2)
    pen_x = (bs[bidx, 0] * 0.5 + r) - jnp.abs(center[bidx, 0] - bpos[0])
    pen_y = (bs[bidx, 1] * 0.5 + r) - jnp.abs(center[bidx, 1] - bpos[1])
    flip_x = any_hit & (pen_x < pen_y)
    flip_y = any_hit & ~flip_x
    sign_x = jnp.where(center[bidx, 0] > bpos[0], -1.0, 1.0)
    sign_y = jnp.where(center[bidx, 1] > bpos[1], -1.0, 1.0)
    bvel = jnp.stack([
        jnp.where(flip_x, sign_x * jnp.abs(bvel[0]), bvel[0]),
        jnp.where(flip_y, sign_y * jnp.abs(bvel[1]), bvel[1]),
    ])

    destroyed = hit & state.brick_destructible
    score_delta = jnp.sum(jnp.where(destroyed, state.brick_points, 0))
    bricks_alive = state.brick_alive & ~destroyed
    speedup = jnp.any(destroyed & (state.brick_depth >= config.ball_speed_row_depth))

    # bottom exit
    dead = bpos[1] - r > BOTTOM
    balive = balive & ~dead
    del pad_hit
    return bpos, bvel, balive, score_delta.astype(I32), speedup, bricks_alive


def step(config: Config, state: State, inp: Input) -> State:
    game_over = state.lives <= 0

    # --- paddle kinematics ---
    move = (jnp.asarray(inp.right, F32) - jnp.asarray(inp.left, F32))
    vx = state.paddle_speed * move
    half = state.paddle_width * 0.5
    new_px = jnp.clip(state.paddle_pos[0] + vx, LEFT_WALL + half, RIGHT_WALL - half)
    state = state.replace(
        paddle_pos=jnp.stack([new_px, state.paddle_pos[1]]),
        paddle_vel=jnp.stack([vx, jnp.asarray(0.0, F32)]))

    # --- serve ---
    fire = jnp.asarray(inp.button1, BOOL)
    serving = state.reset & fire & ~game_over
    state = state.replace(
        reset=jnp.where(serving, False, state.reset),
        is_dead=jnp.where(serving, False, state.is_dead))

    # --- ball integration (masked while waiting to serve) ---
    active = ~state.reset & ~state.is_dead & ~game_over

    def substep(carry, _):
        pos, vel, alive, st = carry

        def one(p, v, a):
            return _ball_substep(config, st, p, v, a)

        p2, v2, a2, sd, sp, ba = jax.vmap(one)(pos, vel, alive)
        # balls consume bricks jointly: AND the per-ball alive-brick masks
        new_bricks = st.brick_alive & jnp.all(ba | ~st.brick_alive[None, :], axis=0)
        # simpler: a brick survives only if no ball destroyed it
        new_bricks = jnp.all(ba, axis=0) & st.brick_alive
        speed_tgt = jnp.where(jnp.any(sp), config.ball_speed_fast, -1.0)

        def rescale(v):
            mag = jnp.sqrt(jnp.sum(v * v))
            scale = jnp.where((speed_tgt > 0) & (mag > 1e-6), speed_tgt / jnp.maximum(mag, 1e-6), 1.0)
            return v * scale
        v2 = jax.vmap(rescale)(v2)
        st = st.replace(brick_alive=new_bricks,
                        score=st.score + jnp.sum(sd))
        return (p2, v2, a2, st), None

    def do_physics(state):
        carry = (state.ball_pos, state.ball_vel, state.ball_alive, state)
        (pos, vel, alive, st), _ = jax.lax.scan(substep, carry, None, length=SUBSTEPS)
        return st.replace(ball_pos=pos, ball_vel=vel, ball_alive=alive)

    moved = do_physics(state)
    state = jax.tree_util.tree_map(
        lambda a, b: jnp.where(active, a, b), moved, state)

    # --- death: all balls gone ---
    died = active & ~jnp.any(state.ball_alive)
    new_lives = jnp.where(died, state.lives - 1, state.lives)
    key, start_idx = rng.randint(state.rng, 4)
    spos, svel = _serve_vector(config, start_idx)
    need_serve_ball = died
    state = state.replace(
        lives=new_lives,
        is_dead=jnp.where(died, True, state.is_dead),
        reset=jnp.where(died, True, state.reset),
        rng=jnp.where(died, key, state.rng),
        ball_pos=jnp.where(need_serve_ball, state.ball_pos.at[0].set(spos), state.ball_pos),
        ball_vel=jnp.where(need_serve_ball, state.ball_vel.at[0].set(svel), state.ball_vel),
        ball_alive=jnp.where(need_serve_ball,
                             jnp.zeros_like(state.ball_alive).at[0].set(True),
                             state.ball_alive),
    )

    # --- level clear: respawn all bricks, back to serve pose ---
    cleared = active & ~jnp.any(state.brick_alive & state.brick_destructible
                                & state.brick_exists)
    key2, idx2 = rng.randint(state.rng, 4)
    spos2, svel2 = _serve_vector(config, idx2)
    state = state.replace(
        level=jnp.where(cleared, state.level + 1, state.level),
        brick_alive=jnp.where(cleared, state.brick_exists, state.brick_alive),
        reset=jnp.where(cleared, True, state.reset),
        is_dead=jnp.where(cleared, True, state.is_dead),
        rng=jnp.where(cleared, key2, state.rng),
        ball_pos=jnp.where(cleared, state.ball_pos.at[0].set(spos2), state.ball_pos),
        ball_vel=jnp.where(cleared, state.ball_vel.at[0].set(svel2), state.ball_vel),
        ball_alive=jnp.where(cleared,
                             jnp.zeros_like(state.ball_alive).at[0].set(True),
                             state.ball_alive),
    )
    return state


# ---------------------------------------------------------------------------
# Render
# ---------------------------------------------------------------------------

def render(config: Config, state: State) -> jnp.ndarray:
    from toybox_tpu.games.common import paint, paint_rects, rect_mask

    img = jnp.broadcast_to(jnp.asarray(config.bg_color, U8),
                           (HEIGHT, WIDTH, 4))
    # frame: side walls + top band
    frame = (rect_mask(HEIGHT, WIDTH, 0, TOP_WALL, LEFT_WALL, HEIGHT)
             | rect_mask(HEIGHT, WIDTH, RIGHT_WALL, TOP_WALL, WIDTH, HEIGHT)
             | rect_mask(HEIGHT, WIDTH, 0, TOP_WALL, WIDTH, TOP_WALL + 3))
    img = paint(img, frame, config.frame_color)

    # bricks
    xywh = jnp.concatenate([state.brick_pos, state.brick_size], axis=-1)
    img = paint_rects(img, xywh, state.brick_color,
                      state.brick_alive & state.brick_exists)

    # paddle
    half = state.paddle_width * 0.5
    pm = rect_mask(HEIGHT, WIDTH,
                   state.paddle_pos[0] - half, state.paddle_pos[1],
                   state.paddle_pos[0] + half, state.paddle_pos[1] + PADDLE_HEIGHT)
    img = paint(img, pm, config.paddle_color)

    # balls (square sprites, radius r)
    r = state.ball_radius
    show_balls = state.ball_alive & ~state.reset
    ball_xywh = jnp.concatenate([state.ball_pos - r,
                                 jnp.broadcast_to(2 * r, (MAX_BALLS, 2))], axis=-1)
    colors = jnp.broadcast_to(jnp.asarray(config.ball_color, U8), (MAX_BALLS, 4))
    img = paint_rects(img, ball_xywh, colors, show_balls)
    return img


# ---------------------------------------------------------------------------
# JSON codec (reference live-schema keys)
# ---------------------------------------------------------------------------

def state_to_json(config: Config, state: State) -> dict:
    balls = []
    alive = np.asarray(state.ball_alive)
    bp = np.asarray(state.ball_pos, np.float64)
    bv = np.asarray(state.ball_vel, np.float64)
    for i in range(MAX_BALLS):
        if alive[i]:
            balls.append({"position": {"x": float(bp[i, 0]), "y": float(bp[i, 1])},
                          "velocity": {"x": float(bv[i, 0]), "y": float(bv[i, 1])}})
    bricks = []
    ex = np.asarray(state.brick_exists)
    pos = np.asarray(state.brick_pos, np.float64)
    size = np.asarray(state.brick_size, np.float64)
    col = np.asarray(state.brick_color)
    for i in range(MAX_BRICKS):
        if not ex[i]:
            continue
        bricks.append({
            "destructible": bool(np.asarray(state.brick_destructible)[i]),
            "depth": int(np.asarray(state.brick_depth)[i]),
            "color": jsonutil.color_to_json(col[i]),
            "alive": bool(np.asarray(state.brick_alive)[i]),
            "points": int(np.asarray(state.brick_points)[i]),
            "size": {"x": float(size[i, 0]), "y": float(size[i, 1])},
            "position": {"x": float(pos[i, 0]), "y": float(pos[i, 1])},
            "row": int(np.asarray(state.brick_row)[i]),
            "col": int(np.asarray(state.brick_col)[i]),
        })
    return {
        "score": int(state.score),
        "lives": int(state.lives),
        "level": int(state.level),
        "rand": {"state": rng.to_u64_pair(state.rng)},
        "is_dead": bool(state.is_dead),
        "reset": bool(state.reset),
        "paddle": {
            "position": jsonutil.vec2d_to_json(state.paddle_pos),
            "velocity": jsonutil.vec2d_to_json(state.paddle_vel),
        },
        "paddle_width": float(state.paddle_width),
        "paddle_speed": float(state.paddle_speed),
        "ball_radius": float(state.ball_radius),
        "balls": balls,
        "bricks": bricks,
    }


def state_from_json(config: Config, d: dict) -> State:
    nballs = len(d["balls"])
    assert nballs <= MAX_BALLS, f"too many balls: {nballs}"
    ball_pos = np.zeros((MAX_BALLS, 2), np.float32)
    ball_vel = np.zeros((MAX_BALLS, 2), np.float32)
    ball_alive = np.zeros(MAX_BALLS, bool)
    for i, b in enumerate(d["balls"]):
        ball_pos[i] = jsonutil.vec2d_from_json(b["position"])
        ball_vel[i] = jsonutil.vec2d_from_json(b["velocity"])
        ball_alive[i] = True
    nb = len(d["bricks"])
    assert nb <= MAX_BRICKS, f"too many bricks: {nb}"
    bpos = np.zeros((MAX_BRICKS, 2), np.float32)
    bsize = np.zeros((MAX_BRICKS, 2), np.float32)
    bpoints = np.zeros(MAX_BRICKS, np.int32)
    bdepth = np.zeros(MAX_BRICKS, np.int32)
    brow = np.zeros(MAX_BRICKS, np.int32)
    bcol = np.zeros(MAX_BRICKS, np.int32)
    balive = np.zeros(MAX_BRICKS, bool)
    bdest = np.zeros(MAX_BRICKS, bool)
    bcolor = np.zeros((MAX_BRICKS, 4), np.uint8)
    bexists = np.zeros(MAX_BRICKS, bool)
    for i, b in enumerate(d["bricks"]):
        bpos[i] = jsonutil.vec2d_from_json(b["position"])
        bsize[i] = jsonutil.vec2d_from_json(b["size"])
        bpoints[i] = b["points"]
        bdepth[i] = b["depth"]
        brow[i] = b["row"]
        bcol[i] = b["col"]
        balive[i] = b["alive"]
        bdest[i] = b["destructible"]
        bcolor[i] = jsonutil.color_from_json(b["color"])
        bexists[i] = True
    return State(
        score=jnp.asarray(d.get("score", d.get("points", 0)), I32),
        lives=jnp.asarray(d["lives"], I32),
        level=jnp.asarray(d.get("level", 1), I32),
        rng=jnp.asarray(rng.from_u64_pair(d["rand"]["state"])),
        is_dead=jnp.asarray(bool(d["is_dead"]), BOOL),
        reset=jnp.asarray(bool(d["reset"]), BOOL),
        paddle_pos=jnp.asarray(jsonutil.vec2d_from_json(d["paddle"]["position"])),
        paddle_vel=jnp.asarray(jsonutil.vec2d_from_json(d["paddle"]["velocity"])),
        paddle_width=jnp.asarray(d["paddle_width"], F32),
        paddle_speed=jnp.asarray(d["paddle_speed"], F32),
        ball_radius=jnp.asarray(d["ball_radius"], F32),
        ball_pos=jnp.asarray(ball_pos), ball_vel=jnp.asarray(ball_vel),
        ball_alive=jnp.asarray(ball_alive),
        brick_pos=jnp.asarray(bpos), brick_size=jnp.asarray(bsize),
        brick_points=jnp.asarray(bpoints), brick_depth=jnp.asarray(bdepth),
        brick_row=jnp.asarray(brow), brick_col=jnp.asarray(bcol),
        brick_alive=jnp.asarray(balive), brick_destructible=jnp.asarray(bdest),
        brick_color=jnp.asarray(bcolor), brick_exists=jnp.asarray(bexists),
    )


def schema() -> dict:
    return {
        "type": "object",
        "required": ["score", "lives", "level", "rand", "is_dead", "reset",
                     "paddle", "paddle_width", "paddle_speed", "ball_radius",
                     "balls", "bricks"],
    }


def query(config: Config, state: State, name: str, args=None):
    if name == "bricks_remaining":
        return int(jnp.sum(state.brick_alive & state.brick_exists))
    if name == "channel_count":
        return int(channel_count(state))
    raise ValueError(f"unknown breakout query: {name}")


def bricks_remaining(state: State):
    return jnp.sum((state.brick_alive & state.brick_exists).astype(I32))


def channel_count(state: State):
    """Number of columns whose existing bricks are all dead (jit-safe)."""
    cols = state.brick_col
    dead = ~state.brick_alive & state.brick_exists
    exists = state.brick_exists
    col_ids = jnp.arange(N_COLS)
    in_col = cols[None, :] == col_ids[:, None]           # [C, N]
    has_any = jnp.any(in_col & exists[None, :], axis=1)
    all_dead = jnp.all(~(in_col & exists[None, :]) | (in_col & dead[None, :]),
                       axis=1)
    return jnp.sum((has_any & all_dead).astype(I32))


def lives(state: State):
    return state.lives


def score(state: State):
    return state.score
