"""Space Invaders — pure-JAX engine (SoA state, jit/vmap-safe step).

Behavioral contract re-derived from the reference (SURVEY.md §2.1-2.2):

- state/config schemas + defaults:
  toybox/interventions/defaults/space_invaders_{state,config}_default.json
  (36 enemies in a 6x6 grid at x=44+32*col, y=31+18*row; points by row
  [30,30,20,20,10,10]; 3 pixel-destructible 16x18 shields at
  (84,157),(148,157),(212,157); ship 16x10 at (68,185) speed 3; ufo
  appearance_counter 500; enemy_shot_delay 50; life_display_timer 128;
  jitter 0.5; enemy_protocol "TargetPlayer")
- intervention classes / field lists:
  toybox/interventions/space_invaders.py (Player/Laser/Ufo/Enemy/
  EnemiesMovementState expected_keys; get/set_jitter; remove_mothership)
- live-schema note: the old default JSON stores per-enemy march fields;
  the live schema centralizes them in `enemies_movement`
  (space_invaders.py:11-13 reads the live schema at import; SURVEY §2.2)

March cadence, laser speeds, blast patterns and death animations are this
implementation's own design (Rust internals not observable); all schema
keys, defaults and the intervention surface match the reference.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from toybox_tpu.core import jsonutil, rng
from toybox_tpu.core.actions import LEGAL_ACTIONS as _LEGAL
from toybox_tpu.core.types import Input
from toybox_tpu.games.common import BOOL, F32, I32, U8

GAME_NAME = "space_invaders"
WIDTH = 320
HEIGHT = 210
LEGAL_ACTIONS = _LEGAL["space_invaders"]

N_ROWS = 6
N_COLS = 6
N_ENEMIES = N_ROWS * N_COLS
ENEMY_X0, ENEMY_Y0 = 44, 31          # formation top-left at game start
ENEMY_DX, ENEMY_DY = 32, 18          # grid spacing
ENEMY_W, ENEMY_H = 16, 10            # collision box
SHIP_Y = 185
SHIP_W, SHIP_H = 16, 10
SHIELD_W, SHIELD_H = 16, 18
N_SHIELDS = 3
MAX_ENEMY_LASERS = 4

SHIP_LASER_SPEED = 6
ENEMY_LASER_SPEED = 3
LASER_W, LASER_H = 2, 8

MARCH_STEP_X = 2                      # formation shift per march tick
MARCH_STEP_Y = 8                      # drop on direction reversal
MARCH_LEFT_LIMIT = 8
MARCH_RIGHT_LIMIT = WIDTH - 8
ENEMY_FLOOR = SHIP_Y - ENEMY_H        # enemies reaching here end the game

UFO_POINTS = 100
UFO_SPEED = 2
UFO_Y = 12
UFO_RESET = 500
DEATH_ANIM = 16                       # death animation frames
SHIP_DEATH_ANIM = 60

LEFT_D, RIGHT_D, UP_D, DOWN_D = 2, 3, 0, 1  # core.types.Direction codes

# Shield alpha mask (18 rows x 16 cols, [y][x]), bit-exact from the
# reference default state JSON (shields[*].data alpha channel).
_SHIELD_MASK_STRS = [
    "0000111111110000",
    "0000111111110000",
    "0011111111111100",
    "0011111111111100",
    "0011111111111100",
    "0011111111111100",
    "0011111111111100",
    "0011111111111100",
    "0011111111111100",
    "0011111111111100",
    "1111111111111111",
    "1111111111111111",
    "1111111111111111",
    "1111111111111111",
    "1111111111111111",
    "1111111111111111",
    "1111000000001111",
    "1111000000001111",
]
SHIELD_MASK = np.array([[c == "1" for c in row] for row in _SHIELD_MASK_STRS])
SHIELD_COLOR = np.array([172, 80, 48, 255], np.uint8)

_DEFAULT_CONFIG_JSON = {
    "jitter": 0.5,
    "shields": [[84, 157], [148, 157], [212, 157]],
    "row_scores": [30, 30, 20, 20, 10, 10],
    "enemy_protocol": "TargetPlayer",
    "start_lives": 3,
    "rand": {"state": [14138799424576617778, 15827758918122478082]},
}

ENEMY_PROTOCOLS = ["TargetPlayer", "Random"]


@struct.dataclass
class Config:
    # static fields: exact JSON round-trip; changing them re-inits and
    # recompiles (config semantics — dirty_config forces a new game)
    jitter: float = struct.field(pytree_node=False)
    shield_pos_static: tuple = struct.field(pytree_node=False)  # ((x,y),..)
    row_scores: jnp.ndarray      # i32[N_ROWS]
    enemy_protocol: jnp.ndarray  # i32 (0 TargetPlayer, 1 Random)
    start_lives: jnp.ndarray     # i32
    rand: jnp.ndarray            # u32[4]


@struct.dataclass
class State:
    score: jnp.ndarray           # i32
    lives: jnp.ndarray           # i32
    level: jnp.ndarray           # i32 (levels_completed)
    rng: jnp.ndarray             # u32[4]
    life_display_timer: jnp.ndarray  # i32
    enemy_shot_delay: jnp.ndarray    # i32
    shot_timer: jnp.ndarray          # i32 countdown to next enemy shot
    # ship
    ship_x: jnp.ndarray          # i32
    ship_y: jnp.ndarray          # i32
    ship_alive: jnp.ndarray      # bool
    ship_death_counter: jnp.ndarray  # i32 (-1 = null)
    ship_death_hit_1: jnp.ndarray    # bool
    # ship laser (at most one). Coordinates are split into scalar-component
    # arrays — a trailing [.., 2] dim would sit in the 128-wide TPU lane
    # slot and blow up every op on these hot arrays (CLAUDE.md rule #1).
    ship_laser_alive: jnp.ndarray  # bool
    ship_laser_x: jnp.ndarray      # i32
    ship_laser_y: jnp.ndarray      # i32
    ship_laser_t: jnp.ndarray      # i32 frames alive
    # enemy lasers
    elaser_alive: jnp.ndarray      # bool[L]
    elaser_x: jnp.ndarray          # i32[L]
    elaser_y: jnp.ndarray          # i32[L]
    elaser_t: jnp.ndarray          # i32[L]
    # enemies (SoA, id = row * N_COLS + col)
    enemy_x: jnp.ndarray           # i32[N]
    enemy_y: jnp.ndarray           # i32[N]
    enemy_alive: jnp.ndarray       # bool[N]
    enemy_death_counter: jnp.ndarray  # i32[N] (-1 = null)
    # shared march state (live-schema enemies_movement)
    move_counter: jnp.ndarray      # i32
    move_dir: jnp.ndarray          # i32 Direction code
    visual_orientation: jnp.ndarray  # bool
    # shields: pixel-destructible sprites
    shield_alpha: jnp.ndarray      # bool[N_SHIELDS, SHIELD_H, SHIELD_W]
    # ufo
    ufo_x: jnp.ndarray             # i32
    ufo_y: jnp.ndarray
    ufo_appearance_counter: jnp.ndarray  # i32 (-1 = banished)
    ufo_death_counter: jnp.ndarray       # i32 (-1 = null)


def config_from_json(d: dict) -> Config:
    return Config(
        jitter=float(d["jitter"]),
        shield_pos_static=tuple(tuple(int(v) for v in xy)
                                for xy in d["shields"]),
        row_scores=jnp.asarray(d["row_scores"], I32),
        enemy_protocol=jnp.asarray(
            ENEMY_PROTOCOLS.index(d.get("enemy_protocol", "TargetPlayer")), I32),
        start_lives=jnp.asarray(d["start_lives"], I32),
        rand=jnp.asarray(rng.from_u64_pair(d["rand"]["state"])),
    )


def _shield_pos_arr(config: Config):
    return jnp.asarray(config.shield_pos_static, I32)


def default_config() -> Config:
    return config_from_json(_DEFAULT_CONFIG_JSON)


def config_to_json(config: Config) -> dict:
    return {
        "jitter": float(config.jitter),
        "shields": [list(xy) for xy in config.shield_pos_static],
        "row_scores": np.asarray(config.row_scores).tolist(),
        "enemy_protocol": ENEMY_PROTOCOLS[int(config.enemy_protocol)],
        "start_lives": int(config.start_lives),
        "rand": {"state": rng.to_u64_pair(config.rand)},
    }


def _formation_xy():
    ids = np.arange(N_ENEMIES)
    row, col = ids // N_COLS, ids % N_COLS
    return ((ENEMY_X0 + col * ENEMY_DX).astype(np.int32),
            (ENEMY_Y0 + row * ENEMY_DY).astype(np.int32))


def new_game(config: Config, seed=None) -> State:
    if seed is None:
        key = config.rand
    else:
        key = rng.seed(jnp.uint32(seed))
    nshields = len(config.shield_pos_static)
    return State(
        score=jnp.asarray(0, I32),
        lives=config.start_lives.astype(I32),
        level=jnp.asarray(0, I32),
        rng=key,
        life_display_timer=jnp.asarray(128, I32),
        enemy_shot_delay=jnp.asarray(50, I32),
        shot_timer=jnp.asarray(50, I32),
        ship_x=jnp.asarray(68, I32),
        ship_y=jnp.asarray(SHIP_Y, I32),
        ship_alive=jnp.asarray(False, BOOL),
        ship_death_counter=jnp.asarray(-1, I32),
        ship_death_hit_1=jnp.asarray(True, BOOL),
        ship_laser_alive=jnp.asarray(False, BOOL),
        ship_laser_x=jnp.asarray(0, I32),
        ship_laser_y=jnp.asarray(0, I32),
        ship_laser_t=jnp.asarray(0, I32),
        elaser_alive=jnp.zeros(MAX_ENEMY_LASERS, BOOL),
        elaser_x=jnp.zeros(MAX_ENEMY_LASERS, I32),
        elaser_y=jnp.zeros(MAX_ENEMY_LASERS, I32),
        elaser_t=jnp.zeros(MAX_ENEMY_LASERS, I32),
        enemy_x=jnp.asarray(_formation_xy()[0]),
        enemy_y=jnp.asarray(_formation_xy()[1]),
        enemy_alive=jnp.ones(N_ENEMIES, BOOL),
        enemy_death_counter=jnp.full(N_ENEMIES, -1, I32),
        move_counter=jnp.asarray(32, I32),
        move_dir=jnp.asarray(RIGHT_D, I32),
        visual_orientation=jnp.asarray(True, BOOL),
        shield_alpha=jnp.broadcast_to(jnp.asarray(SHIELD_MASK),
                                      (nshields, SHIELD_H, SHIELD_W)),
        ufo_x=jnp.asarray(-2, I32),
        ufo_y=jnp.asarray(UFO_Y, I32),
        ufo_appearance_counter=jnp.asarray(UFO_RESET, I32),
        ufo_death_counter=jnp.asarray(-1, I32),
    )


# ---------------------------------------------------------------------------
# Step helpers
# ---------------------------------------------------------------------------

def _overlap(ax, ay, aw, ah, bx, by, bw, bh):
    return ((ax < bx + bw) & (ax + aw > bx)
            & (ay < by + bh) & (ay + ah > by))


def _shields_vs_lasers(config: Config, alpha, lx, ly, from_above, active):
    """Test L laser tips against all shields at once; erode blast patches.

    lx/ly/from_above/active: [L] arrays (tip x at laser center, y at the
    leading edge). Returns (new_alpha [S,H,W], hit [L]).

    Gather-free: the tip-solidity test and the blast patch are both
    iota-compare masks over the (tiny) shield sprites — a per-laser scan
    with dynamic-index gathers was ~5x the cost of the whole engine step.
    """
    U32 = jnp.uint32
    sp = _shield_pos_arr(config)
    sx = sp[:, 0]                                # [S]
    sy = sp[:, 1]
    px = lx[:, None] - sx[None, :]               # [L, S]
    py = ly[:, None] - sy[None, :]
    inside = (px >= 0) & (px < SHIELD_W) & (py >= 0) & (py < SHIELD_H)

    # Shield rows packed as u32 bitmasks (SHIELD_W=16 bits): the whole
    # test + erosion runs on [L, S, H] integers instead of [L, S, H, W]
    # pixel masks — 16x less element work (bit-exact: pure bool/int).
    wbit = (jnp.uint32(1) << jnp.arange(SHIELD_W, dtype=U32))
    bits = jnp.sum(alpha.astype(U32) * wbit[None, None, :], axis=-1,
                   dtype=U32)                    # [S, H]

    hs = jnp.arange(SHIELD_H, dtype=I32)         # [H]
    pxc = jnp.clip(px, 0, SHIELD_W - 1).astype(U32)
    row_bits = jnp.sum(
        jnp.where(hs[None, None, :] == py[:, :, None], bits[None], 0),
        axis=-1, dtype=U32)                      # [L, S]
    solid = ((row_bits >> pxc) & 1) == 1
    hit = inside & solid & active[:, None]       # [L, S]

    # blast: clear a 4-wide x 6-tall patch at the impact, biased in the
    # laser's travel direction
    y0 = jnp.where(from_above[:, None], py, py - 5)        # [L, S]
    patch = jnp.zeros_like(row_bits)             # u32 [L, S]
    for j in range(-1, 3):                       # columns px-1 .. px+2
        col = px + j
        ok = (col >= 0) & (col < SHIELD_W)
        sh = jnp.clip(col, 0, SHIELD_W - 1).astype(U32)
        patch = patch | jnp.where(ok, jnp.uint32(1) << sh, 0)
    rows_in = ((hs[None, None, :] >= y0[:, :, None])
               & (hs[None, None, :] < (y0 + 6)[:, :, None]))   # [L, S, H]
    blast_per_l = jnp.where(rows_in & hit[:, :, None],
                            patch[:, :, None], 0)              # [L, S, H]
    blast_bits = jax.lax.reduce(blast_per_l, jnp.uint32(0),
                                jax.lax.bitwise_or, (0,))      # [S, H]
    new_bits = bits & ~blast_bits
    new_alpha = ((new_bits[:, :, None] >> jnp.arange(
        SHIELD_W, dtype=U32)[None, None, :]) & 1).astype(jnp.bool_)
    return new_alpha, jnp.any(hit, axis=1)


def step(config: Config, state: State, inp: Input) -> State:
    game_over = state.lives <= 0

    # --- intro / respawn pause: life display timer -----------------------
    paused = state.life_display_timer > 0
    state = state.replace(
        life_display_timer=jnp.maximum(state.life_display_timer - 1, 0))
    became_ready = paused & (state.life_display_timer == 0)
    state = state.replace(
        ship_alive=jnp.where(became_ready & ~game_over, True,
                             state.ship_alive))
    run = ~paused & ~game_over

    # --- ship movement ----------------------------------------------------
    move = (jnp.asarray(inp.right, I32) - jnp.asarray(inp.left, I32)) * 3
    ship_x = jnp.clip(state.ship_x + jnp.where(run & state.ship_alive, move, 0),
                      0, WIDTH - SHIP_W)
    state = state.replace(ship_x=ship_x)

    # --- ship death animation --------------------------------------------
    dying = state.ship_death_counter >= 0
    sdc = jnp.where(dying, state.ship_death_counter - 1, -1)
    respawn = dying & (sdc < 0)
    state = state.replace(
        ship_death_counter=sdc,
        ship_alive=jnp.where(respawn & ~game_over, True, state.ship_alive),
        ship_x=jnp.where(respawn, 68, ship_x))

    # --- fire ship laser --------------------------------------------------
    fire = jnp.asarray(inp.button1, BOOL)
    can_fire = run & state.ship_alive & fire & ~state.ship_laser_alive
    state = state.replace(
        ship_laser_alive=state.ship_laser_alive | can_fire,
        ship_laser_x=jnp.where(can_fire, state.ship_x + SHIP_W // 2,
                               state.ship_laser_x),
        ship_laser_y=jnp.where(can_fire, state.ship_y - LASER_H,
                               state.ship_laser_y),
        ship_laser_t=jnp.where(can_fire, 0, state.ship_laser_t))

    # --- move lasers ------------------------------------------------------
    sly = state.ship_laser_y + jnp.where(
        run & state.ship_laser_alive, -SHIP_LASER_SPEED, 0)
    sl_alive = state.ship_laser_alive & (sly + LASER_H > 0)
    ely = state.elaser_y + jnp.where(
        run & state.elaser_alive, ENEMY_LASER_SPEED, 0)
    el_alive = state.elaser_alive & (ely < HEIGHT)
    state = state.replace(
        ship_laser_y=sly, ship_laser_alive=sl_alive,
        ship_laser_t=state.ship_laser_t + 1,
        elaser_y=ely, elaser_alive=el_alive,
        elaser_t=state.elaser_t + 1)

    # --- enemy march ------------------------------------------------------
    n_alive = jnp.sum(state.enemy_alive.astype(I32))
    mc = state.move_counter - jnp.where(run, 1, 0)
    tick = run & (mc <= 0)
    going_right = state.move_dir == RIGHT_D
    dx = jnp.where(going_right, MARCH_STEP_X, -MARCH_STEP_X)
    # would any alive enemy cross the margin?
    ex = state.enemy_x
    at_edge = jnp.any(jnp.where(
        state.enemy_alive,
        jnp.where(going_right, ex + dx + ENEMY_W > MARCH_RIGHT_LIMIT,
                  ex + dx < MARCH_LEFT_LIMIT),
        False))
    reverse = tick & at_edge
    shift_x = jnp.where(tick & ~reverse, dx, 0)
    shift_y = jnp.where(reverse, MARCH_STEP_Y, 0)
    new_dir = jnp.where(reverse,
                        jnp.where(going_right, LEFT_D, RIGHT_D),
                        state.move_dir)
    # cadence speeds up as the formation thins
    period = jnp.maximum(2 + n_alive, 4)
    state = state.replace(
        enemy_x=state.enemy_x + shift_x,
        enemy_y=state.enemy_y + shift_y,
        move_dir=new_dir,
        move_counter=jnp.where(tick, period, mc),
        visual_orientation=jnp.where(tick, ~state.visual_orientation,
                                     state.visual_orientation))

    # enemy death animations
    edc = jnp.where(state.enemy_death_counter >= 0,
                    state.enemy_death_counter - 1, -1)
    state = state.replace(enemy_death_counter=edc)

    # --- enemy fire -------------------------------------------------------
    st = state.shot_timer - jnp.where(run, 1, 0)
    do_shoot = run & (st <= 0) & (n_alive > 0)
    key = state.rng
    key, u = rng.uniform(key)
    key, rcol = rng.randint(key, N_COLS)
    # TargetPlayer: aim at the ship's column with prob (1 - jitter)
    ship_cx = state.ship_x + SHIP_W // 2
    coldist = jnp.abs(state.enemy_x + ENEMY_W // 2 - ship_cx)
    col_of = jnp.arange(N_ENEMIES, dtype=I32) % N_COLS
    target_col = col_of[jnp.argmin(jnp.where(state.enemy_alive, coldist, 9999))]
    random_mode = (config.enemy_protocol == 1) | (u < config.jitter)
    chosen_col = jnp.where(random_mode, rcol, target_col)
    # bottom-most alive enemy in the chosen column (fall back to any column)
    in_col = (col_of == chosen_col) & state.enemy_alive
    any_in_col = jnp.any(in_col)
    in_col = jnp.where(any_in_col, in_col, state.enemy_alive)
    # bottom-most alive enemy in the chosen column, gather-free: masked max
    # of y, then its x by a masked reduction over (in_col & y == max_y)
    shooter_y = jnp.max(jnp.where(in_col, state.enemy_y, -1))
    is_shooter = in_col & (state.enemy_y == shooter_y)
    # ties broken by lowest id (argmax picks the first True)
    first = jnp.argmax(is_shooter)
    is_shooter = is_shooter & (jnp.arange(N_ENEMIES) == first)
    shooter_x = jnp.sum(jnp.where(is_shooter, state.enemy_x, 0))
    # spawn in a free laser slot
    free = ~state.elaser_alive
    slot = jnp.argmax(free)
    can = do_shoot & jnp.any(free)
    slot_mask = jnp.arange(MAX_ENEMY_LASERS) == slot
    spawn_x = shooter_x + ENEMY_W // 2
    spawn_y = shooter_y + ENEMY_H
    state = state.replace(
        rng=key,
        shot_timer=jnp.where(do_shoot, state.enemy_shot_delay, st),
        elaser_alive=jnp.where(can & slot_mask, True, state.elaser_alive),
        elaser_x=jnp.where(can & slot_mask, spawn_x, state.elaser_x),
        elaser_y=jnp.where(can & slot_mask, spawn_y, state.elaser_y),
        elaser_t=jnp.where(can & slot_mask, 0, state.elaser_t))

    # --- ufo --------------------------------------------------------------
    uac = state.ufo_appearance_counter
    flying = (uac == 0) & run
    uac = jnp.where(run & (uac > 0), uac - 1, uac)
    ufo_x = jnp.where(flying, state.ufo_x + UFO_SPEED, state.ufo_x)
    done_fly = flying & (ufo_x > WIDTH)
    uac = jnp.where(done_fly, UFO_RESET, uac)
    ufo_x = jnp.where(done_fly, -2, ufo_x)
    udc = jnp.where(state.ufo_death_counter >= 0,
                    state.ufo_death_counter - 1, -1)
    state = state.replace(ufo_x=ufo_x, ufo_appearance_counter=uac,
                          ufo_death_counter=udc)

    # --- ship laser collisions -------------------------------------------
    lx = state.ship_laser_x
    ly = state.ship_laser_y
    sl = state.ship_laser_alive

    # vs enemies (topmost pixel of laser inside enemy box). Enemies are
    # 32px apart and the laser is 2px wide, so ehit has at most one True;
    # points/death-animation flow through masked reductions, no gathers.
    ehit = (sl & state.enemy_alive
            & _overlap(lx, ly, LASER_W, LASER_H,
                       state.enemy_x, state.enemy_y,
                       ENEMY_W, ENEMY_H))
    any_ehit = jnp.any(ehit)
    row_of = jnp.arange(N_ENEMIES, dtype=I32) // N_COLS
    points_of = config.row_scores[row_of]  # static indices: one-time gather
    points = jnp.sum(jnp.where(ehit, points_of, 0))
    state = state.replace(
        enemy_alive=state.enemy_alive & ~ehit,
        enemy_death_counter=jnp.where(ehit, DEATH_ANIM,
                                      state.enemy_death_counter),
        score=state.score + points,
        ship_laser_alive=sl & ~any_ehit)

    # vs ufo
    sl = state.ship_laser_alive
    uhit = (sl & flying & ~done_fly
            & _overlap(lx, ly, LASER_W, LASER_H,
                       state.ufo_x, state.ufo_y, ENEMY_W, ENEMY_H))
    state = state.replace(
        score=state.score + jnp.where(uhit, UFO_POINTS, 0),
        ufo_death_counter=jnp.where(uhit, DEATH_ANIM, state.ufo_death_counter),
        ufo_x=jnp.where(uhit, -2, state.ufo_x),
        ufo_appearance_counter=jnp.where(uhit, UFO_RESET,
                                         state.ufo_appearance_counter),
        ship_laser_alive=sl & ~uhit)

    # vs shields: all lasers (ship + enemy) against all shields in one
    # batched gather-free pass
    sl = state.ship_laser_alive
    elx = state.elaser_x
    ely = state.elaser_y
    all_lx = jnp.concatenate([(lx + LASER_W // 2)[None],
                              elx + LASER_W // 2])
    all_ly = jnp.concatenate([ly[None], ely + LASER_H])
    all_above = jnp.concatenate([jnp.asarray([False]),
                                 jnp.ones(MAX_ENEMY_LASERS, BOOL)])
    all_active = jnp.concatenate([sl[None], state.elaser_alive])
    alpha, hits = _shields_vs_lasers(config, state.shield_alpha,
                                     all_lx, all_ly, all_above, all_active)
    state = state.replace(shield_alpha=alpha,
                          ship_laser_alive=sl & ~hits[0],
                          elaser_alive=state.elaser_alive & ~hits[1:])

    # vs ship
    ship_hit = jnp.any(
        state.elaser_alive & state.ship_alive & run
        & _overlap(elx, ely, LASER_W, LASER_H,
                   state.ship_x, state.ship_y, SHIP_W, SHIP_H))
    state = state.replace(
        lives=jnp.where(ship_hit, state.lives - 1, state.lives),
        ship_alive=state.ship_alive & ~ship_hit,
        ship_death_counter=jnp.where(ship_hit, SHIP_DEATH_ANIM,
                                     state.ship_death_counter),
        ship_death_hit_1=jnp.where(ship_hit, True, state.ship_death_hit_1),
        elaser_alive=state.elaser_alive & ~(
            ship_hit & _overlap(elx, ely, LASER_W, LASER_H,
                                state.ship_x, state.ship_y, SHIP_W, SHIP_H)))

    # --- enemies reaching the ship row ends the game ----------------------
    landed = jnp.any(state.enemy_alive
                     & (state.enemy_y + ENEMY_H >= ENEMY_FLOOR))
    state = state.replace(lives=jnp.where(landed & run, 0, state.lives))

    # --- level clear ------------------------------------------------------
    cleared = run & (jnp.sum(state.enemy_alive.astype(I32)) == 0)
    nshields = state.shield_alpha.shape[0]
    state = state.replace(
        level=jnp.where(cleared, state.level + 1, state.level),
        enemy_alive=jnp.where(cleared, True, state.enemy_alive),
        enemy_x=jnp.where(cleared, jnp.asarray(_formation_xy()[0]),
                          state.enemy_x),
        enemy_y=jnp.where(cleared, jnp.asarray(_formation_xy()[1]),
                          state.enemy_y),
        move_dir=jnp.where(cleared, RIGHT_D, state.move_dir),
        move_counter=jnp.where(cleared, 32, state.move_counter),
        shield_alpha=jnp.where(
            cleared,
            jnp.broadcast_to(jnp.asarray(SHIELD_MASK),
                             (nshields, SHIELD_H, SHIELD_W)),
            state.shield_alpha),
        elaser_alive=jnp.where(cleared, False, state.elaser_alive),
        ship_laser_alive=jnp.where(cleared, False, state.ship_laser_alive),
        life_display_timer=jnp.where(cleared, 128, state.life_display_timer),
        ship_alive=jnp.where(cleared, False, state.ship_alive),
    )
    return state


# ---------------------------------------------------------------------------
# Render
# ---------------------------------------------------------------------------

SHIP_COLOR = np.array([35, 129, 59, 255], np.uint8)
ENEMY_COLOR = np.array([200, 200, 200, 255], np.uint8)
LASER_COLOR = np.array([255, 255, 255, 255], np.uint8)
UFO_COLOR = np.array([151, 25, 122, 255], np.uint8)


def _pack_np(c):
    c = np.asarray(c, np.uint32)
    return int(c[0] | (c[1] << 8) | (c[2] << 16) | (c[3] << 24))


def _unpack_u32(p):
    p = jnp.asarray(p, jnp.uint32)
    return jnp.stack([(p >> 0) & 0xFF, (p >> 8) & 0xFF,
                      (p >> 16) & 0xFF, (p >> 24) & 0xFF],
                     axis=-1).astype(U8)


# enemy formation band geometry: 6x6 cells of (ENEMY_DY, ENEMY_DX) px with
# the sprite occupying the top-left ENEMY_H x ENEMY_W of each cell
_BAND_H = N_ROWS * ENEMY_DY
_BAND_W = N_COLS * ENEMY_DX
_CELL_SPRITE = np.zeros((ENEMY_DY, ENEMY_DX), bool)
_CELL_SPRITE[:ENEMY_H, :ENEMY_W] = True
_BAND_SPRITE = np.tile(_CELL_SPRITE, (N_ROWS, N_COLS))
_PAD = 224  # canvas padding so the dynamic band paste never clips


def render(config: Config, state: State) -> jnp.ndarray:
    """RGBA frame composed in packed-u32 space with no scans and no
    per-pixel gathers (the breakout render lesson): the enemy formation is
    an upsampled 6x6 show-grid pasted with ONE dynamic_update_slice (all
    enemies share the march offset), shields paste their pixel masks the
    same way, and the remaining sprites are unrolled iota masks."""
    ys = jax.lax.broadcasted_iota(I32, (HEIGHT, WIDTH), 0)
    xs = jax.lax.broadcasted_iota(I32, (HEIGHT, WIDTH), 1)
    img = jnp.full((HEIGHT, WIDTH), _pack_np([0, 0, 0, 255]), jnp.uint32)

    def rect(im, x, y, w, h, packed, ok):
        m = ((xs >= x) & (xs < x + w) & (ys >= y) & (ys < y + h) & ok)
        return jnp.where(m, jnp.uint32(packed), im)

    # --- enemy formation: fused cell arithmetic --------------------------
    # all enemies share the march offset (enemy 0's position anchors the
    # 6x6 grid); the per-pixel cell lookup unrolls into 36 fused selects —
    # a vmapped dynamic_update_slice lowered to a scatter and cost ~10ms
    show = (state.enemy_alive
            | (state.enemy_death_counter >= 0)).reshape(N_ROWS, N_COLS)
    rel_x = xs - state.enemy_x[0]
    rel_y = ys - state.enemy_y[0]
    in_sprite = ((rel_x >= 0) & (rel_y >= 0)
                 & (rel_x < _BAND_W) & (rel_y < _BAND_H)
                 & (rel_x % ENEMY_DX < ENEMY_W)
                 & (rel_y % ENEMY_DY < ENEMY_H))
    cell_c = rel_x // ENEMY_DX
    cell_r = rel_y // ENEMY_DY
    alive_px = jnp.zeros((HEIGHT, WIDTH), bool)
    for r in range(N_ROWS):
        row_any = jnp.zeros((HEIGHT, WIDTH), bool)
        for c in range(N_COLS):
            row_any |= (cell_c == c) & show[r, c]
        alive_px |= (cell_r == r) & row_any
    img = jnp.where(in_sprite & alive_px,
                    jnp.uint32(_pack_np(ENEMY_COLOR)), img)

    # --- shields: static-position paste ----------------------------------
    sc = jnp.uint32(_pack_np(SHIELD_COLOR))
    canvas = jnp.zeros((HEIGHT, WIDTH), bool)
    for i, (sx_, sy_) in enumerate(config.shield_pos_static):
        canvas = canvas.at[sy_:sy_ + SHIELD_H,
                           sx_:sx_ + SHIELD_W].set(state.shield_alpha[i])
    img = jnp.where(canvas, sc, img)

    # --- remaining sprites: unrolled rect masks --------------------------
    img = rect(img, state.ufo_x, state.ufo_y, ENEMY_W, ENEMY_H,
               _pack_np(UFO_COLOR), state.ufo_appearance_counter == 0)
    img = rect(img, state.ship_x, state.ship_y, SHIP_W, SHIP_H,
               _pack_np(SHIP_COLOR),
               state.ship_alive | (state.ship_death_counter >= 0))
    lc = _pack_np(LASER_COLOR)
    img = rect(img, state.ship_laser_x, state.ship_laser_y,
               LASER_W, LASER_H, lc, state.ship_laser_alive)
    for i in range(MAX_ENEMY_LASERS):
        img = rect(img, state.elaser_x[i], state.elaser_y[i],
                   LASER_W, LASER_H, lc, state.elaser_alive[i])
    return _unpack_u32(img)


# ---------------------------------------------------------------------------
# JSON codec (live-schema keys; SURVEY.md §2.2)
# ---------------------------------------------------------------------------

_DIR_NAMES = ["Up", "Down", "Left", "Right"]


def _laser_json(x, y, t, movement, speed):
    return {
        "x": int(x), "y": int(y), "w": LASER_W, "h": LASER_H,
        "t": int(t), "movement": _DIR_NAMES[movement], "speed": speed,
        "color": {"r": 255, "g": 255, "b": 255, "a": 255},
    }


def state_to_json(config: Config, state: State) -> dict:
    enemies = []
    ex = np.asarray(state.enemy_x)
    ey = np.asarray(state.enemy_y)
    alive = np.asarray(state.enemy_alive)
    dc = np.asarray(state.enemy_death_counter)
    rs = np.asarray(config.row_scores)
    for i in range(N_ENEMIES):
        row, col = i // N_COLS, i % N_COLS
        enemies.append({
            "x": int(ex[i]), "y": int(ey[i]),
            "row": row, "col": col, "id": i,
            "alive": bool(alive[i]),
            "points": int(rs[row]),
            "death_counter": None if dc[i] < 0 else int(dc[i]),
        })
    shields = []
    sa = np.asarray(state.shield_alpha)
    sp = np.asarray(config.shield_pos_static)
    for s in range(sa.shape[0]):
        data = [[{"r": int(SHIELD_COLOR[0]), "g": int(SHIELD_COLOR[1]),
                  "b": int(SHIELD_COLOR[2]),
                  "a": 255 if sa[s, y, x] else 0}
                 for x in range(SHIELD_W)] for y in range(SHIELD_H)]
        shields.append({"x": int(sp[s, 0]), "y": int(sp[s, 1]), "data": data})
    sdc = int(state.ship_death_counter)
    udc = int(state.ufo_death_counter)
    elasers = []
    ea = np.asarray(state.elaser_alive)
    epx = np.asarray(state.elaser_x)
    epy = np.asarray(state.elaser_y)
    et = np.asarray(state.elaser_t)
    for i in range(MAX_ENEMY_LASERS):
        if ea[i]:
            elasers.append(_laser_json(epx[i], epy[i], et[i], DOWN_D,
                                       ENEMY_LASER_SPEED))
    return {
        "score": int(state.score),
        "lives": int(state.lives),
        "level": int(state.level),
        "rand": {"state": rng.to_u64_pair(state.rng)},
        "life_display_timer": int(state.life_display_timer),
        "enemy_shot_delay": int(state.enemy_shot_delay),
        "ship": {
            "x": int(state.ship_x), "y": int(state.ship_y),
            "w": SHIP_W, "h": SHIP_H, "speed": 3,
            "color": {"r": 35, "g": 129, "b": 59, "a": 255},
            "alive": bool(state.ship_alive),
            "death_counter": None if sdc < 0 else sdc,
            "death_hit_1": bool(state.ship_death_hit_1),
        },
        "ship_laser": (_laser_json(int(state.ship_laser_x),
                                   int(state.ship_laser_y),
                                   int(state.ship_laser_t), UP_D,
                                   SHIP_LASER_SPEED)
                       if bool(state.ship_laser_alive) else None),
        "enemy_lasers": elasers,
        "enemies": enemies,
        "enemies_movement": {
            "move_counter": int(state.move_counter),
            "move_dir": _DIR_NAMES[int(state.move_dir)],
            "visual_orientation": bool(state.visual_orientation),
        },
        "shields": shields,
        "ufo": {
            "x": int(state.ufo_x), "y": int(state.ufo_y),
            "appearance_counter": int(state.ufo_appearance_counter),
            "death_counter": None if udc < 0 else udc,
        },
    }


def state_from_json(config: Config, d: dict) -> State:
    st = new_game(config)
    ex = np.zeros(N_ENEMIES, np.int32)
    ey = np.zeros(N_ENEMIES, np.int32)
    alive = np.zeros(N_ENEMIES, bool)
    dc = np.full(N_ENEMIES, -1, np.int32)
    for e in d["enemies"]:
        i = int(e["id"])
        ex[i] = e["x"]
        ey[i] = e["y"]
        alive[i] = bool(e["alive"])
        if e.get("death_counter") is not None:
            dc[i] = int(e["death_counter"])
    nshields = len(d["shields"])
    sa = np.zeros((nshields, SHIELD_H, SHIELD_W), bool)
    for s in range(nshields):
        data = d["shields"][s]["data"]
        for y in range(min(SHIELD_H, len(data))):
            for x in range(min(SHIELD_W, len(data[y]))):
                sa[s, y, x] = data[y][x]["a"] > 0

    ea = np.zeros(MAX_ENEMY_LASERS, bool)
    epx = np.zeros(MAX_ENEMY_LASERS, np.int32)
    epy = np.zeros(MAX_ENEMY_LASERS, np.int32)
    et = np.zeros(MAX_ENEMY_LASERS, np.int32)
    for i, l in enumerate(d.get("enemy_lasers", [])[:MAX_ENEMY_LASERS]):
        ea[i] = True
        epx[i] = l["x"]
        epy[i] = l["y"]
        et[i] = l.get("t", 0)

    ship = d["ship"]
    mv = d.get("enemies_movement") or {"move_counter": 32, "move_dir": "Right",
                                       "visual_orientation": True}
    sl = d.get("ship_laser")
    ufo = d["ufo"]
    return st.replace(
        score=jnp.asarray(d["score"], I32),
        lives=jnp.asarray(d["lives"], I32),
        level=jnp.asarray(d.get("level", d.get("levels_completed", 0)), I32),
        rng=jnp.asarray(rng.from_u64_pair(d["rand"]["state"])),
        life_display_timer=jnp.asarray(d["life_display_timer"], I32),
        enemy_shot_delay=jnp.asarray(d["enemy_shot_delay"], I32),
        ship_x=jnp.asarray(ship["x"], I32),
        ship_y=jnp.asarray(ship["y"], I32),
        ship_alive=jnp.asarray(bool(ship["alive"]), BOOL),
        ship_death_counter=jnp.asarray(
            -1 if ship.get("death_counter") is None else ship["death_counter"],
            I32),
        ship_death_hit_1=jnp.asarray(bool(ship.get("death_hit_1", False)), BOOL),
        ship_laser_alive=jnp.asarray(sl is not None, BOOL),
        ship_laser_x=jnp.asarray(sl["x"] if sl else 0, I32),
        ship_laser_y=jnp.asarray(sl["y"] if sl else 0, I32),
        ship_laser_t=jnp.asarray(sl["t"] if sl else 0, I32),
        elaser_alive=jnp.asarray(ea),
        elaser_x=jnp.asarray(epx),
        elaser_y=jnp.asarray(epy),
        elaser_t=jnp.asarray(et),
        enemy_x=jnp.asarray(ex),
        enemy_y=jnp.asarray(ey),
        enemy_alive=jnp.asarray(alive),
        enemy_death_counter=jnp.asarray(dc),
        move_counter=jnp.asarray(mv["move_counter"], I32),
        move_dir=jnp.asarray(_DIR_NAMES.index(mv["move_dir"]), I32),
        visual_orientation=jnp.asarray(bool(mv["visual_orientation"]), BOOL),
        shield_alpha=jnp.asarray(sa),
        ufo_x=jnp.asarray(ufo["x"], I32),
        ufo_y=jnp.asarray(ufo["y"], I32),
        ufo_appearance_counter=jnp.asarray(ufo["appearance_counter"], I32),
        ufo_death_counter=jnp.asarray(
            -1 if ufo.get("death_counter") is None else ufo["death_counter"],
            I32),
    )


def schema() -> dict:
    return {
        "type": "object",
        "required": ["score", "lives", "level", "rand", "ship", "ship_laser",
                     "shields", "enemies", "enemies_movement", "enemy_lasers",
                     "enemy_shot_delay", "ufo", "life_display_timer"],
    }


def query(config: Config, state: State, name: str, args=None):
    if name == "shield_cell_count":
        return int(np.asarray(state.shield_alpha).sum())
    if name == "enemies_remaining":
        return int(np.asarray(state.enemy_alive).sum())
    if name == "ship_x":
        return int(state.ship_x)
    raise ValueError(f"unknown space_invaders query: {name}")


def lives(state: State):
    return state.lives


def score(state: State):
    return state.score
