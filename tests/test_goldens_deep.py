"""Deep behavioral goldens: scripted trajectories that provably reach the
hard-to-hit dynamics regions the 200-step goldens never touch
(VERDICT round 1, item 4):

- amidar (x2 seeds): jump mode entered, a triggers_chase box completed
  (chase mode), an enemy caught during chase;
- breakout: simultaneous multi-ball play and a LEVEL CLEAR (bricks
  respawn, level increments) from a doctored 3-brick start state;
- space_invaders: shield erosion by the ship's own laser, UFO spawn
  (appearance_counter 500 -> 0) and a UFO kill (+100).

Each golden freezes (seed, optional doctored start state, the full
action script, periodic state digests, event step indices). The
generator plays a state-READING controller once —
``python -m tests.test_goldens_deep`` — then the tests replay the
frozen action script blind and assert digests + events, so any change
to dynamics, RNG draw order, or the codec in these regions trips them.

Also here: the facade-vs-batched differential test (same seed + same
action script through ctoybox.Toybox and make_batched_env must produce
identical state JSON), mirroring the reference's vec-env consistency
tests (reference baselines/common/vec_env/test_vec_env.py).
"""

import json
import os
from collections import deque

import pytest

from tests.test_goldens import _digest

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")
CHECK_EVERY = 250
MIN_STEPS = 2050  # VERDICT item 4: 2000+-step scripted trajectories

# ALE actions
NOOP, FIRE, UP, RIGHT, LEFT, DOWN = 0, 1, 2, 3, 4, 5


# ---------------------------------------------------------------------------
# Shared replay/record plumbing
# ---------------------------------------------------------------------------

def _replay(game, seed, actions, start_state=None):
    """Apply a frozen action script; return {digests, score, lives}."""
    from toybox_tpu import Toybox

    tb = Toybox(game, seed=seed)
    if start_state is not None:
        tb.write_state_json(start_state)
    digests = {}
    for i, a in enumerate(actions):
        tb.apply_ale_action(a)
        if (i + 1) % CHECK_EVERY == 0:
            digests[str(i + 1)] = _digest(tb.to_state_json())
    return {"digests": digests, "score": tb.get_score(),
            "lives": tb.get_lives()}


def _record(game, seed, controller, start_state=None, max_steps=6000):
    """Run a state-reading controller until it declares itself done;
    freeze the actions it took plus the events it observed."""
    from toybox_tpu import Toybox

    tb = Toybox(game, seed=seed)
    if start_state is not None:
        tb.write_state_json(start_state)
    actions, events = [], {}
    for t in range(max_steps):
        js = tb.to_state_json()
        a, done = controller(t, js, events)
        if done:
            break
        tb.apply_ale_action(a)
        actions.append(a)
    golden = {"game": game, "seed": seed, "actions": actions,
              "events": events}
    if start_state is not None:
        golden["start_state"] = start_state
    golden.update(_replay(game, seed, actions, start_state))
    return golden


# ---------------------------------------------------------------------------
# Amidar: BFS track-walker that paints a triggers_chase box
# ---------------------------------------------------------------------------

def _amidar_controller():
    """Walk the track toward the nearest unpainted tile of a chase box
    (BFS over the board graph each frame), jumping (FIRE) when an enemy
    is adjacent; once chase mode starts, hunt the nearest enemy."""
    state = {"last_score": 0}

    def bfs_dir(tiles, src, targets):
        """First step direction from src toward the nearest target tile."""
        h, w = len(tiles), len(tiles[0])
        if src in targets:
            return None
        seen = {src}
        q = deque([(src, None)])
        while q:
            (tx, ty), first = q.popleft()
            for dtx, dty, d in ((0, -1, UP), (1, 0, RIGHT),
                                (-1, 0, LEFT), (0, 1, DOWN)):
                nxt = (tx + dtx, ty + dty)
                nx, ny = nxt
                if not (0 <= nx < w and 0 <= ny < h):
                    continue
                if tiles[ny][nx] == "Empty" or nxt in seen:
                    continue
                f = first if first is not None else d
                if nxt in targets:
                    return f
                seen.add(nxt)
                q.append((nxt, f))
        return None

    def controller(t, js, events):
        tiles = js["board"]["tiles"]
        px, py = js["player"]["position"]["x"], js["player"]["position"]["y"]
        ptile = (px // 64, py // 80)

        if js["jump_timer"] > 0:
            events.setdefault("jump_at", t)
        if js["chase_timer"] > 0:
            events.setdefault("chase_at", t)
        if (js["score"] - state["last_score"] >= 100
                and "chase_at" in events):
            events.setdefault("caught_at", t)
        state["last_score"] = js["score"]

        if "caught_at" in events and t >= MIN_STEPS:
            return NOOP, True          # captured everything we came for

        # jump when an enemy is about to touch (also pins jump mode)
        if js["jump_timer"] == 0 and js["chase_timer"] == 0 and js["jumps"] > 0:
            for e in js["enemies"]:
                ex, ey = e["position"]["x"], e["position"]["y"]
                if abs(ex - px) < 96 and abs(ey - py) < 120:
                    return FIRE, False

        if js["chase_timer"] > 0:
            # hunt the nearest enemy
            targets = {(e["position"]["x"] // 64, e["position"]["y"] // 80)
                       for e in js["enemies"]}
        else:
            # paint the nearest unpainted perimeter tile of a chase box;
            # once the chase boxes are done, keep painting the rest of the
            # board so the long tail of the script is real play
            targets = set()
            for b in js["board"]["boxes"]:
                if not b["triggers_chase"] or b["painted"]:
                    continue
                tl, br = b["top_left"], b["bottom_right"]
                for tx in range(tl["tx"], br["tx"] + 1):
                    for ty in range(tl["ty"], br["ty"] + 1):
                        if (tx in (tl["tx"], br["tx"])
                                or ty in (tl["ty"], br["ty"])):
                            if tiles[ty][tx] in ("Unpainted", "ChaseMarker"):
                                targets.add((tx, ty))
            if not targets:
                targets = {(tx, ty)
                           for ty, row in enumerate(tiles)
                           for tx, tag in enumerate(row)
                           if tag in ("Unpainted", "ChaseMarker")}
        if not targets:
            return NOOP, False
        d = bfs_dir(tiles, ptile, targets)
        return (d if d is not None else NOOP), False

    return controller


def _amidar_random_start_state(tb):
    """Doctor the fresh state: switch three enemies to EnemyRandomMvmt so
    the trajectory consumes per-junction RNG draws — the all-LookupAI
    default board never touches the RNG, so without this the two amidar
    seeds would replay identically (protocol surface: reference
    toybox/interventions/amidar.py:421-448)."""
    js = tb.to_state_json()
    for i in (1, 2, 3):
        e = js["enemies"][i]
        start = {"tx": e["position"]["x"] // 64,
                 "ty": e["position"]["y"] // 80}
        e["ai"] = {"EnemyRandomMvmt":
                   {"start": start, "start_dir": "Up", "dir": "Up"}}
        e["step"] = None
    return js


# ---------------------------------------------------------------------------
# Breakout: multi-ball + level clear from a doctored 3-brick state
# ---------------------------------------------------------------------------

def _breakout_start_state(tb):
    """Doctor the fresh state: only 3 bricks of the bottom row alive,
    TWO live balls (multi-ball, reference
    test/interventions/test_breakout_interventions.py:91-105)."""
    js = tb.to_state_json()
    for b in js["bricks"]:
        b["alive"] = b["row"] == 5 and b["col"] in (4, 9, 14)
    js["balls"] = [
        {"position": {"x": 60.0, "y": 90.0},
         "velocity": {"x": 1.7320507764816284, "y": -1.0}},
        {"position": {"x": 180.0, "y": 100.0},
         "velocity": {"x": -1.7320507764816284, "y": 1.0}},
    ]
    js["is_dead"] = False
    js["reset"] = False
    return js


def _breakout_controller():
    state = {"level0": None}

    def controller(t, js, events):
        if state["level0"] is None:
            state["level0"] = js["level"]
        balls = js["balls"]
        if len(balls) >= 2:
            events.setdefault("multi_ball_at", t)
        if js["level"] > state["level0"]:
            events.setdefault("level_clear_at", t)
        if "level_clear_at" in events and t >= MIN_STEPS:
            return NOOP, True
        if js["reset"] or not balls:
            return FIRE, False
        # follow the lowest ball, with a slowly-varying aim offset so the
        # discrete-segment paddle reflection cycles through angles
        ball = max(balls, key=lambda b: b["position"]["y"])
        target = ball["position"]["x"] + (((t // 90) % 5) - 2) * 5
        pad = js["paddle"]["position"]["x"]
        if pad < target - 2:
            return RIGHT, False
        if pad > target + 2:
            return LEFT, False
        return NOOP, False

    return controller


# ---------------------------------------------------------------------------
# Space Invaders: shield erosion, UFO spawn + kill
# ---------------------------------------------------------------------------

def _si_controller():
    state = {"alpha0": None, "phase": "shield"}

    def shield_alpha_sum(js):
        return sum(px["a"] > 0 for sh in js["shields"]
                   for row in sh["data"] for px in row)

    def controller(t, js, events):
        ship = js["ship"]
        if state["alpha0"] is None:
            state["alpha0"] = shield_alpha_sum(js)
        if shield_alpha_sum(js) < state["alpha0"]:
            events.setdefault("shield_eroded_at", t)
            state["phase"] = "ufo"
        ufo = js["ufo"]
        if ufo["appearance_counter"] == 0:
            events.setdefault("ufo_spawned_at", t)
        if ufo["death_counter"] is not None:
            events.setdefault("ufo_killed_at", t)
        if "ufo_killed_at" in events and t >= MIN_STEPS:
            return NOOP, True
        if not ship["alive"]:
            return NOOP, False

        # dodge incoming enemy lasers (keeps the long script alive)
        for lz in js["enemy_lasers"]:
            if lz["y"] > 120 and abs(lz["x"] - (ship["x"] + 8)) < 14:
                return (LEFT if lz["x"] >= ship["x"] + 8 else RIGHT), False

        if state["phase"] == "shield":
            # stand under shield 0 and shoot it from below
            target = 84 + 8 - ship["w"] // 2
            if ship["x"] < target - 1:
                return RIGHT, False
            if ship["x"] > target + 1:
                return LEFT, False
            return FIRE, False

        # UFO phase: park right of the shields, lead the shot.
        # laser: spawns at (ship_x+8, 177), flies up 6/frame; UFO: 16x10
        # box at y=12 moving +2/frame -> intercept lead ~= 2*(177-22)/6
        if ufo["appearance_counter"] != 0:
            target = 260
        else:
            lead = 2 * (ship["y"] - 8 - (ufo["y"] + 10)) // 6
            target = ufo["x"] + lead + 8 - 8   # laser_x == ufo center
        if ship["x"] < target - 2:
            return RIGHT, False
        if ship["x"] > target + 2:
            return LEFT, False
        if (ufo["appearance_counter"] == 0
                and js["ship_laser"] is None):
            return FIRE, False
        return NOOP, False

    return controller


# ---------------------------------------------------------------------------
# Intervention-perturbed start states (VERDICT round-4 item 7): the state
# doctoring goes through the INTERVENTION API (ctx-manager write-back,
# reference toybox/interventions/base.py:398-408), so these goldens pin
# the write-then-step path the white-box experiments depend on.
# ---------------------------------------------------------------------------

def _breakout_iv_start_state(tb):
    """3 bricks left + paddle shrunk, via BreakoutIntervention."""
    from toybox_tpu.interventions.breakout import BreakoutIntervention

    with BreakoutIntervention(tb) as iv:
        for i, brick in enumerate(iv.game.bricks):
            brick.alive = brick.row == 5 and brick.col in (4, 9, 14)
    return tb.to_state_json()


def _amidar_iv_start_state(tb):
    """3 enemies switched to EnemyRandomMvmt via set_enemy_protocol (the
    intervention-API form of _amidar_random_start_state)."""
    from toybox_tpu.interventions.amidar import (AmidarIntervention,
                                                 Direction, MovementAI,
                                                 TilePoint)

    with AmidarIntervention(tb) as iv:
        for i in (1, 2, 3):
            e = iv.game.enemies[i]
            iv.set_enemy_protocol(
                e, MovementAI.EnemyRandomMvmt,
                start=TilePoint(iv, tx=int(e.position.x) // 64,
                                ty=int(e.position.y) // 80),
                start_dir=Direction(iv, "Up"),
                dir=Direction(iv, "Up"))
    return tb.to_state_json()


def _si_iv_start_state(tb):
    """Top half of shield 0 pre-eroded via SpaceInvadersIntervention."""
    from toybox_tpu.interventions.space_invaders import \
        SpaceInvadersIntervention

    with SpaceInvadersIntervention(tb) as iv:
        shield = iv.game.shields[0]
        for ri, row in enumerate(shield.data):
            if ri < len(shield.data) // 2:
                for px in row:
                    px.a = 0
    return tb.to_state_json()


# ---------------------------------------------------------------------------
# Golden specs
# ---------------------------------------------------------------------------

def _specs():
    return [
        # --- amidar: 3 seeds + 1 intervention-perturbed ---
        ("amidar_deep_s1234", "amidar", 1234, _amidar_controller, None,
         ("jump_at", "chase_at", "caught_at")),
        ("amidar_deep_s77", "amidar", 77, _amidar_controller,
         _amidar_random_start_state,
         ("jump_at", "chase_at", "caught_at")),
        ("amidar_deep_s9001", "amidar", 9001, _amidar_controller,
         _amidar_random_start_state,
         ("jump_at", "chase_at", "caught_at")),
        ("amidar_deep_iv", "amidar", 424242, _amidar_controller,
         _amidar_iv_start_state,
         ("jump_at", "chase_at", "caught_at")),
        # --- breakout: 3 seeds + 1 intervention-perturbed ---
        ("breakout_deep_s1234", "breakout", 1234, _breakout_controller,
         _breakout_start_state, ("multi_ball_at", "level_clear_at")),
        ("breakout_deep_s77", "breakout", 77, _breakout_controller,
         _breakout_start_state, ("multi_ball_at", "level_clear_at")),
        ("breakout_deep_s9001", "breakout", 9001, _breakout_controller,
         _breakout_start_state, ("multi_ball_at", "level_clear_at")),
        ("breakout_deep_iv", "breakout", 424242, _breakout_controller,
         _breakout_iv_start_state, ("level_clear_at",)),
        # --- space invaders: 3 seeds + 1 intervention-perturbed ---
        ("space_invaders_deep_s1234", "space_invaders", 1234,
         _si_controller, None,
         ("shield_eroded_at", "ufo_spawned_at", "ufo_killed_at")),
        ("space_invaders_deep_s77", "space_invaders", 77,
         _si_controller, None,
         ("shield_eroded_at", "ufo_spawned_at", "ufo_killed_at")),
        ("space_invaders_deep_s9001", "space_invaders", 9001,
         _si_controller, None,
         ("shield_eroded_at", "ufo_spawned_at", "ufo_killed_at")),
        ("space_invaders_deep_iv", "space_invaders", 424242,
         _si_controller, _si_iv_start_state,
         ("shield_eroded_at", "ufo_spawned_at", "ufo_killed_at")),
    ]


@pytest.mark.parametrize("name", [s[0] for s in _specs()])
def test_deep_golden(name):
    spec = next(s for s in _specs() if s[0] == name)
    _, game, seed, _, _, required_events = spec
    path = os.path.join(GOLDEN_DIR, f"{name}.json")
    assert os.path.exists(path), (
        f"deep golden missing; regenerate with "
        f"python -m tests.test_goldens_deep")
    expected = json.load(open(path))
    assert len(expected["actions"]) >= 1000
    for ev in required_events:
        assert ev in expected["events"], f"{name}: event {ev} never reached"
    actual = _replay(game, seed, expected["actions"],
                     expected.get("start_state"))
    assert actual["digests"] == expected["digests"], (
        f"{name} diverged from golden; if the dynamics change was "
        f"intentional, regenerate via python -m tests.test_goldens_deep")
    assert actual["score"] == expected["score"]
    assert actual["lives"] == expected["lives"]


def test_facade_matches_batched_env():
    """Same seed + same frozen action script through the single-env
    facade and the vmapped batched env must produce identical state
    JSON (the reference's Dummy == Subproc == Shmem consistency bar,
    baselines/common/vec_env/test_vec_env.py)."""
    import jax
    import jax.numpy as jnp

    from toybox_tpu import Toybox
    from toybox_tpu.envs.batched import make_batched_env
    from toybox_tpu.games import get_game

    path = os.path.join(GOLDEN_DIR, "amidar_deep_s1234.json")
    if not os.path.exists(path):
        pytest.skip("deep golden not generated yet")
    golden = json.load(open(path))
    seed, actions = golden["seed"], golden["actions"][:400]

    tb = Toybox("amidar", seed=seed)
    fns = make_batched_env("amidar", 2, auto_reset=False, obs_mode="none")
    # env 0 carries the golden seed; env 1 is a decoy with another seed
    bstate, _ = jax.jit(fns.reset)(jnp.asarray([seed, seed + 1],
                                               dtype=jnp.uint32))
    module = get_game("amidar")

    for i, a in enumerate(actions):
        tb.apply_ale_action(a)
        bstate, _, _, _, _ = fns.step(
            bstate, jnp.asarray([a, a], dtype=jnp.int32))
        if (i + 1) % 100 == 0:
            sliced = jax.tree_util.tree_map(lambda x: x[0], bstate.game)
            js_b = module.state_to_json(fns.config, sliced) \
                if hasattr(fns, "config") else None
            if js_b is None:
                cfg = module.default_config()
                js_b = module.state_to_json(cfg, sliced)
            assert _digest(js_b) == _digest(tb.to_state_json()), (
                f"facade/batched divergence at step {i + 1}")


def regenerate(only=None):
    """Regenerate all deep goldens, or just the names in ``only`` (or the
    missing ones with only='missing')."""
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    from toybox_tpu import Toybox

    for name, game, seed, make_ctrl, make_start, required in _specs():
        if only == "missing" and os.path.exists(
                os.path.join(GOLDEN_DIR, f"{name}.json")):
            continue
        if isinstance(only, (list, set)) and name not in only:
            continue
        start = None
        if make_start is not None:
            start = make_start(Toybox(game, seed=seed))
        golden = _record(game, seed, make_ctrl(), start_state=start)
        missing = [ev for ev in required if ev not in golden["events"]]
        if missing:
            raise SystemExit(
                f"{name}: controller never reached {missing} "
                f"(events so far: {golden['events']})")
        path = os.path.join(GOLDEN_DIR, f"{name}.json")
        with open(path, "w") as f:
            json.dump(golden, f, sort_keys=True)
        print(f"wrote {path}: {len(golden['actions'])} steps, "
              f"events={golden['events']}, score={golden['score']}")


if __name__ == "__main__":
    # The JAX_PLATFORMS env var is overridden by the axon sitecustomize;
    # force CPU the supported way (same as tests/conftest.py).
    import sys

    import jax

    jax.config.update("jax_platforms", "cpu")
    regenerate(("missing" if sys.argv[1:] == ["--missing"]
                else sys.argv[1:] or None))
