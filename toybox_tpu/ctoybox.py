"""Drop-in replacement for the ``ctoybox`` FFI package, backed by JAX.

The reference ships Rust engines behind ``from ctoybox import Toybox,
Simulator, State, Input`` (reference toybox/__init__.py:1-2). Here the same
surface wraps the pure-JAX engines: the "FFI boundary" disappears — state
lives as a device pytree, JSON codecs run on host only when asked.

This is the *interactive single-env* layer (used by interventions, tests,
human play). The high-throughput path is toybox_tpu.envs.batched.

API contract sources: toybox/envs/atari/base.py (get_state, apply_ale_action,
set_seed two-stage use, get_width/height, save_frame_image),
scripts/utils/test_games.py:18-78 (JSON round-trips), and
baselines/baselines/run_get_seed_state.py:266-270 (rstate native queries).
"""

from __future__ import annotations

import json as _json
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from toybox_tpu.core.actions import LEGAL_ACTIONS, ale_to_input
from toybox_tpu.core.types import Input
from toybox_tpu.games import get_game
from toybox_tpu.games.common import to_grayscale

__all__ = ["Toybox", "Simulator", "State", "Input"]


class Simulator:
    """Game factory + config holder (mirror of ctoybox.Simulator)."""

    def __init__(self, game_name: str, config=None):
        self.game_name = game_name
        self.module = get_game(game_name)
        self.config = config if config is not None else self.module.default_config()
        # jit once per (game, shapes); cached on the module's functions
        self._step = jax.jit(self.module.step)
        self._render = jax.jit(self.module.render)
        self._new_game = jax.jit(self.module.new_game)

    def new_game(self) -> "State":
        return State(self, self._new_game(self.config))

    def config_to_json(self) -> dict:
        return self.module.config_to_json(self.config)

    def schema_for_state(self) -> dict:
        return self.module.schema()


class State:
    """Raw state handle (mirror of ctoybox.State / tb.rstate).

    Native predicate queries appear as methods named
    ``{game}_{query}`` — e.g. ``breakout_bricks_remaining()`` — matching the
    reference's rstate surface (run_get_seed_state.py:266,270).
    """

    def __init__(self, simulator: Simulator, tree):
        self._sim = simulator
        self.tree = tree

    def to_json(self) -> dict:
        return self._sim.module.state_to_json(self._sim.config, self.tree)

    def __getattr__(self, name):
        prefix = self._sim.game_name + "_"
        if name.startswith(prefix):
            qname = name[len(prefix):]
            return partial(self._sim.module.query, self._sim.config, self.tree, qname)
        raise AttributeError(name)


class Toybox:
    """Mirror of ctoybox.Toybox (owns a Simulator and live State)."""

    def __init__(self, game_name: str, grayscale: bool = True, frameskip: int = 0,
                 seed=None, withstate: dict | None = None):
        self.game_name = game_name
        self.frames_per_action = frameskip + 1
        self.grayscale = grayscale
        self.rsimulator = Simulator(game_name)
        if seed is not None:
            self.set_seed(seed)
        self.rstate = self.rsimulator.new_game()
        if withstate is not None:
            self.write_state_json(withstate)

    # -- lifecycle ---------------------------------------------------------
    def new_game(self) -> None:
        self.rstate = self.rsimulator.new_game()

    def set_seed(self, seed: int) -> None:
        """Re-seed the config RNG (consumed by the next new_game)."""
        from toybox_tpu.core import rng as _rng
        cfg = self.rsimulator.config
        if hasattr(cfg, "rand"):
            self.rsimulator.config = cfg.replace(rand=_rng.seed(jnp.uint32(seed)))

    def close(self) -> None:
        self.rstate = None

    def __enter__(self):
        return self

    def __exit__(self, exc_type, exc_value, traceback):
        self.close()

    def __del__(self):
        pass

    # -- stepping ----------------------------------------------------------
    def apply_action(self, action_input: Input) -> None:
        inp = action_input.as_arrays() if isinstance(action_input, Input) else action_input
        tree = self.rstate.tree
        for _ in range(self.frames_per_action):
            tree = self.rsimulator._step(self.rsimulator.config, tree, inp)
        self.rstate = State(self.rsimulator, tree)

    def apply_ale_action(self, action_int: int) -> None:
        self.apply_action(ale_to_input(int(action_int)))

    # -- observation -------------------------------------------------------
    def get_rgba_frame(self) -> np.ndarray:
        img = self.rsimulator._render(self.rsimulator.config, self.rstate.tree)
        return np.asarray(img)

    def get_rgb_frame(self) -> np.ndarray:
        return self.get_rgba_frame()[:, :, :3]

    def get_state(self) -> np.ndarray:
        """Framebuffer as uint8 HxWxC; grayscale (1ch) or RGBA (4ch).

        Mirrors reference toybox/envs/atari/base.py:108-113.
        """
        img = self.rsimulator._render(self.rsimulator.config, self.rstate.tree)
        if self.grayscale:
            return np.asarray(to_grayscale(img))
        return np.asarray(img)

    def get_height(self) -> int:
        return self.rsimulator.module.HEIGHT

    def get_width(self) -> int:
        return self.rsimulator.module.WIDTH

    def save_frame_image(self, path: str, grayscale: bool | None = None) -> None:
        from PIL import Image
        gs = self.grayscale if grayscale is None else grayscale
        frame = self.get_state() if gs else self.get_rgba_frame()
        if frame.shape[-1] == 1:
            Image.fromarray(frame[:, :, 0], mode="L").save(path)
        else:
            Image.fromarray(frame, mode="RGBA").save(path)

    # -- score / lives -----------------------------------------------------
    def get_score(self) -> int:
        return int(self.rsimulator.module.score(self.rstate.tree))

    def get_lives(self) -> int:
        return int(self.rsimulator.module.lives(self.rstate.tree))

    def get_level(self) -> int:
        tree = self.rstate.tree
        return int(getattr(tree, "level", 0))

    def game_over(self) -> bool:
        return self.get_lives() <= 0

    # -- JSON state/config boundary ----------------------------------------
    def to_state_json(self) -> dict:
        return self.rstate.to_json()

    def write_state_json(self, js: dict) -> None:
        if isinstance(js, str):
            js = _json.loads(js)
        tree = self.rsimulator.module.state_from_json(self.rsimulator.config, js)
        self.rstate = State(self.rsimulator, tree)

    def config_to_json(self) -> dict:
        return self.rsimulator.config_to_json()

    def write_config_json(self, config_js: dict) -> None:
        if isinstance(config_js, str):
            config_js = _json.loads(config_js)
        self.rsimulator.config = self.rsimulator.module.config_from_json(config_js)

    def schema_for_state(self) -> dict:
        return self.rsimulator.schema_for_state()

    def schema_for_config(self) -> dict:
        mod = self.rsimulator.module
        if hasattr(mod, "config_schema"):
            return mod.config_schema()
        return {"type": "object",
                "required": sorted(self.config_to_json().keys())}

    def query_state_json(self, query: str, args="null"):
        if isinstance(args, str):
            args = _json.loads(args)
        return self.rsimulator.module.query(
            self.rsimulator.config, self.rstate.tree, query, args)

    def get_legal_action_set(self) -> list:
        return list(LEGAL_ACTIONS[self.game_name])
