"""Batched device-resident environments.

The reference scales env throughput with one OS process per env
(SubprocVecEnv / ShmemVecEnv, SURVEY.md §2.4). On TPU the entire vec-env
collapses into one jitted program: state is a stacked pytree with a leading
env axis, ``step`` is ``vmap(game.step)``, auto-reset is a masked select
(the worker auto-reset semantics of subproc_vec_env.py:12-15), and reward/
done mirror ToyboxBaseEnv.step (base.py:115-149: reward = max(score delta,
0), done = lives <= 0).

Two layers:
- functional: ``make_batched_env(...) -> BatchedEnvFns`` with pure
  ``reset(seeds)`` / ``step(state, actions)`` suitable for jit/scan/shard_map.
- stateful: ``BatchedEnv`` convenience wrapper that owns the state and
  jits the functions (the DummyVecEnv/SubprocVecEnv user surface).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from toybox_tpu.core import rng as _rng
from toybox_tpu.core.actions import ale_to_input
from toybox_tpu.games import get_game
from toybox_tpu.games.common import to_grayscale

I32 = jnp.int32
F32 = jnp.float32


@struct.dataclass
class EnvState:
    game: Any                 # stacked game state pytree [N, ...]
    prev_score: jnp.ndarray   # i32[N] score at previous step
    episode_return: jnp.ndarray  # f32[N]
    episode_length: jnp.ndarray  # i32[N]
    seeds: jnp.ndarray        # u32[N] per-env reseed counters for auto-reset


@dataclasses.dataclass(frozen=True)
class BatchedEnvFns:
    """Pure functions over EnvState. All jit/vmap/shard_map-safe."""
    game_name: str
    num_envs: int
    obs_mode: str
    reset: Callable  # (seeds u32[N]) -> (EnvState, obs)
    step: Callable   # (EnvState, actions i32[N]) -> (EnvState, obs, rew, done, info)
    obs_shape: tuple
    num_actions: int
    legal_actions: tuple
    # engine frames consumed per step() call (frameskip pipelines set >1 so
    # trainers can account timesteps without hardcoding a skip of 4)
    frames_per_step: int = 1
    # (tree, seeds, reseed=True) -> (state, obs): start every env from a
    # single-env game-state pytree (batched write_state_json analog)
    reset_to: Callable = None


def _make_obs_fn(module, obs_mode):
    if obs_mode == "none":
        return lambda config, game: jnp.zeros((0,), jnp.uint8), (0,)
    h, w = module.HEIGHT, module.WIDTH
    if obs_mode == "grayscale":
        def fn(config, game):
            return to_grayscale(module.render(config, game))
        return fn, (h, w, 1)
    if obs_mode == "rgba":
        return (lambda config, game: module.render(config, game)), (h, w, 4)
    if obs_mode == "rgb":
        return (lambda config, game: module.render(config, game)[..., :3]), (h, w, 3)
    raise ValueError(f"unknown obs_mode {obs_mode!r}")


def make_batched_env(game_name: str, num_envs: int, config=None,
                     obs_mode: str = "grayscale",
                     auto_reset: bool = True,
                     fast_auto_reset: bool = False) -> BatchedEnvFns:
    """fast_auto_reset: skip the auto-reset done-select on the game's
    STEP_CONSTANT_FIELDS (fields only new_game/interventions ever write).
    This keeps those leaves loop-invariant under scan — measured +28%
    breakout stepping — and is bit-exact UNLESS an intervention modified
    one of them mid-run (then a game-over reset keeps the intervened
    value instead of reverting to the default; reference new_game
    reverts). Training never intervenes, so the RL pipeline enables it;
    the default here keeps full reference semantics."""
    module = get_game(game_name)
    if config is None:
        config = module.default_config()
    const_fields = (frozenset(getattr(module, "STEP_CONSTANT_FIELDS", ()))
                    if fast_auto_reset else frozenset())
    obs_fn, obs_shape = _make_obs_fn(module, obs_mode)
    legal = tuple(module.LEGAL_ACTIONS)
    legal_arr = jnp.asarray(legal, I32)

    def new_games(seeds):
        return jax.vmap(lambda s: module.new_game(config, seed=s))(seeds)

    def _wrap(game, seeds):
        state = EnvState(
            game=game,
            prev_score=jax.vmap(module.score)(game).astype(I32),
            episode_return=jnp.zeros(num_envs, F32),
            episode_length=jnp.zeros(num_envs, I32),
            seeds=seeds,
        )
        obs = jax.vmap(obs_fn, in_axes=(None, 0))(config, game)
        return state, obs

    def reset(seeds):
        seeds = jnp.asarray(seeds, jnp.uint32)
        return _wrap(new_games(seeds), seeds)

    def reset_to(tree, seeds, reseed: bool = True):
        """Start every env from ``tree`` — a SINGLE env's game-state pytree
        (e.g. ``module.state_from_json(...)``: the batched analog of the
        reference's ``write_state_json``, used by the behavioral scenarios
        and state-checkpoint restore). With ``reseed`` (default) each env's
        engine rng is re-derived from its seed so stochastic branches
        decorrelate across the batch; ``reseed=False`` replays the stored
        rng bit-exactly in every env."""
        seeds = jnp.asarray(seeds, jnp.uint32)
        game = jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(
                jnp.asarray(x)[None], (num_envs,) + jnp.asarray(x).shape),
            tree)
        if reseed:
            game = game.replace(rng=jax.vmap(_rng.seed)(seeds))
        return _wrap(game, seeds)

    def step(state: EnvState, actions):
        """actions: i32[N] indices into the legal action set."""
        ale_actions = legal_arr[jnp.asarray(actions, I32)]
        inputs = ale_to_input(ale_actions)  # batched Input pytree
        game = jax.vmap(module.step, in_axes=(None, 0, 0))(config, state.game, inputs)

        score = jax.vmap(module.score)(game).astype(I32)
        lives = jax.vmap(module.lives)(game).astype(I32)
        reward = jnp.maximum(score - state.prev_score, 0).astype(F32)
        done = lives <= 0

        ep_ret = state.episode_return + reward
        ep_len = state.episode_length + 1

        if auto_reset:
            # reseed deterministically per episode: mix env seed + episode count
            new_seeds = state.seeds * jnp.uint32(2654435761) + jnp.uint32(num_envs)
            fresh = new_games(jnp.where(done, new_seeds, state.seeds))
            game = game.replace(**{
                f.name: jnp.where(
                    done.reshape(
                        done.shape + (1,) * (getattr(fresh, f.name).ndim
                                             - 1)),
                    getattr(fresh, f.name), getattr(game, f.name))
                for f in dataclasses.fields(game)
                if f.name not in const_fields})
            seeds = jnp.where(done, new_seeds, state.seeds)
            score_after = jnp.where(done, jax.vmap(module.score)(game).astype(I32),
                                    score)
        else:
            seeds = state.seeds
            score_after = score

        info = {
            "lives": lives,
            "score": jnp.where(done, 0, score),
            "episode_return": jnp.where(done, ep_ret, jnp.nan),
            "episode_length": jnp.where(done, ep_len, 0),
        }
        new_state = EnvState(
            game=game,
            prev_score=score_after,
            episode_return=jnp.where(done, 0.0, ep_ret),
            episode_length=jnp.where(done, 0, ep_len),
            seeds=seeds,
        )
        obs = jax.vmap(obs_fn, in_axes=(None, 0))(config, game)
        return new_state, obs, reward, done, info

    return BatchedEnvFns(
        game_name=game_name, num_envs=num_envs, obs_mode=obs_mode,
        reset=reset, step=step, obs_shape=obs_shape,
        num_actions=len(legal), legal_actions=legal, reset_to=reset_to)


class BatchedEnv:
    """Stateful convenience wrapper (the VecEnv user surface).

    reset() -> obs[N, ...]; step(actions) -> (obs, rew, done, info).
    """

    def __init__(self, game_name: str, num_envs: int, config=None,
                 obs_mode: str = "grayscale", auto_reset: bool = True,
                 seed: int = 0):
        self.fns = make_batched_env(game_name, num_envs, config=config,
                                    obs_mode=obs_mode, auto_reset=auto_reset)
        self.num_envs = num_envs
        self._reset = jax.jit(self.fns.reset)
        self._step = jax.jit(self.fns.step)
        self._seed = seed
        self.state = None

    @property
    def num_actions(self):
        return self.fns.num_actions

    def reset(self, seed: int | None = None):
        if seed is not None:
            self._seed = seed
        seeds = (np.uint32(self._seed) +
                 np.arange(self.num_envs, dtype=np.uint32))
        self.state, obs = self._reset(jnp.asarray(seeds))
        return obs

    def step(self, actions):
        self.state, obs, rew, done, info = self._step(self.state, jnp.asarray(actions))
        return obs, rew, done, info
