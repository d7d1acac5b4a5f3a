"""Fake-env fixtures for algorithm tests — jax-batched ports of the
reference's baselines/common/tests/envs (IdentityEnv / DiscreteIdentityEnv
/ BoxIdentityEnv, FixedSequenceEnv): tiny seeded tasks whose optimal
return is known, used as learning-capability smoke tests
(reference test_identity.py / test_fixed_sequence.py).

Each follows the BatchedEnvFns protocol (reset/step over a stacked state
pytree whose ``frames`` field is the observation) so every algorithm in
toybox_tpu.rl plugs in unchanged.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import struct

from toybox_tpu.envs.batched import BatchedEnvFns

F32 = jnp.float32
I32 = jnp.int32


@struct.dataclass
class IdentityState:
    frames: jnp.ndarray     # the current target observation [N, dim]
    target: jnp.ndarray     # i32[N] the correct action
    t: jnp.ndarray          # i32[N] steps into the episode
    key: jnp.ndarray


def make_discrete_identity_env(num_envs: int, dim: int = 10,
                               episode_len: int = 100):
    """Reward 1 iff action == the observed one-hot index."""

    def _new_target(key):
        key, sub = jax.random.split(key)
        target = jax.random.randint(sub, (num_envs,), 0, dim)
        frames = jax.nn.one_hot(target, dim, dtype=F32)
        return key, target, frames

    def reset(seeds):
        key = jax.random.PRNGKey(jnp.asarray(seeds).sum().astype(jnp.int32))
        key, target, frames = _new_target(key)
        st = IdentityState(frames=frames, target=target,
                           t=jnp.zeros(num_envs, I32), key=key)
        return st, frames

    def step(state, actions):
        reward = (jnp.asarray(actions, I32) == state.target).astype(F32)
        key, target, frames = _new_target(state.key)
        t = state.t + 1
        done = t >= episode_len
        t = jnp.where(done, 0, t)
        st = IdentityState(frames=frames, target=target, t=t, key=key)
        info = {"lives": jnp.ones(num_envs, I32),
                "score": jnp.zeros(num_envs, I32),
                "episode_return": jnp.where(done, t.astype(F32), jnp.nan),
                "episode_length": jnp.where(done, episode_len, 0),
                "raw_reward": reward}
        return st, frames, reward, done, info

    return BatchedEnvFns(game_name="discrete_identity", num_envs=num_envs,
                         obs_mode="vector", reset=reset, step=step,
                         obs_shape=(dim,), num_actions=dim,
                         legal_actions=tuple(range(dim)))


@struct.dataclass
class BoxIdentityState:
    frames: jnp.ndarray
    target: jnp.ndarray
    t: jnp.ndarray
    key: jnp.ndarray


def make_box_identity_env(num_envs: int, dim: int = 2,
                          episode_len: int = 50):
    """Continuous control fixture: reward = -||action - obs||^2
    (the reference BoxIdentityEnv contract)."""

    def _new(key):
        key, sub = jax.random.split(key)
        target = jax.random.uniform(sub, (num_envs, dim), F32, -1.0, 1.0)
        return key, target

    def reset(seeds):
        key = jax.random.PRNGKey(jnp.asarray(seeds).sum().astype(jnp.int32))
        key, target = _new(key)
        st = BoxIdentityState(frames=target, target=target,
                              t=jnp.zeros(num_envs, I32), key=key)
        return st, target

    def step(state, actions):
        err = jnp.sum((jnp.asarray(actions, F32) - state.target) ** 2,
                      axis=-1)
        reward = -err
        key, target = _new(state.key)
        t = state.t + 1
        done = t >= episode_len
        t = jnp.where(done, 0, t)
        st = BoxIdentityState(frames=target, target=target, t=t, key=key)
        info = {"lives": jnp.ones(num_envs, I32),
                "score": jnp.zeros(num_envs, I32),
                "episode_return": jnp.where(done, 0.0, jnp.nan),
                "episode_length": jnp.where(done, episode_len, 0),
                "raw_reward": reward}
        return st, target, reward, done, info

    class _BoxSpace:
        shape = (dim,)
        low = -1.0
        high = 1.0
        __name__ = "Box"

    env = BatchedEnvFns(game_name="box_identity", num_envs=num_envs,
                        obs_mode="vector", reset=reset, step=step,
                        obs_shape=(dim,), num_actions=dim,
                        legal_actions=())
    return env


@struct.dataclass
class FixedSeqState:
    frames: jnp.ndarray
    t: jnp.ndarray
    key: jnp.ndarray


def make_fixed_sequence_env(num_envs: int, n_actions: int = 10,
                            episode_len: int = 100, seed: int = 0):
    """Reward 1 for emitting the fixed (seeded) action at each step —
    a memorization task (reference fixed_sequence_env.py:6-22)."""
    seq = jax.random.randint(jax.random.PRNGKey(seed), (episode_len,), 0,
                             n_actions)

    def reset(seeds):
        frames = jnp.zeros((num_envs, 1), F32)
        st = FixedSeqState(frames=frames, t=jnp.zeros(num_envs, I32),
                           key=jax.random.PRNGKey(0))
        return st, frames

    def step(state, actions):
        correct = seq[jnp.clip(state.t, 0, episode_len - 1)]
        reward = (jnp.asarray(actions, I32) == correct).astype(F32)
        t = state.t + 1
        done = t >= episode_len
        t = jnp.where(done, 0, t)
        frames = t.astype(F32)[:, None] / episode_len
        st = FixedSeqState(frames=frames, t=t, key=state.key)
        info = {"lives": jnp.ones(num_envs, I32),
                "score": jnp.zeros(num_envs, I32),
                "episode_return": jnp.where(done, 0.0, jnp.nan),
                "episode_length": jnp.where(done, episode_len, 0),
                "raw_reward": reward}
        return st, frames, reward, done, info

    return BatchedEnvFns(game_name="fixed_sequence", num_envs=num_envs,
                         obs_mode="vector", reset=reset, step=step,
                         obs_shape=(1,), num_actions=n_actions,
                         legal_actions=tuple(range(n_actions)))


@struct.dataclass
class ImageClassState:
    frames: jnp.ndarray     # u8[N, H, W, 1] current class image
    target: jnp.ndarray     # i32[N] the correct class/action
    t: jnp.ndarray          # i32[N]
    ret: jnp.ndarray        # f32[N] accumulated episode reward
    key: jnp.ndarray


def make_image_class_env(num_envs: int, n_classes: int = 10,
                         size: int = 28, episode_len: int = 10,
                         noise: float = 0.05, seed: int = 0):
    """Image-classification-as-RL fixture — the reference's MnistEnv
    analog (tests/envs/mnist_env.py: reward 1 for the correct digit
    label each step). MNIST itself needs a download; here each class is
    a fixed seeded random binary template, corrupted per-step with
    pixel-flip noise — same test purpose: only a conv policy that reads
    the IMAGE can beat 1/n_classes."""
    tkey = jax.random.PRNGKey(seed)
    templates = (jax.random.uniform(tkey, (n_classes, size, size, 1))
                 < 0.5).astype(jnp.uint8) * 255

    def _obs(cls, key):
        img = templates[cls]                              # [N, H, W, 1]
        flip = (jax.random.uniform(key, img.shape) < noise)
        return jnp.where(flip, 255 - img, img).astype(jnp.uint8)

    def reset(seeds):
        key = jax.random.PRNGKey(0)
        key = jax.random.fold_in(key, jnp.sum(jnp.asarray(seeds,
                                                          jnp.uint32)))
        key, ckey, nkey = jax.random.split(key, 3)
        target = jax.random.randint(ckey, (num_envs,), 0, n_classes)
        frames = _obs(target, nkey)
        st = ImageClassState(frames=frames, target=target,
                             t=jnp.zeros(num_envs, I32),
                             ret=jnp.zeros(num_envs, F32), key=key)
        return st, frames

    def step(state, actions):
        reward = (jnp.asarray(actions, I32) == state.target).astype(F32)
        t = state.t + 1
        ret = state.ret + reward
        done = t >= episode_len
        key, ckey, nkey = jax.random.split(state.key, 3)
        target = jax.random.randint(ckey, (num_envs,), 0, n_classes)
        frames = _obs(target, nkey)
        st = ImageClassState(frames=frames, target=target,
                             t=jnp.where(done, 0, t),
                             ret=jnp.where(done, 0.0, ret), key=key)
        info = {"lives": jnp.ones(num_envs, I32),
                "score": jnp.zeros(num_envs, I32),
                "episode_return": jnp.where(done, ret, jnp.nan),
                "episode_length": jnp.where(done, episode_len, 0),
                "raw_reward": reward}
        return st, frames, reward, done, info

    return BatchedEnvFns(game_name="image_class", num_envs=num_envs,
                         obs_mode="grayscale", reset=reset, step=step,
                         obs_shape=(size, size, 1), num_actions=n_classes,
                         legal_actions=tuple(range(n_classes)))
