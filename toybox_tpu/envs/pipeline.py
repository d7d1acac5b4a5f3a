"""RL-ready batched env: the DeepMind preprocessing stack fused on-device.

Replaces the reference's per-process wrapper chain (MaxAndSkipEnv x4 with
max-pool, WarpFrame 84x84, FrameStack 4, ClipRewardEnv, EpisodicLifeEnv —
baselines/common/atari_wrappers.py) with batched array ops inside one jit.

TPU-native choices:
- the engine decouples state stepping from rendering, so only the last TWO
  of every four frames are rasterized (the only ones the max-pool sees);
- images stay strictly 2-D per env through the pipeline and the frame
  stack is CHANNEL-FIRST [N, k, 84, 84] — a trailing channel dim of 1/4
  would occupy the 128-wide TPU lane slot (~32x physical blowup on every
  op). Observations are transposed to NHWC only at the policy boundary.

step() returns obs uint8 [N, 84, 84, stack] (NHWC for conv nets).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import struct

from toybox_tpu.envs.batched import BatchedEnvFns, make_batched_env
from toybox_tpu.games import get_game
from toybox_tpu.games.common import luma2d
from toybox_tpu.ops import obs as obs_ops

I32 = jnp.int32
F32 = jnp.float32


@struct.dataclass
class PipelineState:
    env: Any                 # inner EnvState
    stack: jnp.ndarray       # uint8[N, k, 84, 84] frame stack (channel-first)
    lives: jnp.ndarray       # i32[N] previous lives (episodic-life)

    @property
    def frames(self):
        """Observation view: NHWC uint8 [N, 84, 84, k]."""
        return jnp.moveaxis(self.stack, 1, -1)


def make_rl_env(game_name: str, num_envs: int, config=None, skip: int = 4,
                frame_size: int = 84, frame_stack: int = 4,
                episodic_life: bool = True, clip_rewards: bool = True,
                use_pallas: str | bool = "auto", inkernel_warp: bool = False):
    """Returns BatchedEnvFns-like (reset, step) with DeepMind preprocessing.

    step(state, actions) -> (state, obs[N,84,84,k], reward, done, info)
    where done marks life loss under episodic_life (the env auto-resets
    itself on true game over).

    use_pallas: "auto" picks the single-pass Pallas frame kernel + MXU
    matmul warp on TPU backends (where available for the game) and the
    fused-XLA path elsewhere.
    """
    if skip < 2:
        raise ValueError("make_rl_env requires skip >= 2 (the last two "
                         "frames are always rendered for the max-pool)")
    module = get_game(game_name)
    # fast_auto_reset: training never mutates the step-constant state
    # fields, so skipping their auto-reset select is bit-exact here and
    # keeps them loop-invariant under the rollout scan (see
    # make_batched_env; measured +28% breakout stepping)
    inner = make_batched_env(game_name, num_envs, config=config,
                             obs_mode="none", auto_reset=True,
                             fast_auto_reset=True)
    cfg = config if config is not None else module.default_config()

    on_tpu = jax.default_backend() == "tpu"
    pallas_games = ("breakout", "amidar", "space_invaders")
    if use_pallas == "auto":
        use_pallas = on_tpu and game_name in pallas_games
    if use_pallas:
        from toybox_tpu.ops import render_pallas as rp
        assert game_name in pallas_games, \
            f"pallas renderer: {pallas_games} only"
        factory, factory2 = {
            "breakout": (rp.make_breakout_gray_renderer,
                         rp.make_breakout_gray_maxpool_renderer),
            "amidar": (rp.make_amidar_gray_renderer,
                       rp.make_amidar_gray_maxpool_renderer),
            "space_invaders": (rp.make_si_gray_renderer,
                               rp.make_si_gray_maxpool_renderer),
        }[game_name]
        render_gray = factory(cfg, interpret=not on_tpu)

        def warp(frames):
            return rp.warp_matmul(frames, frame_size)

        if inkernel_warp:
            # warp inside the kernel: only [84, 84] leaves VMEM
            render_max_warp = factory2(cfg, interpret=not on_tpu,
                                       warp_to=frame_size)
        else:
            # both max-pool frames composed in ONE kernel sweep; the warp
            # stays OUTSIDE the kernel — one big batched einsum uses the
            # MXU far better than per-env [84,H]@[H,W] matmuls in each
            # program (measured on breakout: warp_to=84 ~8% slower)
            render_max = factory2(cfg, interpret=not on_tpu)

            def render_max_warp(g1, g2):
                return warp(render_max(g1, g2))
    else:
        def render_gray(game):
            return jax.vmap(lambda s: luma2d(module.render(cfg, s)))(game)

        def warp(frames):
            return obs_ops.warp_frame2d(frames, frame_size)

        def render_max_warp(g1, g2):
            return warp(jnp.maximum(render_gray(g1), render_gray(g2)))

    def _wrap(env_state):
        frame = warp(render_gray(env_state.game))          # [N, 84, 84]
        stack = jnp.repeat(frame[:, None], frame_stack, axis=1)
        lives = jax.vmap(module.lives)(env_state.game).astype(I32)
        state = PipelineState(env=env_state, stack=stack, lives=lives)
        return state, state.frames

    def reset(seeds):
        env_state, _ = inner.reset(seeds)
        return _wrap(env_state)

    def reset_to(tree, seeds, reseed: bool = True):
        """Start every env from a single-env game-state pytree (see
        BatchedEnvFns.reset_to); the obs stack restarts from its frame."""
        env_state, _ = inner.reset_to(tree, seeds, reseed=reseed)
        return _wrap(env_state)

    def step(state: PipelineState, actions):
        env_state = state.env
        total_r = jnp.zeros(num_envs, F32)
        done_any = jnp.zeros(num_envs, jnp.bool_)

        # The inner env auto-resets mid-macro-step; once an episode has
        # finished, later inner frames belong to the NEW episode and their
        # rewards must not leak into the finishing episode's return
        # (reference MaxAndSkipEnv breaks on done, atari_wrappers.py:205-211).

        # frames 1..skip-2: state-only steps (no render)
        for _ in range(skip - 2):
            env_state, _, r, d, _ = inner.step(env_state, actions)
            total_r += jnp.where(done_any, 0.0, r)
            done_any |= d
        # last two frames: render for the max-pool
        env_state, _, r, d, _ = inner.step(env_state, actions)
        total_r += jnp.where(done_any, 0.0, r)
        done_any |= d
        g1 = env_state.game
        env_state, _, r, d, info = inner.step(env_state, actions)
        total_r += jnp.where(done_any, 0.0, r)
        done_any |= d

        frame = render_max_warp(g1, env_state.game)        # [N, 84, 84]
        stack = jnp.concatenate([state.stack[:, 1:], frame[:, None]], axis=1)

        lives = info["lives"]
        if episodic_life:
            life_lost = (lives < state.lives) | done_any
        else:
            life_lost = done_any
        # fresh episode (auto-reset or life loss): restart the stack
        stack = jnp.where(life_lost[:, None, None, None],
                          jnp.repeat(frame[:, None], frame_stack, axis=1),
                          stack)

        reward = obs_ops.clip_reward(total_r) if clip_rewards else total_r
        new_state = PipelineState(env=env_state, stack=stack, lives=lives)
        info = dict(info)
        info["raw_reward"] = total_r
        return new_state, new_state.frames, reward, life_lost, info

    obs_shape = (frame_size, frame_size, frame_stack)
    return BatchedEnvFns(
        game_name=game_name, num_envs=num_envs, obs_mode="stacked_gray",
        reset=reset, step=step, obs_shape=obs_shape,
        num_actions=inner.num_actions, legal_actions=inner.legal_actions,
        frames_per_step=skip, reset_to=reset_to)
