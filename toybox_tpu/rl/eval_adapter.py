"""Single-env trained-policy adapter: ``action_fn(tb) -> ale_action``.

The interactive harnesses (seed-state extraction, behavioral scenarios,
human-play ghosting) drive ONE ``Toybox`` handle frame by frame, while the
trained checkpoints expect the DeepMind observation stack the batched
pipeline produces (skip-4 with max-pool of the last two frames, 84x84
warp, 4-frame stack — toybox_tpu/envs/pipeline.py). This adapter mirrors
that pipeline per-frame so a checkpoint evaluates identically on a single
interactive env (the reference plays trained agents through the gym
wrapper stack the same way, baselines/run.py:211-246 --play and
run_get_seed_state.py's `act` loop).

Frame protocol (matching pipeline.step's macro-step anatomy): the policy
picks a NEW action on frames 0 mod 4 from the current stack and repeats
it for the next three frames; renders are captured after engine frames 3
and 4 of each macro step (the only two the max-pool sees).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from toybox_tpu.ops import obs as obs_ops


def make_tb_policy(alg: str, network: str, params, game: str,
                   skip: int = 4, frame_size: int = 84,
                   frame_stack: int = 4, seed: int = 0, greedy_key=None):
    """Build ``action_fn(tb) -> int`` from a loaded checkpoint.

    params: loaded parameter pytree (see load_eval_params); alg/network
    select the matching eval head (rl/policies.build_eval_policy).
    """
    from toybox_tpu.core.actions import LEGAL_ACTIONS
    from toybox_tpu.games import get_game
    from toybox_tpu.rl.policies import RECURRENT_NETWORKS, build_eval_policy

    if network in RECURRENT_NETWORKS:
        raise ValueError(
            f"the single-env adapter is feedforward-only; {network!r} "
            "checkpoints evaluate through the batched paths "
            "(sample_tests.runner.play_batched / regress / run --play), "
            "which thread the LSTM carry")
    module = get_game(game)
    legal = np.asarray(LEGAL_ACTIONS[game], np.int32)
    obs_shape = (frame_size, frame_size, frame_stack)
    _, p_step = build_eval_policy(alg, obs_shape, len(legal), network)

    @jax.jit
    def render_gray(config, tree):
        from toybox_tpu.games.common import luma2d
        return luma2d(module.render(config, tree))

    @jax.jit
    def first_stack(frame):
        f = obs_ops.warp_frame2d(frame, frame_size)
        return jnp.repeat(f[None], frame_stack, axis=0)     # [k, 84, 84]

    @jax.jit
    def push(stack, g1, g2):
        f = obs_ops.warp_frame2d(jnp.maximum(g1, g2), frame_size)
        return jnp.concatenate([stack[1:], f[None]], axis=0)

    @jax.jit
    def act(stack, key):
        obs = jnp.moveaxis(stack, 0, -1)[None]              # NHWC [1,84,84,k]
        key, sub = jax.random.split(key)
        actions, _, _, _ = p_step(params, obs, sub)
        return actions[0], key

    state = {"stack": None, "g1": None, "frame": 0,
             "action": 0, "key": jax.random.PRNGKey(seed)}

    def action_fn(tb) -> int:
        config, tree = tb.rsimulator.config, tb.rstate.tree
        i = state["frame"]
        if i == 0:
            state["stack"] = first_stack(render_gray(config, tree))
        elif i % skip == 0:
            # tb now shows the last frame of the previous macro step
            g2 = render_gray(config, tree)
            state["stack"] = push(state["stack"], state["g1"], g2)
        if i % skip == skip - 1:
            state["g1"] = render_gray(config, tree)
        if i % skip == 0:
            a, state["key"] = act(state["stack"], state["key"])
            state["action"] = int(legal[int(a)])
        state["frame"] = i + 1
        return state["action"]

    def reset():
        """Restart the obs stack (call after tb.new_game())."""
        state["stack"] = None
        state["g1"] = None
        state["frame"] = 0
        state["action"] = 0

    action_fn.reset = reset
    return action_fn


def load_eval_params(alg: str, network: str, load_path: str, game: str,
                     frame_size: int = 84, frame_stack: int = 4,
                     nlstm: int = 128):
    """Load a checkpoint into the matching eval-policy template
    (recurrent networks get the carry-threading template)."""
    from toybox_tpu.core.actions import LEGAL_ACTIONS
    from toybox_tpu.rl.policies import (RECURRENT_NETWORKS,
                                        build_eval_policy,
                                        build_recurrent_eval_policy)
    from toybox_tpu.rl.ppo import load_params

    n_act = len(LEGAL_ACTIONS[game])
    obs_shape = (frame_size, frame_size, frame_stack)
    if network in RECURRENT_NETWORKS:
        p_init, _, _ = build_recurrent_eval_policy(obs_shape, n_act,
                                                   network, nlstm=nlstm,
                                                   alg=alg)
    else:
        p_init, _ = build_eval_policy(alg, obs_shape, n_act, network)
    template = p_init(jax.random.PRNGKey(0))
    return load_params(load_path, template)
