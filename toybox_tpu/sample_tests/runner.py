"""Batched behavioral-scenario runner: the acceptance-gate workflow.

The reference gates TRAINED agents through white-box intervention
scenarios (reference scripts/utils/behavior_tests.sh:4-17 runs
toybox.sample_tests.* against saved ppo2 models). Its fixtures drive one
gym env per episode; here the whole scenario is one batched device
program: the intervention is applied ONCE through the reference-parity
API on a single Toybox handle, the resulting config+state are captured,
and every episode starts from that state via ``env.reset_to`` (per-env
engine rng reseeded so episodes decorrelate). Play then proceeds
regress-style — all episodes in parallel inside jitted scan chunks.

Pass/fail comes from the scenario's ``check(scores, control=...)``;
scenarios with ``needs_control=True`` also get the same policy's scores
on the UNMODIFIED game, so checks can assert relative degradation
(e.g. "removing all enemies must not crater the score").
"""

from __future__ import annotations

from functools import partial

import numpy as np


def capture_setup(scenario):
    """Run the scenario's intervention on one engine handle and capture
    the (config_json, state_json) it produces."""
    from toybox_tpu import Toybox

    with Toybox(scenario.game, seed=scenario.seed) as tb:
        scenario.intervene(tb)
        return tb.config_to_json(), tb.to_state_json()


def play_batched(game: str, cfg_js, st_js, *, params, alg: str,
                 network: str, n_episodes: int, seed: int = 0,
                 max_frames: int = 20_000, chunk: int = 128,
                 nlstm: int = 128):
    """Play n_episodes in parallel from an injected (config, state) setup;
    returns raw (uncapped, unclipped) episode scores. Recurrent networks
    (lstm/cnn_lstm/cnn_lnlstm) thread the LSTM carry + episode-boundary
    flags through the scan, like the reference --play loop threads
    model.initial_state."""
    import jax
    import jax.numpy as jnp

    from toybox_tpu.envs.pipeline import make_rl_env
    from toybox_tpu.games import get_game
    from toybox_tpu.rl.policies import (RECURRENT_NETWORKS,
                                        build_eval_policy,
                                        build_recurrent_eval_policy)

    module = get_game(game)
    cfg = module.config_from_json(cfg_js) if cfg_js is not None else None
    env = make_rl_env(game, n_episodes, config=cfg, episodic_life=False,
                      clip_rewards=False)
    recurrent = network in RECURRENT_NETWORKS
    if recurrent:
        p_init, p_step, carry_init = build_recurrent_eval_policy(
            env.obs_shape, env.num_actions, network, nlstm=nlstm, alg=alg)
    else:
        p_init, p_step = build_eval_policy(alg, env.obs_shape,
                                           env.num_actions, network)
    if params is None:  # smoke mode: an untrained (random-weight) policy
        params = p_init(jax.random.PRNGKey(seed))

    seeds = jnp.arange(n_episodes, dtype=jnp.uint32) + jnp.uint32(seed)
    if st_js is not None:
        tree = module.state_from_json(env_config(module, cfg), st_js)
        st, _ = jax.jit(partial(env.reset_to, reseed=True))(tree, seeds)
    else:
        st, _ = jax.jit(env.reset)(seeds)

    @jax.jit
    def run_chunk(params, st, totals, finished, key, rnn):
        def body(carry, _):
            st, totals, finished, key, rnn = carry
            key, akey = jax.random.split(key)
            if recurrent:
                lstm_carry, prev_done = rnn
                actions, _, _, lstm_carry = p_step(params, st.frames, akey,
                                                   lstm_carry, prev_done)
            else:
                actions, _, _, _ = p_step(params, st.frames, akey)
            st, _, _, done, info = env.step(st, actions)
            if recurrent:
                rnn = (lstm_carry, done)
            totals = jnp.where(finished, totals, totals + info["raw_reward"])
            finished = finished | done
            return (st, totals, finished, key, rnn), None

        (st, totals, finished, key, rnn), _ = jax.lax.scan(
            body, (st, totals, finished, key, rnn), None, length=chunk)
        return st, totals, finished, key, rnn

    totals = jnp.zeros(n_episodes)
    finished = jnp.zeros(n_episodes, bool)
    key = jax.random.PRNGKey(seed)
    rnn = ((carry_init(n_episodes), jnp.zeros(n_episodes, bool))
           if recurrent else jnp.zeros(()))
    n_chunks = max(max_frames // env.frames_per_step // chunk, 1)
    for _ in range(n_chunks):
        st, totals, finished, key, rnn = run_chunk(params, st, totals,
                                                   finished, key, rnn)
        if bool(jax.device_get(finished).all()):
            break
    return np.asarray(jax.device_get(totals))


def env_config(module, cfg):
    return cfg if cfg is not None else module.default_config()


def run_scenario(scenario_cls, *, params=None, alg: str = "ppo",
                 network: str = "cnn", episodes: int | None = None,
                 seed: int = 0, max_frames: int | None = None,
                 chunk: int = 128, control_cache: dict | None = None,
                 overrides: dict | None = None):
    """Run one scenario (plus its control, if the check needs one) and
    return {scores, control, passed}. ``control_cache`` (keyed on the
    control run's full configuration) dedups the unmodified-game rollout
    across scenarios that share a budget.

    ``overrides`` recalibrates the check for a non-ppo1 model family:
    attr/value pairs set on the scenario instance (e.g. min_control,
    min_control_frac), or {"waived": "<rationale>"} to run the scenario
    but record passed=None (an explicitly-waived family/scenario cell —
    the matrix still shows the scores)."""
    s = scenario_cls(seed=seed)
    waived = None
    for k, v in (overrides or {}).items():
        if k == "waived":
            waived = v
        else:
            setattr(s, k, v)
    if episodes:
        s.n_episodes = episodes
    if max_frames:
        s.max_frames = min(s.max_frames, int(max_frames))

    cfg_js, st_js = capture_setup(s)
    kw = dict(params=params, alg=alg, network=network,
              n_episodes=s.n_episodes, seed=seed, max_frames=s.max_frames,
              chunk=min(chunk, max(s.max_frames // 4, 1)))
    scores = play_batched(s.game, cfg_js, st_js, **kw)
    control = None
    if getattr(s, "needs_control", False):
        ckey = (s.game, alg, network, s.n_episodes, seed, s.max_frames,
                kw["chunk"])
        if control_cache is not None and ckey in control_cache:
            control = control_cache[ckey]
        else:
            control = play_batched(s.game, None, None, **kw)
            if control_cache is not None:
                control_cache[ckey] = control
    out = {
        "scores": scores.tolist(),
        "control": None if control is None else control.tolist(),
        "passed": (None if waived is not None
                   else bool(s.check(scores, control))),
    }
    if waived is not None:
        out["waived"] = waived
    return out


def run_all_gated(game: str, *, params=None, alg: str = "ppo",
                  network: str = "cnn", episodes: int | None = None,
                  seed: int = 0, max_frames: int | None = None,
                  overrides: dict | None = None):
    """Run every scenario for a game through the batched gate; control
    rollouts are shared across scenarios with the same budget.
    ``overrides`` maps scenario class name -> run_scenario overrides."""
    from toybox_tpu.sample_tests import get_scenarios

    results = {}
    control_cache = {}
    for scenario_cls in get_scenarios(game):
        results[scenario_cls.__name__] = run_scenario(
            scenario_cls, params=params, alg=alg, network=network,
            episodes=episodes, seed=seed, max_frames=max_frames,
            control_cache=control_cache,
            overrides=(overrides or {}).get(scenario_cls.__name__))
    return results
