"""Tests for the acceptance/regression harnesses, vec_env API surface,
and seed-state extraction."""

import numpy as np
import pytest


def test_vec_env_dummy_equals_batched():
    """The reference's vec-env consistency contract
    (common/vec_env/test_vec_env.py): different executors produce the same
    trajectories for the same seeds/actions."""
    pytest.importorskip("gymnasium")
    from toybox_tpu.envs.atari import BreakoutEnv
    from toybox_tpu.envs.vec_env import BatchedVecEnv, DummyVecEnv

    n = 2
    dummy = DummyVecEnv([lambda: BreakoutEnv(frameskip=1)] * n)
    obs_d = dummy.reset(seed=0)
    batched = BatchedVecEnv("breakout", n, seed=0)
    obs_b = batched.reset()
    assert obs_d.shape == obs_b.shape == (n, 160, 240, 1)
    # same step API shape contract
    for venv in (dummy, batched):
        obs, rew, done, infos = venv.step(np.ones(n, np.int64))
        assert obs.shape == (n, 160, 240, 1)
        assert rew.shape == (n,) and done.shape == (n,)
        assert isinstance(infos, list) and len(infos) == n
    dummy.close()


class _CountingEnv:
    """Tiny pure-python gymnasium-API env for executor-parity tests
    (deterministic; episode of 5 steps; reward = action)."""

    def __init__(self):
        from gymnasium import spaces

        self.observation_space = spaces.Box(0, 255, shape=(3,),
                                            dtype=np.float32)
        self.action_space = spaces.Discrete(4)
        self._t = 0
        self._seed = 0

    def reset(self, seed=None):
        if seed is not None:
            self._seed = seed
        self._t = 0
        return self._obs(), {}

    def _obs(self):
        return np.asarray([self._t, self._seed, 42.0], np.float32)

    def step(self, action):
        self._t += 1
        return (self._obs(), float(action), self._t >= 5, False,
                {"t": self._t})

    def render(self):
        return self._obs()

    def close(self):
        pass


def test_vec_env_dummy_subproc_shmem_consistency():
    """Dummy == Subproc == Shmem trajectories — the reference's
    test_vec_env.py assert_venvs_equal contract, including auto-reset and
    terminal_observation."""
    from toybox_tpu.envs.vec_env import (DummyVecEnv, ShmemVecEnv,
                                         SubprocVecEnv)

    n = 3
    fns = [lambda: _CountingEnv() for _ in range(n)]
    venvs = [DummyVecEnv(fns), SubprocVecEnv(fns), ShmemVecEnv(fns)]
    try:
        obs = [v.reset(seed=7) for v in venvs]
        for o in obs[1:]:
            np.testing.assert_array_equal(obs[0], o)
        rng = np.random.RandomState(0)
        for t in range(12):   # crosses the episode boundary (auto-reset)
            actions = rng.randint(0, 4, size=n)
            results = [v.step(actions) for v in venvs]
            o0, r0, d0, i0 = results[0]
            for o, r, d, infos in results[1:]:
                np.testing.assert_array_equal(o0, o)
                np.testing.assert_array_equal(r0, r)
                np.testing.assert_array_equal(d0, d)
                for a, b in zip(i0, infos):
                    assert a.get("t") == b.get("t")
                    if "terminal_observation" in a:
                        np.testing.assert_array_equal(
                            a["terminal_observation"],
                            b["terminal_observation"])
    finally:
        for v in venvs:
            v.close()


def test_vec_frame_stack_and_monitor():
    pytest.importorskip("gymnasium")
    from toybox_tpu.envs.vec_env import (BatchedVecEnv, VecFrameStack,
                                         VecMonitor)

    venv = VecMonitor(VecFrameStack(BatchedVecEnv("gridworld", 2), 4))
    obs = venv.reset()
    assert obs.shape[-1] == 4
    for _ in range(5):
        obs, rew, done, infos = venv.step(np.zeros(2, np.int64))
    assert obs.shape[-1] == 4


def test_vec_normalize():
    from toybox_tpu.envs.vec_env import BatchedVecEnv, VecNormalize

    venv = VecNormalize(BatchedVecEnv("gridworld", 2))
    obs = venv.reset()
    for _ in range(3):
        obs, rew, done, infos = venv.step(np.zeros(2, np.int64))
    assert np.isfinite(obs).all()
    assert np.abs(obs).max() <= venv.clipob + 1e-6


def test_running_mean_std():
    from toybox_tpu.envs.vec_env import RunningMeanStd

    rms = RunningMeanStd(shape=())
    data = np.random.default_rng(0).normal(3.0, 2.0, size=(10, 100))
    for batch in data:
        rms.update(batch)
    assert abs(rms.mean - 3.0) < 0.2
    assert abs(np.sqrt(rms.var) - 2.0) < 0.2


def test_regress_random_agent_fails_gate():
    """A random agent scores below the reference's threshold — the gate
    must exit -1 (regress.py:200-202)."""
    from toybox_tpu.regress import play_games

    scores = play_games("breakout", None, "cnn_small", 2)
    assert scores.shape == (2,)
    # random play on breakout scores something but far below 500 cap
    assert (scores <= 500 + 7).all()


def test_regress_supports_recurrent_policies():
    """--network=cnn_lstm checkpoints evaluate through the gate harness:
    the LSTM carry threads the jitted chunks (reference --play threads
    model.initial_state)."""
    from toybox_tpu.regress import play_games

    scores = play_games("gridworld", None, "cnn_lstm", 2, chunk=16)
    assert scores.shape == (2,)


def test_seed_state_extraction_channel():
    from toybox_tpu.run_get_seed_state import extract_seed_state

    state, frame = extract_seed_state("breakout", "life_lost",
                                      max_frames=3000, seed=1)
    assert state is not None, "random play should lose a life in 3k frames"
    assert state["lives"] < 5


def test_eval_adapter_single_env_policy():
    """The per-frame adapter mirrors the batched pipeline: a trained
    checkpoint drives a single Toybox handle with legal actions and an
    84x84x4 stack protocol (verified to reproduce the batched regress
    score exactly — seed 0 scores 79 on Breakout.regress.model over a
    full episode; here we run a short prefix)."""
    from toybox_tpu import Toybox
    from toybox_tpu.rl.eval_adapter import load_eval_params, make_tb_policy

    params = load_eval_params("ppo", "cnn", "models/Breakout.regress.model",
                              "breakout")
    pol = make_tb_policy("ppo", "cnn", params, "breakout", seed=0)
    tb = Toybox("breakout", seed=0)
    legal = set(tb.get_legal_action_set())
    for _ in range(24):
        a = pol(tb)
        assert a in legal
        tb.apply_ale_action(a)
    pol.reset()
    assert pol(tb) in legal


def test_behavioral_fixture_ez_channel():
    from toybox_tpu.sample_tests.test_breakout import EZChannel

    s = EZChannel(seed=0)
    s.n_episodes = 1
    s.max_frames = 400
    scores = s.run()
    assert scores.shape == (1,)


def test_behavioral_fixture_enemy_removal():
    from toybox_tpu import Toybox
    from toybox_tpu.interventions.amidar import AmidarIntervention
    from toybox_tpu.sample_tests.test_amidar import EnemyRemoval

    s = EnemyRemoval(seed=0)
    tb = Toybox("amidar")
    s.intervene(tb)
    with AmidarIntervention(tb) as iv:
        assert len(iv.game.enemies) == 0


def test_behavioral_fixture_no_shields():
    from toybox_tpu import Toybox
    from toybox_tpu.sample_tests.test_spaceinvaders import NoShields

    s = NoShields(seed=0)
    tb = Toybox("space_invaders")
    s.intervene(tb)
    assert tb.query_state_json("shield_cell_count") == 0


def test_behavioral_fixture_jitter():
    from toybox_tpu import Toybox
    from toybox_tpu.sample_tests.test_spaceinvaders import JitterVary

    tb = Toybox("space_invaders")
    JitterVary(seed=0).intervene(tb)
    assert tb.config_to_json()["jitter"] == 1.0


def test_human_play_key_encoder():
    from toybox_tpu.human_play import keys_to_ale

    assert keys_to_ale(False, False, False, False, False) == 0   # NOOP
    assert keys_to_ale(False, False, False, False, True) == 1    # FIRE
    assert keys_to_ale(True, False, False, False, False) == 2    # UP
    assert keys_to_ale(False, False, False, True, True) == 11    # RIGHTFIRE
    assert keys_to_ale(True, False, True, False, False) == 7     # UPLEFT


def test_expert_extraction_from_committed_model():
    """The GAIL expert pipeline must extract transitions from the
    committed regress-gate PPO breakout model (run_get_seed_state-style
    rollouts, reference gail/run_mujoco.py sample_trajectory)."""
    from toybox_tpu.envs.pipeline import make_rl_env
    from toybox_tpu.rl.gail import generate_expert_dataset

    env = make_rl_env("breakout", 4)
    obs, acts = generate_expert_dataset(
        env, load_path="models/Breakout.regress.model",
        n_transitions=32, network="cnn")
    assert obs.shape == (32, 84, 84, 4)
    assert acts.shape == (32,)
    assert acts.min() >= 0 and acts.max() < env.num_actions


def test_reset_to_injects_state_batched():
    """env.reset_to starts every env from an intervened single-env state
    (the batched write_state_json analog): a LastBrick board injected
    into the batched env leaves exactly one live brick in all envs."""
    import jax
    import jax.numpy as jnp

    from toybox_tpu import Toybox
    from toybox_tpu.envs.batched import make_batched_env
    from toybox_tpu.games import breakout as bk
    from toybox_tpu.interventions.breakout import BreakoutIntervention

    tb = Toybox("breakout", seed=0)
    with BreakoutIntervention(tb) as iv:
        for i, brick in enumerate(iv.game.bricks):
            brick.alive = (i == 50)
    st_js = tb.to_state_json()

    env = make_batched_env("breakout", 3, obs_mode="none")
    tree = bk.state_from_json(bk.default_config(), st_js)
    state, _ = jax.jit(env.reset_to)(tree, jnp.arange(3, dtype=jnp.uint32))
    alive = np.asarray(state.game.brick_alive)
    assert alive.shape[0] == 3 and (alive.sum(axis=1) == 1).all()
    # per-env rng was reseeded -> differs across envs
    rngs = np.asarray(state.game.rng)
    assert not (rngs[0] == rngs[1]).all()
    # reseed=False replays the stored rng bit-exactly everywhere
    state2, _ = jax.jit(
        lambda t, s: env.reset_to(t, s, reseed=False))(
            tree, jnp.arange(3, dtype=jnp.uint32))
    rngs2 = np.asarray(state2.game.rng)
    assert (rngs2[0] == rngs2[1]).all()
    # stepping from the injected state works
    state, _, _, _, _ = jax.jit(env.step)(state, jnp.zeros(3, jnp.int32))


def test_behavioral_gate_batched_runner():
    """The gate workflow end-to-end on a tiny budget: intervention capture
    -> batched reset_to -> scan play -> failable check (LastBrick scores 0
    under a 100-frame random-weight policy, so its check FAILS — proving
    both the injection and that the check can fail)."""
    from toybox_tpu.sample_tests.runner import run_scenario
    from toybox_tpu.sample_tests.test_breakout import LastBrick

    r = run_scenario(LastBrick, params=None, alg="ppo", network="cnn_small",
                     episodes=2, seed=0, max_frames=100)
    assert r["scores"] == [0.0, 0.0]
    assert r["passed"] is False


def test_behavioral_runner_config_scenario_capture():
    """Config-changing scenarios flow through the batched runner: the
    captured config carries the intervention (jitter=1.0) and the env is
    rebuilt from it."""
    from toybox_tpu.games import space_invaders as si
    from toybox_tpu.sample_tests.runner import capture_setup
    from toybox_tpu.sample_tests.test_spaceinvaders import JitterVary

    cfg_js, st_js = capture_setup(JitterVary(seed=0))
    assert cfg_js["jitter"] == 1.0
    cfg = si.config_from_json(cfg_js)
    assert float(cfg.jitter) == 1.0
    # and the state parses against that config
    tree = si.state_from_json(cfg, st_js)
    assert tree is not None


def test_reset_to_replays_single_env_dynamics():
    """Cross-surface determinism: stepping a batched env from an injected
    state (reset_to, reseed=False) reproduces the single-env Toybox
    handle stepping from the same JSON snapshot, bit-exactly, in every
    batched lane."""
    import jax
    import jax.numpy as jnp

    from toybox_tpu import Toybox
    from toybox_tpu.envs.batched import make_batched_env
    from toybox_tpu.games import breakout as bk

    tb = Toybox("breakout", seed=7)
    tb.apply_ale_action(1)          # FIRE serves
    for _ in range(30):
        tb.apply_ale_action(3)      # drift right
    st_js = tb.to_state_json()

    # single-env continuation: 50 noops
    for _ in range(50):
        tb.apply_ale_action(0)
    single_score, single_lives = tb.get_score(), tb.get_lives()
    single_bx = tb.to_state_json()["balls"][0]["position"]["x"]

    env = make_batched_env("breakout", 4, obs_mode="none")
    tree = bk.state_from_json(bk.default_config(), st_js)
    state, _ = jax.jit(lambda t, s: env.reset_to(t, s, reseed=False))(
        tree, jnp.arange(4, dtype=jnp.uint32))
    for _ in range(50):
        state, _, _, _, _ = jax.jit(env.step)(
            state, jnp.zeros(4, jnp.int32))  # action 0 == NOOP

    assert (np.asarray(state.game.score) == single_score).all()
    assert (np.asarray(state.game.lives) == single_lives).all()
    assert np.allclose(np.asarray(state.game.ball_x)[:, 0], single_bx)
