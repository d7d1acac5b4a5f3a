"""Gym env layer tests (reference ToyboxBaseEnv semantics,
scripts/utils/test_games.py smoke flow, wrapper stack)."""

import numpy as np
import pytest

gym = pytest.importorskip("gymnasium")

import toybox_tpu.envs  # noqa: E402  (registers env ids)
from toybox_tpu.envs.atari import BreakoutEnv, GridWorldEnv  # noqa: E402
from toybox_tpu.envs.gym import get_turtle  # noqa: E402
from toybox_tpu.envs.wrappers import (FrameStack, MaxAndSkipEnv,  # noqa: E402
                                      NoopResetEnv, WarpFrame, get_complement,
                                      make_atari, wrap_deepmind)


def test_registration_and_make():
    env = gym.make("BreakoutToyboxNoFrameskip-v4")
    obs, info = env.reset(seed=42)
    assert obs.shape == (160, 240, 1)
    assert env.action_space.n == 4
    obs, rew, term, trunc, info = env.step(1)  # FIRE
    assert "lives" in info and "score" in info
    env.close()


def test_reward_is_clamped_score_delta():
    env = BreakoutEnv(frameskip=1)
    env.reset(seed=0)
    env.step(1)  # FIRE serves
    total = 0.0
    for _ in range(300):
        obs, rew, term, trunc, info = env.step(0)
        assert rew >= 0
        total += rew
        if term:
            break
    assert total > 0, "serve straight up should score"
    env.close()


def test_game_over_caches_state():
    env = GridWorldEnv()
    obs, info = env.reset(seed=1)
    assert obs.shape[2] == 1
    env.close()


def test_seed_determinism():
    def rollout(seed):
        env = BreakoutEnv(frameskip=1)
        env.reset(seed=seed)
        scores = []
        for _ in range(60):
            _, r, term, _, info = env.step(1)
            scores.append(info["score"])
            if term:
                break
        env.close()
        return scores

    assert rollout(7) == rollout(7)


def test_get_turtle_unwraps():
    env = make_atari("BreakoutToyboxNoFrameskip-v4")
    env = wrap_deepmind(env, frame_stack=True)
    turtle = get_turtle(env)
    assert isinstance(turtle, BreakoutEnv.__mro__[1])  # ToyboxBaseEnv
    assert turtle.ale.lives() > 0
    env.close()


def test_deepmind_stack_shapes():
    env = make_atari("BreakoutToyboxNoFrameskip-v4")
    env = wrap_deepmind(env, frame_stack=True, clip_rewards=True)
    obs, info = env.reset(seed=3)
    arr = np.asarray(obs)
    assert arr.shape == (84, 84, 4)
    obs, rew, term, trunc, info = env.step(0)
    assert np.asarray(obs).shape == (84, 84, 4)
    assert rew in (-1.0, 0.0, 1.0)
    env.close()


def test_get_complement():
    assert get_complement("BreakoutToyboxNoFrameskip-v4") == \
        "BreakoutNoFrameskip-v4"
    assert get_complement("BreakoutNoFrameskip-v4") == \
        "BreakoutToyboxNoFrameskip-v4"


def test_mock_ale_surface():
    env = BreakoutEnv()
    env.reset(seed=0)
    assert env.ale.lives() == 5
    assert env.ale.get_score() == 0
    assert not env.ale.game_over()
    assert env.get_action_meanings()[0] == "NOOP"
    env.close()


def test_hotpatch_ale_noop_without_ale_py():
    """Guarded real-ALE score hotpatch: returns False (no-op) when ale_py
    is absent, and make_atari for a real-ALE id fails loudly."""
    import pytest

    from toybox_tpu.envs.wrappers import hotpatch_ale, make_atari

    try:
        import ale_py  # noqa: F401
        has_ale = True
    except ImportError:
        has_ale = False

    if not has_ale:
        assert hotpatch_ale() is False
        with pytest.raises(ImportError, match="ale_py"):
            make_atari("BreakoutNoFrameskip-v4")
        return

    # with ale_py present the patch applies and is idempotent
    assert hotpatch_ale() is True
    assert hotpatch_ale() is True
    env = make_atari("BreakoutNoFrameskip-v4")
    env.reset(seed=0)
    _, _, _, _, info = env.step(0)
    assert "score" in info
    env.close()


def test_sample_envs_mixing_weights():
    """SampleEnvs picks between twin envs per episode by weight — with
    weights [1, 0] every episode must come from the Toybox env (the ALE
    twin is replaced by a second Toybox env when ale_py is absent)."""
    from toybox_tpu.envs.atari import BreakoutEnv
    from toybox_tpu.envs.wrappers import SampleEnvs

    a, b = BreakoutEnv(frameskip=1), BreakoutEnv(frameskip=1)
    env = SampleEnvs([a, b], [1.0, 0.0])
    for _ in range(3):
        env.reset(seed=0)
        assert env.current is a
        env.step(0)
    env.close()
