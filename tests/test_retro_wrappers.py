"""retro_wrappers parity tests (reference
baselines/common/retro_wrappers.py:6-291): the generic wrappers work on
any gymnasium env; the retro-only entry points fail loudly without the
retro package."""

import gymnasium as gym
import numpy as np
import pytest
from gymnasium import spaces

from toybox_tpu.envs.retro_wrappers import (AllowBacktracking,
                                            AppendTimeout, Downsample,
                                            PartialFrameStack,
                                            RewardScaler, Rgb2gray,
                                            SonicDiscretizer,
                                            StochasticFrameSkip, TimeLimit,
                                            make_retro)


class CountingEnv(gym.Env):
    """Frame pixels = step count; reward = +1 per step."""

    def __init__(self, shape=(8, 8, 3)):
        self.observation_space = spaces.Box(0, 255, shape, np.uint8)
        self.action_space = spaces.Discrete(4)
        self.t = 0
        self.actions = []

    def reset(self, *, seed=None, options=None):
        super().reset(seed=seed)
        self.t = 0
        self.actions = []
        return self._obs(), {}

    def step(self, action):
        self.t += 1
        self.actions.append(int(action))
        return self._obs(), 1.0, False, False, {}

    def _obs(self):
        return np.full(self.observation_space.shape, self.t % 256, np.uint8)


def test_time_limit_truncates():
    env = TimeLimit(CountingEnv(), max_episode_steps=5)
    env.reset(seed=0)
    for i in range(5):
        _, _, term, trunc, info = env.step(0)
    assert trunc and info.get("TimeLimit.truncated")
    env.reset()
    _, _, _, trunc, _ = env.step(0)
    assert not trunc  # counter resets


def test_stochastic_frameskip_skips_and_sticks():
    base = CountingEnv()
    env = StochasticFrameSkip(base, n=4, stickprob=1.0)
    env.reset(seed=0)
    _, rew, _, _, _ = env.step(1)
    assert rew == 4.0 and base.t == 4
    # stickprob=1: the FIRST substep of the next macro-step repeats the
    # previous action, later substeps use the new one
    env.step(2)
    assert base.actions[4] == 1 and base.actions[5:8] == [2, 2, 2]
    # stickprob=0: never sticks
    base2 = CountingEnv()
    env2 = StochasticFrameSkip(base2, n=4, stickprob=0.0)
    env2.reset(seed=0)
    env2.step(1)
    env2.step(3)
    assert base2.actions == [1] * 4 + [3] * 4


def test_partial_frame_stack_channels():
    env = PartialFrameStack(CountingEnv(), k=3, channel=1)
    obs, _ = env.reset(seed=0)
    assert obs.shape == (8, 8, 3 + 3 - 1)
    obs, *_ = env.step(0)
    obs, *_ = env.step(0)
    # history = [t=0, t=1] at 1 channel each; newest (t=2) all 3 channels
    assert obs[0, 0, 0] == 0 and obs[0, 0, 1] == 1
    assert (obs[0, 0, 2:] == 2).all()


def test_downsample_and_rgb2gray():
    env = Downsample(CountingEnv(shape=(16, 16, 3)), ratio=2)
    obs, _ = env.reset(seed=0)
    assert obs.shape == (8, 8, 3)
    g = Rgb2gray(CountingEnv())
    obs, _ = g.reset(seed=0)
    assert obs.shape == (8, 8, 1) and obs.dtype == np.uint8


def test_reward_scaler_and_allow_backtracking():
    env = RewardScaler(CountingEnv(), scale=0.5)
    env.reset(seed=0)
    _, rew, *_ = env.step(0)
    assert rew == 0.5

    class Swingy(CountingEnv):
        REWS = [3.0, -2.0, 1.0, 5.0]

        def step(self, action):
            obs, _, term, trunc, info = super().step(action)
            return obs, self.REWS[(self.t - 1) % 4], term, trunc, info

    env = AllowBacktracking(Swingy())
    env.reset(seed=0)
    got = [env.step(0)[1] for _ in range(4)]
    # cur_x: 3,1,2,7 ; max_x: 3,3,3,7 -> gains 3,0,0,4
    assert got == [3.0, 0.0, 0.0, 4.0]


def test_append_timeout_dict_obs():
    env = AppendTimeout(TimeLimit(CountingEnv(), max_episode_steps=4))
    obs, _ = env.reset(seed=0)
    assert set(obs) == {"original", "value_estimation_timeout"}
    assert obs["value_estimation_timeout"][0] == 1.0
    obs, *_ = env.step(0)
    assert obs["value_estimation_timeout"][0] == pytest.approx(0.75)


def test_sonic_discretizer_buttons():
    class MultiBinaryEnv(CountingEnv):
        def __init__(self):
            super().__init__()
            self.action_space = spaces.MultiBinary(12)

    env = SonicDiscretizer(MultiBinaryEnv())
    assert env.action_space.n == 7
    arr = env.action(1)  # RIGHT
    assert arr[SonicDiscretizer.BUTTONS.index("RIGHT")]
    assert arr.sum() == 1


def test_make_retro_fails_loudly_without_retro():
    with pytest.raises(ImportError, match="retro"):
        make_retro(game="SonicTheHedgehog-Genesis")


def test_stack_composes_on_toybox_env():
    """The generic stack runs on a real Toybox gym env."""
    import toybox_tpu.envs  # noqa: F401  (registers the envs)

    env = gym.make("BreakoutToyboxNoFrameskip-v4")
    env = StochasticFrameSkip(env, n=4, stickprob=0.25)
    env = TimeLimit(env, max_episode_steps=8)
    env = RewardScaler(env, scale=0.1)
    obs, _ = env.reset(seed=0)
    for _ in range(8):
        obs, rew, term, trunc, info = env.step(env.action_space.sample())
        if term or trunc:
            break
    assert trunc or term
    env.close()
