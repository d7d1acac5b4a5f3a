"""Per-game gym env classes (reference toybox/envs/atari/{breakout,amidar,
space_invaders,gridworld}.py thin constructors; frameskip default (2,5),
grayscale default True)."""

from toybox_tpu.ctoybox import Toybox
from toybox_tpu.envs.atari.base import (LegacyStepWrapper, MockALE,
                                        ToyboxBaseEnv)


class BreakoutEnv(ToyboxBaseEnv):

    def __init__(self, frameskip=(2, 5), repeat_action_probability=0.0,
                 grayscale=True, alpha=False, render_mode=None):
        super().__init__(Toybox("breakout", grayscale=grayscale),
                         frameskip, repeat_action_probability,
                         grayscale=grayscale, alpha=alpha,
                         render_mode=render_mode)


class AmidarEnv(ToyboxBaseEnv):

    def __init__(self, frameskip=(2, 5), repeat_action_probability=0.0,
                 grayscale=True, alpha=False, render_mode=None):
        super().__init__(Toybox("amidar", grayscale=grayscale),
                         frameskip, repeat_action_probability,
                         grayscale=grayscale, alpha=alpha,
                         render_mode=render_mode)


class SpaceInvadersEnv(ToyboxBaseEnv):

    def __init__(self, frameskip=(2, 5), repeat_action_probability=0.0,
                 grayscale=True, alpha=False, render_mode=None):
        super().__init__(Toybox("space_invaders", grayscale=grayscale),
                         frameskip, repeat_action_probability,
                         grayscale=grayscale, alpha=alpha,
                         render_mode=render_mode)


class GridWorldEnv(ToyboxBaseEnv):

    def __init__(self, frameskip=(0, 0), repeat_action_probability=0.0,
                 grayscale=True, alpha=False, render_mode=None):
        super().__init__(Toybox("gridworld", grayscale=grayscale),
                         frameskip, repeat_action_probability,
                         grayscale=grayscale, alpha=alpha,
                         render_mode=render_mode)
