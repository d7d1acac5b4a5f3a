"""Env layer: gymnasium registration + batched device-resident envs.

Registers {Breakout,Amidar,SpaceInvaders,GridWorld}ToyboxNoFrameskip-v4
(reference toybox/__init__.py:4-32; v4 = ALE versioning, breakout is
nondeterministic because the config RNG varies the ball serve angle).
"""

_REGISTERED = False


def register_envs():
    global _REGISTERED
    if _REGISTERED:
        return
    try:
        from gymnasium.envs.registration import register
    except ImportError:
        return
    kwargs = dict(nondeterministic=False)
    register(id="BreakoutToyboxNoFrameskip-v4",
             entry_point="toybox_tpu.envs.atari:BreakoutEnv",
             nondeterministic=True)
    register(id="AmidarToyboxNoFrameskip-v4",
             entry_point="toybox_tpu.envs.atari:AmidarEnv", **kwargs)
    register(id="SpaceInvadersToyboxNoFrameskip-v4",
             entry_point="toybox_tpu.envs.atari:SpaceInvadersEnv", **kwargs)
    register(id="GridWorldToyboxNoFrameskip-v4",
             entry_point="toybox_tpu.envs.atari:GridWorldEnv", **kwargs)
    _REGISTERED = True


register_envs()
