"""toybox_tpu — a TPU-native rebuild of toybox-rs/Toybox.

Intervenable Atari-game re-implementations (Breakout, Amidar, Space
Invaders, Gridworld) as pure-JAX struct-of-arrays step functions that vmap
over thousands of envs under jit, plus a gym-compatible env layer, a
jit-compatible intervention API, and an RL training stack (PPO/DQN/A2C/...)
built on pjit/shard_map collectives instead of MPI/subprocess workers.

Layer map (mirrors SURVEY.md §1, collapsed for TPU):
  games/          pure step/render engines (the reference's Rust L0)
  ctoybox.py      ctoybox-compatible handle (the reference's FFI L1)
  interventions/  white-box state access (L2)
  envs/           gym + batched device envs + wrappers (L3-L4)
  rl/             algorithms, policies, replay (L5)
  parallel/       mesh/sharding utilities
  utils/          logger, monitor, seeding, profiling
"""

__version__ = "0.1.0"

import os as _os

if _os.getenv("TOYBOX_FORCE_CPU") == "1":
    # Force the CPU backend BEFORE any module-level jnp constant can
    # initialize a device backend. This must happen here (not in entry
    # points): `python -m toybox_tpu.x` imports the package first, and
    # the JAX_PLATFORMS env var can be overridden by site-installed
    # platform plugins, while jax.config wins over both.
    import jax as _jax

    _jax.config.update("jax_platforms", "cpu")

from toybox_tpu.ctoybox import Input, Simulator, State, Toybox
from toybox_tpu.games import GAMES, get_game

__all__ = ["Toybox", "Simulator", "State", "Input", "GAMES", "get_game"]
