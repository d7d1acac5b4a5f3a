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

from toybox_tpu.ctoybox import Input, Simulator, State, Toybox
from toybox_tpu.games import GAMES, get_game

__all__ = ["Toybox", "Simulator", "State", "Input", "GAMES", "get_game"]
