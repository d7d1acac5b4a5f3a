"""Steady-state PPO train_step timing on the real env (fresh process —
the remote dispatch floor accumulates after heavy programs).

    TOYBOX_FORCE_CPU=0 python scripts/ppo_step_timing.py [game] [n_envs]

Prints per-update wall time and frames/s for the full fused
rollout+update step at reference hyperparameters.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

game = sys.argv[1] if len(sys.argv) > 1 else "breakout"
n_envs = int(sys.argv[2]) if len(sys.argv) > 2 else 1024

from toybox_tpu.envs.pipeline import make_rl_env  # noqa: E402
from toybox_tpu.rl.ppo import make_ppo  # noqa: E402

env = make_rl_env(game, n_envs)
kw = {}
if len(sys.argv) > 3 and sys.argv[3] == "bf16":
    kw["network_kwargs"] = dict(dtype="bfloat16")
init_fn, train_step, _ = make_ppo(env, total_updates=100, **kw)
state = init_fn(0)
step = jax.jit(train_step, donate_argnums=(0,))

state, m = step(state)
jax.block_until_ready(m)
frames = n_envs * 128 * env.frames_per_step
best = float("inf")
for i in range(6):
    t0 = time.perf_counter()
    state, m = step(state)
    jax.block_until_ready(m)
    dt = time.perf_counter() - t0
    best = min(best, dt)
    print(f"update {i}: {dt*1e3:7.1f} ms  {frames/dt/1e3:7.1f}k f/s")
print(f"best: {best*1e3:.1f} ms  {frames/best/1e3:.1f}k f/s")
