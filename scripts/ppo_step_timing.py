"""Steady-state PPO train_step timing on the real env (fresh process —
the remote dispatch floor accumulates after heavy programs).

    TOYBOX_FORCE_CPU=0 python scripts/ppo_step_timing.py [game] [n_envs] \
        [variant]

variant: f32 (default) | bf16 | im2col | coutpad | mbK (K microbatches)
Prints per-update wall time, frames/s, and the XLA-counted FLOPs of the
compiled program with the resulting MFU against the chip's bf16 peak
(f32 matmuls execute as 3-pass bf16 on the MXU, so their f32-effective
peak is peak/3).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

game = sys.argv[1] if len(sys.argv) > 1 else "breakout"
n_envs = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
variant = sys.argv[3] if len(sys.argv) > 3 else "f32"

from toybox_tpu.envs.pipeline import make_rl_env  # noqa: E402
from toybox_tpu.rl.ppo import make_ppo  # noqa: E402
from toybox_tpu.utils.mfu import (device_peak_flops,  # noqa: E402
                                  network_fwd_flops, ppo_update_flops)

import jax.numpy as jnp  # noqa: E402

env = make_rl_env(game, n_envs)
kw = {}
if variant == "bf16":
    kw["network_kwargs"] = dict(dtype="bfloat16")
elif variant == "im2col":
    kw["network"] = "cnn_im2col"
elif variant == "coutpad":
    kw["network"] = "cnn_coutpad"
elif variant.startswith("mb"):
    kw["microbatches"] = int(variant[2:])
init_fn, train_step, act_fn = make_ppo(env, total_updates=100, **kw)
state = init_fn(0)
step = jax.jit(train_step, donate_argnums=(0,)).lower(state).compile()
# analytic model FLOPs (XLA counts scan bodies once; see utils/mfu.py)
fwd = network_fwd_flops(act_fn, state.params,
                        jnp.zeros((256,) + tuple(env.obs_shape), jnp.uint8),
                        jax.random.PRNGKey(0))
flops = ppo_update_flops(fwd, n_envs * 128, noptepochs=4) if fwd else None

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
peak = device_peak_flops()
line = f"best: {best*1e3:.1f} ms  {frames/best/1e3:.1f}k f/s"
if flops and peak:
    ach = flops / best
    line += (f"  | {flops/1e12:.2f} TFLOP/update, {ach/1e12:.1f} TFLOP/s"
             f", MFU {100*ach/peak:.1f}% of bf16 peak"
             f" ({300*ach/peak:.1f}% of f32-effective peak)")
print(f"[{variant}] {line}")
