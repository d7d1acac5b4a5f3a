import sys, time, jax, jax.numpy as jnp
from toybox_tpu.envs.pipeline import make_rl_env
from toybox_tpu.rl.ppo import make_ppo
N = 1024
env_fns = make_rl_env("breakout", N)
kw = dict(dtype=jnp.bfloat16) if sys.argv[1] == "bf16" else {}
init_fn, train_step, _ = make_ppo(env_fns, total_updates=100,
                                  network_kwargs=kw)
state = init_fn(0)
step = jax.jit(train_step, donate_argnums=(0,))
state, m = step(state)
jax.block_until_ready(m["mean_reward"])
best = 1e9
for _ in range(5):
    t0 = time.perf_counter()
    state, m = step(state)
    jax.block_until_ready(m["mean_reward"])
    best = min(best, time.perf_counter() - t0)
print(f"{sys.argv[1]}: {best*1e3:.1f} ms -> {N*128*4/best/1e3:.0f}k f/s")
