"""Fresh-process real-pipeline timing (default game: space_invaders).

Usage: python scripts/pipe_timing.py [inkernel] [game]
"""
import sys, time, jax, jax.numpy as jnp
N, STEPS = 1024, 64
GAME = sys.argv[2] if len(sys.argv) > 2 else "space_invaders"
inkernel = len(sys.argv) > 1 and sys.argv[1] == "inkernel"
from toybox_tpu.envs.pipeline import make_rl_env
pfns = make_rl_env(GAME, N, inkernel_warp=inkernel)


def roll(carry_in):
    def body(c, _):
        s, k, acc = c
        k, sub = jax.random.split(k)
        a = jax.random.randint(sub, (N,), 0, pfns.num_actions)
        s, o, r, d, _ = pfns.step(s, a)
        return (s, k, acc + jnp.sum(r) + jnp.sum(o[:, 0, 0, :].astype(jnp.float32))), None
    out, _ = jax.lax.scan(body, carry_in, None, length=STEPS)
    return out, out[-1]


roll = jax.jit(roll, donate_argnums=(0,))
st, _ = jax.jit(pfns.reset)(jnp.arange(N, dtype=jnp.uint32))
carry, acc = roll((st, jax.random.PRNGKey(1), 0.0))
jax.block_until_ready(acc)
best = 1e9
for _ in range(4):
    t0 = time.perf_counter()
    carry, acc = roll(carry)
    jax.block_until_ready(acc)
    best = min(best, time.perf_counter() - t0)
print(f"pipe inkernel={inkernel}: {best*1e3:7.1f} ms/64 -> "
      f"{N*STEPS*4/best/1e6:6.2f} M f/s")
