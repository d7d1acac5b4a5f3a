"""Breakout step stage breakdown on the chip (VERDICT r3 item 8: the
step rate has been flat ~20M steps/s across rounds while Amidar/SI
tripled — attribute the time to stages).

Bisects by timing jitted 256-step scans of progressively gutted step
variants (fresh process; 8192 envs, random actions):

  full        the real step
  nobricks    _ball_substep with the [B,M] brick block skipped
  nosubsteps  SUBSTEPS=1 (half the ball/brick work)
  paddleonly  paddle kinematics + serve/death/clear bookkeeping only

    TOYBOX_FORCE_CPU=0 python scripts/breakout_step_profile.py [n_envs]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

N = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
STEPS = 256


def bench(label):
    from toybox_tpu.envs.batched import make_batched_env

    fns = make_batched_env("breakout", N, obs_mode="none")

    def rollout(state, key):
        def body(carry, _):
            st, key = carry
            key, sub = jax.random.split(key)
            actions = jax.random.randint(sub, (N,), 0, fns.num_actions)
            st, _, rew, done, _ = fns.step(st, actions)
            return (st, key), rew[0]

        (state, _), _ = jax.lax.scan(body, (state, key), None, length=STEPS)
        return state

    rollout = jax.jit(rollout, donate_argnums=(0,))
    state, _ = jax.jit(fns.reset)(jnp.arange(N, dtype=jnp.uint32))
    key = jax.random.PRNGKey(0)
    state = jax.block_until_ready(rollout(state, key))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        state = jax.block_until_ready(rollout(state, key))
        best = min(best, time.perf_counter() - t0)
    rate = N * STEPS / best
    print(f"{label:12s}: {best*1e3:7.1f} ms  {rate/1e6:6.1f}M steps/s "
          f"({best/STEPS*1e6:6.1f} us/step)")
    return best


def main():
    from toybox_tpu.games import breakout as bk

    bench("full")

    # skip the brick block inside _ball_substep
    orig_substep = bk._ball_substep

    def substep_nobricks(config, state, bricks_alive, bx, by, bvx, bvy,
                         balive):
        r = state.ball_radius
        bx = bx + bvx / bk.SUBSTEPS
        by = by + bvy / bk.SUBSTEPS
        bvx = jnp.where(bx - r < bk.LEFT_WALL, jnp.abs(bvx),
                        jnp.where(bx + r > bk.RIGHT_WALL, -jnp.abs(bvx),
                                  bvx))
        bvy = jnp.where(by - r < bk.TOP_WALL, jnp.abs(bvy), bvy)
        bx = jnp.clip(bx, bk.LEFT_WALL + r, bk.RIGHT_WALL - r)
        by = jnp.maximum(by, bk.TOP_WALL + r)
        bvx, bvy, _ = bk._reflect_paddle(config, state, bx, by, bvx, bvy)
        balive = balive & ~(by - r > bk.BOTTOM)
        return (bx, by, bvx, bvy, balive, jnp.asarray(0, jnp.int32),
                jnp.asarray(False, bool), bricks_alive)

    bk._ball_substep = substep_nobricks
    bench("nobricks")
    bk._ball_substep = orig_substep

    orig_substeps = bk.SUBSTEPS
    bk.SUBSTEPS = 1
    bench("nosubsteps")
    bk.SUBSTEPS = orig_substeps

    def substep_null(config, state, bricks_alive, bx, by, bvx, bvy, balive):
        return (bx, by, bvx, bvy, balive, jnp.asarray(0, jnp.int32),
                jnp.asarray(False, bool), bricks_alive)

    bk._ball_substep = substep_null
    bench("paddleonly")
    bk._ball_substep = orig_substep


if __name__ == "__main__":
    main()
