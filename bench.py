"""Headline benchmark: batched env throughput (env-steps/s, single chip).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Methodology mirrors the reference's FPS benchmark (reference
test/benchmark.py:44-163 measures raw-engine and gym-wrapped FPS on CPU);
here the whole vec-env is one jitted program, so we time the fused
step+render+obs pipeline at scale. ``vs_baseline`` is measured against the
driver-set north star of 10M env-steps/s/host at 8192 envs (BASELINE.md).
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp

BASELINE_STEPS_PER_S = 10_000_000.0  # north-star target (BASELINE.md)


def bench_env_steps(game: str = "breakout", n_envs: int = 8192,
                    n_steps: int = 256, obs_mode: str = "none",
                    reps: int = 3) -> float:
    from toybox_tpu.envs.batched import make_batched_env

    fns = make_batched_env(game, n_envs, obs_mode=obs_mode)

    def rollout(state, actions_key):
        def body(carry, i):
            state, key = carry
            key, sub = jax.random.split(key)
            actions = jax.random.randint(sub, (n_envs,), 0, fns.num_actions)
            state, _, rew, done, _ = fns.step(state, actions)
            return (state, key), rew[0]

        (state, _), _ = jax.lax.scan(body, (state, actions_key), jnp.arange(n_steps))
        return state

    rollout = jax.jit(rollout, donate_argnums=(0,))
    state, _ = jax.jit(fns.reset)(jnp.arange(n_envs, dtype=jnp.uint32))
    key = jax.random.PRNGKey(0)

    # warmup/compile
    state = jax.block_until_ready(rollout(state, key))

    best = 0.0
    for _ in range(reps):
        t0 = time.perf_counter()
        state = jax.block_until_ready(rollout(state, key))
        dt = time.perf_counter() - t0
        best = max(best, n_envs * n_steps / dt)
    return best


def main():
    game = sys.argv[1] if len(sys.argv) > 1 else "breakout"
    n_envs = int(sys.argv[2]) if len(sys.argv) > 2 else 8192
    sps = bench_env_steps(game=game, n_envs=n_envs)
    print(json.dumps({
        "metric": f"{game}_env_steps_per_s_{n_envs}envs",
        "value": round(sps, 1),
        "unit": "steps/s",
        "vs_baseline": round(sps / BASELINE_STEPS_PER_S, 4),
    }))


if __name__ == "__main__":
    main()
