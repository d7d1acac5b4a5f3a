"""One-minute device sanity sweep: run after (re)connecting a chip.

Covers the hot surfaces end-to-end on whatever backend jax picks:
batched stepping per game, the Pallas render kernels vs the XLA render
(pixel parity on 8 envs), one fused pipeline step, and one train step
for ppo/a2c. Prints PASS/FAIL lines; exits non-zero on any failure.

CPU shape-check: TOYBOX_FORCE_CPU=1 python scripts/tpu_smoke.py --tiny
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--tiny", action="store_true",
                        help="minimal shapes (CPU shape-check)")
    args = parser.parse_args()

    import jax

    if os.getenv("TOYBOX_FORCE_CPU") == "1":
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    n = 8 if args.tiny else 256
    steps = 4 if args.tiny else 64
    failures = []

    def check(name, fn):
        t0 = time.perf_counter()
        try:
            fn()
            print(f"PASS {name} ({time.perf_counter() - t0:.1f}s)")
        except Exception as e:  # noqa: BLE001 — report and continue
            failures.append(name)
            print(f"FAIL {name}: {type(e).__name__}: {e}")

    print("backend:", jax.default_backend(), "devices:", len(jax.devices()))

    from toybox_tpu.envs.batched import make_batched_env
    from toybox_tpu.envs.pipeline import make_rl_env

    for game in ("breakout", "amidar", "space_invaders", "gridworld"):
        def step_game(game=game):
            fns = make_batched_env(game, n, obs_mode="none")
            st, _ = jax.jit(fns.reset)(jnp.arange(n, dtype=jnp.uint32))

            def roll(st):
                def body(st, _):
                    st, _, r, d, _ = fns.step(
                        st, jnp.ones(n, jnp.int32))
                    return st, r[0]
                st, _ = jax.lax.scan(body, st, None, length=steps)
                return st
            jax.block_until_ready(jax.jit(roll)(st))
        check(f"step:{game}", step_game)

    on_tpu = jax.default_backend() == "tpu"
    from toybox_tpu.games import get_game
    from toybox_tpu.games.common import luma2d
    from toybox_tpu.ops import render_pallas as rp

    for game, factory in (("breakout", rp.make_breakout_gray_renderer),
                          ("amidar", rp.make_amidar_gray_renderer),
                          ("space_invaders", rp.make_si_gray_renderer)):
        def pallas_parity(game=game, factory=factory):
            module = get_game(game)
            cfg = module.default_config()
            fns = make_batched_env(game, 8, obs_mode="none")
            st, _ = jax.jit(fns.reset)(jnp.arange(8, dtype=jnp.uint32))
            for _ in range(3):
                st, _, _, _, _ = jax.jit(fns.step)(st, jnp.ones(8, jnp.int32))
            kernel = factory(cfg, interpret=not on_tpu)
            got = np.asarray(jax.jit(kernel)(st.game))
            want = np.asarray(jax.jit(jax.vmap(
                lambda s: luma2d(module.render(cfg, s))))(st.game))
            np.testing.assert_array_equal(got, want)
        check(f"pallas-parity:{game}", pallas_parity)

    def pipeline_step():
        env = make_rl_env("breakout", n)
        st, obs = jax.jit(env.reset)(jnp.arange(n, dtype=jnp.uint32))
        st, obs, r, d, info = jax.jit(env.step)(st, jnp.ones(n, jnp.int32))
        assert obs.shape == (n, 84, 84, 4)
        jax.block_until_ready(obs)
    check("pipeline:breakout", pipeline_step)

    for alg in ("ppo", "a2c"):
        def train_step(alg=alg):
            if alg == "ppo":
                from toybox_tpu.rl.ppo import make_ppo
                env = make_rl_env("breakout", 8)
                init_fn, step, _ = make_ppo(env, nsteps=4, nminibatches=1,
                                            noptepochs=1, network="cnn_small")
            else:
                from toybox_tpu.rl.a2c import make_a2c
                env = make_rl_env("breakout", 8)
                init_fn, step = make_a2c(env, nsteps=4, network="cnn_small")
            st = init_fn(0)
            st, metrics = jax.jit(step, donate_argnums=(0,))(st)
            jax.block_until_ready(metrics)
        check(f"train:{alg}", train_step)

    if failures:
        print("FAILURES:", ", ".join(failures))
        raise SystemExit(1)
    print("ALL PASS")


if __name__ == "__main__":
    main()
