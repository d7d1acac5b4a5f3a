"""FPS benchmark harness — reference test/benchmark.py methodology
(:44-163): measure raw-engine and gym-wrapped frame rates over repeated
trials, report mean +/- sem and the wrapper slowdown percentage. Extended
with the batched device-env scaling sweep (the TPU-native execution mode).

    python -m toybox_tpu.benchmark [--game breakout] [--reps 5]
        [--steps 3000] [--batch-sizes 256,2048,8192]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def _mean_sem(xs):
    xs = np.asarray(xs, float)
    sem = xs.std(ddof=1) / np.sqrt(len(xs)) if len(xs) > 1 else 0.0
    return float(xs.mean()), float(sem)


def bench_raw_engine(game: str, steps: int, reps: int):
    """Single-env jitted step loop through the Toybox facade (the analog
    of the reference's raw ctoybox loop)."""
    from toybox_tpu import Toybox

    tb = Toybox(game)
    tb.apply_ale_action(1)
    for _ in range(10):
        tb.apply_ale_action(0)  # warm the jit caches
    rates = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(steps):
            tb.apply_ale_action(0)
        rates.append(steps / (time.perf_counter() - t0))
    return _mean_sem(rates)


def bench_gym_wrapped(game: str, steps: int, reps: int):
    """Through the gymnasium env + DeepMind stack (reference's
    gym-wrapped measurement)."""
    import gymnasium

    import toybox_tpu.envs  # noqa: F401 (registers ids)
    from toybox_tpu.envs.wrappers import make_atari, wrap_deepmind
    from toybox_tpu.run import GAME_IDS

    env_id = {v: k for k, v in GAME_IDS.items()}
    name = {"breakout": "Breakout", "amidar": "Amidar",
            "space_invaders": "SpaceInvaders",
            "gridworld": "GridWorld"}[game]
    env = wrap_deepmind(make_atari(f"{name}ToyboxNoFrameskip-v4"),
                        frame_stack=True)
    env.reset(seed=0)
    rates = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for i in range(steps):
            _, _, term, trunc, _ = env.step(i % env.action_space.n)
            if term or trunc:
                env.reset()
        rates.append(steps / (time.perf_counter() - t0))
    env.close()
    return _mean_sem(rates)


def bench_batched(game: str, n_envs: int, steps: int, reps: int):
    """The TPU-native mode: one jitted scan over the batched env."""
    import jax
    import jax.numpy as jnp

    from toybox_tpu.envs.batched import make_batched_env

    fns = make_batched_env(game, n_envs, obs_mode="none")

    @jax.jit
    def rollout(state):
        def body(st, _):
            st, _, r, d, _ = fns.step(st, jnp.zeros(n_envs, jnp.int32))
            return st, None
        st, _ = jax.lax.scan(body, state, None, length=steps)
        return st

    state, _ = jax.jit(fns.reset)(jnp.arange(n_envs, dtype=jnp.uint32))
    state = jax.block_until_ready(rollout(state))
    rates = []
    for _ in range(reps):
        t0 = time.perf_counter()
        state = jax.block_until_ready(rollout(state))
        rates.append(n_envs * steps / (time.perf_counter() - t0))
    return _mean_sem(rates)


def bench_ale(game: str, steps: int, reps: int):
    """The comparative arm of the reference methodology
    (test/benchmark.py:44-163): the SAME raw + gym-wrapped loops on the
    real ALE emulator, so the report can state the Toybox-vs-ALE speed
    ratio. Requires ale_py (not installable in this environment); returns
    None with a loud message when absent."""
    try:
        import ale_py  # noqa: F401
        import gymnasium
    except ImportError:
        print("ALE comparison skipped: ale_py is not installed "
              "(pip install ale-py gymnasium[atari] to enable)")
        return None

    name = {"breakout": "Breakout", "amidar": "Amidar",
            "space_invaders": "SpaceInvaders"}.get(game)
    if name is None:
        print(f"ALE comparison skipped: no ALE analog for {game!r}")
        return None
    from toybox_tpu.envs.wrappers import wrap_deepmind

    raw = gymnasium.make(f"ALE/{name}-v5", frameskip=1,
                         repeat_action_probability=0.0)
    raw.reset(seed=0)
    rates = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for i in range(steps):
            _, _, term, trunc, _ = raw.step(i % raw.action_space.n)
            if term or trunc:
                raw.reset()
        rates.append(steps / (time.perf_counter() - t0))
    raw.close()
    raw_m, raw_s = _mean_sem(rates)

    env = wrap_deepmind(gymnasium.make(f"{name}NoFrameskip-v4"),
                        frame_stack=True)
    env.reset(seed=0)
    rates = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for i in range(steps // 4):
            _, _, term, trunc, _ = env.step(i % env.action_space.n)
            if term or trunc:
                env.reset()
        rates.append((steps // 4) / (time.perf_counter() - t0))
    env.close()
    gym_m, gym_s = _mean_sem(rates)
    return {"raw_engine_fps": {"mean": raw_m, "sem": raw_s},
            "gym_wrapped_fps": {"mean": gym_m, "sem": gym_s}}


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--game", default="breakout")
    parser.add_argument("--reps", type=int, default=5)
    parser.add_argument("--steps", type=int, default=2000)
    parser.add_argument("--batch-sizes", default="256,2048,8192")
    parser.add_argument("--skip-gym", action="store_true")
    parser.add_argument("--compare-ale", action="store_true",
                        help="also benchmark real ALE (needs ale_py) and "
                             "report the Toybox/ALE speed ratio")
    args = parser.parse_args(argv)

    out = {"game": args.game}
    # single-env modes are per-call dispatch-bound (over a remote-device
    # tunnel each step is a round-trip) — cap their loop lengths
    single_steps = min(args.steps, 300)
    raw_m, raw_s = bench_raw_engine(args.game, single_steps, args.reps)
    out["raw_engine_fps"] = {"mean": raw_m, "sem": raw_s}
    print(f"raw engine:   {raw_m:,.0f} +/- {raw_s:,.0f} fps")

    if not args.skip_gym:
        gym_m, gym_s = bench_gym_wrapped(args.game, single_steps // 4,
                                         args.reps)
        out["gym_wrapped_fps"] = {"mean": gym_m, "sem": gym_s}
        slowdown = 100.0 * (1.0 - gym_m * 4 / max(raw_m, 1e-9))
        out["gym_wrapper_slowdown_pct"] = slowdown
        print(f"gym wrapped:  {gym_m:,.0f} +/- {gym_s:,.0f} agent-steps/s "
              f"({slowdown:.1f}% slowdown vs raw frames)")

    if args.compare_ale:
        ale = bench_ale(args.game, single_steps, args.reps)
        if ale is not None:
            out["ale"] = ale
            ratio = raw_m / max(ale["raw_engine_fps"]["mean"], 1e-9)
            out["toybox_vs_ale_raw_ratio"] = ratio
            print(f"ALE raw:      {ale['raw_engine_fps']['mean']:,.0f} fps "
                  f"(toybox/ale = {ratio:.2f}x)")

    for n in [int(x) for x in args.batch_sizes.split(",") if x]:
        m, s = bench_batched(args.game, n, max(args.steps // 8, 64),
                             args.reps)
        out[f"batched_{n}_fps"] = {"mean": m, "sem": s}
        print(f"batched n={n:<6d} {m:,.0f} +/- {s:,.0f} env-steps/s")

    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()
