"""CLI for the behavioral acceptance scenarios.

Two modes (reference scripts/utils/behavior_tests.sh:4-17 runs these
scenarios as unittests against saved ppo2 models):

- gate (``--load_path`` given): run every scenario BATCHED with the
  trained checkpoint, apply each scenario's failable ``check`` (relative
  to a same-policy control run where the scenario needs one), and exit
  nonzero if any scenario fails — the acceptance gate.
- smoke (no ``--load_path``): same harness with an untrained random-weight
  policy; reports scores but always exits 0 (checks about trained-agent
  competence are meaningless for a random policy).

Set TOYBOX_FORCE_CPU=1 to run on the CPU backend (the env var must be set
before python starts because ``-m`` imports the package first).
"""

import argparse
import sys


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("game")
    parser.add_argument("--alg", type=str, default="ppo")
    parser.add_argument("--family", type=str, default=None,
                        help="gate a registered model family (families.py):"
                             " sets alg/network/model default AND applies "
                             "the family's calibrated check overrides")
    parser.add_argument("--load_path", type=str, default=None,
                        help="trained checkpoint to gate (enables "
                             "pass/fail exit status)")
    parser.add_argument("--network", type=str, default=None)
    parser.add_argument("--episodes", type=int, default=None)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--max-frames", type=int, default=None,
                        help="cap every scenario's per-episode frame "
                             "budget (smoke runs on slow backends)")
    args = parser.parse_args()

    overrides = None
    if args.family:
        from toybox_tpu.sample_tests.families import (FAMILIES, model_path,
                                                      overrides_for)

        spec = FAMILIES[args.family]
        args.alg = spec["alg"]
        args.network = args.network or spec["network"]
        args.load_path = args.load_path or model_path(args.family,
                                                      args.game)
        overrides = overrides_for(args.family, args.game)

    gating = args.load_path is not None
    if gating:
        from toybox_tpu.rl.eval_adapter import load_eval_params
        from toybox_tpu.run import get_learn_function
        from toybox_tpu.sample_tests.runner import run_all_gated

        _, defaults = get_learn_function(args.alg)
        network = args.network or defaults.get("network", "cnn")
        params = load_eval_params(args.alg, network, args.load_path,
                                  args.game)
        results = run_all_gated(args.game, params=params, alg=args.alg,
                                network=network, episodes=args.episodes,
                                seed=args.seed, max_frames=args.max_frames,
                                overrides=overrides)
    else:
        # smoke: the cheap per-frame harness with a uniform-random policy
        # (no policy network, no per-scenario jit programs)
        from toybox_tpu.sample_tests import run_all

        results = run_all(args.game, episodes=args.episodes,
                          seed=args.seed, max_frames=args.max_frames)
    failed = []
    for name, r in results.items():
        status = (("WAIVED" if gating else "SMOKE") if r["passed"] is None
                  else "PASS" if r["passed"] else "FAIL")
        ctrl = (f" control={r['control']}" if r["control"] is not None
                else "")
        print(f"{status} {name}: scores={r['scores']}{ctrl}")
        if r["passed"] is False:
            failed.append(name)

    if gating and failed:
        print(f"BEHAVIORAL REGRESSION ({args.game}): {', '.join(failed)}")
        sys.exit(1)
    if not gating:
        print(f"(smoke mode — untrained policy, checks not gated)")


if __name__ == "__main__":
    main()
