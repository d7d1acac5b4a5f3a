"""CLI for the behavioral scenarios. Set TOYBOX_FORCE_CPU=1 to run on
the CPU backend (deterministic and device-independent — scenario scale
does not need an accelerator); the env var must be set before python
starts because `-m` imports the package before this module runs."""

import argparse


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("game")
    parser.add_argument("--episodes", type=int, default=2)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--max-frames", type=int, default=None,
                        help="cap every scenario's per-episode frame "
                             "budget (smoke runs on slow backends)")
    args = parser.parse_args()

    from toybox_tpu.sample_tests import run_all

    results = run_all(args.game, episodes=args.episodes, seed=args.seed,
                      max_frames=args.max_frames)
    for name, r in results.items():
        # pass/fail is about the AGENT under intervention (the reference
        # gates a trained model); with no policy this is a smoke report
        status = "PASS" if r["passed"] else "FAIL"
        print(f"{status} {name}: scores={r['scores']}")


if __name__ == "__main__":
    main()
