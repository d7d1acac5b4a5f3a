import argparse

from toybox_tpu.sample_tests import run_all


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("game")
    parser.add_argument("--episodes", type=int, default=2)
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()
    results = run_all(args.game, episodes=args.episodes, seed=args.seed)
    for name, r in results.items():
        status = "PASS" if r["passed"] else "FAIL"
        print(f"{status} {name}: scores={r['scores']}")


if __name__ == "__main__":
    main()
