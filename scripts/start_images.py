#!/usr/bin/env python
"""Dump start frames for visual fidelity comparison (reference
scripts/utils/start_images{,_toybox}). Writes <game>_start.png for each
game plus a tiled grid of batched-env starts."""

import argparse
import os


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", default="start_images")
    parser.add_argument("--grid", type=int, default=0,
                        help="also tile N batched-env start frames")
    args = parser.parse_args()

    from PIL import Image

    from toybox_tpu import Toybox

    os.makedirs(args.out, exist_ok=True)
    for game in ("breakout", "amidar", "space_invaders", "gridworld"):
        with Toybox(game, grayscale=False) as tb:
            # advance past intro pauses so the scene is populated
            for _ in range(140):
                tb.apply_ale_action(0)
            path = os.path.join(args.out, f"{game}_start.png")
            Image.fromarray(tb.get_rgb_frame()).save(path)
            print("wrote", path)

    if args.grid:
        import numpy as np

        from toybox_tpu.envs.batched import BatchedEnv
        from toybox_tpu.utils.misc import tile_images

        env = BatchedEnv("breakout", args.grid, obs_mode="rgb")
        obs = np.asarray(env.reset(seed=0))
        grid = tile_images(obs)
        path = os.path.join(args.out, "breakout_grid.png")
        Image.fromarray(grid).save(path)
        print("wrote", path)


if __name__ == "__main__":
    main()
