"""On-chip Pallas-vs-XLA render parity sweep (run on real TPU hardware).

The committed pixel-parity tests (tests/test_render_pallas.py) run the
kernels in interpret mode on CPU, which computes f32 exactly and so
cannot see TPU-only effects like default-precision MXU rounding (this
sweep caught exactly that: the breakout brick-band upsample matmul was
off-by-1 on ~4% of pixels until it was pinned to Precision.HIGHEST).
Run this after touching any render kernel:

    python scripts/tpu_parity_check.py [n_envs] [steps]

Exits non-zero on any pixel mismatch. Reference frame contract:
/root/reference/toybox/envs/atari/base.py:108-113 (grayscale screen).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from toybox_tpu.envs.batched import make_batched_env
from toybox_tpu.games import get_game
from toybox_tpu.games.common import luma2d
from toybox_tpu.ops import render_pallas as rp


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 400
    chunk = 50
    failed = False
    for game, factory in [
            ("breakout", rp.make_breakout_gray_renderer),
            ("amidar", rp.make_amidar_gray_renderer),
            ("space_invaders", rp.make_si_gray_renderer)]:
        module = get_game(game)
        cfg = module.default_config()
        fns = make_batched_env(game, n, obs_mode="none")
        pal = factory(cfg)

        @jax.jit
        def rollchunk(carry):
            def body(c, _):
                s, k = c
                k, sub = jax.random.split(k)
                a = jax.random.randint(sub, (n,), 0, fns.num_actions)
                for _ in range(4):
                    s, _, _, _, _ = fns.step(s, a)
                return (s, k), None
            carry, _ = jax.lax.scan(body, carry, None, length=chunk)
            return carry

        @jax.jit
        def mismatch(s):
            p = pal(s.game)
            x = jax.vmap(lambda st: luma2d(module.render(cfg, st)))(s.game)
            d = jnp.abs(p.astype(jnp.int32) - x.astype(jnp.int32))
            return jnp.max(d), jnp.sum(d != 0)

        s, _ = jax.jit(fns.reset)(jnp.arange(n, dtype=jnp.uint32))
        carry = (s, jax.random.PRNGKey(7))
        worst = 0
        for i in range(max(steps // chunk, 1)):
            carry = rollchunk(carry)
            diff, nbad = (int(v) for v in mismatch(carry[0]))
            worst = max(worst, diff)
            if nbad:
                print(f"{game} chunk {i}: maxdiff={diff} npixels={nbad}")
        ok = worst == 0
        failed |= not ok
        print(f"{game}: on-chip parity {'OK' if ok else 'FAIL'} "
              f"(max abs diff {worst}, {n} envs x {steps} steps)")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
