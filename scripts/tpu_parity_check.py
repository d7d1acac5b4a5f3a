"""On-chip parity sweeps (run on real TPU hardware): Pallas-vs-XLA
render pixels AND chip-vs-CPU full engine STATE digests.

The committed pixel-parity tests (tests/test_render_pallas.py) run the
kernels in interpret mode on CPU, which computes f32 exactly and so
cannot see TPU-only effects like default-precision MXU rounding (this
sweep caught exactly that: the breakout brick-band upsample matmul was
off-by-1 on ~4% of pixels until it was pinned to Precision.HIGHEST).
The STATE sweep guards the same failure class in the ENGINES: it replays
identical random-action rollouts on the chip and on the host CPU backend
and compares sha256 digests of every state leaf at checkpoints — any
backend-dependent arithmetic in step physics shows up as a digest split.
Run after touching any kernel or engine:

    python scripts/tpu_parity_check.py [n_envs] [steps]
    python scripts/tpu_parity_check.py --state-only   # skip the pixel arm

Exits non-zero on any mismatch. Reference frame contract:
/root/reference/toybox/envs/atari/base.py:108-113 (grayscale screen).
"""
import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from toybox_tpu.envs.batched import make_batched_env
from toybox_tpu.games import get_game
from toybox_tpu.games.common import luma2d
from toybox_tpu.ops import render_pallas as rp

GAMES = ("breakout", "amidar", "space_invaders", "gridworld")


def _digest(tree) -> str:
    """Order-deterministic sha256 over every leaf's bytes+dtype+shape."""
    h = hashlib.sha256()
    for leaf in jax.tree_util.tree_leaves(tree):
        a = np.ascontiguousarray(jax.device_get(leaf))
        h.update(str((a.dtype.str, a.shape)).encode())
        h.update(a.tobytes())
    return h.hexdigest()


def state_digest_sweep(n: int = 256, steps: int = 2048,
                       checkpoints: int = 8) -> bool:
    """Chip-vs-CPU trajectory digests; True iff every checkpoint of every
    game matches bit-exactly on both backends."""
    cpu = jax.devices("cpu")[0]
    default = jax.devices()[0]
    if default == cpu:
        print("state sweep: default backend IS cpu — single-backend run "
              "(digest self-consistency only)")
    chunk = steps // checkpoints
    ok_all = True
    for game in GAMES:
        fns = make_batched_env(game, n, obs_mode="none")

        def rollchunk(s, k):
            def body(c, _):
                s, k = c
                k, sub = jax.random.split(k)
                a = jax.random.randint(sub, (n,), 0, fns.num_actions)
                s, _, _, _, _ = fns.step(s, a)
                return (s, k), None
            (s, k), _ = jax.lax.scan(body, (s, k), None, length=chunk)
            return s, k

        def run(device):
            with jax.default_device(device):
                roll = jax.jit(rollchunk)
                s, _ = jax.jit(fns.reset)(
                    jnp.arange(n, dtype=jnp.uint32) + jnp.uint32(31))
                k = jax.random.PRNGKey(11)
                digests = []
                for _ in range(checkpoints):
                    s, k = roll(s, k)
                    digests.append(_digest(s))
                return digests

        dev_digests = run(default)
        cpu_digests = run(cpu)
        ok = dev_digests == cpu_digests
        ok_all &= ok
        if not ok:
            first = next(i for i, (a, b)
                         in enumerate(zip(dev_digests, cpu_digests))
                         if a != b)
            print(f"{game}: STATE DIVERGENCE at checkpoint {first} "
                  f"(step {(first + 1) * chunk}) — chip "
                  f"{dev_digests[first][:16]} vs cpu "
                  f"{cpu_digests[first][:16]}")
        else:
            print(f"{game}: chip-vs-cpu state digests OK "
                  f"({n} envs x {steps} steps, {checkpoints} checkpoints)")
    return ok_all


def main():
    argv = [a for a in sys.argv[1:] if not a.startswith("--")]
    n = int(argv[0]) if len(argv) > 0 else 256
    steps = int(argv[1]) if len(argv) > 1 else 400
    chunk = 50
    failed = False
    if "--state-only" in sys.argv:
        return 0 if state_digest_sweep(n) else 1
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
    failed |= not state_digest_sweep(n)
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
