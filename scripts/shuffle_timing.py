"""PPO epoch-shuffle cost on the chip: gather variants at exact ppo2
semantics (one permutation per epoch, minibatches sampled by permuted
index — reference ppo2/ppo2.py:250-258).

Variants (all semantically identical sample-level shuffles):
  A per-minibatch gather of u8 obs rows (current ppo.py scheme)
  B whole-batch u8 permute per epoch + contiguous mb dynamic-slices
  C like A but obs bitcast to u32 (4x fewer gathered elements)
  D like B but obs bitcast to u32

Run fresh (per-call floor builds up after heavy programs):
  TOYBOX_FORCE_CPU=0 python scripts/shuffle_timing.py [n_envs]
"""

import sys
import time

import jax
import jax.numpy as jnp

N_ENVS = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
NSTEPS = 128
NBATCH = N_ENVS * NSTEPS
NMB = 4
MB = NBATCH // NMB
EPOCHS = 4
OBS_SHAPE = (84, 84, 4)


def timeit(fn, *args, reps=5):
    out = jax.block_until_ready(fn(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best, out


def epochs_loop(obs, key, pick):
    """4 epochs x 4 minibatches; `pick(obs, perm, i) -> mb` returns the
    i-th minibatch under permutation perm. Sums to keep all live."""
    def epoch(carry, ekey):
        acc = carry
        perm = jax.random.permutation(ekey, NBATCH)

        def mb_body(acc, i):
            mb = pick(obs, perm, i)
            return acc + jnp.sum(mb, dtype=jnp.int32), 0

        acc, _ = jax.lax.scan(mb_body, acc, jnp.arange(NMB))
        return acc, 0

    keys = jax.random.split(key, EPOCHS)
    acc, _ = jax.lax.scan(epoch, jnp.int32(0), keys)
    return acc


def pick_gather(obs, perm, i):
    idx = jax.lax.dynamic_slice_in_dim(perm, i * MB, MB)
    return obs[idx]


def make_pick_permuted():
    # whole-batch permute once per epoch: memoize on perm identity by
    # hoisting the permute out via closure trick — here we emulate by
    # permuting inside epoch() instead; see epochs_loop_permuted.
    pass


def epochs_loop_permuted(obs, key, bitcast):
    def epoch(carry, ekey):
        acc = carry
        perm = jax.random.permutation(ekey, NBATCH)
        shuf = obs[perm]

        def mb_body(acc, i):
            mb = jax.lax.dynamic_slice_in_dim(shuf, i * MB, MB)
            return acc + jnp.sum(mb, dtype=jnp.int32), 0

        acc, _ = jax.lax.scan(mb_body, acc, jnp.arange(NMB))
        return acc, 0

    keys = jax.random.split(key, EPOCHS)
    acc, _ = jax.lax.scan(epoch, jnp.int32(0), keys)
    return acc


def main():
    key = jax.random.PRNGKey(0)
    obs = jax.random.randint(key, (NBATCH,) + OBS_SHAPE, 0, 255,
                             dtype=jnp.int32).astype(jnp.uint8)
    obs32 = jax.lax.bitcast_convert_type(
        obs.reshape(NBATCH, -1, 4), jnp.uint32)          # [NBATCH, 7056]
    print(f"nbatch={NBATCH} obs={obs.nbytes/1e9:.2f} GB "
          f"(x{EPOCHS} epochs)")

    fA = jax.jit(lambda o, k: epochs_loop(o, k, pick_gather))
    fB = jax.jit(lambda o, k: epochs_loop_permuted(o, k, False))

    tA, _ = timeit(fA, obs, key)
    print(f"A per-mb gather  u8 : {tA*1e3:8.1f} ms")
    tB, _ = timeit(fB, obs, key)
    print(f"B epoch-permute  u8 : {tB*1e3:8.1f} ms")
    tC, _ = timeit(fA, obs32, key)
    print(f"C per-mb gather  u32: {tC*1e3:8.1f} ms")
    tD, _ = timeit(fB, obs32, key)
    print(f"D epoch-permute  u32: {tD*1e3:8.1f} ms")


if __name__ == "__main__":
    main()
