"""Vectorizable counter-style RNG for game state.

The reference engine serializes its RNG as ``rand: {state: [u64, u64]}``
(see /root/reference/toybox/interventions/defaults/*_state_default.json and
SURVEY.md §2.1).  We keep the same 128-bit footprint but implement
Marsaglia xorshift128 over four uint32 words, which vectorizes trivially on
the TPU VPU (no 64-bit emulation, no per-draw hashing) and round-trips
losslessly through the reference JSON format.

State layout: ``uint32[..., 4]`` = ``[x, y, z, w]``; the JSON pair is
``[x << 32 | y, z << 32 | w]``.

All draw functions are pure: ``(state) -> (new_state, value)`` and may be
freely vmapped over a leading env axis.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "seed",
    "next_u32",
    "uniform",
    "randint",
    "bernoulli",
    "to_u64_pair",
    "from_u64_pair",
]

_U32 = jnp.uint32


def _mix32(h):
    """murmur3 fmix32 finalizer — 32-bit avalanche mix (public domain)."""
    h = jnp.asarray(h, _U32)
    h = h ^ (h >> 16)
    h = h * _U32(0x85EBCA6B)
    h = h ^ (h >> 13)
    h = h * _U32(0xC2B2AE35)
    h = h ^ (h >> 16)
    return h


def seed(s) -> jax.Array:
    """Expand a uint32 seed (scalar or any-shaped array) to rng state [..., 4].

    Mirrors the role of ``Toybox.set_seed(u32)`` (reference
    toybox/envs/atari/base.py:94-97). Guaranteed nonzero state.
    """
    s = jnp.asarray(s, _U32)
    words = []
    h = s
    for i in range(4):
        h = _mix32(h + _U32(0x9E3779B9) * _U32(i + 1))
        words.append(h)
    st = jnp.stack(words, axis=-1)
    # xorshift128 must not start at all-zero; fmix32 of distinct nonneg
    # increments is never all-zero in practice, but belt and braces:
    st = jnp.where(jnp.all(st == 0, axis=-1, keepdims=True), _U32(0xBAD5EED5), st)
    return st


def next_u32(state: jax.Array):
    """One xorshift128 step. state: uint32[..., 4] -> (state', uint32[...])."""
    x = state[..., 0]
    y = state[..., 1]
    z = state[..., 2]
    w = state[..., 3]
    t = x ^ (x << 11)
    t = t ^ (t >> 8)
    w_new = (w ^ (w >> 19)) ^ t
    new_state = jnp.stack([y, z, w, w_new], axis=-1)
    return new_state, w_new


def uniform(state: jax.Array):
    """Draw float32 in [0, 1). One u32 consumed."""
    state, bits = next_u32(state)
    # 24-bit mantissa for an exactly representable uniform grid.
    val = (bits >> 8).astype(jnp.float32) * jnp.float32(1.0 / (1 << 24))
    return state, val


def randint(state: jax.Array, n):
    """Draw int32 in [0, n). Modulo bias is negligible for small game-n."""
    state, bits = next_u32(state)
    return state, (bits % jnp.asarray(n, _U32)).astype(jnp.int32)


def bernoulli(state: jax.Array, p):
    state, u = uniform(state)
    return state, u < jnp.asarray(p, jnp.float32)


# ---------------------------------------------------------------------------
# Host-side JSON interop (reference format: {"state": [u64, u64]})
# ---------------------------------------------------------------------------

def to_u64_pair(state) -> list:
    """uint32[4] -> [u64, u64] python ints for the reference JSON schema."""
    st = np.asarray(state, dtype=np.uint64)
    return [int((st[0] << np.uint64(32)) | st[1]),
            int((st[2] << np.uint64(32)) | st[3])]


def from_u64_pair(pair) -> np.ndarray:
    a, b = int(pair[0]), int(pair[1])
    return np.array(
        [(a >> 32) & 0xFFFFFFFF, a & 0xFFFFFFFF,
         (b >> 32) & 0xFFFFFFFF, b & 0xFFFFFFFF],
        dtype=np.uint32,
    )
