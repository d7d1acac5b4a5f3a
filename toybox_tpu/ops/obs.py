"""Observation pipeline ops — batched, on-device array transforms.

TPU-native replacement for the reference's per-process gym wrappers
(baselines/baselines/common/atari_wrappers.py): WarpFrame 84x84 (:230-244),
MaxAndSkipEnv max-pool (:193-216), FrameStack/LazyFrames (:246-315),
ClipRewardEnv (:221). Everything here operates on [N, H, W, C] uint8
batches under jit; there are no wrapper objects in the hot path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

OBS_SIZE = 84


def warp_frame(obs: jnp.ndarray, size: int = OBS_SIZE) -> jnp.ndarray:
    """Resize uint8 [..., H, W, C] to [..., size, size, C] (bilinear).

    The reference skips RGB->gray for Toybox frames because the engine
    already renders grayscale (atari_wrappers.py:230-244); same here — the
    renderer produces 1-channel frames directly.
    """
    *lead, h, w, c = obs.shape
    out_shape = (*lead, size, size, c)
    resized = jax.image.resize(obs.astype(jnp.float32), out_shape, method="bilinear")
    return jnp.clip(jnp.round(resized), 0, 255).astype(jnp.uint8)


def warp_frame2d(obs: jnp.ndarray, size: int = OBS_SIZE) -> jnp.ndarray:
    """Channel-free warp: uint8 [..., H, W] -> [..., size, size]."""
    *lead, h, w = obs.shape
    resized = jax.image.resize(obs.astype(jnp.float32),
                               (*lead, size, size), method="bilinear")
    return jnp.clip(jnp.round(resized), 0, 255).astype(jnp.uint8)


def max_pool_pair(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Max over the last two skipped frames (MaxAndSkipEnv:205-216)."""
    return jnp.maximum(a, b)


def clip_reward(r: jnp.ndarray) -> jnp.ndarray:
    """Sign-clip rewards (ClipRewardEnv:221-228)."""
    return jnp.sign(r.astype(jnp.float32))


def push_frame_stack(stack: jnp.ndarray, frame: jnp.ndarray) -> jnp.ndarray:
    """FrameStack: stack [..., H, W, C*k]; frame [..., H, W, C] appended,
    oldest dropped (atari_wrappers.py:246-260 semantics)."""
    c = frame.shape[-1]
    return jnp.concatenate([stack[..., c:], frame], axis=-1)


def reset_frame_stack(frame: jnp.ndarray, k: int) -> jnp.ndarray:
    """On reset the stack is the first frame repeated k times."""
    return jnp.concatenate([frame] * k, axis=-1)
