"""Full training-state checkpoint/resume.

The reference has two mechanisms (SURVEY.md §5): joblib'd model weights
(tf_util save_variables) and env-state JSON snapshots. Here the entire
training state — params, optimizer state, env states, RNG keys — is one
pytree, so checkpointing is a single serialization and resume is exact
(deepq's restore-latest behavior, deepq.py:268-276, generalized to every
algorithm)."""

from __future__ import annotations

import os
from typing import Any

from flax import serialization


def save_checkpoint(path: str, state: Any) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(serialization.to_bytes(state))
    os.replace(tmp, path)


def load_checkpoint(path: str, template: Any) -> Any:
    """Restore into a template state (e.g. from init_fn) — shapes/dtypes
    must match; returns the restored pytree."""
    with open(path, "rb") as f:
        return serialization.from_bytes(template, f.read())


class Checkpointer:
    """Periodic save + restore-latest for a learn loop (the reference's
    deepq restore-if-checkpoint-exists behavior, deepq.py:268-276,
    generalized to every algorithm's full training state).

    ``restore(state)`` loads the newest ``ckpt_<n>`` into the freshly
    initialized template if one exists; ``maybe_save(state, n)`` writes
    ``ckpt_<n>`` every ``freq`` calls. A no-op when ``ckpt_dir`` is None,
    so learn loops can call it unconditionally."""

    def __init__(self, ckpt_dir, freq: int = 50, prefix: str = "ckpt"):
        self.ckpt_dir = ckpt_dir
        self.freq = max(int(freq), 1)
        self.prefix = prefix

    def restore(self, state):
        if self.ckpt_dir is None:
            return state
        path = latest_checkpoint(self.ckpt_dir, self.prefix)
        if path is None:
            return state
        return load_checkpoint(path, state)

    def maybe_save(self, state, n: int) -> None:
        if self.ckpt_dir is not None and n % self.freq == 0:
            save_checkpoint(
                os.path.join(self.ckpt_dir, f"{self.prefix}_{n}"), state)


def latest_checkpoint(ckpt_dir: str, prefix: str = "ckpt"):
    """Most recent '<prefix>_<step>' file in a directory, or None."""
    if not os.path.isdir(ckpt_dir):
        return None
    best, best_step = None, -1
    for name in os.listdir(ckpt_dir):
        if not name.startswith(prefix + "_"):
            continue
        try:
            step = int(name.rsplit("_", 1)[1].split(".")[0])
        except ValueError:
            continue
        if step > best_step:
            best, best_step = os.path.join(ckpt_dir, name), step
    return best
