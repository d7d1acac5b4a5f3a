"""ALE 18-action set and action <-> Input decoding.

Mirrors reference toybox/envs/atari/constants.py:16-37 (ACTION_MEANING /
ACTION_LOOKUP) and the engine's ``apply_ale_action`` contract
(toybox/envs/atari/base.py:126). The decode table is a static bool matrix so
a traced action index selects its Input under jit with one gather.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from toybox_tpu.core.types import Input

ACTION_MEANING = {
    0: "NOOP",
    1: "FIRE",
    2: "UP",
    3: "RIGHT",
    4: "LEFT",
    5: "DOWN",
    6: "UPRIGHT",
    7: "UPLEFT",
    8: "DOWNRIGHT",
    9: "DOWNLEFT",
    10: "UPFIRE",
    11: "RIGHTFIRE",
    12: "LEFTFIRE",
    13: "DOWNFIRE",
    14: "UPRIGHTFIRE",
    15: "UPLEFTFIRE",
    16: "DOWNRIGHTFIRE",
    17: "DOWNLEFTFIRE",
}

ACTION_LOOKUP = {v: k for k, v in ACTION_MEANING.items()}

NOOP_STR = "NOOP"
FIRE_STR = "FIRE"
UP_STR = "UP"
RIGHT_STR = "RIGHT"
LEFT_STR = "LEFT"
DOWN_STR = "DOWN"
UPFIRE_STR = "UPFIRE"
RIGHTFIRE_STR = "RIGHTFIRE"
LEFTFIRE_STR = "LEFTFIRE"
DOWNFIRE_STR = "DOWNFIRE"
BUTTON1_STR = "BUTTON1"


def _build_table() -> np.ndarray:
    # columns: left, right, up, down, button1, button2
    tbl = np.zeros((18, 6), dtype=bool)
    for idx, name in ACTION_MEANING.items():
        tbl[idx, 0] = "LEFT" in name
        tbl[idx, 1] = "RIGHT" in name
        tbl[idx, 2] = "UP" in name
        tbl[idx, 3] = "DOWN" in name
        tbl[idx, 4] = "FIRE" in name
    return tbl


_ACTION_TABLE_NP = _build_table()
ACTION_TABLE = jnp.asarray(_ACTION_TABLE_NP)


def ale_to_input(action) -> Input:
    """Decode an ALE action index (static int or traced int array) to Input."""
    row = ACTION_TABLE[jnp.asarray(action, jnp.int32)]
    return Input(left=row[..., 0], right=row[..., 1], up=row[..., 2],
                 down=row[..., 3], button1=row[..., 4],
                 button2=jnp.zeros_like(row[..., 4]))


def input_to_ale(inp: Input) -> int:
    """Host-side inverse: best-matching ALE action for a concrete Input."""
    row = np.array([bool(inp.left), bool(inp.right), bool(inp.up),
                    bool(inp.down), bool(inp.button1), False])
    matches = np.all(_ACTION_TABLE_NP == row, axis=1)
    idx = np.nonzero(matches)[0]
    if len(idx):
        return int(idx[0])
    return 0


# Per-game legal ALE action subsets (engine get_legal_action_set contract,
# reference toybox/envs/atari/base.py:57; values match ALE minimal sets).
LEGAL_ACTIONS = {
    "breakout": [0, 1, 3, 4],
    "amidar": [0, 1, 2, 3, 4, 5, 10, 11, 12, 13],
    "space_invaders": [0, 1, 3, 4, 11, 12],
    "gridworld": [0, 2, 3, 4, 5],
}
