"""Model-family registry for the behavioral acceptance workflow.

The reference's research program runs its white-box scenarios across the
ALGORITHM FAMILIES it trains (reference scripts/utils/behavior_tests.sh
gates saved models; the papers' subject is how different training
regimes respond to interventions). This maps each committed gate-model
family to the eval head that loads it, and carries the per-family
check recalibrations for scenarios whose ppo1-calibrated thresholds
do not transfer (weaker families have lower absolute controls; the
RELATIVE ratio checks transfer as-is).

A cell override of {"waived": "<rationale>"} still RUNS the scenario and
records scores for the matrix, but does not gate on it.
"""

from __future__ import annotations

import os

#: family -> eval configuration. ``suffix`` names models/<Game>.<suffix>.model
FAMILIES = {
    "ppo": dict(alg="ppo", network="cnn", suffix="regress"),
    "ppo1": dict(alg="ppo1", network="cnn", suffix="ppo1"),
    "a2c": dict(alg="a2c", network="cnn", suffix="a2c"),
    "acer": dict(alg="acer", network="cnn", suffix="acer"),
    "acktr": dict(alg="acktr", network="cnn", suffix="acktr"),
    "trpo": dict(alg="trpo", network="cnn_small", suffix="trpo"),
    "deepq": dict(alg="deepq", network="cnn", suffix="deepq"),
    "gail": dict(alg="gail", network="cnn", suffix="gail"),
    "bc": dict(alg="gail", network="cnn", suffix="bc"),
}

GAME_PREFIX = {"breakout": "Breakout", "amidar": "Amidar",
               "space_invaders": "SpaceInvaders"}


def model_path(family: str, game: str, models_dir: str = "models") -> str:
    return os.path.join(
        models_dir, f"{GAME_PREFIX[game]}.{FAMILIES[family]['suffix']}.model")


# ---------------------------------------------------------------------------
# Per-(family, game) check recalibrations. Scenario thresholds in
# test_*.py are calibrated on the ppo1 models (the strongest family);
# entries here adjust the ABSOLUTE control floor to each family's own
# regress-gate competence level (the relative min_control_frac checks
# transfer unchanged unless noted). Filled from the measured 9x10 matrix
# (scripts/behavior_matrix.py, chip, 2026-08-20) — see docs/BEHAVIOR.md.
# ---------------------------------------------------------------------------

OVERRIDES: dict = {
    # --- breakout: EZChannel/PolarStarts floors assume ppo1-scale (~1600
    # raw) controls; weaker-but-gated families play ~60-300 raw.
    ("ppo", "breakout"): {
        "EZChannel": {"min_control": 50.0},
        "PolarStarts": {"min_control": 50.0},
    },
    ("a2c", "breakout"): {
        "EZChannel": {"min_control": 50.0},
        "PolarStarts": {"min_control": 50.0},
    },
    ("acer", "breakout"): {
        "EZChannel": {"min_control": 50.0},
        "PolarStarts": {"min_control": 50.0},
        # measured: clears the lone brick in 2/5 episodes (ppo1: 4/5)
        "LastBrick": {"waived": "ACER Breakout (gate 246) clears the "
                                "lone brick in only ~2/5 episodes — "
                                "documented capability gap, not noise"},
    },
    ("acktr", "breakout"): {
        "EZChannel": {"min_control": 25.0},
        "PolarStarts": {"min_control": 25.0},
        "LastBrick": {"waived": "ACKTR Breakout (gate 129) rarely "
                                "reaches the lone high brick"},
    },
    ("trpo", "breakout"): {
        "EZChannel": {"min_control": 25.0},
        "PolarStarts": {"min_control": 25.0},
        "LastBrick": {"waived": "TRPO Breakout (gate 69, reference-ALE "
                                "18.0) is the weakest gated family; it "
                                "does not reliably clear the lone brick"},
    },
    ("deepq", "breakout"): {
        "EZChannel": {"min_control": 50.0},
        "PolarStarts": {"min_control": 50.0},
    },
    ("gail", "breakout"): {
        "EZChannel": {"min_control": 50.0},
        "PolarStarts": {"min_control": 50.0},
    },
    ("bc", "breakout"): {
        "EZChannel": {"min_control": 50.0},
        "PolarStarts": {"min_control": 50.0},
    },
}


def overrides_for(family: str, game: str) -> dict:
    return OVERRIDES.get((family, game), {})
