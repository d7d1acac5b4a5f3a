"""Model-family registry consistency: every committed gate model loads
into its registered eval template (this pins the alg/network mapping —
a wrong network silently breaks the behavioral gate with a param-tree
mismatch, as happened with acer/cnn vs cnn_small in round 5)."""

import os

import pytest

from toybox_tpu.sample_tests.families import (FAMILIES, GAME_PREFIX,
                                              model_path, overrides_for)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CASES = [(f, g) for f in FAMILIES for g in GAME_PREFIX]


@pytest.mark.parametrize("family,game", CASES)
def test_model_loads_into_registered_template(family, game):
    path = os.path.join(REPO, model_path(family, game))
    if not os.path.exists(path):
        pytest.skip(f"no committed model {path}")
    from toybox_tpu.rl.eval_adapter import load_eval_params

    spec = FAMILIES[family]
    params = load_eval_params(spec["alg"], spec["network"], path, game)
    assert params is not None


def test_overrides_reference_real_scenarios_and_attrs():
    """Every override key must name a real scenario of that game, and
    every overridden attr must exist on the scenario class (catches
    typos that would silently skip a calibration)."""
    from toybox_tpu.sample_tests import get_scenarios
    from toybox_tpu.sample_tests.families import OVERRIDES

    for (family, game), per_scenario in OVERRIDES.items():
        names = {c.__name__: c for c in get_scenarios(game)}
        for scen, attrs in per_scenario.items():
            assert scen in names, (family, game, scen)
            for attr in attrs:
                if attr == "waived":
                    continue
                assert hasattr(names[scen], attr), (family, game, scen,
                                                    attr)


def test_every_family_game_has_model():
    """The gate covers the full 9x3 grid — a missing model is a silent
    coverage hole."""
    missing = [(f, g) for f, g in CASES
               if not os.path.exists(os.path.join(REPO, model_path(f, g)))]
    assert missing == [], missing
