"""Generative state-model tests (the reference's distr/make_models/sample
machinery, core.py:17-73)."""

import numpy as np
import pytest

from toybox_tpu import Input, Toybox
from toybox_tpu.interventions.models import (fit_models, sample_state,
                                             write_model_modules)


@pytest.fixture(scope="module")
def trajectory():
    tb = Toybox("breakout")
    tb.apply_ale_action(1)
    states = []
    for i in range(12):
        for _ in range(5):
            tb.apply_ale_action(3 if i % 2 else 4)
        states.append(tb.to_state_json())
    return states


def test_fit_and_sample(trajectory):
    models = fit_models(trajectory)
    assert "paddle.position.x" in models
    assert "bricks[0].alive" in models
    assert models["bricks[0].alive"].kind == "bool"
    assert models["paddle.position.x"].kind == "number"

    base = trajectory[0]
    rng = np.random.default_rng(0)
    new = sample_state(models, base, "paddle.position.x", rng=rng)
    assert new["paddle"]["position"]["x"] != base["paddle"]["position"]["x"] \
        or True  # may coincide; structural check below
    assert new["lives"] == base["lives"]
    # sampled states round-trip through the engine
    tb = Toybox("breakout")
    tb.write_state_json(new)
    assert tb.get_lives() == base["lives"]


def test_sample_all_fields_valid(trajectory):
    models = fit_models(trajectory)
    new = sample_state(models, trajectory[-1],
                       rng=np.random.default_rng(1))
    tb = Toybox("breakout")
    tb.write_state_json(new)   # engine accepts fully-resampled state
    tb.apply_ale_action(0)     # and can step it


def test_unknown_query_raises(trajectory):
    models = fit_models(trajectory)
    with pytest.raises(KeyError):
        sample_state(models, trajectory[0], "not.a.field")


def test_write_model_modules(tmp_path, trajectory):
    models = fit_models(trajectory)
    outdir = tmp_path / "models"
    write_model_modules(models, str(outdir))
    import importlib.util
    f = outdir / "paddle_position_x.py"
    assert f.exists()
    spec = importlib.util.spec_from_file_location("m", f)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    v = mod.sample()
    # integer-valued training data yields int samples (paddle x is a
    # whole-pixel position)
    assert isinstance(v, (int, float))
    assert 0 <= v <= 250
