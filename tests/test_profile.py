"""Intervention construction cost — the reference's test/profile.py
records 7.386s -> 0.011s for BreakoutIntervention init after removing
stack inspection (profile.py:12-14; base.py:154-165). Our BaseMixin uses
the same _in_init-flag design; this guards against regressing to
anything stack-inspection-slow."""

import time

from toybox_tpu import Toybox
from toybox_tpu.interventions.breakout import BreakoutIntervention


def test_intervention_construction_is_fast():
    tb = Toybox("breakout")
    # warm the engine/jit so we time only the decode
    with BreakoutIntervention(tb):
        pass
    t0 = time.perf_counter()
    n = 5
    for _ in range(n):
        with BreakoutIntervention(tb) as iv:
            assert len(iv.game.bricks) == 108
    per_init = (time.perf_counter() - t0) / n
    # reference-fixed implementation: 0.011s; stack-inspection bug: 7.4s.
    # generous bound for CI noise:
    assert per_init < 1.0, f"intervention init too slow: {per_init:.3f}s"


def test_property_access_is_fast():
    from toybox_tpu.interventions.core import get_property

    tb = Toybox("breakout")
    with BreakoutIntervention(tb) as iv:
        t0 = time.perf_counter()
        for i in range(108):
            get_property(iv.game, f"bricks[{i}].alive")
        dt = time.perf_counter() - t0
    assert dt < 0.5, f"property access too slow: {dt:.3f}s"
