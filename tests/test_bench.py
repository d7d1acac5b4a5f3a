"""Driver-contract smoke: bench.py must print ONE parseable JSON line
with the documented schema (tiny shapes; the real run is on TPU)."""

import json
import subprocess
import sys


def test_bench_functions_tiny():
    from bench import bench_env_steps, bench_pipeline, bench_train

    sps = bench_env_steps(game="breakout", n_envs=8, n_steps=4, reps=1)
    assert sps > 0
    fps = bench_pipeline(game="breakout", n_envs=8, n_steps=2, reps=1)
    assert fps > 0
    train = bench_train(game="gridworld", n_envs=8, reps=1)
    assert train["train_frames_per_s"] > 0


def test_bench_cli_json_line(monkeypatch):
    import bench

    printed = []
    monkeypatch.setattr("builtins.print", lambda s: printed.append(s))
    monkeypatch.setattr(bench, "bench_env_steps",
                        lambda **kw: 12_345_678.0)
    monkeypatch.setattr(bench, "bench_pipeline", lambda **kw: 1_000_000.0)
    monkeypatch.setattr(bench, "bench_train",
                        lambda **kw: {"train_frames_per_s": 450_000.0,
                                      "train_mfu_bf16_peak": 0.14})
    monkeypatch.setattr(sys, "argv", ["bench.py"])
    bench.main()
    assert len(printed) == 1
    rec = json.loads(printed[0])
    for key in ("metric", "value", "unit", "vs_baseline", "measures",
                "games", "pipeline_measures"):
        assert key in rec, f"missing {key}"
    assert rec["unit"] == "steps/s"
    assert rec["vs_baseline"] == round(12_345_678.0 / 1e7, 4)
    # all three games reported, each with state-step + pipeline rates
    assert set(rec["games"]) == {"breakout", "amidar", "space_invaders"}
    for g in rec["games"].values():
        assert g["env_steps_per_s"] > 0
        assert g["pipeline_frames_per_s"] > 0
