"""bench.py serving-mode gate: int8 AR decode only on a passing artifact."""

import json

import pytest


@pytest.fixture()
def bench_mod(tmp_path, monkeypatch):
    import bench

    monkeypatch.setattr(bench, "GPT_GATE", str(tmp_path / "gpt.json"))
    monkeypatch.delenv("CCVS_BENCH_SERVE", raising=False)
    return bench


def _write(path, obj):
    with open(path, "w") as f:
        json.dump(obj, f)


def test_no_gate_exact(bench_mod):
    gpt_int8, info = bench_mod.serving_mode()
    assert gpt_int8 is False and info["serving"] == "exact-bf16"


def test_passing_gate_enables_int8(bench_mod):
    _write(bench_mod.GPT_GATE, {
        "trained_weights": True, "token_agreement": 0.991, "topk_tv_mean": 0.012,
    })
    gpt_int8, info = bench_mod.serving_mode()
    assert gpt_int8 is True
    assert info["serving"].startswith("int8")
    assert info["gpt_int8_agreement"] == 0.991


def test_failing_quality_stays_exact(bench_mod):
    _write(bench_mod.GPT_GATE, {
        "trained_weights": True, "token_agreement": 0.90, "topk_tv_mean": 0.2,
    })
    gpt_int8, _ = bench_mod.serving_mode()
    assert gpt_int8 is False


def test_untrained_gate_ignored(bench_mod):
    _write(bench_mod.GPT_GATE, {
        "trained_weights": False, "token_agreement": 0.999, "topk_tv_mean": 0.001,
    })
    gpt_int8, _ = bench_mod.serving_mode()
    assert gpt_int8 is False


def test_env_forces_exact(bench_mod, monkeypatch):
    _write(bench_mod.GPT_GATE, {
        "trained_weights": True, "token_agreement": 0.999, "topk_tv_mean": 0.001,
    })
    monkeypatch.setenv("CCVS_BENCH_SERVE", "exact")
    gpt_int8, info = bench_mod.serving_mode()
    assert gpt_int8 is False and info["serving"] == "exact-bf16"
