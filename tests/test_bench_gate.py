"""bench.py serving-mode gate: quantized serving only on passing artifacts."""

import json
import os

import pytest


@pytest.fixture()
def bench_mod(tmp_path, monkeypatch):
    import bench

    monkeypatch.setattr(bench, "DEC_GATE", str(tmp_path / "dec.json"))
    monkeypatch.setattr(bench, "GPT_GATE", str(tmp_path / "gpt.json"))
    monkeypatch.delenv("CCVS_BENCH_SERVE", raising=False)
    return bench


def _write(path, obj):
    with open(path, "w") as f:
        json.dump(obj, f)


def test_no_gates_exact(bench_mod):
    flags, gpt_int8, info = bench_mod.serving_mode()
    assert flags == {} and gpt_int8 is False
    assert info["serving"] == "exact-bf16"


def test_passing_gates_enable_quantized(bench_mod):
    _write(bench_mod.DEC_GATE, {
        "trained_weights": True,
        "psnr_vs_exact/int8_dec": 44.0, "speedup/int8_dec": 1.12,
        "psnr_vs_exact/q8_warp": 52.0, "speedup/q8_warp": 1.01,
        "psnr_vs_exact/int8_dec+q8_warp": 41.0, "speedup/int8_dec+q8_warp": 1.2,
    })
    _write(bench_mod.GPT_GATE, {
        "trained_weights": True, "token_agreement": 0.991, "topk_tv_mean": 0.012,
    })
    flags, gpt_int8, info = bench_mod.serving_mode()
    # fastest variant above both thresholds wins
    assert flags == {"serve_int8_dec": True, "serve_q8_warp": True}
    assert gpt_int8 is True
    assert info["dec_variant"] == "int8_dec+q8_warp"
    assert info["serving"].startswith("quantized")


def test_failing_quality_stays_exact(bench_mod):
    _write(bench_mod.DEC_GATE, {
        "trained_weights": True,
        "psnr_vs_exact/int8_dec": 30.0, "speedup/int8_dec": 1.5,
    })
    _write(bench_mod.GPT_GATE, {
        "trained_weights": True, "token_agreement": 0.90, "topk_tv_mean": 0.2,
    })
    flags, gpt_int8, _ = bench_mod.serving_mode()
    assert flags == {} and gpt_int8 is False


def test_untrained_gate_ignored(bench_mod):
    _write(bench_mod.DEC_GATE, {
        "trained_weights": False,
        "psnr_vs_exact/int8_dec": 60.0, "speedup/int8_dec": 1.5,
    })
    flags, _, _ = bench_mod.serving_mode()
    assert flags == {}


def test_env_forces_exact(bench_mod, monkeypatch):
    _write(bench_mod.DEC_GATE, {
        "trained_weights": True,
        "psnr_vs_exact/int8_dec": 60.0, "speedup/int8_dec": 1.5,
    })
    monkeypatch.setenv("CCVS_BENCH_SERVE", "exact")
    flags, gpt_int8, info = bench_mod.serving_mode()
    assert flags == {} and gpt_int8 is False and info["serving"] == "exact-bf16"


def test_no_speedup_not_enabled(bench_mod):
    # a variant that is accurate but not actually faster must not flip on
    _write(bench_mod.DEC_GATE, {
        "trained_weights": True,
        "psnr_vs_exact/q8_warp": 55.0, "speedup/q8_warp": 0.99,
    })
    flags, _, _ = bench_mod.serving_mode()
    assert flags == {}
