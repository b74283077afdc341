"""bench.py serving-mode gate: int8 AR decode only on a passing TPU artifact."""

import json

import pytest


@pytest.fixture()
def bench_mod(tmp_path, monkeypatch):
    import bench

    monkeypatch.setattr(bench, "GPT_GATE", str(tmp_path / "gpt.json"))
    monkeypatch.setattr(bench, "GPT_GATE_FALLBACKS", ())
    monkeypatch.setattr(bench, "FUSED_GATE", str(tmp_path / "dispatch_ab.json"))
    monkeypatch.delenv("CCVS_BENCH_SERVE", raising=False)
    monkeypatch.delenv("CCVS_BENCH_FUSED", raising=False)
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
        "backend": "tpu", "int8_e2e_speedup": 1.21,
    })
    gpt_int8, info = bench_mod.serving_mode()
    assert gpt_int8 is True
    assert info["serving"].startswith("int8")
    assert info["gpt_int8_agreement"] == 0.991
    assert info["gpt_int8_e2e_speedup"] == 1.21


def test_quality_pass_but_slower_stays_exact(bench_mod, capsys):
    """Round-4 regression (VERDICT r4 item 2-weak): the gate artifact itself
    measured int8 3.7x SLOWER end-to-end yet the bench served int8 because
    the gate checked quality only. A slower approximate mode must never win."""
    _write(bench_mod.GPT_GATE, {
        "trained_weights": True, "token_agreement": 0.993, "topk_tv_mean": 0.004,
        "backend": "tpu", "int8_e2e_speedup": 0.272,
    })
    gpt_int8, info = bench_mod.serving_mode()
    assert gpt_int8 is False and info["serving"] == "exact-bf16"
    assert "speedup" in capsys.readouterr().err


def test_quality_pass_but_no_speed_field_stays_exact(bench_mod, capsys):
    """Legacy quality-only artifacts (rounds 2-4) must no longer authorize
    int8: without a measured e2e speedup the bench stays exact."""
    _write(bench_mod.GPT_GATE, {
        "trained_weights": True, "token_agreement": 0.993, "topk_tv_mean": 0.004,
        "backend": "tpu",
    })
    gpt_int8, _ = bench_mod.serving_mode()
    assert gpt_int8 is False
    assert "speedup" in capsys.readouterr().err


def test_failing_quality_stays_exact(bench_mod):
    _write(bench_mod.GPT_GATE, {
        "trained_weights": True, "token_agreement": 0.90, "topk_tv_mean": 0.2,
        "backend": "tpu",
    })
    gpt_int8, _ = bench_mod.serving_mode()
    assert gpt_int8 is False


def test_untrained_gate_ignored(bench_mod):
    _write(bench_mod.GPT_GATE, {
        "trained_weights": False, "token_agreement": 0.999, "topk_tv_mean": 0.001,
        "backend": "tpu",
    })
    gpt_int8, _ = bench_mod.serving_mode()
    assert gpt_int8 is False


def test_cpu_backend_artifact_rejected(bench_mod, capsys):
    """Round-3 regression: the gate authorizes the real served path, so an
    artifact measured on CPU numerics must not flip the TPU bench to int8."""
    _write(bench_mod.GPT_GATE, {
        "trained_weights": True, "token_agreement": 0.999, "topk_tv_mean": 0.001,
        "backend": "cpu",
    })
    gpt_int8, info = bench_mod.serving_mode()
    assert gpt_int8 is False and info["serving"] == "exact-bf16"
    assert "backend" in capsys.readouterr().err


def test_missing_backend_field_rejected(bench_mod):
    _write(bench_mod.GPT_GATE, {
        "trained_weights": True, "token_agreement": 0.999, "topk_tv_mean": 0.001,
    })
    gpt_int8, _ = bench_mod.serving_mode()
    assert gpt_int8 is False


def test_fallback_gate_used(bench_mod, tmp_path, monkeypatch):
    fb = tmp_path / "fallback.json"
    _write(fb, {
        "trained_weights": True, "token_agreement": 0.995, "topk_tv_mean": 0.004,
        "backend": "tpu", "int8_e2e_speedup": 1.1,
    })
    monkeypatch.setattr(bench_mod, "GPT_GATE_FALLBACKS", (str(fb),))
    gpt_int8, info = bench_mod.serving_mode()
    assert gpt_int8 is True and info["gpt_int8_gate"] == str(fb)


def _fused_artifact(speedup, **extra):
    return {"variants": {"C_outer_jit": {"speedup_vs_A": speedup, **extra}}}


def test_fused_no_artifact_stays_eager(bench_mod):
    """The 64px mid artifact lives at a DIFFERENT path — only the 256px
    flagship A/B may flip the judged bench to the fused program."""
    fused, info = bench_mod.fused_mode()
    assert fused is False and info["decode"] == "eager bucketed"


def test_fused_passing_artifact_enables(bench_mod):
    _write(bench_mod.FUSED_GATE, _fused_artifact(1.31))
    fused, info = bench_mod.fused_mode()
    assert fused is True
    assert info["fused_speedup_vs_eager"] == 1.31
    assert info["fused_gate"] == bench_mod.FUSED_GATE


def test_fused_below_threshold_stays_eager(bench_mod):
    _write(bench_mod.FUSED_GATE, _fused_artifact(1.02))
    fused, _ = bench_mod.fused_mode()
    assert fused is False


def test_fused_errored_variant_stays_eager(bench_mod):
    """dispatch_ab_r5 dumps partial JSON after every round; if variant C's
    256px compile crashed the remote-compile service the entry carries an
    'error' key and must not authorize the fused path even if a stale
    speedup field is present."""
    _write(bench_mod.FUSED_GATE,
           _fused_artifact(23.8, error="compile timeout"))
    fused, _ = bench_mod.fused_mode()
    assert fused is False


def test_fused_env_off_forces_eager(bench_mod, monkeypatch):
    _write(bench_mod.FUSED_GATE, _fused_artifact(1.5))
    monkeypatch.setenv("CCVS_BENCH_FUSED", "off")
    fused, info = bench_mod.fused_mode()
    assert fused is False and info["decode"] == "eager (forced)"


_PROBE_OK = {"aot_parallel_test": {
    "parallel_wall_s": 62.7,
    "parallel_individual_s": {"8": 62.7, "15": 43.8}}}


@pytest.fixture()
def probe_path(bench_mod, tmp_path, monkeypatch):
    p = str(tmp_path / "compile_probe.json")
    monkeypatch.setattr(bench_mod, "PRECOMPILE_PROBE", p)
    monkeypatch.delenv("CCVS_BENCH_PRECOMPILE", raising=False)
    return p


def test_precompile_no_probe_off(bench_mod, probe_path):
    assert bench_mod.precompile_mode() is False


def test_precompile_proven_overlap_on(bench_mod, probe_path):
    _write(probe_path, _PROBE_OK)
    assert bench_mod.precompile_mode() is True


def test_precompile_serialized_service_off(bench_mod, probe_path):
    """parallel_wall ~= sum(individual) means the compile service
    serializes — priming threads would only add risk, keep it off."""
    _write(probe_path, {"aot_parallel_test": {
        "parallel_wall_s": 103.0,
        "parallel_individual_s": {"8": 60.0, "15": 43.0}}})
    assert bench_mod.precompile_mode() is False


def test_precompile_env_off(bench_mod, probe_path, monkeypatch):
    _write(probe_path, _PROBE_OK)
    monkeypatch.setenv("CCVS_BENCH_PRECOMPILE", "off")
    assert bench_mod.precompile_mode() is False


@pytest.mark.parametrize("fused", [False, True])
def test_prime_parallel_smoke(bench_mod, monkeypatch, fused):
    """Thread plumbing + prime signatures at a tiny config: every prime
    must complete without falling back (errs empty), and the primed
    wrappers must be populated for the fused path."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from ccvs_tpu.config import AutoencoderConfig, Config, TransformerConfig
    from ccvs_tpu.models import FrameAutoencoder, TokenTransformer

    ae_cfg = AutoencoderConfig(
        necf=8, necf_mult=(1, 2), ndcf=8, ndcf_mult=(1, 2),
        z_size=16, z_num=32, z_shape=(4, 4), max_dim=8,
        inter_p=0.5, skip_memory=3, skip_context=(1, 2, 3),
        serve_fused=fused)
    gpt_cfg = TransformerConfig(
        z_num=32, z_len=64, z_chunk=16, num_blocks=4, cond_len=16,
        n_layer=2, n_head=2, n_embd=32, z_shape=(4, 4),
        emb_mode="temporal", top_k=5)
    cfg = Config(ae=ae_cfg, gpt=gpt_cfg)
    monkeypatch.setattr(bench_mod, "BATCH", 2)
    monkeypatch.setattr(bench_mod, "VID_LEN", 4)
    monkeypatch.setattr(bench_mod, "N_CTX", 1)
    ae = FrameAutoencoder(cfg.ae, dtype=jnp.float32)
    tr = TokenTransformer(cfg.gpt, dtype=jnp.float32)
    key = jax.random.PRNGKey(0)
    params = {"ae": ae.init(key), "gpt": tr.init(key, batch=2)}
    vid = jax.random.uniform(key, (2, 4, 8, 8, 3), jnp.float32, -1, 1)
    errs = bench_mod._prime_parallel(cfg, ae, tr, params, vid, fused)
    assert errs == {}
    if fused:
        assert hasattr(ae, "_jit_encode_cache")
        assert hasattr(ae, "_jit_decode_video_cache")


def test_env_forces_exact(bench_mod, monkeypatch):
    _write(bench_mod.GPT_GATE, {
        "trained_weights": True, "token_agreement": 0.999, "topk_tv_mean": 0.001,
        "backend": "tpu", "int8_e2e_speedup": 1.5,
    })
    monkeypatch.setenv("CCVS_BENCH_SERVE", "exact")
    gpt_int8, info = bench_mod.serving_mode()
    assert gpt_int8 is False and info["serving"] == "exact-bf16"
