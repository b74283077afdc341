"""Eval metrics tests."""

import numpy as np
import pytest

from ccvs_tpu.eval import frechet_distance, fvd_from_videos, psnr, ssim
from ccvs_tpu.eval.metrics import LPIPS


def test_psnr_basics(rng):
    a = rng.rand(32, 32, 3)
    assert psnr(a, a) == float("inf")
    b = np.clip(a + 0.1, 0, 1)
    p = psnr(a, b)
    assert 15 < p < 25  # ~20dB for 0.1 uniform error


def test_ssim_basics(rng):
    a = rng.rand(64, 64, 3)
    assert ssim(a, a) == pytest.approx(1.0, abs=1e-6)
    assert ssim(a, np.clip(a + rng.rand(64, 64, 3) * 0.5, 0, 1)) < 0.9


def test_lpips_orders_distances(rng):
    lp = LPIPS()
    a = rng.rand(2, 64, 64, 3).astype(np.float32) * 2 - 1
    near = np.clip(a + 0.01 * rng.randn(*a.shape).astype(np.float32), -1, 1)
    far = rng.rand(2, 64, 64, 3).astype(np.float32) * 2 - 1
    d_same = lp(a, a)
    d_near = lp(a, near)
    d_far = lp(a, far)
    assert np.all(d_same < 1e-5)
    assert np.all(d_near < d_far)


def test_frechet_distance(rng):
    a = rng.randn(256, 16)
    b = rng.randn(256, 16) + 3.0
    assert frechet_distance(a, a) == pytest.approx(0.0, abs=1e-6)
    assert frechet_distance(a, b) > frechet_distance(a, rng.randn(256, 16))


def test_fvd_pipeline(rng):
    real = rng.rand(8, 8, 32, 32, 3).astype(np.float32) * 2 - 1
    fake_close = np.clip(real + 0.02 * rng.randn(*real.shape).astype(np.float32), -1, 1)
    fake_far = rng.rand(8, 8, 32, 32, 3).astype(np.float32) * 0.5
    out_close = fvd_from_videos(real, fake_close, resize=None)
    out_far = fvd_from_videos(real, fake_far, resize=None)
    # no vendored I3D weights -> keys must say so (random-embedder fallback)
    assert "fvd" not in out_close
    assert out_close["fvd_uncalibrated"] < out_far["fvd_uncalibrated"]
    # an explicitly-given npz path that is missing is a user error, not a
    # request for the random fallback
    with pytest.raises(FileNotFoundError):
        fvd_from_videos(real, fake_close, i3d_npz="/no/such/file.npz", resize=None)


def test_i3d_shapes():
    import jax
    import jax.numpy as jnp

    from ccvs_tpu.eval.fvd import I3D

    model = I3D()
    x = jnp.zeros((1, 16, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    emb = model.apply(variables, x)
    assert emb.shape == (1, 1024)


def test_eval_all_cli(rng, tmp_path):
    """`cli eval-all` scores FVD + metrics for fake and rec in ONE process
    (one embedder + one LPIPS compile shared across every pass — the
    per-pass-process protocol re-paid minutes-long remote compiles 4-6x on
    the tunneled chip). Pins the output key layout the round-5 quality
    chain merges into fvd_trained.json."""
    import json
    import subprocess
    import sys

    from ccvs_tpu.utils.video_io import write_video

    for sub in ("real", "fake", "rec"):
        d = tmp_path / sub
        d.mkdir()
        for i in range(2):
            frames = (rng.rand(4, 32, 32, 3) * 255).astype(np.uint8)
            write_video(str(d / f"vid_{i:05d}.avi"), frames)

    import os

    env = dict(os.environ, CCVS_FORCE_CPU="1")  # the child must not
    # auto-detect the TPU plugin (conftest's CPU forcing is in-process only)
    r = subprocess.run(
        [sys.executable, "-m", "ccvs_tpu.cli", "eval-all",
         "--real", str(tmp_path / "real"), "--fake", str(tmp_path / "fake"),
         "--rec", str(tmp_path / "rec"), "--chunk", "2"],
        capture_output=True, text=True, check=True, env=env)
    out = json.loads(r.stdout.strip().splitlines()[-1])
    assert set(out) == {"fvd_fake_vs_real", "fvd_rec_vs_real",
                        "metrics_fake_vs_real", "metrics_rec_vs_real"}
    for k in ("fvd_fake_vs_real", "fvd_rec_vs_real"):
        assert out[k]["fallback_embedder"] is True
        assert np.isfinite(out[k]["fvd_uncalibrated"])
    for k in ("metrics_fake_vs_real", "metrics_rec_vs_real"):
        assert {"psnr", "ssim"} <= set(out[k])
        assert out[k]["lpips_fallback_weights"] is True
