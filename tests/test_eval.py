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
