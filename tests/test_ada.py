"""ADA augmentation tests."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from ccvs_tpu.train.ada import apply_color, augment, sample_affine, sample_color


def test_p_zero_is_identity(rng):
    img = jnp.asarray(rng.randn(2, 32, 32, 3).astype(np.float32))
    out = augment(jax.random.PRNGKey(0), img, 0.0)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(img))


def test_affine_identity_when_not_selected(rng):
    # p=0 -> all selections off -> G = identity
    G = sample_affine(jax.random.PRNGKey(0), 0.0, 4, 32, 32)
    np.testing.assert_allclose(np.asarray(G), np.tile(np.eye(3), (4, 1, 1)), atol=1e-6)


def test_color_identity_when_not_selected(rng):
    C = sample_color(jax.random.PRNGKey(0), 0.0, 4)
    np.testing.assert_allclose(np.asarray(C), np.tile(np.eye(4), (4, 1, 1)), atol=1e-6)
    img = jnp.asarray(rng.randn(4, 8, 8, 3).astype(np.float32))
    out = apply_color(img, C)
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-6)


def test_augment_runs_and_preserves_shape(rng):
    img = jnp.asarray(rng.rand(4, 32, 32, 3).astype(np.float32) * 2 - 1)
    out = augment(jax.random.PRNGKey(1), img, 0.9)
    assert out.shape == img.shape
    assert np.isfinite(np.asarray(out)).all()
    # with high p, the output should differ from the input
    assert not np.allclose(np.asarray(out), np.asarray(img), atol=1e-3)


def test_augment_near_identity_transform(rng):
    """With G forced to identity (p ~ 0 but pipeline running), the wavelet
    up/down resampling must reconstruct the image closely."""
    from ccvs_tpu.train.ada import apply_affine

    img = jnp.asarray(
        np.tile(np.linspace(-0.9, 0.9, 32, dtype=np.float32)[None, :, None], (32, 1, 3))[None]
    )
    G = jnp.eye(3)[None]
    out = apply_affine(img, G)
    assert out.shape == img.shape
    err = np.abs(np.asarray(out) - np.asarray(img))[:, 4:-4, 4:-4].mean()
    assert err < 0.02, err


def test_augment_differentiable(rng):
    img = jnp.asarray(rng.rand(2, 16, 16, 3).astype(np.float32))

    def f(x):
        return jnp.sum(augment(jax.random.PRNGKey(0), x, 0.8) ** 2)

    g = jax.grad(f)(img)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).sum() > 0
