"""GAN loss functions (logistic / hinge / original / wgan).

TPU-native port of `models/skip_vid_generator/modules/gan_loss.py`. Pure
functions over score tensors; the gradient penalty takes the discriminator
apply function explicitly.
"""

import jax
import jax.numpy as jnp


def softplus(x):
    return jax.nn.softplus(x.astype(jnp.float32))


# -------- logistic (default in every shipped config) --------

def g_logistic(fake_score):
    """Generator loss (`gan_loss.py:198-199`)."""
    return jnp.mean(softplus(-fake_score))


def d_logistic(real_score, fake_score):
    """Discriminator loss (`gan_loss.py:206-209`)."""
    return jnp.mean(softplus(-real_score)) + jnp.mean(softplus(fake_score))


def d_logistic_fake_only(fake_score):
    return jnp.mean(softplus(fake_score))


def d_logistic_real_only(real_score):
    return jnp.mean(softplus(-real_score))


def g_logistic_real(real_score):
    """Generator fooling D towards 'fake' on real-domain scores
    (`gan_loss.py:217-218`, used by the feature discriminator)."""
    return jnp.mean(softplus(real_score))


# -------- hinge --------

def g_hinge(fake_score):
    return -jnp.mean(fake_score)


def d_hinge(real_score, fake_score):
    return (jnp.mean(jax.nn.relu(1.0 - real_score)) + jnp.mean(jax.nn.relu(1.0 + fake_score))) / 2.0


# -------- original (BCE) --------

def g_original(fake_score):
    return jnp.mean(softplus(-fake_score))  # BCE vs ones == softplus(-x)


def d_original(real_score, fake_score):
    return (jnp.mean(softplus(-real_score)) + jnp.mean(softplus(fake_score))) / 2.0


# -------- improved wgan --------

def g_wgan(fake_score):
    return -jnp.mean(fake_score)


def d_wgan(real_score, fake_score, gp):
    return jnp.mean(fake_score) - jnp.mean(real_score) + 10.0 * gp


def wgan_gradient_penalty(d_apply, rng, x_real, x_fake):
    """Gradient penalty on interpolates (`gan_loss.py:126-153`)."""
    b = x_real.shape[0]
    alpha = jax.random.uniform(rng, (b,) + (1,) * (x_real.ndim - 1))
    interp = alpha * jax.lax.stop_gradient(x_real) + (1 - alpha) * jax.lax.stop_gradient(x_fake)

    def f(x):
        return jnp.sum(d_apply(x))

    g = jax.grad(f)(interp)
    g = g.reshape(b, -1)
    return jnp.mean((jnp.linalg.norm(g, axis=1) - 1.0) ** 2)


def r1_penalty(d_apply, x_real):
    """R1 regularization: ||grad D(real)||^2 (`quantized_video_model.py:669-701`)."""

    def f(x):
        return jnp.sum(d_apply(x))

    g = jax.grad(f)(x_real)
    return jnp.mean(jnp.sum(g.reshape(g.shape[0], -1).astype(jnp.float32) ** 2, axis=1))


GENERATOR_LOSSES = {"logistic": g_logistic, "hinge": g_hinge, "original": g_original, "wgan": g_wgan}
DISCRIMINATOR_LOSSES = {"logistic": d_logistic, "hinge": d_hinge, "original": d_original}
