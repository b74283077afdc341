"""Miscellaneous parity ops.

- :func:`nll_vMF`: von Mises-Fisher negative log-likelihood
  (`modules/vmf.py:33-76`). The reference evaluates the exponentially-scaled
  Bessel function on CPU inside an autograd Function; we mirror that with
  `jax.pure_callback` to scipy + a custom VJP using the same derivative
  identity (d/dk log C(k) = -I_{m/2}(k) / I_{m/2-1}(k)).
- :func:`bilinear_interpolate` / :func:`nearest_interpolate`
  (`modules/interpolate.py`).
- :func:`pixel_norm` (`modules/pixel_norm.py`).
- :func:`contrastive_loss` (`modules/contrastive.py`, unused by the shipped
  drivers but part of the module surface).
"""

import jax
import jax.numpy as jnp
import numpy as np


def _log_ive(nu, kappa):
    """log of the exponentially scaled modified Bessel I_nu(kappa)e^-kappa."""
    from scipy import special

    return np.log(special.ive(nu, kappa) + 1e-300).astype(np.float32)


def _ive_ratio(nu, kappa):
    from scipy import special

    return (special.ive(nu, kappa) / (special.ive(nu - 1, kappa) + 1e-300)).astype(np.float32)


@jax.custom_vjp
def _log_norm_const(m, kappa):
    """log C_m(kappa) = (m/2-1) log k - (m/2) log 2pi - log I_{m/2-1}(k)."""
    nu = m / 2.0 - 1.0
    log_ive = jax.pure_callback(
        lambda k: _log_ive(nu, np.asarray(k)),
        jax.ShapeDtypeStruct(kappa.shape, jnp.float32),
        kappa,
    )
    log_iv = log_ive + kappa  # unscale
    return nu * jnp.log(kappa) - (m / 2.0) * jnp.log(2 * jnp.pi) - log_iv


def _lnc_fwd(m, kappa):
    return _log_norm_const(m, kappa), (m, kappa)


def _lnc_bwd(res, g):
    m, kappa = res
    nu = m / 2.0 - 1.0
    ratio = jax.pure_callback(
        lambda k: _ive_ratio(nu + 1.0, np.asarray(k)),
        jax.ShapeDtypeStruct(kappa.shape, jnp.float32),
        kappa,
    )
    # d/dk log C = -I_{m/2}(k)/I_{m/2-1}(k)
    return (None, -g * ratio)


_log_norm_const.defvjp(_lnc_fwd, _lnc_bwd)


def nll_vMF(pred, target):
    """vMF NLL: -log C_m(|pred|) - pred . target (`vmf.py:33-76`).

    pred: (..., m) unnormalized mean direction (norm = concentration kappa);
    target: (..., m) unit vectors.
    """
    m = pred.shape[-1]
    kappa = jnp.linalg.norm(pred.astype(jnp.float32), axis=-1)
    dot = jnp.sum(pred.astype(jnp.float32) * target.astype(jnp.float32), axis=-1)
    return jnp.mean(-_log_norm_const(float(m), kappa) - dot)


def bilinear_interpolate(x, scale=2):
    """`modules/interpolate.py` BilinearInterpolate, NHWC."""
    b, h, w, c = x.shape
    return jax.image.resize(x, (b, h * scale, w * scale, c), "bilinear")


def nearest_interpolate(x, scale=2):
    b, h, w, c = x.shape
    return jax.image.resize(x, (b, h * scale, w * scale, c), "nearest")


def pixel_norm(x, eps=1e-8):
    """`modules/pixel_norm.py`: x / sqrt(mean(x^2, channel))."""
    return x * jax.lax.rsqrt(jnp.mean(x * x, axis=-1, keepdims=True) + eps)


def contrastive_loss(anchor, positive, temperature=0.07):
    """InfoNCE over flattened features (`modules/contrastive.py`)."""
    a = anchor.reshape(anchor.shape[0], -1)
    p = positive.reshape(positive.shape[0], -1)
    a = a / (jnp.linalg.norm(a, axis=1, keepdims=True) + 1e-8)
    p = p / (jnp.linalg.norm(p, axis=1, keepdims=True) + 1e-8)
    logits = a @ p.T / temperature
    labels = jnp.arange(a.shape[0])
    logp = jax.nn.log_softmax(logits, axis=1)
    return -jnp.mean(jnp.take_along_axis(logp, labels[:, None], axis=1))
