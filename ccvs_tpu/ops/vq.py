"""Vector-quantization codebook lookup.

TPU-native equivalent of the reference's VQ bottleneck
(`models/skip_vid_generator/modules/quantize.py:32-83`). The nearest-code
search is an MXU matmul (``z @ E^T``) plus a VPU argmin — the expanded-
distance trick maps directly onto TPU hardware. A fused Pallas variant
(:func:`vq_lookup_pallas`) streams codebook tiles through VMEM and never
materializes the full ``N x n_e`` distance matrix in HBM, which matters for
the 16384-entry Kinetics codebook.
"""

from functools import partial

import jax
import jax.numpy as jnp


def vq_lookup(z, codebook):
    """Nearest-codebook lookup.

    Args:
      z: ``(..., e_dim)`` continuous latents.
      codebook: ``(n_e, e_dim)``.

    Returns:
      ``(z_q, indices)`` where ``z_q`` has z's shape and ``indices`` the
      leading shape.
    """
    lead = z.shape[:-1]
    e_dim = z.shape[-1]
    zf = z.reshape(-1, e_dim).astype(jnp.float32)
    cb = codebook.astype(jnp.float32)
    # ||z - e||^2 = ||z||^2 + ||e||^2 - 2 z.e ; ||z||^2 constant wrt argmin.
    d = (
        jnp.sum(cb * cb, axis=1)[None, :]
        - 2.0 * jnp.dot(zf, cb.T, preferred_element_type=jnp.float32)
    )
    idx = jnp.argmin(d, axis=1)
    z_q = jnp.take(codebook, idx, axis=0).astype(z.dtype)
    return z_q.reshape(z.shape), idx.reshape(lead)


def vq_lookup_auto(z, codebook):
    """Backend-dispatched lookup: the fused Pallas kernel on TPU for
    production codebook sizes (1024/16384 in the shipped configs), the jnp
    matmul+argmin elsewhere. Gradients are identical — ``z_q`` is a
    ``take(codebook, idx)`` in both paths, and ``idx`` carries no gradient.
    """
    k = codebook.shape[0]
    if jax.default_backend() == "tpu" and k >= 1024 and k % 512 == 0:
        from ccvs_tpu.ops.vq_pallas import vq_lookup_pallas

        return vq_lookup_pallas(z, codebook)
    return vq_lookup(z, codebook)


def vq_embed(indices, codebook, mult=1):
    """Indices -> embeddings, merging ``mult`` sub-codes per position.

    Matches reference ``VectorQuantizer.embed_code`` (`quantize.py:76-83`):
    with ``mult > 1`` consecutive positions along the second-to-last axis are
    folded into the channel axis.
    """
    z = jnp.take(codebook, indices, axis=0)
    if mult > 1:
        s = list(z.shape)
        s[-1] *= mult
        s[-2] //= mult
        z = z.reshape(s)
    return z


def vq_st(z, z_q):
    """Straight-through estimator: forward ``z_q``, gradient to ``z``."""
    return z + jax.lax.stop_gradient(z_q - z)


def vq_loss(z, z_q, beta=0.25):
    """Codebook + commitment loss (`quantize.py:60-61`)."""
    sg = jax.lax.stop_gradient
    codebook_loss = jnp.mean((sg(z_q) - z) ** 2)
    commit_loss = jnp.mean((z_q - sg(z)) ** 2)
    return codebook_loss + beta * commit_loss


def vq_perplexity(indices, n_e):
    """Codebook-usage perplexity (`quantize.py:67-68`)."""
    onehot_mean = jnp.mean(
        jax.nn.one_hot(indices.reshape(-1), n_e, dtype=jnp.float32), axis=0
    )
    return jnp.exp(-jnp.sum(onehot_mean * jnp.log(onehot_mean + 1e-10)))
