"""7x7 local cost volume (LiteFlowNet-style correlation).

TPU-native equivalent of the reference's runtime-compiled CUDA kernels
(`models/skip_vid_generator/modules/correlation.py:11-228`). Semantics
(verified against the CUDA source):

  out[b, (dy+3)*7 + (dx+3), y, x] =
      mean_c  first[b, c, y*s, x*s] * second[b, c, y*s + dy*s, x*s + dx*s]

with zero padding outside ``second``, output spatial dims ``ceil(H/s)``,
``ceil(W/s)``, and displacements dy, dx in [-3, 3] scaled by the stride.

Here the 49 shifted products are expressed as static strided slices over a
padded copy of ``second`` — XLA fuses the whole volume into a single
elementwise+reduce loop nest, and autodiff gives the backward kernels
(`correlation.py:102-228`) for free. Layout is NHWC: output is
``(B, Ho, Wo, 49)`` with the displacement on the (TPU-friendly) minor axis.
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax


@partial(jax.jit, static_argnames=("stride",))
def local_correlation(first, second, stride=1):
    """Local cross-correlation cost volume.

    Args:
      first: ``(B, H, W, C)`` query features.
      second: ``(B, H, W, C)`` context features.
      stride: sampling stride (1 or 2 in the reference configs,
        `skip_autoencoder.py:398-401`).

    Returns:
      ``(B, ceil(H/stride), ceil(W/stride), 49)``; channel ``(dy+3)*7+(dx+3)``
      holds the displacement ``(dy*stride, dx*stride)`` score.
    """
    b, h, w, c = first.shape
    s = stride
    # Every sampled position (y*s + dy*s, x*s + dx*s) lies on the stride grid,
    # so stride-s correlation reduces EXACTLY to stride-1 on the pre-strided
    # planes — 1/s^2 the memory traffic of windowing the full-resolution map.
    q = first[:, ::s, ::s, :]  # (B, Ho, Wo, C)
    kd = second[:, ::s, ::s, :]
    ho, wo = q.shape[1], q.shape[2]
    k = jnp.pad(kd, ((0, 0), (3, 3), (3, 3), (0, 0)))

    inv_c = jnp.asarray(1.0 / c, first.dtype)
    vols = []
    for dy in range(-3, 4):
        for dx in range(-3, 4):
            shifted = lax.slice(
                k, (0, 3 + dy, 3 + dx, 0), (b, 3 + dy + ho, 3 + dx + wo, c)
            )
            vols.append(jnp.sum(q * shifted, axis=-1) * inv_c)
    return jnp.stack(vols, axis=-1)
