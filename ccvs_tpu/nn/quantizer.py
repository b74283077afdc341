"""VQ-VAE bottleneck module (codebook as a flax param).

TPU-native re-implementation of `VectorQuantizer`
(`models/skip_vid_generator/modules/quantize.py:7-83`): nearest-code lookup
via MXU matmul, straight-through gradient, commitment loss beta=0.25,
scalar-codebook init U(0,1) for e_dim<=1 (used by the state quantizer).
"""

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ccvs_tpu.ops.vq import vq_embed, vq_lookup_auto, vq_loss, vq_perplexity, vq_st


class VectorQuantizer(nn.Module):
    n_e: int
    e_dim: int  # total embedding dim per position (split by `mult`)
    beta: float = 0.25
    mult: int = 1
    normalize: bool = False

    def setup(self):
        dim = self.e_dim // self.mult
        if dim <= 1:
            init = nn.initializers.uniform(scale=1.0)  # U(0, 1) (quantize.py:27-28)
        else:
            def init(key, shape, dtype=jnp.float32):
                return jax.random.uniform(
                    key, shape, dtype, -1.0 / self.n_e, 1.0 / self.n_e
                )
        self.embedding = self.param("embedding", init, (self.n_e, dim), jnp.float32)

    def _codebook(self):
        return self.embedding

    def __call__(self, z):
        """Quantize channel-last latents.

        Args:
          z: ``(..., e_dim)`` (NHWC latents or flat vectors).

        Returns:
          ``(z_q, loss, (perplexity, indices))`` — matching the reference
          return structure (one-hots omitted; derive from indices).
        """
        cb = self._codebook()
        dim = self.e_dim // self.mult
        lead = z.shape[:-1]
        zf = z.reshape(*lead, self.mult, dim) if self.mult > 1 else z
        z_q, idx = vq_lookup_auto(zf, cb)
        if self.normalize:
            z_q = z_q / jnp.linalg.norm(z_q.astype(jnp.float32), axis=-1, keepdims=True).astype(z_q.dtype)
        loss = vq_loss(zf.astype(jnp.float32), z_q.astype(jnp.float32), self.beta)
        z_q = vq_st(zf, z_q.astype(zf.dtype))
        if self.mult > 1:
            z_q = z_q.reshape(*lead, self.e_dim)
        perplexity = vq_perplexity(idx, self.n_e)
        return z_q, loss, (perplexity, idx)

    def embed_code(self, code):
        """Indices -> embeddings (`quantize.py:76-83`)."""
        cb = self._codebook()
        return vq_embed(code, cb, self.mult)
