"""SkipGAN frame encoder.

TPU-native re-implementation of `SkipGANEncoder`
(`models/skip_vid_generator/models/skip_autoencoder.py:309-351`): a 1x1
in-conv, a downsampling ResBlock per resolution, and a 1x1 out-conv to the
latent size. Emits the first ``inter_p`` fraction of channels at every
resolution as "inter" context features for the flow-warping decoder.

NHWC; video inputs (B, T, H, W, C) are flattened over time (the reference's
`flatten_vid`), which keeps the convs batched large for the MXU.
"""

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from ccvs_tpu.config import AutoencoderConfig
from ccvs_tpu.nn.layers import ConvLayerAE, ResBlockAE, flatten_vid, unflatten_vid


class SkipEncoder(nn.Module):
    cfg: AutoencoderConfig
    mode: str = "rgb"  # rgb | layout
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        """Returns ``(z, inters)`` where ``z`` is (B[,T],h,w,z_size) and
        ``inters`` is a list of per-resolution context features, finest
        first (matching reference ordering)."""
        cfg = self.cfg
        x, t = flatten_vid(x)

        chans = cfg.enc_channels
        inter_sizes = cfg.inter_sizes_enc
        in_size = cfg.layout_size if self.mode == "layout" else 3

        out = ConvLayerAE(in_size, chans[0], 1, dtype=self.dtype, name="block0")(x)
        inters = [out[..., : inter_sizes[0]]]
        for i in range(1, cfg.num_resolutions):
            out = ResBlockAE(
                chans[i - 1], chans[i], downsample=True, dtype=self.dtype, name=f"block{i}"
            )(out)
            inters.append(out[..., : inter_sizes[i]])
        out = ConvLayerAE(
            chans[-1], cfg.z_size, 1, dtype=self.dtype, name=f"block{cfg.num_resolutions}"
        )(out)

        if cfg.normalize_out:
            out = out / jnp.linalg.norm(out.astype(jnp.float32), axis=-1, keepdims=True).astype(
                out.dtype
            )

        return unflatten_vid(out, t), [unflatten_vid(f, t) for f in inters]
