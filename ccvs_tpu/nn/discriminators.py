"""GAN discriminators: StyleGAN2 image D, 3D video D, latent-feature D.

TPU-native re-implementation of `models/skip_vid_generator/models/gan.py:
507-679`. NHWC / NTHWC layouts; minibatch-stddev groups are computed within
the per-device batch, matching the reference's per-GPU behavior under DDP.
"""

import math
from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from ccvs_tpu.config import AutoencoderConfig
from ccvs_tpu.nn.layers import (
    ConvLayer3D,
    ConvLayerD,
    EqualLinear,
    ResBlock3D,
    ResBlockD,
    flatten_vid,
    minibatch_stddev,
    minibatch_stddev_3d,
)


def _avg_pool2x(x):
    b, h, w, c = x.shape
    return x.reshape(b, h // 2, 2, w // 2, 2, c).mean(axis=(2, 4))


class ImageDiscriminator(nn.Module):
    """StyleGAN2 image discriminator (`gan.py:507-567`)."""

    cfg: AutoencoderConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        ndcf, mult = cfg.ndcf, cfg.ndcf_mult
        init_res = int(math.log2(cfg.z_shape[0])) - cfg.downsample_dis_num
        final_res = init_res + len(mult) - 1

        if cfg.n_consecutive_dis > 1:
            n = cfg.n_consecutive_dis
            x = x.reshape(x.shape[0] // n, n, *x.shape[1:])
            # stack consecutive frames on channels
            x = jnp.moveaxis(x, 1, -2).reshape(*x.shape[0:1], *x.shape[2:4], -1)
        for _ in range(cfg.downsample_dis_num):
            x = _avg_pool2x(x)

        block_in = ndcf * mult[0]
        out = ConvLayerD(3 * cfg.n_consecutive_dis, block_in, 1, dtype=self.dtype, name="conv0")(x)
        block_out = block_in
        for i in range(1, final_res - 1):
            if i < len(mult):
                block_out = ndcf * mult[i]
            out = ResBlockD(block_in, block_out, dtype=self.dtype, name=f"res{i}")(out)
            block_in = block_out

        out = minibatch_stddev(out, cfg.stddev_group)
        out = ConvLayerD(block_in + 1, block_in, 3, dtype=self.dtype, name="final_conv")(out)
        # reference flattens NCHW (C, H, W); transpose to match weight layout
        out = jnp.transpose(out, (0, 3, 1, 2)).reshape(out.shape[0], -1)
        out = EqualLinear(
            block_in * 4 * int(cfg.aspect_ratio * 4), block_in,
            activation="fused_lrelu", dtype=self.dtype, name="fc1",
        )(out)
        out = EqualLinear(block_in, 1, dtype=self.dtype, name="fc2")(out)
        return out


class VideoDiscriminator(nn.Module):
    """3D-conv video discriminator (`gan.py:614-679`), input (B, T, H, W, 3)."""

    cfg: AutoencoderConfig
    vid_len: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        ndcf, mult = cfg.ndcf, cfg.ndcf_mult
        init_res = int(math.log2(cfg.z_shape[0])) - cfg.downsample_vdis_num
        final_res = init_res + len(mult) - 1

        if cfg.downsample_vdis_num > 0:
            b, t = x.shape[:2]
            xf = x.reshape(b * t, *x.shape[2:])
            for _ in range(cfg.downsample_vdis_num):
                xf = _avg_pool2x(xf)
            x = xf.reshape(b, t, *xf.shape[1:])

        block_in = ndcf * mult[0]
        out = ConvLayer3D(3, block_in, 1, dtype=self.dtype, name="conv0")(x)
        len_t = self.vid_len
        block_out = block_in
        for i in range(1, final_res - 1):
            if i < len(mult):
                block_out = ndcf * mult[i]
            reduce_t = len_t > 2
            out = ResBlock3D(block_in, block_out, reduce_t=reduce_t, dtype=self.dtype, name=f"res{i}")(out)
            if reduce_t:
                len_t -= 2
            block_in = block_out

        out = minibatch_stddev_3d(out, 4)
        out = ConvLayer3D(block_in + 1, block_in, 3, dtype=self.dtype, name="final_conv")(out)
        out = jnp.transpose(out, (0, 4, 1, 2, 3)).reshape(out.shape[0], -1)
        out = EqualLinear(
            block_in * 4 * int(4 * cfg.aspect_ratio) * len_t, block_in,
            activation="fused_lrelu", dtype=self.dtype, name="fc1",
        )(out)
        out = EqualLinear(block_in, 1, dtype=self.dtype, name="fc2")(out)
        return out


class FeatureDiscriminator(nn.Module):
    """Latent-feature discriminator over z_q (`gan.py:570-611`)."""

    cfg: AutoencoderConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        x, _ = flatten_vid(x)
        out = ConvLayerD(cfg.z_size, 128, 1, dtype=self.dtype, name="conv0")(x)
        h, w = cfg.z_shape
        i = 0
        while h > 1 and w > 1:
            out = ResBlockD(128, 128, dtype=self.dtype, name=f"res{i}")(out)
            h //= 2
            w //= 2
            i += 1
        out = minibatch_stddev(out, 4)
        out = ConvLayerD(129, 128, 3, dtype=self.dtype, name="final_conv")(out)
        out = jnp.transpose(out, (0, 3, 1, 2)).reshape(out.shape[0], -1)
        out = EqualLinear(128 * h * w, 128, activation="fused_lrelu", dtype=self.dtype, name="fc1")(out)
        out = EqualLinear(128, 1, dtype=self.dtype, name="fc2")(out)
        return out
