"""Equalized-learning-rate building blocks (StyleGAN2-style), NHWC, flax.

TPU-native re-implementations of the reference blocks in
`models/skip_vid_generator/models/skip_autoencoder.py:27-117` (autoencoder
ConvLayer/ResBlock with plain LeakyReLU(0.1)) and
`models/skip_vid_generator/models/gan.py:380-504` (discriminator
ConvLayer/ResBlock with FusedLeakyReLU(0.2)*sqrt(2)).

Parameters keep the torch layouts — conv ``weight (O, I, kh, kw)``, linear
``weight (O, I)`` — so reference checkpoints port by pure renaming; the NHWC
transposition happens inside `ccvs_tpu.ops.convops` where XLA folds it into
the convolution.
"""

import math
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ccvs_tpu.ops import conv2d, conv3d, conv_transpose2d, fused_leaky_relu, upfirdn2d
from ccvs_tpu.ops.fused_act import leaky_relu
from ccvs_tpu.ops.upfirdn2d import make_resample_kernel

BLUR_KERNEL = (1, 3, 3, 1)


class EqualConv2d(nn.Module):
    """Conv with runtime weight scale 1/sqrt(fan_in) (`skip_autoencoder.py:40-59`)."""

    in_channel: int
    out_channel: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    use_bias: bool = True
    transpose: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, shared=None, k=1):
        """Args:
          x: (N, H, W, C) input — with ``shared``, the per-item tail block of
            the logical concat input (N = B*k, C = in_channel - C0).
          shared: optional (B, H, W, C0) leading channel block that is
            identical across k consecutive batch entries of ``x`` (b-major
            k-minor, the decoder's context fold). By conv linearity
            ``conv(concat([tile(shared), x])) = tile(conv(shared, W[:, :C0]))
            + conv(x, W[:, C0:])`` — the shared part is computed once per
            batch element instead of k times (the decoder's InterBlocks
            repeat the frame features over skip_memory=15 contexts,
            `quantized_video_model.py:864-902`; ~29% of InterBlock conv MACs
            are this redundancy at the BAIR serving config).
        """
        # torch stores transposed-conv weight as (O, I, k, k) here because
        # the reference transposes at call time (`skip_autoencoder.py:55`).
        w = self.param(
            "weight",
            nn.initializers.normal(stddev=1.0),
            (self.out_channel, self.in_channel, self.kernel_size, self.kernel_size),
            jnp.float32,
        )
        scale = 1.0 / math.sqrt(self.in_channel * self.kernel_size**2)
        w = (w * scale).astype(self.dtype)
        b = None
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.out_channel,), jnp.float32)
            b = b.astype(self.dtype)
        x = x.astype(self.dtype)
        if self.transpose:
            assert shared is None
            # reference: conv_transpose2d(x, weight.transpose(0, 1) * scale)
            return conv_transpose2d(x, jnp.swapaxes(w, 0, 1), b, stride=self.stride, padding=self.padding)
        if shared is not None:
            c0 = shared.shape[-1]
            ys = conv2d(shared.astype(self.dtype), w[:, :c0], None,
                        stride=self.stride, padding=self.padding)
            ys = jnp.repeat(ys, k, axis=0)
            out = ys + conv2d(x, w[:, c0:], b, stride=self.stride, padding=self.padding)
        else:
            out = conv2d(x, w, b, stride=self.stride, padding=self.padding)
        return out.astype(self.dtype)


class EqualConv3d(nn.Module):
    """3D equalized conv (`gan.py:126-162`), NTHWC."""

    in_channel: int
    out_channel: int
    kernel_size: Tuple[int, int, int]
    stride: Tuple[int, int, int] = (1, 1, 1)
    padding: Tuple[int, int, int] = (0, 0, 0)
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        kt, kh, kw = self.kernel_size
        w = self.param(
            "weight",
            nn.initializers.normal(stddev=1.0),
            (self.out_channel, self.in_channel, kt, kh, kw),
            jnp.float32,
        )
        scale = 1.0 / math.sqrt(self.in_channel * kt * kh * kw)
        w = (w * scale).astype(self.dtype)
        b = None
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.out_channel,), jnp.float32)
            b = b.astype(self.dtype)
        return conv3d(x.astype(self.dtype), w, b, stride=self.stride, padding=self.padding)


class EqualLinear(nn.Module):
    """Equalized linear (`skip_autoencoder.py:479-507`)."""

    in_dim: int
    out_dim: int
    use_bias: bool = True
    bias_init: float = 0.0
    lr_mul: float = 1.0
    activation: Optional[str] = None  # None | "fused_lrelu"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        w = self.param(
            "weight",
            nn.initializers.normal(stddev=1.0 / self.lr_mul),
            (self.out_dim, self.in_dim),
            jnp.float32,
        )
        scale = (1.0 / math.sqrt(self.in_dim)) * self.lr_mul
        w = (w * scale).astype(self.dtype)
        x = x.astype(self.dtype)
        b = None
        if self.use_bias:
            b = self.param(
                "bias", nn.initializers.constant(self.bias_init), (self.out_dim,), jnp.float32
            )
            b = (b * self.lr_mul).astype(self.dtype)
        out = jnp.dot(x, w.T, preferred_element_type=self.dtype)
        if self.activation == "fused_lrelu":
            out = fused_leaky_relu(out, b)
        elif b is not None:
            out = out + b
        return out


class Blur(nn.Module):
    """FIR blur in fp32 (`skip_autoencoder.py:27-37`)."""

    pad: Tuple[int, int]
    upsample_factor: int = 1
    kernel: Tuple[int, ...] = BLUR_KERNEL

    @nn.compact
    def __call__(self, x):
        k = make_resample_kernel(self.kernel)
        if self.upsample_factor > 1:
            k = k * (self.upsample_factor**2)
        # reference computes the blur in float32 regardless of input dtype
        out = upfirdn2d(x.astype(jnp.float32), k, pad=self.pad)
        return out.astype(x.dtype)


class ConvLayerAE(nn.Module):
    """Autoencoder conv layer: [Blur] -> EqualConv -> [Blur] -> LeakyReLU(0.1).

    Mirrors `skip_autoencoder.py:66-102`; bias lives in the conv and the
    activation is a plain LeakyReLU with slope 0.1 and no sqrt(2) gain
    (unlike the discriminator ConvLayer).
    """

    in_channel: int
    out_channel: int
    kernel_size: int
    downsample: bool = False
    upsample: bool = False
    use_bias: bool = True
    activate: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, shared=None, k=1):
        # shared-x split convs exist only on the stride-1 path; silently
        # dropping the shared block here would run the conv on tail channels
        # against a full-width weight.
        assert shared is None or not (self.downsample or self.upsample), (
            "shared= is not supported on the down/upsample branches")
        blur_len = len(BLUR_KERNEL)
        if self.downsample:
            p = (blur_len - 2) + (self.kernel_size - 1)
            x = Blur(pad=((p + 1) // 2, p // 2), name="blur")(x)
            x = EqualConv2d(
                self.in_channel, self.out_channel, self.kernel_size,
                stride=2, padding=0, use_bias=self.use_bias, dtype=self.dtype, name="conv",
            )(x)
        elif self.upsample:
            x = EqualConv2d(
                self.in_channel, self.out_channel, self.kernel_size,
                stride=2, padding=0, use_bias=self.use_bias, transpose=True,
                dtype=self.dtype, name="conv",
            )(x)
            p = (blur_len - 2) - (self.kernel_size - 1)
            pad0 = (p + 1) // 2 + 1  # factor - 1 = 1
            pad1 = p // 2 + 1
            x = Blur(pad=(pad0, pad1), upsample_factor=2, name="blur")(x)
        else:
            x = EqualConv2d(
                self.in_channel, self.out_channel, self.kernel_size,
                stride=1, padding=self.kernel_size // 2, use_bias=self.use_bias,
                dtype=self.dtype, name="conv",
            )(x, shared=shared, k=k)
        if self.activate:
            x = leaky_relu(x, 0.1)
        return x


class ResBlockAE(nn.Module):
    """Residual down/up block (`skip_autoencoder.py:105-117`)."""

    in_channel: int
    out_channel: int
    downsample: bool = False
    upsample: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        out = ConvLayerAE(self.in_channel, self.in_channel, 3, dtype=self.dtype, name="conv1")(x)
        out = ConvLayerAE(
            self.in_channel, self.out_channel, 3,
            downsample=self.downsample, upsample=self.upsample, dtype=self.dtype, name="conv2",
        )(out)
        skip = ConvLayerAE(
            self.in_channel, self.out_channel, 1,
            downsample=self.downsample, upsample=self.upsample,
            activate=False, use_bias=False, dtype=self.dtype, name="skip",
        )(x)
        return (out + skip) * jnp.asarray(1.0 / math.sqrt(2.0), out.dtype)


class ConvLayerD(nn.Module):
    """Discriminator conv layer: [Blur] -> EqualConv -> FusedLeakyReLU.

    Mirrors `gan.py:380-421`; bias lives in the fused activation when
    activated, and the activation has slope 0.2 with sqrt(2) gain.
    """

    in_channel: int
    out_channel: int
    kernel_size: int
    downsample: bool = False
    use_bias: bool = True
    activate: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        blur_len = len(BLUR_KERNEL)
        if self.downsample:
            p = (blur_len - 2) + (self.kernel_size - 1)
            x = Blur(pad=((p + 1) // 2, p // 2), name="blur")(x)
            stride, padding = 2, 0
        else:
            stride, padding = 1, self.kernel_size // 2
        x = EqualConv2d(
            self.in_channel, self.out_channel, self.kernel_size,
            stride=stride, padding=padding,
            use_bias=self.use_bias and not self.activate, dtype=self.dtype, name="conv",
        )(x)
        if self.activate:
            b = None
            if self.use_bias:
                b = self.param("act_bias", nn.initializers.zeros, (self.out_channel,), jnp.float32)
                b = b.astype(x.dtype)
            x = fused_leaky_relu(x, b)
        return x


class ResBlockD(nn.Module):
    """Discriminator residual downsampling block (`gan.py:475-487`)."""

    in_channel: int
    out_channel: int
    downsample: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        out = ConvLayerD(self.in_channel, self.in_channel, 3, dtype=self.dtype, name="conv1")(x)
        out = ConvLayerD(
            self.in_channel, self.out_channel, 3, downsample=self.downsample,
            dtype=self.dtype, name="conv2",
        )(out)
        skip = ConvLayerD(
            self.in_channel, self.out_channel, 1, downsample=self.downsample,
            activate=False, use_bias=False, dtype=self.dtype, name="skip",
        )(x)
        return (out + skip) * jnp.asarray(1.0 / math.sqrt(2.0), out.dtype)


class ConvLayer3D(nn.Module):
    """3D conv layer for the video discriminator (`gan.py:424-472`), NTHWC."""

    in_channel: int
    out_channel: int
    kernel_size: object  # int or (kt, kh, kw)
    downsample: bool = False
    use_bias: bool = True
    activate: bool = True
    reduce_t: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        ks = self.kernel_size
        k = ks if isinstance(ks, int) else ks[-1]
        k_t = ks if isinstance(ks, int) else ks[0]
        kernel = (k_t, k, k) if isinstance(ks, int) or len(ks) == 3 else ks
        if isinstance(ks, int):
            kernel = (ks, ks, ks)
        if self.downsample:
            p = (len(BLUR_KERNEL) - 2) + (k - 1)
            b, t = x.shape[0], x.shape[1]
            xf = x.reshape(b * t, *x.shape[2:])
            xf = Blur(pad=((p + 1) // 2, p // 2), name="blur")(xf)
            x = xf.reshape(b, t, *xf.shape[1:])
            stride = (1, 2, 2)
            padding = (0, 0, 0) if self.reduce_t else (k_t // 2, 0, 0)
        else:
            stride = (1, 1, 1)
            padding = (k // 2, k // 2, k // 2)
        x = EqualConv3d(
            self.in_channel, self.out_channel, kernel, stride=stride, padding=padding,
            use_bias=self.use_bias and not self.activate, dtype=self.dtype, name="conv",
        )(x)
        if self.activate:
            bias = None
            if self.use_bias:
                bias = self.param("act_bias", nn.initializers.zeros, (self.out_channel,), jnp.float32)
                bias = bias.astype(x.dtype)
            x = fused_leaky_relu(x, bias)
        return x


class ResBlock3D(nn.Module):
    """3D residual block reducing time by 2 (`gan.py:490-504`)."""

    in_channel: int
    out_channel: int
    reduce_t: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        out = ConvLayer3D(self.in_channel, self.in_channel, 3, dtype=self.dtype, name="conv1")(x)
        out = ConvLayer3D(
            self.in_channel, self.out_channel, 3, downsample=True, reduce_t=self.reduce_t,
            dtype=self.dtype, name="conv2",
        )(out)
        kernel_skip = (3, 1, 1) if self.reduce_t else 1
        skip = ConvLayer3D(
            self.in_channel, self.out_channel, kernel_skip, downsample=True,
            activate=False, use_bias=False, reduce_t=self.reduce_t, dtype=self.dtype, name="skip",
        )(x)
        return (out + skip) * jnp.asarray(1.0 / math.sqrt(2.0), out.dtype)


class ToRGB(nn.Module):
    """Skip-RGB head (`skip_autoencoder.py:288-306`)."""

    in_channel: int
    upsample: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, skip=None):
        out = ConvLayerAE(self.in_channel, 3, 1, activate=False, dtype=self.dtype, name="conv")(x)
        bias = self.param("bias", nn.initializers.zeros, (1, 1, 1, 3), jnp.float32)
        out = out + bias.astype(out.dtype)
        if skip is not None:
            from ccvs_tpu.ops.upfirdn2d import upsample2x

            k = make_resample_kernel(BLUR_KERNEL)
            skip = upsample2x(skip.astype(jnp.float32), k).astype(out.dtype)
            out = out + skip
        return out


def minibatch_stddev(x, group_size, stddev_feat=1):
    """Minibatch standard-deviation feature (`gan.py:554-560`), NHWC."""
    b, h, w, c = x.shape
    group = min(b, group_size)
    y = x.reshape(group, -1, h, w, stddev_feat, c // stddev_feat)
    var = jnp.var(y.astype(jnp.float32), axis=0)
    stddev = jnp.sqrt(var + 1e-8)
    stddev = jnp.mean(stddev, axis=(1, 2, 4), keepdims=True)  # (-1,1,1,sf,1)->mean over h,w,c
    stddev = stddev.squeeze(4)  # (n, 1, 1, sf)
    stddev = jnp.tile(stddev, (group, h, w, 1)).astype(x.dtype)
    return jnp.concatenate([x, stddev], axis=-1)


def minibatch_stddev_3d(x, group_size, stddev_feat=1):
    """3D variant for the video discriminator (`gan.py:666-672`), NTHWC."""
    b, t, h, w, c = x.shape
    group = min(b, group_size)
    y = x.reshape(group, -1, t, h, w, stddev_feat, c // stddev_feat)
    var = jnp.var(y.astype(jnp.float32), axis=0)
    stddev = jnp.sqrt(var + 1e-8)
    stddev = jnp.mean(stddev, axis=(1, 2, 3, 5), keepdims=True)
    stddev = stddev.squeeze(5)
    stddev = jnp.tile(stddev, (group, t, h, w, 1)).astype(x.dtype)
    return jnp.concatenate([x, stddev], axis=-1)


def flatten_vid(x):
    """(B, T, H, W, C) -> (B*T, H, W, C), remembering T (reference
    `tools/utils.py:50-62`)."""
    if x.ndim == 5:
        b, t = x.shape[:2]
        return x.reshape(b * t, *x.shape[2:]), t
    return x, None


def unflatten_vid(x, t):
    if t is None:
        return x
    return x.reshape(x.shape[0] // t, t, *x.shape[1:])
