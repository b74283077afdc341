"""State estimator and STFT audio autoencoder networks.

TPU-native re-implementation of `StateEstimator` / `StftEncoder` /
`StftDecoder` (`models/skip_vid_generator/models/skip_autoencoder.py:510-556`).
"""

import flax.linen as nn
import jax
import jax.numpy as jnp

from ccvs_tpu.config import StateConfig, StftConfig
from ccvs_tpu.nn.layers import ConvLayerAE, EqualLinear, flatten_vid, unflatten_vid


class StateEstimator(nn.Module):
    """Predicts a state vector (e.g. (x, y) arm position) in [0,1]^d from the
    latent z grid (`skip_autoencoder.py:510-528`)."""

    cfg: StateConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z):
        cfg = self.cfg
        z, t = flatten_vid(z)
        h, w = cfg.z_shape
        in_size = cfg.z_size
        out = z
        i = 0
        while h > 1 and w > 1:
            out = ConvLayerAE(in_size, cfg.state_hsize, 3, downsample=True, dtype=self.dtype, name=f"conv{i}")(out)
            h //= 2
            w //= 2
            in_size = cfg.state_hsize
            i += 1
        out = jnp.transpose(out, (0, 3, 1, 2)).reshape(out.shape[0], -1)
        out = EqualLinear(cfg.state_hsize * h * w, cfg.state_size, dtype=self.dtype, name="fc")(out)
        out = jax.nn.sigmoid(out)
        return unflatten_vid(out, t)


class StftEncoder(nn.Module):
    """64x16 spectrogram patch -> 8x2 latent (`skip_autoencoder.py:530-542`)."""

    cfg: StftConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        x, t = flatten_vid(x)
        out = ConvLayerAE(1, cfg.stft_hsize, 1, dtype=self.dtype, name="conv0")(x)
        for i in range(3):
            out = ConvLayerAE(cfg.stft_hsize, cfg.stft_hsize, 3, downsample=True, dtype=self.dtype, name=f"conv{i+1}")(out)
        out = ConvLayerAE(cfg.stft_hsize, cfg.stft_size, 3, dtype=self.dtype, name="conv4")(out)
        return unflatten_vid(out, t)


class StftDecoder(nn.Module):
    """8x2 latent -> 64x16 spectrogram patch, tanh (`skip_autoencoder.py:544-556`)."""

    cfg: StftConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        x, t = flatten_vid(x)
        out = ConvLayerAE(cfg.stft_size, cfg.stft_hsize, 3, dtype=self.dtype, name="conv0")(x)
        for i in range(3):
            out = ConvLayerAE(cfg.stft_hsize, cfg.stft_hsize, 3, upsample=True, dtype=self.dtype, name=f"conv{i+1}")(out)
        out = ConvLayerAE(cfg.stft_hsize, 1, 1, dtype=self.dtype, name="conv4")(out)
        out = jnp.tanh(out)
        return unflatten_vid(out, t)
