"""STFT audio autoencoder: spectrogram patches <-> audio tokens.

Re-implements `StftModel` (`models/skip_vid_generator/models/stft_model.py`):
conv AE over 64x16 spectrogram patches with a VQ bottleneck over 8x2 latents;
each frame contributes 16 audio tokens used as the transformer's state stream.
"""

import jax
import jax.numpy as jnp

from ccvs_tpu.config import StftConfig
from ccvs_tpu.nn.quantizer import VectorQuantizer
from ccvs_tpu.nn.state import StftDecoder, StftEncoder


class StftModel:
    def __init__(self, cfg: StftConfig, dtype=jnp.float32):
        self.cfg = cfg
        self.encoder = StftEncoder(cfg, dtype=dtype)
        self.decoder = StftDecoder(cfg, dtype=dtype)
        self.quantizer = VectorQuantizer(cfg.stft_num, cfg.stft_size, beta=0.25)

    def init(self, key):
        k1, k2, k3 = jax.random.split(key, 3)
        x = jnp.zeros((1, 64, 16, 1), jnp.float32)
        e = self.encoder.init(k1, x)["params"]
        lat = jnp.zeros((1, *self.cfg.stft_shape, self.cfg.stft_size), jnp.float32)
        q = self.quantizer.init(k2, lat)["params"]
        d = self.decoder.init(k3, lat)["params"]
        return {"encoder": e, "quantizer": q, "decoder": d}

    def encode(self, params, stft):
        """(B[,T], 64, 16, 1) -> token ids (B, T*16) (`stft_model.py:120-127`)."""
        lat = self.encoder.apply({"params": params["encoder"]}, stft)
        _, _, (_, idx) = self.quantizer.apply({"params": params["quantizer"]}, lat)
        return idx.reshape(idx.shape[0], -1)

    def decode(self, params, code):
        """Token ids -> spectrogram patches (`stft_model.py:129-133`)."""
        cfg = self.cfg
        lead = code.shape[0]
        idx = code.reshape(lead, -1, *cfg.stft_shape)
        lat = self.quantizer.apply(
            {"params": params["quantizer"]}, idx, method=VectorQuantizer.embed_code
        )
        return self.decoder.apply({"params": params["decoder"]}, lat)

    def loss(self, params, stft, vgg_fn=None):
        """MSE (+ optional perceptual) + VQ loss (`stft_model.py:84-110`)."""
        lat = self.encoder.apply({"params": params["encoder"]}, stft)
        lat_q, qloss, (perp, _) = self.quantizer.apply({"params": params["quantizer"]}, lat)
        rec = self.decoder.apply({"params": params["decoder"]}, lat_q)
        mse = jnp.mean((rec - stft) ** 2)
        loss = mse + qloss
        metrics = {"stft_mse": mse, "stft_quant": qloss, "stft_perp": perp}
        if vgg_fn is not None:
            v = vgg_fn(jnp.tile(rec, (1, 1, 1, 3)), jnp.tile(stft, (1, 1, 1, 3)))
            loss = loss + v
            metrics["stft_vgg"] = v
        return loss, metrics
