"""State model: estimator + scalar VQ over state coordinates.

Re-implements `StateModel` (`models/skip_vid_generator/models/state_model.py`):
a conv head predicting (x, y) in [0,1]^d from the frozen-AE latent z, plus a
scalar `VectorQuantizer(state_num, 1)` that tokenizes each coordinate.
"""

from typing import Optional

import jax
import jax.numpy as jnp

from ccvs_tpu.config import StateConfig
from ccvs_tpu.nn.quantizer import VectorQuantizer
from ccvs_tpu.nn.state import StateEstimator


class StateModel:
    def __init__(self, cfg: StateConfig, dtype=jnp.float32):
        self.cfg = cfg
        self.estimator = StateEstimator(cfg, dtype=dtype)
        self.quantizer = VectorQuantizer(cfg.state_num, 1, beta=0.25)

    def init(self, key):
        k1, k2 = jax.random.split(key)
        z = jnp.zeros((1, *self.cfg.z_shape, self.cfg.z_size), jnp.float32)
        e = self.estimator.init(k1, z)["params"]
        s = jnp.zeros((1, 1), jnp.float32)
        q = self.quantizer.init(k2, s)["params"]
        return {"estimator": e, "quantizer": q}

    def estimate(self, params, z):
        """z latents -> state vector in [0,1]^d (`state_model.py:78-97`)."""
        return self.estimator.apply({"params": params["estimator"]}, z)

    def encode(self, params, z=None, state=None):
        """z (or raw state) -> state token ids (`state_model.py:109-117`).

        Returns (B, T*state_size) ids for video input.
        """
        if state is None:
            state = self.estimate(params, z)
        sf = state[..., None]  # scalar codebook: one token per coordinate
        _, _, (_, idx) = self.quantizer.apply({"params": params["quantizer"]}, sf)
        lead = idx.shape[0]
        return idx.reshape(lead, -1)

    def decode(self, params, state_code):
        """Token ids -> state values (`state_model.py:119-124`)."""
        vals = self.quantizer.apply(
            {"params": params["quantizer"]}, state_code, method=VectorQuantizer.embed_code
        )
        return vals[..., 0]

    def loss(self, params, z, state_target):
        """Regression + VQ loss (`state_model.py:78-107`)."""
        pred = self.estimate(params, z)
        reg = jnp.mean((pred - state_target) ** 2)
        sf = jax.lax.stop_gradient(state_target)[..., None]
        _, qloss, (perp, _) = self.quantizer.apply({"params": params["quantizer"]}, sf)
        return reg + qloss, {"state_reg": reg, "state_quant": qloss, "state_perp": perp}
