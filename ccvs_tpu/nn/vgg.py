"""VGG19 feature extractor for the perceptual loss.

TPU-native port of `models/skip_vid_generator/modules/perceptual.py`: five
conv slices of torchvision's VGG19, L1 feature distance with weights
[1/32, 1/16, 1/8, 1/4, 1].

Pretrained weights cannot be downloaded in this environment (zero egress);
:func:`load_vgg19_npz` ingests them from a vendored ``.npz`` (exported via
``ccvs_tpu.port.export_vgg``), and :func:`init_random` provides a fixed
random-filter fallback — random VGG features are a known usable perceptual
metric, and the loss becomes exact once weights are vendored.
"""

from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ccvs_tpu.ops import conv2d

# torchvision vgg19.features conv layer indices and channel plan
_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M", 512, 512, 512, 512, "M", 512, 512, 512, 512, "M"]
# slice boundaries in feature-layer indices (perceptual.py:10-24):
# slice1: layers [0,2), slice2: [2,7), slice3: [7,12), slice4: [12,21), slice5: [21,30)
_SLICE_ENDS = [2, 7, 12, 21, 30]
_WEIGHTS = [1.0 / 32, 1.0 / 16, 1.0 / 8, 1.0 / 4, 1.0]

_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_STD = np.array([0.229, 0.224, 0.225], np.float32)


def _layer_plan():
    """[(kind, in_ch, out_ch)] for torchvision vgg19.features[0:30]."""
    plan = []
    in_ch = 3
    idx = 0
    for c in _CFG:
        if c == "M":
            plan.append(("pool", None, None))
            idx += 1
        else:
            plan.append(("conv", in_ch, c))
            plan.append(("relu", None, None))
            in_ch = c
            idx += 2
        if idx >= 30:
            break
    return plan[:30]


def init_random(key) -> dict:
    """He-init fixed random filters (fallback when no vendored weights)."""
    params = {}
    i = 0
    for kind, cin, cout in _layer_plan():
        if kind == "conv":
            key, sub = jax.random.split(key)
            w = jax.random.normal(sub, (cout, cin, 3, 3), jnp.float32)
            w = w * jnp.sqrt(2.0 / (cin * 9))
            params[f"conv{i}"] = {"weight": w, "bias": jnp.zeros((cout,), jnp.float32)}
        i += 1
    return params


def load_vgg19_npz(path: str) -> dict:
    """Load weights exported by `python -m ccvs_tpu.port.export_vgg`."""
    raw = np.load(path)
    params = {}
    i = 0
    for kind, cin, cout in _layer_plan():
        if kind == "conv":
            params[f"conv{i}"] = {
                "weight": jnp.asarray(raw[f"features.{i}.weight"]),
                "bias": jnp.asarray(raw[f"features.{i}.bias"]),
            }
        i += 1
    return params


def _maxpool2x(x):
    b, h, w, c = x.shape
    return x.reshape(b, h // 2, 2, w // 2, 2, c).max(axis=(2, 4))


def features(params: dict, x: jnp.ndarray) -> List[jnp.ndarray]:
    """Five slice activations for NHWC input in [-1, 1]."""
    # [-1,1] -> imagenet normalization (reference feeds imagenet-normalized
    # tensors; our pipeline uses [-1,1], convert here)
    x = (x.astype(jnp.float32) + 1.0) * 0.5
    x = (x - _MEAN) / _STD
    outs = []
    i = 0
    for kind, cin, cout in _layer_plan():
        if kind == "conv":
            p = params[f"conv{i}"]
            x = conv2d(x, p["weight"], p["bias"], stride=1, padding=1)
        elif kind == "relu":
            x = jax.nn.relu(x)
        else:
            x = _maxpool2x(x)
        i += 1
        if i in _SLICE_ENDS:
            outs.append(x)
    return outs


def vgg_loss(params: dict, fake: jnp.ndarray, real: jnp.ndarray) -> jnp.ndarray:
    """Weighted L1 over the five slices (`perceptual.py:44-52`)."""
    ff = features(params, fake)
    fr = features(params, jax.lax.stop_gradient(real))
    loss = 0.0
    for w, a, b in zip(_WEIGHTS, ff, fr):
        loss = loss + w * jnp.mean(jnp.abs(a - jax.lax.stop_gradient(b)))
    return loss
