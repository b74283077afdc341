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
# vgg16 variant: the backbone of the standard LPIPS 'vgg' calibration
# (reference scores LPIPS via piq, `tools/pytorch_metrics/metrics.py:12,46`,
# whose net is torchvision VGG16 sliced at relu{1_2,2_2,3_3,4_3,5_3})
_CFG16 = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M", 512, 512, 512, "M", 512, 512, 512, "M"]
_SLICE_ENDS16 = [4, 9, 16, 23, 30]
_WEIGHTS = [1.0 / 32, 1.0 / 16, 1.0 / 8, 1.0 / 4, 1.0]

_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_STD = np.array([0.229, 0.224, 0.225], np.float32)


def _layer_plan(arch: str = "vgg19"):
    """[(kind, in_ch, out_ch)] for torchvision ``{arch}.features[0:30]``."""
    plan = []
    in_ch = 3
    idx = 0
    for c in (_CFG if arch == "vgg19" else _CFG16):
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


def check_npz(path: Optional[str]) -> bool:
    """True iff ``path`` names an existing npz; False when no path was given
    (callers then use the random-filter fallback). An explicitly-given but
    MISSING path raises instead: a typo must not silently send a multi-hour
    training/eval run down the random-filter path (mirrors the i3d handling,
    `eval/fvd.py:197-200`)."""
    import os

    if not path:
        return False
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"vgg npz {path!r} does not exist -- pass a real exported npz "
            "or omit the flag to opt into the random-filter fallback"
        )
    return True


def warn_fallback(context: str):
    """Shout when a caller falls back to random filters, so nobody mistakes
    the resulting numbers for pretrained-VGG ones."""
    import sys

    print(
        "=" * 70 + f"\nWARNING: no vendored VGG19 weights -- {context} uses FIXED "
        "RANDOM filters.\nUsable for training signal / relative tracking, NOT "
        "comparable to the\nreference's pretrained-VGG results. Export with "
        "`python -m ccvs_tpu.port.export_vgg`\nand pass --vgg-npz.\n" + "=" * 70,
        file=sys.stderr,
    )


def init_random(key, arch: str = "vgg19") -> dict:
    """He-init fixed random filters (fallback when no vendored weights)."""
    params = {}
    i = 0
    for kind, cin, cout in _layer_plan(arch):
        if kind == "conv":
            key, sub = jax.random.split(key)
            w = jax.random.normal(sub, (cout, cin, 3, 3), jnp.float32)
            w = w * jnp.sqrt(2.0 / (cin * 9))
            params[f"conv{i}"] = {"weight": w, "bias": jnp.zeros((cout,), jnp.float32)}
        i += 1
    return params


def detect_arch(raw) -> str:
    """vgg19 has a conv at features[16]; vgg16 has a pool there."""
    return "vgg19" if "features.16.weight" in raw else "vgg16"


def load_vgg_npz(path: str, arch: Optional[str] = None):
    """Load weights exported by `ccvs_tpu.port.export_vgg` (either arch) or
    `ccvs_tpu.port.export_lpips` (vgg16 + lin calibration).

    Returns ``(params, arch, lins)``; ``lins`` is the list of per-slice LPIPS
    linear channel weights, or None when the npz carries none."""
    raw = np.load(path)
    arch = arch or detect_arch(raw)
    params = {}
    i = 0
    for kind, cin, cout in _layer_plan(arch):
        if kind == "conv":
            params[f"conv{i}"] = {
                "weight": jnp.asarray(raw[f"features.{i}.weight"]),
                "bias": jnp.asarray(raw[f"features.{i}.bias"]),
            }
        i += 1
    lins = None
    if "lin0" in raw:
        lins = [jnp.asarray(raw[f"lin{k}"]).reshape(-1) for k in range(5)]
    return params, arch, lins


def load_vgg19_npz(path: str) -> dict:
    """Back-compat wrapper: vgg19 params only."""
    return load_vgg_npz(path, arch="vgg19")[0]


def _maxpool2x(x):
    b, h, w, c = x.shape
    # odd sizes: drop the last row/col (torch MaxPool2d floor semantics)
    x = x[:, : h // 2 * 2, : w // 2 * 2]
    return x.reshape(b, h // 2, 2, w // 2, 2, c).max(axis=(2, 4))


def params_arch(params: dict) -> str:
    """Arch of a loaded params dict: vgg19 has a conv at features[16]
    (mirrors `detect_arch` on the raw npz)."""
    return "vgg19" if "conv16" in params else "vgg16"


def features(params: dict, x: jnp.ndarray, arch: Optional[str] = None) -> List[jnp.ndarray]:
    """Five slice activations for NHWC input in [-1, 1]. ``arch`` defaults
    to whatever the params dict was exported from (vgg19 or vgg16)."""
    arch = arch or params_arch(params)
    # [-1,1] -> imagenet normalization (reference feeds imagenet-normalized
    # tensors; our pipeline uses [-1,1], convert here). This equals the LPIPS
    # ScalingLayer (shift = 2*mean-1, scale = 2*std on [-1,1] inputs).
    x = (x.astype(jnp.float32) + 1.0) * 0.5
    x = (x - _MEAN) / _STD
    outs = []
    i = 0
    ends = _SLICE_ENDS if arch == "vgg19" else _SLICE_ENDS16
    for kind, cin, cout in _layer_plan(arch):
        if kind == "conv":
            p = params[f"conv{i}"]
            x = conv2d(x, p["weight"], p["bias"], stride=1, padding=1)
        elif kind == "relu":
            x = jax.nn.relu(x)
        else:
            x = _maxpool2x(x)
        i += 1
        if i in ends:
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
