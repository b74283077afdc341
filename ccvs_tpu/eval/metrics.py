"""Reconstruction metrics: PSNR, SSIM, LPIPS.

Replaces `tools/pytorch_metrics/metrics.py:12-78` (piq PSNR/LPIPS + skimage
SSIM). PSNR/SSIM are exact re-implementations (SSIM follows Wang et al. with
the 7x7 uniform window + channel averaging that scikit-image uses by default);
LPIPS is the standard normalized-VGG-feature distance driven by
`ccvs_tpu.nn.vgg` (exact once VGG19 weights are vendored).
"""

import os
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ccvs_tpu.nn import vgg as vgg_mod


def psnr(a: np.ndarray, b: np.ndarray, data_range: float = 1.0) -> float:
    """PSNR over [0, data_range] images."""
    mse = np.mean((np.asarray(a, np.float64) - np.asarray(b, np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return float(10 * np.log10(data_range**2 / mse))


def _uniform_filter(x, size):
    from scipy.ndimage import uniform_filter

    return uniform_filter(x, size=size, mode="reflect")


def ssim(a: np.ndarray, b: np.ndarray, data_range: float = 1.0, win_size: int = 7) -> float:
    """Mean SSIM, scikit-image default semantics (uniform window, K1=0.01,
    K2=0.03, per-channel then averaged). a, b: (H, W, C) in [0, data_range]."""
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    if a.ndim == 2:
        a, b = a[..., None], b[..., None]
    k1, k2 = 0.01, 0.03
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    nper = win_size**2
    cov_norm = nper / (nper - 1)
    vals = []
    for c in range(a.shape[-1]):
        ax, bx = a[..., c], b[..., c]
        ux = _uniform_filter(ax, win_size)
        uy = _uniform_filter(bx, win_size)
        uxx = _uniform_filter(ax * ax, win_size)
        uyy = _uniform_filter(bx * bx, win_size)
        uxy = _uniform_filter(ax * bx, win_size)
        vx = cov_norm * (uxx - ux * ux)
        vy = cov_norm * (uyy - uy * uy)
        vxy = cov_norm * (uxy - ux * uy)
        s = ((2 * ux * uy + c1) * (2 * vxy + c2)) / ((ux**2 + uy**2 + c1) * (vx + vy + c2))
        pad = (win_size - 1) // 2
        vals.append(s[pad:-pad, pad:-pad].mean())
    return float(np.mean(vals))


class LPIPS:
    """Perceptual distance over unit-normalized VGG features.

    With an npz from ``ccvs_tpu.port.export_lpips`` (VGG16 backbone + the
    standard per-slice linear channel weights of the richzhang `lin` 'vgg'
    checkpoint), this is the calibrated LPIPS the reference scores with piq
    (`tools/pytorch_metrics/metrics.py:12,46`). A plain VGG19/VGG16 npz gives
    uncalibrated (uniform-weight) distances; no npz at all falls back to
    random filters with a loud warning. Inputs in [-1, 1]; small images are
    upscaled to >=161px like the reference (`metrics.py:115-124`).
    """

    def __init__(self, vgg_npz: Optional[str] = None, key=None):
        self.lins = None
        self.arch = "vgg19"
        if vgg_mod.check_npz(vgg_npz):
            self.params, self.arch, self.lins = vgg_mod.load_vgg_npz(vgg_npz)
        else:
            vgg_mod.warn_fallback("LPIPS")
            self.params = vgg_mod.init_random(key or jax.random.PRNGKey(0))
        self.calibrated = self.lins is not None
        self._fn = jax.jit(self._dist)

    def _dist(self, a, b):
        if a.shape[1] < 161:
            # reference upscale to >=161px (`metrics.py:115-124`), done
            # on-device inside the jit: nearest-neighbor repeat, identical
            # numerics to the former host-side np.repeat but without
            # shipping the upscaled tensor through the (tunneled) transfer
            s = int(np.ceil(161 / a.shape[1]))
            a = jnp.repeat(jnp.repeat(a, s, axis=1), s, axis=2)
            b = jnp.repeat(jnp.repeat(b, s, axis=1), s, axis=2)
        fa = vgg_mod.features(self.params, a, arch=self.arch)
        fb = vgg_mod.features(self.params, b, arch=self.arch)
        total = 0.0
        for k, (x, y) in enumerate(zip(fa, fb)):
            xn = x / (jnp.linalg.norm(x, axis=-1, keepdims=True) + 1e-10)
            yn = y / (jnp.linalg.norm(y, axis=-1, keepdims=True) + 1e-10)
            sq = (xn - yn) ** 2
            if self.lins is not None:
                # calibrated: 1x1-conv channel weighting, then spatial mean
                total = total + jnp.mean(jnp.sum(sq * self.lins[k], axis=-1), axis=(1, 2))
            else:
                total = total + jnp.mean(jnp.sum(sq, axis=-1), axis=(1, 2))
        return total

    def __call__(self, a: np.ndarray, b: np.ndarray) -> np.ndarray:
        """a, b: (N, H, W, 3) in [-1, 1] -> (N,) distances."""
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        return np.asarray(self._fn(jnp.asarray(a), jnp.asarray(b)))


_lpips_cache = {}


def _get_lpips(vgg_npz=None):
    """One LPIPS instance (and so ONE jitted VGG program) per weight file
    within a process — repeated video_metrics calls in a scoring run share
    the compile (remote TPU compiles are minutes through the tunnel)."""
    if vgg_npz not in _lpips_cache:
        _lpips_cache[vgg_npz] = LPIPS(vgg_npz)
    return _lpips_cache[vgg_npz]


def lpips(a, b, vgg_npz=None):
    return _get_lpips(vgg_npz)(a, b)


def video_metrics(real_vids: np.ndarray, fake_vids: np.ndarray,
                  per_timestep: Optional[int] = None, vgg_npz=None) -> Dict[str, float]:
    """Batch metrics over (N, T, H, W, 3) videos in [0, 1]
    (`tools/pytorch_metrics/metrics.py:27-78`)."""
    n, t = real_vids.shape[:2]
    ts = [per_timestep] if per_timestep is not None else range(t)
    psnrs, ssims, lps = [], [], []
    lp = _get_lpips(vgg_npz)
    for i in range(n):
        for tt in ts:
            psnrs.append(psnr(real_vids[i, tt], fake_vids[i, tt]))
            ssims.append(ssim(real_vids[i, tt], fake_vids[i, tt]))
        a = real_vids[i][list(ts)] * 2 - 1
        b = fake_vids[i][list(ts)] * 2 - 1
        lps.extend(lp(a, b).tolist())
    lpips_key = "lpips" if lp.calibrated else "lpips_uncalibrated"
    return {
        "psnr": float(np.mean(psnrs)),
        "ssim": float(np.mean(ssims)),
        lpips_key: float(np.mean(lps)),
        # machine-readable marker (PSNR/SSIM are exact regardless; only the
        # perceptual key degrades without vendored calibrated weights)
        "lpips_fallback_weights": not lp.calibrated,
    }
