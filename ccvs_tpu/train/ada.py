"""StyleGAN2-ADA non-leaking augmentation.

TPU-native port of `models/skip_vid_generator/modules/non_leaking.py`:

- :func:`sample_affine` / :func:`sample_color`: the exact per-sample random
  transform cascade (flip, 90-degree rotation, integer translate, isotropic /
  anisotropic scale, pre/post rotation, fractional translate; brightness,
  contrast, luma flip, hue rotation, saturation), each applied with
  probability ``p`` (`non_leaking.py:192-280`).
- :func:`augment`: geometric warp executed at 2x resolution with sym6-wavelet
  up/downsampling around a bilinear grid sample (`non_leaking.py:388-447`),
  then the 4x4 color matrix. Pure jnp — differentiable (the reference needed
  custom double-grad Functions; JAX gets those for free), batched, NHWC.
- The adaptive-p controller lives in `ccvs_tpu.train.steps` (psum'd sign
  statistic).

The whole pipeline is fixed-shape: the reference re-pads per batch from the
sampled matrices (`get_padding`); here the canvas uses the worst-case pad
(width-1), which is what the reference clamps to anyway (`non_leaking.py:315`).
"""

import math
from functools import partial

import jax
import jax.numpy as jnp

from ccvs_tpu.ops import grid_sample, upfirdn2d

SYM6 = jnp.asarray(
    (0.015404109327027373, 0.0034907120842174702, -0.11799011114819057,
     -0.048311742585633, 0.4910559419267466, 0.787641141030194,
     0.3379294217276218, -0.07263752278646252, -0.021060292512300564,
     0.04472490177066578, 0.0017677118642428036, -0.007800708325034148),
    jnp.float32,
)


def _eye(b, n=3):
    return jnp.tile(jnp.eye(n, dtype=jnp.float32)[None], (b, 1, 1))


def _apply(rng, p, mat, prev):
    b = mat.shape[0]
    sel = jax.random.bernoulli(rng, p, (b, 1, 1)).astype(jnp.float32)
    m = sel * mat + (1 - sel) * jnp.eye(mat.shape[-1], dtype=jnp.float32)[None]
    return m @ prev


def _translate(tx, ty):
    b = tx.shape[0]
    m = _eye(b)
    m = m.at[:, 0, 2].set(tx)
    m = m.at[:, 1, 2].set(ty)
    return m


def _rotate(theta):
    b = theta.shape[0]
    c, s = jnp.cos(theta), jnp.sin(theta)
    m = _eye(b)
    m = m.at[:, 0, 0].set(c).at[:, 0, 1].set(-s)
    m = m.at[:, 1, 0].set(s).at[:, 1, 1].set(c)
    return m


def _scale(sx, sy):
    b = sx.shape[0]
    m = _eye(b)
    m = m.at[:, 0, 0].set(sx).at[:, 1, 1].set(sy)
    return m


def sample_affine(rng, p, b, height, width):
    """Random affine cascade (`non_leaking.py:192-249`)."""
    ks = jax.random.split(rng, 16)
    G = _eye(b)
    # flip
    f = jax.random.randint(ks[0], (b,), 0, 2).astype(jnp.float32)
    G = _apply(ks[1], p, _scale(1 - 2 * f, jnp.ones(b)), G)
    # 90-degree rotation (param in {0, 3})
    r = jax.random.randint(ks[2], (b,), 0, 2).astype(jnp.float32) * 3
    G = _apply(ks[3], p, _rotate(-math.pi / 2 * r), G)
    # integer translate
    t = jax.random.uniform(ks[4], (b,), minval=-0.125, maxval=0.125)
    G = _apply(ks[5], p, _translate(jnp.round(t * width) / width, jnp.round(t * height) / height), G)
    # isotropic scale
    s = jnp.exp(jax.random.normal(ks[6], (b,)) * (0.2 * math.log(2)))
    G = _apply(ks[7], p, _scale(s, s), G)
    # trace-safe form of `1 - sqrt(1 - p) if p < 1 else 1` (p may be the
    # traced adaptive probability inside a jitted train step)
    p_rot = 1 - jnp.sqrt(jnp.clip(1.0 - p, 0.0, 1.0))
    # pre-rotate
    th = jax.random.uniform(ks[8], (b,), minval=-math.pi, maxval=math.pi)
    G = _apply(ks[9], p_rot, _rotate(-th), G)
    # anisotropic scale
    s = jnp.exp(jax.random.normal(ks[10], (b,)) * (0.2 * math.log(2)))
    G = _apply(ks[11], p, _scale(s, 1 / s), G)
    # post-rotate
    th = jax.random.uniform(ks[12], (b,), minval=-math.pi, maxval=math.pi)
    G = _apply(ks[13], p_rot, _rotate(-th), G)
    # fractional translate
    t = jax.random.normal(ks[14], (b,)) * 0.125
    G = _apply(ks[15], p, _translate(t, t), G)
    return G


def _translate3d(t):
    b = t.shape[0]
    m = jnp.tile(jnp.eye(4, dtype=jnp.float32)[None], (b, 1, 1))
    return m.at[:, 0, 3].set(t).at[:, 1, 3].set(t).at[:, 2, 3].set(t)


def _scale3d(s):
    b = s.shape[0]
    m = jnp.tile(jnp.eye(4, dtype=jnp.float32)[None], (b, 1, 1))
    return m.at[:, 0, 0].set(s).at[:, 1, 1].set(s).at[:, 2, 2].set(s)


def _rotate3d(axis, theta):
    u = jnp.asarray(axis, jnp.float32)
    eye = jnp.eye(3, dtype=jnp.float32)
    cross = jnp.asarray(
        [[0, -u[2], u[1]], [u[2], 0, -u[0]], [-u[1], u[0], 0]], jnp.float32
    )
    outer = jnp.outer(u, u)
    s = jnp.sin(theta)[:, None, None]
    c = jnp.cos(theta)[:, None, None]
    rot = c * eye[None] + s * cross[None] + (1 - c) * outer[None]
    b = theta.shape[0]
    m = jnp.tile(jnp.eye(4, dtype=jnp.float32)[None], (b, 1, 1))
    return m.at[:, :3, :3].set(rot)


def _luma_flip(axis, i):
    u = jnp.asarray(axis + (0.0,), jnp.float32)
    b = i.shape[0]
    eye = jnp.eye(4, dtype=jnp.float32)
    flip = eye[None] - 2.0 * jnp.outer(u, u)[None] * i[:, None, None]
    return flip


def _saturation(axis, i):
    u = jnp.asarray(axis + (0.0,), jnp.float32)
    outer = jnp.outer(u, u)
    b = i.shape[0]
    eye = jnp.eye(4, dtype=jnp.float32)
    return outer[None] + (eye - outer)[None] * i[:, None, None]


def sample_color(rng, p, b):
    """Random color-matrix cascade (`non_leaking.py:252-280`)."""
    ks = jax.random.split(rng, 10)
    axis = (1 / math.sqrt(3),) * 3
    C = jnp.tile(jnp.eye(4, dtype=jnp.float32)[None], (b, 1, 1))
    # brightness
    t = jax.random.normal(ks[0], (b,)) * 0.2
    C = _apply(ks[1], p, _translate3d(t), C)
    # contrast
    s = jnp.exp(jax.random.normal(ks[2], (b,)) * (0.5 * math.log(2)))
    C = _apply(ks[3], p, _scale3d(s), C)
    # luma flip
    f = jax.random.randint(ks[4], (b,), 0, 2).astype(jnp.float32)
    C = _apply(ks[5], p, _luma_flip(axis, f), C)
    # hue rotation
    th = jax.random.uniform(ks[6], (b,), minval=-math.pi, maxval=math.pi)
    C = _apply(ks[7], p, _rotate3d(axis, th), C)
    # saturation
    s = jnp.exp(jax.random.normal(ks[8], (b,)) * math.log(2))
    C = _apply(ks[9], p, _saturation(axis, s), C)
    return C


def apply_color(img, C):
    """(B, H, W, 3) @ color matrix (`non_leaking.py:449-459`)."""
    mul = C[:, :3, :3]
    add = C[:, :3, 3]
    return jnp.einsum("bhwc,bdc->bhwd", img, mul) + add[:, None, None, :]


def apply_affine(img, G, kernel=SYM6, pad_frac=0.25):
    """Geometric warp with 2x wavelet up/downsampling (`non_leaking.py:388-447`).

    ``G`` maps output coords to input coords (the reference inverts the
    sampled matrix before calling this; :func:`augment` does the same).
    Fixed reflect padding of ``pad_frac``*size replaces the reference's
    per-batch dynamic padding (`get_padding`, clamped to width-1): XLA needs
    a static canvas, and 1/4 covers the cascade's typical extent (integer +
    fractional translate are ±0.125 each; rarer large scale/rotation combos
    sample into the reflected border instead of a wider one — at 256^2 a
    half-size pad would make the 2x canvas 1024^2 and blow HBM).
    """
    b, h, w, c = img.shape
    len_k = kernel.shape[0]
    pad_k = len_k // 4
    pad_x, pad_y = int(w * pad_frac), int(h * pad_frac)
    img_pad = jnp.pad(img, ((0, 0), (pad_y, pad_y), (pad_x, pad_x), (0, 0)), mode="reflect")

    # 2x upsample with sym6 (separable)
    up_pad = ((len_k + 2 - 1) // 2, (len_k - 2) // 2)
    k_col = kernel[:, None] * jnp.ones((1, 1), jnp.float32)  # (len_k, 1)
    k_row = kernel[None, :] * jnp.ones((1, 1), jnp.float32)  # (1, len_k)
    x = upfirdn2d(img_pad, k_row, up=(2, 1), pad=(up_pad[0], up_pad[1], 0, 0))
    x = upfirdn2d(x, k_col, up=(1, 2), pad=(0, 0, up_pad[0], up_pad[1]))

    hp, wp = img_pad.shape[1:3]
    h2, w2 = x.shape[1:3]

    # sample grid in normalized output coords -> input coords via G, using the
    # reference's coordinate chain (`non_leaking.py:417-431`):
    #   in_norm = S(2/w2) . T(-1/2) . S(2) . G . S(1/2) . T(1/2) . S(shape/2) . out_norm
    out_h, out_w = (h + pad_k * 2) * 2, (w + pad_k * 2) * 2
    ys = (2 * jnp.arange(out_h) + 1) / out_h - 1  # pixel centers (align_corners=False)
    xs = (2 * jnp.arange(out_w) + 1) / out_w - 1
    gx, gy = jnp.meshgrid(xs, ys)
    coords = jnp.stack([gx, gy, jnp.ones_like(gx)], axis=-1).reshape(-1, 3)

    def diag3(a, bb):
        return jnp.asarray([[a, 0, 0], [0, bb, 0], [0, 0, 1]], jnp.float32)

    def trans3(a):
        return jnp.asarray([[1, 0, a], [0, 1, a], [0, 0, 1]], jnp.float32)

    chain = (
        diag3(2 / w2, 2 / h2)
        @ trans3(-0.5)
        @ diag3(2.0, 2.0)
    )
    tail = diag3(0.5, 0.5) @ trans3(0.5) @ diag3(out_w / 2, out_h / 2)
    Gn = jnp.einsum("ij,bjk,kl->bil", chain, G, tail)
    sample = jnp.einsum("nk,bik->bni", coords, Gn)[..., :2].reshape(b, out_h, out_w, 2)
    x = grid_sample(x, sample)

    # 2x downsample with flipped sym6
    kf = jnp.flip(kernel)
    d0 = -pad_k * 2 + (len_k - 2 + 1) // 2
    d1 = -pad_k * 2 + (len_k - 2) // 2
    kf_row = kf[None, :] * jnp.ones((1, 1), jnp.float32)
    kf_col = kf[:, None] * jnp.ones((1, 1), jnp.float32)
    x = upfirdn2d(x, kf_row, down=(2, 1), pad=(d0, d1, 0, 0))
    x = upfirdn2d(x, kf_col, down=(1, 2), pad=(0, 0, d0, d1))
    return x


def augment(rng, img, p):
    """Full ADA augmentation (`non_leaking.py:460-463`): geometric + color.

    Args:
      img: (B, H, W, 3) in [-1, 1]; ``p``: augmentation probability.
    """
    if isinstance(p, (int, float)) and p <= 0:  # static-p fast path only
        return img
    b, h, w, _ = img.shape
    k1, k2 = jax.random.split(rng)
    G = jnp.linalg.inv(sample_affine(k1, p, b, h, w))
    out = apply_affine(img.astype(jnp.float32), G)
    C = sample_color(k2, p, b)
    out = apply_color(out, C)
    return out.astype(img.dtype)
