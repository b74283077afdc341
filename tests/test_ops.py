"""Unit tests for the ops layer against torch CPU oracles.

The reference ships CPU fallbacks of its CUDA ops as de-facto correctness
oracles (`modules/upfirdn2d.py:162`, `modules/fused_act.py:106`); we use
torch CPU the same way.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from ccvs_tpu.ops import (
    backwarp,
    conv2d,
    conv3d,
    conv_transpose2d,
    fused_leaky_relu,
    local_correlation,
    make_backwarp_grid,
    make_resample_kernel,
    upfirdn2d,
    vq_embed,
    vq_lookup,
)
from ccvs_tpu.ops.vq import vq_loss, vq_perplexity, vq_st


def nchw(x_nhwc):
    return np.transpose(x_nhwc, (0, 3, 1, 2))


def nhwc(x_nchw):
    return np.transpose(x_nchw, (0, 2, 3, 1))


def upfirdn2d_torch(x_nchw, kernel, up, down, pad):
    """Reference CPU implementation (mirrors `upfirdn2d.py:162-203`)."""
    x = torch.from_numpy(x_nchw)
    k = torch.from_numpy(np.asarray(kernel, np.float32))
    _, channel, in_h, in_w = x.shape
    x = x.reshape(-1, in_h, in_w, 1)
    kernel_h, kernel_w = k.shape
    out = x.view(-1, in_h, 1, in_w, 1, 1)
    out = F.pad(out, [0, 0, 0, up - 1, 0, 0, 0, up - 1])
    out = out.view(-1, in_h * up, in_w * up, 1)
    out = F.pad(out, [0, 0, max(pad[0], 0), max(pad[1], 0), max(pad[0], 0), max(pad[1], 0)])
    out = out[
        :,
        max(-pad[0], 0) : out.shape[1] - max(-pad[1], 0),
        max(-pad[0], 0) : out.shape[2] - max(-pad[1], 0),
        :,
    ]
    out = out.permute(0, 3, 1, 2)
    out = out.reshape([-1, 1, in_h * up + pad[0] + pad[1], in_w * up + pad[0] + pad[1]])
    w = torch.flip(k, [0, 1]).view(1, 1, kernel_h, kernel_w)
    out = F.conv2d(out, w)
    out = out.reshape(-1, 1, in_h * up + pad[0] + pad[1] - kernel_h + 1, in_w * up + pad[0] + pad[1] - kernel_w + 1)
    out = out.permute(0, 2, 3, 1)
    out = out[:, ::down, ::down, :]
    out_h = (in_h * up + pad[0] + pad[1] - kernel_h) // down + 1
    out_w = (in_w * up + pad[0] + pad[1] - kernel_w) // down + 1
    return out.view(-1, channel, out_h, out_w).numpy()


@pytest.mark.parametrize(
    "up,down,pad",
    [(1, 1, (1, 1)), (2, 1, (2, 1)), (1, 2, (2, 1)), (2, 2, (1, 1)), (1, 1, (2, 2))],
)
def test_upfirdn2d_matches_torch(rng, up, down, pad):
    x = rng.randn(2, 7, 9, 3).astype(np.float32)
    k = np.array([1.0, 3.0, 3.0, 1.0], np.float32)
    k2 = np.outer(k, k) / np.outer(k, k).sum()
    want = upfirdn2d_torch(nchw(x), k2, up, down, pad)
    got = np.asarray(upfirdn2d(jnp.asarray(x), jnp.asarray(k2), up=up, down=down, pad=pad))
    np.testing.assert_allclose(nchw(got), want, rtol=1e-5, atol=1e-5)


def test_fused_leaky_relu_matches_torch(rng):
    x = rng.randn(2, 5, 5, 8).astype(np.float32)
    b = rng.randn(8).astype(np.float32)
    want = (F.leaky_relu(torch.from_numpy(nchw(x)) + torch.from_numpy(b).view(1, -1, 1, 1), 0.2) * 2**0.5).numpy()
    got = np.asarray(fused_leaky_relu(jnp.asarray(x), jnp.asarray(b)))
    np.testing.assert_allclose(nchw(got), want, rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("stride,padding,groups", [(1, 1, 1), (2, 0, 1), (1, 2, 2)])
def test_conv2d_matches_torch(rng, stride, padding, groups):
    x = rng.randn(2, 8, 8, 6).astype(np.float32)
    w = rng.randn(4, 6 // groups, 3, 3).astype(np.float32)
    b = rng.randn(4).astype(np.float32)
    want = F.conv2d(torch.from_numpy(nchw(x)), torch.from_numpy(w), torch.from_numpy(b), stride=stride, padding=padding, groups=groups).numpy()
    got = np.asarray(conv2d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b), stride=stride, padding=padding, groups=groups))
    np.testing.assert_allclose(nchw(got), want, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("stride,padding,groups", [(2, 0, 1), (2, 1, 1), (2, 1, 2)])
def test_conv_transpose2d_matches_torch(rng, stride, padding, groups):
    x = rng.randn(2, 5, 6, 4).astype(np.float32)
    w = rng.randn(4, 6 // groups, 4, 4).astype(np.float32)
    b = rng.randn(6).astype(np.float32)
    want = F.conv_transpose2d(torch.from_numpy(nchw(x)), torch.from_numpy(w), torch.from_numpy(b), stride=stride, padding=padding, groups=groups).numpy()
    got = np.asarray(conv_transpose2d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b), stride=stride, padding=padding, groups=groups))
    np.testing.assert_allclose(nchw(got), want, rtol=1e-4, atol=1e-4)


def test_conv3d_matches_torch(rng):
    x = rng.randn(2, 6, 8, 8, 3).astype(np.float32)  # NTHWC
    w = rng.randn(5, 3, 3, 3, 3).astype(np.float32)
    b = rng.randn(5).astype(np.float32)
    xt = torch.from_numpy(np.transpose(x, (0, 4, 1, 2, 3)))
    want = F.conv3d(xt, torch.from_numpy(w), torch.from_numpy(b), stride=1, padding=1).numpy()
    got = np.asarray(conv3d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b), stride=1, padding=1))
    np.testing.assert_allclose(np.transpose(got, (0, 4, 1, 2, 3)), want, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("c", [3, 16])  # planes path (C<8) and slice-gather path
def test_grid_sample_matches_torch(rng, c):
    x = rng.randn(2, 9, 11, c).astype(np.float32)
    flow = (rng.randn(2, 9, 11, 2) * 3).astype(np.float32)
    grid = np.asarray(make_backwarp_grid(9, 11))
    norm = np.stack([flow[..., 0] / ((11 - 1) / 2.0), flow[..., 1] / ((9 - 1) / 2.0)], axis=-1)
    sample = grid[None] + norm
    want = F.grid_sample(
        torch.from_numpy(nchw(x)),
        torch.from_numpy(sample),
        mode="bilinear",
        padding_mode="zeros",
        align_corners=False,
    ).numpy()
    got = np.asarray(backwarp(jnp.asarray(x), jnp.asarray(flow)))
    np.testing.assert_allclose(nchw(got), want, rtol=1e-4, atol=1e-4)


def correlation_torch(first, second, stride):
    """Direct NCHW oracle mirroring the CUDA kernel semantics
    (`modules/correlation.py:32-100`)."""
    b, c, h, w = first.shape
    ho = -(-h // stride)
    wo = -(-w // stride)
    pad = 3 * stride
    sec = np.zeros((b, c, h + 2 * pad, w + 2 * pad), first.dtype)
    sec[:, :, pad : pad + h, pad : pad + w] = second
    out = np.zeros((b, 49, ho, wo), first.dtype)
    for dy in range(-3, 4):
        for dx in range(-3, 4):
            ch = (dy + 3) * 7 + (dx + 3)
            for y in range(ho):
                for x in range(wo):
                    yy = y * stride + pad + dy * stride
                    xx = x * stride + pad + dx * stride
                    out[:, ch, y, x] = (
                        first[:, :, y * stride, x * stride] * sec[:, :, yy, xx]
                    ).mean(axis=1)
    return out


@pytest.mark.parametrize("stride", [1, 2])
def test_local_correlation(rng, stride):
    x = rng.randn(2, 8, 10, 6).astype(np.float32)
    y = rng.randn(2, 8, 10, 6).astype(np.float32)
    want = correlation_torch(nchw(x), nchw(y), stride)
    got = np.asarray(local_correlation(jnp.asarray(x), jnp.asarray(y), stride=stride))
    np.testing.assert_allclose(nchw(got), want, rtol=1e-4, atol=1e-5)


def test_local_correlation_grad(rng):
    x = jnp.asarray(rng.randn(1, 6, 6, 4).astype(np.float32))
    y = jnp.asarray(rng.randn(1, 6, 6, 4).astype(np.float32))

    def f(a, b):
        return jnp.sum(local_correlation(a, b, stride=1) ** 2)

    ga, gb = jax.grad(f, argnums=(0, 1))(x, y)
    assert ga.shape == x.shape and gb.shape == y.shape
    assert np.isfinite(np.asarray(ga)).all() and np.isfinite(np.asarray(gb)).all()


def test_vq_lookup_matches_torch_semantics(rng):
    z = rng.randn(7, 5, 16).astype(np.float32)
    cb = rng.randn(32, 16).astype(np.float32)
    zq, idx = vq_lookup(jnp.asarray(z), jnp.asarray(cb))
    # torch-style oracle (quantize.py:45-55)
    zf = z.reshape(-1, 16)
    d = (zf**2).sum(1, keepdims=True) + (cb**2).sum(1) - 2 * zf @ cb.T
    want_idx = d.argmin(1)
    np.testing.assert_array_equal(np.asarray(idx).reshape(-1), want_idx)
    np.testing.assert_allclose(np.asarray(zq).reshape(-1, 16), cb[want_idx], rtol=1e-6)


def test_vq_st_and_loss(rng):
    z = jnp.asarray(rng.randn(4, 8).astype(np.float32))
    cb = jnp.asarray(rng.randn(16, 8).astype(np.float32))

    def f(z):
        z_q, _ = vq_lookup(z, cb)
        return jnp.sum(vq_st(z, z_q))

    g = jax.grad(f)(z)
    np.testing.assert_allclose(np.asarray(g), np.ones((4, 8)), rtol=1e-6)
    z_q, idx = vq_lookup(z, cb)
    loss = vq_loss(z, z_q)
    assert np.isfinite(float(loss))
    p = vq_perplexity(idx, 16)
    assert 1.0 <= float(p) <= 16.0


def test_vq_embed_mult(rng):
    cb = jnp.asarray(rng.randn(8, 4).astype(np.float32))
    idx = jnp.asarray(rng.randint(0, 8, size=(2, 6)))
    z = vq_embed(idx, cb, mult=2)
    assert z.shape == (2, 3, 8)


def test_vq_pallas_matches_jnp(rng):
    """Fused Pallas VQ (interpret mode on CPU) must match the jnp path."""
    from ccvs_tpu.ops.vq_pallas import vq_lookup_pallas

    z = rng.randn(100, 64).astype(np.float32)
    cb = rng.randn(1024, 64).astype(np.float32)
    zq_ref, idx_ref = vq_lookup(jnp.asarray(z), jnp.asarray(cb))
    zq, idx = vq_lookup_pallas(jnp.asarray(z), jnp.asarray(cb), interpret=True)
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(idx_ref))
    np.testing.assert_allclose(np.asarray(zq), np.asarray(zq_ref), rtol=1e-6)


def test_misc_ops(rng):
    from ccvs_tpu.ops.misc import (
        bilinear_interpolate, contrastive_loss, nearest_interpolate, nll_vMF,
        pixel_norm,
    )

    # vMF NLL finite + differentiable; matches scipy formula directly
    pred = jnp.asarray(rng.randn(4, 8).astype(np.float32) * 3)
    tgt = rng.randn(4, 8).astype(np.float32)
    tgt = jnp.asarray(tgt / np.linalg.norm(tgt, axis=1, keepdims=True))
    val = nll_vMF(pred, tgt)
    assert np.isfinite(float(val))
    from scipy import special
    kappa = np.linalg.norm(np.asarray(pred), axis=1)
    m = 8
    log_c = (m / 2 - 1) * np.log(kappa) - (m / 2) * np.log(2 * np.pi) - (
        np.log(special.ive(m / 2 - 1, kappa)) + kappa
    )
    want = np.mean(-log_c - np.sum(np.asarray(pred) * np.asarray(tgt), axis=1))
    np.testing.assert_allclose(float(val), want, rtol=1e-4)
    g = jax.grad(lambda p: nll_vMF(p, tgt))(pred)
    assert np.isfinite(np.asarray(g)).all()

    x = jnp.asarray(rng.randn(2, 8, 8, 4).astype(np.float32))
    assert bilinear_interpolate(x).shape == (2, 16, 16, 4)
    assert nearest_interpolate(x).shape == (2, 16, 16, 4)
    pn = pixel_norm(x)
    np.testing.assert_allclose(
        np.mean(np.asarray(pn) ** 2, axis=-1), np.ones((2, 8, 8)), rtol=1e-4
    )
    cl = contrastive_loss(x, x + 0.01)
    assert np.isfinite(float(cl))


def test_flash_decode_attention_interpret(rng):
    """Pallas flash-decode (interpret mode) matches the einsum reference."""
    from ccvs_tpu.ops.attention_pallas import flash_decode_attention

    B, NH, L, HD = 2, 4, 128, 64
    q = jnp.asarray(rng.randn(B, NH, HD).astype(np.float32))
    k = jnp.asarray(rng.randn(B, NH, L, HD).astype(np.float32))
    v = jnp.asarray(rng.randn(B, NH, L, HD).astype(np.float32))
    pos = 57
    out = flash_decode_attention(q, k, v, pos, interpret=True)
    att = jnp.einsum("bhd,bhld->bhl", q, k) / (HD**0.5)
    mask = jnp.arange(L) <= pos
    att = jax.nn.softmax(jnp.where(mask[None, None], att, -1e9), axis=-1)
    ref = jnp.einsum("bhl,bhld->bhd", att, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-5)


def test_backwarp_sampled_matches_full(rng):
    """backwarp_sampled(x, flow, s) == backwarp(x, flow)[:, ::s, ::s]."""
    from ccvs_tpu.ops import backwarp, backwarp_sampled

    x = jnp.asarray(rng.randn(2, 16, 16, 6).astype(np.float32))
    flow = jnp.asarray(rng.randn(2, 16, 16, 2).astype(np.float32) * 3)
    full = np.asarray(backwarp(x, flow))[:, ::2, ::2]
    fast = np.asarray(backwarp_sampled(x, flow, 2))
    np.testing.assert_allclose(fast, full, rtol=1e-6, atol=1e-6)


def test_correlation_stride_equals_presampled(rng):
    """corr(a, b, stride=2) == corr(a[::2], b[::2], stride=1): the kernel
    only reads stride-aligned positions (`modules/correlation.py:32-100`),
    which is what the decoder's fast_strided path exploits."""
    from ccvs_tpu.ops import local_correlation

    a = jnp.asarray(rng.randn(2, 16, 16, 8).astype(np.float32))
    b = jnp.asarray(rng.randn(2, 16, 16, 8).astype(np.float32))
    want = np.asarray(local_correlation(a, b, stride=2))
    got = np.asarray(local_correlation(a[:, ::2, ::2], b[:, ::2, ::2], stride=1))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_vq_pallas_grad_matches_jnp(rng):
    """jax.grad through the Pallas VQ path must work (the quantizer sits in
    every AE train step) and match the jnp path's gradients: the argmin has
    an explicit zero-vjp, the take(codebook, idx) carries the real gradient."""
    from ccvs_tpu.ops.vq import vq_lookup, vq_loss, vq_st
    from ccvs_tpu.ops.vq_pallas import vq_lookup_pallas

    z = jnp.asarray(rng.randn(32, 16).astype(np.float32))
    cb0 = jnp.asarray(rng.randn(32, 16).astype(np.float32))

    def loss(cb, lookup):
        z_q, _ = lookup(z, cb)
        return vq_loss(z, z_q) + jnp.sum(vq_st(z, z_q) ** 2) * 1e-3

    g_pallas = jax.grad(lambda cb: loss(cb, lambda a, b: vq_lookup_pallas(a, b, interpret=True)))(cb0)
    g_jnp = jax.grad(lambda cb: loss(cb, vq_lookup))(cb0)
    np.testing.assert_allclose(np.asarray(g_pallas), np.asarray(g_jnp),
                               rtol=1e-5, atol=1e-6)
    assert float(jnp.abs(g_jnp).sum()) > 0  # gradient actually flows
