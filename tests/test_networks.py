"""Golden shape/dtype tests per network (SURVEY.md section 4 test pyramid)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from ccvs_tpu.config import AutoencoderConfig, StateConfig, StftConfig, TransformerConfig
from ccvs_tpu.nn import (
    GPT,
    FeatureDiscriminator,
    ImageDiscriminator,
    SkipDecoder,
    SkipEncoder,
    StateEstimator,
    StftDecoder,
    StftEncoder,
    VectorQuantizer,
    VideoDiscriminator,
    build_schedule,
)

# Small config: 32x32 images, 3 resolutions, 8x8 latents.
AE = AutoencoderConfig(
    necf=16,
    necf_mult=(1, 2, 4),
    ndcf=16,
    ndcf_mult=(1, 2, 4),
    z_size=32,
    z_num=64,
    z_shape=(8, 8),
    max_dim=32,
    inter_p=0.75,
    skip_memory=2,
    skip_context=(1, 2),
)


def test_encoder_shapes(rng):
    enc = SkipEncoder(AE)
    x = jnp.asarray(rng.randn(2, 32, 32, 3), jnp.float32)
    params = enc.init(jax.random.PRNGKey(0), x)
    z, inters = enc.apply(params, x)
    assert z.shape == (2, 8, 8, 32)
    assert len(inters) == 3
    assert inters[0].shape == (2, 32, 32, 12)  # int(0.75*16)
    assert inters[1].shape == (2, 16, 16, 24)
    assert inters[2].shape == (2, 8, 8, 48)


def test_encoder_video_shapes(rng):
    enc = SkipEncoder(AE)
    x = jnp.asarray(rng.randn(2, 3, 32, 32, 3), jnp.float32)
    params = enc.init(jax.random.PRNGKey(0), x)
    z, inters = enc.apply(params, x)
    assert z.shape == (2, 3, 8, 8, 32)
    assert inters[0].shape == (2, 3, 32, 32, 12)


def _enc_dec(rng):
    enc = SkipEncoder(AE)
    dec = SkipDecoder(AE)
    x = jnp.asarray(rng.randn(2, 32, 32, 3), jnp.float32)
    eparams = enc.init(jax.random.PRNGKey(0), x)
    z, inters = enc.apply(eparams, x)
    return dec, z, inters


def test_decoder_roundtrip_shapes(rng):
    dec, z, inters = _enc_dec(rng)
    dparams = dec.init(jax.random.PRNGKey(1), z, [inters], return_all=True)
    rgb, layout, flows, occs, inter_dec = dec.apply(dparams, z, [inters], return_all=True)
    assert rgb.shape == (2, 32, 32, 3)
    assert layout is None
    assert len(flows) == 3 and len(occs) == 3
    assert flows[0].shape == (2, 8, 8, 2)  # k=1 -> B*1
    assert flows[2].shape == (2, 32, 32, 2)
    assert len(inter_dec) == 3
    assert inter_dec[0].shape == (2, 8, 8, 48)  # coarsest first (decoder order)


def test_decoder_multi_context_and_mask(rng):
    dec, z, inters = _enc_dec(rng)
    ctxs = [inters, inters]
    mask = jnp.asarray([[1.0, 0.0], [1.0, 1.0]])
    dparams = dec.init(jax.random.PRNGKey(1), z, ctxs, ctx_mask=mask)
    rgb, _ = dec.apply(dparams, z, ctxs, ctx_mask=mask)
    assert rgb.shape == (2, 32, 32, 3)
    # masked single-context result equals explicit single-context result
    rgb1, _ = dec.apply(dparams, z, [inters])
    np.testing.assert_allclose(np.asarray(rgb)[0], np.asarray(rgb1)[0], rtol=2e-3, atol=2e-3)


def test_decoder_no_ctx(rng):
    dec, z, inters = _enc_dec(rng)
    dparams = dec.init(jax.random.PRNGKey(1), z, [inters])
    rgb, _ = dec.apply(dparams, z, [inters], has_ctx=False)
    assert rgb.shape == (2, 32, 32, 3)


def test_vector_quantizer(rng):
    vq = VectorQuantizer(n_e=64, e_dim=32)
    z = jnp.asarray(rng.randn(2, 8, 8, 32), jnp.float32)
    params = vq.init(jax.random.PRNGKey(0), z)
    z_q, loss, (perp, idx) = vq.apply(params, z)
    assert z_q.shape == z.shape
    assert idx.shape == (2, 8, 8)
    emb = vq.apply(params, idx, method=VectorQuantizer.embed_code)
    np.testing.assert_allclose(
        np.asarray(emb),
        np.asarray(z_q - (z - jax.lax.stop_gradient(z))),
        rtol=1e-5, atol=1e-6,
    )


GPT_CFG = TransformerConfig(
    z_num=64, z_len=64, z_chunk=16, num_blocks=4, n_layer=2, n_head=2, n_embd=32,
    z_shape=(4, 4), emb_mode="temporal",
)


def test_gpt_forward(rng):
    model = GPT(GPT_CFG)
    code = jnp.asarray(rng.randint(0, 64, (2, 63)))
    params = model.init(jax.random.PRNGKey(0), code)
    logits = model.apply(params, code)
    assert logits.shape == (2, 63, 64)


def test_gpt_forward_with_state(rng):
    cfg = TransformerConfig(
        z_num=64, z_len=72, z_chunk=18, num_blocks=4, n_layer=2, n_head=2, n_embd=32,
        z_shape=(4, 4), emb_mode="temporal", state=True, state_num=8, state_size=2,
    )
    model = GPT(cfg)
    code = jnp.asarray(rng.randint(0, 64, (2, 63)))  # 4 frames x 16 minus 1
    state_code = jnp.asarray(rng.randint(0, 8, (2, 8)))  # 4 frames x 2
    params = model.init(jax.random.PRNGKey(0), code, state_code=state_code)
    logits = model.apply(params, code, state_code=state_code)
    # merged length = 63 + 8 = 71
    assert logits.shape == (2, 71, 64)


def test_gpt_forward_with_cond(rng):
    cfg = GPT_CFG
    model = GPT(cfg)
    code = jnp.asarray(rng.randint(0, 64, (2, 47)))
    cond = jnp.asarray(rng.randint(0, 64, (2, 16)))
    delta = jnp.asarray([3, 3])
    params = model.init(jax.random.PRNGKey(0), code, cond_code=cond, delta=delta)
    logits = model.apply(params, code, cond_code=cond, delta=delta)
    assert logits.shape == (2, 47, 64)  # cond positions dropped


def test_gpt_cached_decode_matches_full(rng):
    """KV-cache decode must agree with the full causal forward."""
    model = GPT(GPT_CFG)
    code = jnp.asarray(rng.randint(0, 64, (2, 20)))
    params = model.init(jax.random.PRNGKey(0), code)

    full_logits = model.apply(params, code)  # (2, 20, 64)

    sched = build_schedule(GPT_CFG, 2)  # 2 frames x 16 tokens = 32 positions
    max_len = 32
    cache = model.apply(params, 2, max_len, method=GPT.init_cache)

    # prefill with the first 20 tokens (padded buffer)
    kind = jnp.asarray(sched.kind)
    s_idx = jnp.asarray(sched.s_idx)
    t_idx = jnp.asarray(sched.t_idx)
    toks = jnp.concatenate([code, jnp.zeros((2, 12), code.dtype)], axis=1)

    def embed(p):
        return model.apply(
            params, toks[:, p], kind[p], s_idx[p], t_idx[p], method=GPT.embed_one
        )

    emb = jnp.stack([embed(p) for p in range(max_len)], axis=1)
    logits_pre, cache = model.apply(params, emb, cache, method=GPT.prefill)
    np.testing.assert_allclose(
        np.asarray(logits_pre[:, :20]), np.asarray(full_logits), rtol=2e-3, atol=2e-3
    )

    # single-step decode at position 20 must match a longer full forward
    tok20 = jnp.asarray(rng.randint(0, 64, (2,)))
    emb1 = model.apply(params, tok20, kind[20], s_idx[20], t_idx[20], method=GPT.embed_one)[:, None]
    step_logits, cache = model.apply(params, emb1, 20, cache, method=GPT.decode_step)
    full2 = model.apply(params, jnp.concatenate([code, tok20[:, None]], axis=1))
    np.testing.assert_allclose(
        np.asarray(step_logits), np.asarray(full2[:, -1]), rtol=2e-3, atol=2e-3
    )


def test_discriminators(rng):
    di = ImageDiscriminator(AE)
    x = jnp.asarray(rng.randn(4, 32, 32, 3), jnp.float32)
    p = di.init(jax.random.PRNGKey(0), x)
    score = di.apply(p, x)
    assert score.shape == (4, 1)

    dv = VideoDiscriminator(AE, vid_len=4)
    v = jnp.asarray(rng.randn(4, 4, 32, 32, 3), jnp.float32)
    p = dv.init(jax.random.PRNGKey(0), v)
    score = dv.apply(p, v)
    assert score.shape == (4, 1)

    df = FeatureDiscriminator(AE)
    z = jnp.asarray(rng.randn(4, 8, 8, 32), jnp.float32)
    p = df.init(jax.random.PRNGKey(0), z)
    score = df.apply(p, z)
    assert score.shape == (4, 1)


def test_state_and_stft(rng):
    sc = StateConfig(z_size=32, z_shape=(8, 8), state_hsize=16, state_size=2)
    se = StateEstimator(sc)
    z = jnp.asarray(rng.randn(2, 8, 8, 32), jnp.float32)
    p = se.init(jax.random.PRNGKey(0), z)
    s = se.apply(p, z)
    assert s.shape == (2, 2)
    assert (np.asarray(s) >= 0).all() and (np.asarray(s) <= 1).all()

    ac = StftConfig(stft_size=8, stft_hsize=16)
    enc, dec = StftEncoder(ac), StftDecoder(ac)
    x = jnp.asarray(rng.randn(2, 64, 16, 1), jnp.float32)
    pe = enc.init(jax.random.PRNGKey(0), x)
    lat = enc.apply(pe, x)
    assert lat.shape == (2, 8, 2, 8)
    pd = dec.init(jax.random.PRNGKey(1), lat)
    rec = dec.apply(pd, lat)
    assert rec.shape == (2, 64, 16, 1)


def test_decoder_option_variants(rng):
    """use_masked_flow / use_tradeoff / use_deformed_conv decoder variants."""
    import dataclasses
    for kw in ({"use_masked_flow": True},
               # tradeoff's grouped upsampler needs feat sizes divisible by 32
               # (true of all shipped configs, e.g. BAIR 96..384)
               {"use_tradeoff": True, "necf": 64, "inter_p": 0.5},
               {"use_deformed_conv": True}, {"no_corr": True}, {"no_proj": True}):
        cfg = dataclasses.replace(AE, **kw)
        enc = SkipEncoder(cfg)
        dec = SkipDecoder(cfg)
        x = jnp.asarray(rng.randn(1, 32, 32, 3), jnp.float32)
        ep = enc.init(jax.random.PRNGKey(0), x)
        z, inters = enc.apply(ep, x)
        dp = dec.init(jax.random.PRNGKey(1), z, [inters])
        rgb, _ = dec.apply(dp, z, [inters])
        assert rgb.shape == (1, 32, 32, 3), kw
        assert np.isfinite(np.asarray(rgb)).all(), kw


def test_deform_conv_matches_torchvision_semantics(rng):
    """deform_conv3x3 with zero flow equals a plain 3x3 conv."""
    from ccvs_tpu.ops.deform import deform_conv3x3
    import torch
    import torch.nn.functional as F

    x = rng.randn(1, 8, 8, 4).astype(np.float32)
    w = rng.randn(4, 4, 3, 3).astype(np.float32)
    b = rng.randn(4).astype(np.float32)
    zero_flow = jnp.zeros((1, 8, 8, 2), jnp.float32)
    got = deform_conv3x3(jnp.asarray(x), zero_flow, jnp.asarray(w), jnp.asarray(b))
    want = F.conv2d(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))),
                    torch.from_numpy(w), torch.from_numpy(b), padding=1).numpy()
    np.testing.assert_allclose(np.transpose(np.asarray(got), (0, 3, 1, 2)), want,
                               rtol=1e-4, atol=1e-4)


def test_split_conv_shared_identity(rng):
    """EqualConv2d ``shared=`` path == plain conv on the tiled concat input.

    The decoder's InterBlocks tile the frame features over k contexts
    (`skip_autoencoder.py:246`); the split-conv computes that block once per
    batch element — exact by conv linearity."""
    from ccvs_tpu.nn.layers import EqualConv2d

    b, k, h, w, c0, c1, co = 2, 3, 8, 8, 5, 4, 6
    shared = jnp.asarray(rng.randn(b, h, w, c0), jnp.float32)
    tail = jnp.asarray(rng.randn(b * k, h, w, c1), jnp.float32)
    conv = EqualConv2d(c0 + c1, co, 3, padding=1)
    params = conv.init(jax.random.PRNGKey(0), tail, shared=shared, k=k)
    got = conv.apply(params, tail, shared=shared, k=k)
    tiled = jnp.repeat(shared, k, axis=0)
    want = conv.apply(params, jnp.concatenate([tiled, tail], axis=-1))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


def test_gpt_remat_grads_match(rng):
    """`TransformerConfig.remat` must change memory behavior only: same
    params, same loss, same grads as the non-remat stack."""
    import dataclasses

    import numpy as np

    from ccvs_tpu.config import TransformerConfig
    from ccvs_tpu.models import TokenTransformer

    cfg = TransformerConfig(
        z_num=32, z_len=64, z_chunk=16, num_blocks=4, cond_len=16,
        n_layer=2, n_head=2, n_embd=32, z_shape=(4, 4), emb_mode="temporal",
        top_k=5,
    )
    t0 = TokenTransformer(cfg, dtype=jnp.float32)
    t1 = TokenTransformer(dataclasses.replace(cfg, remat=True), dtype=jnp.float32)
    params = t0.init(jax.random.PRNGKey(0), batch=2)
    code = jnp.asarray(rng.randint(0, 32, (2, 64)))
    l0 = float(t0.loss(params, code)[0])
    l1 = float(t1.loss(params, code)[0])
    np.testing.assert_allclose(l0, l1, rtol=1e-6)
    g0 = jax.grad(lambda p: t0.loss(p, code)[0])(params)
    g1 = jax.grad(lambda p: t1.loss(p, code)[0])(params)
    for a, b in zip(jax.tree_util.tree_leaves(g0), jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-6)


def test_shared_x_split_flag_identical(rng):
    """`shared_x_split` on/off must decode identically on the same params
    (the split is exact by conv linearity; flag exists for on-chip A/B)."""
    import dataclasses

    import numpy as np

    from ccvs_tpu.config import AutoencoderConfig
    from ccvs_tpu.models import FrameAutoencoder

    cfg = AutoencoderConfig(
        necf=8, necf_mult=(1, 2), ndcf=8, ndcf_mult=(1, 2),
        z_size=16, z_num=32, z_shape=(4, 4), max_dim=8,
        inter_p=0.5, skip_memory=3, skip_context=(1, 2, 3),
    )
    ae0 = FrameAutoencoder(cfg, dtype=jnp.float32)
    ae1 = FrameAutoencoder(dataclasses.replace(cfg, shared_x_split=False),
                           dtype=jnp.float32)
    params = ae0.init(jax.random.PRNGKey(0))
    vid = jnp.asarray(rng.randn(2, 4, 8, 8, 3).astype(np.float32)) * 0.1
    enc = ae0.encode(params, vid)
    out0 = np.asarray(ae0.decode_video(params, enc["code"], ctx_frames=vid[:, :1], n_ctx=1))
    out1 = np.asarray(ae1.decode_video(params, enc["code"], ctx_frames=vid[:, :1], n_ctx=1))
    np.testing.assert_allclose(out0, out1, atol=2e-5)
