"""End-to-end parity against the REAL reference networks on torch-CPU.

Instantiates the reference `SkipGANEncoder` / `SkipGANDecoder` /
`VectorQuantizer` / `GPT` (`skip_autoencoder.py:309-476`, `quantize.py:7-83`,
`mingpt.py:120-305`) via `ref_compat`, ports their randomly-initialised state
dicts with `ccvs_tpu.port.port_pytorch`, and asserts our forward passes
reproduce the reference numerics — the proof behind BASELINE's
"ported-checkpoint decode PSNR > 40 dB" claim.
"""

import sys
import types

import numpy as np
import pytest
import jax
import jax.numpy as jnp

sys.path.insert(0, __file__.rsplit("/", 1)[0])

import torch

from ref_compat import load_reference

from ccvs_tpu.config import AutoencoderConfig, TransformerConfig
from ccvs_tpu.nn.decoder import SkipDecoder
from ccvs_tpu.nn.encoder import SkipEncoder
from ccvs_tpu.nn.quantizer import VectorQuantizer
from ccvs_tpu.models import TokenTransformer
from ccvs_tpu.port import port_pytorch as pp

AE = AutoencoderConfig(
    necf=8, necf_mult=(1, 2, 4), ndcf=8, ndcf_mult=(1, 2, 4),
    z_size=16, z_num=32, z_shape=(4, 4), max_dim=16,
    inter_p=0.5, normalize_out=True,
)
GPTC = TransformerConfig(
    z_num=32, z_len=64, z_chunk=16, num_blocks=4, cond_len=16,
    n_layer=3, n_head=2, n_embd=32, z_shape=(4, 4), emb_mode="temporal",
)


def _opt(cfg: AutoencoderConfig):
    """Reference `opt` namespace with the fields skip_autoencoder.py reads."""
    return types.SimpleNamespace(
        necf=cfg.necf, necf_mult=list(cfg.necf_mult), z_size=cfg.z_size,
        z_shape=list(cfg.z_shape), max_dim=cfg.max_dim,
        aspect_ratio=cfg.aspect_ratio, inter_p=cfg.inter_p,
        normalize_out=cfg.normalize_out, use_inter=cfg.use_inter,
        skip_rgb=cfg.skip_rgb, skip_tanh=cfg.skip_tanh,
        no_corr=cfg.no_corr, no_proj=cfg.no_proj,
        use_masked_flow=cfg.use_masked_flow,
        use_deformed_conv=cfg.use_deformed_conv,
        use_tradeoff=cfg.use_tradeoff, layout_size=cfg.layout_size,
        state_size=8, state_hsize=16, stft_size=8, stft_hsize=16,
    )


def _sd(net):
    return {k: v.detach().numpy() for k, v in net.state_dict().items()}


def _nhwc(t):
    return jnp.asarray(t.detach().numpy().transpose(0, 2, 3, 1))


def _nchw(a):
    return np.asarray(a).transpose(0, 3, 1, 2)


def _psnr(a, b, span=2.0):
    mse = float(np.mean((np.asarray(a, np.float64) - np.asarray(b, np.float64)) ** 2))
    return 10.0 * np.log10(span**2 / max(mse, 1e-12))


@pytest.fixture(scope="module")
def ref():
    return load_reference()


def test_encoder_parity(ref):
    sa, _, _ = ref
    torch.manual_seed(0)
    enc = sa.SkipGANEncoder(_opt(AE)).eval()
    x = torch.randn(2, 3, 16, 16) * 0.5
    with torch.no_grad():
        z_t, inters_t = enc(x)

    ours = SkipEncoder(AE, dtype=jnp.float32)
    params = pp.port_encoder(AE, _sd(enc))
    z_j, inters_j = ours.apply({"params": params}, _nhwc(x))

    np.testing.assert_allclose(_nchw(z_j), z_t.numpy(), rtol=1e-4, atol=1e-5)
    assert len(inters_j) == len(inters_t)
    for it, ij in zip(inters_t, inters_j):
        np.testing.assert_allclose(_nchw(ij), it.numpy(), rtol=1e-4, atol=1e-5)


def test_quantizer_parity(ref):
    _, _, quantize = ref
    torch.manual_seed(1)
    q_t = quantize.VectorQuantizer(AE.z_num, AE.z_size, beta=0.25).eval()
    z = torch.randn(2, AE.z_size, 4, 4) * 0.1
    with torch.no_grad():
        zq_t, loss_t, (_, _, idx_t) = q_t(z)  # zq back in NCHW (quantize.py:71-74)

    q_j = VectorQuantizer(n_e=AE.z_num, e_dim=AE.z_size)
    params = pp.port_quantizer(_sd(q_t))
    zq_j, loss_j, (_, idx_j) = q_j.apply({"params": params}, _nhwc(z))

    assert np.array_equal(np.asarray(idx_j).ravel(), idx_t.numpy().ravel())
    np.testing.assert_allclose(_nchw(zq_j), zq_t.numpy(), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(float(loss_j), float(loss_t), rtol=1e-4)


AE4 = AutoencoderConfig(
    necf=8, necf_mult=(1, 2, 4, 8), ndcf=8, ndcf_mult=(1, 2, 4, 8),
    z_size=16, z_num=32, z_shape=(4, 4), max_dim=32,
    inter_p=0.5, normalize_out=True,
)


@pytest.mark.parametrize("cfg,dim", [(AE, 16), (AE4, 32)])
def test_decoder_parity_with_contexts(ref, cfg, dim):
    """Full decoder forward incl. correlation cost volumes, flow warps and
    confidence fusion over two context frames (`skip_autoencoder.py:414-476`).
    The 4-resolution case exercises corr_stride=2 (`:398-401`) and with it
    the fast_strided sampled-warp path."""
    sa, _, _ = ref
    torch.manual_seed(2)
    opt = _opt(cfg)
    enc = sa.SkipGANEncoder(opt).eval()
    dec = sa.SkipGANDecoder(opt).eval()

    x_ctx1 = torch.randn(2, 3, dim, dim) * 0.5
    x_ctx2 = torch.randn(2, 3, dim, dim) * 0.5
    z = torch.randn(2, cfg.z_size, 4, 4) * 0.2
    with torch.no_grad():
        _, inters1 = enc(x_ctx1)
        _, inters2 = enc(x_ctx2)
        out_t, _, flows_t, occs_t, _ = dec(
            z, inter_tgts=[inters1, inters2], return_all=True
        )

    ours = SkipDecoder(cfg, dtype=jnp.float32)
    params = pp.port_decoder(cfg, _sd(dec))
    tgts = [
        [_nhwc(f) for f in inters1],
        [_nhwc(f) for f in inters2],
    ]
    out_j, _, flows_j, occs_j, _ = ours.apply(
        {"params": params}, _nhwc(z), inter_tgts=tgts, return_all=True
    )

    np.testing.assert_allclose(_nchw(out_j), out_t.numpy(), rtol=1e-3, atol=1e-4)
    assert _psnr(_nchw(out_j), out_t.numpy()) > 40.0


def test_full_frame_roundtrip_psnr(ref):
    """encode -> quantize -> decode-with-context, reference vs ported: the
    composed QVidModel image path (`quantized_video_model.py:374-456`).
    BASELINE.json's port criterion: PSNR > 40 dB."""
    sa, _, quantize = ref
    torch.manual_seed(3)
    opt = _opt(AE)
    enc = sa.SkipGANEncoder(opt).eval()
    dec = sa.SkipGANDecoder(opt).eval()
    q = quantize.VectorQuantizer(AE.z_num, AE.z_size, beta=0.25).eval()

    x = torch.randn(2, 3, 16, 16).clamp(-1, 1)
    ctx = torch.randn(2, 3, 16, 16).clamp(-1, 1)
    with torch.no_grad():
        z_t, _ = enc(x)
        zq_t, _, _ = q(z_t)  # returned in NCHW (quantize.py:71-74)
        _, ctx_inters = enc(ctx)
        out_t, _ = dec(zq_t, inter_tgts=[ctx_inters])

    enc_j = SkipEncoder(AE, dtype=jnp.float32)
    dec_j = SkipDecoder(AE, dtype=jnp.float32)
    q_j = VectorQuantizer(n_e=AE.z_num, e_dim=AE.z_size)
    p_enc = pp.port_encoder(AE, _sd(enc))
    p_dec = pp.port_decoder(AE, _sd(dec))
    p_q = pp.port_quantizer(_sd(q))

    z_j, _ = enc_j.apply({"params": p_enc}, _nhwc(x))
    zq_j, _, _ = q_j.apply({"params": p_q}, z_j)
    _, ctx_inters_j = enc_j.apply({"params": p_enc}, _nhwc(ctx))
    out_j, _ = dec_j.apply({"params": p_dec}, zq_j, inter_tgts=[ctx_inters_j])

    psnr = _psnr(_nchw(out_j), out_t.numpy())
    assert psnr > 40.0, f"round-trip parity PSNR {psnr:.1f} dB"


def test_gpt_logits_parity(ref):
    _, mingpt, _ = ref
    torch.manual_seed(4)
    gpt_t = mingpt.GPT(
        vocab_size=GPTC.z_num, block_size=GPTC.z_len + GPTC.cond_len,
        num_blocks=GPTC.num_blocks, n_layer=GPTC.n_layer, n_head=GPTC.n_head,
        n_embd=GPTC.n_embd, emb_mode="temporal", shape=list(GPTC.z_shape),
    ).eval()
    idx = torch.randint(0, GPTC.z_num, (2, 20))
    with torch.no_grad():
        logits_t = gpt_t(idx)

    tr = TokenTransformer(GPTC, dtype=jnp.float32)
    params = pp.port_gpt(GPTC, _sd(gpt_t))
    logits_j = tr.model.apply({"params": params}, jnp.asarray(idx.numpy()))

    lt = logits_t.numpy()
    rel = np.max(np.abs(np.asarray(logits_j) - lt)) / max(np.max(np.abs(lt)), 1e-6)
    assert rel <= 1e-4, f"GPT logits rel err {rel:.2e}"


def test_gpt_cond_logits_parity(ref):
    """Conditioned forward: cond tokens prefixed, logits sliced after cond
    (`mingpt.py:285-305`)."""
    _, mingpt, _ = ref
    torch.manual_seed(5)
    gpt_t = mingpt.GPT(
        vocab_size=GPTC.z_num, block_size=GPTC.z_len + GPTC.cond_len,
        num_blocks=GPTC.num_blocks, n_layer=GPTC.n_layer, n_head=GPTC.n_head,
        n_embd=GPTC.n_embd, emb_mode="temporal", shape=list(GPTC.z_shape),
    ).eval()
    idx = torch.randint(0, GPTC.z_num, (2, 20))
    cond = torch.randint(0, GPTC.z_num, (2, GPTC.cond_len))
    with torch.no_grad():
        logits_t = gpt_t(idx, cond_idx=cond)

    tr = TokenTransformer(GPTC, dtype=jnp.float32)
    params = pp.port_gpt(GPTC, _sd(gpt_t))
    logits_j = tr.model.apply(
        {"params": params}, jnp.asarray(idx.numpy()),
        cond_code=jnp.asarray(cond.numpy()),
    )

    lt = logits_t.numpy()
    lj = np.asarray(logits_j)
    if lj.shape[1] != lt.shape[1]:  # ours may return cond positions too
        lj = lj[:, -lt.shape[1]:]
    rel = np.max(np.abs(lj - lt)) / max(np.max(np.abs(lt)), 1e-6)
    assert rel <= 1e-4, f"cond GPT logits rel err {rel:.2e}"
