"""Checkpoint-port tests: synthetic reference-named state dicts must port
into pytrees structurally identical to our `init` trees, and ported GPT
weights must produce the same logits layout."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from ccvs_tpu.config import AutoencoderConfig, TransformerConfig
from ccvs_tpu.models import FrameAutoencoder, TokenTransformer
from ccvs_tpu.port import port_pytorch as pp

AE = AutoencoderConfig(
    necf=8, necf_mult=(1, 2, 4), ndcf=8, ndcf_mult=(1, 2, 4),
    z_size=16, z_num=32, z_shape=(4, 4), max_dim=16,
    inter_p=0.5, skip_memory=2, skip_context=(1, 2),
)
GPTC = TransformerConfig(
    z_num=32, z_len=64, z_chunk=16, num_blocks=4, n_layer=3, n_head=2, n_embd=32,
    z_shape=(4, 4), emb_mode="temporal",
)


def tree_shapes(t):
    return jax.tree_util.tree_map(lambda x: tuple(x.shape), t)


def synth_encoder_sd(cfg, rng, in_size=3):
    """Reference-named SkipGANEncoder state dict (`skip_autoencoder.py:309-351`)."""
    sd = {}
    chans = list(cfg.enc_channels)

    def conv(prefix, cin, cout, k, down=False, bias=True):
        ci = 1 if down else 0
        sd[f"{prefix}.{ci}.weight"] = rng.randn(cout, cin, k, k).astype(np.float32)
        if bias:
            sd[f"{prefix}.{ci}.bias"] = rng.randn(cout).astype(np.float32)

    def res(prefix, cin, cout, down=False):
        conv(f"{prefix}.conv1", cin, cin, 3)
        conv(f"{prefix}.conv2", cin, cout, 3, down=down)
        conv(f"{prefix}.skip", cin, cout, 1, down=down, bias=False)

    conv("blocks.0", in_size, chans[0], 1)
    for i in range(1, len(chans)):
        res(f"blocks.{i}", chans[i - 1], chans[i], down=True)
    conv(f"blocks.{len(chans)}", chans[-1], cfg.z_size, 1)
    return sd


def synth_decoder_sd(cfg, rng, out_size=3, in_size=None):
    from ccvs_tpu.nn.decoder import interblock_schedule

    sd = {}
    chans = list(cfg.dec_channels)
    sched = interblock_schedule(cfg.num_resolutions)

    def conv(prefix, cin, cout, k, down=False, up=False, bias=True):
        ci = 1 if down else 0
        if up:
            # upsample ConvLayer: EqualConv2d(transpose) at index 0
            sd[f"{prefix}.0.weight"] = rng.randn(cout, cin, k, k).astype(np.float32)
            if bias:
                sd[f"{prefix}.0.bias"] = rng.randn(cout).astype(np.float32)
            return
        sd[f"{prefix}.{ci}.weight"] = rng.randn(cout, cin, k, k).astype(np.float32)
        if bias:
            sd[f"{prefix}.{ci}.bias"] = rng.randn(cout).astype(np.float32)

    def res(prefix, cin, cout):
        conv(f"{prefix}.conv1", cin, cin, 3)
        conv(f"{prefix}.conv2", cin, cout, 3, up=True)
        conv(f"{prefix}.skip", cin, cout, 1, up=True, bias=False)

    conv("blocks.0", in_size or cfg.z_size, chans[0], 1)
    for i in range(1, len(chans)):
        res(f"blocks.{i}", chans[i - 1], chans[i])
    conv(f"blocks.{len(chans)}", chans[-1], out_size, 1)

    for i in range(cfg.num_resolutions):
        s = cfg.inter_sizes_dec[i]
        k = sched[i]["kernel"]
        stride = sched[i]["corr_stride"]
        mp = f"inter_blocks.{i}.matching"
        if i > 0:
            sd[f"{mp}.upsample_flow.weight"] = rng.randn(2, 1, 4, 4).astype(np.float32)
            sd[f"{mp}.upsample_occ.weight"] = rng.randn(1, 1, 4, 4).astype(np.float32)
        if s > 16 and not cfg.no_proj:
            conv(f"{mp}.proj", s, max(16, s // 4), 1)
        if stride != 1:
            sd[f"{mp}.upsample_corr.weight"] = rng.randn(49, 1, 4, 4).astype(np.float32)
        conv(f"{mp}.convs.0", 49, 128, 3)
        conv(f"{mp}.convs.1", 128, 64, 3)
        conv(f"{mp}.convs.2", 64, 32, 3)
        conv(f"{mp}.flow_head", 32, 2, k)
        conv(f"{mp}.occ_head", 32, 1, k)
        spx = f"inter_blocks.{i}.subpixel"
        conv(f"{spx}.convs.0", 2 * s + 3, 128, 3)
        conv(f"{spx}.convs.1", 128, 64, 3)
        conv(f"{spx}.convs.2", 64, 32, 3)
        conv(f"{spx}.flow_head", 32, 2, k)
        conv(f"{spx}.occ_head", 32, 1, k)
    return sd


def synth_gpt_sd(cfg, rng):
    sd = {}
    d = cfg.n_embd
    sd["tok_emb.weight"] = rng.randn(cfg.z_num, d).astype(np.float32)
    sd["s_emb"] = rng.randn(1, cfg.size, d).astype(np.float32)
    sd["t_emb"] = rng.randn(1, cfg.num_blocks, d).astype(np.float32)
    for i in range(cfg.n_layer):
        p = f"blocks.{i}"
        for ln in ("ln1", "ln2"):
            sd[f"{p}.{ln}.weight"] = rng.randn(d).astype(np.float32)
            sd[f"{p}.{ln}.bias"] = rng.randn(d).astype(np.float32)
        for m in ("key", "query", "value", "proj"):
            sd[f"{p}.attn.{m}.weight"] = rng.randn(d, d).astype(np.float32)
            sd[f"{p}.attn.{m}.bias"] = rng.randn(d).astype(np.float32)
        sd[f"{p}.mlp.0.weight"] = rng.randn(4 * d, d).astype(np.float32)
        sd[f"{p}.mlp.0.bias"] = rng.randn(4 * d).astype(np.float32)
        sd[f"{p}.mlp.3.weight"] = rng.randn(d, 4 * d).astype(np.float32)
        sd[f"{p}.mlp.3.bias"] = rng.randn(d).astype(np.float32)
    sd["ln_f.weight"] = rng.randn(d).astype(np.float32)
    sd["ln_f.bias"] = rng.randn(d).astype(np.float32)
    sd["head.weight"] = rng.randn(max(cfg.z_num, cfg.state_num), d).astype(np.float32)
    return sd


def test_port_autoencoder_structure(rng):
    ae = FrameAutoencoder(AE, dtype=jnp.float32)
    init = ae.init(jax.random.PRNGKey(0))
    sds = {
        "qvid_e": synth_encoder_sd(AE, rng),
        "qvid_g": synth_decoder_sd(AE, rng),
        "qvid_q": {"embedding.weight": rng.randn(AE.z_num, AE.z_size).astype(np.float32)},
    }
    ported = pp.port_autoencoder(AE, sds)
    assert tree_shapes(ported) == tree_shapes(init)
    # ported params actually run
    x = jnp.asarray(rng.randn(1, 16, 16, 3).astype(np.float32))
    enc = ae.encode(ported, x)
    assert enc["code"].shape == (1, 16)


def test_port_gpt_structure_and_forward(rng):
    tr = TokenTransformer(GPTC, dtype=jnp.float32)
    init = tr.init(jax.random.PRNGKey(0))
    sd = synth_gpt_sd(GPTC, rng)
    ported = pp.port_gpt(GPTC, sd)
    assert tree_shapes(ported) == tree_shapes(init)
    code = jnp.asarray(rng.randint(0, 32, (2, 20)))
    logits = tr.model.apply({"params": ported}, code)
    assert logits.shape == (2, 20, 32)
    assert np.isfinite(np.asarray(logits)).all()


def test_port_gpt_matches_torch_block(rng):
    """One ported transformer block must match torch numerics."""
    import torch
    import torch.nn as nn
    import torch.nn.functional as F

    cfg = GPTC
    d = cfg.n_embd
    sd = synth_gpt_sd(cfg, rng)
    ported = pp.port_gpt(cfg, sd)
    tr = TokenTransformer(cfg, dtype=jnp.float32)

    x = rng.randn(1, 5, d).astype(np.float32)

    # torch reference forward of block 0 (mirrors mingpt.py:99-117)
    t = torch.from_numpy(x)
    p = {k: torch.from_numpy(v) for k, v in sd.items()}
    h = F.layer_norm(t, (d,), p["blocks.0.ln1.weight"], p["blocks.0.ln1.bias"])
    q = F.linear(h, p["blocks.0.attn.query.weight"], p["blocks.0.attn.query.bias"])
    k = F.linear(h, p["blocks.0.attn.key.weight"], p["blocks.0.attn.key.bias"])
    v = F.linear(h, p["blocks.0.attn.value.weight"], p["blocks.0.attn.value.bias"])
    nh, hd = cfg.n_head, d // cfg.n_head
    qh = q.view(1, 5, nh, hd).transpose(1, 2)
    kh = k.view(1, 5, nh, hd).transpose(1, 2)
    vh = v.view(1, 5, nh, hd).transpose(1, 2)
    att = (qh @ kh.transpose(-2, -1)) / np.sqrt(hd)
    mask = torch.tril(torch.ones(5, 5))
    att = att.masked_fill(mask == 0, float("-inf")).softmax(-1)
    y = (att @ vh).transpose(1, 2).reshape(1, 5, d)
    y = F.linear(y, p["blocks.0.attn.proj.weight"], p["blocks.0.attn.proj.bias"])
    t2 = t + y
    h2 = F.layer_norm(t2, (d,), p["blocks.0.ln2.weight"], p["blocks.0.ln2.bias"])
    m = F.linear(h2, p["blocks.0.mlp.0.weight"], p["blocks.0.mlp.0.bias"])
    m = F.gelu(m)
    m = F.linear(m, p["blocks.0.mlp.3.weight"], p["blocks.0.mlp.3.bias"])
    want = (t2 + m).numpy()

    # our block 0 via a single-layer config using block-0 weights
    from ccvs_tpu.nn.gpt import Block

    blk = Block(cfg, dtype=jnp.float32)
    bp = jax.tree_util.tree_map(lambda a: a[0], ported["core"]["blocks"]["block"])
    got, _ = blk.apply({"params": bp}, jnp.asarray(x))
    # synth weights are unit-scale randn, so activations reach O(100); check
    # relative to the output scale (observed agreement ~7e-6 relative)
    scale = np.abs(want).max()
    np.testing.assert_allclose(np.asarray(got) / scale, want / scale, atol=1e-4)


def test_port_layout_twins(rng):
    """qvid_{el,ql,gl} labels port into the twin param groups
    (`quantized_video_model.py:208-223`)."""
    import dataclasses

    cfg = dataclasses.replace(AE, use_layout=True, layout_size=5)
    ae = FrameAutoencoder(cfg, dtype=jnp.float32)
    init = ae.init(jax.random.PRNGKey(0))
    sds = {
        "qvid_e": synth_encoder_sd(cfg, rng),
        "qvid_g": synth_decoder_sd(cfg, rng),
        "qvid_q": {"embedding.weight": rng.randn(cfg.z_num, cfg.z_size).astype(np.float32)},
        "qvid_el": synth_encoder_sd(cfg, rng, in_size=5),
        "qvid_gl": synth_decoder_sd(cfg, rng, out_size=5),
        "qvid_ql": {"embedding.weight": rng.randn(cfg.z_num, cfg.z_size).astype(np.float32)},
    }
    ported = pp.port_autoencoder(cfg, sds)
    assert tree_shapes(ported) == tree_shapes(init)


def test_config_json_roundtrip(tmp_path):
    """to_json -> from_json is lossless (reference --load_from_opt_file,
    `tools/options.py:462-522`)."""
    from ccvs_tpu.config import Config, get_config

    for preset in ("bairhd", "bairhd_state", "kinetics600_p2p", "drums"):
        cfg = get_config(preset)
        path = tmp_path / f"{preset}.json"
        path.write_text(cfg.to_json())
        cfg2 = Config.load(str(path))
        assert cfg2 == cfg, preset
