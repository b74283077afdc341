"""Port reference PyTorch checkpoints into ccvs_tpu param pytrees.

The reference saves per-net state dicts named ``{label}_[latest_|best_]net_
{iter}.pth`` (`models/__init__.py:5-26`) with labels ``qvid_{e,q,g,di,dv,df}
[_ema]``, ``transformer_t``, ``state_{s,q}``, ``stft_{q,e,d}``. Our params
keep torch tensor layouts, so porting is a pure key translation:

torch module structure (reference `skip_autoencoder.py`):
- ConvLayer  = Sequential([Blur]?, EqualConv2d, [Blur]?, [LeakyReLU]?)
  -> conv weight at index 0 (plain) or 1 (downsample); upsample conv at 0.
- ResBlock   = conv1 / conv2 / skip (each a ConvLayer)
- SkipGANEncoder.blocks = [ConvLayer, ResBlock*, ConvLayer]
- SkipGANDecoder.blocks + inter_blocks (Matching/Subpixel heads + grouped
  upsamplers) + final heads
- GPT.blocks[i].{ln1,ln2,attn.{key,query,value,proj},mlp.{0,3}} -> our
  layer-stacked `core/blocks/block` params (stack over i; Dense kernels are
  transposed torch weights).

Usage:
    from ccvs_tpu.port.port_pytorch import port_autoencoder, port_gpt
    gen = port_autoencoder(cfg.ae, torch_state_dicts)  # dict of label->sd
"""

from typing import Dict, Optional

import numpy as np

from ccvs_tpu.config import AutoencoderConfig, StateConfig, StftConfig, TransformerConfig


def _np(t):
    try:
        return t.detach().cpu().numpy()
    except AttributeError:
        return np.asarray(t)


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    import torch

    sd = torch.load(path, map_location="cpu")
    return {k: _np(v) for k, v in sd.items()}


# ---------------- building blocks ----------------


def _convlayer(sd, prefix, downsample=False, upsample=False, activate=True, bias=True):
    """ConvLayer Sequential index of the EqualConv2d: 1 if a Blur precedes it
    (downsample), else 0 (`skip_autoencoder.py:66-102`)."""
    ci = 1 if downsample else 0
    out = {"conv": {"weight": sd[f"{prefix}.{ci}.weight"]}}
    if bias and f"{prefix}.{ci}.bias" in sd:
        out["conv"]["bias"] = sd[f"{prefix}.{ci}.bias"]
    return out


def _resblock(sd, prefix, down=False, up=False):
    return {
        "conv1": _convlayer(sd, f"{prefix}.conv1"),
        "conv2": _convlayer(sd, f"{prefix}.conv2", downsample=down, upsample=up),
        "skip": _convlayer(sd, f"{prefix}.skip", downsample=down, upsample=up, bias=False),
    }


def port_encoder(cfg: AutoencoderConfig, sd: Dict[str, np.ndarray]) -> dict:
    """`qvid_e` state dict -> SkipEncoder params."""
    n = cfg.num_resolutions
    out = {"block0": _convlayer(sd, "blocks.0")}
    for i in range(1, n):
        out[f"block{i}"] = _resblock(sd, f"blocks.{i}", down=True)
    out[f"block{n}"] = _convlayer(sd, f"blocks.{n}")
    return out


def _matching(cfg, sd, prefix, feat_size, first, corr_stride):
    out = {}
    if not first:
        out["upsample_flow"] = {"weight": sd[f"{prefix}.upsample_flow.weight"]}
        out["upsample_occ"] = {"weight": sd[f"{prefix}.upsample_occ.weight"]}
        if cfg.use_tradeoff:
            out["upsample_toff"] = {"weight": sd[f"{prefix}.upsample_toff.weight"]}
    if not cfg.no_corr:
        if feat_size > 16 and not cfg.no_proj:
            out["proj"] = _convlayer(sd, f"{prefix}.proj")
        if corr_stride != 1:
            out["upsample_corr"] = {"weight": sd[f"{prefix}.upsample_corr.weight"]}
    for i in range(3):
        out[f"convs{i}"] = _convlayer(sd, f"{prefix}.convs.{i}")
    out["flow_head"] = _convlayer(sd, f"{prefix}.flow_head")
    out["occ_head"] = _convlayer(sd, f"{prefix}.occ_head")
    return out


def _subpixel(sd, prefix):
    out = {}
    for i in range(3):
        out[f"convs{i}"] = _convlayer(sd, f"{prefix}.convs.{i}")
    out["flow_head"] = _convlayer(sd, f"{prefix}.flow_head")
    out["occ_head"] = _convlayer(sd, f"{prefix}.occ_head")
    return out


def port_decoder(cfg: AutoencoderConfig, sd: Dict[str, np.ndarray]) -> dict:
    """`qvid_g` state dict -> SkipDecoder params."""
    from ccvs_tpu.nn.decoder import interblock_schedule

    n = cfg.num_resolutions
    sched = interblock_schedule(n)
    out = {"block0": _convlayer(sd, "blocks.0")}
    for i in range(1, n):
        out[f"block{i}"] = _resblock(sd, f"blocks.{i}", up=True)
    if f"blocks.{n}.0.weight" in sd:
        out[f"block{n}"] = _convlayer(sd, f"blocks.{n}")
    if cfg.use_inter:
        for i in range(n):
            s = cfg.inter_sizes_dec[i]
            out[f"inter_block{i}"] = {
                "matching": _matching(
                    cfg, sd, f"inter_blocks.{i}.matching", s, i == 0, sched[i]["corr_stride"]
                ),
                "subpixel": _subpixel(sd, f"inter_blocks.{i}.subpixel"),
            }
    return out


def port_quantizer(sd: Dict[str, np.ndarray]) -> dict:
    """`qvid_q` / `state_q` / part of stft state dict -> VectorQuantizer."""
    return {"embedding": sd["embedding.weight"]}


def port_gpt(cfg: TransformerConfig, sd: Dict[str, np.ndarray]) -> dict:
    """`transformer_t` state dict -> GPT params (layer-stacked)."""
    n = cfg.n_layer

    def stack(key):
        return np.stack([sd[f"blocks.{i}.{key}"] for i in range(n)])

    def dense(key):
        # torch Linear weight (O, I) -> flax kernel (I, O), stacked over layers
        w = np.stack([sd[f"blocks.{i}.{key}.weight"].T for i in range(n)])
        b = np.stack([sd[f"blocks.{i}.{key}.bias"] for i in range(n)])
        return {"kernel": w, "bias": b}

    block = {
        "ln1": {"scale": stack("ln1.weight"), "bias": stack("ln1.bias")},
        "ln2": {"scale": stack("ln2.weight"), "bias": stack("ln2.bias")},
        "attn": {
            "key": dense("attn.key"),
            "query": dense("attn.query"),
            "value": dense("attn.value"),
            "proj": dense("attn.proj"),
        },
        "fc1": dense("mlp.0"),
        "fc2": dense("mlp.3"),
    }
    out = {
        "tok_emb": {"embedding": sd["tok_emb.weight"]},
        "core": {
            "blocks": {"block": block},
            "ln_f": {"scale": sd["ln_f.weight"], "bias": sd["ln_f.bias"]},
        },
        "head": {"kernel": sd["head.weight"].T},
    }
    if cfg.emb_mode == "temporal":
        out["s_emb"] = sd["s_emb"]
        out["t_emb"] = sd["t_emb"]
    elif cfg.emb_mode == "spatio-temporal":
        out["h_emb"] = sd["h_emb"]
        out["w_emb"] = sd["w_emb"]
        out["t_emb"] = sd["t_emb"]
    else:
        out["pos_emb"] = sd["pos_emb"]
    if cfg.state_num > 0 and cfg.state_size > 0 and "state_tok_emb.weight" in sd:
        out["state_tok_emb"] = {"embedding": sd["state_tok_emb.weight"]}
        if cfg.emb_mode is not None:
            out["state_s_emb"] = sd["state_s_emb"]
        else:
            out["state_pos_emb"] = sd["state_pos_emb"]
    if cfg.use_start_token and "start_tok_emb" in sd:
        out["start_tok_emb"] = sd["start_tok_emb"]
    if cfg.cat and "lbl_emb.weight" in sd:
        out["lbl_emb"] = {"embedding": sd["lbl_emb.weight"]}
    return out


def port_image_discriminator(cfg: AutoencoderConfig, sd: Dict[str, np.ndarray]) -> dict:
    """`qvid_di` state dict -> ImageDiscriminator params.

    gan.py ConvLayer keeps the bias in FusedLeakyReLU (index after the conv).
    """
    import math

    init_res = int(math.log2(cfg.z_shape[0])) - cfg.downsample_dis_num
    final_res = init_res + len(cfg.ndcf_mult) - 1
    out = {"conv0": _d_convlayer(sd, "convs.0")}
    for i in range(1, final_res - 1):
        out[f"res{i}"] = {
            "conv1": _d_convlayer(sd, f"convs.{i}.conv1"),
            "conv2": _d_convlayer(sd, f"convs.{i}.conv2", downsample=True),
            "skip": _d_convlayer(sd, f"convs.{i}.skip", downsample=True, activate=False),
        }
    out["final_conv"] = _d_convlayer(sd, "final_conv")
    out["fc1"] = {
        "weight": sd["final_linear.0.weight"],
        "bias": sd["final_linear.0.bias"],
    }
    out["fc2"] = {
        "weight": sd["final_linear.1.weight"],
        "bias": sd["final_linear.1.bias"],
    }
    return out


def _d_convlayer(sd, prefix, downsample=False, activate=True):
    ci = 1 if downsample else 0
    out = {"conv": {"weight": sd[f"{prefix}.{ci}.weight"]}}
    if activate and f"{prefix}.{ci + 1}.bias" in sd:
        out["act_bias"] = sd[f"{prefix}.{ci + 1}.bias"]
    elif f"{prefix}.{ci}.bias" in sd:
        out["conv"]["bias"] = sd[f"{prefix}.{ci}.bias"]
    return out


def port_state_estimator(cfg: StateConfig, sd: Dict[str, np.ndarray]) -> dict:
    out = {}
    h, w = cfg.z_shape
    i = 0
    while h > 1 and w > 1:
        out[f"conv{i}"] = _convlayer(sd, f"convs.{i}", downsample=True)
        h //= 2
        w //= 2
        i += 1
    out["fc"] = {"weight": sd["fc.weight"], "bias": sd["fc.bias"]}
    return out


def port_stft(cfg: StftConfig, enc_sd, dec_sd) -> dict:
    enc = {f"conv{i}": _convlayer(enc_sd, f"convs.{i}", downsample=(1 <= i <= 3)) for i in range(5)}
    dec = {f"conv{i}": _convlayer(dec_sd, f"convs.{i}", upsample=(1 <= i <= 3)) for i in range(5)}
    return {"encoder": enc, "decoder": dec}


def port_autoencoder(cfg: AutoencoderConfig, sds: Dict[str, Dict[str, np.ndarray]]) -> dict:
    """Port the {encoder, quantizer, decoder} group from label->state_dict.

    Layout-twin nets ride the `qvid_{el,ql,gl}` labels
    (`quantized_video_model.py:208-223`); with ``same_decoder_layout`` the
    reference saves no `qvid_gl` (the shared decoder decodes both)."""
    out = {
        "encoder": port_encoder(cfg, sds["qvid_e"]),
        "quantizer": port_quantizer(sds["qvid_q"]),
        "decoder": port_decoder(cfg, sds["qvid_g"]),
    }
    if "qvid_el" in sds:
        out["encoder_l"] = port_encoder(cfg, sds["qvid_el"])
    if "qvid_ql" in sds:
        out["quantizer_l"] = port_quantizer(sds["qvid_ql"])
    if "qvid_gl" in sds:
        out["decoder_l"] = port_decoder(cfg, sds["qvid_gl"])
    return out


# ---------------- checkpoint-transfer transforms ----------------


def apply_block_delta(sd: Dict[str, np.ndarray], delta: int) -> Dict[str, np.ndarray]:
    """Shift `blocks.{i}` / `inter_blocks.{i}` indices by ``delta``.

    Port of `load_state_dict(block_delta=...)` (`models/__init__.py:28-42`):
    lets checkpoints trained at one resolution initialize a model with more /
    fewer resolution levels (keys that shift out of range are dropped by the
    structural port).
    """
    import re

    out = {}
    for k, v in sd.items():
        m = re.match(r"^(blocks|inter_blocks)\.(\d+)\.(.*)$", k)
        if m:
            out[f"{m.group(1)}.{int(m.group(2)) + delta}.{m.group(3)}"] = v
        else:
            out[k] = v
    return out


def apply_head_to_n(sd: Dict[str, np.ndarray], n: int) -> Dict[str, np.ndarray]:
    """Expand a 1-proposal CGPT head to ``n`` proposals.

    Port of `load_state_dict(head_to_n=...)` (`models/__init__.py:99-107`):
    the head weight (n_in, D) is tiled n times plus a zero logits row per
    proposal, matching the (n_proposals*(n_in)+n_logits, D) layout.
    """
    out = dict(sd)
    w = sd["head.weight"]  # (n_in, D)
    n_in, d = w.shape
    rows = [w for _ in range(n)]
    logits = np.zeros((n, d), w.dtype)
    out["head.weight"] = np.concatenate(rows + [logits], axis=0)
    return out


def prune_mismatched(sd: Dict[str, np.ndarray], target_shapes: Dict[str, tuple],
                     verbose: bool = True) -> Dict[str, np.ndarray]:
    """Non-strict loading: drop keys whose shapes mismatch
    (`models/__init__.py:44-59`)."""
    out = {}
    for k, v in sd.items():
        if k in target_shapes and tuple(v.shape) != tuple(target_shapes[k]):
            if verbose:
                print(f"prune {k}: {v.shape} != {target_shapes[k]}")
            continue
        out[k] = v
    return out
