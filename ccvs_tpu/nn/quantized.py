"""Opt-in int8 weight-quantized GPT decode (serving mode).

The AR decode loop is weight-streaming bound: every token reads all block
Dense kernels (~600 MB bf16 for the BAIR GPT). On v5e, int8 `dot_general`
streams the same sweep ~2.2x faster (probe 10, `scripts/PERF_NOTES.md`), so a
weight+dynamic-activation int8 path roughly halves the per-token cost.

Quantization scheme (standard weight-only-accuracy serving recipe):
- weights: symmetric per-output-channel int8 (`w8 = round(w / s_w)`,
  `s_w = max|w|/127` per output column), quantized once at generation entry;
- activations: symmetric per-row (per-token) dynamic int8 at each dot;
- accumulation in int32, dequantized with `s_x * s_w`, bias added in fp32.

This is NOT the default path: `TransformerConfig.serve_int8=False` keeps the
exact bf16 decode (`nn.gpt.decode_step_fn`) for parity and the bench. The
reference has no serving-quantization analog; this is a TPU-serving
extension (cited perf motivation: weights-bound decode at B=2,
`mingpt.py:232-305` recomputes full forwards instead).
"""

import math
from functools import partial

import jax
import jax.numpy as jnp

from ccvs_tpu.config import TransformerConfig
from ccvs_tpu.nn.gpt import cache_to_layers  # noqa: F401  (re-export convenience)


def _quant_w(w):
    """(..., I, O) fp -> {'w8': int8, 'scale': (..., O) fp32} per-out-channel."""
    w = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(w), axis=-2, keepdims=True)  # (..., 1, O)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    w8 = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return {"w8": w8, "scale": scale[..., 0, :].astype(jnp.float32)}


def quantize_gpt_int8(params) -> dict:
    """Quantize the decode-hot Dense kernels of a GPT param tree.

    Biases / LayerNorms / embeddings stay in the original tree; the returned
    dict only holds the int8 kernels + scales, keyed to mirror the param
    paths that `decode_step_fn_int8` reads.
    """
    blocks = params["core"]["blocks"]["block"]
    q = {"attn": {}, "mlp": {}}
    for name in ("query", "key", "value", "proj"):
        q["attn"][name] = _quant_w(blocks["attn"][name]["kernel"])
    for name in ("fc1", "fc2"):
        q["mlp"][name] = _quant_w(blocks[name]["kernel"])
    q["head"] = _quant_w(params["head"]["kernel"])
    return q


def _quant_x(x):
    """(B, D) fp -> (int8, per-row fp32 scale)."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    x8 = jnp.clip(jnp.round(xf / scale), -127, 127).astype(jnp.int8)
    return x8, scale


def _dot_int8(x, qw, bias=None):
    """fp (B, I) @ int8 kernel -> fp32 (B, O) with dynamic activation quant."""
    x8, sx = _quant_x(x)
    y = jax.lax.dot_general(
        x8, qw["w8"], (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    out = y.astype(jnp.float32) * (sx * qw["scale"][None])
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out


def _ln(x, scale, bias, eps=1e-5):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    xn = (xf - mean) * jax.lax.rsqrt(var + eps)
    return xn * scale.astype(jnp.float32) + bias.astype(jnp.float32)


def decode_step_fn_int8(cfg: TransformerConfig, params, qparams, emb1, pos, cache,
                        dtype=jnp.bfloat16):
    """int8 mirror of `nn.gpt.decode_step_fn` (same cache layout/update).

    Args:
      params: original GPT params (biases / LNs / head read from here).
      qparams: `quantize_gpt_int8(params)` output.
      emb1: (B, 1, D) embedded token; pos: absolute position.
      cache: (k_layers, v_layers) tuples of per-layer (B, nh, L, hd).
    """
    core = params["core"]
    blocks = core["blocks"]["block"]
    nh, hd = cfg.n_head, cfg.n_embd // cfg.n_head
    b = emb1.shape[0]

    ck_all, cv_all = cache
    x = emb1[:, 0].astype(jnp.float32)  # (B, D)
    new_k, new_v = [], []
    for l in range(cfg.n_layer):
        qa = jax.tree_util.tree_map(lambda p: p[l], qparams["attn"])
        qm = jax.tree_util.tree_map(lambda p: p[l], qparams["mlp"])
        at = blocks["attn"]
        h = _ln(x, blocks["ln1"]["scale"][l], blocks["ln1"]["bias"][l])
        q1 = _dot_int8(h, qa["query"], at["query"]["bias"][l]).reshape(b, nh, hd)
        k1 = _dot_int8(h, qa["key"], at["key"]["bias"][l]).reshape(b, nh, hd)
        v1 = _dot_int8(h, qa["value"], at["value"]["bias"][l]).reshape(b, nh, hd)

        ck = jax.lax.dynamic_update_slice(
            ck_all[l], k1[:, :, None].astype(ck_all[l].dtype), (0, 0, pos, 0)
        )
        cv = jax.lax.dynamic_update_slice(
            cv_all[l], v1[:, :, None].astype(cv_all[l].dtype), (0, 0, pos, 0)
        )
        new_k.append(ck)
        new_v.append(cv)

        if jax.default_backend() == "tpu":
            from ccvs_tpu.ops.attention_pallas import flash_decode_attention

            y = flash_decode_attention(q1.astype(dtype), ck, cv, pos)
        else:
            scale = 1.0 / math.sqrt(hd)
            att = jnp.einsum(
                "bhd,bhld->bhl", q1.astype(jnp.float32), ck.astype(jnp.float32)
            ) * scale
            mask1 = jnp.arange(ck.shape[2]) <= pos
            att = jnp.where(mask1[None, None], att, -1e9)
            att = jax.nn.softmax(att, axis=-1)
            y = jnp.einsum("bhl,bhld->bhd", att, cv.astype(jnp.float32))
        y = y.reshape(b, cfg.n_embd).astype(jnp.float32)
        x = x + _dot_int8(y, qa["proj"], at["proj"]["bias"][l])

        h = _ln(x, blocks["ln2"]["scale"][l], blocks["ln2"]["bias"][l])
        h = _dot_int8(h, qm["fc1"], blocks["fc1"]["bias"][l])
        h = jax.nn.gelu(h, approximate=False)
        x = x + _dot_int8(h, qm["fc2"], blocks["fc2"]["bias"][l])

    cache = (tuple(new_k), tuple(new_v))
    xn = _ln(x, core["ln_f"]["scale"], core["ln_f"]["bias"])
    logits = _dot_int8(xn, qparams["head"])
    return logits.astype(dtype), cache
