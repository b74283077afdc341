"""int8 weight-quantized serving decode: accuracy + wiring tests."""

import dataclasses

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from ccvs_tpu.config import TransformerConfig
from ccvs_tpu.models import TokenTransformer
from ccvs_tpu.nn.gpt import GPT, cache_to_layers, decode_step_fn
from ccvs_tpu.nn.quantized import decode_step_fn_int8, quantize_gpt_int8

CFG = TransformerConfig(
    z_num=32, z_len=64, z_chunk=16, num_blocks=4, cond_len=16,
    n_layer=3, n_head=2, n_embd=64, z_shape=(4, 4), emb_mode="temporal",
)


def _gpt(dtype=jnp.float32):
    tr = TokenTransformer(CFG, dtype=dtype)
    params = tr.init(jax.random.PRNGKey(0), batch=2)
    return tr, params


def test_quantize_shapes_and_error(rng):
    _, params = _gpt()
    q = quantize_gpt_int8(params)
    w = np.asarray(params["core"]["blocks"]["block"]["attn"]["query"]["kernel"])
    w8, s = np.asarray(q["attn"]["query"]["w8"]), np.asarray(q["attn"]["query"]["scale"])
    assert w8.dtype == np.int8 and w8.shape == w.shape
    assert s.shape == (CFG.n_layer, CFG.n_embd)
    deq = w8.astype(np.float32) * s[:, None, :]
    rel = np.abs(deq - w).max() / np.abs(w).max()
    assert rel < 1e-2  # per-channel int8: <= half an LSB of the channel max


def test_int8_decode_close_to_bf16(rng):
    """One cached decode step: int8 logits must track the exact path closely
    (weight+activation int8 with fp32 accumulation)."""
    tr, params = _gpt()
    model = tr.model
    b, L = 2, 16
    cache = model.apply({"params": params}, b, L, method=GPT.init_cache)

    # warm the cache with a short prefill so attention has context
    tok = jnp.asarray(rng.randint(0, 32, (b, 6)))
    emb = model.apply({"params": params}, tok, jnp.zeros(6, jnp.int32),
                      jnp.arange(6) % 16, jnp.arange(6) // 16,
                      method=GPT.embed_one)
    _, cache = model.apply({"params": params}, emb, cache, method=GPT.prefill)
    cache = cache_to_layers(cache)

    emb1 = model.apply({"params": params}, tok[:, -1], 0, 5, 0,
                       method=GPT.embed_one)[:, None]
    ref, _ = decode_step_fn(CFG, params, emb1, 6, cache, dtype=jnp.float32)
    q = quantize_gpt_int8(params)
    got, _ = decode_step_fn_int8(CFG, params, q, emb1, 6, cache, dtype=jnp.float32)

    ref, got = np.asarray(ref, np.float32), np.asarray(got, np.float32)
    denom = max(np.abs(ref).max(), 1e-6)
    assert np.abs(got - ref).max() / denom < 0.08
    # rank agreement on the top token for most rows
    agree = (ref.argmax(-1) == got.argmax(-1)).mean()
    assert agree >= 0.5


def test_generate_serve_int8(rng):
    cfg = dataclasses.replace(CFG, serve_int8=True)
    tr = TokenTransformer(cfg, dtype=jnp.float32)
    params = tr.init(jax.random.PRNGKey(0), batch=2)
    code = jnp.asarray(rng.randint(0, 32, (2, 16)))
    out = tr.generate(params, jax.random.PRNGKey(1), code, total_len=64)
    assert out["code"].shape == (2, 64)
    np.testing.assert_array_equal(np.asarray(out["code"][:, :16]), np.asarray(code))
    assert np.asarray(out["code"]).max() < cfg.z_num

    # beam path also runs quantized
    cfg2 = dataclasses.replace(cfg, beam_size=2)
    tr2 = TokenTransformer(cfg2, dtype=jnp.float32)
    out2 = tr2.generate(params, jax.random.PRNGKey(1), code, total_len=64)
    assert out2["code"].shape == (2, 64)
