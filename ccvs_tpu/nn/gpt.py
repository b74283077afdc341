"""Autoregressive latent transformer (minGPT-style) with a TPU-native
fixed-shape KV cache.

Re-implements the reference `GPT`/`CGPT`
(`models/skip_vid_generator/models/mingpt.py:33-361`) with these TPU-first
changes:

- **KV cache**: the reference recomputes a full O(T^2) attention forward for
  every generated token (`mingpt.py:63-81`, no cache; `transformer_model.py:
  331-392`). Here generation is a `lax.scan` over single-token decode steps
  against a static-shape cache — O(T) per token, fully on-chip.
- **Token schedule**: the reference interleaves state/frame tokens and
  assembles positional embeddings with Python loops over the batch
  (`mingpt.py:186-230,259-282`). Here the merged-sequence layout (frame /
  state / cond / start / label) is precomputed as static index arrays
  (:func:`build_schedule`) and embeddings are vectorized gathers.
- Blocks are stacked with `flax.linen.scan` (fast compiles, layer-stacked
  params).

Semantics (embedding formulas, logits slicing, loss splits) match the
reference exactly; see docstrings on each method for file:line citations.
"""

import math
from dataclasses import dataclass
from functools import partial
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ccvs_tpu.config import TransformerConfig

KIND_FRAME = 0
KIND_STATE = 1


@dataclass(frozen=True)
class Schedule:
    """Static merged-sequence layout for the body (frame+state tokens).

    ``kind[j]``: KIND_FRAME or KIND_STATE for merged body position j.
    ``s_idx[j]``: spatial index (into s_emb / state_s_emb).
    ``t_idx[j]``: temporal index (into t_emb).
    ``frame_pos`` / ``state_pos``: merged positions of frame/state tokens in
    order (for scattering/gathering the separate code streams).
    """

    kind: np.ndarray
    s_idx: np.ndarray
    t_idx: np.ndarray
    frame_pos: np.ndarray
    state_pos: np.ndarray

    @property
    def length(self) -> int:
        return len(self.kind)


def build_schedule(cfg: TransformerConfig, n_frames: int, n_state_frames: Optional[int] = None) -> Schedule:
    """Body layout for ``n_frames`` frames (reference `mingpt.py:259-282`).

    Interleaved mode: per frame, ``state_size`` state tokens then ``size``
    frame tokens. ``state_front`` mode: all state tokens first
    (`mingpt.py:261-263`), followed by all frame tokens.
    """
    size, ss = cfg.size, cfg.state_size
    if n_state_frames is None:
        n_state_frames = min(n_frames, cfg.num_blocks) if ss > 0 else 0
    kinds, s_idx, t_idx = [], [], []
    if ss > 0 and cfg.state_front:
        for f in range(n_state_frames):
            for r in range(ss):
                kinds.append(KIND_STATE); s_idx.append(r); t_idx.append(f)
        for f in range(n_frames):
            for r in range(size):
                kinds.append(KIND_FRAME); s_idx.append(r); t_idx.append(f)
    else:
        for f in range(n_frames):
            if ss > 0 and f < n_state_frames:
                for r in range(ss):
                    kinds.append(KIND_STATE); s_idx.append(r); t_idx.append(f)
            for r in range(size):
                kinds.append(KIND_FRAME); s_idx.append(r); t_idx.append(f)
    kind = np.asarray(kinds, np.int32)
    return Schedule(
        kind=kind,
        s_idx=np.asarray(s_idx, np.int32),
        t_idx=np.asarray(t_idx, np.int32),
        frame_pos=np.nonzero(kind == KIND_FRAME)[0].astype(np.int32),
        state_pos=np.nonzero(kind == KIND_STATE)[0].astype(np.int32),
    )


class CausalSelfAttention(nn.Module):
    """Multi-head causal attention (`mingpt.py:33-81`) with optional KV cache."""

    cfg: TransformerConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, cache=None, index=None, deterministic=True):
        cfg = self.cfg
        b, t, c = x.shape
        nh, hd = cfg.n_head, cfg.n_embd // cfg.n_head

        dense = partial(nn.Dense, features=c, dtype=self.dtype, param_dtype=jnp.float32)
        q = dense(name="query")(x).reshape(b, t, nh, hd)
        k = dense(name="key")(x).reshape(b, t, nh, hd)
        v = dense(name="value")(x).reshape(b, t, nh, hd)

        scale = jnp.asarray(1.0 / math.sqrt(hd), self.dtype)
        new_cache = None
        if cache is not None:
            # Cache layout (B, nh, L, hd): per-(b,h) planes are contiguous so
            # the decode contractions read the cache at streaming bandwidth.
            # (With the naive (B, L, nh, hd) layout + a length-1 query, XLA
            # lowers attention as strided VPU multiply-reduce at ~5% of HBM
            # bandwidth — measured 10x slowdown on v5e.)
            ck, cv = cache  # (B, nh, L, hd)
            if index is None:
                index = 0
            kh = jnp.transpose(k, (0, 2, 1, 3)).astype(ck.dtype)  # (B, nh, t, hd)
            vh = jnp.transpose(v, (0, 2, 1, 3)).astype(cv.dtype)
            ck = jax.lax.dynamic_update_slice(ck, kh, (0, 0, index, 0))
            cv = jax.lax.dynamic_update_slice(cv, vh, (0, 0, index, 0))
            new_cache = (ck, cv)
            lmax = ck.shape[2]
            pos_k = jnp.arange(lmax)[None, :]
            if t == 1:
                q1 = q[:, 0]  # (B, nh, hd)
                use_flash = jax.default_backend() == "tpu"
                if use_flash:
                    # fused Pallas flash-decode: each (b, h) cache plane is
                    # read once at streaming bandwidth (XLA's batched-matvec
                    # lowering runs at a few % of HBM BW)
                    from ccvs_tpu.ops.attention_pallas import flash_decode_attention

                    y = flash_decode_attention(q1, ck, cv, index)
                else:
                    att = jnp.einsum(
                        "bhd,bhld->bhl", q1, ck.astype(q.dtype),
                        preferred_element_type=jnp.float32,
                    ) * scale.astype(jnp.float32)
                    mask1 = (pos_k <= index)[0]  # (L,)
                    att = jnp.where(mask1[None, None], att, -1e9)
                    att = jax.nn.softmax(att, axis=-1).astype(self.dtype)
                    y = jnp.einsum(
                        "bhl,bhld->bhd", att, cv.astype(att.dtype),
                        preferred_element_type=self.dtype,
                    )
                y = y[:, None]  # (B, 1, nh, hd)
            else:
                att = jnp.einsum("bqhd,bhld->bhql", q, ck.astype(q.dtype)) * scale
                pos_q = index + jnp.arange(t)[:, None]
                mask = pos_k <= pos_q  # (t, lmax)
                att = jnp.where(mask[None, None], att, jnp.asarray(-1e9, att.dtype))
                att = jax.nn.softmax(att.astype(jnp.float32), axis=-1).astype(self.dtype)
                y = jnp.einsum("bhql,bhld->bqhd", att, cv.astype(att.dtype))
        else:
            att = jnp.einsum("bqhd,bkhd->bhqk", q, k) * scale
            mask = jnp.tril(jnp.ones((t, t), bool))
            att = jnp.where(mask[None, None], att, jnp.asarray(-1e9, att.dtype))
            att = jax.nn.softmax(att.astype(jnp.float32), axis=-1).astype(self.dtype)
            if cfg.attn_pdrop > 0 and not deterministic:
                att = nn.Dropout(cfg.attn_pdrop)(att, deterministic=False)
            y = jnp.einsum("bhqk,bkhd->bqhd", att, v)

        y = y.reshape(b, t, c)
        y = dense(name="proj")(y)
        if cfg.resid_pdrop > 0 and not deterministic:
            y = nn.Dropout(cfg.resid_pdrop)(y, deterministic=False)
        return y, new_cache


class Block(nn.Module):
    """Transformer block (`mingpt.py:99-117`)."""

    cfg: TransformerConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, cache=None, index=None, deterministic=True):
        cfg = self.cfg
        # Sequence-parallel training (parallel/sp.py): annotate the residual
        # stream so the token axis stays sharded across the mesh 'model' axis
        # through LN/MLP/residual; GSPMD all-gathers K/V inside attention.
        # Cached decode (t == 1) is never sequence-sharded.
        sp = cfg.seq_parallel and cache is None and x.shape[1] > 1
        if sp:
            from ccvs_tpu.parallel.sp import seq_shard

            x = seq_shard(x)
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln1")(x)
        attn, new_cache = CausalSelfAttention(cfg, dtype=self.dtype, name="attn")(
            h, cache=cache, index=index, deterministic=deterministic
        )
        x = x + attn
        if sp:
            x = seq_shard(x)
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln2")(x)
        h = nn.Dense(4 * cfg.n_embd, dtype=self.dtype, param_dtype=jnp.float32, name="fc1")(h)
        if cfg.resid_noise and not deterministic:
            noise = jax.random.normal(self.make_rng("noise"), (*h.shape[:2], 1), h.dtype)
            w = self.param("noise_weight", nn.initializers.ones, (1,), jnp.float32)
            h = h + w.astype(h.dtype) * noise
        h = jax.nn.gelu(h, approximate=False)
        h = nn.Dense(cfg.n_embd, dtype=self.dtype, param_dtype=jnp.float32, name="fc2")(h)
        if cfg.resid_pdrop > 0 and not deterministic:
            h = nn.Dropout(cfg.resid_pdrop)(h, deterministic=False)
        out = x + h
        if sp:
            out = seq_shard(out)
        return out, new_cache


class GPTCore(nn.Module):
    """Stack of blocks via `nn.scan` + final LayerNorm."""

    cfg: TransformerConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, emb, cache=None, index=None, deterministic=True):
        cfg = self.cfg

        class _ScanBody(nn.Module):
            cfg: TransformerConfig
            dtype: jnp.dtype

            @nn.compact
            def __call__(self, x, layer_cache):
                x, new_cache = Block(self.cfg, dtype=self.dtype, name="block")(
                    x, cache=layer_cache, index=index, deterministic=deterministic
                )
                return x, new_cache

        body = _ScanBody
        if cfg.remat:
            # rematerialize each block on the backward pass: the stored
            # (B, H, L, L) attention probabilities otherwise dominate HBM for
            # training-length sequences (L~1k x 24 layers > 16 GB chips).
            # grad-only effect; forward/decode programs are unchanged.
            body = nn.remat(_ScanBody, prevent_cse=False)
        scan = nn.scan(
            body,
            variable_axes={"params": 0},
            split_rngs={"params": True, "dropout": True, "noise": True},
            in_axes=0,
            out_axes=0,
            length=cfg.n_layer,
        )
        # `cache` is a (k, v) tuple of (n_layer, ...) arrays (scanned over
        # axis 0) or None (empty pytree — no per-layer xs).
        x, new_cache = scan(cfg, self.dtype, name="blocks")(emb, cache)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_f")(x)
        return x, new_cache


def cache_to_layers(cache):
    """Stacked (n_layer, ...) cache -> tuple-of-layers form for decoding."""
    ck, cv = cache
    n = ck.shape[0]
    return (tuple(ck[l] for l in range(n)), tuple(cv[l] for l in range(n)))


def decode_step_fn(cfg: TransformerConfig, params, emb1, pos, cache, dtype=jnp.bfloat16):
    """Pure cached decode step with an in-place layer loop.

    The layer-stacked `nn.scan` path copies the full KV cache every step
    (scan xs -> ys are distinct buffers), and dynamic per-layer indexing of a
    stacked cache copies it again. Here the cache is a tuple of per-layer
    buffers (see :func:`cache_to_layers`) updated through an unrolled layer
    loop — each step touches only one layer's buffer, which XLA aliases in
    place, so cache HBM traffic per token is ~1x the attention reads.

    Args:
      params: GPT params (as produced by `GPT.init`).
      emb1: (B, 1, D) embedded input token.
      pos: scalar absolute position.
      cache: (k_layers, v_layers) tuples of per-layer (B, nh, L, hd).
    Returns:
      (logits (B, V), new_cache in the same tuple form).
    """
    core = params["core"]
    block_stack = core["blocks"]["block"]
    block_mod = Block(cfg, dtype=dtype)

    # Unrolled layer loop over a tuple-of-layers cache: dynamic indexing of a
    # stacked cache forces per-layer copies of the whole buffer, and stacking
    # the result copies it again; per-layer buffers update in place.
    ck_all, cv_all = cache  # tuples of per-layer (B, nh, L, hd)
    x = emb1
    new_k, new_v = [], []
    for l in range(cfg.n_layer):
        bp = jax.tree_util.tree_map(lambda p: p[l], block_stack)
        x, (nk, nv) = block_mod.apply({"params": bp}, x, cache=(ck_all[l], cv_all[l]), index=pos)
        new_k.append(nk)
        new_v.append(nv)
    cache = (tuple(new_k), tuple(new_v))
    ln = core["ln_f"]
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    xn = (xf - mean) * jax.lax.rsqrt(var + 1e-5)  # torch LayerNorm eps
    xn = xn * ln["scale"] + ln["bias"]
    logits = jnp.dot(xn.astype(dtype), params["head"]["kernel"].astype(dtype))
    return logits[:, 0], cache


class GPT(nn.Module):
    """Discrete-token GPT with conditioning (`mingpt.py:120-305`)."""

    cfg: TransformerConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        cfg = self.cfg
        self.tok_emb = nn.Embed(cfg.z_num, cfg.n_embd, dtype=self.dtype, param_dtype=jnp.float32)
        if cfg.state_num > 0 and cfg.state_size > 0:
            self.state_tok_emb = nn.Embed(cfg.state_num, cfg.n_embd, dtype=self.dtype, param_dtype=jnp.float32)
        if cfg.use_start_token:
            self.start_tok_emb = self.param("start_tok_emb", nn.initializers.normal(1.0), (1, cfg.n_embd), jnp.float32)
        if cfg.cat:
            self.lbl_emb = nn.Embed(cfg.num_lbl, cfg.n_embd, dtype=self.dtype, param_dtype=jnp.float32)

        h, w = cfg.z_shape
        if cfg.emb_mode == "spatio-temporal":
            self.h_emb = self.param("h_emb", nn.initializers.zeros, (1, h, cfg.n_embd), jnp.float32)
            self.w_emb = self.param("w_emb", nn.initializers.zeros, (1, w, cfg.n_embd), jnp.float32)
            self.t_emb = self.param("t_emb", nn.initializers.zeros, (1, cfg.num_blocks, cfg.n_embd), jnp.float32)
        elif cfg.emb_mode == "temporal":
            self.s_emb = self.param("s_emb", nn.initializers.zeros, (1, h * w, cfg.n_embd), jnp.float32)
            self.t_emb = self.param("t_emb", nn.initializers.zeros, (1, cfg.num_blocks, cfg.n_embd), jnp.float32)
        elif cfg.emb_mode is None:
            self.pos_emb = self.param("pos_emb", nn.initializers.zeros, (1, cfg.num_blocks * h * w, cfg.n_embd), jnp.float32)
        else:
            raise ValueError(cfg.emb_mode)
        if cfg.state_size > 0:
            if cfg.emb_mode is not None:
                self.state_s_emb = self.param("state_s_emb", nn.initializers.zeros, (1, cfg.state_size, cfg.n_embd), jnp.float32)
            else:
                self.state_pos_emb = self.param("state_pos_emb", nn.initializers.zeros, (1, cfg.num_blocks * cfg.state_size, cfg.n_embd), jnp.float32)

        self.core = GPTCore(cfg, dtype=self.dtype)
        self.head = nn.Dense(
            max(cfg.z_num, cfg.state_num), use_bias=False, dtype=self.dtype,
            param_dtype=jnp.float32,
        )

    # ---------------- positional embeddings ----------------

    def _frame_pos_emb(self, s_idx, t_idx, delta=None):
        """Frame-token positional embedding at (spatial s_idx, temporal t_idx).

        Matches `mingpt.py:186-217`. ``delta`` is an optional per-batch
        temporal shift (`delta_length_cond`), shape (B,) or scalar.
        """
        cfg = self.cfg
        h, w = cfg.z_shape
        t = t_idx if delta is None else t_idx[None, :] + delta[:, None]
        if cfg.emb_mode == "spatio-temporal":
            pe = self.h_emb[0][s_idx // w] + self.w_emb[0][s_idx % w] + self.t_emb[0][t]
        elif cfg.emb_mode == "temporal":
            pe = self.s_emb[0][s_idx] + self.t_emb[0][t]
        else:
            flat = t * (h * w) + s_idx
            pe = self.pos_emb[0][flat]
        return pe.astype(self.dtype)

    def _state_pos_emb(self, s_idx, t_idx):
        """State-token positional embedding (`mingpt.py:219-230`)."""
        cfg = self.cfg
        if cfg.emb_mode is not None:
            pe = self.state_s_emb[0][s_idx] + self.t_emb[0][t_idx]
        else:
            pe = self.state_pos_emb[0][t_idx * cfg.state_size + s_idx]
        return pe.astype(self.dtype)

    def _body_emb(self, code, state_code, sched: Schedule):
        """Merged body embedding: vectorized interleave of frame/state tokens."""
        b = code.shape[0]
        kind = jnp.asarray(sched.kind)
        s_idx = jnp.asarray(sched.s_idx)
        t_idx = jnp.asarray(sched.t_idx)
        # per-position source index into code / state_code streams
        src = np.zeros(sched.length, np.int32)
        src[sched.frame_pos] = np.arange(len(sched.frame_pos))
        src[sched.state_pos] = np.arange(len(sched.state_pos))
        src = jnp.asarray(src)

        frame_tok = jnp.take(code, jnp.clip(src, 0, code.shape[1] - 1), axis=1)
        fe = self.tok_emb(frame_tok) + self._frame_pos_emb(s_idx, t_idx)[None]
        if state_code is not None and len(sched.state_pos) > 0:
            state_tok = jnp.take(state_code, jnp.clip(src, 0, state_code.shape[1] - 1), axis=1)
            se = self.state_tok_emb(state_tok) + self._state_pos_emb(s_idx, t_idx)[None]
            emb = jnp.where((kind == KIND_STATE)[None, :, None], se, fe)
        else:
            emb = fe
        return emb

    def _cond_emb(self, cond_code, delta=None):
        """Conditioning-token embedding: frame-type with temporal shift
        (`mingpt.py:239-244`)."""
        cfg = self.cfg
        lc = cond_code.shape[1]
        s_idx = jnp.arange(lc) % cfg.size
        t_idx = jnp.arange(lc) // cfg.size
        pe = self._frame_pos_emb(s_idx, t_idx, delta)
        if delta is None:
            pe = pe[None]
        return self.tok_emb(cond_code) + pe

    def _prefix_emb(self, b, cond_code=None, delta=None, lbl=None):
        """[lbl][start][cond] prefix embedding (`mingpt.py:285-297`)."""
        parts = []
        if self.cfg.cat and lbl is not None:
            parts.append(self.lbl_emb(lbl)[:, None])
        if self.cfg.use_start_token:
            parts.append(jnp.tile(self.start_tok_emb[None].astype(self.dtype), (b, 1, 1)))
        if cond_code is not None and cond_code.shape[1] > 0:
            parts.append(self._cond_emb(cond_code, delta))
        if parts:
            return jnp.concatenate(parts, axis=1)
        return None

    # ---------------- training forward ----------------

    def __call__(self, code, state_code=None, cond_code=None, delta=None, lbl=None,
                 deterministic=True, sched: Optional[Schedule] = None):
        """Full causal forward; returns logits after the cond prefix.

        Mirrors reference `GPT.forward` (`mingpt.py:232-305`): input ``code``
        is the (possibly truncated) frame-token stream, ``state_code`` the
        state stream; logits are ``head(x)[:, t_cond:]``.
        """
        cfg = self.cfg
        b, lf = code.shape
        if sched is None:
            sched = _infer_schedule(cfg, lf, state_code.shape[1] if state_code is not None else 0)
        emb = self._body_emb(code, state_code, sched)
        prefix = self._prefix_emb(b, cond_code, delta, lbl)
        t_cond = cond_code.shape[1] if cond_code is not None else 0
        if prefix is not None:
            emb = jnp.concatenate([prefix, emb], axis=1)
        x, _ = self.core(emb, deterministic=deterministic)
        logits = self.head(x)
        return logits[:, t_cond:]

    # ---------------- cached generation ----------------

    def init_cache(self, b, max_len, dtype=None):
        cfg = self.cfg
        dtype = dtype or self.dtype
        nh, hd = cfg.n_head, cfg.n_embd // cfg.n_head
        # lane-align the length axis; extra slots are masked out (pos > index)
        max_len = -(-max_len // 128) * 128
        shape = (cfg.n_layer, b, nh, max_len, hd)
        return (jnp.zeros(shape, dtype), jnp.zeros(shape, dtype))

    def prefill(self, emb, cache):
        """Run the full (placeholder-padded) sequence once, filling the cache.

        Causality guarantees positions < prefix_len are exact; later slots are
        overwritten step-by-step during generation.
        """
        x, new_cache = self.core(emb, cache=cache, index=0, deterministic=True)
        return self.head(x), new_cache

    def decode_step(self, emb1, pos, cache):
        """One cached decode step. ``emb1``: (B, 1, D); ``pos``: scalar."""
        x, new_cache = self.core(emb1, cache=cache, index=pos, deterministic=True)
        return self.head(x)[:, 0], new_cache

    def head_apply(self, x):
        return self.head(x)

    def embed_one(self, token, kind, s_idx, t_idx, delta=None):
        """Embedding of body token(s) at schedule position attributes.

        Works for a single token (scalar attrs) or a whole buffer (attrs of
        shape (L,), tokens (B, L)).
        """
        fe = self.tok_emb(jnp.minimum(token, self.cfg.z_num - 1)) + self._frame_pos_emb(s_idx, t_idx)
        if self.cfg.state_num > 0 and self.cfg.state_size > 0:
            se = self.state_tok_emb(jnp.minimum(token, self.cfg.state_num - 1)) + self._state_pos_emb(s_idx, t_idx)
            is_state = jnp.asarray(kind == KIND_STATE)[..., None]
            return jnp.where(is_state, se, fe)
        return fe


def _infer_schedule(cfg: TransformerConfig, n_frame_tokens: int, n_state_tokens: int) -> Schedule:
    """Schedule for a training batch where the frame stream has
    ``n_frame_tokens`` tokens (last frame possibly truncated, reference
    `transformer_model.py:142-143` truncates to z_len)."""
    size, ss = cfg.size, cfg.state_size
    n_frames = -(-n_frame_tokens // size)
    n_state_frames = min(n_state_tokens // ss, cfg.num_blocks) if ss > 0 else 0
    full = build_schedule(cfg, n_frames, n_state_frames)
    # truncate trailing positions beyond available frame tokens
    keep = np.ones(full.length, bool)
    n_frame_used = 0
    for j in range(full.length):
        if full.kind[j] == KIND_FRAME:
            if n_frame_used >= n_frame_tokens:
                keep[j] = False
            n_frame_used += 1
    kind = full.kind[keep]
    return Schedule(
        kind=kind,
        s_idx=full.s_idx[keep],
        t_idx=full.t_idx[keep],
        frame_pos=np.nonzero(kind == KIND_FRAME)[0].astype(np.int32),
        state_pos=np.nonzero(kind == KIND_STATE)[0].astype(np.int32),
    )


class CGPT(nn.Module):
    """Continuous-embedding GPT with multi-proposal head (`mingpt.py:308-361`).

    Setup-style so cached generation can reuse the same machinery as the
    discrete GPT (``init_cache`` / ``prefill`` + the pure
    :func:`decode_step_fn`, whose param paths — ``core``/``head`` — match)."""

    cfg: TransformerConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        cfg = self.cfg
        self.tok_emb = nn.Dense(cfg.n_embd, dtype=self.dtype, param_dtype=jnp.float32)
        self.pos_emb = self.param(
            "pos_emb", nn.initializers.zeros, (1, cfg.z_len, cfg.n_embd), jnp.float32)
        self.core = GPTCore(cfg, dtype=self.dtype)
        logits_size = cfg.n_proposals if cfg.n_proposals > 1 else 0
        self.head = nn.Dense(
            cfg.n_proposals * cfg.n_in + logits_size, use_bias=False,
            dtype=self.dtype, param_dtype=jnp.float32)

    def _head_out(self, h):
        b = h.shape[0]
        out = self.head(h)
        if self.cfg.n_proposals > 1:
            out = out.reshape(b, out.shape[1], self.cfg.n_proposals, self.cfg.n_in + 1)
            return out[..., 0], out[..., 1:]
        return out

    def __call__(self, x, single=False, deterministic=True):
        h = self.embed(x)
        h, _ = self.core(h, deterministic=deterministic)
        if single:
            h = h[:, -1:]
        return self._head_out(h)

    def embed(self, x):
        """(B, T, n_in) -> (B, T, D) input embeddings from position 0."""
        return self.tok_emb(x) + self.pos_emb[:, : x.shape[1]].astype(self.dtype)

    def init_cache(self, b, max_len, dtype=None):
        cfg = self.cfg
        dtype = dtype or self.dtype
        nh, hd = cfg.n_head, cfg.n_embd // cfg.n_head
        max_len = -(-max_len // 128) * 128
        shape = (cfg.n_layer, b, nh, max_len, hd)
        return (jnp.zeros(shape, dtype), jnp.zeros(shape, dtype))

    def prefill(self, emb, cache):
        """Run the (placeholder-padded) sequence once, filling the cache;
        causality makes positions < the real prefix length exact."""
        x, new_cache = self.core(emb, cache=cache, index=0, deterministic=True)
        return self._head_out(x), new_cache
