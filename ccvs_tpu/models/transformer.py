"""Latent-token transformer wrapper: loss + KV-cached autoregressive
generation with sliding-window long rollouts.

Re-implements `Transformer` (`models/skip_vid_generator/models/
transformer_model.py`) TPU-first:

- `loss`           <- `compute_transformer_loss` (:142-253): masked CE over
  frame and state positions via the static token schedule.
- `generate`       <- `generate_fake`/`fill_code` (:263-392): the reference
  runs one full O(L^2) GPT forward per token; here generation is prefill +
  `lax.scan` of single-token cached decode steps, with per-kind (frame/state)
  top-k, temperature, and vocab masking selected by the static schedule.
- sliding window   <- (:292-323): when ``total_len > z_len``, re-prefill from
  the shifted prefix and scan one chunk at a time (each chunk is one compiled
  program; the reference pays per-token full forwards).
"""

from dataclasses import dataclass
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ccvs_tpu.config import TransformerConfig
from ccvs_tpu.nn.gpt import (GPT, KIND_FRAME, KIND_STATE, Schedule,
                             build_schedule, cache_to_layers, decode_step_fn)


def _sample_token(cfg: TransformerConfig, rng, logits, kind_j):
    """Sample one token: temperature / vocab mask / top-k / sample-or-greedy,
    switched between frame and state streams by ``kind_j``
    (`transformer_model.py:395-409`)."""
    is_state = kind_j == KIND_STATE
    temp = jnp.where(is_state, cfg.temperature_state, cfg.temperature)
    logits = logits.astype(jnp.float32) / temp
    vocab = logits.shape[-1]
    ar = jnp.arange(vocab)
    frame_mask = ar < cfg.z_num
    state_mask = ar < max(cfg.state_num, 1)
    mask = jnp.where(is_state, state_mask, frame_mask)
    logits = jnp.where(mask[None], logits, -jnp.inf)
    if cfg.top_k is not None or cfg.top_k_state is not None:
        kmax = max(k for k in [cfg.top_k, cfg.top_k_state, 1] if k is not None)
        vals, _ = jax.lax.top_k(logits, min(kmax, vocab))
        kf = (cfg.top_k or 1) - 1
        ks = (cfg.top_k_state or cfg.top_k or 1) - 1
        thresh = jnp.where(is_state, vals[:, ks], vals[:, kf])
        logits = jnp.where(logits < thresh[:, None], -jnp.inf, logits)
    do_sample = jnp.where(is_state, cfg.sample_state or cfg.sample, cfg.sample)
    sampled = jax.random.categorical(rng, logits, axis=-1)
    greedy = jnp.argmax(logits, axis=-1)
    return jnp.where(do_sample, sampled, greedy).astype(jnp.int32)


class TokenTransformer:
    def __init__(self, cfg: TransformerConfig, dtype=jnp.bfloat16):
        self.cfg = cfg
        self.model = GPT(cfg, dtype=dtype)

    def init(self, key, batch=1):
        cfg = self.cfg
        code = jnp.zeros((batch, min(cfg.z_len, cfg.num_blocks * cfg.size) - 1), jnp.int32)
        kwargs = {}
        if cfg.state_size > 0 and cfg.state_num > 0:
            kwargs["state_code"] = jnp.zeros(
                (batch, cfg.num_blocks * cfg.state_size), jnp.int32
            )
        if cfg.p2p or cfg.deblurring:
            kwargs["cond_code"] = jnp.zeros((batch, cfg.cond_len), jnp.int32)
            kwargs["delta"] = jnp.zeros((batch,), jnp.int32)
        if cfg.cat:
            kwargs["lbl"] = jnp.zeros((batch,), jnp.int32)
        return self.model.init(key, code, **kwargs)["params"]

    # ---------------- loss ----------------

    def loss(self, params, code, state_code=None, cond_code=None, delta=None,
             lbl=None, rngs=None):
        """CE loss over frame tokens (+ interleaved state tokens).

        Mirrors `compute_transformer_loss` (`transformer_model.py:142-253`):
        input is ``code[:, :-1]``, targets ``code`` (full, when start/lbl
        present) or ``code[:, 1:]``; state logits are restricted to
        ``state_num`` and scored against ``state_code[:, 1:]``.
        """
        cfg = self.cfg
        code = code[:, : cfg.z_len]
        inp = code[:, :-1]
        logits = self.model.apply(
            {"params": params}, inp, state_code=state_code, cond_code=cond_code,
            delta=delta, lbl=lbl,
            deterministic=rngs is None, rngs=rngs,
        )
        metrics = {}
        if state_code is not None and cfg.state_size > 0:
            lt = logits.shape[1]
            pos = np.arange(lt)
            if cfg.state_front:
                is_state_tgt = (pos + 1) < cfg.state_size * cfg.num_blocks
            else:
                is_state_tgt = (pos + 1) % cfg.tot_size < cfg.state_size
            state_i = np.nonzero(is_state_tgt)[0]
            frame_i = np.nonzero(~is_state_tgt)[0]
            state_logits = logits[:, state_i, : cfg.state_num]
            frame_logits = logits[:, frame_i]
            tgt_frame = code
            tgt_state = state_code[:, 1:]
            nll = _ce(frame_logits, tgt_frame)
            state_nll = _ce(state_logits, tgt_state)
            metrics = {"nll": nll, "state_nll": state_nll}
            return nll + state_nll, metrics
        if cfg.use_start_token or cfg.cat:
            tgt = code
        else:
            tgt = code[:, 1:]
        nll = _ce(logits[:, : tgt.shape[1]], tgt)
        return nll, {"nll": nll}

    # ---------------- generation ----------------

    def generate(self, params, rng, code, state_code=None, cond_code=None,
                 delta=None, lbl=None, total_len=None):
        """Autoregressively extend ``code`` (and ``state_code``).

        Mirrors `generate_fake` (`transformer_model.py:263-328`): fill to
        transformer capacity, then slide chunk-by-chunk until ``total_len``
        frame+state tokens are produced.

        Args:
          code: (B, n0) given frame tokens (context).
          total_len: total frame+state token budget (reference semantics);
            None = fill to capacity once.

        Returns:
          dict(code=(B, n_frame_tokens), state_code=(B, n_state_tokens)).
        """
        cfg = self.cfg
        b = code.shape[0]
        if self.model.dtype == jnp.bfloat16:
            # Pre-cast fp32 params ONCE (per-step in-graph casts re-read the
            # fp32 tree — ~1.2 GB/token at 24x1024); ln_f stays fp32 for
            # decode_step_fn's fp32 final LayerNorm.
            from ccvs_tpu.utils.casting import cast_params_bf16

            params = cast_params_bf16(params)
        self._qparams = None
        if cfg.serve_int8:
            from ccvs_tpu.nn.quantized import quantize_gpt_int8

            self._qparams = quantize_gpt_int8(params)
        if cfg.state_size > 0 and state_code is None:
            state_code = jnp.zeros((b, 0), jnp.int32)

        cap = self._capacity(cond_code)
        if total_len is None:
            total_len = cap + (cond_code.shape[1] if cond_code is not None else 0)
        budget = total_len - (cond_code.shape[1] if cond_code is not None else 0)

        # in-window capacities of a full window (a provided state stream —
        # drums audio stft, deblur token streams — can be LONGER than the
        # window; only the in-window slice counts toward the merged length)
        cap_sched = self._sched_for(cap)
        f_cap = int((np.asarray(cap_sched.frame_pos) < cap).sum())
        s_cap = int((np.asarray(cap_sched.state_pos) < cap).sum())

        # 1. fill to capacity (or budget if smaller)
        first_target = min(cap, budget)
        rng, sub = jax.random.split(rng)
        new_code, new_state = self._fill(
            params, sub, code, state_code, cond_code, delta, lbl,
            target_merged_len=first_target,
        )
        code = new_code
        if state_code is None or new_state is None or (
                new_state.shape[1] >= state_code.shape[1]):
            state_code = new_state  # sampled states grew; provided stream kept
        cur = first_target

        # 2. sliding window: drop the oldest frame's tokens, refill one chunk
        i = 1
        while cur < budget:
            add = min(cfg.z_chunk, budget - cur)
            if cond_code is not None and delta is not None:
                delta = delta - 1
            tmp_code = code[:, i * cfg.size :]
            tmp_state = state_code[:, i * cfg.state_size :] if state_code is not None else None
            tmp_merged = min(tmp_code.shape[1], f_cap) + (
                min(tmp_state.shape[1], s_cap) if tmp_state is not None else 0)
            rng, sub = jax.random.split(rng)
            new_code, new_state = self._fill(
                params, sub, tmp_code, tmp_state, cond_code, delta, lbl,
                target_merged_len=min(cap, tmp_merged + add),
            )
            code = jnp.concatenate([code, new_code[:, tmp_code.shape[1] :]], axis=1)
            if state_code is not None and new_state.shape[1] > tmp_state.shape[1]:
                state_code = jnp.concatenate(
                    [state_code, new_state[:, tmp_state.shape[1] :]], axis=1
                )
            cur += add
            i += 1

        return {"code": code, "state_code": state_code}

    def generate_chunk_fixed(self, params, rng, merged, n):
        """Extend a FIXED-capacity token buffer by one ``z_chunk`` at dynamic
        position ``n``.

        The step-by-step driver (`helpers/generator.py:132-159`) calls the
        transformer once per frame on a growing context; the reference (and
        our plain ``generate``) re-trace for every new length. Here the
        buffer is always ``(B, z_len)`` — tokens beyond ``n`` are
        placeholders, causally invisible to every position <= n and
        overwritten as the scan reaches them — and ``n`` is a traced scalar,
        so EVERY per-frame call reuses one compiled program.

        Only the plain frame-token stream is supported (the reference's
        ``--step_by_step`` configurations: no start/class/p2p prefix).

        Args:
          merged: (B, z_len) int32 buffer, first ``n`` positions real tokens.
          n: traced scalar count of real tokens (>= 1).

        Returns:
          merged with positions ``n .. n + z_chunk - 1`` generated.
        """
        cfg = self.cfg
        assert not (cfg.use_start_token or cfg.cat or cfg.p2p), (
            "fixed-shape chunk generation supports the plain token stream only")
        if self.model.dtype == jnp.bfloat16:
            from ccvs_tpu.utils.casting import cast_params_bf16

            params = cast_params_bf16(params)
        qparams = None
        if cfg.serve_int8:
            from ccvs_tpu.nn.quantized import quantize_gpt_int8

            qparams = quantize_gpt_int8(params)
        L = cfg.z_len
        sched = self._sched_for(L)
        kind = jnp.asarray(sched.kind[:L])
        s_idx = jnp.asarray(sched.s_idx[:L])
        t_idx = jnp.asarray(sched.t_idx[:L])
        # mirror generate()'s split structure so outputs match the growing-
        # shape path token-for-token under the same starting rng
        rng, sub = jax.random.split(rng)
        return self._chunk_fill_jit(
            params, sub, merged, jnp.asarray(n, jnp.int32), kind, s_idx, t_idx,
            qparams,
        )

    @partial(jax.jit, static_argnums=(0,))
    def _chunk_fill_jit(self, params, rng, merged, n, kind, s_idx, t_idx,
                        qparams=None):
        cfg = self.cfg
        b, L = merged.shape
        model = self.model
        if qparams is not None:
            from ccvs_tpu.nn.quantized import decode_step_fn_int8

            step_decode = partial(decode_step_fn_int8, cfg, params, qparams)
        else:
            step_decode = partial(decode_step_fn, cfg, params)

        cache = model.apply({"params": params}, b, L, method=GPT.init_cache)
        emb = model.apply(
            {"params": params}, merged, kind, s_idx, t_idx, method=GPT.embed_one
        )
        logits_all, cache = model.apply({"params": params}, emb, cache, method=GPT.prefill)
        cache = cache_to_layers(cache)
        logits0 = jax.lax.dynamic_index_in_dim(
            logits_all, n - 1, axis=1, keepdims=False
        )

        def step(carry, k):
            merged, cache, logits, rng = carry
            j = n + k
            rng, sub = jax.random.split(rng)
            tok = _sample_token(cfg, sub, logits, kind[j])
            merged = jax.lax.dynamic_update_index_in_dim(merged, tok, j, axis=1)
            emb1 = model.apply(
                {"params": params}, tok, kind[j], s_idx[j], t_idx[j],
                method=GPT.embed_one,
            )[:, None]
            new_logits, cache = step_decode(emb1, j, cache, dtype=model.dtype)
            return (merged, cache, new_logits, rng), None

        (merged, _, _, _), _ = jax.lax.scan(
            step, (merged, cache, logits0, rng), jnp.arange(cfg.z_chunk)
        )
        return merged

    def _capacity(self, cond_code):
        """Merged-token capacity of one window (`transformer_model.py:337-339`)."""
        cfg = self.cfg
        cap = cfg.z_len
        if cond_code is not None:
            cap -= cond_code.shape[1]
        return cap

    def _fill(self, params, rng, code, state_code, cond_code, delta, lbl,
              target_merged_len):
        """Prefill + scan-decode until the merged body has
        ``target_merged_len`` tokens (static)."""
        cfg = self.cfg
        b = code.shape[0]
        n0_frame = code.shape[1]
        n0_state = state_code.shape[1] if state_code is not None else 0
        L = int(target_merged_len)
        if L <= 0:
            return code, state_code
        # NOTE: a provided state stream can be LONGER than the window (drums
        # audio-on: 45x16 stft tokens vs 16 in-window state blocks); only the
        # in-window slice counts as given — the all-covered early return
        # below handles "nothing to generate", not a raw n0 comparison.

        sched = self._sched_for(L)
        kind = jnp.asarray(sched.kind[:L])
        s_idx = jnp.asarray(sched.s_idx[:L])
        t_idx = jnp.asarray(sched.t_idx[:L])

        # merged initial buffer: scatter given frame/state tokens
        merged = jnp.zeros((b, L), jnp.int32)
        fpos = sched.frame_pos[sched.frame_pos < L][:n0_frame]
        merged = merged.at[:, jnp.asarray(fpos)].set(code[:, : len(fpos)])
        if state_code is not None and n0_state > 0:
            spos = sched.state_pos[sched.state_pos < L][:n0_state]
            merged = merged.at[:, jnp.asarray(spos)].set(state_code[:, : len(spos)])
        # positions whose tokens are given (context frames; provided state /
        # audio streams). Given tokens are never overwritten — the reference
        # achieves the same by always reading provided streams positionally
        # during embedding (`mingpt.py:259-282`).
        covered = np.zeros(L, bool)
        covered[fpos] = True
        if state_code is not None and n0_state > 0:
            covered[spos] = True
        start = int(np.nonzero(~covered)[0][0]) if not covered.all() else L
        if start >= L:
            return code, state_code

        if cfg.beam_size is not None and cfg.beam_size > 1:
            # first generated FRAME position: hypotheses must take `beam`
            # DISTINCT tokens there or greedy beam search degenerates to
            # clones (state tokens sample identically across beams)
            kind_np = np.asarray(sched.kind[:L])
            frame_free = [
                p for p in range(start, L)
                if kind_np[p] == KIND_FRAME and not covered[p]
            ]
            beam_start = frame_free[0] if frame_free else -1
            merged = self._fill_beam_jit(
                params, rng, merged, start, jnp.asarray(covered), kind, s_idx, t_idx,
                cond_code, delta, lbl, beam_start,
                getattr(self, "_qparams", None),
            )
        else:
            merged = self._fill_jit(
                params, rng, merged, start, jnp.asarray(covered), kind, s_idx, t_idx,
                cond_code, delta, lbl, getattr(self, "_qparams", None),
            )

        out_code = jnp.take(merged, jnp.asarray(sched.frame_pos[sched.frame_pos < L]), axis=1)
        out_state = None
        if state_code is not None:
            out_state = jnp.take(merged, jnp.asarray(sched.state_pos[sched.state_pos < L]), axis=1)
        return out_code, out_state

    def _sched_for(self, merged_len):
        cfg = self.cfg
        # enough frames to cover merged_len
        per = cfg.tot_size if cfg.state_size > 0 else cfg.size
        n_frames = min(-(-merged_len // per), cfg.num_blocks)
        if n_frames * per < merged_len:  # partial extra frame within capacity
            n_frames = -(-merged_len // per)
        return build_schedule(cfg, n_frames)

    @partial(jax.jit, static_argnums=(0, 4))
    def _fill_jit(self, params, rng, merged, start, given, kind, s_idx, t_idx,
                  cond_code, delta, lbl, qparams=None):
        cfg = self.cfg
        b, L = merged.shape
        model = self.model
        if qparams is not None:
            from ccvs_tpu.nn.quantized import decode_step_fn_int8

            step_decode = partial(decode_step_fn_int8, cfg, params, qparams)
        else:
            step_decode = partial(decode_step_fn, cfg, params)

        prefix_len = 0
        if cfg.cat and lbl is not None:
            prefix_len += 1
        if cfg.use_start_token:
            prefix_len += 1
        if cond_code is not None:
            prefix_len += cond_code.shape[1]
        max_len = prefix_len + L

        cache = model.apply({"params": params}, b, max_len, method=GPT.init_cache)

        # full-buffer embedding for prefill (placeholders beyond `start` are
        # causally invisible to positions < start and overwritten during scan)
        def embed_body(tokens):
            fe = model.apply(
                {"params": params}, tokens, kind, s_idx, t_idx,
                method=GPT.embed_one,
            )
            return fe

        body_emb = embed_body(merged)
        prefix_emb = model.apply(
            {"params": params}, b, cond_code, delta, lbl, method=GPT._prefix_emb
        )
        emb = body_emb if prefix_emb is None else jnp.concatenate([prefix_emb, body_emb], axis=1)
        logits_all, cache = model.apply({"params": params}, emb, cache, method=GPT.prefill)
        cache = cache_to_layers(cache)
        # logits at absolute position (prefix_len + start - 1) predict body[start]
        logits0 = jax.lax.dynamic_index_in_dim(
            logits_all, prefix_len + start - 1, axis=1, keepdims=False
        )

        def sample(rng, logits, j):
            return _sample_token(cfg, rng, logits, kind[j])

        def step(carry, j):
            merged, cache, logits, rng = carry
            rng, sub = jax.random.split(rng)
            tok = sample(sub, logits, j)
            # never overwrite given tokens (context frames, provided states)
            old = jax.lax.dynamic_index_in_dim(merged, j, axis=1, keepdims=False)
            tok = jnp.where(given[j], old, tok)
            merged = jax.lax.dynamic_update_index_in_dim(merged, tok, j, axis=1)
            emb1 = model.apply(
                {"params": params}, tok, kind[j], s_idx[j], t_idx[j],
                method=GPT.embed_one,
            )[:, None]
            new_logits, cache = step_decode(emb1, prefix_len + j, cache,
                                            dtype=model.dtype)
            return (merged, cache, new_logits, rng), None

        # (A cache-length-segmented variant — short cache slices for early
        # positions — measured SLOWER end-to-end on v5e than one full-length
        # scan, so the simple scan stays.)
        (merged, _, _, _), _ = jax.lax.scan(
            step, (merged, cache, logits0, rng), jnp.arange(start, L)
        )
        return merged


    @partial(jax.jit, static_argnums=(0, 4, 12))
    def _fill_beam_jit(self, params, rng, merged, start, given, kind, s_idx, t_idx,
                       cond_code, delta, lbl, beam_start=-1, qparams=None):
        """Beam-search fill (`transformer_model.py:358-391`).

        Hypotheses are folded into the batch axis (B*beam). At the first
        generated FRAME position (static ``beam_start``) every batch element
        takes ``beam`` DISTINCT tokens (Gumbel top-k = sampling without
        replacement; plain top-k when greedy) — interleaved state tokens
        before it sample identically across the still-identical beams. Later
        frame positions sample one token per hypothesis and accumulate
        log-probs, or with ``no_sample`` expand beam^2 candidates, prune to
        the top beam, and reorder the KV cache. The best hypothesis per batch
        element wins at the end.
        """
        cfg = self.cfg
        model = self.model
        beam = cfg.beam_size
        b, L = merged.shape
        if qparams is not None:
            from ccvs_tpu.nn.quantized import decode_step_fn_int8

            step_decode = partial(decode_step_fn_int8, cfg, params, qparams)
        else:
            step_decode = partial(decode_step_fn, cfg, params)

        prefix_len = (cond_code.shape[1] if cond_code is not None else 0) + (
            1 if cfg.use_start_token else 0
        ) + (1 if (cfg.cat and lbl is not None) else 0)
        max_len = prefix_len + L
        bb = b * beam

        rep = lambda x: jnp.repeat(x, beam, axis=0) if x is not None else None
        merged_b = rep(merged)
        cache = model.apply({"params": params}, bb, max_len, method=GPT.init_cache)

        body_emb = model.apply(
            {"params": params}, merged_b, kind, s_idx, t_idx, method=GPT.embed_one
        )
        prefix_emb = model.apply(
            {"params": params}, bb, rep(cond_code), rep(delta), rep(lbl),
            method=GPT._prefix_emb,
        )
        emb = body_emb if prefix_emb is None else jnp.concatenate([prefix_emb, body_emb], axis=1)
        logits_all, cache = model.apply({"params": params}, emb, cache, method=GPT.prefill)
        cache = cache_to_layers(cache)
        logits0 = jax.lax.dynamic_index_in_dim(
            logits_all, prefix_len + start - 1, axis=1, keepdims=False
        )  # (bb, V)

        def logprobs(logits):
            lg = logits.astype(jnp.float32)[:, : cfg.z_num] / cfg.temperature
            if cfg.top_k is not None:
                vals, _ = jax.lax.top_k(lg, min(cfg.top_k, lg.shape[-1]))
                lg = jnp.where(lg < vals[:, -1:], -jnp.inf, lg)
            return jax.nn.log_softmax(lg, axis=-1)

        # first generated position: beam distinct tokens per batch element
        # (or a plain state sample when the schedule interleaves a state slot
        # first — beams stay identical until the first frame token)
        rng, sub = jax.random.split(rng)

        def first_frame(_):
            lp0 = logprobs(logits0)[::beam]  # (b, V) — beams identical after prefill
            if cfg.sample and not cfg.no_sample:
                g = -jnp.log(-jnp.log(jax.random.uniform(sub, lp0.shape) + 1e-20) + 1e-20)
                _, tok0 = jax.lax.top_k(lp0 + g, beam)  # sampling w/o replacement
            else:
                _, tok0 = jax.lax.top_k(lp0, beam)
            tok0 = tok0.reshape(bb)
            log_p = jnp.take_along_axis(lp0, tok0.reshape(b, beam), axis=1).reshape(bb)
            return tok0.astype(jnp.int32), log_p

        def first_state(_):
            lg = logits0.astype(jnp.float32) / cfg.temperature_state
            ar = jnp.arange(lg.shape[-1])
            lg = jnp.where(ar[None] < max(cfg.state_num, 1), lg, -jnp.inf)
            if cfg.top_k_state is not None:
                vals, _ = jax.lax.top_k(lg, min(cfg.top_k_state, lg.shape[-1]))
                lg = jnp.where(lg < vals[:, -1:], -jnp.inf, lg)
            if cfg.sample_state or cfg.sample:
                tok0 = jax.random.categorical(sub, lg, axis=-1)
            else:
                tok0 = jnp.argmax(lg, axis=-1)
            return tok0.astype(jnp.int32), jnp.zeros((bb,), jnp.float32)

        def first_given(_):
            tok0 = jax.lax.dynamic_index_in_dim(merged_b, start, axis=1, keepdims=False)
            return tok0.astype(jnp.int32), jnp.zeros((bb,), jnp.float32)

        case0 = jnp.where(given[start], 2, jnp.where(kind[start] == KIND_STATE, 1, 0))
        tok0, log_p = jax.lax.switch(case0, [first_frame, first_state, first_given], None)

        merged_b = merged_b.at[:, start].set(tok0)
        emb1 = model.apply(
            {"params": params}, tok0, kind[start], s_idx[start], t_idx[start],
            method=GPT.embed_one,
        )[:, None]
        logits, cache = step_decode(emb1, prefix_len + start, cache,
                                    dtype=model.dtype)

        def step(carry, j):
            merged_b, cache, logits, log_p, rng = carry
            rng, sub = jax.random.split(rng)
            lp = logprobs(logits)  # (bb, V)

            def frame_case(op):
                merged_b, cache, log_p = op
                if cfg.sample:
                    tok = jax.random.categorical(sub, lp, axis=-1)
                    ilp = jnp.take_along_axis(lp, tok[:, None], axis=1)[:, 0]
                    new_log_p = log_p + ilp
                else:
                    # expand beam^2, prune to beam, reorder cache
                    vals, cand = jax.lax.top_k(lp, beam)  # (bb, beam)
                    total = (log_p[:, None] + vals).reshape(b, beam * beam)
                    new_log_p, keep = jax.lax.top_k(total, beam)  # (b, beam)
                    parent = keep // beam  # hypothesis index within batch elem
                    tok = jnp.take_along_axis(
                        cand.reshape(b, beam * beam), keep, axis=1
                    ).reshape(bb)
                    gather_idx = (jnp.arange(b)[:, None] * beam + parent).reshape(bb)
                    merged_b = merged_b[gather_idx]
                    cache = jax.tree_util.tree_map(lambda c: c[gather_idx], cache)
                    new_log_p = new_log_p.reshape(bb)
                return merged_b, cache, new_log_p, tok.astype(jnp.int32)

            def state_case(op):
                # state tokens ride along per hypothesis, outside the beam
                # score (reference samples them directly in the generation
                # loop, `transformer_model.py:352-356`)
                merged_b, cache, log_p = op
                lg = logits.astype(jnp.float32) / cfg.temperature_state
                ar = jnp.arange(lg.shape[-1])
                lg = jnp.where(ar[None] < max(cfg.state_num, 1), lg, -jnp.inf)
                if cfg.top_k_state is not None:
                    vals, _ = jax.lax.top_k(lg, min(cfg.top_k_state, lg.shape[-1]))
                    lg = jnp.where(lg < vals[:, -1:], -jnp.inf, lg)
                if cfg.sample_state or cfg.sample:
                    tok = jax.random.categorical(sub, lg, axis=-1)
                else:
                    tok = jnp.argmax(lg, axis=-1)
                return merged_b, cache, log_p, tok.astype(jnp.int32)

            def given_case(op):
                # provided tokens (context frames / keep_state streams) are
                # copied through without scoring or reordering
                merged_b, cache, log_p = op
                tok = jax.lax.dynamic_index_in_dim(merged_b, j, axis=1, keepdims=False)
                return merged_b, cache, log_p, tok.astype(jnp.int32)

            def diversify_case(op):
                # first generated FRAME position: `beam` distinct tokens per
                # batch element (beams are still identical clones here when
                # preceded only by state tokens)
                merged_b, cache, log_p = op
                lp0 = lp[::beam]  # (b, V) — rows identical across beams
                if cfg.sample and not cfg.no_sample:
                    g = -jnp.log(-jnp.log(jax.random.uniform(sub, lp0.shape) + 1e-20) + 1e-20)
                    _, tok = jax.lax.top_k(lp0 + g, beam)
                else:
                    _, tok = jax.lax.top_k(lp0, beam)
                tok = tok.reshape(bb)
                ilp = jnp.take_along_axis(lp0, tok.reshape(b, beam), axis=1).reshape(bb)
                return merged_b, cache, log_p + ilp, tok.astype(jnp.int32)

            case = jnp.where(
                given[j], 2,
                jnp.where(kind[j] == KIND_STATE, 1, jnp.where(j == beam_start, 3, 0)),
            )
            merged_b, cache, new_log_p, tok = jax.lax.switch(
                case, [frame_case, state_case, given_case, diversify_case],
                (merged_b, cache, log_p),
            )
            merged_b = jax.lax.dynamic_update_index_in_dim(merged_b, tok, j, axis=1)
            emb1 = model.apply(
                {"params": params}, tok, kind[j], s_idx[j], t_idx[j], method=GPT.embed_one
            )[:, None]
            new_logits, cache = step_decode(emb1, prefix_len + j, cache,
                                            dtype=model.dtype)
            return (merged_b, cache, new_logits, new_log_p, rng), None

        (merged_b, _, _, log_p, _), _ = jax.lax.scan(
            step, (merged_b, cache, logits, log_p, rng), jnp.arange(start + 1, L)
        )
        best = jnp.argmax(log_p.reshape(b, beam), axis=1)
        return merged_b.reshape(b, beam, L)[jnp.arange(b), best]


def _ce(logits, targets):
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    return jnp.mean(nll)


class ContinuousTransformer:
    """Continuous-embedding transformer (CGPT) wrapper.

    The reference's `is_continuous` path (`transformer_model.py:147-159`,
    active branch): MSE next-embedding regression and single-step
    autoregressive rollout with optional prediction normalization.
    """

    def __init__(self, cfg: TransformerConfig, dtype=jnp.bfloat16):
        from ccvs_tpu.nn.gpt import CGPT

        self.cfg = cfg
        self.model = CGPT(cfg, dtype=dtype)

    def init(self, key, batch=1):
        x = jnp.zeros((batch, self.cfg.z_len - 1, self.cfg.n_in), jnp.float32)
        return self.model.init(key, x)["params"]

    def loss(self, params, code):
        """MSE over next-embedding predictions (`transformer_model.py:159`)."""
        code = code[:, : self.cfg.z_len]
        pred = self.model.apply({"params": params}, code[:, :-1])
        if self.cfg.n_proposals > 1:
            pred = pred[1]  # proposals; score best-of below
            tgt = code[:, 1:][:, :, None]
            mse = jnp.min(jnp.mean((pred - tgt) ** 2, axis=-1), axis=-1).mean()
        else:
            mse = jnp.mean((pred - code[:, 1:]) ** 2)
        return mse, {"nll": mse}

    def generate(self, params, code, total_len, normalize_pred=False):
        """Greedy continuous rollout (`transformer_model.py:344-348`).

        One jitted program: KV-cache prefill over the context, then a
        ``lax.scan`` of single-token cached decode steps (the discrete path's
        `decode_step_fn`) — not the reference's per-token O(T^2) full
        forwards."""
        if int(total_len) <= code.shape[1]:
            return code  # nothing to generate (reference loop runs 0 steps)
        key = (code.shape, int(total_len), bool(normalize_pred))
        if getattr(self, "_gen_cache", None) is None:
            self._gen_cache = {}
        if key not in self._gen_cache:
            self._gen_cache[key] = jax.jit(
                partial(self._generate_impl, total_len=int(total_len),
                        normalize_pred=bool(normalize_pred))
            )
        return self._gen_cache[key](params, code)

    def _generate_impl(self, params, code, total_len, normalize_pred):
        from ccvs_tpu.nn.gpt import CGPT, cache_to_layers, decode_step_fn

        cfg = self.cfg
        model = self.model
        b, n0, nin = code.shape
        L = total_len
        buf = jnp.zeros((b, L, nin), code.dtype).at[:, :n0].set(code)

        def pick(out):
            """Head output for one position -> (B, n_in) prediction."""
            if cfg.n_proposals > 1:
                o = out.reshape(b, cfg.n_proposals, cfg.n_in + 1)
                best = jnp.argmax(o[..., 0], axis=-1)
                pred = jnp.take_along_axis(o[..., 1:], best[:, None, None], axis=1)[:, 0]
            else:
                pred = out
            if normalize_pred:
                pred = pred / jnp.linalg.norm(pred, axis=-1, keepdims=True)
            return pred.astype(buf.dtype)

        cache = model.apply({"params": params}, b, L, method=CGPT.init_cache)
        emb = model.apply({"params": params}, buf, method=CGPT.embed)
        out, cache = model.apply({"params": params}, emb, cache, method=CGPT.prefill)
        if cfg.n_proposals > 1:
            logits, props = out
            out = jnp.concatenate(
                [logits[..., None], props], axis=-1).reshape(b, L, -1)
        buf = buf.at[:, n0].set(pick(out[:, n0 - 1]))
        if L <= n0 + 1:
            return buf
        cache = cache_to_layers(cache)

        pe = params["pos_emb"][0]  # (z_len, D)
        wk = params["tok_emb"]["kernel"]
        bk = params["tok_emb"]["bias"]

        def step(carry, j):
            buf, cache = carry
            x_prev = jax.lax.dynamic_slice_in_dim(buf, j - 1, 1, axis=1)
            emb1 = (x_prev @ wk + bk + pe[j - 1][None, None]).astype(model.dtype)
            out1, cache = decode_step_fn(cfg, params, emb1, j - 1, cache,
                                         dtype=model.dtype)
            buf = jax.lax.dynamic_update_slice_in_dim(
                buf, pick(out1)[:, None], j, axis=1)
            return (buf, cache), None

        (buf, _), _ = jax.lax.scan(step, (buf, cache), jnp.arange(n0 + 1, L))
        return buf
