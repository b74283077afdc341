"""Frame autoencoder: encode / quantize / decode, with the doubly-
autoregressive video decode loop as a single `lax.scan`.

TPU-native re-implementation of the inference surface of `QVidModel`
(`models/skip_vid_generator/models/quantized_video_model.py:773-949`):

- `encode`   <- `QVidModel.encode` (:773-819)
- `decode_video` <- `QVidModel.decode` (:822-918): the reference's Python
  loop with a growing list FIFO becomes a `lax.scan` over frames carrying a
  fixed-shape per-resolution context FIFO + dynamic validity mask. The
  decode->re-encode context refresh (`:876`) is fused into the scanned step,
  so the whole rollout is one XLA program with zero host round-trips.
- `vid_step_decode` (:920-949) falls out of `decode_step`.

Training losses live in `ccvs_tpu.train.ae_losses`.
"""

import os
from dataclasses import dataclass
from functools import partial
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ccvs_tpu.config import AutoencoderConfig
from ccvs_tpu.nn.decoder import SkipDecoder
from ccvs_tpu.nn.encoder import SkipEncoder
from ccvs_tpu.nn.quantizer import VectorQuantizer


class FrameAutoencoder:
    """Stateless bundle of encoder / quantizer / decoder apply functions."""

    def __init__(self, cfg: AutoencoderConfig, dtype=jnp.bfloat16):
        self.cfg = cfg
        self.dtype = dtype
        self.encoder = SkipEncoder(cfg, dtype=dtype)
        dec_mode = "both" if (cfg.use_layout and cfg.same_decoder_layout) else "rgb"
        self.decoder = SkipDecoder(cfg, mode=dec_mode, dtype=dtype)
        self.quantizer = VectorQuantizer(
            cfg.z_num, cfg.z_size, beta=0.25, mult=cfg.z_mult, normalize=cfg.normalize_out
        )
        # layout twins (`quantized_video_model.py:132-160`): a parallel
        # encoder/quantizer (+ decoder unless same_decoder_layout) over
        # one-hot segmentation maps
        self.encoder_l = None
        self.decoder_l = None
        self.quantizer_l = None
        if cfg.use_layout:
            self.encoder_l = SkipEncoder(cfg, mode="layout", dtype=dtype)
            self.quantizer_l = VectorQuantizer(
                cfg.z_num, cfg.z_size, beta=0.25, mult=cfg.z_mult,
                normalize=cfg.normalize_out,
            )
            if not cfg.same_decoder_layout:
                self.decoder_l = SkipDecoder(cfg, mode="layout", dtype=dtype)

    # ---------------- init ----------------

    def init(self, key, height=None, width=None):
        cfg = self.cfg
        h = height or cfg.max_dim
        w = width or int(cfg.max_dim * cfg.aspect_ratio)
        k1, k2, k3, k4, k5, k6 = jax.random.split(key, 6)
        x = jnp.zeros((1, h, w, 3), jnp.float32)
        e = self.encoder.init(k1, x)["params"]
        z = jnp.zeros((1, *cfg.z_shape, cfg.z_size), jnp.float32)
        q = self.quantizer.init(k2, z)["params"]
        inters = self._zero_inters(1, 1)
        inters_list = [[f[:, 0] for f in inters]]
        zg = jnp.concatenate([z, z], -1) if (cfg.use_layout and cfg.same_decoder_layout) else z
        g = self.decoder.init(k3, zg.astype(self.dtype), inters_list)["params"]
        params = {"encoder": e, "quantizer": q, "decoder": g}
        if self.encoder_l is not None:
            xl = jnp.zeros((1, h, w, cfg.layout_size), jnp.float32)
            params["encoder_l"] = self.encoder_l.init(k4, xl)["params"]
            params["quantizer_l"] = self.quantizer_l.init(k5, z)["params"]
            if self.decoder_l is not None:
                params["decoder_l"] = self.decoder_l.init(
                    k6, z.astype(self.dtype), inters_list
                )["params"]
        return params

    # ---------------- layout helpers ----------------

    def one_hot_layout(self, layout):
        """Integer segmentation (B[,T], H, W) -> one-hot NHWC
        (`quantized_video_model.py:259,491`)."""
        return jax.nn.one_hot(layout, self.cfg.layout_size, dtype=jnp.float32)

    def encode_layout(self, params, layout):
        """Layout maps -> (layout code indices, zl_q, layout inters)."""
        soft = self.one_hot_layout(layout)
        zl, inters_l = self.encoder_l.apply(
            {"params": params["encoder_l"]}, soft.astype(self.dtype)
        )
        zl_q, _, (_, idx) = self.quantizer_l.apply(
            {"params": params["quantizer_l"]}, zl.astype(jnp.float32)
        )
        lead = idx.shape[: idx.ndim - 2]
        return {"code": idx.reshape(*lead, -1), "z": zl_q, "inter": inters_l}

    @staticmethod
    def merge_layout_inters(inter, inter_l):
        """Half image channels + half layout channels per resolution
        (`quantized_video_model.py:330-334`)."""
        out = []
        for f, fl in zip(inter, inter_l):
            half = f.shape[-1] // 2
            out.append(jnp.concatenate([f[..., :half], fl[..., half:]], axis=-1))
        return out

    # ---------------- shapes ----------------

    def inter_shapes(self, batch: int) -> List[Tuple[int, ...]]:
        """Per-resolution context feature shapes, encoder (finest-first) order."""
        cfg = self.cfg
        h, w = cfg.max_dim, int(cfg.max_dim * cfg.aspect_ratio)
        shapes = []
        for i, c in enumerate(cfg.inter_sizes_enc):
            shapes.append((batch, h // (2**i), w // (2**i), c))
        return shapes

    def _zero_inters(self, batch: int, slots: int):
        return [
            jnp.zeros((s[0], slots, *s[1:]), self.dtype)
            for s in self.inter_shapes(batch)
        ]

    # ---------------- encode ----------------

    def encode(self, params, frames):
        """Frames -> (code indices, z_q, inter features).

        ``frames``: (B, H, W, 3) or (B, T, H, W, 3) in [-1, 1].
        Matches `QVidModel.encode` (`quantized_video_model.py:773-819`).
        """
        z, inters = self.encoder.apply({"params": params["encoder"]}, frames.astype(self.dtype))
        zf = z.astype(jnp.float32)
        z_q, _, (_, idx) = self.quantizer.apply({"params": params["quantizer"]}, zf)
        lead = idx.shape[: idx.ndim - 2]
        code = idx.reshape(*lead, -1)  # (B[,T], h*w)
        return {"code": code, "z": z_q, "inter": inters}

    def embed_code(self, params, code):
        """Token indices -> z_q latents (B[,T], h, w, z_size)."""
        cfg = self.cfg
        lead = code.shape[:-1]
        idx = code.reshape(*lead, *cfg.z_shape)
        z = self.quantizer.apply(
            {"params": params["quantizer"]}, idx, method=VectorQuantizer.embed_code
        )
        return z

    # ---------------- single-frame decode ----------------

    def decode_frame(self, params, z, inter_fifo, fifo_mask, has_ctx=True,
                     inter_pre_warping=False, extra_ctx=None):
        """Decode one frame against the context FIFO.

        Args:
          z: (B, h, w, z_size) latents for this frame.
          inter_fifo: list per resolution of (B, M, h_r, w_r, c_r); slot
            ``M-1`` is the most recent context (dt=1).
          fifo_mask: (B, M) validity (slot m <-> dt = M-m; combines the static
            ``skip_context`` membership and the dynamic frame count).

        Returns:
          (rgb, inter_dec) where inter_dec is finest-first (encoder order).
        """
        cfg = self.cfg
        m = inter_fifo[0].shape[1]
        # contexts as list-of-lists: k = M slots, most recent first is not
        # required — masking handles validity; order follows slots.
        inter_tgts = [[f[:, s] for f in inter_fifo] for s in range(m)]
        if extra_ctx is not None:
            # e.g. the p2p end-frame context, warped at every step
            # (`quantized_video_model.py:868-873`)
            inter_tgts = inter_tgts + [extra_ctx]
            ones = jnp.ones((fifo_mask.shape[0], 1), fifo_mask.dtype)
            fifo_mask = jnp.concatenate([fifo_mask, ones], axis=1)
        rgb, _, flows, occs, inter_dec = self.decoder.apply(
            {"params": params["decoder"]},
            z.astype(self.dtype),
            inter_tgts,
            ctx_mask=fifo_mask,
            return_all=True,
            inter_pre_warping=inter_pre_warping,
            has_ctx=has_ctx,
        )
        # inter_dec is coarsest-first (decoder order); reverse to encoder order
        # (reference `quantized_video_model.py:880-881`).
        return rgb, list(reversed(inter_dec))

    def refresh_inter(self, params, rgb):
        """Re-encode a decoded frame to get fresh context features
        (`skip_mode == 'enc'`, reference `quantized_video_model.py:875-878`)."""
        _, inters = self.encoder.apply({"params": params["encoder"]}, rgb.astype(self.dtype))
        return inters

    @staticmethod
    def fifo_push(inter_fifo, new_inter, curr, keep_first=False, n_first=1):
        """Shift the FIFO left and append ``new_inter`` at the last slot.

        Mirrors `quantized_video_model.py:895-902`: optionally pins the first
        ``n_first`` slots once the FIFO is full.
        """
        out = []
        m = inter_fifo[0].shape[1]
        for fifo, new in zip(inter_fifo, new_inter):
            shifted = jnp.concatenate([fifo[:, 1:], new[:, None].astype(fifo.dtype)], axis=1)
            if keep_first:
                pinned = jnp.concatenate(
                    [fifo[:, :n_first], fifo[:, n_first + 1 :], new[:, None].astype(fifo.dtype)],
                    axis=1,
                )
                shifted = jnp.where(curr >= m, pinned, shifted)
            out.append(shifted)
        return out

    def fifo_mask(self, batch, curr):
        """(B, M) validity: slot m (dt = M - m) valid iff dt <= curr and dt in
        ``skip_context``."""
        cfg = self.cfg
        m = cfg.skip_memory
        dts = m - jnp.arange(m)  # slot 0 -> dt=M ... slot M-1 -> dt=1
        member = jnp.asarray([(int(dt) in cfg.skip_context) for dt in range(m, 0, -1)], jnp.float32)
        valid = (dts <= curr).astype(jnp.float32) * member
        return jnp.tile(valid[None], (batch, 1))

    # ---------------- video decode (doubly-AR rollout) ----------------

    def _bucket(self, k: int, m: int) -> int:
        """Smallest configured bucket >= k (``cfg.decode_buckets``, with
        ``skip_memory`` as the implicit last bucket; CCVS_DECODE_BUCKETS env
        overrides for within-run A/B without touching the config)."""
        env = os.environ.get("CCVS_DECODE_BUCKETS")
        if env:
            try:
                buckets = tuple(int(s) for s in env.split(",") if s.strip())
            except ValueError as e:
                raise ValueError(
                    f"CCVS_DECODE_BUCKETS={env!r} is not a comma-separated "
                    "list of ints (e.g. '2,4,8,12')"
                ) from e
            if any(b < 1 for b in buckets):
                raise ValueError(f"CCVS_DECODE_BUCKETS={env!r}: buckets must be >= 1")
        else:
            buckets = self.cfg.decode_buckets
        for b in sorted(buckets):
            if k <= b <= m:
                return b
        return m

    def _decode_step_fn(self, params, fifo, curr, z_t, cond_inter=None, kb=None):
        """One rollout step: decode frame, refresh context, push FIFO.

        ``kb``: static number of FIFO slots actually fed to the decoder. Early
        frames have few valid contexts, but masked slots still cost full
        InterBlock compute — slicing to the last ``kb`` slots saves ~1/3 of a
        16-frame rollout's decode FLOPs with identical results (invalid slots
        contribute zero weight either way).
        """
        cfg = self.cfg
        m = fifo[0].shape[1]
        kb = kb or m
        b = z_t.shape[0]
        fifo_k = [f[:, m - kb:] for f in fifo] if kb < m else fifo
        # slot s of the slice <-> dt = kb - s
        dts = kb - jnp.arange(kb)
        member = jnp.asarray(
            [(int(dt) in cfg.skip_context) for dt in range(kb, 0, -1)], jnp.float32
        )
        mask = jnp.tile(((dts <= curr).astype(jnp.float32) * member)[None], (b, 1))
        rgb, inter_dec = self.decode_frame(
            params, z_t, fifo_k, mask, has_ctx=True, inter_pre_warping=False,
            extra_ctx=cond_inter,
        )
        if cfg.skip_mode == "enc":
            new_inter = self.refresh_inter(params, rgb)
        else:  # "dec"
            new_inter = inter_dec
        fifo = self.fifo_push(fifo, new_inter, curr, cfg.keep_first, cfg.n_first)
        return fifo, rgb

    def _get_jit_step(self):
        if not hasattr(self, "_jit_step_cache"):
            self._jit_step_cache = jax.jit(
                self._decode_step_fn, static_argnames=("kb",)
            )
        return self._jit_step_cache

    def _scan_segment_fn(self, params, fifo, curr0, z_seg, cond_inter=None, kb=None):
        """Scan `_decode_step_fn` over a run of frames sharing one static
        ``kb`` bucket. One XLA program per bucket (the scan body is traced
        once), so a 15-frame rollout costs ~4 dispatches instead of 15 —
        at ~29 ms tunnel dispatch overhead each, that's most of the
        per-frame launch cost (reference hot loop:
        `quantized_video_model.py:849-907`)."""

        def body(carry, z_t):
            fifo, curr = carry
            fifo, rgb = self._decode_step_fn(params, fifo, curr, z_t, cond_inter, kb=kb)
            return (fifo, curr + 1), rgb

        (fifo, _), rgbs = jax.lax.scan(body, (fifo, curr0), z_seg)
        return fifo, rgbs

    def _get_jit_seg(self):
        if not hasattr(self, "_jit_seg_cache"):
            self._jit_seg_cache = jax.jit(
                self._scan_segment_fn, static_argnames=("kb",)
            )
        return self._jit_seg_cache

    def get_jit_decode_video(self):
        """Cached jit of :meth:`decode_video` — ONE XLA program for the whole
        bucketed rollout instead of per-bucket programs stitched by eager
        host ops. On the tunneled v5e the eager glue (embed, ctx decode,
        FIFO seeding, concat — each a remote dispatch) dominates rollout
        wall time: measured 23.8x at 64px (runs_r5/dispatch_ab_mid.json,
        variant C vs A). The scan structure inside is unchanged, so the
        program stays remote-compiler-sized (unlike a fully unrolled
        15-frame fusion). Retraces per (n_ctx, use_scan, cond_inter
        presence) combination."""
        if not hasattr(self, "_jit_decode_video_cache"):
            self._jit_decode_video_cache = jax.jit(
                self.decode_video, static_argnames=("n_ctx", "use_scan")
            )
        return self._jit_decode_video_cache

    def get_jit_encode(self):
        """Cached jit of :meth:`encode` (one program instead of per-op
        eager dispatches; see :meth:`get_jit_decode_video`)."""
        if not hasattr(self, "_jit_encode_cache"):
            self._jit_encode_cache = jax.jit(self.encode)
        return self._jit_encode_cache

    def decode_video(self, params, codes, ctx_frames=None, n_ctx=1, cond_inter=None,
                     use_scan=False):
        """Decode a token video autoregressively in image space.

        Re-implements `QVidModel.decode` (`quantized_video_model.py:822-918`)
        as: (a) batch-decode the ``n_ctx`` context frames with their own
        (ground-truth) inters, (b) `lax.scan` over the remaining frames with
        the decode->re-encode context refresh inside the scanned step.

        Args:
          codes: (B, T, h*w) token indices for every frame (context included).
          ctx_frames: (B, n_ctx, H, W, 3) real context frames (used to build
            the initial FIFO via encoding). If None, generation is
            unconditional (n_ctx must be 0).
          n_ctx: static number of context frames.

        Returns:
          (B, T, H, W, 3) decoded video.
        """
        cfg = self.cfg
        if self.dtype == jnp.bfloat16:
            # pre-cast fp32 params once: the per-frame step programs otherwise
            # re-read the fp32 tree and cast in-graph every frame
            from ccvs_tpu.utils.casting import cast_params_bf16

            params = cast_params_bf16(params)
        b, t = codes.shape[0], codes.shape[1]
        m = cfg.skip_memory
        z_all = self.embed_code(params, codes)  # (B, T, h, w, z)

        fifo = self._zero_inters(b, m)
        ctx_rgb = None
        if n_ctx > 0:
            enc = self.encode(params, ctx_frames)
            ctx_inters = enc["inter"]  # (B, n_ctx, ...) per resolution
            # decode context frames against their own inters (reference
            # `quantized_video_model.py:849-858`)
            inter_tgts = [[f[:, i] for f in ctx_inters] for i in range(n_ctx)]
            ctx_rgb, _ = self.decoder.apply(
                {"params": params["decoder"]},
                z_all[:, :n_ctx].astype(self.dtype),
                [[f[:, :n_ctx] for f in ctx_inters]],
            )
            # seed FIFO with the last min(n_ctx, M) context inters
            take = min(n_ctx, m)
            for r in range(len(fifo)):
                src = ctx_inters[r][:, n_ctx - take : n_ctx].astype(self.dtype)
                fifo[r] = jax.lax.dynamic_update_slice(
                    fifo[r], src, (0, m - take) + (0,) * (fifo[r].ndim - 2)
                )

        z_gen = jnp.moveaxis(z_all[:, n_ctx:], 1, 0)  # (T-n_ctx, B, h, w, z)
        if use_scan:
            def scan_step(carry, z_t):
                fifo, curr = carry
                fifo, rgb = self._decode_step_fn(params, fifo, curr, z_t, cond_inter)
                return (fifo, curr + 1), rgb

            (_, _), frames = jax.lax.scan(
                scan_step, (fifo, jnp.asarray(n_ctx, jnp.int32)), z_gen
            )
        else:
            # Bucketed multi-frame scans: consecutive frames sharing a static
            # context-count bucket run as ONE scanned XLA program (the scan
            # body is a single decode step, so programs stay small enough for
            # the remote compiler, unlike one 15-frame fused scan). A 16-frame
            # rollout is 4 dispatches (kb = 2, 4, 8, M) instead of 15.
            jseg = self._get_jit_seg()

            def kb_of(i):
                if cond_inter is not None:
                    return m  # full-slot program when an extra ctx rides along
                return self._bucket(min(n_ctx + i, m), m)

            outs = []
            curr, i = n_ctx, 0
            while i < t - n_ctx:
                kb = kb_of(i)
                j = i + 1
                while j < t - n_ctx and kb_of(j) == kb:
                    j += 1
                fifo, rgbs = jseg(
                    params, fifo, jnp.asarray(curr, jnp.int32), z_gen[i:j],
                    cond_inter, kb=kb,
                )
                outs.append(rgbs)
                curr += j - i
                i = j
            frames = jnp.concatenate(outs, axis=0)
        frames = jnp.moveaxis(frames, 0, 1)  # (B, T-n_ctx, H, W, 3)

        if ctx_rgb is not None:
            return jnp.concatenate([ctx_rgb.astype(frames.dtype), frames], axis=1)
        return frames

    def embed_layout_code(self, params, code):
        """Layout token indices -> zl_q latents via the layout quantizer
        (`quantized_video_model.py:840-842`)."""
        cfg = self.cfg
        lead = code.shape[:-1]
        idx = code.reshape(*lead, *cfg.z_shape)
        return self.quantizer_l.apply(
            {"params": params["quantizer_l"]}, idx, method=VectorQuantizer.embed_code
        )

    def decode_video_layout(self, params, codes, layout_codes, ctx_frames,
                            ctx_layout, n_ctx=1, interl_gen=None):
        """Layout-conditioned doubly-AR rollout (``same_decoder_layout``).

        Re-implements the ``use_layout`` branch of `QVidModel.decode`
        (`quantized_video_model.py:836-903`): image and layout latents are
        channel-concatenated into the shared decoder, context features are
        half image / half layout channels, and each synthesized frame's
        context refresh re-encodes BOTH the rgb (image encoder) and — when
        the layout stream beyond the context is generated rather than given —
        the predicted layout (argmax -> one-hot -> layout encoder,
        `:879-897`).

        Args:
          codes: (B, T, size) frame token indices (context included).
          layout_codes: (B, T, size) layout token indices.
          ctx_frames: (B, n_ctx, H, W, 3) real context frames.
          ctx_layout: (B, n_ctx, H, W) integer context segmentations.
          interl_gen: optional per-resolution list of (B, T-n_ctx, ...) GIVEN
            layout encoder features for the generated range (the reference's
            ``curr < ctxl`` branch, active under keep_state / reconstruction);
            None re-encodes the predicted layouts instead.

        Returns:
          (vid, layout_logits): (B, T, H, W, 3) and (B, T, H, W, layout_size).
        """
        cfg = self.cfg
        assert cfg.use_layout and cfg.same_decoder_layout, (
            "layout rollout requires the shared-decoder layout twin "
            "(reference vid decode only supports same_decoder_layout)")
        if self.dtype == jnp.bfloat16:
            from ccvs_tpu.utils.casting import cast_params_bf16

            params = cast_params_bf16(params)
        b, t = codes.shape[0], codes.shape[1]
        m = cfg.skip_memory
        z_all = self.embed_code(params, codes)
        zl_all = self.embed_layout_code(params, layout_codes)
        z = jnp.concatenate([z_all, zl_all], axis=-1)  # (B, T, h, w, 2z)

        # context: merged (half-image / half-layout) inters, own-frame decode
        enc = self.encode(params, ctx_frames)
        lenc = self.encode_layout(params, ctx_layout)
        merged_ctx = self.merge_layout_inters(enc["inter"], lenc["inter"])
        ctx_rgb, ctx_lay = self.decoder.apply(
            {"params": params["decoder"]},
            z[:, :n_ctx].astype(self.dtype),
            [[f[:, :n_ctx] for f in merged_ctx]],
        )

        fifo = self._zero_inters(b, m)
        take = min(n_ctx, m)
        for r in range(len(fifo)):
            src = merged_ctx[r][:, n_ctx - take : n_ctx].astype(self.dtype)
            fifo[r] = jax.lax.dynamic_update_slice(
                fifo[r], src, (0, m - take) + (0,) * (fifo[r].ndim - 2)
            )

        def step(carry, xs):
            fifo, curr = carry
            z_t, interl_t = xs
            mask = self.fifo_mask(b, curr)
            inter_tgts = [[f[:, s] for f in fifo] for s in range(m)]
            rgb, lay, _, _, _ = self.decoder.apply(
                {"params": params["decoder"]}, z_t.astype(self.dtype), inter_tgts,
                ctx_mask=mask, return_all=True, inter_pre_warping=False,
            )
            new_inter = self.refresh_inter(params, rgb)
            if interl_t is None:
                seg = jnp.argmax(lay.astype(jnp.float32), axis=-1)
                soft = self.one_hot_layout(seg)
                _, new_interl = self.encoder_l.apply(
                    {"params": params["encoder_l"]}, soft.astype(self.dtype)
                )
            else:
                new_interl = interl_t
            merged = self.merge_layout_inters(new_inter, new_interl)
            fifo = self.fifo_push(fifo, merged, curr, cfg.keep_first, cfg.n_first)
            return (fifo, curr + 1), (rgb, lay)

        z_gen = jnp.moveaxis(z[:, n_ctx:], 1, 0)  # (T-n_ctx, B, h, w, 2z)
        xs_interl = (None if interl_gen is None
                     else [jnp.moveaxis(f, 1, 0).astype(self.dtype) for f in interl_gen])
        (_, _), (frames, lays) = jax.lax.scan(
            step, (fifo, jnp.asarray(n_ctx, jnp.int32)), (z_gen, xs_interl)
        )
        vid = jnp.concatenate(
            [ctx_rgb.astype(frames.dtype), jnp.moveaxis(frames, 0, 1)], axis=1)
        lay = jnp.concatenate(
            [ctx_lay.astype(lays.dtype), jnp.moveaxis(lays, 0, 1)], axis=1)
        return vid, lay

    def reconstruct(self, params, frames):
        """Pure per-frame reconstruction (encode -> quantize -> decode with own
        inters), the reference's `rec/` output (`helpers/generator.py:172-189`)."""
        enc = self.encode(params, frames)
        t = frames.shape[1] if frames.ndim == 5 else None
        inters = enc["inter"]
        rgb, _ = self.decoder.apply(
            {"params": params["decoder"]}, enc["z"].astype(self.dtype), [inters]
        )
        return rgb
