"""Video synthesis pipeline: AR token generation + doubly-AR image decode.

TPU-native re-implementation of `helpers/generator.py`. The full synthesis
path — encode context, conditionally assemble state/audio/p2p/class tokens,
autoregressively generate latent tokens (KV-cached), and decode frames with
context propagation — runs as a handful of jit-compiled programs with no host
round-trips inside the hot loops.
"""

import os
import time
from dataclasses import dataclass
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ccvs_tpu.config import Config
from ccvs_tpu.models.autoencoder import FrameAutoencoder
from ccvs_tpu.models.state_model import StateModel
from ccvs_tpu.models.stft_model import StftModel
from ccvs_tpu.models.transformer import TokenTransformer
from ccvs_tpu.utils import video_io


class VideoGenerator:
    """Composes the frozen models into the synthesis pipeline
    (`helpers/generator.py:57-230`)."""

    def __init__(self, cfg: Config, ae: FrameAutoencoder, transformer: TokenTransformer,
                 state_model: Optional[StateModel] = None,
                 stft_model: Optional[StftModel] = None):
        self.cfg = cfg
        self.ae = ae
        self.transformer = transformer
        self.state_model = state_model
        self.stft_model = stft_model

    def generate(self, params, rng, real_vid, stft=None, vid_lbl=None,
                 layout=None, rec=True, fake=True,
                 n_ctx_frames: Optional[int] = None,
                 keep_state: bool = False, custom_state=None,
                 down_size: Optional[int] = None):
        """Synthesise videos continuing `real_vid`'s first context frames.

        Args:
          params: dict with keys "ae", "gpt" (+ "state", "stft").
          real_vid: (B, T, H, W, 3) in [-1, 1].
          layout: (B, T, H, W) integer segmentations — with ``cfg.gpt.layout``
            the layout tokens are the control stream (reference
            `generator.py:107-118`; ``keep_state`` gives the full stream,
            otherwise layouts beyond the context are sampled).
          n_ctx_frames: context frames (default `cond_len / tokens_per_frame`,
            reference `generator.py:94-101`).

        Returns:
          dict(fake=(B, T, H, W, 3) [, rec=..., state=..., fake_state=...,
          real_layout/fake_layout/rec_layout=...]). With ``fake=False`` the
          AR generation is skipped entirely (reference ``--rec_only``:
          reconstruction-quality runs).
        """
        cfg = self.cfg
        gcfg, acfg = cfg.gpt, cfg.ae
        b, t = real_vid.shape[:2]
        size = acfg.tokens_per_frame
        if n_ctx_frames is None:
            n_ctx_frames = gcfg.cond_len // size

        if down_size is not None:
            # degrade inputs to a target size (reference `--down_size`,
            # `generator.py:59-66`)
            h = real_vid.shape[2]
            small = jax.image.resize(
                real_vid, (*real_vid.shape[:2], down_size, down_size, 3), "bilinear"
            )
            real_vid = jax.image.resize(small, real_vid.shape, "bilinear")

        # serve_fused: encode + decode each run as ONE jit program; the
        # eager glue's per-op remote dispatches otherwise dominate rollout
        # wall time (23.8x at 64px, runs_r5/dispatch_ab_mid.json variant C)
        fused = acfg.serve_fused
        encode = self.ae.get_jit_encode() if fused else self.ae.encode
        decode_video = (self.ae.get_jit_decode_video() if fused
                        else self.ae.decode_video)

        enc = encode(params["ae"], real_vid)
        code_all = enc["code"].reshape(b, -1)  # (B, T*size)

        out = {}
        state_code = None
        cond_code = None
        delta = None
        real_state = None

        if gcfg.state and self.state_model is not None and not gcfg.stft:
            z_all = self.ae.embed_code(params["ae"], enc["code"])
            real_state = self.state_model.estimate(params["state"], z_all)
            out["state"] = real_state
            if custom_state is not None:
                # custom trajectory (reference `--custom_state`,
                # `generator.py:112-115`)
                state_code = self.state_model.encode(params["state"], state=custom_state)
                keep_state = True
            else:
                state_code = self.state_model.encode(params["state"], state=real_state)
        if gcfg.stft and self.stft_model is not None and stft is not None:
            state_code = self.stft_model.encode(params["stft"], stft)

        lenc = None
        if gcfg.layout and layout is not None:
            # layout tokens are the control stream (`generator.py:107-118`;
            # layout_code returned as state_code by `QVidModel.encode`,
            # `quantized_video_model.py:819`)
            assert self.ae.encoder_l is not None, (
                "cfg.gpt.layout requires the AE layout twins (cfg.ae.use_layout)")
            assert not gcfg.p2p, "layout + p2p is not a reference configuration"
            lenc = self.ae.encode_layout(params["ae"], layout)
            state_code = lenc["code"].reshape(b, -1)
            out["real_layout"] = layout

        ctx_vid = real_vid
        if gcfg.deblurring:
            # blurred-video conditioning (`generator.py:125-129`): the blurred
            # clip's tokens are the given control stream, and decode contexts
            # come from the blurred frames
            from ccvs_tpu.train.transformer_trainer import blur_video

            blurred = jnp.asarray(blur_video(np.asarray(real_vid), gcfg.blur_sigma))
            benc = self.ae.encode(params["ae"], blurred)
            state_code = benc["code"].reshape(b, -1)
            ctx_vid = blurred
            out["blur"] = blurred

        if gcfg.cat and vid_lbl is None:
            # random target classes (reference `generator.py:120-123`)
            rng, sub = jax.random.split(rng)
            vid_lbl = jax.random.randint(sub, (b,), 0, gcfg.num_lbl)
            out["vid_lbl"] = vid_lbl

        # token budget (reference `generator.py:83-92`)
        cond_inter = None
        if gcfg.p2p:
            cond_step, t_step = 1, t - 1
            cond_code = code_all[:, -gcfg.z_chunk :]
            delta = jnp.full((b,), t - 1, jnp.int32)
            # end-frame skip features are an extra decode context
            # (`generator.py:105`, `quantized_video_model.py:868-873`)
            cond_inter = [f[:, -1].astype(self.ae.dtype) for f in enc["inter"]]
        else:
            cond_step, t_step = 0, t
        total_len = (cond_step + t_step) * size
        if gcfg.state or gcfg.stft or gcfg.deblurring or gcfg.layout:
            total_len += t_step * gcfg.state_size

        ctx_code = code_all[:, : n_ctx_frames * size]
        # keep_state / audio / deblur: the full control stream is given;
        # otherwise the transformer samples states beyond the context
        # (`generator.py:107-117`)
        keep_state_stream = gcfg.stft or gcfg.deblurring or keep_state
        if state_code is not None and not keep_state_stream:
            state_code = state_code[:, : n_ctx_frames * gcfg.state_size]

        if fake:
            gen = self.transformer.generate(
                params["gpt"], rng, ctx_code, state_code=state_code,
                cond_code=cond_code, delta=delta, lbl=vid_lbl, total_len=total_len,
            )

            n_frames = t_step
            codes = gen["code"][:, : n_frames * size].reshape(b, n_frames, size)
            if lenc is not None:
                # generated (or kept) layout tokens drive the shared decoder;
                # beyond a kept stream the rollout re-encodes its own
                # predicted layouts (`quantized_video_model.py:879-897`)
                lcodes = gen["state_code"][:, : n_frames * gcfg.state_size]
                lcodes = lcodes.reshape(b, n_frames, gcfg.state_size)
                interl_gen = ([f[:, n_ctx_frames:] for f in lenc["inter"]]
                              if keep_state_stream else None)
                fake_vid, fake_lay = self.ae.decode_video_layout(
                    params["ae"], codes, lcodes,
                    ctx_vid[:, :n_ctx_frames], layout[:, :n_ctx_frames],
                    n_ctx=n_ctx_frames, interl_gen=interl_gen,
                )
                out["fake_layout"] = jnp.argmax(
                    fake_lay.astype(jnp.float32), axis=-1)
            else:
                fake_vid = decode_video(
                    params["ae"], codes, ctx_frames=ctx_vid[:, :n_ctx_frames],
                    n_ctx=n_ctx_frames, cond_inter=cond_inter,
                )
            if gcfg.p2p:
                # the real end frame closes the clip (`generator.py:166-167`)
                fake_vid = jnp.concatenate([fake_vid, real_vid[:, -1:]], axis=1)
            out["fake"] = fake_vid

            if gen.get("state_code") is not None and self.state_model is not None and not gcfg.stft:
                sc = gen["state_code"][:, : t * gcfg.state_size]
                out["fake_state"] = self.state_model.decode(params["state"], sc).reshape(
                    b, t, gcfg.state_size
                )

        if rec:
            if lenc is not None:
                # rollout-reconstruction with the full given layout stream
                # (`generator.py:181-184`: rec gets the uncropped state_code
                # AND interl)
                rec_vid, rec_lay = self.ae.decode_video_layout(
                    params["ae"], enc["code"].reshape(b, t, size),
                    lenc["code"].reshape(b, t, size),
                    real_vid[:, :n_ctx_frames], layout[:, :n_ctx_frames],
                    n_ctx=n_ctx_frames,
                    interl_gen=[f[:, n_ctx_frames:] for f in lenc["inter"]],
                )
                out["rec"] = rec_vid
                out["rec_layout"] = jnp.argmax(rec_lay.astype(jnp.float32), axis=-1)
            else:
                out["rec"] = decode_video(
                    params["ae"], enc["code"].reshape(b, t, size),
                    ctx_frames=real_vid[:, :n_ctx_frames], n_ctx=n_ctx_frames,
                )
        return out

    def generate_step_by_step(self, params, rng, real_vid, n_ctx_frames=None,
                              fixed_shape=True):
        """Interleave transformer chunks with frame decode + code correction.

        Port of the `--step_by_step` path (`helpers/generator.py:132-159` +
        `QVidModel.vid_step_decode`, `quantized_video_model.py:920-949`):
        after decoding each predicted frame, the frame is re-encoded and its
        *actual* tokens replace the predicted chunk, so the transformer always
        conditions on codes consistent with the synthesized pixels.

        ``fixed_shape`` (default) keeps the token buffer at window capacity
        with a dynamic length, so every per-frame transformer call reuses ONE
        compiled program (`TokenTransformer.generate_chunk_fixed`); the
        reference — and ``fixed_shape=False`` — re-traces for every grown
        context length below capacity (minutes per frame on this stack).
        Outputs are identical under the same rng.
        """
        cfg = self.cfg
        gcfg, acfg = cfg.gpt, cfg.ae
        b, t = real_vid.shape[:2]
        size = acfg.tokens_per_frame
        m = acfg.skip_memory
        if n_ctx_frames is None:
            n_ctx_frames = gcfg.cond_len // size

        enc = self.ae.encode(params["ae"], real_vid[:, :n_ctx_frames])
        code = enc["code"].reshape(b, -1)
        # context FIFO seeded from real context frames
        fifo = self.ae._zero_inters(b, m)
        take = min(n_ctx_frames, m)
        for r in range(len(fifo)):
            src = enc["inter"][r][:, n_ctx_frames - take:].astype(fifo[r].dtype)
            fifo[r] = jax.lax.dynamic_update_slice(
                fifo[r], src, (0, m - take) + (0,) * (fifo[r].ndim - 2)
            )

        # p2p step mode (`generator.py:138-146`): the end frame's tokens ride
        # as cond_code and its skip features as an extra decode context; the
        # real end frame closes the clip. The cond prefix is not part of the
        # fixed-shape program, so p2p uses the growing-shape path.
        cond_code = cond_inter = delta = None
        t_gen = t - n_ctx_frames
        if gcfg.p2p:
            fixed_shape = False
            enc_end = self.ae.encode(params["ae"], real_vid[:, -1:])
            cond_code = enc_end["code"].reshape(b, -1)
            cond_inter = [f[:, -1].astype(self.ae.dtype) for f in enc_end["inter"]]
            delta = jnp.full((b,), t - 1, jnp.int32)
            t_gen = t - 1 - n_ctx_frames

        keep = gcfg.z_len - gcfg.z_chunk  # tokens kept when the window slides
        if gcfg.p2p:
            keep = gcfg.z_len - 2 * gcfg.z_chunk  # cond chunk reserves one more
        n = code.shape[1]
        if fixed_shape:
            merged = jnp.zeros((b, gcfg.z_len), jnp.int32)
            merged = jax.lax.dynamic_update_slice_in_dim(merged, code, 0, axis=1)

        frames = [real_vid[:, i] for i in range(n_ctx_frames)]
        curr = n_ctx_frames
        for _ in range(t_gen):
            # free a chunk if capacity is near (`generator.py:140-148`)
            if n > keep:
                if fixed_shape:
                    shift = n - keep
                    merged = jnp.concatenate(
                        [merged[:, shift:], jnp.zeros((b, shift), jnp.int32)], axis=1
                    )
                else:
                    if gcfg.p2p:
                        # reposition the delta embedding for the dropped
                        # frames (`generator.py:141-142`)
                        delta = delta - ((n - gcfg.z_len) // gcfg.z_chunk + 2)
                    code = code[:, -keep:]
                n = keep
            rng, sub = jax.random.split(rng)
            if fixed_shape:
                assert size == gcfg.z_chunk, (
                    "fixed-shape step-by-step supports the plain frame-token "
                    "stream (z_chunk == tokens_per_frame)")
                merged = self.transformer.generate_chunk_fixed(
                    params["gpt"], sub, merged, n
                )
                chunk = jax.lax.dynamic_slice_in_dim(
                    merged, jnp.asarray(n), size, axis=1
                )
            else:
                total = n + gcfg.z_chunk + (cond_code.shape[1] if cond_code is not None else 0)
                gen = self.transformer.generate(
                    params["gpt"], sub, code, cond_code=cond_code, delta=delta,
                    total_len=total,
                )
                chunk = gen["code"][:, -size:]
            # decode one frame against the FIFO
            z_t = self.ae.embed_code(params["ae"], chunk)
            mask = self.ae.fifo_mask(b, jnp.asarray(curr, jnp.int32))
            frame, _ = self.ae.decode_frame(params["ae"], z_t, fifo, mask,
                                            extra_ctx=cond_inter)
            # re-encode: fresh inters + corrected codes
            new_enc = self.ae.encode(params["ae"], frame)
            fifo = self.ae.fifo_push(
                fifo, new_enc["inter"], jnp.asarray(curr, jnp.int32),
                acfg.keep_first, acfg.n_first,
            )
            new_code = new_enc["code"].reshape(b, -1)
            if fixed_shape:
                # corrected codes replace the predicted chunk in place
                merged = jax.lax.dynamic_update_slice_in_dim(
                    merged, new_code, jnp.asarray(n), axis=1
                )
            else:
                code = jnp.concatenate([gen["code"][:, :-size], new_code], axis=1)
            n += gcfg.z_chunk
            frames.append(frame)
            curr += 1
        if gcfg.p2p:
            # the real end frame closes the clip (`generator.py:166-167`)
            frames.append(real_vid[:, -1])
        return {"fake": jnp.stack(frames, axis=1)}

    def custom_square_state(self, params, real_vid):
        """Square-path trajectory from each clip's estimated initial state
        (reference `--custom_state`, `generator.py:112-115`: init_state is
        the state estimate at frame 0)."""
        enc = self.ae.encode(params["ae"], real_vid[:, :1])
        z = self.ae.embed_code(params["ae"], enc["code"])
        init = self.state_model.estimate(params["state"], z)  # (B, 1, 2)
        return square_trajectory(init, real_vid.shape[1])

    def generate_from_image(self, params, rng, img, vid_len=None, **kw):
        """Generate a video from a single frame (reference `--gen_from_img`,
        `generator.py:278-279`): treat the image as a 1-frame context."""
        cfg = self.cfg
        t = vid_len or cfg.data.vid_len
        b = img.shape[0]
        pad = jnp.tile(img[:, None], (1, t, 1, 1, 1))
        return self.generate(params, rng, pad, n_ctx_frames=1, rec=False, **kw)

    def save_batch(self, result_path, global_iter, batch_size, real_vid, out,
                   fps=4, imagenet_norm=False, dataset="bairhd", vid_ids=None,
                   cats=None):
        """Write real/fake/rec videos (`helpers/generator.py:199-230`).

        ``vid_ids``: optional per-sample dataset ids used as file names
        (reference ``--include_id``, `generator.py:201` — aligns generated
        clips with their source audio/metadata). ``cats``: optional
        per-sample category names appended as a filename suffix (reference
        `save_video_batch` suffix, `generator.py:330-334`)."""

        def _vid_name(i):
            vid_id = (int(vid_ids[i]) if vid_ids is not None
                      else batch_size * global_iter + i)
            suffix = f"_{cats[i]}" if cats is not None else ""
            return f"vid_{vid_id:05d}{suffix}.avi"

        names = {"real": np.asarray(real_vid)}
        if "fake" in out:
            names["fake"] = np.asarray(out["fake"])
        if "rec" in out:
            names["rec"] = np.asarray(out["rec"])
        for name, vid in names.items():
            u8 = video_io.to_uint8(vid, imagenet_norm=imagenet_norm)
            for i in range(u8.shape[0]):
                path = os.path.join(result_path, name, _vid_name(i))
                video_io.write_video(path, u8[i], fps=fps)
        # colormapped layout videos (`helpers/generator.py:225-230` +
        # `save_video_batch` ``is_layout`` postprocess at `:285-298`)
        for name in ("real_layout", "fake_layout", "rec_layout"):
            if name in out:
                seg = np.asarray(out[name])
                if seg.ndim == 5:  # logits -> classes
                    seg = seg.argmax(-1)
                u8 = video_io.layout_to_uint8(seg)
                for i in range(u8.shape[0]):
                    path = os.path.join(result_path, name, _vid_name(i))
                    video_io.write_video(path, u8[i], fps=fps)
        # state-marked copies
        for name, key in [("real_state", "state"), ("fake_state", "fake_state")]:
            if key in out:
                src = names["real" if key == "state" else "fake"]
                st = np.asarray(out[key])
                u8 = video_io.to_uint8(src, imagenet_norm=imagenet_norm)
                h = u8.shape[2]
                for i in range(u8.shape[0]):
                    marked = u8[i].copy()
                    for j in range(marked.shape[0]):
                        x = min(int(h * st[i, j, 0]), h - 1)
                        y = min(int(h * st[i, j, 1]), h - 1)
                        marked[j] = video_io.draw_cross(marked[j], x, y)
                    path = os.path.join(result_path, name, _vid_name(i))
                    video_io.write_video(path, marked, fps=fps)


def square_trajectory(init_state, vid_len):
    """Custom square-path state trajectory demo (reference
    `helpers/generator.py:362-379`). init_state: (B, 1, 2) in [0,1]^2."""
    init = np.asarray(init_state)
    b = init.shape[0]
    out = np.tile(init, (1, vid_len, 1))
    step = 10 / 64
    deltas = [(0, -step), (step, 0), (0, step), (-step, 0)]

    def inside(u, v):
        return 0.2 <= u < 0.8 and 0.2 <= v < 0.8

    for i in range(b):
        x, y = float(init[i, 0, 0]), float(init[i, 0, 1])
        t = 0
        dx, dy = deltas[t]
        for j in range(1, vid_len):
            while not inside(x + dx, y + dy):
                t = (t + 1) % 4
                dx, dy = deltas[t]
            x += dx
            y += dy
            out[i, j] = (x, y)
    return jnp.asarray(out)
