"""Frame-autoencoder training losses.

TPU-native port of the loss methods of `QVidModel`
(`models/skip_vid_generator/models/quantized_video_model.py:251-770`). Pure
functions over param pytrees; every index pattern that the reference builds
with Python lists (slide_inter shuffles, elastic corruption splits) is a
static numpy index array derived from the config.

Batch layout (image path): groups of ``group_size`` consecutive images from
one video are concatenated along the batch axis (reference
`data/__init__.py:59-67`), ordered ``[context(, others...), distorted?]``:
with BAIR's ``n_consecutive_img=2 + load_elastic_view + elastic_corruption``
each group is ``[A_corrupted_ctx, B, A_distorted]``.
"""

from dataclasses import dataclass
from functools import partial
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ccvs_tpu.config import AutoencoderConfig
from ccvs_tpu.models.autoencoder import FrameAutoencoder
from ccvs_tpu.nn import vgg as vgg_mod
from ccvs_tpu.nn.decoder import SkipDecoder
from ccvs_tpu.nn.discriminators import (
    FeatureDiscriminator,
    ImageDiscriminator,
    VideoDiscriminator,
)
from ccvs_tpu.train import gan_losses as gl


def _resize_bilinear(x, h, w):
    return jax.image.resize(x, (*x.shape[:-3], h, w, x.shape[-1]), method="bilinear")


@dataclass
class AELosses:
    cfg: AutoencoderConfig
    ae: FrameAutoencoder
    di: Optional[ImageDiscriminator] = None
    dv: Optional[VideoDiscriminator] = None
    df: Optional[FeatureDiscriminator] = None

    # ---------- static index plans (reference list comprehensions) ----------

    def group_size(self) -> int:
        n = self.cfg.n_consecutive_img
        return n + (1 if self.cfg.load_elastic_view else 0)

    def slide_indices(self, batch: int) -> np.ndarray:
        """Per-image index of the *source* of its inter target
        (`quantized_video_model.py:285-303`)."""
        cfg = self.cfg
        n = cfg.n_consecutive_img
        tot = self.group_size()
        if cfg.slide_inter:
            idx = list(range(1, n)) + [0]
            if cfg.load_elastic_view:
                idx = idx + [0]
        elif cfg.load_elastic_view:
            idx = [0] * tot
        else:
            idx = list(range(tot))
        out = []
        for g in range(batch // tot):
            out.extend(g * tot + i for i in idx)
        return np.asarray(out, np.int32)

    def corr_split(self, batch: int) -> Tuple[np.ndarray, np.ndarray]:
        """(no_corr_idx, corr_idx) (`quantized_video_model.py:311-326`)."""
        n = self.cfg.n_consecutive_img
        idx = np.arange(batch)
        return idx[idx % (n + 1) != 0], idx[idx % (n + 1) == 0]

    def elastic_indices(self, batch_after_corr: int) -> np.ndarray:
        """Positions of the distorted views after the corruption split
        (`quantized_video_model.py:356-357,374-376`)."""
        cfg = self.cfg
        n = cfg.n_consecutive_img
        n = n - 1 if cfg.elastic_corruption else n
        return np.asarray(
            [i * (n + 1) + n for i in range(batch_after_corr // (n + 1))], np.int32
        )

    # ---------- encode helpers ----------

    def _ckpt(self, fn):
        """`jax.checkpoint` the sub-forward when ``cfg.remat`` is on.

        At the full 256^2 BAIR batch, the stored encoder/decoder/VGG/D
        activations for backward exceed one v5e chip's 16 GB HBM (measured
        17.7 GB for the image g-step); rematerializing them trades ~1/3 more
        forward FLOPs for fitting on-chip — the standard TPU trade
        (`jax.checkpoint`), with no reference counterpart (torch keeps the
        96-image global batch split over 4 GPUs, `tools/engine.py:88`)."""
        return jax.checkpoint(fn) if self.cfg.remat else fn

    def _encode_q(self, gen, img):
        ae = self.ae
        enc = self._ckpt(lambda p, x: ae.encoder.apply({"params": p}, x))
        z, inter_enc = enc(gen["encoder"], img.astype(ae.dtype))
        zf = z.astype(jnp.float32)
        if self.cfg.is_continuous:
            return zf, None, inter_enc
        z_q, qloss, _ = ae.quantizer.apply({"params": gen["quantizer"]}, zf)
        return z_q, qloss * self.cfg.lambda_quant, inter_enc

    # ---------- generator losses ----------

    def img_generator_loss(self, gen, disc, vgg_params, batch, rng, aug_fn=None):
        """`compute_img_to_img_generator_loss` (`quantized_video_model.py:251-456`)."""
        cfg = self.cfg
        ae = self.ae
        real_img = batch["img"]  # (B, H, W, 3)
        b = real_img.shape[0]
        metrics = {}
        loss = 0.0

        z_q, quant_loss, inter_enc = self._encode_q(gen, real_img)
        if quant_loss is not None and not cfg.no_q_img:
            loss += quant_loss
            metrics["quant_img"] = quant_loss

        # layout twin encode (`quantized_video_model.py:258-281`)
        real_layout = batch.get("layout")
        zl_q = inter_encl = None
        if cfg.use_layout and real_layout is not None:
            soft = ae.one_hot_layout(real_layout)
            zl, inter_encl = ae.encoder_l.apply(
                {"params": gen["encoder_l"]}, soft.astype(ae.dtype)
            )
            zl_q, lql, _ = ae.quantizer_l.apply(
                {"params": gen["quantizer_l"]}, zl.astype(jnp.float32)
            )
            lql = lql * cfg.lambda_quant
            if not cfg.no_q_img:
                loss += lql
                metrics["layout_quant_img"] = lql

        # inter-target shuffle within groups
        slide = jnp.asarray(self.slide_indices(b))
        inter_tgt = [f[slide] for f in inter_enc]
        inter_tgtl = [f[slide] for f in inter_encl] if inter_encl is not None else None

        # elastic corruption: drop the corrupted context images from targets
        if cfg.elastic_corruption:
            no_corr, corr = self.corr_split(b)
            nc = jnp.asarray(no_corr)
            z_q = z_q[nc]
            inter_tgt = [f[nc] for f in inter_tgt]
            real_tgt = real_img[nc]
            if zl_q is not None:
                zl_q = zl_q[nc]
                inter_tgtl = [f[nc] for f in inter_tgtl]
                real_layout = real_layout[nc]
        else:
            real_tgt = real_img

        # merge image/layout inters + latents (`quantized_video_model.py:330-334`)
        if zl_q is not None and cfg.same_decoder_layout:
            inter_tgt = FrameAutoencoder.merge_layout_inters(inter_tgt, inter_tgtl)
            z_q = jnp.concatenate([z_q, zl_q], axis=-1)

        keep_mask = None
        if cfg.inter_drop_p > 0:
            keep_mask = (
                jax.random.uniform(rng, (z_q.shape[0],)) >= cfg.inter_drop_p
            ).astype(jnp.float32)

        dec = self._ckpt(
            lambda p, z, it, km: ae.decoder.apply(
                {"params": p}, z, it, return_all=True, keep_mask=km))
        fake_img, fake_layout, inter_flows, inter_occs, inter_dec = dec(
            gen["decoder"], z_q.astype(ae.dtype), [inter_tgt], keep_mask)
        fake_img = fake_img.astype(jnp.float32)

        # layout decode + CE (`quantized_video_model.py:337-349`)
        if zl_q is not None:
            if not cfg.same_decoder_layout:
                fake_layout, _ = ae.decoder_l.apply(
                    {"params": gen["decoder_l"]}, zl_q.astype(ae.dtype), [inter_tgtl],
                    keep_mask=keep_mask,
                )
            logp = jax.nn.log_softmax(fake_layout.astype(jnp.float32), axis=-1)
            lce = -jnp.mean(
                jnp.take_along_axis(logp, real_layout[..., None].astype(jnp.int32), axis=-1)
            )
            loss += lce
            metrics["layout_img"] = lce
        occ_mask = jax.nn.sigmoid(inter_occs[-1].astype(jnp.float32)) if inter_occs else None

        # elastic mask recovery (`:352-359`)
        if cfg.elastic_corruption and "mask_img" in batch:
            eidx = jnp.asarray(self.elastic_indices(fake_img.shape[0]))
            m = batch["mask_img"].astype(jnp.float32)  # (groups, H, W, 1), 1 = occluded
            pred = occ_mask[eidx]
            mask_rec = jnp.sum(((pred - 1.0) ** 2) * m) / jnp.maximum(jnp.sum(m), 1.0)
            loss += mask_rec
            metrics["mask_rec_img"] = mask_rec

        # inter reconstruction (`:361-366`)
        if cfg.use_inter_rec_loss_img:
            irl = 0.0
            for i in range(len(inter_enc)):
                irl += jnp.mean(
                    (inter_enc[i].astype(jnp.float32) - inter_dec[-1 - i].astype(jnp.float32)) ** 2
                )
            loss += irl
            metrics["inter_rec_img"] = irl

        # elastic flow recovery (`:368-386`)
        last_flow_mult = SkipDecoder.last_flow_mult(cfg)
        if cfg.use_elastic_flow_recovery and "flow_img" in batch:
            eidx = jnp.asarray(self.elastic_indices(fake_img.shape[0]))
            efr = 0.0
            real_flow = batch["flow_img"].astype(jnp.float32) / last_flow_mult
            for fake_flow in inter_flows:
                ef = fake_flow.astype(jnp.float32)[eidx]
                rf = _resize_bilinear(real_flow, ef.shape[1], ef.shape[2])
                if cfg.elastic_corruption and "mask_img" in batch:
                    m = _resize_bilinear(batch["mask_img"].astype(jnp.float32), ef.shape[1], ef.shape[2])
                    no_occ = (m < 0.5).astype(jnp.float32)
                    efr += jnp.sum(((ef - rf) ** 2) * no_occ) / jnp.maximum(jnp.sum(no_occ) * 2, 1.0)
                else:
                    efr += jnp.mean((ef - rf) ** 2)
            loss += efr
            metrics["elastic_flow_rec_img"] = efr

        # backwarp consistency (`:389-399`)
        if cfg.use_backwarp_consistency_img and inter_flows:
            from ccvs_tpu.ops import backwarp

            flow = inter_flows[-1].astype(jnp.float32) * last_flow_mult
            slide_full = jnp.asarray(self.slide_indices(b))
            r = real_img[slide_full]
            if cfg.elastic_corruption:
                r = r[jnp.asarray(self.corr_split(b)[0])]
            warped = backwarp(r.astype(jnp.float32), flow)
            occ_sum = jnp.sum(1.0 - occ_mask, axis=(1, 2, 3), keepdims=True)
            bwc = jnp.mean((fake_img - warped) ** 2 * (1.0 - occ_mask) / occ_sum)
            loss += bwc
            metrics["backwarp_consistency_img"] = bwc

        # direct recovery (`:404-407`)
        rec = jnp.mean(jnp.abs(real_tgt.astype(jnp.float32) - fake_img))
        metrics["rec_img"] = rec
        if cfg.use_direct_recovery_img:
            loss += rec

        # perceptual (`:410-413`)
        if cfg.use_vgg_img and vgg_params is not None:
            v = self._ckpt(vgg_mod.vgg_loss)(vgg_params, fake_img, real_tgt) * cfg.lambda_vgg
            loss += v
            metrics["vgg_img"] = v

        # adversarial (`:416-421`); ADA augments the fake before D (`:418`)
        if cfg.use_di and disc is not None:
            di_in = aug_fn(fake_img) if aug_fn is not None else fake_img
            score = self._ckpt(lambda p, x: self.di.apply({"params": p}, x))(
                disc["di"], di_in)
            adv = gl.GENERATOR_LOSSES[cfg.gan_loss](score) * cfg.lambda_gan
            loss += adv
            metrics["gen_img"] = adv

        # feature discriminator: images are the "fake" domain (`:424-428`)
        if cfg.use_df and disc is not None:
            score = self.df.apply({"params": disc["df"]}, z_q.astype(jnp.float32))
            advf = gl.g_logistic(score)
            loss += advf
            metrics["gen_feat_fake"] = advf

        fake_data = {"img": fake_img, "z": z_q}
        return loss, (metrics, fake_data)

    def vid_generator_loss(self, gen, disc, vgg_params, batch, rng):
        """`compute_vid_to_vid_generator_loss` (`quantized_video_model.py:483-627`).

        Image-space AR rollout over ``vid_len`` frames with the inter FIFO;
        only the most recent context keeps gradients (reference detaches the
        previous tail, `:548-549`).
        """
        cfg = self.cfg
        ae = self.ae
        real_vid = batch["vid"]  # (B, T, H, W, 3)
        b, t = real_vid.shape[:2]
        metrics = {}
        loss = 0.0

        z_q, quant_loss, inter_enc = self._encode_q(gen, real_vid)
        if quant_loss is not None:
            loss += quant_loss
            metrics["quant_vid"] = quant_loss

        # layout twins: merged inters + concatenated latents
        # (`quantized_video_model.py:490-520`)
        real_layout = batch.get("layout")
        use_layout = cfg.use_layout and cfg.same_decoder_layout and real_layout is not None
        if use_layout:
            soft = ae.one_hot_layout(real_layout)
            zl, inter_encl = ae.encoder_l.apply(
                {"params": gen["encoder_l"]}, soft.astype(ae.dtype)
            )
            zl_q, lql, _ = ae.quantizer_l.apply(
                {"params": gen["quantizer_l"]}, zl.astype(jnp.float32)
            )
            lql = lql * cfg.lambda_quant
            if not cfg.no_q_img:
                loss += lql
                metrics["layout_quant_vid"] = lql
            inter_enc = FrameAutoencoder.merge_layout_inters(inter_enc, inter_encl)
            z_q = jnp.concatenate([z_q, zl_q], axis=-1)

        delta = 1 if cfg.p2p_context else 0
        # rolling context: python loop (vid_len is small at training: 4)
        inters = []
        if cfg.p2p_context:
            inters.append([f[:, -1] for f in inter_enc])
        inters.append([f[:, 0] for f in inter_enc])
        fakes = [real_vid[:, 0]]
        fake_layouts = []
        curr = 1
        dec = self._ckpt(
            lambda p, z, it: ae.decoder.apply({"params": p}, z, it))
        enc = self._ckpt(lambda p, x: ae.encoder.apply({"params": p}, x))
        for i in range(1, cfg.vid_len - delta):
            inter_tgts = [inters[-dt] for dt in cfg.skip_context if dt <= curr]
            fake_img, fake_layout_img = dec(
                gen["decoder"], z_q[:, i].astype(ae.dtype), inter_tgts)
            _, new_inter = enc(gen["encoder"], fake_img)
            if use_layout:
                # re-encode the layout logits as soft layout
                # (`quantized_video_model.py:538-543`)
                fake_layouts.append(fake_layout_img.astype(jnp.float32))
                _, new_interl = ae.encoder_l.apply(
                    {"params": gen["encoder_l"]}, fake_layout_img
                )
                new_inter = FrameAutoencoder.merge_layout_inters(new_inter, new_interl)
            if len(inters) >= cfg.skip_memory:
                inters.pop(delta)
            else:
                curr += 1
            if inters:
                inters[-1] = [jax.lax.stop_gradient(f) for f in inters[-1]]
            inters.append(new_inter)
            fakes.append(fake_img.astype(jnp.float32))
        if cfg.p2p_context:
            fakes.append(real_vid[:, -1])
        fake_vid = jnp.stack(fakes, axis=1)

        real_flat = real_vid[:, 1:].reshape(-1, *real_vid.shape[2:]).astype(jnp.float32)
        fake_flat = fake_vid[:, 1:].reshape(-1, *fake_vid.shape[2:])

        if use_layout and fake_layouts:
            fl = jnp.stack(fake_layouts, axis=1)  # (B, T-1, H, W, n_cls)
            rl = real_layout[:, 1 : fl.shape[1] + 1]
            logp = jax.nn.log_softmax(fl, axis=-1)
            lce = -jnp.mean(jnp.take_along_axis(logp, rl[..., None].astype(jnp.int32), axis=-1))
            loss += lce
            metrics["layout_vid"] = lce

        rec = jnp.mean(jnp.abs(real_flat - fake_flat))
        metrics["rec_vid"] = rec
        if cfg.use_direct_recovery_vid:
            loss += rec

        if cfg.use_vgg_vid and vgg_params is not None:
            v = self._ckpt(vgg_mod.vgg_loss)(vgg_params, fake_flat, real_flat) * cfg.lambda_vgg
            loss += v
            metrics["vgg_vid"] = v

        if cfg.use_dv and disc is not None:
            score = self._ckpt(lambda p, x: self.dv.apply({"params": p}, x))(
                disc["dv"], fake_vid)
            adv = gl.GENERATOR_LOSSES[cfg.gan_loss](score) * cfg.lambda_gan
            loss += adv
            metrics["gen_vid"] = adv

        # unconditional generation head (`quantized_video_model.py:587-601`):
        # decode without any context and push frames through the image D
        fake_unc_vid = None
        if cfg.use_unc_gen:
            fake_unc_vid, _ = ae.decoder.apply(
                {"params": gen["decoder"]}, z_q.astype(ae.dtype), None, has_ctx=False
            )
            fake_unc_vid = fake_unc_vid.astype(jnp.float32)
            unc_img = fake_unc_vid.reshape(-1, *fake_unc_vid.shape[2:])
            real_all = real_vid.reshape(-1, *real_vid.shape[2:]).astype(jnp.float32)
            if cfg.use_di and disc is not None:
                score = self.di.apply({"params": disc["di"]}, unc_img)
                adv = gl.GENERATOR_LOSSES[cfg.gan_loss](score) * cfg.lambda_gan
                loss += adv
                metrics["gen_img_unc"] = adv
            per = jnp.mean(jnp.abs(real_all - unc_img))
            if vgg_params is not None:
                per = per + vgg_mod.vgg_loss(vgg_params, unc_img, real_all) * cfg.lambda_vgg
            loss += per
            metrics["per_img_unc"] = per

        # feature discriminator: videos are the "real" domain (`:604-608`)
        if cfg.use_df and disc is not None:
            score = self.df.apply({"params": disc["df"]}, z_q.astype(jnp.float32))
            advf = gl.g_logistic_real(score)
            loss += advf
            metrics["gen_feat_real"] = advf

        fake_data = {"vid": fake_vid, "z": z_q, "unc_vid": fake_unc_vid}
        return loss, (metrics, fake_data)

    # ---------- discriminator losses ----------

    def img_discriminator_loss(self, disc, real_img, fake_img, fake_z=None, aug_fn=None):
        """`compute_img_discriminator_loss` (`quantized_video_model.py:629-666`)."""
        cfg = self.cfg
        metrics = {}
        loss = 0.0
        if cfg.elastic_corruption:
            no_corr, _ = self.corr_split(real_img.shape[0])
            real_img = real_img[jnp.asarray(no_corr)]
        real_score = None
        if cfg.use_di:
            # independent ADA draws for real and fake (`:639-640`)
            ri = aug_fn(real_img, 0) if aug_fn is not None else real_img
            fi = aug_fn(fake_img, 1) if aug_fn is not None else fake_img
            di = self._ckpt(lambda p, x: self.di.apply({"params": p}, x))
            fake_score = di(disc["di"], jax.lax.stop_gradient(fi))
            real_score = di(disc["di"], ri)
            d = gl.DISCRIMINATOR_LOSSES[cfg.gan_loss](real_score, fake_score) * cfg.lambda_gan
            loss += d
            metrics["dis_img"] = d
        if cfg.use_df and fake_z is not None:
            fs = self.df.apply({"params": disc["df"]}, jax.lax.stop_gradient(fake_z))
            d = gl.d_logistic_fake_only(fs)
            loss += d
            metrics["dis_feat_fake"] = d
        return loss, (metrics, real_score)

    def vid_discriminator_loss(self, disc, real_vid, fake_vid, fake_z=None,
                               fake_unc_vid=None):
        """`compute_vid_discriminator_loss` (`quantized_video_model.py:704-741`)."""
        cfg = self.cfg
        metrics = {}
        loss = 0.0
        if cfg.use_dv:
            dv = self._ckpt(lambda p, x: self.dv.apply({"params": p}, x))
            fs = dv(disc["dv"], jax.lax.stop_gradient(fake_vid))
            rs = dv(disc["dv"], real_vid)
            d = gl.DISCRIMINATOR_LOSSES[cfg.gan_loss](rs, fs)
            loss += d
            metrics["dis_vid"] = d
        if cfg.use_unc_gen and fake_unc_vid is not None and cfg.use_di:
            # unconditional frames through the image D (`:714-723`)
            real_img = real_vid.reshape(-1, *real_vid.shape[2:])
            fake_img = jax.lax.stop_gradient(
                fake_unc_vid.reshape(-1, *fake_unc_vid.shape[2:])
            )
            fs = self.di.apply({"params": disc["di"]}, fake_img)
            rs = self.di.apply({"params": disc["di"]}, real_img)
            d = gl.DISCRIMINATOR_LOSSES[cfg.gan_loss](rs, fs) * cfg.lambda_gan
            loss += d
            metrics["dis_img_unc"] = d
        if cfg.use_df and fake_z is not None:
            rs = self.df.apply({"params": disc["df"]}, jax.lax.stop_gradient(fake_z))
            d = gl.d_logistic_real_only(rs)
            loss += d
            metrics["dis_feat_real"] = d
        return loss, metrics

    def img_r1_loss(self, disc, real_img, aug_fn=None):
        """`compute_img_discriminator_regularization_loss` (`:669-701`)."""
        cfg = self.cfg
        if cfg.elastic_corruption:
            no_corr, _ = self.corr_split(real_img.shape[0])
            real_img = real_img[jnp.asarray(no_corr)]

        def d_apply(x):
            xi = aug_fn(x) if aug_fn is not None else x
            return self.di.apply({"params": disc["di"]}, xi)

        gp = gl.r1_penalty(d_apply, real_img)
        return cfg.lambda_r1 / 2.0 * gp * (cfg.d_reg_every or 1)

    def vid_r1_loss(self, disc, real_vid):
        """`compute_vid_discriminator_regularization_loss` (`:744-770`)."""
        cfg = self.cfg

        def d_apply(x):
            return self.dv.apply({"params": disc["dv"]}, x)

        gp = gl.r1_penalty(d_apply, real_vid)
        return cfg.lambda_r1 / 2.0 * gp * (cfg.d_reg_every or 1)
