"""SkipGAN decoder with the learnable optical-flow context module.

TPU-native re-implementation of `SkipGANDecoder` + `InterBlock` + `Matching`
+ `Subpixel` (`models/skip_vid_generator/models/skip_autoencoder.py:131-476`).

Differences from the reference (all TPU-motivated, semantics preserved):

- NHWC layout; contexts are fused via concatenation instead of in-place
  channel writes (functional, XLA-friendly).
- Multi-context handling is static-shaped: the k contexts are folded into the
  batch axis (b-major, like the reference's ``repeat().view``), and an
  optional ``ctx_mask (B, k)`` marks valid slots so rollout loops can run with
  a fixed ``skip_memory``-sized FIFO under ``lax.scan`` (the reference grows a
  Python list, `quantized_video_model.py:864-902`).
- The cost volume runs through :func:`ccvs_tpu.ops.local_correlation`
  (XLA slices) instead of runtime-compiled CUDA.
"""

import math
from typing import List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ccvs_tpu.config import AutoencoderConfig
from ccvs_tpu.nn.layers import ConvLayerAE, ResBlockAE, ToRGB, flatten_vid, unflatten_vid
from ccvs_tpu.ops import backwarp, local_correlation
from ccvs_tpu.ops.convops import conv_transpose2d
from ccvs_tpu.ops.fused_act import leaky_relu


class GroupedUpsample(nn.Module):
    """Grouped 2x transposed-conv upsampler (reference
    `skip_autoencoder.py:153-168`: ConvTranspose2d(k=4, s=2, p=1, groups=C);
    the tradeoff upsampler maps 32 -> feat_size with 32 groups)."""

    channels: int
    out_channels: Optional[int] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        out_ch = self.out_channels or self.channels
        w = self.param(
            "weight",
            nn.initializers.normal(stddev=0.02),
            (self.channels, out_ch // self.channels, 4, 4),
            jnp.float32,
        )
        return conv_transpose2d(
            x.astype(self.dtype), w.astype(self.dtype), None, stride=2, padding=1,
            groups=self.channels,
        )


class Matching(nn.Module):
    """Cost-volume flow estimation (`skip_autoencoder.py:131-206`)."""

    cfg: AutoencoderConfig
    flow_mult: float
    kernel: int
    feat_size: int
    corr_stride: int
    first: bool
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, k, inter, flow, occ, toff):
        """``x``: (B, h, w, s) decoder features SHARED across the k contexts
        (the reference repeats them per context, `skip_autoencoder.py:246`;
        here every x-consuming conv computes its x-term once per batch element
        and broadcasts — exact by conv linearity). ``inter``/``flow``/``occ``
        are (B*k, ...), b-major k-minor."""
        cfg = self.cfg
        use_corr = not cfg.no_corr
        # At corr_stride > 1 the warped inter is consumed ONLY through
        # proj -> correlation, and the correlation samples its inputs at
        # stride positions (`modules/correlation.py:32-100`) — so warp just
        # those positions (1/stride^2 of the gather) and run the correlation
        # at stride 1 on the pre-sampled features. Exact: bilinear warp is
        # per-position, proj is a pointwise 1x1, and the kernel's stride
        # arithmetic reduces to unit stride on subsampled inputs.
        fast_strided = (
            use_corr and self.corr_stride != 1
            and not cfg.use_masked_flow and not cfg.use_tradeoff
            and not cfg.use_deformed_conv
        )

        if flow is not None:
            flow = GroupedUpsample(2, dtype=self.dtype, name="upsample_flow")(flow)
            occ = GroupedUpsample(1, dtype=self.dtype, name="upsample_occ")(occ)
            if cfg.use_deformed_conv:
                # learnable flow-offset deformable conv instead of plain warp
                # (`skip_autoencoder.py:158-159,183-185`)
                from ccvs_tpu.ops.deform import deform_conv3x3

                dw = self.param(
                    "deform_weight",
                    nn.initializers.normal(stddev=(2.0 / (self.feat_size * 9)) ** 0.5),
                    (self.feat_size, self.feat_size, 3, 3),
                    jnp.float32,
                )
                db = self.param("deform_bias", nn.initializers.zeros,
                                (self.feat_size,), jnp.float32)
                inter = deform_conv3x3(
                    inter, flow * self.flow_mult, dw.astype(inter.dtype),
                    db.astype(inter.dtype),
                )
            elif not fast_strided:
                inter = backwarp(inter, flow * self.flow_mult)
            if cfg.use_masked_flow:
                inter = inter * (1.0 - jax.nn.sigmoid(occ))
            if cfg.use_tradeoff:
                toff = GroupedUpsample(
                    32, out_channels=self.feat_size, dtype=self.dtype,
                    name="upsample_toff",
                )(toff)
                inter = inter + toff
            if cfg.use_deformed_conv or cfg.use_tradeoff:
                inter = leaky_relu(inter, 0.1)

        if use_corr:
            if fast_strided:
                s = self.corr_stride
                xc = x[:, ::s, ::s]  # (B, ...) — shared across contexts
                if flow is not None:
                    from ccvs_tpu.ops import backwarp_sampled

                    ic = backwarp_sampled(inter, flow * self.flow_mult, s)
                else:
                    ic = inter[:, ::s, ::s]
            else:
                xc, ic = x, inter
            if self.feat_size > 16 and not cfg.no_proj:
                tgt = max(16, self.feat_size // 4)
                proj = ConvLayerAE(self.feat_size, tgt, 1,
                                   dtype=self.dtype, name="proj")
                if cfg.shared_x_split:
                    # x-side projection computed once per batch element, then
                    # broadcast over the k contexts
                    px = jnp.repeat(proj(xc), k, axis=0)
                else:
                    px = proj(jnp.repeat(xc, k, axis=0))
                pi = proj(ic)
            else:
                px, pi = jnp.repeat(xc, k, axis=0), ic
            corr = local_correlation(
                px.astype(jnp.float32), pi.astype(jnp.float32),
                stride=1 if fast_strided else self.corr_stride,
            )
            corr = leaky_relu(corr, 0.1).astype(x.dtype)
            if self.corr_stride != 1:
                corr = GroupedUpsample(49, dtype=self.dtype, name="upsample_corr")(corr)
            feat = ConvLayerAE(49, 128, 3, dtype=self.dtype, name="convs0")(corr)
        else:
            # concat([x, inter]) conv, with the x block computed shared-once
            conv0 = ConvLayerAE(self.feat_size * 2, 128, 3,
                                dtype=self.dtype, name="convs0")
            if cfg.shared_x_split:
                feat = conv0(inter, shared=x, k=k)
            else:
                xt = jnp.repeat(x, k, axis=0).astype(inter.dtype)
                feat = conv0(jnp.concatenate([xt, inter], axis=-1))
        feat = ConvLayerAE(128, 64, 3, dtype=self.dtype, name="convs1")(feat)
        feat = ConvLayerAE(64, 32, 3, dtype=self.dtype, name="convs2")(feat)

        dflow = ConvLayerAE(32, 2, self.kernel, activate=False, dtype=self.dtype, name="flow_head")(feat)
        docc = ConvLayerAE(32, 1, self.kernel, activate=False, dtype=self.dtype, name="occ_head")(feat)
        flow = dflow if flow is None else flow + dflow
        occ = docc if occ is None else occ + docc
        return flow, occ


class Subpixel(nn.Module):
    """Subpixel flow refinement (`skip_autoencoder.py:209-228`)."""

    cfg: AutoencoderConfig
    flow_mult: float
    kernel: int
    feat_size: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, k, inter, flow, occ):
        """``x``: (B, h, w, s) shared decoder features (see Matching); the
        concat([x, warped, flow, occ]) conv computes its x block once per
        batch element — exact by conv linearity, and the single biggest
        k-redundancy in the decode step (~22% of InterBlock conv MACs)."""
        warped = backwarp(inter, flow * self.flow_mult)
        rest = jnp.concatenate([warped, flow, occ], axis=-1)
        conv0 = ConvLayerAE(2 * self.feat_size + 3, 128, 3,
                            dtype=self.dtype, name="convs0")
        if self.cfg.shared_x_split:
            feat = conv0(rest, shared=x, k=k)
        else:
            xt = jnp.repeat(x, k, axis=0).astype(rest.dtype)
            feat = conv0(jnp.concatenate([xt, rest], axis=-1))
        feat = ConvLayerAE(128, 64, 3, dtype=self.dtype, name="convs1")(feat)
        feat = ConvLayerAE(64, 32, 3, dtype=self.dtype, name="convs2")(feat)
        flow = flow + ConvLayerAE(32, 2, self.kernel, activate=False, dtype=self.dtype, name="flow_head")(feat)
        occ = occ + ConvLayerAE(32, 1, self.kernel, activate=False, dtype=self.dtype, name="occ_head")(feat)
        toff = feat if self.cfg.use_tradeoff else None
        return flow, occ, toff


class InterBlock(nn.Module):
    """Per-resolution context fusion (`skip_autoencoder.py:231-265`).

    ``x``: (B, h, w, s) decoder features; ``inters``: (B, k, h, w, s) context
    features; ``ctx_mask``: optional (B, k) validity. Flow state tensors are
    (B*k, ...) with k-minor (b-major) ordering, exactly like the reference's
    ``repeat().view``.
    """

    cfg: AutoencoderConfig
    flow_mult: float
    kernel: int
    feat_size: int
    corr_stride: int
    first: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, inters, flows=None, occs=None, toffs=None, ctx_mask=None, eps=1e-6):
        b, k = inters.shape[0], inters.shape[1]
        h, w, s = x.shape[1:]
        inters_f = inters.reshape(b * k, *inters.shape[2:])

        flows, occs = Matching(
            self.cfg, self.flow_mult, self.kernel, self.feat_size, self.corr_stride,
            self.first, dtype=self.dtype, name="matching",
        )(x, k, inters_f, flows, occs, toffs)
        flows, occs, toffs = Subpixel(
            self.cfg, self.flow_mult, self.kernel, self.feat_size, dtype=self.dtype,
            name="subpixel",
        )(x, k, inters_f, flows, occs)

        warped = backwarp(inters_f, flows * self.flow_mult)

        # Confidence-weighted fusion over contexts. With k == 1 and full mask
        # this reduces exactly to the reference's single-context path.
        confs = (1.0 - jax.nn.sigmoid(occs.astype(jnp.float32))) + eps  # (B*k, h, w, 1)
        confs = confs.reshape(b, k, h, w, 1)
        if ctx_mask is not None:
            confs = confs * ctx_mask[:, :, None, None, None].astype(confs.dtype)
        denom = jnp.maximum(jnp.sum(confs, axis=1), 1e-20)
        warped_avg = jnp.sum(warped.reshape(b, k, h, w, s).astype(jnp.float32) * confs, axis=1) / denom
        occ_avg = jnp.sum(occs.reshape(b, k, h, w, 1).astype(jnp.float32) * confs, axis=1) / denom

        occ_mask = jax.nn.sigmoid(occ_avg)
        fused = occ_mask * x.astype(jnp.float32) + (1.0 - occ_mask) * warped_avg

        if ctx_mask is not None:
            any_valid = (jnp.sum(ctx_mask, axis=1) > 0)[:, None, None, None]
            fused = jnp.where(any_valid, fused, x.astype(jnp.float32))

        return fused.astype(x.dtype), flows, occs, toffs


def interblock_schedule(num_resolutions: int):
    """Static per-resolution (kernel, flow_mult, corr_stride) schedule
    (`skip_autoencoder.py:398-401`)."""
    sched = []
    for i in range(num_resolutions):
        sched.append({
            "kernel": 2 ** (i // 2 + 1) + 1,
            "flow_mult": float(2**i),
            "corr_stride": 2 if i > 2 else 1,
        })
    return sched


class SkipDecoder(nn.Module):
    """SkipGAN decoder (`skip_autoencoder.py:354-476`)."""

    cfg: AutoencoderConfig
    mode: str = "rgb"  # rgb | layout | both
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        z,
        inter_tgts: Optional[Sequence[Sequence[jnp.ndarray]]] = None,
        ctx_mask: Optional[jnp.ndarray] = None,
        return_all: bool = False,
        inter_pre_warping: bool = True,
        has_ctx: bool = True,
        keep_mask: Optional[jnp.ndarray] = None,
    ):
        """Decode latents to frames, warping in context features.

        Args:
          z: (B[, T], h, w, z_size) quantized latents.
          inter_tgts: list over k contexts; each context is a list over
            resolutions in *encoder order* (finest first) of (B[, T], h_i,
            w_i, c_i) features (reference passes the same structure).
          ctx_mask: optional (B, k) context-slot validity for fixed-shape
            rollout FIFOs.
          keep_mask: optional (B,) 0/1 — elements with 0 skip context fusion
            (the reference's ``drop_p`` shuffle, `skip_autoencoder.py:423-426`).

        Returns:
          ``(rgb, layout)`` or, with ``return_all``,
          ``(rgb, layout, inter_flows, inter_occs, inter_dec)``.
        """
        cfg = self.cfg
        z, t = flatten_vid(z)
        nres = cfg.num_resolutions
        chans = cfg.dec_channels
        inter_sizes = cfg.inter_sizes_dec
        sched = interblock_schedule(nres)

        use_inter = cfg.use_inter and inter_tgts is not None and has_ctx
        if use_inter:
            # (B, k, h_i, w_i, c_i) per resolution, encoder order.
            k = len(inter_tgts)
            stacked = []
            for r in range(nres):
                feats = [flatten_vid(ctx[r])[0] for ctx in inter_tgts]
                stacked.append(jnp.stack(feats, axis=1))

        in_size = cfg.z_size * 2 if self.mode == "both" else cfg.z_size
        out = ConvLayerAE(in_size, chans[0], 1, dtype=self.dtype, name="block0")(z)

        inter_dec: List[jnp.ndarray] = []
        inter_flows, inter_occs = [], []
        flows = occs = toffs = None
        rgb = None

        def fuse(out, i, flows, occs, toffs):
            s = inter_sizes[i]
            head, tail = out[..., :s], out[..., s:]
            fused, flows, occs, toffs = InterBlock(
                cfg,
                sched[i]["flow_mult"],
                sched[i]["kernel"],
                s,
                sched[i]["corr_stride"],
                first=(i == 0),
                dtype=self.dtype,
                name=f"inter_block{i}",
            )(head, stacked[nres - 1 - i], flows, occs, toffs, ctx_mask)
            if keep_mask is not None:
                fused = jnp.where(keep_mask[:, None, None, None].astype(bool), fused, head)
            return jnp.concatenate([fused, tail], axis=-1), flows, occs, toffs

        if use_inter:
            if inter_pre_warping:
                inter_dec.append(out[..., : inter_sizes[0]])
            out, flows, occs, toffs = fuse(out, 0, flows, occs, toffs)
            if not inter_pre_warping:
                inter_dec.append(out[..., : inter_sizes[0]])
            inter_flows.append(flows)
            inter_occs.append(occs)
        if cfg.skip_rgb:
            rgb = ToRGB(chans[0], upsample=False, dtype=self.dtype, name="to_rgb0")(out)

        for i in range(1, nres):
            out = ResBlockAE(
                chans[i - 1], chans[i], upsample=True, dtype=self.dtype, name=f"block{i}"
            )(out)
            if use_inter:
                if inter_pre_warping:
                    inter_dec.append(out[..., : inter_sizes[i]])
                out, flows, occs, toffs = fuse(out, i, flows, occs, toffs)
                if not inter_pre_warping:
                    inter_dec.append(out[..., : inter_sizes[i]])
                inter_flows.append(flows)
                inter_occs.append(occs)
            if cfg.skip_rgb:
                rgb = ToRGB(chans[i], dtype=self.dtype, name=f"to_rgb{i}")(out, rgb)

        out2 = None
        if self.mode == "both":
            out1 = ConvLayerAE(chans[-1], 3, 1, activate=False, dtype=self.dtype, name="rgb_head")(out)
            refined = ConvLayerAE(chans[-1], chans[-1], 3, dtype=self.dtype, name="refine_layout")(out)
            out2 = ConvLayerAE(
                chans[-1], cfg.layout_size, 1, activate=False, dtype=self.dtype, name="layout_head"
            )(refined)
            out2 = unflatten_vid(out2, t)
        elif self.mode == "layout":
            out1 = ConvLayerAE(
                chans[-1], cfg.layout_size, 1, activate=False, dtype=self.dtype, name=f"block{nres}"
            )(out)
        else:
            if cfg.skip_rgb:
                out1 = rgb
            else:
                out1 = ConvLayerAE(
                    chans[-1], 3, 1, activate=False, dtype=self.dtype, name=f"block{nres}"
                )(out)
            if cfg.skip_tanh:
                out1 = jnp.tanh(out1)
        out1 = unflatten_vid(out1, t)

        if return_all:
            return out1, out2, inter_flows, inter_occs, [unflatten_vid(f, t) for f in inter_dec]
        return out1, out2

    @staticmethod
    def last_flow_mult(cfg: AutoencoderConfig) -> float:
        return float(2 ** (cfg.num_resolutions - 1))
