"""Jitted SPMD train steps.

Replaces the reference trainer inner loops (`helpers/frame_autoencoder_
trainer.py:49-79`, `helpers/transformer_trainer.py:56-87`). Each step is one
XLA program; under a sharded-batch `jax.jit` the gradient all-reduce and the
ADA sign statistic (`tools/engine.py:127-141`, `modules/non_leaking.py:11-47`)
become implicit ICI collectives.
"""

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import optax

from ccvs_tpu.config import AutoencoderConfig, TransformerConfig
from ccvs_tpu.train.ae_losses import AELosses
from ccvs_tpu.train.states import (
    AETrainState,
    SimpleTrainState,
    ema_update,
    make_ae_optimizers,
    make_transformer_optimizer,
)


def make_ae_steps(losses: AELosses, vgg_params, aug_fn=None):
    """Builds jittable (g_step, d_step, r1_img_step, r1_vid_step) closures.

    ``aug_fn(rng, img, p)`` is the ADA transform (``train.ada.augment``);
    when set and ``cfg.use_aug``, it is applied at the reference's three
    image-D entry points — G adversarial fake (`quantized_video_model.py:418`),
    D real+fake (`:639-640`), R1 real (`:677`) — with the adaptive
    probability ``state.ada_p`` that d_step's controller tunes.
    """
    cfg = losses.cfg
    opt_g, opt_d = make_ae_optimizers(cfg)

    def init_state(key, gen, disc):
        return AETrainState(
            step=jnp.zeros((), jnp.int32),
            gen=gen,
            disc=disc,
            opt_g=opt_g.init(gen),
            opt_d=opt_d.init(disc),
            ema=jax.tree_util.tree_map(jnp.copy, gen),
            ada_p=jnp.asarray(cfg.aug_p, jnp.float32),
            ada_rt=jnp.zeros((), jnp.float32),
        )

    def _aug(state, rng):
        if not cfg.use_aug or aug_fn is None:
            return None
        # `salt` lets one call site draw independent transforms for real vs
        # fake (the reference advances its global RNG between the two calls,
        # `quantized_video_model.py:639-640`). jax.checkpoint: the geometric
        # warp runs on a 2x-resolution canvas whose stored intermediates
        # (several (B, 2H', 2W', 3) fp32 buffers at three aug sites) dominate
        # HBM at 256^2 — recompute them in the backward pass instead.
        ck_aug = jax.checkpoint(lambda r, x, p: aug_fn(r, x, p),
                                static_argnums=())
        return lambda x, salt=0: ck_aug(jax.random.fold_in(rng, salt), x, state.ada_p)

    def g_step(state, batch, rng, mode: str):
        aug = _aug(state, jax.random.fold_in(rng, 1))

        def loss_fn(gen):
            if mode == "img":
                return losses.img_generator_loss(
                    gen, state.disc, vgg_params, batch, rng, aug_fn=aug
                )
            return losses.vid_generator_loss(gen, state.disc, vgg_params, batch, rng)

        (loss, (metrics, fake_data)), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.gen)
        updates, new_opt = opt_g.update(grads, state.opt_g, state.gen)
        gen = optax.apply_updates(state.gen, updates)
        ema = ema_update(state.ema, gen, cfg.ema_decay) if cfg.use_ema else state.ema
        # `step` counts global iterations and is advanced by the trainer (one
        # iteration may contain several G steps: img + vid).
        state = state.replace(gen=gen, opt_g=new_opt, ema=ema)
        metrics["g_loss"] = loss
        return state, metrics, fake_data

    def d_step(state, batch, fake_data, rng, mode: str):
        aug = _aug(state, jax.random.fold_in(rng, 2))

        def loss_fn(disc):
            if mode == "img":
                l, (m, real_score) = losses.img_discriminator_loss(
                    disc, batch["img"], fake_data["img"], fake_data.get("z"),
                    aug_fn=aug,
                )
                return l, (m, real_score)
            l, m = losses.vid_discriminator_loss(
                disc, batch["vid"], fake_data["vid"], fake_data.get("z"),
                fake_unc_vid=fake_data.get("unc_vid"),
            )
            return l, (m, None)

        (loss, (metrics, real_score)), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.disc)
        updates, new_opt = opt_d.update(grads, state.opt_d, state.disc)
        disc = optax.apply_updates(state.disc, updates)
        state = state.replace(disc=disc, opt_d=new_opt)
        # ADA controller (`modules/non_leaking.py:28-47`): adjust p by the sign
        # of mean(sign(D(real))) - target. Computed over the global batch.
        if cfg.use_aug and cfg.aug_p == 0 and real_score is not None and mode == "img":
            r_t = jnp.mean(jnp.sign(real_score.astype(jnp.float32)))
            n = real_score.shape[0]
            adjust = jnp.sign(r_t - cfg.ada_target) * n / cfg.ada_length
            new_p = jnp.clip(state.ada_p + adjust, 0.0, 1.0)
            state = state.replace(ada_p=new_p, ada_rt=r_t)
            metrics["rt_stat"] = r_t
        metrics["d_loss"] = loss
        return state, metrics

    def r1_step(state, batch, mode: str, rng=None):
        aug = None
        if rng is not None:
            aug = _aug(state, jax.random.fold_in(rng, 3))

        def loss_fn(disc):
            if mode == "img":
                return losses.img_r1_loss(disc, batch["img"], aug_fn=aug)
            return losses.vid_r1_loss(disc, batch["vid"])

        loss, grads = jax.value_and_grad(loss_fn)(state.disc)
        updates, new_opt = opt_d.update(grads, state.opt_d, state.disc)
        disc = optax.apply_updates(state.disc, updates)
        return state.replace(disc=disc, opt_d=new_opt), {"r1_" + mode: loss}

    return init_state, g_step, d_step, r1_step


def make_transformer_step(transformer, cfg: TransformerConfig, n_iter: int,
                          state_shardings=None):
    """(init_state, step) for the latent transformer
    (`helpers/transformer_trainer.py:56-87`).

    ``state_shardings``: optional sharding pytree for the train state
    (FSDP, `parallel/fsdp.py`). Pinning the *output* shardings is what keeps
    params/moments split across steps — with inputs-only, GSPMD's propagation
    may legally replicate the updated state and defeat the memory saving.
    """
    opt = make_transformer_optimizer(cfg, n_iter)

    def init_state(params):
        return SimpleTrainState(step=jnp.zeros((), jnp.int32), params=params, opt=opt.init(params))

    def mb_loss(params, mb):
        return transformer.loss(
            params,
            mb["code"],
            state_code=mb.get("state_code"),
            cond_code=mb.get("cond_code"),
            delta=mb.get("delta"),
            lbl=mb.get("vid_lbl"),
        )

    accum = max(1, getattr(cfg, "grad_accum", 1))

    def step(state, batch):
        if accum == 1:
            (loss, metrics), grads = jax.value_and_grad(
                mb_loss, has_aux=True)(state.params, batch)
        else:
            # microbatch the global batch with lax.scan: one compiled body,
            # activation memory of ONE microbatch, grads accumulated in a
            # full-size buffer. Equal microbatch sizes + static mask layouts
            # make mean-of-means identical to the full-batch mean.
            def split(x):
                assert x.shape[0] % accum == 0, (
                    f"grad_accum={accum} must divide batch {x.shape[0]}")
                return x.reshape(accum, x.shape[0] // accum, *x.shape[1:])

            mbs = jax.tree_util.tree_map(split, batch)
            zero = jax.tree_util.tree_map(jnp.zeros_like, state.params)

            def body(gsum, mb):
                (_, m), g = jax.value_and_grad(
                    mb_loss, has_aux=True)(state.params, mb)
                return jax.tree_util.tree_map(jnp.add, gsum, g), m

            gsum, ms = jax.lax.scan(body, zero, mbs)
            grads = jax.tree_util.tree_map(lambda g: g / accum, gsum)
            metrics = jax.tree_util.tree_map(lambda m: jnp.mean(m, axis=0), ms)
        metrics["gnorm"] = optax.global_norm(grads)
        updates, new_opt = opt.update(grads, state.opt, state.params)
        params = optax.apply_updates(state.params, updates)
        return state.replace(step=state.step + 1, params=params, opt=new_opt), metrics

    if state_shardings is not None:
        # metrics are scalars -> replicated (prefix-pytree sharding)
        mesh = jax.tree_util.tree_leaves(state_shardings)[0].mesh
        from jax.sharding import NamedSharding, PartitionSpec as P

        step = jax.jit(step, out_shardings=(state_shardings,
                                            NamedSharding(mesh, P())))
    else:
        step = jax.jit(step)
    return init_state, step


def make_simple_step(loss_fn, opt):
    """Generic (init_state, step) for state-estimator / stft trainers."""

    def init_state(params):
        return SimpleTrainState(step=jnp.zeros((), jnp.int32), params=params, opt=opt.init(params))

    @jax.jit
    def step(state, batch):
        (loss, metrics), grads = jax.value_and_grad(
            lambda p: loss_fn(p, batch), has_aux=True
        )(state.params)
        updates, new_opt = opt.update(grads, state.opt, state.params)
        params = optax.apply_updates(state.params, updates)
        return state.replace(step=state.step + 1, params=params, opt=new_opt), metrics

    return init_state, step
