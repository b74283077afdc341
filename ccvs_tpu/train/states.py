"""Train states and optimizers.

Optimizer construction ports the reference exactly:
- AE: Adam with StyleGAN2 lazy-regularization ratio folded into lr/betas
  (`quantized_video_model.py:226-248`).
- Transformer: AdamW with minGPT decay/no-decay parameter split
  (`transformer_model.py:85-139`) — in optax this is a weight-decay mask over
  Dense kernels — plus warmup(+cosine) LR (`helpers/transformer_trainer.py:
  108-119`).
"""

from typing import Any, Optional

import flax.struct
import jax
import jax.numpy as jnp
import optax

from ccvs_tpu.config import AutoencoderConfig, TransformerConfig


@flax.struct.dataclass
class AETrainState:
    step: jnp.ndarray
    gen: Any  # {encoder, quantizer, decoder}
    disc: Any  # {di?, dv?, df?}
    opt_g: Any
    opt_d: Any
    ema: Any  # EMA copy of gen
    ada_p: jnp.ndarray  # adaptive augmentation probability
    ada_rt: jnp.ndarray  # running mean of sign(D(real))


@flax.struct.dataclass
class SimpleTrainState:
    step: jnp.ndarray
    params: Any
    opt: Any


def make_ae_optimizers(cfg: AutoencoderConfig):
    """(opt_g, opt_d) with the lazy-regularization lr/beta ratios
    (`quantized_video_model.py:239-243`)."""
    g_ratio = cfg.g_reg_every / (cfg.g_reg_every + 1) if cfg.g_reg_every else 1.0
    d_ratio = cfg.d_reg_every / (cfg.d_reg_every + 1) if cfg.d_reg_every else 1.0

    def lr_of(base):
        # opt-in step decay (cfg.lr_decay_at, in optimizer updates); the
        # default keeps the reference's constant LR. An int is one decay
        # point; a tuple/list applies lr_decay_mult at each point
        # (round-5 extended run: x0.3 at 300 and again at 900 iters).
        if cfg.lr_decay_at:
            pts = (cfg.lr_decay_at if isinstance(cfg.lr_decay_at, (tuple, list))
                   else (cfg.lr_decay_at,))
            return optax.piecewise_constant_schedule(
                base, {int(p): cfg.lr_decay_mult for p in pts})
        return base

    opt_g = optax.adam(lr_of(cfg.lr * g_ratio), b1=cfg.beta1**g_ratio,
                       b2=cfg.beta2**g_ratio)
    opt_d = optax.adam(lr_of(cfg.lr * d_ratio), b1=cfg.beta1**d_ratio,
                       b2=cfg.beta2**d_ratio)
    return opt_g, opt_d


def make_transformer_optimizer(cfg: TransformerConfig, n_iter: int):
    """AdamW with decay mask + warmup/cosine schedule."""

    def decay_mask(params):
        def is_decay(path, _):
            # Dense kernels decay; biases, layernorm, embeddings, positional
            # embeddings do not (`transformer_model.py:90-117`).
            return path[-1].key == "kernel" if hasattr(path[-1], "key") else False

        return jax.tree_util.tree_map_with_path(is_decay, params)

    if cfg.lr_decay:
        sched = optax.warmup_cosine_decay_schedule(
            0.0, cfg.lr, max(cfg.lr_warmup_iter, 1), n_iter
        )
    else:
        sched = optax.linear_schedule(0.0, cfg.lr, max(cfg.lr_warmup_iter, 1))

    if cfg.finetune_head:
        # head-only / lowered-LR finetuning (`transformer_model.py:85-132`):
        # the output head trains at full lr; everything else at
        # lr * finetune_f (frozen when finetune_f is None).
        def label(params):
            def f(path, _):
                in_head = any(getattr(k, "key", None) == "head" for k in path)
                return "head" if in_head else "rest"

            return jax.tree_util.tree_map_with_path(f, params)

        f = cfg.finetune_f
        if f is None:
            rest = optax.set_to_zero()
        else:
            rest_sched = lambda step: sched(step) * f
            rest = optax.adamw(
                rest_sched, b1=cfg.beta1, b2=cfg.beta2,
                weight_decay=cfg.weight_decay, mask=decay_mask,
            )
        head = optax.adamw(sched, b1=cfg.beta1, b2=cfg.beta2,
                           weight_decay=cfg.weight_decay)
        return optax.multi_transform({"head": head, "rest": rest}, label)

    return optax.adamw(
        sched, b1=cfg.beta1, b2=cfg.beta2, weight_decay=cfg.weight_decay,
        mask=decay_mask,
    )


def make_adam(lr, b1, b2, weight_decay=0.0):
    if weight_decay:
        return optax.adamw(lr, b1=b1, b2=b2, weight_decay=weight_decay)
    return optax.adam(lr, b1=b1, b2=b2)


def ema_update(ema, params, decay=0.999):
    """`QVidModel.accumulate` (`quantized_video_model.py:951-964`)."""
    return jax.tree_util.tree_map(
        lambda e, p: e * decay + p.astype(e.dtype) * (1.0 - decay), ema, params
    )
