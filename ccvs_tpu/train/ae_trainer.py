"""Frame-autoencoder training driver.

Port of `helpers/frame_autoencoder_trainer.py`: alternating G/D steps on
image batches, video-batch steps every ``vid_step_every`` iterations, lazy R1
regularization every ``d_reg_every``, EMA accumulation inside the G step, and
rolling latest / periodic checkpoints.
"""

import os
import time
from itertools import cycle

import jax
import jax.numpy as jnp
import numpy as np

from ccvs_tpu.config import Config
from ccvs_tpu.data import PrefetchLoader, create_dataset
from ccvs_tpu.models.autoencoder import FrameAutoencoder
from ccvs_tpu.nn import vgg as vgg_mod
from ccvs_tpu.nn.discriminators import (
    FeatureDiscriminator,
    ImageDiscriminator,
    VideoDiscriminator,
)
from ccvs_tpu.train.ae_losses import AELosses
from ccvs_tpu.train.steps import make_ae_steps
from ccvs_tpu.utils.checkpoint import CheckpointManager
from ccvs_tpu.utils.logging import Logger


class FrameAutoencoderTrainer:
    """Trains data-parallel over a ('data', 'model') mesh: params replicated,
    batches sharded on 'data' (the reference trains DDP on 4 GPUs by default,
    `tools/engine.py:71-101`; here the gradient all-reduce is XLA's implicit
    psum over ICI). Pass ``mesh=None`` to span all local devices."""

    def __init__(self, cfg: Config, vgg_npz: str = None, dtype=jnp.bfloat16, mesh=None):
        from ccvs_tpu.parallel.mesh import make_mesh

        self.cfg = cfg
        self.mesh = mesh if mesh is not None else make_mesh()
        acfg = cfg.ae
        self.ae = FrameAutoencoder(acfg, dtype=dtype)
        self.di = ImageDiscriminator(acfg, dtype=dtype) if acfg.use_di else None
        self.dv = VideoDiscriminator(acfg, vid_len=acfg.vid_len, dtype=dtype) if acfg.use_dv else None
        self.df = FeatureDiscriminator(acfg, dtype=dtype) if acfg.use_df else None
        self.losses = AELosses(acfg, self.ae, di=self.di, dv=self.dv, df=self.df)
        key = jax.random.PRNGKey(cfg.seed)
        if acfg.use_vgg_img or acfg.use_vgg_vid:
            if vgg_mod.check_npz(vgg_npz):
                # auto-detect the backbone: export_vgg ships vgg19,
                # export_lpips ships vgg16 — both are valid here
                self.vgg_params = vgg_mod.load_vgg_npz(vgg_npz)[0]
            else:
                vgg_mod.warn_fallback("the perceptual loss")
                self.vgg_params = vgg_mod.init_random(key)
        else:
            self.vgg_params = None

        aug_fn = None
        if acfg.use_aug:
            from ccvs_tpu.train.ada import augment as ada_augment

            aug_fn = ada_augment
        steps = make_ae_steps(self.losses, self.vgg_params, aug_fn=aug_fn)
        self.init_state, self._g, self._d, self._r1 = steps
        # donate the train state: in-place param/opt updates instead of a
        # second ~2 GB live copy per step (matters at the 256^2 BAIR config)
        self.g_step = jax.jit(self._g, static_argnames=("mode",), donate_argnums=(0,))
        self.d_step = jax.jit(self._d, static_argnames=("mode",), donate_argnums=(0,))
        self.r1_step = jax.jit(self._r1, static_argnames=("mode",), donate_argnums=(0,))

    def init_params(self, key):
        acfg = self.cfg.ae
        h = acfg.max_dim
        w = int(acfg.max_dim * acfg.aspect_ratio)
        gen = jax.jit(self.ae.init)(key)
        disc = {}
        if self.di is not None:
            disc["di"] = jax.jit(lambda k: self.di.init(k, jnp.zeros((2, h, w, 3)))["params"])(key)
        if self.dv is not None:
            disc["dv"] = jax.jit(
                lambda k: self.dv.init(k, jnp.zeros((2, acfg.vid_len, h, w, 3)))["params"]
            )(key)
        if self.df is not None:
            disc["df"] = jax.jit(
                lambda k: self.df.init(k, jnp.zeros((2, *acfg.z_shape, acfg.z_size)))["params"]
            )(key)
        return gen, disc

    def make_loaders(self):
        from ccvs_tpu.data import FoldCycler

        cfg = self.cfg
        group = cfg.data.n_consecutive_img + (1 if cfg.data.load_elastic_view else 0)
        bs_img = max(1, cfg.data.batch_size_img // group)

        def make_img_loader(fold=None):
            ds = create_dataset(cfg.data, phase="train", load_vid=False, fold=fold)
            return PrefetchLoader(ds, bs_img, num_workers=cfg.data.num_workers, seed=cfg.seed)

        if cfg.data.num_folds_train:
            img_loader = FoldCycler(make_img_loader, cfg.data.num_folds_train,
                                    cfg.data.init_fold_train,
                                    random_fold=cfg.data.random_fold_train,
                                    seed=cfg.seed)
        else:
            img_loader = make_img_loader()
        vid_loader = None
        # video batches may come from a second dataset (reference
        # --use_extra_dataset: `helpers/frame_autoencoder_trainer.py:84`
        # swaps in the xb_-prefixed opts for the "vid" data type)
        vid_src = cfg.extra_data if cfg.extra_data is not None else cfg.data
        if vid_src.is_seq:
            import dataclasses

            # AE training uses its own (short) rollout length — e.g. 4 frames
            # for BAIR (`scripts/bairhd/train_frame_autoencoder.sh: --vid_len 4`)
            # while generation clips use data.vid_len (16).
            vid_data_cfg = dataclasses.replace(vid_src, vid_len=cfg.ae.vid_len)
            vid_ds = create_dataset(vid_data_cfg, phase="train", load_vid=True)
            vid_loader = PrefetchLoader(
                vid_ds, vid_src.batch_size_vid, num_workers=vid_src.num_workers,
                seed=cfg.seed + 1,
            )
        return img_loader, vid_loader

    def make_rec_eval(self):
        """Jitted held-out reconstruction eval: returns ``(rec, psnr)`` for an
        image batch in [-1, 1]. Used for the rec-PSNR convergence trend the
        reference only exposes through tensorboard grids
        (`quantized_video_model.py:430-455`)."""

        def _eval(gen, img):
            rec = self.ae.reconstruct(gen, img).astype(jnp.float32)
            mse = jnp.mean((rec - img) ** 2, axis=(1, 2, 3))
            psnr = jnp.mean(10.0 * jnp.log10(4.0 / jnp.maximum(mse, 1e-10)))
            return rec, psnr

        return jax.jit(_eval)

    def run(self, n_iter=None, resume=False, profile_dir=None, eval_every=0,
            snapshot_every=0, serialize_steps=False):
        """``serialize_steps``: force a tiny device->host transfer after each
        jitted step. TPU temp workspaces are allocated at enqueue, so at
        memory-bound configs (256^2 BAIR on one 16 GB chip) letting g/d/r1
        enqueue back-to-back overlaps their scratch and OOMs at runtime;
        the ~30 ms sync serializes scratch lifetimes."""
        cfg = self.cfg
        acfg = cfg.ae
        n_iter = n_iter or cfg.n_iter
        ckpt_path = os.path.join(cfg.save_path, "checkpoints", cfg.name)
        log_path = os.path.join(cfg.save_path, "logs", cfg.name)
        mirror = None
        if cfg.npz_mirror:
            # mirror the raw generator (short runs: the 0.999 EMA is still
            # init-dominated, TRAINRUN.md) into the committable npz on every
            # latest save — kill-proof trained weights (VERDICT r4 item 2)
            mirror = (cfg.npz_mirror, lambda state: {"ae_gen": state.gen})
        ckpt = CheckpointManager(ckpt_path, async_save=cfg.async_ckpt,
                                 npz_mirror=mirror)
        os.makedirs(os.path.join(cfg.save_path, "checkpoints", cfg.name), exist_ok=True)
        with open(os.path.join(cfg.save_path, "checkpoints", cfg.name, "config.json"), "w") as f:
            f.write(cfg.to_json())
        logger = Logger(log_path, imagenet_norm=cfg.data.imagenet_norm)

        key = jax.random.PRNGKey(cfg.seed)
        gen, disc = self.init_params(key)
        state = self.init_state(key, gen, disc)
        start = 0
        if resume:
            state = ckpt.load("qvid", "latest", target=state)
            start = int(state.step)
        from ccvs_tpu.parallel.mesh import replicate_tree

        state = replicate_tree(self.mesh, state)

        img_loader, vid_loader = self.make_loaders()
        img_iter = iter(cycle_loader(img_loader))
        vid_iter = iter(cycle_loader(vid_loader)) if vid_loader else None

        rec_eval = eval_batch = None
        if eval_every:
            # fixed held-out batch: first valid-phase image batch (no elastic)
            import dataclasses as _dc

            eval_cfg = _dc.replace(cfg.data, load_elastic_view=False,
                                   n_consecutive_img=1)
            eval_ds = create_dataset(eval_cfg, phase="valid", load_vid=False)
            n_eval = min(16, len(eval_ds))
            eval_batch = jnp.asarray(
                np.stack([eval_ds[i]["img"] for i in range(n_eval)]))
            rec_eval = self.make_rec_eval()

        from ccvs_tpu.utils import profiling
        from ccvs_tpu.utils.preemption import PreemptionGuard

        t0 = time.time()
        preempted = False
        eval_count = 0
        with PreemptionGuard() as guard:
            for it in range(start, n_iter):
                # short profiler capture window (SURVEY section 5.1 parity+)
                if profile_dir and it == start + 10:
                    jax.profiler.start_trace(profile_dir)
                if profile_dir and it == start + 13:
                    profiling.device_sync(state.gen)
                    jax.profiler.stop_trace()
                rng = jax.random.fold_in(key, it)
                sync = (lambda m: np.asarray(m["g_loss" if "g_loss" in m else next(iter(m))])) \
                    if serialize_steps else (lambda m: None)
                batch = to_device(next(img_iter), self.mesh)
                state, gm, fake = self.g_step(state, batch, rng, mode="img")
                sync(gm)
                dm = {}
                if self.di is not None or self.df is not None:
                    state, dm = self.d_step(state, batch, fake, rng, mode="img")
                    sync(dm)
                if self.di is not None and acfg.d_reg_every and it % acfg.d_reg_every == 0:
                    state, rm = self.r1_step(state, batch, mode="img", rng=rng)
                    sync(rm)
                    gm.update(rm)

                if vid_iter is not None and it % acfg.vid_step_every == 0:
                    vbatch = to_device(next(vid_iter), self.mesh)
                    state, gmv, fakev = self.g_step(state, vbatch, rng, mode="vid")
                    sync(gmv)
                    if self.dv is not None or self.df is not None:
                        state, dmv = self.d_step(state, vbatch, fakev, rng, mode="vid")
                        sync(dmv)
                        dm.update(dmv)
                    if self.dv is not None and acfg.d_reg_every and it % acfg.d_reg_every == 0:
                        state, rmv = self.r1_step(state, vbatch, mode="vid")
                        sync(rmv)
                        gmv.update(rmv)
                    gm.update(gmv)

                state = state.replace(step=jnp.asarray(it + 1, jnp.int32))
                logger.log_scalars({**gm, **dm}, it, prefix="qvid_generator/")
                if cfg.log_freq and it % cfg.log_freq == 0:
                    logger.log_img("qvid_generator/fake_img", np.asarray(fake["img"][:16]), 4, it,
                                   normalize=True)
                    logger.log_img("qvid_generator/real_img", np.asarray(batch["img"][:16]), 4, it,
                                   normalize=True)
                    el = time.time() - t0
                    print(f"iter {it}: g={float(gm['g_loss']):.4f} "
                          f"d={float(dm.get('d_loss', 0.0)):.4f} "
                          f"({el / max(1, it - start + 1):.2f}s/it)")
                if rec_eval is not None and it % eval_every == 0:
                    eval_count += 1
                    rec, psnr = rec_eval(state.ema if acfg.use_ema else state.gen,
                                         eval_batch)
                    scalars = {"rec_psnr": float(psnr), "ada_p": float(state.ada_p)}
                    rec_raw = None
                    if acfg.use_ema:
                        # the 0.999-decay EMA (reference `accumulate`,
                        # `quantized_video_model.py:951`) lags hundreds of iters
                        # behind; log the raw generator too so short runs show
                        # the true convergence trend
                        rec_raw, psnr_raw = rec_eval(state.gen, eval_batch)
                        scalars["rec_psnr_raw"] = float(psnr_raw)
                    logger.log_scalars(scalars, it, prefix="qvid_eval/")
                    # snapshots need the eval outputs, so the cadence rides
                    # the eval grid: every round(snapshot_every/eval_every)-th
                    # eval (exact when the two align, e.g. 100/25; a
                    # non-multiple snapshot_every no longer silently never
                    # fires)
                    if snapshot_every and (eval_count - 1) % max(
                            1, round(snapshot_every / eval_every)) == 0:
                        _save_snapshot(os.path.join(log_path, "snapshots"), it,
                                       np.asarray(eval_batch[:8]), np.asarray(rec[:8]))
                        if rec_raw is not None:
                            _save_snapshot(os.path.join(log_path, "snapshots"), it,
                                           np.asarray(eval_batch[:8]),
                                           np.asarray(rec_raw[:8]), tag="rec_raw")
                if it % cfg.save_latest_freq == 0 and it > start:
                    ckpt.save("qvid", it, state, latest=True)
                if cfg.save_freq > 0 and it % cfg.save_freq == 0 and it > start:
                    ckpt.save("qvid", it, state)
                if guard.sync_triggered():
                    # step boundary: state.step is already it+1, so --resume
                    # continues exactly where the preempted run stopped
                    ckpt.save("qvid", it + 1, state, latest=True)
                    print(f"[preemption] latest checkpoint written at iter "
                          f"{it + 1}; exiting cleanly", flush=True)
                    preempted = True
                    break
        if not preempted:
            ckpt.save("qvid", n_iter, state, latest=True)
        self.preempted = preempted  # callers/CLI: exit 75 on preemption
        ckpt.wait()
        logger.close()
        return state


def _save_snapshot(path, it, real, rec, tag="rec"):
    """PNG grid: top row real, bottom row reconstruction."""
    from PIL import Image

    os.makedirs(path, exist_ok=True)
    grid = np.concatenate([np.concatenate(list(x), axis=1) for x in (real, rec)],
                          axis=0)
    u8 = np.clip((grid + 1) * 127.5, 0, 255).astype(np.uint8)
    Image.fromarray(u8).save(os.path.join(path, f"{tag}_{it:06d}.png"))


def cycle_loader(loader):
    while True:
        yield from loader


def to_device(batch, mesh=None):
    """Host batch -> device. With a mesh, shards batch-leading arrays over
    the 'data' axis (see ``parallel.mesh.put_batch``)."""
    if mesh is not None:
        from ccvs_tpu.parallel.mesh import put_batch

        return put_batch(mesh, batch)
    return {k: jnp.asarray(v) for k, v in batch.items()}
