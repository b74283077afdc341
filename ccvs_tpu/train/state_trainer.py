"""State-estimator and STFT-autoencoder training drivers.

Ports of `helpers/state_estimator_trainer.py` and
`helpers/stft_autoencoder_trainer.py`: regression/reconstruction training on
top of the frozen autoencoder, with periodic online evaluation and
best-checkpoint tracking.
"""

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from ccvs_tpu.config import Config
from ccvs_tpu.data import PrefetchLoader, create_dataset
from ccvs_tpu.models.autoencoder import FrameAutoencoder
from ccvs_tpu.models.state_model import StateModel
from ccvs_tpu.models.stft_model import StftModel
from ccvs_tpu.train.ae_trainer import cycle_loader, to_device
from ccvs_tpu.train.states import make_adam
from ccvs_tpu.train.steps import make_simple_step
from ccvs_tpu.utils.checkpoint import CheckpointManager
from ccvs_tpu.utils.logging import Logger
from ccvs_tpu.utils.preemption import PreemptionGuard


class StateEstimatorTrainer:
    """`helpers/state_estimator_trainer.py:19-167`."""

    def __init__(self, cfg: Config, ae_params, dtype=jnp.float32, mesh=None):
        from ccvs_tpu.parallel.mesh import make_mesh

        self.cfg = cfg
        self.mesh = mesh if mesh is not None else make_mesh()
        self.ae = FrameAutoencoder(cfg.ae, dtype=dtype)
        self.ae_params = ae_params
        self.model = StateModel(cfg.state)
        self._encode = jax.jit(self.ae.encode)

        def loss_fn(params, batch):
            enc = self._encode(self.ae_params, batch["img"])
            z = self.ae.embed_code(self.ae_params, enc["code"])
            return self.model.loss(params, jax.lax.stop_gradient(z), batch["state"])

        opt = make_adam(cfg.state.lr, cfg.state.beta1, cfg.state.beta2,
                        cfg.state.weight_decay)
        self.init_state, self.step = make_simple_step(loss_fn, opt)
        self.loss_fn = loss_fn

    def evaluate(self, params, loader, max_batches=8):
        errs = []
        for i, batch in enumerate(loader):
            if i >= max_batches:
                break
            b = to_device(batch)
            enc = self._encode(self.ae_params, b["img"])
            z = self.ae.embed_code(self.ae_params, enc["code"])
            pred = self.model.estimate(params, z)
            errs.append(float(jnp.mean((pred - b["state"]) ** 2)))
        return float(np.mean(errs)) if errs else float("inf")

    def run(self, n_iter=None, resume=False):
        cfg = self.cfg
        n_iter = n_iter or cfg.n_iter
        ckpt = CheckpointManager(os.path.join(cfg.save_path, "checkpoints", cfg.name),
                         async_save=cfg.async_ckpt)
        logger = Logger(os.path.join(cfg.save_path, "logs", cfg.name))
        key = jax.random.PRNGKey(cfg.seed)
        params = self.model.init(key)
        state = self.init_state(params)
        start = 0
        if resume:
            state = ckpt.load("state", "latest", target=state)
            start = int(state.step)
        from ccvs_tpu.parallel.mesh import replicate_tree

        state = replicate_tree(self.mesh, state)
        self.ae_params = replicate_tree(self.mesh, self.ae_params)

        train_ds = create_dataset(cfg.data, phase="train", load_vid=False)
        valid_ds = create_dataset(cfg.data, phase="valid", load_vid=False)
        loader = PrefetchLoader(train_ds, cfg.data.batch_size_img,
                                num_workers=cfg.data.num_workers)
        vloader = PrefetchLoader(valid_ds, cfg.data.batch_size_img, shuffle=False,
                                 num_workers=cfg.data.num_workers)
        it_data = iter(cycle_loader(loader))
        best = ckpt.best_metric("state") if resume else float("inf")
        preempted = False
        with PreemptionGuard() as guard:
            for it in range(start, n_iter):
                state, m = self.step(state, to_device(next(it_data), self.mesh))
                logger.log_scalars(m, it, prefix="state/")
                if cfg.n_iter_eval and it % cfg.n_iter_eval == 0 and it > 0:
                    err = self.evaluate(state.params, vloader)
                    logger.log_scalar("state/eval_mse", err, it)
                    if err < best:
                        best = err
                        ckpt.save("state", it, state, best=True)
                        ckpt.record_best("state", it, err)
                if it % cfg.save_latest_freq == 0 and it > 0:
                    ckpt.save("state", it, state, latest=True)
                if guard.sync_triggered():
                    ckpt.save("state", it + 1, state, latest=True)
                    preempted = True
                    break
        if not preempted:
            ckpt.save("state", n_iter, state, latest=True)
        self.preempted = preempted  # callers/CLI: exit 75 on preemption
        ckpt.wait()
        logger.close()
        return state


class StftAutoencoderTrainer:
    """`helpers/stft_autoencoder_trainer.py:17-151`."""

    def __init__(self, cfg: Config, dtype=jnp.float32, mesh=None, vgg_npz=None):
        from ccvs_tpu.parallel.mesh import make_mesh
        from ccvs_tpu.nn import vgg as vgg_mod

        self.cfg = cfg
        self.mesh = mesh if mesh is not None else make_mesh()
        self.model = StftModel(cfg.stft)
        # reference stft recon loss is MSE + VGG (`stft_model.py:84-110`)
        if vgg_mod.check_npz(vgg_npz):
            # auto-detect the backbone (vgg19 from export_vgg, vgg16 from
            # export_lpips) instead of pinning vgg19
            vgg_params = vgg_mod.load_vgg_npz(vgg_npz)[0]
        else:
            vgg_mod.warn_fallback("the STFT perceptual loss")
            vgg_params = vgg_mod.init_random(jax.random.PRNGKey(cfg.seed))
        vgg_fn = lambda a, b: vgg_mod.vgg_loss(vgg_params, a, b)  # noqa: E731

        def loss_fn(params, batch):
            stft = batch["stft"].reshape(-1, 64, 16, 1)
            return self.model.loss(params, stft, vgg_fn=vgg_fn)

        opt = make_adam(cfg.stft.lr, cfg.stft.beta1, cfg.stft.beta2,
                        cfg.stft.weight_decay)
        self.init_state, self.step = make_simple_step(loss_fn, opt)
        self.loss_fn = loss_fn

    def run(self, n_iter=None, resume=False):
        cfg = self.cfg
        n_iter = n_iter or cfg.n_iter
        ckpt = CheckpointManager(os.path.join(cfg.save_path, "checkpoints", cfg.name),
                         async_save=cfg.async_ckpt)
        logger = Logger(os.path.join(cfg.save_path, "logs", cfg.name))
        params = self.model.init(jax.random.PRNGKey(cfg.seed))
        state = self.init_state(params)
        start = 0
        if resume:
            state = ckpt.load("stft", "latest", target=state)
            start = int(state.step)
        from ccvs_tpu.parallel.mesh import replicate_tree

        state = replicate_tree(self.mesh, state)
        # vid-type batches may come from a second dataset (reference
        # --use_extra_dataset, `helpers/stft_autoencoder_trainer.py:67`)
        vid_src = cfg.extra_data if cfg.extra_data is not None else cfg.data
        ds = create_dataset(vid_src, phase="train", load_vid=True)
        loader = PrefetchLoader(ds, vid_src.batch_size_vid,
                                num_workers=vid_src.num_workers)
        it_data = iter(cycle_loader(loader))
        best = ckpt.best_metric("stft") if resume else float("inf")
        preempted = False
        with PreemptionGuard() as guard:
            for it in range(start, n_iter):
                state, m = self.step(state, to_device(next(it_data), self.mesh))
                logger.log_scalars(m, it, prefix="stft/")
                if cfg.n_iter_eval and it % cfg.n_iter_eval == 0 and it > 0:
                    mse = float(m["stft_mse"])
                    if mse < best:
                        best = mse
                        ckpt.save("stft", it, state, best=True)
                        ckpt.record_best("stft", it, mse)
                if it % cfg.save_latest_freq == 0 and it > 0:
                    ckpt.save("stft", it, state, latest=True)
                if guard.sync_triggered():
                    ckpt.save("stft", it + 1, state, latest=True)
                    preempted = True
                    break
        if not preempted:
            ckpt.save("stft", n_iter, state, latest=True)
        self.preempted = preempted  # callers/CLI: exit 75 on preemption
        ckpt.wait()
        logger.close()
        return state
