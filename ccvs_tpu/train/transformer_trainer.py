"""Latent-transformer training driver.

Port of `helpers/transformer_trainer.py`: freezes the autoencoder
(+state/stft models), encodes each video batch to tokens, assembles the
conditioning (state / stft / p2p / class / deblurring), and runs AdamW steps
with warmup(+cosine) LR on the GPT.
"""

import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from scipy.ndimage import gaussian_filter

from ccvs_tpu.config import Config
from ccvs_tpu.data import PrefetchLoader, create_dataset
from ccvs_tpu.models.autoencoder import FrameAutoencoder
from ccvs_tpu.models.state_model import StateModel
from ccvs_tpu.models.stft_model import StftModel
from ccvs_tpu.models.transformer import TokenTransformer
from ccvs_tpu.train.ae_trainer import cycle_loader, to_device
from ccvs_tpu.train.steps import make_transformer_step
from ccvs_tpu.utils.checkpoint import CheckpointManager
from ccvs_tpu.utils.logging import Logger


def blur_video(vid: np.ndarray, sigma: float) -> np.ndarray:
    """Gaussian blur per frame (`helpers/generator.py:381-390`)."""
    out = np.empty_like(vid)
    for i in range(vid.shape[0]):
        for t in range(vid.shape[1]):
            for c in range(3):
                out[i, t, :, :, c] = gaussian_filter(vid[i, t, :, :, c], sigma, truncate=1.5)
    return out


class TransformerTrainer:
    """Trains data-parallel over a ('data', 'model') mesh (see
    ``FrameAutoencoderTrainer``); with ``model_parallel > 1`` in the mesh the
    GPT params additionally get Megatron-style head/MLP sharding
    (``parallel.tp``) while the frozen AE stays replicated."""

    def __init__(self, cfg: Config, ae_params, state_params=None, stft_params=None,
                 dtype=jnp.bfloat16, mesh=None):
        from ccvs_tpu.parallel.mesh import make_mesh

        self.cfg = cfg
        self.mesh = mesh if mesh is not None else make_mesh()
        self.ae = FrameAutoencoder(cfg.ae, dtype=dtype)
        self.ae_params = ae_params
        self.transformer = TokenTransformer(cfg.gpt, dtype=dtype)
        self.state_model = StateModel(cfg.state) if cfg.gpt.state and not cfg.gpt.stft else None
        self.state_params = state_params
        self.stft_model = StftModel(cfg.stft) if cfg.gpt.stft else None
        self.stft_params = stft_params
        self.init_state, self.step = make_transformer_step(
            self.transformer, cfg.gpt, cfg.n_iter
        )
        self._encode = jax.jit(self.ae.encode)

    def encode_batch(self, batch) -> dict:
        """Video batch -> token batch with conditioning
        (`helpers/transformer_trainer.py:56-81`)."""
        cfg = self.cfg
        gcfg = cfg.gpt
        vid = batch["vid"]
        b = vid.shape[0]
        enc = self._encode(self.ae_params, vid)
        code = enc["code"].reshape(b, -1)
        out = {"code": code}
        if self.state_model is not None:
            z = self.ae.embed_code(self.ae_params, enc["code"])
            out["state_code"] = self.state_model.encode(self.state_params, z=z)
        if self.stft_model is not None and "stft" in batch:
            out["state_code"] = self.stft_model.encode(self.stft_params, batch["stft"])
        if gcfg.layout and "layout" in batch:
            # layout tokens are the control stream: the reference's
            # `vid_encoder` returns the layout-twin quantizer indices as
            # state_code (`quantized_video_model.py:801-819`)
            if not hasattr(self, "_encode_layout"):
                self._encode_layout = jax.jit(self.ae.encode_layout)
            lenc = self._encode_layout(self.ae_params, batch["layout"])
            out["state_code"] = lenc["code"].reshape(b, -1)
        if gcfg.p2p:
            out["cond_code"] = code[:, -gcfg.z_chunk :]
            out["code"] = code[:, : -gcfg.z_chunk]
            out["delta"] = batch["delta_length"]
        if gcfg.cat:
            out["vid_lbl"] = batch.get(
                "vid_lbl",
                jnp.zeros((b,), jnp.int32),
            )
        if gcfg.deblurring:
            blurred = blur_video(np.asarray(vid), gcfg.blur_sigma)
            benc = self._encode(self.ae_params, jnp.asarray(blurred))
            out["state_code"] = benc["code"].reshape(b, -1)
        return out

    def run(self, n_iter=None, resume=False, serialize_steps=False):
        """``serialize_steps``: force a tiny device->host transfer after each
        jitted step (as in ``FrameAutoencoderTrainer.run``). Without it the
        loop is fully async on this backend, so metrics.jsonl ``t`` stamps
        are ENQUEUE times, not step times (ADVICE r4), and a preemption save
        can land many enqueued-but-unexecuted steps ahead of the log."""
        cfg = self.cfg
        n_iter = n_iter or cfg.n_iter
        mirror = None
        if cfg.npz_mirror:
            # merge `gpt` into the same committable npz the frame-AE trainer
            # seeded with `ae_gen` — one kill-proof single-file artifact for
            # the whole chain (VERDICT r4 item 2)
            mirror = (cfg.npz_mirror, lambda tstate: {"gpt": tstate.params})
        ckpt = CheckpointManager(os.path.join(cfg.save_path, "checkpoints", cfg.name),
                         async_save=cfg.async_ckpt, npz_mirror=mirror)
        os.makedirs(os.path.join(cfg.save_path, "checkpoints", cfg.name), exist_ok=True)
        with open(os.path.join(cfg.save_path, "checkpoints", cfg.name, "config.json"), "w") as f:
            f.write(cfg.to_json())
        logger = Logger(os.path.join(cfg.save_path, "logs", cfg.name),
                        imagenet_norm=cfg.data.imagenet_norm)

        key = jax.random.PRNGKey(cfg.seed)
        params = jax.jit(lambda k: self.transformer.init(k, batch=1))(key)
        tstate = self.init_state(params)
        start = 0
        if resume:
            tstate = ckpt.load("transformer", "latest", target=tstate)
            start = int(tstate.step)
        from ccvs_tpu.parallel.mesh import replicate_tree
        from ccvs_tpu.parallel.tp import shard_gpt_params

        tp_on = self.mesh.shape.get("model", 1) > 1
        if cfg.gpt.fsdp:
            # ZeRO-3 via GSPMD: split params + moments over 'data' (composed
            # with the tp specs when model > 1 — parallel/fsdp.py). The host
            # state is device_put straight into the sharded layout — no
            # replicate-first step, so peak per-device HBM at init is the
            # SHARD size, which is the point of FSDP. The step is re-jitted
            # with pinned output shardings so the updated state STAYS split
            # (propagation alone may legally replicate it).
            from ccvs_tpu.parallel.fsdp import shard_fsdp
            from ccvs_tpu.parallel.mesh import replicate
            from ccvs_tpu.parallel.tp import gpt_param_specs

            tstate = tstate.replace(
                step=jax.device_put(tstate.step, replicate(self.mesh)),
                params=shard_fsdp(self.mesh, tstate.params,
                                  base_specs=gpt_param_specs(tstate.params) if tp_on else None),
                opt=shard_fsdp(self.mesh, tstate.opt,
                               base_specs=gpt_param_specs(tstate.opt) if tp_on else None),
            )
            shardings = jax.tree_util.tree_map(lambda x: x.sharding, tstate)
            _, self.step = make_transformer_step(
                self.transformer, cfg.gpt, cfg.n_iter, state_shardings=shardings)
        else:
            tstate = replicate_tree(self.mesh, tstate)
            if tp_on:
                # Megatron head/MLP sharding; the adam moments nest the same
                # param dict, so the same path-keyed specs shard them
                # identically.
                tstate = tstate.replace(
                    params=shard_gpt_params(self.mesh, tstate.params),
                    opt=shard_gpt_params(self.mesh, tstate.opt),
                )
        self.ae_params = replicate_tree(self.mesh, self.ae_params)

        ds = create_dataset(cfg.data, phase="train", load_vid=True)
        loader = PrefetchLoader(ds, cfg.data.batch_size_vid,
                                num_workers=cfg.data.num_workers, seed=cfg.seed)
        it_data = iter(cycle_loader(loader))

        from ccvs_tpu.utils.preemption import PreemptionGuard

        t0 = time.time()
        preempted = False
        with PreemptionGuard() as guard:
            for it in range(start, n_iter):
                batch = to_device(next(it_data), self.mesh)
                tokens = self.encode_batch(batch)
                tokens = to_device(tokens, self.mesh)
                if cfg.gpt.seq_parallel:
                    # bare-PartitionSpec constraints (parallel/sp.py) resolve
                    # against the physical mesh context at trace time
                    with self.mesh:
                        tstate, metrics = self.step(tstate, tokens)
                else:
                    tstate, metrics = self.step(tstate, tokens)
                if serialize_steps:
                    np.asarray(metrics["nll"]).reshape(-1)[:1]
                logger.log_scalars(metrics, it, prefix="transformer/")
                if cfg.log_freq and it % cfg.log_freq == 0:
                    el = time.time() - t0
                    print(f"iter {it}: nll={float(metrics['nll']):.4f} "
                          f"({el / max(1, it - start + 1):.2f}s/it)")
                if it % cfg.save_latest_freq == 0 and it > start:
                    ckpt.save("transformer", it, tstate, latest=True)
                if guard.sync_triggered():
                    ckpt.save("transformer", it + 1, tstate, latest=True)
                    print(f"[preemption] latest checkpoint written at iter "
                          f"{it + 1}; exiting cleanly", flush=True)
                    preempted = True
                    break
        if not preempted:
            ckpt.save("transformer", n_iter, tstate, latest=True)
        self.preempted = preempted  # callers/CLI: exit 75 on preemption
        ckpt.wait()
        logger.close()
        return tstate
