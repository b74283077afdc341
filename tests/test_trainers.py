"""Integration tests: trainer drivers end-to-end on synthetic data."""

import dataclasses
import os
import tempfile

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from ccvs_tpu.config import (
    AutoencoderConfig,
    Config,
    DataConfig,
    StateConfig,
    StftConfig,
    TransformerConfig,
)

TINY_AE = AutoencoderConfig(
    necf=8, necf_mult=(1, 2), ndcf=8, ndcf_mult=(1, 2),
    z_size=16, z_num=32, z_shape=(8, 8), max_dim=16,
    inter_p=0.5, skip_memory=2, skip_context=(1, 2),
    use_di=True, use_dv=True, use_vgg_img=False, use_vgg_vid=False,
    use_direct_recovery_img=True, use_direct_recovery_vid=True,
    slide_inter=True, n_consecutive_img=2, vid_len=3,
    load_elastic_view=True, elastic_corruption=True,
    use_elastic_flow_recovery=True, d_reg_every=2, stddev_group=2,
)
TINY_GPT = TransformerConfig(
    z_num=32, z_len=128, z_chunk=64, num_blocks=2, cond_len=64,
    n_layer=2, n_head=2, n_embd=32, z_shape=(8, 8), emb_mode="temporal",
)
TINY_DATA = DataConfig(
    dataset="synthetic", max_dim=16, true_dim=32, vid_len=3,
    batch_size_img=6, batch_size_vid=2, n_consecutive_img=2, img_out_of_n=8,
    load_elastic_view=True, elastic_corruption=True, elastic_alpha=1.0,
    elastic_sigma=0.2, distort_first=True, num_workers=2, load_vid_len=8,
)


def _cfg(tmp):
    return Config(
        name="tiny", save_path=tmp, data=TINY_DATA, ae=TINY_AE, gpt=TINY_GPT,
        n_iter=3, save_latest_freq=2, log_freq=2,
    )


def test_ae_trainer_runs(tmp_path):
    from ccvs_tpu.train.ae_trainer import FrameAutoencoderTrainer

    cfg = _cfg(str(tmp_path))
    tr = FrameAutoencoderTrainer(cfg, dtype=jnp.float32)
    state = tr.run(n_iter=3, eval_every=2, snapshot_every=2)
    assert int(state.step) == 3
    # checkpoint written and reloadable
    from ccvs_tpu.utils.checkpoint import CheckpointManager

    ckpt = CheckpointManager(os.path.join(str(tmp_path), "checkpoints", "tiny"))
    restored = ckpt.load("qvid", "latest", target=state)
    assert int(restored.step) == 3
    # held-out eval logs both the EMA and the raw-generator rec-PSNR (the
    # 0.999 EMA lags far behind on short runs) and writes both snapshots
    import json

    lines = [json.loads(l) for l in
             open(os.path.join(str(tmp_path), "logs", "tiny", "metrics.jsonl"))]
    keys = {k for d in lines for k in d}
    assert "qvid_eval/rec_psnr" in keys and "qvid_eval/rec_psnr_raw" in keys
    snaps = os.listdir(os.path.join(str(tmp_path), "logs", "tiny", "snapshots"))
    assert any(s.startswith("rec_0") for s in snaps)
    assert any(s.startswith("rec_raw_") for s in snaps)


def test_transformer_trainer_runs(tmp_path):
    from ccvs_tpu.models import FrameAutoencoder
    from ccvs_tpu.train.transformer_trainer import TransformerTrainer

    cfg = _cfg(str(tmp_path))
    cfg = cfg.replace(data=dataclasses.replace(cfg.data, vid_len=2, load_vid_len=None))
    ae = FrameAutoencoder(cfg.ae, dtype=jnp.float32)
    ae_params = ae.init(jax.random.PRNGKey(0))
    tr = TransformerTrainer(cfg, ae_params, dtype=jnp.float32)
    state = tr.run(n_iter=2)
    assert int(state.step) == 2


def test_ae_trainer_extra_dataset_vid_loader(tmp_path):
    """Config.extra_data routes the trainer's VIDEO batches to a second
    dataset while image batches keep cfg.data (reference --use_extra_dataset
    + xb_ opts, `helpers/frame_autoencoder_trainer.py:84`)."""
    import dataclasses

    from ccvs_tpu.train.ae_trainer import FrameAutoencoderTrainer

    cfg = _cfg(str(tmp_path))
    extra = dataclasses.replace(cfg.data, batch_size_vid=1)
    cfg = cfg.replace(extra_data=extra)
    tr = FrameAutoencoderTrainer(cfg, dtype=jnp.float32)
    img_loader, vid_loader = tr.make_loaders()
    assert vid_loader is not None
    vb = next(iter(vid_loader))
    assert vb["vid"].shape[0] == 1  # extra dataset's batch_size_vid, not data's
    # config JSON round-trips the nested optional group
    cfg2 = Config.from_json(cfg.to_json())
    assert cfg2.extra_data is not None
    assert cfg2.extra_data.batch_size_vid == 1
    cfg3 = Config.from_json(_cfg(str(tmp_path)).to_json())
    assert cfg3.extra_data is None
