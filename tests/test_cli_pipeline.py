"""End-to-end CLI pipeline + state/stft trainer coverage.

Drives the actual command-line entry points through the full reference
workflow on synthetic data: train the frame AE, train the transformer on the
frozen AE, synthesize videos to disk, then score them with the offline
metrics CLI (`scripts/*/*.sh` reduced to toy sizes via --load-config).
"""

import dataclasses
import json
import os

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
    use_di=True, use_dv=False, use_vgg_img=False, use_vgg_vid=False,
    use_direct_recovery_img=True, slide_inter=True, n_consecutive_img=2,
    vid_len=2, d_reg_every=2, stddev_group=2,
)
TINY_GPT = TransformerConfig(
    z_num=32, z_len=128, z_chunk=64, num_blocks=2, cond_len=64,
    n_layer=2, n_head=2, n_embd=32, z_shape=(8, 8), emb_mode="temporal",
)
TINY_DATA = DataConfig(
    dataset="synthetic", max_dim=16, true_dim=32, vid_len=2,
    batch_size_img=4, batch_size_vid=2, n_consecutive_img=2, img_out_of_n=8,
    num_workers=1,
)


def test_cli_full_pipeline(tmp_path, capsys):
    from ccvs_tpu import cli

    cfg = Config(
        name="clitiny", save_path=str(tmp_path), data=TINY_DATA, ae=TINY_AE,
        gpt=TINY_GPT, n_iter=2, save_latest_freq=100, log_freq=0,
    )
    cfg_path = tmp_path / "config.json"
    cfg_path.write_text(cfg.to_json())

    # 1. train the frame autoencoder
    cli.main(["train-ae", "--load-config", str(cfg_path),
              "--save-path", str(tmp_path), "--n-iter", "2"])
    ae_ckpt = tmp_path / "checkpoints" / "clitiny"
    assert ae_ckpt.is_dir()

    # 2. train the transformer on the frozen AE
    cli.main(["train-transformer", "--load-config", str(cfg_path),
              "--save-path", str(tmp_path), "--n-iter", "2",
              "--ae-ckpt", str(ae_ckpt)])

    # 3. synthesize one batch of videos to disk
    cli.main(["generate", "--load-config", str(cfg_path),
              "--save-path", str(tmp_path), "--n-batches", "1",
              "--ae-ckpt", str(ae_ckpt), "--gpt-ckpt", str(ae_ckpt)])
    results = tmp_path / "results" / "clitiny"
    real_dir, fake_dir = results / "real", results / "fake"
    assert len(list(real_dir.glob("*.avi"))) == TINY_DATA.batch_size_vid
    assert len(list(fake_dir.glob("*.avi"))) == TINY_DATA.batch_size_vid
    assert (results / "rec").is_dir()

    # 3b. data-parallel generation: batch sharded over a 2-device mesh,
    #     params replicated (reference DDP save_videos analog)
    cli.main(["generate", "--load-config", str(cfg_path),
              "--save-path", str(tmp_path), "--name", "clitinydp2",
              "--n-batches", "1", "--n-devices", "2",
              "--ae-ckpt", str(ae_ckpt), "--gpt-ckpt", str(ae_ckpt)])
    dp2 = tmp_path / "results" / "clitinydp2"
    assert len(list((dp2 / "fake").glob("*.avi"))) == TINY_DATA.batch_size_vid
    assert len(list((dp2 / "real").glob("*.avi"))) == TINY_DATA.batch_size_vid

    # 4. offline metrics over the written videos
    capsys.readouterr()
    cli.main(["eval-metrics", "--real", str(real_dir), "--fake", str(fake_dir)])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert "psnr" in out and np.isfinite(out["psnr"])

    # 5. FVD CLI over the same videos (fallback embedder; relative value)
    cli.main(["eval-fvd", "--real", str(real_dir), "--fake", str(fake_dir),
              "--chunk", "2"])
    fvd_out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert "fvd_uncalibrated" in fvd_out and np.isfinite(fvd_out["fvd_uncalibrated"])

    # 6. quantized serving path through the CLI (full AR generation)
    cli.main(["generate", "--load-config", str(cfg_path),
              "--save-path", str(tmp_path), "--name", "clitiny8",
              "--n-batches", "1", "--serve-int8",
              "--ae-ckpt", str(ae_ckpt), "--gpt-ckpt", str(ae_ckpt)])
    assert (tmp_path / "results" / "clitiny8" / "fake").is_dir()

    # 7. --rec-only skips the AR generation entirely (reference --rec_only);
    #    --ae-raw selects the raw generator weights over the EMA copy
    #    (short runs: the 0.999-decay EMA is still mostly init)
    cli.main(["generate", "--load-config", str(cfg_path),
              "--save-path", str(tmp_path), "--name", "clitinyrec",
              "--n-batches", "1", "--rec-only", "--ae-raw",
              "--ae-ckpt", str(ae_ckpt), "--gpt-ckpt", str(ae_ckpt)])
    recres = tmp_path / "results" / "clitinyrec"
    assert (recres / "rec").is_dir()
    assert not (recres / "fake").exists()

    # 8. --step-by-step: per-frame chunk generation + code correction
    #    (reference --step_by_step, generator.py:132-159)
    cli.main(["generate", "--load-config", str(cfg_path),
              "--save-path", str(tmp_path), "--name", "clitinystep",
              "--n-batches", "1", "--step-by-step",
              "--ae-ckpt", str(ae_ckpt), "--gpt-ckpt", str(ae_ckpt)])
    stepres = tmp_path / "results" / "clitinystep"
    assert len(list((stepres / "fake").glob("*.avi"))) == TINY_DATA.batch_size_vid

    # 9. --gen-from-img: 1-frame context, no reconstruction
    #    (reference --gen_from_img, generator.py:172,278-279)
    cli.main(["generate", "--load-config", str(cfg_path),
              "--save-path", str(tmp_path), "--name", "clitinyimg",
              "--n-batches", "1", "--gen-from-img", "--down-size", "8",
              "--ae-ckpt", str(ae_ckpt), "--gpt-ckpt", str(ae_ckpt)])
    imgres = tmp_path / "results" / "clitinyimg"
    assert (imgres / "fake").is_dir()
    assert not (imgres / "rec").exists()


def test_cli_layout_pipeline(tmp_path):
    """Layout twins end-to-end through the CLI: train the AE with layout
    losses, then layout-conditioned generation writing colormapped
    real/fake/rec layout videos (reference --q_use_layout + --x_layout,
    `helpers/generator.py:107-118,225-230`)."""
    from ccvs_tpu import cli

    ae = dataclasses.replace(
        TINY_AE, use_layout=True, layout_size=3, same_decoder_layout=True)
    gpt = TransformerConfig(
        z_num=32, z_len=256, z_chunk=128, num_blocks=2, cond_len=64,
        n_layer=2, n_head=2, n_embd=32, z_shape=(8, 8), emb_mode="temporal",
        layout=True, state_num=32, state_size=64, top_k=5,
        sample_state=True, top_k_state=5,
    )
    data = dataclasses.replace(TINY_DATA, load_layout=True)
    cfg = Config(
        name="clilay", save_path=str(tmp_path), data=data, ae=ae,
        gpt=gpt, n_iter=2, save_latest_freq=100, log_freq=0,
    )
    cfg_path = tmp_path / "config.json"
    cfg_path.write_text(cfg.to_json())

    cli.main(["train-ae", "--load-config", str(cfg_path),
              "--save-path", str(tmp_path), "--n-iter", "2"])
    ae_ckpt = tmp_path / "checkpoints" / "clilay"
    cli.main(["train-transformer", "--load-config", str(cfg_path),
              "--save-path", str(tmp_path), "--n-iter", "2",
              "--ae-ckpt", str(ae_ckpt)])
    cli.main(["generate", "--load-config", str(cfg_path),
              "--save-path", str(tmp_path), "--n-batches", "1",
              "--ae-ckpt", str(ae_ckpt), "--gpt-ckpt", str(ae_ckpt)])
    results = tmp_path / "results" / "clilay"
    for d in ("real", "fake", "rec", "real_layout", "fake_layout", "rec_layout"):
        assert len(list((results / d).glob("*.avi"))) == data.batch_size_vid, d


def test_state_trainer_runs(tmp_path):
    from ccvs_tpu.models import FrameAutoencoder
    from ccvs_tpu.train.state_trainer import StateEstimatorTrainer

    data = dataclasses.replace(
        TINY_DATA, n_consecutive_img=1, load_state=True, batch_size_img=4,
        no_h_flip=True, no_v_flip=True,
    )
    cfg = Config(
        name="statetiny", save_path=str(tmp_path), data=data, ae=TINY_AE,
        state=StateConfig(z_size=TINY_AE.z_size, z_shape=TINY_AE.z_shape,
                          state_hsize=16, state_size=2, state_num=16),
        n_iter=2, save_latest_freq=100, log_freq=0, n_iter_eval=None,
    )
    ae = FrameAutoencoder(cfg.ae, dtype=jnp.float32)
    ae_params = ae.init(jax.random.PRNGKey(0))
    tr = StateEstimatorTrainer(cfg, ae_params)
    state = tr.run(n_iter=2)
    assert int(state.step) == 2
    assert np.all(np.isfinite(np.asarray(
        jax.tree_util.tree_leaves(state.params)[0], np.float32)))


def test_stft_trainer_step(rng):
    from ccvs_tpu.train.state_trainer import StftAutoencoderTrainer

    cfg = Config(
        data=TINY_DATA, ae=TINY_AE,
        stft=StftConfig(stft_size=16, stft_shape=(8, 2), stft_num=32),
    )
    tr = StftAutoencoderTrainer(cfg, dtype=jnp.float32)
    params = tr.model.init(jax.random.PRNGKey(0))
    state = tr.init_state(params)
    batch = {"stft": jnp.asarray(rng.randn(2, 3, 64, 16, 1).astype(np.float32))}
    state, m = tr.step(state, batch)
    assert np.isfinite(float(m["stft_mse"]))
    assert int(state.step) == 1
