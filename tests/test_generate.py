"""End-to-end generation pipeline tests on a tiny config (CPU)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from ccvs_tpu.config import (
    AutoencoderConfig,
    Config,
    DataConfig,
    StateConfig,
    TransformerConfig,
)
from ccvs_tpu.generate import VideoGenerator
from ccvs_tpu.models import FrameAutoencoder, StateModel, TokenTransformer
from ccvs_tpu.utils import video_io

AE = AutoencoderConfig(
    necf=8, necf_mult=(1, 2), ndcf=8, ndcf_mult=(1, 2),
    z_size=16, z_num=32, z_shape=(4, 4), max_dim=8,
    inter_p=0.5, skip_memory=3, skip_context=(1, 2, 3),
)
GPTC = TransformerConfig(
    z_num=32, z_len=64, z_chunk=16, num_blocks=4, cond_len=16,
    n_layer=2, n_head=2, n_embd=32, z_shape=(4, 4), emb_mode="temporal", top_k=5,
)


def _models():
    ae = FrameAutoencoder(AE, dtype=jnp.float32)
    tr = TokenTransformer(GPTC, dtype=jnp.float32)
    key = jax.random.PRNGKey(0)
    params = {"ae": ae.init(key), "gpt": tr.init(key, batch=2)}
    return ae, tr, params


def test_encode_decode_video_roundtrip(rng):
    ae, tr, params = _models()
    vid = jnp.asarray(rng.randn(2, 4, 8, 8, 3).astype(np.float32)) * 0.1
    enc = ae.encode(params["ae"], vid)
    assert enc["code"].shape == (2, 4, 16)
    out = ae.decode_video(params["ae"], enc["code"], ctx_frames=vid[:, :1], n_ctx=1)
    assert out.shape == (2, 4, 8, 8, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_generate_within_capacity(rng):
    ae, tr, params = _models()
    vid = jnp.asarray(rng.randn(2, 4, 8, 8, 3).astype(np.float32)) * 0.1
    gen = VideoGenerator(Config(ae=AE, gpt=GPTC), ae, tr)
    out = gen.generate(params, jax.random.PRNGKey(1), vid, rec=True)
    assert out["fake"].shape == (2, 4, 8, 8, 3)
    assert out["rec"].shape == (2, 4, 8, 8, 3)
    assert np.isfinite(np.asarray(out["fake"])).all()


def test_generate_sliding_window(rng):
    """6 frames x 16 tokens = 96 > z_len 64 -> sliding-window refills."""
    ae, tr, params = _models()
    vid = jnp.asarray(rng.randn(1, 6, 8, 8, 3).astype(np.float32)) * 0.1
    gen = VideoGenerator(Config(ae=AE, gpt=GPTC), ae, tr)
    out = gen.generate(params, jax.random.PRNGKey(1), vid, rec=False)
    assert out["fake"].shape == (1, 6, 8, 8, 3)
    assert np.isfinite(np.asarray(out["fake"])).all()


def test_generate_given_context_preserved(rng):
    """Context tokens must pass through generation unchanged."""
    ae, tr, params = _models()
    code = jnp.asarray(rng.randint(0, 32, (2, 16)))
    gen = tr.generate(params["gpt"], jax.random.PRNGKey(0), code, total_len=64)
    assert gen["code"].shape == (2, 64)
    np.testing.assert_array_equal(np.asarray(gen["code"][:, :16]), np.asarray(code))


def test_generate_with_state_interleave(rng):
    cfg = TransformerConfig(
        z_num=32, z_len=72, z_chunk=18, num_blocks=4, cond_len=16,
        n_layer=2, n_head=2, n_embd=32, z_shape=(4, 4), emb_mode="temporal",
        state=True, state_num=8, state_size=2, top_k=5, sample_state=True, top_k_state=3,
    )
    tr = TokenTransformer(cfg, dtype=jnp.float32)
    params = tr.init(jax.random.PRNGKey(0), batch=1)
    code = jnp.asarray(rng.randint(0, 32, (1, 16)))
    state = jnp.asarray(rng.randint(0, 8, (1, 2)))
    gen = tr.generate(params, jax.random.PRNGKey(1), code, state_code=state, total_len=72)
    assert gen["code"].shape == (1, 64)
    assert gen["state_code"].shape == (1, 8)
    np.testing.assert_array_equal(np.asarray(gen["state_code"][:, :2]), np.asarray(state))


def test_generate_p2p(rng):
    cfg = TransformerConfig(
        z_num=32, z_len=64, z_chunk=16, num_blocks=4, cond_len=16,
        n_layer=2, n_head=2, n_embd=32, z_shape=(4, 4), emb_mode="temporal",
        p2p=True, top_k=5,
    )
    tr = TokenTransformer(cfg, dtype=jnp.float32)
    code = jnp.asarray(rng.randint(0, 32, (1, 16)))
    cond = jnp.asarray(rng.randint(0, 32, (1, 16)))
    delta = jnp.asarray([3])
    params = tr.init(jax.random.PRNGKey(0), batch=1)
    gen = tr.generate(
        params, jax.random.PRNGKey(1), code, cond_code=cond, delta=delta,
        total_len=64,  # 48 body + 16 cond
    )
    assert gen["code"].shape == (1, 48)


def test_video_io_roundtrip(rng):
    # smooth gradient frames (JPEG-friendly, like real video content)
    ramp = np.linspace(0, 255, 32, dtype=np.uint8)
    frames = np.stack(
        [np.tile(ramp[None, :, None], (32, 1, 3)) + 10 * i for i in range(5)]
    ).clip(0, 255).astype(np.uint8)
    path = "/tmp/ccvs_test_vid.avi"
    video_io.write_video(path, frames, fps=4)
    back = video_io.read_video(path)
    assert back.shape == frames.shape
    assert np.abs(back.astype(int) - frames.astype(int)).mean() < 3


def test_generate_beam_search(rng):
    cfg = TransformerConfig(
        z_num=32, z_len=64, z_chunk=16, num_blocks=4, cond_len=16,
        n_layer=2, n_head=2, n_embd=32, z_shape=(4, 4), emb_mode="temporal",
        top_k=5, beam_size=3,
    )
    tr = TokenTransformer(cfg, dtype=jnp.float32)
    params = tr.init(jax.random.PRNGKey(0), batch=2)
    code = jnp.asarray(rng.randint(0, 32, (2, 16)))
    gen = tr.generate(params, jax.random.PRNGKey(1), code, total_len=64)
    assert gen["code"].shape == (2, 64)
    np.testing.assert_array_equal(np.asarray(gen["code"][:, :16]), np.asarray(code))

    # greedy (no-sample) beam with cache reordering
    import dataclasses
    cfg2 = dataclasses.replace(cfg, sample=False)
    tr2 = TokenTransformer(cfg2, dtype=jnp.float32)
    gen2 = tr2.generate(params, jax.random.PRNGKey(1), code, total_len=64)
    assert gen2["code"].shape == (2, 64)


def test_generate_step_by_step(rng):
    ae, tr, params = _models()
    vid = jnp.asarray(rng.randn(1, 4, 8, 8, 3).astype(np.float32)) * 0.1
    gen = VideoGenerator(Config(ae=AE, gpt=GPTC), ae, tr)
    out = gen.generate_step_by_step(params, jax.random.PRNGKey(1), vid)
    assert out["fake"].shape == (1, 4, 8, 8, 3)
    assert np.isfinite(np.asarray(out["fake"])).all()


def test_step_by_step_fixed_shape_equality(rng):
    """The fixed-shape step-by-step path must (a) produce the same video as
    the growing-shape path under the same rng and (b) trace exactly ONE
    transformer program across all frames, including past the sliding-window
    truncation (the growing path compiles a new program per frame below
    capacity)."""
    from ccvs_tpu.models.transformer import TokenTransformer

    ae, tr, params = _models()
    # 6 frames: 1 ctx + 5 generated; n = 16,32,48 then slides (keep=48)
    vid = jnp.asarray(rng.randn(1, 6, 8, 8, 3).astype(np.float32)) * 0.1
    gen = VideoGenerator(Config(ae=AE, gpt=GPTC), ae, tr)

    before = TokenTransformer._chunk_fill_jit._cache_size()
    out_fix = gen.generate_step_by_step(params, jax.random.PRNGKey(3), vid)
    after = TokenTransformer._chunk_fill_jit._cache_size()
    assert after - before == 1, "fixed-shape path must compile exactly once"

    out_ref = gen.generate_step_by_step(
        params, jax.random.PRNGKey(3), vid, fixed_shape=False)
    np.testing.assert_allclose(
        np.asarray(out_fix["fake"]), np.asarray(out_ref["fake"]),
        rtol=1e-5, atol=1e-5)


def test_generate_step_by_step_p2p(rng):
    """p2p in step mode (`generator.py:138-146`): end-frame cond tokens +
    extra decode context, window freeing repositions delta, real end frame
    closes the clip."""
    cfg = TransformerConfig(
        z_num=32, z_len=64, z_chunk=16, num_blocks=4, cond_len=16,
        n_layer=2, n_head=2, n_embd=32, z_shape=(4, 4), emb_mode="temporal",
        p2p=True, top_k=5,
    )
    ae = FrameAutoencoder(AE, dtype=jnp.float32)
    tr = TokenTransformer(cfg, dtype=jnp.float32)
    key = jax.random.PRNGKey(0)
    params = {"ae": ae.init(key), "gpt": tr.init(key, batch=1)}
    gen = VideoGenerator(Config(ae=AE, gpt=cfg), ae, tr)
    # 6 frames: 1 ctx + 4 generated + real end; keep = 64 - 32 = 32 tokens,
    # so the window frees (and delta repositions) during the run
    vid = jnp.asarray(rng.randn(1, 6, 8, 8, 3).astype(np.float32)) * 0.1
    out = gen.generate_step_by_step(params, jax.random.PRNGKey(1), vid)
    assert out["fake"].shape == (1, 6, 8, 8, 3)
    assert np.isfinite(np.asarray(out["fake"])).all()
    np.testing.assert_allclose(np.asarray(out["fake"][:, -1]), np.asarray(vid[:, -1]))


def test_generate_keep_state_and_custom(rng):
    from ccvs_tpu.generate import square_trajectory
    from ccvs_tpu.models import StateModel

    cfg = TransformerConfig(
        z_num=32, z_len=72, z_chunk=18, num_blocks=4, cond_len=16,
        n_layer=2, n_head=2, n_embd=32, z_shape=(4, 4), emb_mode="temporal",
        state=True, state_num=8, state_size=2, top_k=5,
    )
    sc = StateConfig(z_size=16, z_shape=(4, 4), state_hsize=8, state_size=2, state_num=8)
    ae = FrameAutoencoder(AE, dtype=jnp.float32)
    tr = TokenTransformer(cfg, dtype=jnp.float32)
    sm = StateModel(sc)
    key = jax.random.PRNGKey(0)
    params = {"ae": ae.init(key), "gpt": tr.init(key, batch=1), "state": sm.init(key)}
    gen = VideoGenerator(Config(ae=AE, gpt=cfg, state=sc), ae, tr, state_model=sm)
    vid = jnp.asarray(rng.randn(1, 4, 8, 8, 3).astype(np.float32)) * 0.1

    out = gen.generate(params, jax.random.PRNGKey(1), vid, rec=False, keep_state=True)
    assert out["fake"].shape == (1, 4, 8, 8, 3)
    assert "fake_state" in out

    traj = square_trajectory(np.full((1, 1, 2), 0.5, np.float32), 4)
    assert traj.shape == (1, 4, 2)
    out2 = gen.generate(params, jax.random.PRNGKey(2), vid, rec=False, custom_state=traj)
    assert out2["fake"].shape == (1, 4, 8, 8, 3)

    # CLI --custom-state helper: square trajectory seeded from the clip's
    # estimated initial state (`generator.py:112-115`)
    traj2 = gen.custom_square_state(params, vid)
    assert traj2.shape == (1, 4, 2)
    assert np.isfinite(np.asarray(traj2)).all()
    out3 = gen.generate(params, jax.random.PRNGKey(3), vid, rec=False,
                        custom_state=traj2)
    assert out3["fake"].shape == (1, 4, 8, 8, 3)


def test_generate_from_image(rng):
    ae, tr, params = _models()
    gen = VideoGenerator(Config(ae=AE, gpt=GPTC), ae, tr)
    img = jnp.asarray(rng.randn(1, 8, 8, 3).astype(np.float32)) * 0.1
    out = gen.generate_from_image(params, jax.random.PRNGKey(0), img, vid_len=4)
    assert out["fake"].shape == (1, 4, 8, 8, 3)


def test_generate_p2p_full_pipeline(rng):
    """p2p end-to-end: cond tokens + end-frame decode context + real last frame."""
    cfg = TransformerConfig(
        z_num=32, z_len=64, z_chunk=16, num_blocks=4, cond_len=16,
        n_layer=2, n_head=2, n_embd=32, z_shape=(4, 4), emb_mode="temporal",
        p2p=True, top_k=5,
    )
    ae = FrameAutoencoder(AE, dtype=jnp.float32)
    tr = TokenTransformer(cfg, dtype=jnp.float32)
    key = jax.random.PRNGKey(0)
    params = {"ae": ae.init(key), "gpt": tr.init(key, batch=1)}
    gen = VideoGenerator(Config(ae=AE, gpt=cfg), ae, tr)
    vid = jnp.asarray(rng.randn(1, 4, 8, 8, 3).astype(np.float32)) * 0.1
    out = gen.generate(params, jax.random.PRNGKey(1), vid, rec=False)
    assert out["fake"].shape == (1, 4, 8, 8, 3)
    # last frame is the real end frame
    np.testing.assert_allclose(np.asarray(out["fake"][:, -1]), np.asarray(vid[:, -1]))


def test_generate_deblurring(rng):
    cfg = TransformerConfig(
        z_num=32, z_len=80, z_chunk=32, num_blocks=2, cond_len=16,
        n_layer=2, n_head=2, n_embd=32, z_shape=(4, 4), emb_mode="temporal",
        deblurring=True, state=False, state_num=32, state_size=16, blur_sigma=2,
        top_k=5,
    )
    ae = FrameAutoencoder(AE, dtype=jnp.float32)
    tr = TokenTransformer(cfg, dtype=jnp.float32)
    key = jax.random.PRNGKey(0)
    params = {"ae": ae.init(key), "gpt": tr.init(key, batch=1)}
    gen = VideoGenerator(Config(ae=AE, gpt=cfg), ae, tr)
    vid = jnp.asarray(rng.randn(1, 2, 8, 8, 3).astype(np.float32)) * 0.1
    out = gen.generate(params, jax.random.PRNGKey(1), vid, rec=False)
    assert out["fake"].shape == (1, 2, 8, 8, 3)
    assert "blur" in out


def test_generate_layout_conditioned(rng, tmp_path):
    """Layout tokens as the control stream, full pipeline (reference
    `generator.py:107-118` + `quantized_video_model.py:836-903`): sampled
    layouts beyond context, keep_state with the given stream, rollout rec,
    and colormapped layout video saving (`generator.py:225-230`)."""
    import dataclasses
    import os

    ae_cfg = dataclasses.replace(
        AE, use_layout=True, layout_size=5, same_decoder_layout=True)
    cfg = TransformerConfig(
        z_num=32, z_len=128, z_chunk=32, num_blocks=4, cond_len=16,
        n_layer=2, n_head=2, n_embd=32, z_shape=(4, 4), emb_mode="temporal",
        layout=True, state_num=32, state_size=16, top_k=5,
        sample_state=True, top_k_state=5,
    )
    ae = FrameAutoencoder(ae_cfg, dtype=jnp.float32)
    tr = TokenTransformer(cfg, dtype=jnp.float32)
    key = jax.random.PRNGKey(0)
    params = {"ae": ae.init(key), "gpt": tr.init(key, batch=1)}
    gen = VideoGenerator(Config(ae=ae_cfg, gpt=cfg), ae, tr)
    vid = jnp.asarray(rng.randn(1, 4, 8, 8, 3).astype(np.float32)) * 0.1
    layout = jnp.asarray(rng.randint(0, 5, (1, 4, 8, 8)))

    # sampled layout stream beyond the 1-frame context
    out = gen.generate(params, jax.random.PRNGKey(1), vid, layout=layout)
    assert out["fake"].shape == (1, 4, 8, 8, 3)
    assert out["fake_layout"].shape == (1, 4, 8, 8)
    assert out["rec"].shape == (1, 4, 8, 8, 3)
    assert out["rec_layout"].shape == (1, 4, 8, 8)
    fl = np.asarray(out["fake_layout"])
    assert fl.min() >= 0 and fl.max() < 5
    assert np.isfinite(np.asarray(out["fake"])).all()

    # keep_state: the full given layout stream drives generation AND the
    # rollout uses the given layout inters (reference keep_state branch)
    out_k = gen.generate(params, jax.random.PRNGKey(2), vid, layout=layout,
                         rec=False, keep_state=True)
    assert out_k["fake"].shape == (1, 4, 8, 8, 3)
    assert out_k["fake_layout"].shape == (1, 4, 8, 8)

    # layout video saving: real_layout/fake_layout colormapped AVIs
    gen.save_batch(str(tmp_path), 0, 1, vid, out)
    for name in ("real_layout", "fake_layout", "rec_layout", "fake", "rec", "real"):
        path = os.path.join(str(tmp_path), name, "vid_00000.avi")
        assert os.path.exists(path), name
    rl = video_io.read_video(os.path.join(str(tmp_path), "real_layout", "vid_00000.avi"))
    assert rl.shape == (4, 8, 8, 3)


def test_decode_video_bucketing_invariance(rng):
    """Bucketed context slicing must not change the rollout output, for any
    bucket set (the slots sliced away are exactly the `dt > curr` ones the
    reference never passes, `quantized_video_model.py:872`)."""
    import dataclasses

    ae, tr, params = _models()
    vid = jnp.asarray(rng.randn(2, 4, 8, 8, 3).astype(np.float32)) * 0.1
    enc = ae.encode(params["ae"], vid)
    out_bucketed = ae.decode_video(params["ae"], enc["code"], ctx_frames=vid[:, :1], n_ctx=1)
    # empty bucket set -> every frame runs the full-slot program; a finer
    # set -> more, smaller programs. All must agree.
    for buckets in ((), (1, 2, 3)):
        ae2 = type(ae)(dataclasses.replace(ae.cfg, decode_buckets=buckets),
                       dtype=jnp.float32)
        out_other = ae2.decode_video(params["ae"], enc["code"], ctx_frames=vid[:, :1], n_ctx=1)
        np.testing.assert_allclose(np.asarray(out_bucketed), np.asarray(out_other),
                                   rtol=1e-4, atol=1e-5)


def test_generate_beam_with_state_tokens(rng):
    """Beam search with an interleaved state stream: frame tokens get beam
    treatment, state tokens are sampled per hypothesis outside the beam score
    (reference `transformer_model.py:352-391`), and provided (keep_state)
    tokens survive untouched."""
    import dataclasses

    cfg = TransformerConfig(
        z_num=32, z_len=72, z_chunk=18, num_blocks=4, cond_len=18,
        n_layer=2, n_head=2, n_embd=32, z_shape=(4, 4), emb_mode="temporal",
        top_k=5, beam_size=2, state=True, state_num=16, state_size=2,
        sample_state=True, top_k_state=4,
    )
    tr = TokenTransformer(cfg, dtype=jnp.float32)
    params = tr.init(jax.random.PRNGKey(0), batch=2)
    code = jnp.asarray(rng.randint(0, 32, (2, 16)))

    # sampled state stream
    gen = tr.generate(params, jax.random.PRNGKey(1), code, total_len=72)
    assert gen["code"].shape[1] + gen["state_code"].shape[1] == 72
    np.testing.assert_array_equal(np.asarray(gen["code"][:, :16]), np.asarray(code))
    assert np.asarray(gen["state_code"]).max() < cfg.state_num

    # keep_state: the full provided state stream must come back verbatim
    state = jnp.asarray(rng.randint(0, 16, (2, 8)))
    gen2 = tr.generate(params, jax.random.PRNGKey(1), code, state_code=state,
                       total_len=72)
    np.testing.assert_array_equal(
        np.asarray(gen2["state_code"][:, :8]), np.asarray(state)
    )

    # greedy (no-sample) beam with expand/prune also runs with states
    cfg2 = dataclasses.replace(cfg, sample=False, sample_state=False)
    tr2 = TokenTransformer(cfg2, dtype=jnp.float32)
    gen3 = tr2.generate(params, jax.random.PRNGKey(1), code, total_len=72)
    assert gen3["code"].shape[1] + gen3["state_code"].shape[1] == 72


def test_save_batch_include_id(tmp_path, rng):
    """vid_ids name the output files (reference --include_id)."""
    ae, tr, params = _models()
    gen = VideoGenerator(Config(ae=AE, gpt=GPTC), ae, tr)
    vid = rng.randn(2, 3, 8, 8, 3).astype(np.float32).clip(-1, 1)
    gen.save_batch(str(tmp_path), 0, 2, vid, {"fake": vid},
                   vid_ids=np.asarray([42, 7]))
    assert (tmp_path / "real" / "vid_00042.avi").exists()
    assert (tmp_path / "fake" / "vid_00007.avi").exists()
    # category filename suffixes (reference save_video_batch suffix,
    # `generator.py:330-334`)
    gen.save_batch(str(tmp_path / "cat"), 0, 2, vid, {"fake": vid},
                   cats=["drums", "piano"])
    assert (tmp_path / "cat" / "real" / "vid_00000_drums.avi").exists()
    assert (tmp_path / "cat" / "fake" / "vid_00001_piano.avi").exists()


def test_generate_stft_audio_conditioned(rng):
    """Audio-conditioned generation: the stft token stream is the given
    control stream for every chunk (reference drums audio-on config,
    `scripts/drums/save_videos_audio_on.sh:9-12` + `generator.py:107-117`)."""
    from ccvs_tpu.config import StftConfig
    from ccvs_tpu.models import StftModel

    cfg = TransformerConfig(
        z_num=32, z_len=128, z_chunk=32, num_blocks=4, cond_len=16,
        n_layer=2, n_head=2, n_embd=32, z_shape=(4, 4), emb_mode="temporal",
        stft=True, state_num=32, state_size=16, top_k=5,
    )
    stc = StftConfig(stft_size=16, stft_shape=(8, 2), stft_num=32)
    ae = FrameAutoencoder(AE, dtype=jnp.float32)
    tr = TokenTransformer(cfg, dtype=jnp.float32)
    sm = StftModel(stc)
    key = jax.random.PRNGKey(0)
    params = {"ae": ae.init(key), "gpt": tr.init(key, batch=1), "stft": sm.init(key)}
    gen = VideoGenerator(Config(ae=AE, gpt=cfg, stft=stc), ae, tr, stft_model=sm)
    vid = jnp.asarray(rng.randn(1, 4, 8, 8, 3).astype(np.float32)) * 0.1
    stft = jnp.asarray(rng.rand(1, 4, 64, 16, 1).astype(np.float32))

    out = gen.generate(params, jax.random.PRNGKey(1), vid, stft=stft,
                       keep_state=True, rec=False)
    assert out["fake"].shape == (1, 4, 8, 8, 3)
    assert np.isfinite(np.asarray(out["fake"])).all()


def test_generate_stft_stream_longer_than_window(rng):
    """Audio-on rollout where the provided stft stream is LONGER than the
    transformer window (the drums 45-frame config: 720 stft tokens vs 256
    in-window state slots, `scripts/drums/save_videos_audio_on.sh:9-12`).
    Only the in-window slice of the stream is 'given'; the window must
    slide through the rest without overflowing capacity, and the provided
    stream must ride through unaltered (regression: the old merged-length
    accounting counted the whole stream as in-window, skipped generation,
    then overflowed the positional embedding on the first slide)."""
    cfg = TransformerConfig(
        z_num=32, z_len=128, z_chunk=32, num_blocks=4, cond_len=16,
        n_layer=2, n_head=2, n_embd=32, z_shape=(4, 4), emb_mode="temporal",
        stft=True, state_num=32, state_size=16, top_k=5,
    )
    tr = TokenTransformer(cfg, dtype=jnp.float32)
    key = jax.random.PRNGKey(0)
    params = tr.init(key, batch=1)
    t = 7  # 7 frames x 16 state tokens = 112 > 64 in-window state slots
    ctx_code = jnp.zeros((1, cfg.cond_len), jnp.int32)
    stream = jax.random.randint(jax.random.PRNGKey(5), (1, t * 16), 0, 32)
    out = tr.generate(params, jax.random.PRNGKey(1), ctx_code,
                      state_code=stream, total_len=t * cfg.z_chunk)
    assert out["code"].shape == (1, t * 16)
    assert out["state_code"].shape == (1, t * 16)
    np.testing.assert_array_equal(np.asarray(out["state_code"]),
                                  np.asarray(stream))

    # end-to-end through VideoGenerator (drums audio-on protocol)
    from ccvs_tpu.config import StftConfig
    from ccvs_tpu.models import StftModel

    stc = StftConfig(stft_size=16, stft_shape=(8, 2), stft_num=32)
    ae = FrameAutoencoder(AE, dtype=jnp.float32)
    sm = StftModel(stc)
    params_all = {"ae": ae.init(key), "gpt": params, "stft": sm.init(key)}
    gen = VideoGenerator(Config(ae=AE, gpt=cfg, stft=stc), ae, tr, stft_model=sm)
    vid = jnp.asarray(rng.randn(1, t, 8, 8, 3).astype(np.float32)) * 0.1
    stft = jnp.asarray(rng.rand(1, t, 64, 16, 1).astype(np.float32))
    out = gen.generate(params_all, jax.random.PRNGKey(1), vid, stft=stft,
                       keep_state=True, rec=False)
    assert out["fake"].shape == (1, t, 8, 8, 3)
    assert np.isfinite(np.asarray(out["fake"])).all()


def test_generate_unconditional_start_token(rng):
    """Unconditional generation from the learned start token (reference
    `scripts/bairhd/save_videos_unc.sh` + `transformer_model.py` start-token
    prefix): cond_len=0, no context frames, decode from an empty FIFO."""
    cfg = TransformerConfig(
        z_num=32, z_len=64, z_chunk=16, num_blocks=4, cond_len=0,
        n_layer=2, n_head=2, n_embd=32, z_shape=(4, 4), emb_mode="temporal",
        use_start_token=True, top_k=5,
    )
    ae = FrameAutoencoder(AE, dtype=jnp.float32)
    tr = TokenTransformer(cfg, dtype=jnp.float32)
    key = jax.random.PRNGKey(0)
    params = {"ae": ae.init(key), "gpt": tr.init(key, batch=1)}
    gen = VideoGenerator(Config(ae=AE, gpt=cfg), ae, tr)
    vid = jnp.asarray(rng.randn(1, 4, 8, 8, 3).astype(np.float32)) * 0.1
    out = gen.generate(params, jax.random.PRNGKey(1), vid, rec=False)
    assert out["fake"].shape == (1, 4, 8, 8, 3)
    assert np.isfinite(np.asarray(out["fake"])).all()


def test_generate_class_conditional(rng):
    """Class-conditional generation (reference `--x_cat`,
    `transformer_model.py` label prefix + `generator.py:120-123` random
    target classes when none are provided)."""
    cfg = TransformerConfig(
        z_num=32, z_len=64, z_chunk=16, num_blocks=4, cond_len=16,
        n_layer=2, n_head=2, n_embd=32, z_shape=(4, 4), emb_mode="temporal",
        cat=True, num_lbl=5, top_k=5,
    )
    ae = FrameAutoencoder(AE, dtype=jnp.float32)
    tr = TokenTransformer(cfg, dtype=jnp.float32)
    key = jax.random.PRNGKey(0)
    params = {"ae": ae.init(key), "gpt": tr.init(key, batch=2)}
    gen = VideoGenerator(Config(ae=AE, gpt=cfg), ae, tr)
    vid = jnp.asarray(rng.randn(2, 4, 8, 8, 3).astype(np.float32)) * 0.1
    # explicit labels
    out = gen.generate(params, jax.random.PRNGKey(1), vid, rec=False,
                       vid_lbl=jnp.asarray([1, 3]))
    assert out["fake"].shape == (2, 4, 8, 8, 3)
    # labels drawn when not provided
    out2 = gen.generate(params, jax.random.PRNGKey(2), vid, rec=False)
    assert "vid_lbl" in out2 and out2["vid_lbl"].shape == (2,)
    assert np.isfinite(np.asarray(out2["fake"])).all()


def test_generate_down_size(rng):
    """`--down_size` degradation: inputs are down-bilinear-up resampled
    before encoding (reference `generator.py:59-66`)."""
    ae, tr, params = _models()
    vid = jnp.asarray(rng.randn(1, 4, 8, 8, 3).astype(np.float32)) * 0.1
    gen = VideoGenerator(Config(ae=AE, gpt=GPTC), ae, tr)
    out = gen.generate(params, jax.random.PRNGKey(1), vid, rec=False, down_size=4)
    assert out["fake"].shape == (1, 4, 8, 8, 3)
    assert np.isfinite(np.asarray(out["fake"])).all()


def test_generate_fused_equals_eager(rng):
    """cfg.ae.serve_fused (encode + whole decode rollout as single jit
    programs) is a pure dispatch-structure change: outputs must match the
    eager path bit-for-bit in fp32 given the same rng."""
    import dataclasses

    ae, tr, params = _models()
    vid = jnp.asarray(rng.randn(2, 4, 8, 8, 3).astype(np.float32)) * 0.1
    gen_e = VideoGenerator(Config(ae=AE, gpt=GPTC), ae, tr)
    ae_f = FrameAutoencoder(dataclasses.replace(AE, serve_fused=True),
                            dtype=jnp.float32)
    gen_f = VideoGenerator(
        Config(ae=dataclasses.replace(AE, serve_fused=True), gpt=GPTC), ae_f, tr)
    out_e = gen_e.generate(params, jax.random.PRNGKey(1), vid, rec=True)
    out_f = gen_f.generate(params, jax.random.PRNGKey(1), vid, rec=True)
    np.testing.assert_allclose(np.asarray(out_e["fake"]),
                               np.asarray(out_f["fake"]), rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(out_e["rec"]),
                               np.asarray(out_f["rec"]), rtol=2e-5, atol=2e-5)
