"""Typed configuration system.

Replaces the reference's 633-line prefix-namespaced argparse tree
(`tools/options.py`) with dataclasses, one per component group (the reference
prefixes: base / `q_` autoencoder / `x_` transformer / `s_` state estimator /
`a_` stft autoencoder), plus the per-dataset preset table
(`tools/options.py:397-450`) and the shipped experiment configs from
`scripts/{bairhd,kinetics,ucf101,drums}/*.sh`.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Any, Optional, Sequence, Tuple


@dataclass(frozen=True)
class DataConfig:
    """Base/data options (reference `options.py:34-155`)."""

    name: str = "experiment"
    dataset: str = "bairhd"
    dataroot: str = "datasets/bairhd"
    phase: str = "train"

    # resolution
    max_dim: int = 256
    true_dim: int = 256
    aspect_ratio: float = 1.0
    imagenet_norm: bool = False

    # clips
    vid_len: int = 16
    p2p_len: Optional[int] = None
    load_vid_len: Optional[int] = None
    max_vid_step: int = 1000
    vid_skip: int = 1
    one_every_n: int = 1
    fps: int = 4
    from_vid: bool = False
    is_seq: bool = True

    # batching
    batch_size_img: int = 1
    batch_size_vid: int = 1
    # validation/generation batches are this multiple of the train batch
    # (reference `--batch_size_valid_mult`, `options.py:55`, applied at
    # `helpers/generator.py:240` / `transformer_trainer.py:99`)
    batch_size_valid_mult: int = 1
    # shuffle the validation split too (reference `--shuffle_valid`,
    # `options.py:91`; the shipped save_videos scripts pass it)
    shuffle_valid: bool = True
    n_consecutive_img: int = 1
    img_out_of_n: int = 1

    # augmentation
    no_h_flip: bool = True
    no_v_flip: bool = True
    min_zoom: float = 1.0
    max_zoom: float = 1.0
    colorjitter: Optional[float] = None
    resize_center_crop_img: Optional[int] = None

    # elastic-view self-supervision (reference `data/augmentations.py`)
    load_elastic_view: bool = False
    elastic_alpha: float = 1.5
    elastic_sigma: float = 0.15
    elastic_min_zoom: float = 1.0
    elastic_max_zoom: float = 1.0
    elastic_occlusion: bool = False
    elastic_corruption: bool = False
    elastic_mean_corruption: float = 0.5
    distort_first: bool = False
    blur_first: Optional[Tuple[float, float]] = None

    # folds (large datasets are indexed fold by fold, reference
    # options.py:72-76)
    num_folds_train: "Optional[int]" = None
    init_fold_train: int = 0
    # pick a random fold per cycle instead of round-robin (reference
    # --random_fold_train, set by the shipped kinetics scripts;
    # `helpers/frame_autoencoder_trainer.py:108`)
    random_fold_train: bool = False

    # state / audio
    load_state: bool = False
    categories: Optional[Tuple[str, ...]] = None

    # layout twins: load per-frame segmentations alongside frames (reference
    # keys off `vid_layout_paths` in the dataset metadata,
    # `base_dataset.py:245-273`; this flag drives the synthetic dataset)
    load_layout: bool = False

    num_workers: int = 8

    @property
    def height(self) -> int:
        return self.max_dim

    @property
    def width(self) -> int:
        return int(self.max_dim * self.aspect_ratio)


@dataclass(frozen=True)
class AutoencoderConfig:
    """Frame-autoencoder options (reference `options.py:157-266`, prefix q_)."""

    # encoder/decoder trunk (SkipGAN). NOTE: the reference decoder also reads
    # `necf`/`necf_mult` (skip_autoencoder.py:356-357); `ndcf*` only feeds the
    # discriminators.
    necf: int = 128
    necf_mult: Tuple[int, ...] = (1, 1, 2, 2, 4, 4)
    ndcf: int = 64
    ndcf_mult: Tuple[int, ...] = (1, 1, 2, 2, 4, 4)
    z_size: int = 512
    z_num: int = 1024
    z_mult: int = 1
    z_shape: Tuple[int, int] = (8, 8)
    max_dim: int = 256
    aspect_ratio: float = 1.0
    normalize_out: bool = False
    is_continuous: bool = False
    use_q_anyway: bool = False

    # flow/skip module
    use_inter: bool = True
    inter_p: float = 0.75
    inter_drop_p: float = 0.0
    no_corr: bool = False
    no_proj: bool = False
    use_masked_flow: bool = False
    use_deformed_conv: bool = False
    use_tradeoff: bool = False
    skip_rgb: bool = False
    skip_tanh: bool = False
    skip_mode: str = "enc"  # enc | dec
    skip_context: Tuple[int, ...] = tuple(range(1, 16))
    skip_memory: int = 15
    keep_first: bool = False
    n_first: int = 1
    p2p_context: bool = False
    # split InterBlock concat convs into a shared-x term computed once per
    # batch element + a per-context term (exact by conv linearity, measured
    # 1.2-1.4x faster decode on chip); opt-out for within-run A/B against
    # the plain tiled-concat form. Int8 serving variants of these convs and
    # of the warp gathers were built and gate-measured SLOWER on v5e
    # (runs_r3/dec_quant_gate.json) and removed — see scripts/PERF_NOTES.md.
    shared_x_split: bool = True
    # static context-count buckets for the doubly-AR rollout: each generated
    # frame decodes against the smallest bucket >= its true context count
    # (reference passes only `dt <= curr` slots, `quantized_video_model.py:872`,
    # so slicing is exact); `skip_memory` is always the last bucket. Each
    # bucket is one compiled scan program + one dispatch per rollout, so
    # finer sets trade ~29 ms dispatch + a compile against ~17-22 ms per
    # skipped slot-frame. Override per-run with CCVS_DECODE_BUCKETS="2,4,8,12".
    decode_buckets: Tuple[int, ...] = (2, 4, 8)

    # layout twins
    use_layout: bool = False
    layout_size: Optional[int] = None
    same_decoder_layout: bool = False

    # serving: run encode + the whole bucketed decode rollout as single jit
    # programs instead of eagerly-stitched per-bucket programs. The eager
    # glue's per-op remote dispatches dominate rollout wall time on the
    # tunneled v5e (23.8x at 64px, runs_r5/dispatch_ab_mid.json); numerics
    # are identical (same graph, one program). Off by default: trainers and
    # tests exercise the eager path; generation drivers opt in.
    serve_fused: bool = False

    # training
    lr: float = 0.002
    # opt-in step decay (beyond-reference knob; defaults keep the
    # reference's constant LR, `quantized_video_model.py:239-243`): after
    # ``lr_decay_at`` optimizer UPDATES (not trainer iterations — one
    # iteration applies an img update plus a vid update every
    # ``vid_step_every``), scale the LR by ``lr_decay_mult``. Built for the
    # round-5 plateau diagnostic (TRAINRUN.md). A tuple/list of update
    # counts applies the mult at each point (multi-step decay).
    lr_decay_at: Any = 0
    lr_decay_mult: float = 1.0
    beta1: float = 0.0
    beta2: float = 0.99
    weight_decay: float = 0.0
    gan_loss: str = "logistic"
    use_di: bool = True
    use_dv: bool = False
    use_df: bool = False
    use_vgg_img: bool = True
    use_vgg_vid: bool = False
    use_direct_recovery_img: bool = True
    use_direct_recovery_vid: bool = False
    use_inter_rec_loss_img: bool = False
    use_backwarp_consistency_img: bool = False
    use_elastic_flow_recovery: bool = False
    use_unc_gen: bool = False
    no_q_img: bool = False
    use_quant_loss_vid: bool = False
    lambda_quant: float = 1.0
    lambda_vgg: float = 10.0
    lambda_gan: float = 1.0
    lambda_r1: float = 10.0
    g_reg_every: Optional[int] = None
    d_reg_every: Optional[int] = 16
    vid_step_every: int = 1
    use_ema: bool = True
    ema_decay: float = 0.999
    use_aug: bool = False
    aug_p: float = 0.0
    ada_target: float = 0.6
    ada_length: int = 500_000
    stddev_group: int = 4
    n_consecutive_dis: int = 1
    downsample_dis_num: int = 0
    downsample_vdis_num: int = 0
    slide_inter: bool = False
    decoder_only: bool = False
    vid_len: int = 16
    n_consecutive_img: int = 1
    load_elastic_view: bool = False
    elastic_corruption: bool = False

    # runtime
    dtype: str = "bfloat16"  # compute dtype for conv trunk
    # rematerialize the heavy sub-forwards (encoder/decoder/VGG/D) inside the
    # training losses: recompute activations in backward instead of storing
    # them — fits the full 256^2 BAIR batch in one 16 GB chip's HBM
    remat: bool = False

    @property
    def num_resolutions(self) -> int:
        return len(self.necf_mult)

    @property
    def enc_channels(self) -> Tuple[int, ...]:
        return tuple(self.necf * m for m in self.necf_mult)

    @property
    def inter_sizes_enc(self) -> Tuple[int, ...]:
        return tuple(int(self.inter_p * c) for c in self.enc_channels)

    @property
    def dec_channels(self) -> Tuple[int, ...]:
        return tuple(self.necf * m for m in reversed(self.necf_mult))

    @property
    def inter_sizes_dec(self) -> Tuple[int, ...]:
        return tuple(int(self.inter_p * c) for c in self.dec_channels)

    @property
    def tokens_per_frame(self) -> int:
        return self.z_shape[0] * self.z_shape[1]


@dataclass(frozen=True)
class TransformerConfig:
    """Latent transformer options (reference `options.py:268-347`, prefix x_)."""

    z_num: int = 1024  # vocabulary
    z_len: int = 1024  # capacity
    z_chunk: int = 64
    num_blocks: int = 16
    cond_len: int = 64
    n_layer: int = 24
    n_head: int = 16
    n_embd: int = 1024
    z_shape: Tuple[int, int] = (8, 8)
    emb_mode: Optional[str] = "temporal"  # spatio-temporal | temporal | None
    is_continuous: bool = False
    n_in: int = 3
    n_proposals: int = 1
    resid_noise: bool = False
    embd_pdrop: float = 0.0
    resid_pdrop: float = 0.0
    attn_pdrop: float = 0.0

    # beam: deterministic expand-prune instead of sampled beams (reference
    # --x_no_sample greedy beam, `transformer_model.py:361-382`)
    no_sample: bool = False

    # conditioning modes
    p2p: bool = False
    state: bool = False
    state_front: bool = False
    state_num: int = 0
    state_size: int = 0
    use_start_token: bool = False
    cat: bool = False
    num_lbl: int = 0
    stft: bool = False
    deblurring: bool = False
    blur_sigma: int = 10
    # segmentation layouts as the control stream (reference `--x_layout`,
    # `options.py:151` "use layouts as state"): layout tokens from the AE's
    # layout-twin quantizer interleave like state tokens (state_num = layout
    # codebook size, state_size = tokens per layout frame)
    layout: bool = False

    # training
    lr: float = 1e-5
    beta1: float = 0.9
    beta2: float = 0.95
    weight_decay: float = 0.01
    lr_warmup_iter: int = 1
    lr_decay: bool = False
    finetune_head: bool = False
    finetune_f: Optional[float] = None

    # sampling
    sample: bool = True
    temperature: float = 1.0
    top_k: Optional[int] = 100
    sample_state: bool = False
    temperature_state: float = 1.0
    top_k_state: Optional[int] = None
    beam_size: Optional[int] = None

    # opt-in int8 weight-quantized AR decode (serving; see nn/quantized.py).
    # Default off: the exact bf16 path is the parity/bench path.
    serve_int8: bool = False

    # rematerialize transformer blocks on the backward pass (training-memory
    # vs recompute trade; lets full-length training fit a 16 GB chip)
    remat: bool = False

    # gradient accumulation: scan the train step over N microbatches before
    # one optimizer update (activation memory of one microbatch; exact same
    # update as the full batch — equal sizes, static masks). The reference
    # has no analog; big global batches need more GPUs there.
    grad_accum: int = 1

    # sequence-parallel training forward: shard the token axis of block
    # activations over the mesh 'model' axis (GSPMD Megatron-SP analog,
    # parallel/sp.py). Scaling headroom beyond the reference (DP-only,
    # SURVEY.md 2.7); requires tracing the step inside `with mesh:`.
    seq_parallel: bool = False

    # FSDP/ZeRO-3: shard params + adam moments over the mesh 'data' axis
    # (parallel/fsdp.py); GSPMD inserts the all-gather/reduce-scatter.
    # Cuts the static train-state footprint ~n_data-fold (the reference is
    # DDP with full replicas, `tools/engine.py:71-74`).
    fsdp: bool = False

    dtype: str = "bfloat16"

    @property
    def size(self) -> int:
        return self.z_shape[0] * self.z_shape[1]

    @property
    def tot_size(self) -> int:
        return self.size + self.state_size

    @property
    def block_size(self) -> int:
        return self.z_len + (1 if self.use_start_token else 0) + (1 if self.cat else 0)


@dataclass(frozen=True)
class StateConfig:
    """State-estimator options (reference `options.py:349-372`, prefix s_)."""

    z_size: int = 512
    z_shape: Tuple[int, int] = (8, 8)
    state_hsize: int = 128
    state_size: int = 2
    state_num: int = 128
    quantize_only: bool = False
    lr: float = 0.01
    beta1: float = 0.5
    beta2: float = 0.9
    weight_decay: float = 0.0


@dataclass(frozen=True)
class StftConfig:
    """STFT autoencoder options (reference `options.py:374-395`, prefix a_)."""

    stft_size: int = 16
    stft_shape: Tuple[int, int] = (8, 2)
    stft_hsize: int = 128
    stft_num: int = 1024
    lr: float = 0.001
    beta1: float = 0.5
    beta2: float = 0.9
    weight_decay: float = 0.0


@dataclass(frozen=True)
class Config:
    """Full experiment config (one per reference `scripts/*/*.sh`)."""

    data: DataConfig = field(default_factory=DataConfig)
    ae: AutoencoderConfig = field(default_factory=AutoencoderConfig)
    gpt: TransformerConfig = field(default_factory=TransformerConfig)
    state: StateConfig = field(default_factory=StateConfig)
    stft: StftConfig = field(default_factory=StftConfig)
    # optional second dataset for the trainers' OTHER batch type (reference
    # `--use_extra_dataset` + the `xb_` flag group, `options.py:24-32`,
    # `helpers/frame_autoencoder_trainer.py:84`): when set, the frame-AE /
    # STFT trainers draw their VIDEO batches from this config while image
    # batches keep `data` (e.g. training the image path on a large image
    # set and the rollout path on the video set). None = single dataset.
    extra_data: Optional[DataConfig] = None

    # experiment bookkeeping
    name: str = "experiment"
    save_path: str = "./runs"
    seed: int = 0
    n_iter: int = 200_000
    save_latest_freq: int = 1000
    save_freq: int = -1
    log_freq: Optional[int] = 2000
    n_iter_eval: Optional[int] = None
    # async checkpointing: the device->host copy happens inside save (no
    # extra HBM), the disk serialization runs on background threads
    # (utils/checkpoint.py). Opt-in this round for queued-run stability.
    async_ckpt: bool = False
    # when set, every `latest` checkpoint write ALSO merge-writes the
    # inference params into this single committable fp16 npz
    # (port/npz_params.py) — trained weights survive a kill at any point
    # (the reference persists every net per-iteration,
    # reference models/__init__.py:5-26)
    npz_mirror: str = ""

    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2, default=str)

    @classmethod
    def from_json(cls, text: str) -> "Config":
        """Rebuild a Config from `to_json` output (the reference's
        `--load_from_opt_file` reload, `tools/options.py:462-522`). Tuple
        fields arrive as JSON lists and are restored by field type."""
        raw = json.loads(text)

        def build(dc_type, d):
            kw = {}
            for f in dataclasses.fields(dc_type):
                if f.name not in d:
                    continue
                v = d[f.name]
                if isinstance(v, list):
                    v = tuple(v)
                kw[f.name] = v
            return dc_type(**kw)

        groups = {"data": DataConfig, "ae": AutoencoderConfig, "gpt": TransformerConfig,
                  "state": StateConfig, "stft": StftConfig, "extra_data": DataConfig}
        kw = {}
        for name, typ in groups.items():
            if raw.get(name) is not None:
                kw[name] = build(typ, raw[name])
        for f in dataclasses.fields(cls):
            if f.name not in groups and f.name in raw:
                kw[f.name] = raw[f.name]
        return cls(**kw)

    @classmethod
    def load(cls, path: str) -> "Config":
        with open(path) as f:
            return cls.from_json(f.read())


def _bair_ae() -> AutoencoderConfig:
    # scripts/bairhd/train_frame_autoencoder.sh
    return AutoencoderConfig(
        necf=128,
        necf_mult=(1, 1, 2, 2, 4, 4),
        ndcf=64,
        ndcf_mult=(1, 1, 2, 2, 4, 4),
        z_size=512,
        z_num=1024,
        z_shape=(8, 8),
        max_dim=256,
        inter_p=0.75,
        skip_context=tuple(range(1, 16)),
        skip_memory=15,
        use_dv=True,
        use_vgg_vid=True,
        use_direct_recovery_vid=True,
        slide_inter=True,
        use_elastic_flow_recovery=True,
        elastic_corruption=True,
        load_elastic_view=True,
        n_consecutive_img=2,
        vid_len=4,
    )


def bairhd_config(name: str = "bairhd") -> Config:
    """BAIR robot-pushing 256x256 (scripts/bairhd/*.sh)."""
    return Config(
        name=name,
        data=DataConfig(
            dataset="bairhd",
            dataroot="datasets/bairhd",
            max_dim=256,
            true_dim=256,
            vid_len=16,
            fps=4,
            from_vid=False,
            batch_size_img=96,
            batch_size_vid=16,
            n_consecutive_img=2,
            img_out_of_n=30,
            load_elastic_view=True,
            elastic_alpha=3.0,
            elastic_sigma=0.1,
            elastic_min_zoom=0.90,
            elastic_max_zoom=1.10,
            elastic_corruption=True,
            blur_first=(0.0, 2.0),
            distort_first=True,
            load_vid_len=30,
        ),
        ae=_bair_ae(),
        gpt=TransformerConfig(
            z_num=1024,
            z_len=1024,
            z_chunk=64,
            cond_len=64,
            n_layer=24,
            n_head=16,
            n_embd=1024,
            z_shape=(8, 8),
            num_blocks=16,
            emb_mode="temporal",
            top_k=100,
        ),
        state=StateConfig(state_size=2, state_num=128),
    )


def bairhd_state_config() -> Config:
    """State-conditioned BAIR (scripts/bairhd/train_transformer_state.sh)."""
    c = bairhd_config("bairhd_state")
    return c.replace(
        gpt=dataclasses.replace(
            c.gpt, z_len=1056, z_chunk=66, state=True, state_num=128, state_size=2,
            sample_state=True, top_k_state=10,
        )
    )


def bairhd_p2p_config() -> Config:
    """Point-to-point BAIR (scripts/bairhd/train_transformer_p2p.sh)."""
    c = bairhd_config("bairhd_p2p")
    return c.replace(
        gpt=dataclasses.replace(c.gpt, p2p=True),
        data=dataclasses.replace(c.data, p2p_len=16),
    )


def bairhd_unc_config() -> Config:
    """Unconditional BAIR (scripts/bairhd/train_transformer_unc.sh)."""
    c = bairhd_config("bairhd_unc")
    return c.replace(gpt=dataclasses.replace(c.gpt, use_start_token=True, cond_len=0))


def kinetics_config() -> Config:
    """Kinetics-600 64x64 prediction (scripts/kinetics/*.sh)."""
    return Config(
        name="kinetics600",
        data=DataConfig(
            dataset="kinetics600",
            dataroot="datasets/kinetics",
            max_dim=64,
            true_dim=256,
            vid_len=16,
            from_vid=True,
            imagenet_norm=True,
            resize_center_crop_img=256,
            no_h_flip=True,
            batch_size_vid=16,
            # reference trains kinetics over 100 folds, sampled randomly per
            # cycle (`scripts/kinetics/train_frame_autoencoder.sh:9`)
            num_folds_train=100,
            random_fold_train=True,
        ),
        ae=AutoencoderConfig(
            necf=64,
            necf_mult=(1, 2, 4, 8),
            z_size=256,
            z_num=16384,
            z_shape=(8, 8),
            max_dim=64,
            inter_p=0.75,
            skip_context=tuple(range(1, 16)),
            skip_memory=15,
        ),
        gpt=TransformerConfig(
            z_num=16384,
            z_len=1280,
            z_chunk=64,
            cond_len=320,
            n_layer=24,
            n_head=16,
            n_embd=1024,
            num_blocks=20,
            emb_mode="temporal",
            top_k=100,
        ),
    )


def kinetics_p2p_config() -> Config:
    """Point-to-point kinetics (reference scripts/kinetics/save_videos_p2p.sh:
    --x_p2p --p2p_len 16 --x_z_len 1024 --x_z_chunk 64)."""
    c = kinetics_config()
    return c.replace(
        name="kinetics600_p2p",
        gpt=dataclasses.replace(
            c.gpt, p2p=True, z_len=1024, num_blocks=16, cond_len=64
        ),
        data=dataclasses.replace(c.data, p2p_len=16),
    )


def ucf101_config() -> Config:
    """UCF-101 256x256 prediction (scripts/ucf101/*.sh)."""
    c = bairhd_config("ucf101")
    return c.replace(
        data=dataclasses.replace(
            c.data, dataset="ucf101", dataroot="datasets/ucf101", from_vid=True,
            resize_center_crop_img=256, load_elastic_view=True,
        )
    )


def drums_config() -> Config:
    """Audio-conditioned drums 128x128 (scripts/drums/*.sh)."""
    return Config(
        name="drums",
        data=DataConfig(
            dataset="drums",
            dataroot="datasets/drums",
            max_dim=128,
            true_dim=96,
            vid_len=45,
            fps=30,
            from_vid=True,
        ),
        ae=AutoencoderConfig(
            necf=128,
            necf_mult=(1, 1, 2, 2, 4),
            z_size=512,
            z_num=1024,
            z_shape=(8, 8),
            max_dim=128,
            inter_p=0.75,
            skip_context=tuple(range(1, 16)),
            skip_memory=15,
        ),
        gpt=TransformerConfig(
            z_num=1024,
            z_len=1280,
            z_chunk=80,
            cond_len=960,
            n_layer=24,
            n_head=16,
            n_embd=1024,
            num_blocks=16,
            emb_mode="temporal",
            stft=True,
            state=True,
            state_num=1024,
            state_size=16,
            top_k=100,
        ),
        stft=StftConfig(stft_size=16, stft_shape=(8, 2), stft_num=1024),
    )


PRESETS = {
    "bairhd": bairhd_config,
    "bairhd_state": bairhd_state_config,
    "bairhd_p2p": bairhd_p2p_config,
    "bairhd_unc": bairhd_unc_config,
    "kinetics600": kinetics_config,
    "kinetics600_p2p": kinetics_p2p_config,
    "ucf101": ucf101_config,
    "drums": drums_config,
}


def get_config(preset: str, **overrides) -> Config:
    cfg = PRESETS[preset]()
    if overrides:
        cfg = cfg.replace(**overrides)
    return cfg
