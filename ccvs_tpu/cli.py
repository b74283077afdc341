"""Command-line entry points.

Replaces the reference's per-task launcher modules (`helpers/*_trainer.py`
__main__ blocks + `torch.distributed.launch`); SPMD init is just
`jax.distributed.initialize()` on multi-host.

Usage:
    python -m ccvs_tpu.cli train-ae --preset bairhd [--n-iter N] [--resume]
    python -m ccvs_tpu.cli train-transformer --preset bairhd --ae-ckpt DIR
    python -m ccvs_tpu.cli train-state --preset bairhd_state --ae-ckpt DIR
    python -m ccvs_tpu.cli train-stft --preset drums
    python -m ccvs_tpu.cli generate --preset bairhd --ae-ckpt DIR --gpt-ckpt DIR
    python -m ccvs_tpu.cli eval-fvd --real DIR --fake DIR
    python -m ccvs_tpu.cli eval-metrics --real DIR --fake DIR
"""

import argparse
import dataclasses
import json
import os
import sys

import numpy as np


def _add_common(p):
    p.add_argument("--preset", default="bairhd", help="config preset name")
    p.add_argument("--load-config", default=None,
                   help="path to a saved config.json; overrides --preset "
                        "(reference --load_from_opt_file)")
    p.add_argument("--name", default=None)
    p.add_argument("--save-path", default=None)
    p.add_argument("--n-iter", type=int, default=None)
    p.add_argument("--dataroot", default=None)
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--vgg-npz", default=None, help="vendored VGG19 weights")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--distributed", action="store_true",
                   help="multi-host: call jax.distributed.initialize() "
                        "(coordinator from env, e.g. a TPU pod slice)")
    p.add_argument("--n-devices", type=int, default=None,
                   help="mesh size (default: all visible devices for the "
                        "train-* tasks; 1 for generate)")
    p.add_argument("--model-parallel", type=int, default=1,
                   help="tensor-parallel degree of the mesh 'model' axis")
    p.add_argument("--seq-parallel", action="store_true",
                   help="transformer training only: also shard the token "
                        "axis of block activations over the 'model' axis "
                        "(Megatron-SP analog, parallel/sp.py)")
    p.add_argument("--fsdp", action="store_true",
                   help="transformer training only: shard params + adam "
                        "moments over the 'data' axis (ZeRO-3 via GSPMD, "
                        "parallel/fsdp.py)")
    p.add_argument("--grad-accum", type=int, default=None,
                   help="transformer training: microbatches per optimizer "
                        "update (lax.scan gradient accumulation)")
    p.add_argument("--async-ckpt", action="store_true",
                   help="checkpoint asynchronously: background disk write "
                        "overlaps training (device->host copy still happens "
                        "at the save call)")


def _config(args):
    from ccvs_tpu.config import Config, get_config

    if getattr(args, "load_config", None):
        cfg = Config.load(args.load_config)  # keeps its recorded save_path/seed
    else:
        cfg = get_config(args.preset).replace(save_path="./runs")
    # explicit flags override; omitted flags leave the loaded config intact
    over = {}
    if args.save_path is not None:
        over["save_path"] = args.save_path
    if args.seed is not None:
        over["seed"] = args.seed
    if args.name:
        over["name"] = args.name
    if args.n_iter:
        over["n_iter"] = args.n_iter
    if getattr(args, "async_ckpt", False):
        over["async_ckpt"] = True
    if over:
        cfg = cfg.replace(**over)
    if args.dataroot:
        cfg = cfg.replace(data=dataclasses.replace(cfg.data, dataroot=args.dataroot))
    return cfg


def _mesh(args):
    """Build the training mesh from CLI flags; the stand-in for the reference
    Engine's NCCL/SLURM bootstrap (`tools/engine.py:24-57`). Multi-host init
    happens once, before any device query."""
    import jax

    if getattr(args, "distributed", False):
        jax.distributed.initialize()
    from ccvs_tpu.parallel.mesh import make_mesh

    return make_mesh(args.n_devices, model_parallel=args.model_parallel)


def _load_ae_params(args, cfg):
    from ccvs_tpu.utils.checkpoint import CheckpointManager

    ckpt = CheckpointManager(args.ae_ckpt)
    state = ckpt.load("qvid", args.ae_which)
    if getattr(args, "ae_raw", False):
        return state["gen"]
    # prefer EMA weights at inference (`quantized_video_model.py:177-179`)
    return state.get("ema") or state["gen"]


def main(argv=None):
    if os.environ.get("CCVS_FORCE_CPU"):
        # Offline scoring (eval-fvd / eval-metrics) while the chip is busy:
        # the sandbox pins JAX_PLATFORMS to the TPU plugin, so host-only
        # work must opt out before the first jax import (tests/conftest.py
        # recipe).
        os.environ.pop("JAX_PLATFORMS", None)
        import jax

        jax.config.update("jax_platforms", "cpu")
    parser = argparse.ArgumentParser(prog="ccvs_tpu")
    sub = parser.add_subparsers(dest="task", required=True)

    for task in ("train-ae", "train-transformer", "train-state", "train-stft", "generate"):
        p = sub.add_parser(task)
        _add_common(p)
        if task != "train-ae":
            p.add_argument("--ae-ckpt", default=None)
            p.add_argument("--ae-which", default="latest")
            p.add_argument("--ae-raw", action="store_true",
                           help="use the raw generator weights instead of the "
                                "EMA copy (the reference always prefers EMA, "
                                "`quantized_video_model.py:177-179`, which "
                                "assumes its 100k+-iter schedules; a short "
                                "run's 0.999-decay EMA is still mostly init)")
        if task == "generate":
            p.add_argument("--gpt-ckpt", required=True)
            p.add_argument("--gpt-which", default="latest")
            p.add_argument("--state-ckpt", default=None)
            p.add_argument("--stft-ckpt", default=None)
            p.add_argument("--n-batches", type=int, default=640)
            p.add_argument("--rec-only", action="store_true")
            p.add_argument("--keep-state", action="store_true",
                           help="condition on the true state stream instead of "
                                "sampling it (reference --keep_state)")
            p.add_argument("--include-id", action="store_true",
                           help="name output videos by dataset vid_id "
                                "(reference --include_id)")
            p.add_argument("--fused", action="store_true",
                           help="serve encode + the whole decode rollout as "
                                "single jit programs (identical numerics; "
                                "removes eager-glue dispatch overhead — "
                                "23.8x decode at 64px through the tunnel, "
                                "runs_r5/dispatch_ab_mid.json)")
            p.add_argument("--serve-int8", action="store_true",
                           help="int8 weight-quantized AR decode (1.5x "
                                "tokens/sec; sampling distribution shifts "
                                "slightly vs the exact bf16 path)")
            p.add_argument("--step-by-step", action="store_true",
                           help="interleave transformer chunks with frame "
                                "decode + code correction (reference "
                                "--step_by_step, generator.py:132-159)")
            p.add_argument("--gen-from-img", action="store_true",
                           help="treat each clip's first frame as a 1-frame "
                                "context (reference --gen_from_img)")
            p.add_argument("--down-size", type=int, default=None,
                           help="degrade inputs to this size before encoding "
                                "(reference --down_size)")
            p.add_argument("--custom-state", action="store_true",
                           help="drive generation with the square-path state "
                                "trajectory from each clip's estimated "
                                "initial state (reference --custom_state)")
            p.add_argument("--fold", type=int, default=None,
                           help="valid data fold to generate from (reference "
                                "--init_fold_valid with --num_folds_valid)")

    for task in ("eval-fvd", "eval-metrics", "eval-all"):
        p = sub.add_parser(task)
        p.add_argument("--real", required=True)
        p.add_argument("--fake", required=True)
        p.add_argument("--i3d-npz", default=None)
        p.add_argument("--vgg-npz", default=None)
        p.add_argument("--chunk", type=int, default=256)
        p.add_argument("--idx", type=int, default=None,
                       help="per-timestep metrics (reference --idx)")
        if task == "eval-all":
            p.add_argument("--rec", default=None,
                           help="reconstruction dir: adds rec-vs-real FVD "
                                "and metrics passes")

    args = parser.parse_args(argv)

    # trainers that stop on SIGTERM/SIGINT exit 75 (EX_TEMPFAIL): wrapper
    # scripts / retry loops can distinguish "preempted, resume me" from done
    def _exit_preempted(trainer):
        if getattr(trainer, "preempted", False):
            sys.exit(75)

    if args.task == "train-ae":
        from ccvs_tpu.train.ae_trainer import FrameAutoencoderTrainer

        cfg = _config(args)
        tr = FrameAutoencoderTrainer(cfg, vgg_npz=args.vgg_npz, mesh=_mesh(args))
        tr.run(resume=args.resume)
        _exit_preempted(tr)

    elif args.task == "train-transformer":
        from ccvs_tpu.train.transformer_trainer import TransformerTrainer

        cfg = _config(args)
        if getattr(args, "seq_parallel", False):
            cfg = cfg.replace(gpt=dataclasses.replace(cfg.gpt, seq_parallel=True))
        if getattr(args, "fsdp", False):
            cfg = cfg.replace(gpt=dataclasses.replace(cfg.gpt, fsdp=True))
        if getattr(args, "grad_accum", None):
            cfg = cfg.replace(gpt=dataclasses.replace(cfg.gpt, grad_accum=args.grad_accum))
        ae_params = _load_ae_params(args, cfg)
        tr = TransformerTrainer(cfg, ae_params, mesh=_mesh(args))
        tr.run(resume=args.resume)
        _exit_preempted(tr)

    elif args.task == "train-state":
        from ccvs_tpu.train.state_trainer import StateEstimatorTrainer

        cfg = _config(args)
        ae_params = _load_ae_params(args, cfg)
        tr = StateEstimatorTrainer(cfg, ae_params, mesh=_mesh(args))
        tr.run(resume=args.resume)
        _exit_preempted(tr)

    elif args.task == "train-stft":
        from ccvs_tpu.train.state_trainer import StftAutoencoderTrainer

        cfg = _config(args)
        tr = StftAutoencoderTrainer(cfg, mesh=_mesh(args), vgg_npz=args.vgg_npz)
        tr.run(resume=args.resume)
        _exit_preempted(tr)

    elif args.task == "generate":
        _generate(args)

    elif args.task == "eval-fvd":
        from ccvs_tpu.eval.fvd import fvd_from_videos
        from ccvs_tpu.utils.video_io import read_video

        real = _load_dir(args.real)
        fake = _load_dir(args.fake)
        n = min(len(real), len(fake))
        out = fvd_from_videos(real[:n], fake[:n], i3d_npz=args.i3d_npz, chunk=args.chunk)
        print(json.dumps(out))

    elif args.task == "eval-metrics":
        from ccvs_tpu.eval.metrics import video_metrics

        real = _load_dir(args.real, unit=True)
        fake = _load_dir(args.fake, unit=True)
        n = min(len(real), len(fake))
        print(json.dumps(video_metrics(real[:n], fake[:n], per_timestep=args.idx,
                                       vgg_npz=args.vgg_npz)))

    elif args.task == "eval-all":
        # The reference scores in two offline processes (tools/tf_fvd/fvd.py
        # + tools/pytorch_metrics/metrics.py). One process here: the FVD
        # embedder and the LPIPS VGG each compile ONCE and score every pass
        # (remote TPU compiles are minutes through the tunnel; per-pass
        # processes paid that price 4x).
        import sys as _sys

        from ccvs_tpu.eval import fvd as fvd_mod
        from ccvs_tpu.eval.metrics import video_metrics

        real = _load_dir(args.real, unit=True)
        fake = _load_dir(args.fake, unit=True)
        rec = _load_dir(args.rec, unit=True) if args.rec else None

        if args.i3d_npz:
            embed, calib = fvd_mod.make_i3d_embedder(args.i3d_npz), True
        else:
            print(fvd_mod._UNCAL_WARNING, file=_sys.stderr)
            embed, calib = fvd_mod.make_fallback_embedder(), False

        def signed(v):  # [0,1] -> [-1,1] for the FVD protocol
            return v * 2 - 1

        out = {}
        n = min(len(real), len(fake))
        out["fvd_fake_vs_real"] = fvd_mod.fvd_from_videos(
            signed(real[:n]), signed(fake[:n]), embed=embed,
            chunk=args.chunk, calibrated=calib)
        out["metrics_fake_vs_real"] = video_metrics(
            real[:n], fake[:n], per_timestep=args.idx, vgg_npz=args.vgg_npz)
        if rec is not None:
            m = min(len(real), len(rec))
            out["fvd_rec_vs_real"] = fvd_mod.fvd_from_videos(
                signed(real[:m]), signed(rec[:m]), embed=embed,
                chunk=args.chunk, calibrated=calib)
            out["metrics_rec_vs_real"] = video_metrics(
                real[:m], rec[:m], per_timestep=args.idx, vgg_npz=args.vgg_npz)
        print(json.dumps(out))


def _load_dir(path, unit=False):
    from ccvs_tpu.utils.video_io import read_video

    files = sorted(
        os.path.join(path, f) for f in os.listdir(path) if f.endswith((".avi", ".mp4"))
    )
    vids = np.stack([read_video(f) for f in files]).astype(np.float32) / 255.0
    return vids if unit else vids * 2 - 1


def _generate(args):
    import jax

    from ccvs_tpu.data import PrefetchLoader, create_dataset
    from ccvs_tpu.generate import VideoGenerator
    from ccvs_tpu.models import FrameAutoencoder, StateModel, StftModel, TokenTransformer
    from ccvs_tpu.utils.checkpoint import CheckpointManager

    cfg = _config(args)
    if getattr(args, "serve_int8", False):
        cfg = cfg.replace(gpt=dataclasses.replace(cfg.gpt, serve_int8=True))
    if getattr(args, "fused", False):
        cfg = cfg.replace(ae=dataclasses.replace(cfg.ae, serve_fused=True))

    # data-parallel generation: batch sharded over the mesh 'data' axis,
    # frozen params replicated — the jitted synthesis programs SPMD across
    # chips (TPU-native analog of the reference's DDP save_videos protocol,
    # `tools/engine.py:71-101` + `helpers/generator.py`). Built before any
    # checkpoint load so a --distributed multi-host init precedes the first
    # device query. Single device: mesh stays None, placement is plain.
    from ccvs_tpu.parallel.mesh import put_batch, replicate_tree

    mesh = None
    if (getattr(args, "distributed", False) or args.model_parallel > 1
            or (args.n_devices or 0) > 1):
        mesh = _mesh(args)
    if mesh is not None:
        n_data = mesh.shape["data"]
        eff_batch = cfg.data.batch_size_vid * cfg.data.batch_size_valid_mult
        if eff_batch % n_data:
            raise SystemExit(
                f"--n-devices: the data-axis size {n_data} must divide "
                f"batch_size_vid x batch_size_valid_mult = {eff_batch}")

    ae = FrameAutoencoder(cfg.ae)
    tr = TokenTransformer(cfg.gpt)
    params = {"ae": _load_ae_params(args, cfg)}
    gpt_state = CheckpointManager(args.gpt_ckpt).load("transformer", args.gpt_which)
    params["gpt"] = gpt_state["params"]
    state_model = stft_model = None
    if args.state_ckpt:
        state_model = StateModel(cfg.state)
        params["state"] = CheckpointManager(args.state_ckpt).load("state", "best")["params"]
    if args.stft_ckpt:
        stft_model = StftModel(cfg.stft)
        params["stft"] = CheckpointManager(args.stft_ckpt).load("stft", "best")["params"]

    gen = VideoGenerator(cfg, ae, tr, state_model, stft_model)
    ds = create_dataset(cfg.data, phase="valid",
                        load_vid=not args.gen_from_img, fold=args.fold)
    # reference applies the valid batch multiplier + optional valid shuffle
    # at the generator's loader (`helpers/generator.py:240`, `options.py:55,91`)
    gen_batch = cfg.data.batch_size_vid * cfg.data.batch_size_valid_mult
    loader = PrefetchLoader(ds, gen_batch, shuffle=cfg.data.shuffle_valid,
                            num_workers=cfg.data.num_workers, drop_last=True)
    result_path = os.path.join(cfg.save_path, "results", cfg.name)
    rng = jax.random.PRNGKey(cfg.seed)

    if mesh is not None:
        params = replicate_tree(mesh, params)

    it = iter(loader)
    for i in range(args.n_batches):
        try:
            batch = next(it)
        except StopIteration:
            it = iter(loader)
            batch = next(it)
        if args.gen_from_img and "img" in batch:
            # image loader feeds 1-frame contexts (`generator.py:279-280`:
            # data["vid"] = data.pop("img").unsqueeze(1))
            img = batch.pop("img")
            batch["vid"] = img[:, None] if img.ndim == 4 else img[:, :1]
        dev = put_batch(mesh, {k: batch[k]
                               for k in ("vid", "stft", "vid_lbl", "layout")
                               if k in batch})
        vid = dev["vid"]
        rng, sub = jax.random.split(rng)
        # --rec-only: reconstruction-quality runs, no AR generation
        # (the old wiring inverted this and disabled rec instead)
        if args.step_by_step:
            out = gen.generate_step_by_step(params, sub, vid)
        elif args.gen_from_img:
            # 1-frame context, no reconstruction (`generator.py:172,278-279`)
            out = gen.generate_from_image(params, sub, vid[:, 0],
                                          vid_len=cfg.data.vid_len,
                                          down_size=args.down_size)
        else:
            custom = None
            if args.custom_state and state_model is not None:
                custom = gen.custom_square_state(params, vid)
            out = gen.generate(params, sub, vid, stft=dev.get("stft"),
                               vid_lbl=dev.get("vid_lbl"),
                               layout=dev.get("layout"), rec=True,
                               fake=not args.rec_only,
                               keep_state=args.keep_state,
                               custom_state=custom,
                               down_size=args.down_size)
        # category filename suffixes for class-conditional runs
        # (`generator.py:200`: cat = categories[vid_lbl])
        cats = None
        if cfg.gpt.cat and cfg.data.categories:
            lbl = batch.get("vid_lbl", out.get("vid_lbl"))
            if lbl is not None:
                cats = [cfg.data.categories[int(l)] for l in np.asarray(lbl)]
        if mesh is not None and jax.process_count() > 1:
            # multi-host: global outputs are not fully addressable from one
            # process — each host writes only its own rows, file ids derived
            # from the GLOBAL row index (union over hosts = full batch).
            from ccvs_tpu.parallel.mesh import host_local_rows

            real_rows, row_ids = host_local_rows(vid)
            out_local = {k: host_local_rows(v)[0] for k, v in out.items()}
            ids = (batch["vid_id"] if args.include_id
                   else gen_batch * i + row_ids)
            gen.save_batch(result_path, i, gen_batch, real_rows,
                           out_local, fps=cfg.data.fps,
                           imagenet_norm=cfg.data.imagenet_norm,
                           dataset=cfg.data.dataset, vid_ids=ids, cats=cats)
        else:
            gen.save_batch(result_path, i, gen_batch, vid, out,
                           fps=cfg.data.fps,
                           imagenet_norm=cfg.data.imagenet_norm,
                           dataset=cfg.data.dataset,
                           vid_ids=batch.get("vid_id") if args.include_id else None,
                           cats=cats)
    print(f"wrote results to {result_path}")


if __name__ == "__main__":
    main()
