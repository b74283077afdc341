"""Round-4 quality-metric pipeline on TRAINED weights at a mid scale (64px).

VERDICT r3 item 3 asked for the first generated-video metric on trained
weights via the reference's evaluation protocol (`helpers/generator.py`
save_videos -> `tools/tf_fvd/fvd.py:216-230,263-275`). The round-3/-4
flagship checkpoints were never persisted (gitignored, disk reset between
sessions) and the 256px config trains at ~44 s/iter — unreachable inside one
round. This script runs the SAME end-to-end chain at a 64px mid config that
trains to a usable model in minutes on the chip:

    train frame-AE -> train latent transformer on the frozen AE ->
    `cli.py generate` (real/ fake/ rec/ AVI dirs) ->
    `cli.py eval-fvd` + `eval-metrics` -> runs_r4/fvd_trained.json

FVD/LPIPS use the random fallback embedders (no vendored I3D/VGG in this
zero-egress env), so the numbers are `_uncalibrated`: self-consistent for
round-over-round trendlines, NOT comparable to published FVD.

Phases are separate invocations so a bash driver can bound each with
`timeout -s TERM` (the trainers latch SIGTERM and checkpoint at the step
boundary, utils/preemption.py):

    python scripts/fvd_mid_r4.py --phase ae   [--n-iter 4000]
    python scripts/fvd_mid_r4.py --phase gpt  [--n-iter 2000]
    python scripts/fvd_mid_r4.py --phase eval [--n-batches 4]
"""

import argparse
import dataclasses
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SAVE = "runs_r4"
AE_NAME = "r4_mid_ae"
GPT_NAME = "r4_mid_gpt"
EVAL_NAME = "r4_mid_eval"


def mid_cfg():
    """64px BAIR-protocol config: same pipeline/schedule as the flagship
    (scripts/bairhd/train_frame_autoencoder.sh shapes scaled 4x down, same
    8x8 latent grid / 64 tokens per frame), half-width networks. Elastic and
    VGG branches are off to keep the single-CPU-core data path light."""
    from ccvs_tpu.config import (AutoencoderConfig, Config, DataConfig,
                                 TransformerConfig)

    return Config(
        name=AE_NAME,
        save_path=SAVE,
        log_freq=10,
        save_freq=-1,
        save_latest_freq=25,
        data=DataConfig(
            dataset="synthetic", max_dim=64, true_dim=64, vid_len=16,
            batch_size_img=24, batch_size_vid=4, n_consecutive_img=2,
            img_out_of_n=30, num_workers=4,
        ),
        ae=AutoencoderConfig(
            necf=64, necf_mult=(1, 2, 2, 4), ndcf=32, ndcf_mult=(1, 2, 2, 4),
            z_size=256, z_num=1024, z_shape=(8, 8), max_dim=64,
            inter_p=0.75, skip_memory=4, skip_context=(1, 2, 3, 4),
            use_dv=True, use_direct_recovery_vid=True, slide_inter=True,
            n_consecutive_img=2, vid_len=4, use_aug=True,
        ),
        gpt=TransformerConfig(
            z_num=1024, z_len=1024, z_chunk=64, cond_len=64,
            n_layer=8, n_head=8, n_embd=512, z_shape=(8, 8), num_blocks=16,
            emb_mode="temporal", top_k=100, remat=True,
        ),
    )


def run_ae(n_iter):
    from ccvs_tpu.train.ae_trainer import FrameAutoencoderTrainer

    cfg = mid_cfg().replace(n_iter=n_iter)
    resume = os.path.isdir(os.path.join(SAVE, "checkpoints", AE_NAME))
    FrameAutoencoderTrainer(cfg).run(eval_every=25, snapshot_every=200,
                                     serialize_steps=True, resume=resume)


def run_gpt(n_iter):
    from ccvs_tpu.train.transformer_trainer import TransformerTrainer
    from ccvs_tpu.utils.checkpoint import CheckpointManager

    cfg = mid_cfg().replace(name=GPT_NAME, n_iter=n_iter)
    ckpt = CheckpointManager(os.path.join(SAVE, "checkpoints", AE_NAME))
    # raw generator, not EMA: at a few hundred iters the 0.999-decay EMA is
    # still mostly init (see TRAINRUN.md round-3 measurement)
    ae_params = ckpt.load("qvid", "latest")["gen"]
    resume = os.path.isdir(os.path.join(SAVE, "checkpoints", GPT_NAME))
    TransformerTrainer(cfg, ae_params).run(resume=resume)


def run_eval(n_batches):
    cfg = mid_cfg().replace(name=EVAL_NAME)
    os.makedirs(SAVE, exist_ok=True)
    cfg_path = os.path.join(SAVE, f"{EVAL_NAME}_config.json")
    with open(cfg_path, "w") as f:
        f.write(cfg.to_json())

    gen_cmd = [
        sys.executable, "-m", "ccvs_tpu.cli", "generate",
        "--load-config", cfg_path,
        "--ae-ckpt", os.path.join(SAVE, "checkpoints", AE_NAME),
        "--ae-raw",
        "--gpt-ckpt", os.path.join(SAVE, "checkpoints", GPT_NAME),
        "--n-batches", str(n_batches),
    ]
    print("+", " ".join(gen_cmd), flush=True)
    subprocess.run(gen_cmd, check=True)

    result_path = os.path.join(SAVE, "results", EVAL_NAME)

    def run_json(cmd):
        print("+", " ".join(cmd), flush=True)
        r = subprocess.run(cmd, check=True, capture_output=True, text=True)
        return json.loads(r.stdout.strip().splitlines()[-1])

    out = {
        "protocol": "train 64px mid config -> generate->AVI (16f, 1 ctx) -> "
                    "embed+score (ref tools/tf_fvd/fvd.py:263-275)",
        "weights": f"{AE_NAME} (raw G) + {GPT_NAME}, trained this round on "
                   "the chip (see runs_r4/logs/*mid*/metrics.jsonl)",
        "embedders": "random fallback (no vendored I3D/VGG in this env) -> "
                     "all FVD/LPIPS keys are UNCALIBRATED trendline numbers",
        "n_videos": len(os.listdir(os.path.join(result_path, "fake"))),
        "fvd_fake_vs_real_uncalibrated": run_json(
            [sys.executable, "-m", "ccvs_tpu.cli", "eval-fvd",
             "--real", os.path.join(result_path, "real"),
             "--fake", os.path.join(result_path, "fake"), "--chunk", "16"]),
        "fvd_rec_vs_real_uncalibrated": run_json(
            [sys.executable, "-m", "ccvs_tpu.cli", "eval-fvd",
             "--real", os.path.join(result_path, "real"),
             "--fake", os.path.join(result_path, "rec"), "--chunk", "16"]),
        "metrics_rec_vs_real": run_json(
            [sys.executable, "-m", "ccvs_tpu.cli", "eval-metrics",
             "--real", os.path.join(result_path, "real"),
             "--fake", os.path.join(result_path, "rec")]),
        "metrics_fake_vs_real": run_json(
            [sys.executable, "-m", "ccvs_tpu.cli", "eval-metrics",
             "--real", os.path.join(result_path, "real"),
             "--fake", os.path.join(result_path, "fake")]),
    }
    with open(os.path.join(SAVE, "fvd_trained.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


NPZ = os.path.join(SAVE, "mid_weights_fp16.npz")


def run_export():
    """Persist the trained raw-G AE + GPT params as a committable fp16 npz
    (orbax checkpoint dirs are gitignored and the sandbox disk resets
    between sessions, so uncommitted weights are lost)."""
    from ccvs_tpu.port.npz_params import save_params_npz
    from ccvs_tpu.utils.checkpoint import CheckpointManager

    ae = CheckpointManager(os.path.join(SAVE, "checkpoints", AE_NAME))
    gpt = CheckpointManager(os.path.join(SAVE, "checkpoints", GPT_NAME))
    save_params_npz(NPZ,
                    ae_gen=ae.load("qvid", "latest")["gen"],
                    gpt=gpt.load("transformer", "latest")["params"])
    mb = os.path.getsize(NPZ) / 1e6
    print(f"exported {NPZ} ({mb:.1f} MB)")


def run_import():
    """Rebuild orbax checkpoints (the shapes `cli.py generate` loads:
    qvid->{gen}, transformer->{params}) from the committed fp16 npz."""
    from ccvs_tpu.port.npz_params import load_params_npz
    from ccvs_tpu.utils.checkpoint import CheckpointManager

    trees = load_params_npz(NPZ, "ae_gen", "gpt")
    ae = CheckpointManager(os.path.join(SAVE, "checkpoints", AE_NAME))
    ae.save("qvid", 0, {"gen": trees["ae_gen"]}, latest=True)
    gpt = CheckpointManager(os.path.join(SAVE, "checkpoints", GPT_NAME))
    gpt.save("transformer", 0, {"params": trees["gpt"]}, latest=True)
    print("rebuilt", AE_NAME, "and", GPT_NAME, "checkpoints from", NPZ)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--phase", choices=["ae", "gpt", "eval", "export", "import"],
                    required=True)
    ap.add_argument("--n-iter", type=int, default=None)
    ap.add_argument("--n-batches", type=int, default=4)
    args = ap.parse_args()
    if args.phase == "ae":
        run_ae(args.n_iter or 4000)
    elif args.phase == "gpt":
        run_gpt(args.n_iter or 2000)
    elif args.phase == "export":
        run_export()
    elif args.phase == "import":
        run_import()
    else:
        run_eval(args.n_batches)
