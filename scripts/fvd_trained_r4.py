"""First generated-video quality metrics on TRAINED weights (round-4).

Chains the committed pieces end-to-end on the chip, the reference's
evaluation protocol (`helpers/generator.py` save_videos -> `tools/tf_fvd/
fvd.py:216-230,263-275`): load the sustained-run checkpoints, synthesize
videos with the full doubly-AR pipeline via `cli.py generate` (writes
real/ fake/ rec/ AVI dirs), then score FVD fake-vs-real and PSNR/SSIM/LPIPS
rec-vs-real via `cli.py eval-fvd` / `eval-metrics`.

No vendored I3D/VGG weights exist in this environment (zero egress), so FVD
and LPIPS run on the random fallback embedders and every key is suffixed
`_uncalibrated` — self-consistent for round-over-round trendlines, NOT
comparable to published FVD (VERDICT r3 "What's missing" #2/#3).

    python scripts/fvd_trained_r4.py [--n-batches 16]
"""

import argparse
import dataclasses
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SAVE = "runs_r4"
NAME = "r4_fvd_eval"


def main(n_batches: int):
    from ccvs_tpu.config import get_config

    cfg = get_config("bairhd")
    cfg = cfg.replace(
        name=NAME,
        save_path=SAVE,
        data=dataclasses.replace(cfg.data, dataset="synthetic", num_workers=4),
        # the sustained runs train with skip_memory 4 (the reference's
        # training config, train_frame_autoencoder.sh); decode must match
        ae=dataclasses.replace(cfg.ae, skip_memory=4, skip_context=(1, 2, 3, 4)),
    )
    os.makedirs(SAVE, exist_ok=True)
    cfg_path = os.path.join(SAVE, f"{NAME}_config.json")
    with open(cfg_path, "w") as f:
        f.write(cfg.to_json())

    env = dict(os.environ)
    gen_cmd = [
        sys.executable, "-m", "ccvs_tpu.cli", "generate",
        "--load-config", cfg_path,
        "--ae-ckpt", os.path.join(SAVE, "checkpoints", "r4_ae_sustained"),
        "--ae-raw",  # short-run EMA is still mostly init (TRAINRUN.md)
        "--gpt-ckpt", os.path.join(SAVE, "checkpoints", "r4_gpt_sustained"),
        "--n-batches", str(n_batches),
    ]
    print("+", " ".join(gen_cmd), flush=True)
    subprocess.run(gen_cmd, check=True, env=env)

    result_path = os.path.join(SAVE, "results", NAME)
    out = {"n_videos": None, "protocol": "generate->AVI->embed (fvd.py:263-275)",
           "weights": "r4 sustained-run checkpoints (raw G)",
           "embedders": "random fallback (no vendored I3D/VGG in this env)"}

    def run_json(cmd):
        print("+", " ".join(cmd), flush=True)
        r = subprocess.run(cmd, check=True, env=env, capture_output=True, text=True)
        return json.loads(r.stdout.strip().splitlines()[-1])

    fvd_fake = run_json([
        sys.executable, "-m", "ccvs_tpu.cli", "eval-fvd",
        "--real", os.path.join(result_path, "real"),
        "--fake", os.path.join(result_path, "fake"),
        "--chunk", "16",
    ])
    fvd_rec = run_json([
        sys.executable, "-m", "ccvs_tpu.cli", "eval-fvd",
        "--real", os.path.join(result_path, "real"),
        "--fake", os.path.join(result_path, "rec"),
        "--chunk", "16",
    ])
    met_rec = run_json([
        sys.executable, "-m", "ccvs_tpu.cli", "eval-metrics",
        "--real", os.path.join(result_path, "real"),
        "--fake", os.path.join(result_path, "rec"),
    ])
    met_fake = run_json([
        sys.executable, "-m", "ccvs_tpu.cli", "eval-metrics",
        "--real", os.path.join(result_path, "real"),
        "--fake", os.path.join(result_path, "fake"),
    ])
    out["n_videos"] = len(os.listdir(os.path.join(result_path, "fake")))
    out["fvd_fake_vs_real"] = fvd_fake
    out["fvd_rec_vs_real"] = fvd_rec
    out["metrics_rec_vs_real"] = met_rec
    out["metrics_fake_vs_real"] = met_fake

    with open(os.path.join(SAVE, "fvd_trained.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-batches", type=int, default=16)
    main(ap.parse_args().n_batches)
