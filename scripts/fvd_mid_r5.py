"""Round-5 trained-weights quality chain (VERDICT r4 item 1 — the round gate).

Runs the reference's full evaluation story — train -> generate -> score
(`/root/reference/helpers/generator.py:248-282` ->
`/root/reference/tools/tf_fvd/fvd.py:216-230,263-275`) — at a 64px mid scale
that trains to a usable model in chip-minutes, for TWO configs:

    --preset bair      64px BAIR protocol, 1024-code VQ (default)
    --preset kinetics  64px kinetics protocol: 16384-code VQ (the Pallas VQ
                       kernel's production codebook size), 5-frame context
                       (`/root/reference/scripts/kinetics/save_videos.sh:9-15`)

Durability (VERDICT r4 item 2): every `latest` checkpoint save ALSO
merge-writes the raw-G AE + GPT params into ONE committable fp16 npz
(`cfg.npz_mirror` -> utils/checkpoint.py -> port/npz_params.update_params_npz),
so a SIGTERM/SIGKILL at ANY point after the first save (iter 25, ~3 min)
leaves loadable, committable trained weights. The former separate `export`
phase is now a verifier: it loads the npz back and prints a summary.

FVD/LPIPS use the random fallback embedders (no vendored I3D/VGG in this
zero-egress env): every score carries a machine-readable
`fallback_embedder` / `lpips_fallback_weights` flag and `_uncalibrated` key
suffix — self-consistent trendline numbers, NOT comparable to published FVD.

Phases are separate invocations so a bash driver can bound each with
`timeout -s TERM` (trainers latch SIGTERM and checkpoint at the step
boundary, utils/preemption.py):

    python scripts/fvd_mid_r5.py --phase ae     [--preset bair] [--n-iter 600]
    python scripts/fvd_mid_r5.py --phase gpt    [--preset bair] [--n-iter 400]
    python scripts/fvd_mid_r5.py --phase verify [--preset bair]
    python scripts/fvd_mid_r5.py --phase eval   [--preset bair] [--n-batches 2]
    python scripts/fvd_mid_r5.py --phase import [--preset bair]   # npz -> orbax
"""

import argparse
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SAVE = "runs_r5"
RESULTS_JSON = os.path.join(SAVE, "fvd_trained.json")


def names(preset):
    if preset == "lrdecay":
        # the plateau diagnostic's LR-decay arm (scripts/plateau_r5.py):
        # same bair mid arch, x0.3 LR step decay at iter 300 -> 27.8 dB vs
        # the constant-LR chain's 26.0 (runs_r5/plateau_diag.json). The AE
        # checkpoint comes from the diag run; this chain adds a GPT on top
        # and evals the better pair.
        return ("r5_plateau_lrdecay", "r5_lrdecay_gpt", "r5_lrdecay_eval",
                os.path.join(SAVE, "mid_weights_lrdecay_fp16.npz"))
    if preset == "ext":
        # round-5 extended run: the plateau diagnostic's winning arm
        # (x0.3 step decay) continued past its 600-iter budget with a
        # second decay step — the "does the schedule fix keep paying"
        # follow-through (VERDICT r4 item 6 lineage).
        return ("r5_ext_ae", "r5_ext_gpt", "r5_ext_eval",
                os.path.join(SAVE, "mid_weights_ext_fp16.npz"))
    ae = f"r5_{preset}_ae"
    gpt = f"r5_{preset}_gpt"
    ev = f"r5_{preset}_eval"
    npz = os.path.join(SAVE, "mid_weights_fp16.npz" if preset == "bair"
                       else f"mid_weights_{preset}_fp16.npz")
    return ae, gpt, ev, npz


def mid_cfg(preset):
    """64px mid configs sharing the flagship pipeline/schedule (8x8 latent
    grid, 64 tokens/frame), half-width networks. Elastic + VGG branches off
    to keep the single-CPU-core data path light.

    bair: scripts/bairhd shapes scaled 4x down (as round 4).
    kinetics: the kinetics protocol's differentiators at mid scale —
    16384-code VQ (kinetics_config z_num, exercising the Pallas VQ kernel at
    its production codebook size), deeper encoder mult (1,2,4,8), and a
    5-frame / 320-token conditioning context (reference
    scripts/kinetics/save_videos.sh:9-15).
    """
    from ccvs_tpu.config import (AutoencoderConfig, Config, DataConfig,
                                 TransformerConfig)

    ae_name, _, _, npz = names(preset)
    kin = preset == "kinetics"  # lrdecay/ext share the bair arch
    cfg = Config(
        name=ae_name,
        save_path=SAVE,
        log_freq=10,
        save_freq=-1,
        save_latest_freq=25,
        npz_mirror=npz,
        data=DataConfig(
            dataset="synthetic", max_dim=64, true_dim=64, vid_len=16,
            batch_size_img=24, batch_size_vid=4, n_consecutive_img=2,
            img_out_of_n=30, num_workers=4,
        ),
        ae=AutoencoderConfig(
            necf=64, necf_mult=(1, 2, 4, 8) if kin else (1, 2, 2, 4),
            ndcf=32, ndcf_mult=(1, 2, 2, 4),
            z_size=256, z_num=16384 if kin else 1024, z_shape=(8, 8),
            max_dim=64,
            inter_p=0.75, skip_memory=4, skip_context=(1, 2, 3, 4),
            use_dv=True, use_direct_recovery_vid=True, slide_inter=True,
            n_consecutive_img=2, vid_len=4, use_aug=True,
        ),
        gpt=TransformerConfig(
            z_num=16384 if kin else 1024, z_len=1024, z_chunk=64,
            cond_len=320 if kin else 64,
            n_layer=8, n_head=8, n_embd=512, z_shape=(8, 8), num_blocks=16,
            emb_mode="temporal", top_k=100, remat=True,
        ),
    )
    if preset == "ext":
        # x0.3 LR decay at iters 300 and 900 (in optimizer updates:
        # 2 updates/iter at vid_step_every=1). First step reproduced the
        # diagnostic's winning arm; the second tests whether a further
        # decay keeps paying once the new plateau is reached.
        import dataclasses as _dc
        cfg = cfg.replace(ae=_dc.replace(cfg.ae, lr_decay_at=(600, 1800),
                                         lr_decay_mult=0.3))
    return cfg


def run_ae(preset, n_iter):
    from ccvs_tpu.train.ae_trainer import FrameAutoencoderTrainer

    ae_name, _, _, _ = names(preset)
    cfg = mid_cfg(preset).replace(n_iter=n_iter)
    resume = os.path.isdir(os.path.join(SAVE, "checkpoints", ae_name))
    FrameAutoencoderTrainer(cfg).run(eval_every=25, snapshot_every=200,
                                     serialize_steps=True, resume=resume)


def run_gpt(preset, n_iter):
    from ccvs_tpu.train.transformer_trainer import TransformerTrainer
    from ccvs_tpu.utils.checkpoint import CheckpointManager

    ae_name, gpt_name, _, _ = names(preset)
    cfg = mid_cfg(preset).replace(name=gpt_name, n_iter=n_iter)
    ckpt = CheckpointManager(os.path.join(SAVE, "checkpoints", ae_name))
    # raw generator, not EMA: at a few hundred iters the 0.999-decay EMA is
    # still mostly init (TRAINRUN.md round-3/4 measurements)
    ae_params = ckpt.load("qvid", "latest")["gen"]
    resume = os.path.isdir(os.path.join(SAVE, "checkpoints", gpt_name))
    # serialize_steps: real step-completion `t` stamps in metrics.jsonl
    # (ADVICE r4) and preemption saves aligned with executed steps
    TransformerTrainer(cfg, ae_params).run(resume=resume, serialize_steps=True)


def run_verify(preset):
    """Check the committable npz is complete and loadable (ADVICE r4:
    guarded — reports what exists instead of crashing on what doesn't)."""
    from ccvs_tpu.port.npz_params import load_params_npz

    _, _, _, npz = names(preset)
    if not os.path.exists(npz):
        print(f"MISSING: {npz} — no trained weights were mirrored")
        return 1
    import numpy as np

    with np.load(npz) as z:
        trees = sorted({k.split("/", 1)[0] for k in z.files})
        n_arrs = len(z.files)
    mb = os.path.getsize(npz) / 1e6
    print(f"{npz}: {mb:.1f} MB, {n_arrs} arrays, trees={trees}")
    loaded = load_params_npz(npz, *trees)
    for t in trees:
        leaves = sum(1 for _ in _iter_leaves(loaded[t]))
        print(f"  {t}: {leaves} leaves, loads OK")
    missing = [t for t in ("ae_gen", "gpt") if t not in trees]
    if missing:
        print(f"INCOMPLETE: missing {missing} (phase not yet past first save)")
        return 1
    print("VERIFY OK")
    return 0


def _iter_leaves(d):
    for v in d.values():
        if isinstance(v, dict):
            yield from _iter_leaves(v)
        else:
            yield v


def run_import(preset):
    """Rebuild orbax checkpoints (the shapes `cli.py generate` loads:
    qvid->{gen}, transformer->{params}) from the committed fp16 npz — the
    recovery path after a disk reset."""
    from ccvs_tpu.port.npz_params import load_params_npz
    from ccvs_tpu.utils.checkpoint import CheckpointManager

    ae_name, gpt_name, _, npz = names(preset)
    trees = load_params_npz(npz, "ae_gen", "gpt")
    ae = CheckpointManager(os.path.join(SAVE, "checkpoints", ae_name))
    ae.save("qvid", 0, {"gen": trees["ae_gen"]}, latest=True)
    gpt = CheckpointManager(os.path.join(SAVE, "checkpoints", gpt_name))
    gpt.save("transformer", 0, {"params": trees["gpt"]}, latest=True)
    print("rebuilt", ae_name, "and", gpt_name, "checkpoints from", npz)


def run_eval(preset, n_batches, score_only=False, cpu=False, fused=False):
    """score_only: skip generation and re-score videos already on disk —
    the recovery path when the eval phase's timeout fires between
    generation and the fvd_trained.json merge (happened for kinetics in
    r5_queue2: the 2400 s budget covered generate + 1.5 of the 4 scoring
    passes). cpu: score with CCVS_FORCE_CPU so a concurrent chip run is
    untouched (the embedders are small; only generation needs the chip)."""
    ae_name, gpt_name, eval_name, npz = names(preset)
    cfg = mid_cfg(preset).replace(name=eval_name)
    os.makedirs(SAVE, exist_ok=True)
    cfg_path = os.path.join(SAVE, f"{eval_name}_config.json")
    with open(cfg_path, "w") as f:
        f.write(cfg.to_json())

    if not score_only:
        gen_cmd = [
            sys.executable, "-m", "ccvs_tpu.cli", "generate",
            "--load-config", cfg_path,
            "--ae-ckpt", os.path.join(SAVE, "checkpoints", ae_name),
            "--ae-raw",
            "--gpt-ckpt", os.path.join(SAVE, "checkpoints", gpt_name),
            "--n-batches", str(n_batches),
        ]
        if fused:
            # serve_fused single-program encode/decode (gated by
            # runs_r5/dispatch_ab.json; pinned exact vs eager by
            # test_generate.py::test_generate_fused_equals_eager) — makes
            # the larger n_batches eval sweeps chip-minutes instead of
            # chip-hours at 64px (23.8x, PERF_NOTES round-5)
            gen_cmd.append("--fused")
        print("+", " ".join(gen_cmd), flush=True)
        # Propagate the phase timeout's SIGTERM to the generate child:
        # python's default SIGTERM exit is silent and ORPHANS the child,
        # which then collides with the next chip phase (observed in
        # r5_queue4: the orphan held the chip into the bench run). Die
        # loudly AND take the child down.
        import signal

        proc = subprocess.Popen(gen_cmd)

        def _term(signum, frame):
            proc.terminate()
            proc.wait(timeout=60)
            print(f"run_eval: SIGTERM during generation (phase budget "
                  f"exhausted); child terminated", flush=True)
            sys.exit(75)

        old = signal.signal(signal.SIGTERM, _term)
        try:
            rc = proc.wait()
        finally:
            signal.signal(signal.SIGTERM, old)
        if rc != 0:
            raise subprocess.CalledProcessError(rc, gen_cmd)

    result_path = os.path.join(SAVE, "results", eval_name)
    score_keys = ("fvd_fake_vs_real_uncalibrated", "fvd_rec_vs_real_uncalibrated",
                  "metrics_rec_vs_real", "metrics_fake_vs_real")
    if score_only and os.path.exists(RESULTS_JSON):
        # safety-net invocation after a bounded eval phase: skip if the
        # eval already merged every scoring pass for the CURRENT video set
        with open(RESULTS_JSON) as f:
            prev = json.load(f).get(preset, {})
        n_now = len(os.listdir(os.path.join(result_path, "fake")))
        if (all(k in prev for k in score_keys)
                and prev.get("n_videos") == n_now):
            print(f"score phase: {preset} already fully scored at "
                  f"n_videos={n_now}; nothing to do")
            return
    if cpu:
        os.environ["CCVS_FORCE_CPU"] = "1"  # inherited by scoring children

    def run_json(cmd):
        # Same SIGTERM propagation as the generation child above: a phase
        # timeout during a scoring pass must not orphan a chip-holding
        # eval-fvd/eval-metrics child into the next phase.
        import signal

        print("+", " ".join(cmd), flush=True)
        proc = subprocess.Popen(cmd, stdout=subprocess.PIPE, text=True)

        def _term(signum, frame):
            proc.terminate()
            try:
                proc.wait(timeout=60)
            except subprocess.TimeoutExpired:
                proc.kill()
            print("run_eval: SIGTERM during scoring; child terminated",
                  flush=True)
            sys.exit(75)

        old = signal.signal(signal.SIGTERM, _term)
        try:
            out, _ = proc.communicate()
        finally:
            signal.signal(signal.SIGTERM, old)
        if proc.returncode != 0:
            raise subprocess.CalledProcessError(proc.returncode, cmd)
        return json.loads(out.strip().splitlines()[-1])

    entry = {
        "protocol": "train 64px mid config -> generate->AVI (16f) -> "
                    "embed+score (ref tools/tf_fvd/fvd.py:263-275)",
        "weights": f"{ae_name} (raw G) + {gpt_name}, trained this round on "
                   f"the chip; committable copy: {npz}",
        "embedders": "random fallback (no vendored I3D/VGG in this env) -> "
                     "all FVD/LPIPS keys are UNCALIBRATED trendline numbers "
                     "(see per-score fallback_embedder flags)",
        "n_videos": len(os.listdir(os.path.join(result_path, "fake"))),
    }

    def merge():
        # one artifact, keyed by preset (bair + kinetics side by side);
        # merged after EVERY scoring pass so a phase timeout keeps the
        # completed scores (the r5_queue2 kinetics lesson)
        out = {}
        if os.path.exists(RESULTS_JSON):
            with open(RESULTS_JSON) as f:
                out = json.load(f)
        out[preset] = entry
        tmp = RESULTS_JSON + ".tmp"
        with open(tmp, "w") as f:
            json.dump(out, f, indent=1)
        os.replace(tmp, RESULTS_JSON)

    merge()
    # one eval-all process: the FVD embedder and the LPIPS VGG compile once
    # and score all four passes (per-pass processes re-paid the minutes-long
    # remote compile 4-6x)
    all_scores = run_json(
        [sys.executable, "-m", "ccvs_tpu.cli", "eval-all",
         "--real", os.path.join(result_path, "real"),
         "--fake", os.path.join(result_path, "fake"),
         "--rec", os.path.join(result_path, "rec"),
         "--chunk", "16"])
    entry["fvd_fake_vs_real_uncalibrated"] = all_scores["fvd_fake_vs_real"]
    entry["fvd_rec_vs_real_uncalibrated"] = all_scores["fvd_rec_vs_real"]
    entry["metrics_rec_vs_real"] = all_scores["metrics_rec_vs_real"]
    entry["metrics_fake_vs_real"] = all_scores["metrics_fake_vs_real"]
    merge()
    print(json.dumps(entry, indent=1))


def run_export_ae(preset):
    """Merge the AE raw-G tree from the orbax checkpoint into the preset's
    committable npz — for AE runs trained WITHOUT npz_mirror (the plateau
    diag arm set npz_mirror='' to keep the chain npz untouched)."""
    from ccvs_tpu.port.npz_params import update_params_npz
    from ccvs_tpu.utils.checkpoint import CheckpointManager

    ae_name, _, _, npz = names(preset)
    ckpt = CheckpointManager(os.path.join(SAVE, "checkpoints", ae_name))
    gen = ckpt.load("qvid", "latest")["gen"]
    update_params_npz(npz, ae_gen=gen)
    print(f"merged {ae_name} raw-G into {npz}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--phase",
                    choices=["ae", "gpt", "eval", "score", "verify",
                             "import", "export-ae"],
                    required=True)
    ap.add_argument("--preset", choices=["bair", "kinetics", "lrdecay", "ext"],
                    default="bair")
    ap.add_argument("--n-iter", type=int, default=None)
    ap.add_argument("--n-batches", type=int, default=2)
    ap.add_argument("--fused", action="store_true",
                    help="generate with serve_fused (single-program "
                         "encode/decode; exact, gated)")
    ap.add_argument("--chip", action="store_true",
                    help="score phase: use the TPU (fast now that resize "
                         "is fused on-device) instead of CCVS_FORCE_CPU")
    args = ap.parse_args()
    if args.phase == "ae":
        run_ae(args.preset, args.n_iter or (1200 if args.preset == "ext"
                                            else 600))
    elif args.phase == "gpt":
        run_gpt(args.preset, args.n_iter or 400)
    elif args.phase == "verify":
        sys.exit(run_verify(args.preset))
    elif args.phase == "import":
        run_import(args.preset)
    elif args.phase == "score":
        run_eval(args.preset, args.n_batches, score_only=True,
                 cpu=not args.chip)
    elif args.phase == "export-ae":
        run_export_ae(args.preset)
    else:
        run_eval(args.preset, args.n_batches, fused=args.fused)
