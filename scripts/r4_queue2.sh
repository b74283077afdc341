#!/bin/bash
# Round-4 chip-work queue (session 2): runs AFTER the in-flight bench.py
# validation run releases the chip, so the two never contend for the tunnel.
#
#   1. wait for runs_r4/bench_validation_r4.log to finish (sentinel "rc=")
#      and record the parsed tail as runs_r4/bench_validation_r4.json
#   2. train the 64px mid-config frame-AE   (bounded, SIGTERM -> checkpoint)
#   3. train the mid latent transformer     (bounded, SIGTERM -> checkpoint)
#   4. generate + FVD/PSNR/SSIM/LPIPS  ->   runs_r4/fvd_trained.json
#
# Each phase is independently resumable; rerunning the script skips nothing
# but resumes trainers from their rolling `latest` checkpoints.
set -x
cd /root/repo || exit 1

python - <<'EOF'
import json, os, time

LOG = "runs_r4/bench_validation_r4.log"
OUT = "runs_r4/bench_validation_r4.json"
deadline = time.time() + 50 * 60
while time.time() < deadline:
    try:
        with open(LOG) as f:
            text = f.read()
    except OSError:
        text = ""
    if "rc=" in text:
        break
    time.sleep(20)
parsed, rc = None, None
for line in text.splitlines():
    line = line.strip()
    if line.startswith("{"):
        try:
            parsed = json.loads(line)
        except ValueError:
            pass
    elif line.startswith("rc="):
        rc = int(line[3:])
with open(OUT, "w") as f:
    json.dump({"rc": rc, "parsed": parsed,
               "note": "in-session validation of the exact driver bench run"},
              f, indent=1)
print("bench validation:", rc, parsed)
EOF

timeout -s TERM 600 python scripts/fvd_mid_r4.py --phase ae
timeout -s TERM 420 python scripts/fvd_mid_r4.py --phase gpt
timeout 1800 python scripts/fvd_mid_r4.py --phase eval --n-batches 4
echo "QUEUE2 DONE"
