#!/bin/bash
# Round-5 chip queue, session 1, part 3 — runs after r5_queue2.sh.
# The 256px dispatch A/B goes LAST among the round's experiments because
# variant C (one outer jit around the whole 15-frame 256px decode rollout)
# is exactly the "very large program" class CLAUDE.md records as able to
# crash the remote-compile service — everything that must not be lost to
# such a crash has already run by the time this starts. The script dumps
# partial JSON after every compile/timing round, so even a kill keeps the
# evidence in runs_r5/dispatch_ab.json, which is the STRICT authorizing
# gate for bench.py's fused serving mode (fused_mode()).
#
# If the artifact lands with C >= 1.05x, the short bench run validates the
# exact program the driver will execute at round end (fused path, 2 iters)
# so an integration failure surfaces now, not in the judged run.
set -x
cd /root/repo || exit 1
echo $$ > /tmp/queue3.pid

timeout -s TERM 5400 python scripts/dispatch_ab_r5.py --full
timeout -s TERM 3000 env CCVS_BENCH_ITERS=2 CCVS_BENCH_GAP_S=2 python bench.py
echo "QUEUE3 DONE"
