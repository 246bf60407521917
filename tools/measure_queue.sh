#!/usr/bin/env bash
# Post-training measurement queue for the single-tenant TPU: waits for the
# train_chain.sh done marker, then runs the round-3 measurement checklist
# sequentially (one python-with-jax process at a time, cool-downs between).
#
# Usage: nohup tools/measure_queue.sh > .runs/measure.log 2>&1 &
set -u
cd "$(dirname "$0")/.."

CHAIN_LOG=${CHAIN_LOG:-.runs/chain.log}
COOLDOWN_S=${COOLDOWN_S:-90}
QDIR=.runs/measure
mkdir -p "$QDIR"

say() { echo "[measure $(date -u +%H:%M:%S)] $*" >&2; }

say "waiting for 'chain complete' in $CHAIN_LOG"
while ! grep -q "chain complete" "$CHAIN_LOG" 2>/dev/null; do
    sleep 60
done
say "chain done; cooling down ${COOLDOWN_S}s"
sleep "$COOLDOWN_S"

run_step() {  # run_step <name> <timeout_s> <cmd...>
    local name=$1 tmo=$2; shift 2
    say "step $name: $*"
    timeout "$tmo" "$@" > "$QDIR/$name.log" 2>&1
    local rc=$?
    say "step $name exit $rc"
    # CLAUDE.md TPU runtime: a crashed/killed TPU process (timeout kills
    # count) needs a >=120 s quiet period before the next claimant.
    if [ "$rc" -ne 0 ]; then sleep "${CRASH_COOLDOWN_S:-130}"; else sleep "$COOLDOWN_S"; fi
    return 0
}

# 1. batch-1 gap (VERDICT r2 #5): default vs fused Pallas stack, + per-stage
#    profile at the serving bucket; b32 Pallas A/B decides whether the Pallas
#    stack can be the TPU default (cold-start motivation, VERDICT r2 #9)
run_step b1_default 1200 python bench.py --one 1 512
run_step b1_pallas 1200 env MBEXWN_PALLAS_WN=1 python bench.py --one 1 512
run_step b32_pallas 1200 env MBEXWN_PALLAS_WN=1 python bench.py --one 32 128
run_step profile_b1 2700 python tools/profile_stages.py --batch 1 --tmel 512 --iters 8

# 2. causal live-streaming latency row (VERDICT r2 #3b)
run_step latency 2700 python tools/bench_latency.py --out .runs/latency.json

# 3. VOICE single-stream long-form chunk sweep (VERDICT r2 weak #6)
run_step longform_sweep 2700 python bench.py --longform --chunk_sweep

# 4. cold-start serving (VERDICT r2 #9): pallas vs conv vs warm cache
run_step cold_pallas 1800 python tools/bench_cold_start.py --mode pallas
run_step cold_conv 2400 python tools/bench_cold_start.py --mode conv
run_step cold_warm 1200 python tools/bench_cold_start.py --mode warm

# 5. refresh the driver headline bench (+ .bench_cache.json)
run_step bench_full 3600 python bench.py

say "measure queue complete"
