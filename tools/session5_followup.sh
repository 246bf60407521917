#!/usr/bin/env bash
# Session-5 follow-up queue: waits for the measurement queue to finish, then
# re-evaluates the SHIPPED VOICE checkpoint (v1-XL-corpus trained) on the v2
# and shifted eval sets so its quality numbers are comparable with the v2
# retrains even if no TPU time remains for a VOICE retrain.  One
# python-with-jax process at a time (CLAUDE.md "TPU runtime").
#
# Usage: nohup tools/session5_followup.sh > .runs/followup.log 2>&1 &
set -u
cd "$(dirname "$0")/.."

MEASURE_LOG=${MEASURE_LOG:-.runs/measure.log}
COOLDOWN_S=${COOLDOWN_S:-90}
QDIR=.runs/voice_reeval
mkdir -p "$QDIR"

say() { echo "[followup $(date -u +%H:%M:%S)] $*" >&2; }

say "waiting for 'measure queue complete' in $MEASURE_LOG"
while ! grep -q "measure queue complete" "$MEASURE_LOG" 2>/dev/null; do
    sleep 60
done
say "measure queue done; cooling down ${COOLDOWN_S}s"
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

VOICE=mbexwn_vocoder_tpu/models_registry/MBExWN_TPU_VOICE_WNCHA340_24kHz
run_step voice_v2eval 2700 python tools/quality_eval.py --model "$VOICE" \
    --eval_dir .data/voice_eval_v2 --out "$QDIR/quality_report_v2eval.json"
run_step voice_v2eval_fp32 2700 env MBEXWN_WN_DTYPE= MBEXWN_SUBNET_DTYPE= \
    python tools/quality_eval.py --model "$VOICE" \
    --eval_dir .data/voice_eval_v2 --out "$QDIR/quality_report_v2eval_fp32.json"
run_step voice_shift 2700 python tools/quality_eval.py --model "$VOICE" \
    --eval_dir .data/voice_eval_shift --out "$QDIR/quality_report_shift.json"

say "followup complete"
