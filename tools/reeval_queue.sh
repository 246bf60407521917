#!/usr/bin/env bash
# Round-3 session-6 re-eval queue: the shipped VOICE and SPEECH checkpoints
# (both trained on v1 corpora) re-measured on the v2 (balanced) and shifted
# OOD eval gates, so their quality numbers are comparable with the SING v2
# retrain.  One python-with-jax process at a time (CLAUDE.md "TPU runtime"),
# cool-downs between legs.
#
# Usage: nohup tools/reeval_queue.sh > .runs/reeval.log 2>&1 &
set -u
cd "$(dirname "$0")/.."

COOLDOWN_S=${COOLDOWN_S:-75}
QDIR=.runs/reeval
mkdir -p "$QDIR"

say() { echo "[reeval $(date -u +%H:%M:%S)] $*" >&2; }

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

REG=mbexwn_vocoder_tpu/models_registry
VOICE=$REG/MBExWN_TPU_VOICE_WNCHA340_24kHz
SPEECH=$REG/MBExWN_TPU_SPEECH_WNCHA320_24kHz

run_step voice_v2 2700 python tools/quality_eval.py --model "$VOICE" \
    --eval_dir .data/voice_eval_v2 --out "$QDIR/voice_v2.json"
run_step voice_shift 2700 python tools/quality_eval.py --model "$VOICE" \
    --eval_dir .data/voice_eval_shift --out "$QDIR/voice_shift.json"
run_step speech_v2 2700 python tools/quality_eval.py --model "$SPEECH" \
    --eval_dir .data/synth_eval_v2 --out "$QDIR/speech_v2.json"
run_step speech_shift 2700 python tools/quality_eval.py --model "$SPEECH" \
    --eval_dir .data/synth_eval_shift --out "$QDIR/speech_shift.json"

say "reeval queue complete"
