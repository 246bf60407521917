#!/usr/bin/env bash
# Corpus-size-vs-error curve leg (VERDICT r3 #1 fallback): if the v3
# (1600-utterance) SPEECH retrain does NOT reach the <=6 dB bar, train the
# mid-size (480-utterance) corpus point so the 40/160 -> 480 -> 1600 curve
# proves where the corpus-size asymptote sits.  Waits for the round-4
# measurement queue so exactly one python-with-jax process runs at a time.
#
# Usage: nohup tools/curve_queue.sh > .runs/curve.log 2>&1 &
set -u
cd "$(dirname "$0")/.."

MEASURE_LOG=${MEASURE_LOG:-.runs/measure_r4.log}
REPORT=${REPORT:-.runs/speech_v3/quality_report.json}
BAR_DB=${BAR_DB:-6.0}
STEPS=${STEPS:-20000}
COOLDOWN_S=${COOLDOWN_S:-100}
QDIR=.runs/curve
mkdir -p "$QDIR"

say() { echo "[curve $(date -u +%H:%M:%S)] $*" >&2; }

say "waiting for 'measure-r4 queue complete' in $MEASURE_LOG"
while ! grep -q "measure-r4 queue complete" "$MEASURE_LOG" 2>/dev/null; do
    sleep 60
done
say "measure queue done; cooling down ${COOLDOWN_S}s"
sleep "$COOLDOWN_S"

mean=$(python -c "import json,sys; print(json.load(open('$REPORT'))['mean_mel_L1_dB'])" 2>/dev/null)
if [ -z "$mean" ]; then
    say "no v3 SPEECH report at $REPORT; skipping curve leg"
    exit 0
fi
need=$(python -c "print(1 if float('$mean') > float('$BAR_DB') else 0)")
if [ "$need" != "1" ]; then
    say "v3 SPEECH mean ${mean} dB <= ${BAR_DB} dB bar; curve leg not needed"
    exit 0
fi
say "v3 SPEECH mean ${mean} dB > ${BAR_DB} dB; training the 480-utterance mid point"

run=.runs/speech_v3mid
log="$run.log"; pidfile="$run.pid"
mkdir -p "$run"
nohup python bin/train.py SPEECH -d .data/synth_train_v3mid -o "$run" \
    --steps "$STEPS" --num_workers 3 > "$log" 2>&1 < /dev/null &
echo $! > "$pidfile"
tools/train_watchdog.sh "$pidfile" "$log" "exported inference model to" -- \
    python bin/train.py SPEECH -d .data/synth_train_v3mid -o "$run" \
    --steps "$STEPS" --num_workers 3 2>> "$run.watchdog.log"
if ! grep -q "exported inference model to" "$log" 2>/dev/null; then
    say "mid-point trainer never finished"
    exit 1
fi
sleep "$COOLDOWN_S"
timeout 2700 python tools/quality_eval.py --model "$run" \
    --eval_dir .data/synth_eval_v2 --out "$run/quality_report.json" \
    > "$QDIR/eval.log" 2>&1
say "mid-point eval exit $?"
sleep "$COOLDOWN_S"
timeout 2700 python tools/quality_eval.py --model "$run" \
    --eval_dir .data/synth_eval_shift --out "$run/quality_report_shift.json" \
    > "$QDIR/eval_shift.log" 2>&1
say "mid-point shift eval exit $?"
say "curve queue complete"
