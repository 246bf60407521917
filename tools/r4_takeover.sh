#!/usr/bin/env bash
# Round-4 close-out takeover (2026-08-20): this session's host has 4 CPU
# cores (the earlier 97-min/20k-step measurements were taken on a beefier
# host) and the measured rate is ~0.63 s/step, so the launched 20k-step
# 4-leg chain cannot finish inside the session.  The chain's bash was
# stopped after leg 1 started; this script resumes ONE long leg to a
# time-boxed step target, runs the evals, publishes (with autocommit), and
# then releases the TPU to tools/measure_queue_r4.sh by appending the
# 'chain complete' marker it waits for.
#
# Usage: TARGET=12000 nohup tools/r4_takeover.sh > .runs/takeover.log 2>&1 &
set -u
cd "$(dirname "$0")/.."

TARGET=${TARGET:?set TARGET (total step count for the resumed leg)}
COOLDOWN_S=${COOLDOWN_S:-90}
run=.runs/speech_v3
dest=mbexwn_vocoder_tpu/models_registry/MBExWN_TPU_SPEECH_WNCHA320_24kHz
say() { echo "[takeover $(date -u +%H:%M:%S)] $*" >&2; }

say "waiting for leg-1 export marker in $run.leg5000.log"
while ! grep -q "exported inference model to" "$run.leg5000.log" 2>/dev/null; do
    sleep 20
done
say "leg 1 done; cooling down ${COOLDOWN_S}s"
sleep "$COOLDOWN_S"

say "resumed leg to step $TARGET"
timeout 10800 python bin/train.py SPEECH -d .data/synth_train_v3 -o "$run" \
    --steps "$TARGET" --num_workers 3 > "$run.leg$TARGET.log" 2>&1
rc=$?
say "leg exit $rc"
if [ "$rc" -ne 0 ]; then sleep 130; else sleep "$COOLDOWN_S"; fi

if grep -q "exported inference model to" "$run.leg$TARGET.log"; then
    say "eval bf16"
    timeout 2700 python tools/quality_eval.py --model "$run" \
        --eval_dir .data/synth_eval_v2 --out "$run/quality_report.json" \
        > .runs/chain/SPEECH_eval.log 2>&1
    say "eval exit $?"; sleep "$COOLDOWN_S"
    if [ -s "$run/quality_report.json" ]; then
        say "publish"
        timeout 600 python tools/publish_model.py --run "$run" \
            --report "$run/quality_report.json" --dest "$dest" \
            > .runs/chain/SPEECH_publish.log 2>&1
        say "publish exit $?"
        if [ -n "$(git status --porcelain "$dest")" ]; then
            git add "$dest" && git commit -q -m "Publish SPEECH v3-corpus checkpoint (${TARGET} steps)" \
                && say "registry committed"
        fi
        sleep 30
    fi
    say "eval shifted"
    timeout 2700 python tools/quality_eval.py --model "$run" \
        --eval_dir .data/synth_eval_shift --out "$run/quality_report_shift.json" \
        > .runs/chain/SPEECH_eval_shift.log 2>&1
    say "shift exit $?"; sleep "$COOLDOWN_S"
    if [ -s "$run/quality_report_shift.json" ] && \
       [ -n "$(find "$dest/weights.npz" -newer "$run/quality_report.json" 2>/dev/null)" ]; then
        cp "$run/quality_report_shift.json" "$dest/quality_report_shift.json"
        git add "$dest" && git commit -q -m "Ship SPEECH v3 shifted-OOD companion report" \
            && say "shift report committed"
    fi
else
    say "resumed leg never exported; skipping eval/publish"
fi

say "releasing TPU to measure queue"
echo "chain complete" >> .runs/chain_r4b.log
say "takeover done"
