#!/usr/bin/env bash
# Finish the SPEECH v3 publication: the chain's default-dtype eval leg was
# killed after a remote-compile wedge (2026-08-20, .runs/chain/SPEECH_eval.log),
# so quality_report.json is missing and the chain skipped publish.  Re-run
# the bf16 eval and publish.  Run ONLY while no other TPU process is live.
set -u
cd "$(dirname "$0")/.."
say() { echo "[speech-finish $(date -u +%H:%M:%S)] $*" >&2; }

run=.runs/speech_v3
dest=mbexwn_vocoder_tpu/models_registry/MBExWN_TPU_SPEECH_WNCHA320_24kHz

say "bf16 eval"
timeout 2700 python tools/quality_eval.py --model "$run" \
    --eval_dir .data/synth_eval_v2 --out "$run/quality_report.json" \
    > .runs/chain/SPEECH_eval_retry.log 2>&1
rc=$?
say "eval exit $rc"
if [ "$rc" -ne 0 ]; then sleep 130; else sleep 90; fi
if [ -s "$run/quality_report.json" ]; then
    say "publish"
    timeout 600 python tools/publish_model.py --run "$run" \
        --report "$run/quality_report.json" --dest "$dest" \
        > .runs/chain/SPEECH_publish_retry.log 2>&1
    say "publish exit $?"
    sleep 90
fi
say "speech finish done"
