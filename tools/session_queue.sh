#!/usr/bin/env bash
# Run the queued single-tenant TPU measurements after a training run
# completes.  Pure bash supervisor (never imports jax), safe to keep running
# while the trainer owns the device: it only launches python once the
# trainer's done marker appears (or the trainer is gone), and runs each step
# sequentially with a cool-down between processes (this relay is
# single-tenant; see CLAUDE.md / PERFORMANCE.md methodology).
#
# Usage: session_queue.sh <train_log> <run_dir> <model_id> <eval_dir>
# Example:
#   nohup tools/session_queue.sh .runs/sing_xl.log .runs/sing_xl SING \
#     .data/sing_eval > .runs/queue.log 2>&1 &
# PROFILES=0 skips the model-independent profile/bench steps (for a second
# queue chained behind another training run).
set -u
TRAIN_LOG=$1; RUN_DIR=$2; MODEL=$3; EVAL_DIR=$4
DONE_MARKER="exported inference model to"
COOLDOWN_S=${COOLDOWN_S:-100}
PROFILES=${PROFILES:-1}
QDIR=${QDIR:-.runs/queue}
mkdir -p "$QDIR"

say() { echo "[queue $(date -u +%H:%M:%S)] $*" >&2; }

# 1. wait for the trainer to finish (marker in log).  If the trainer dies
#    without the marker (round end / relay), stop: a partial run is exported
#    by hand via tools/export_from_checkpoint.py.
say "waiting for done marker in $TRAIN_LOG"
while ! grep -q "$DONE_MARKER" "$TRAIN_LOG" 2>/dev/null; do
    sleep 60
done
say "trainer done; cooling down ${COOLDOWN_S}s"
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

# registry destination for the publish step (publish_model requires --dest)
case "$MODEL" in
    SPEECH) DEST=mbexwn_vocoder_tpu/models_registry/MBExWN_TPU_SPEECH_WNCHA320_24kHz ;;
    SING)   DEST=mbexwn_vocoder_tpu/models_registry/MBExWN_TPU_SING_WNCHA320_24kHz ;;
    VOICE)  DEST=mbexwn_vocoder_tpu/models_registry/MBExWN_TPU_VOICE_WNCHA340_24kHz ;;
    *)      DEST="" ;;
esac

# 2. quality eval + publish the fresh checkpoint
run_step quality_eval 2700 python tools/quality_eval.py --model "$RUN_DIR" \
    --eval_dir "$EVAL_DIR" --out "$RUN_DIR/quality_report.json"
if [ -s "$RUN_DIR/quality_report.json" ] && [ -n "$DEST" ]; then
    run_step publish 600 python tools/publish_model.py --run "$RUN_DIR" \
        --report "$RUN_DIR/quality_report.json" --dest "$DEST"
fi

if [ "$PROFILES" = "1" ]; then
    # 3. per-stage profile: default vs fused F0 tail vs int8 WaveNet serving
    run_step profile_default 2700 python tools/profile_stages.py --iters 8
    run_step profile_fused_tail 2700 env MBEXWN_FUSED_TAIL=1 python tools/profile_stages.py --iters 8
    run_step profile_int8 2700 env MBEXWN_WN_QUANT=int8 python tools/profile_stages.py --iters 8

    # 3b. int8 quality cost on the SHIPPED registry checkpoint: same model +
    # eval set, default vs MBEXWN_WN_QUANT=int8 (the delta is the number
    # ops/quant.py's docstring promises in PERFORMANCE.md)
    run_step quality_registry_default 2700 python tools/quality_eval.py \
        --model SPEECH --eval_dir .data/synth_eval --out "$QDIR/quality_registry_default.json"
    run_step quality_registry_int8 2700 env MBEXWN_WN_QUANT=int8 python tools/quality_eval.py \
        --model SPEECH --eval_dir .data/synth_eval --out "$QDIR/quality_registry_int8.json"

    # 4. batch-1 serving: blocking vs pipelined
    run_step bench_serving 2700 python tools/bench_serving.py --n 16 --frames 400

    # 5. refresh the driver bench cache (cold .jax_cache already warmed by now)
    run_step bench_full 3600 python bench.py
fi

say "queue complete"
