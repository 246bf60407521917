#!/usr/bin/env bash
# Round-4 continuation queue: staged quality retrains, banked after every
# stage so a session cutoff or workspace reset cannot lose more than one
# stage of TPU time (each stage = train leg -> eval -> guarded publish ->
# registry autocommit via tools/train_chain.sh AUTOCOMMIT=1).
#
#   Phase A: SPEECH v3 extension 10k -> 20k in 2.5k-step stages, warm-started
#            from the published registry checkpoint (the Orbax run state was
#            destroyed in the inter-session reset; --init_from recovers it).
#            Shifted-OOD companion eval only at the final stage.
#   Phase B: SING v3 retrain from scratch in 5k/2.5k stages (same recipe that
#            took SPEECH 8.53 -> 7.67 dB at half the step budget).
#
# Exactly one python-with-jax process at a time (train_chain owns that
# invariant); run this under nohup and watch .runs/r4cont.log.
set -u
# ARCHIVED (round 5): superseded by tools/r5_queue.sh.  A leftover instance
# of this queue survived the round-4/5 session boundary and raced the r5
# queue's chain for the single-tenant TPU (2026-08-20 21:31, three
# concurrent trainers).  It is kept as provenance of the round-4 stages but
# refuses to run.
echo "r4cont_queue.sh is archived; use tools/r5_queue.sh" >&2
exit 2
cd "$(dirname "$0")/.."
mkdir -p .runs

export AUTOCOMMIT=1 SKIP_FP32=1 CORPUS=v3
SPEECH_REG=mbexwn_vocoder_tpu/models_registry/MBExWN_TPU_SPEECH_WNCHA320_24kHz

say() { echo "[r4cont $(date -u +%H:%M:%S)] $*"; }

stage() {  # stage <MODEL> <target_steps> <skip_shift> [extra train args...]
    local model=$1 tgt=$2 skip_shift=$3; shift 3
    say "=== stage $model -> $tgt steps (skip_shift=$skip_shift) ==="
    MODELS=$model STEPS=$tgt LEG_STEPS=$tgt SKIP_SHIFT=$skip_shift \
        EXTRA_TRAIN_ARGS="$*" tools/train_chain.sh
    say "=== stage $model -> $tgt done ==="
    sleep 100
}

# Phase A — SPEECH 10k -> 20k (warm start applies only to the first stage;
# later stages resume the Orbax checkpoint the first stage writes).
WARM="--init_from $SPEECH_REG/weights.npz --init_step 10000"
stage SPEECH 12500 1 $WARM
stage SPEECH 15000 1 $WARM
stage SPEECH 17500 1 $WARM
stage SPEECH 20000 0 $WARM

# Phase B — SING v3 from scratch.  Early evals double as the SING step-curve
# points; the publish guard refuses until the new model beats the v2-corpus
# 8.57 dB registry report, so nothing can downgrade.
stage SING 5000 1
stage SING 10000 0
stage SING 12500 1
stage SING 15000 0

say "queue complete"
