#!/usr/bin/env bash
# Round-5 unattended TPU queue (VERDICT.md round-5 directives #1/#2/#5/#6).
#
# Order (by value; later stages are skipped first when the hard deadline
# approaches):
#   AB  precision A/B: re-eval the published SPEECH checkpoint with the new
#       HIGHEST-precision matmul policy (ops/precision.py) — the published
#       6.672 dB report IS the control leg
#   S1-S3  SING v3 10k/15k/20k staged retrain (publish-guarded each stage;
#          S1 runs the shifted-OOD eval so OOD regressions are visible
#          mid-phase — advisor round-4 note)
#   V1-V3  VOICE v3 10k/15k/20k staged retrain
#   S4/V4/P1  low-LR (1e-5) fine-tune legs (2.5k steps) for SING/VOICE/SPEECH
#   C   companion sweep: primary + shift + fp32 tri-metric reports for every
#       registry model, regenerated against the PUBLISHED weights + committed
#   B   final bench (lock-aware) — warms the driver shapes (32,128)/(1,512)
#       in .jax_cache and refreshes .bench_cache.json
#
# Usage: OLD_CHAIN_PID=<pid> nohup tools/r5_queue.sh > .runs/r5queue/queue.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
mkdir -p .runs/r5queue

say() { echo "[r5 $(date -u +%H:%M:%S)] $*" >&2; }

# stop starting new TRAINING stages this close to the hard deadline; the
# close-out stages (C + B) need ~50 min
HARD_DEADLINE=${HARD_DEADLINE:-$(( $(date +%s) + 6 * 3600 ))}
margin_ok() {  # margin_ok <needed_s>
    local left=$(( HARD_DEADLINE - $(date +%s) ))
    [ "$left" -gt "$1" ]
}

# -- wait for the round-4 chain (SING 5k leg) to fully exit ----------------
if [ -n "${OLD_CHAIN_PID:-}" ]; then
    say "waiting for old chain pid $OLD_CHAIN_PID"
    while kill -0 "$OLD_CHAIN_PID" 2>/dev/null; do sleep 20; done
    say "old chain exited; cooling down 130s"
    sleep 130
fi
# swap in the lock-aware chain script (atomic; the old chain is gone)
if [ -f tools/train_chain_new.sh ]; then
    mv tools/train_chain_new.sh tools/train_chain.sh
    chmod +x tools/train_chain.sh
    git add tools/train_chain.sh && git commit -q -m "train_chain: hold the TPU lock through every leg/eval incl. cooldown; QDIR/RUN_SUFFIX knobs" || true
fi

REG=mbexwn_vocoder_tpu/models_registry
SPEECH_REG=$REG/MBExWN_TPU_SPEECH_WNCHA320_24kHz
LOCKFILE=.runs/tpu.lock

lock_step() {  # lock_step <name> <timeout_s> <cmd...>
    local name=$1 tmo=$2; shift 2
    say "step $name: $*"
    (
        flock -w 7200 9 || { say "step $name: TPU lock timeout"; exit 9; }
        timeout "$tmo" "$@" > ".runs/r5queue/$name.log" 2>&1
        local rc=$?
        say "step $name exit $rc"
        if [ "$rc" -ne 0 ]; then sleep 130; else sleep 100; fi
    ) 9>>"$LOCKFILE"
}

stage() {  # stage <name> <needed_s> <env...> -- runs train_chain.sh
    local name=$1 needed=$2; shift 2
    # reserve ~60 min on top of the stage's own duration for the close-out
    # stages (companion sweep + final bench) that must always run
    if ! margin_ok $(( needed + 3600 )); then
        say "SKIP stage $name (deadline margin)"
        return 0
    fi
    say "=== stage $name ==="
    env "$@" QDIR=".runs/r5queue/$name" bash tools/train_chain.sh \
        > ".runs/r5queue/$name.chain.log" 2>&1
    say "=== stage $name done ==="
}

# -- AB: precision lever measurement (published SPEECH weights) ------------
lock_step ab_speech_prec 2700 python tools/quality_eval.py \
    --model "$SPEECH_REG" --eval_dir .data/synth_eval_v2 \
    --out .runs/r5queue/speech_prec_ab.json
if [ -s .runs/r5queue/speech_prec_ab.json ]; then
    git add -f .runs/r5queue/speech_prec_ab.json 2>/dev/null || true
    git commit -q -m "Precision A/B: published SPEECH weights re-evaled under the HIGHEST-precision matmul policy" || true
fi

# -- SING staged retrain ---------------------------------------------------
COMMON="MODELS=SING CORPUS=v3 AUTOCOMMIT=1 SKIP_FP32=1"
stage S1 $(( 45*60 )) $COMMON STEPS=10000 LEG_STEPS=5000 SKIP_SHIFT=0
stage S2 $(( 40*60 )) $COMMON STEPS=15000 LEG_STEPS=5000 SKIP_SHIFT=1
stage S3 $(( 40*60 )) $COMMON STEPS=20000 LEG_STEPS=5000 SKIP_SHIFT=1

# -- VOICE staged retrain --------------------------------------------------
COMMONV="MODELS=VOICE CORPUS=v3 AUTOCOMMIT=1 SKIP_FP32=1"
stage V1 $(( 70*60 )) $COMMONV STEPS=10000 LEG_STEPS=5000 SKIP_SHIFT=0
stage V2 $(( 40*60 )) $COMMONV STEPS=15000 LEG_STEPS=5000 SKIP_SHIFT=1
stage V3 $(( 40*60 )) $COMMONV STEPS=20000 LEG_STEPS=5000 SKIP_SHIFT=1

# -- low-LR fine-tune legs (the SPEECH 15k->20k plateau lever) -------------
stage S4 $(( 35*60 )) $COMMON  STEPS=22500 LEG_STEPS=22500 SKIP_SHIFT=1 \
    EXTRA_TRAIN_ARGS="-a training_config:optimizer:learning_rate=1.0e-5"
stage V4 $(( 35*60 )) $COMMONV STEPS=22500 LEG_STEPS=22500 SKIP_SHIFT=1 \
    EXTRA_TRAIN_ARGS="-a training_config:optimizer:learning_rate=1.0e-5"
stage P1 $(( 35*60 )) MODELS=SPEECH CORPUS=v3 AUTOCOMMIT=1 SKIP_FP32=1 SKIP_SHIFT=1 \
    RUN_SUFFIX=_ft STEPS=17500 LEG_STEPS=17500 \
    EXTRA_TRAIN_ARGS="--init_from $SPEECH_REG/weights.npz --init_step 15000 -a training_config:optimizer:learning_rate=1.0e-5"

# -- C: companion evidence sweep over the PUBLISHED registry weights -------
for M in SING SPEECH VOICE; do
    case $M in
    SING)   D=$REG/MBExWN_TPU_SING_WNCHA320_24kHz;  EV=.data/sing_eval_v2;  SH=.data/sing_eval_shift ;;
    SPEECH) D=$SPEECH_REG;                          EV=.data/synth_eval_v2; SH=.data/synth_eval_shift ;;
    VOICE)  D=$REG/MBExWN_TPU_VOICE_WNCHA340_24kHz; EV=.data/voice_eval_v2; SH=.data/voice_eval_shift ;;
    esac
    lock_step "C_${M}_primary" 2700 python tools/quality_eval.py --model "$D" --eval_dir "$EV" --out "$D/quality_report.json"
    lock_step "C_${M}_shift"   2700 python tools/quality_eval.py --model "$D" --eval_dir "$SH" --out "$D/quality_report_shift.json"
    lock_step "C_${M}_fp32"    2700 env MBEXWN_WN_DTYPE= MBEXWN_SUBNET_DTYPE= \
        python tools/quality_eval.py --model "$D" --eval_dir "$EV" --out "$D/quality_report_fp32.json"
    # drop the superseded v2gate companion if the primary now covers that set
    if [ -f "$D/quality_report_v2gate.json" ]; then rm -f "$D/quality_report_v2gate.json"; fi
    git add "$D" && git commit -q -m "Registry $M: tri-metric primary + shift + fp32 evidence reports (published weights)" || true
done

# -- B: final bench (also primes the driver shapes in .jax_cache) ----------
say "final bench"
timeout 3600 python bench.py > .runs/r5queue/bench_final.json 2> .runs/r5queue/bench_final.err
cat .runs/r5queue/bench_final.json >&2 || true
git add .bench_cache.json 2>/dev/null && git commit -q -m "bench: refresh headline cache after round-5 retrains" || true

say "r5 queue complete"
