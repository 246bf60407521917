#!/usr/bin/env bash
# Chain the v2/v3-corpus retrains of the registry models on the
# single-tenant TPU, unattended: for each model, train under
# tools/train_watchdog.sh, then run the quality evals (shipped-default dtype,
# fp32, and the out-of-distribution shifted set), then publish into the
# registry. Pure bash between python steps; exactly ONE python-with-jax
# process ever runs at a time (see CLAUDE.md "TPU runtime").
#
# Every TPU-claiming step (training legs incl. their watchdog restarts,
# evals, publishes) holds an exclusive flock on .runs/tpu.lock THROUGH its
# post-exit cooldown, so a concurrent `python bench.py` (which acquires the
# same lock, tools/tpu_lock.py) can never race a leg for the device — the
# round-4 driver bench did exactly that and its captured b1 halved.
#
# Usage: nohup tools/train_chain.sh > .runs/chain.log 2>&1 &
#   MODELS="SING SPEECH" tools/train_chain.sh   # subset / custom order
#   RUN_SUFFIX=_ft STEPS=17500 LEG_STEPS=17500 \
#     EXTRA_TRAIN_ARGS="--init_from <weights.npz> --init_step 15000 -a training_config:optimizer:learning_rate=1.0e-5" \
#     tools/train_chain.sh                      # low-LR fine-tune leg in a fresh run dir
set -u
cd "$(dirname "$0")/.."

STEPS=${STEPS:-20000}
LEG_STEPS=${LEG_STEPS:-5000}
COOLDOWN_S=${COOLDOWN_S:-100}
MODELS=${MODELS:-"SING SPEECH VOICE"}
# CORPUS selects the training-set generation (v2 = 160 utt, v3 = 1600 utt,
# round-4 quality lever).  Eval gates stay the v2 + shifted sets either way
# so quality reports remain comparable across corpus generations.
CORPUS=${CORPUS:-v3}
# RUN_SUFFIX gives a stage its own run dir (e.g. a fine-tune leg that must
# NOT resume the base run's Orbax checkpoint at a higher step).
RUN_SUFFIX=${RUN_SUFFIX:-}
QDIR=${QDIR:-.runs/chain}
LOCKFILE=.runs/tpu.lock
mkdir -p "$QDIR"

say() { echo "[chain $(date -u +%H:%M:%S)] $*" >&2; }

run_step() {  # run_step <name> <timeout_s> <cmd...>
    local name=$1 tmo=$2; shift 2
    say "step $name: $*"
    (
        flock -w 7200 9 || { say "step $name: TPU lock timeout"; exit 9; }
        timeout "$tmo" "$@" > "$QDIR/$name.log" 2>&1
        local rc=$?
        say "step $name exit $rc"
        # CLAUDE.md TPU runtime: a crashed/killed TPU process (timeout kills
        # count) needs a >=120 s quiet period before the next claimant; hold
        # the lock through the cooldown so the next claimant's wait IS the
        # cooldown.
        if [ "$rc" -ne 0 ]; then sleep "${CRASH_COOLDOWN_S:-130}"; else sleep "$COOLDOWN_S"; fi
    ) 9>>"$LOCKFILE"
    return 0
}

train_one() {  # train_one <model> <train_dir> <eval_dir> <shift_dir> <run> <dest>
    local model=$1 train_dir=$2 eval_dir=$3 shift_dir=$4 run=$5 dest=$6
    local pidfile="$run.pid"
    if [ ! -d "$train_dir" ]; then
        say "$model: train dir $train_dir missing; skipping"
        return 1
    fi
    mkdir -p "$run"

    # Train in process LEGS of LEG_STEPS each, resuming from the Orbax
    # checkpoint between legs: the relay runtime retains ~7 MB of host
    # memory per enqueued step (measured 2026-08-20; unaffected by gc or
    # explicit buffer deletes), so one 20k-step process OOMs a 125 GB host
    # around step 13k.  A leg exits cleanly at its --steps target (printing
    # the export marker), bounding RSS to ~LEG_STEPS * 7 MB + model.
    local legs
    legs=$(seq "$LEG_STEPS" "$LEG_STEPS" "$STEPS")
    case " $legs " in *" $STEPS "*) ;; *) legs="$legs $STEPS" ;; esac
    local tgt
    for tgt in $legs; do
        local log="$run.leg$tgt.log"
        say "=== $model: training to step $tgt/$STEPS on $train_dir -> $run ==="
        (
            flock -w 7200 9 || { say "$model: TPU lock timeout for leg $tgt"; exit 9; }
            # a previous stage/chain may have left (a) a live trainer on the
            # shared pidfile -- never launch beside it (single-tenant TPU) --
            # and (b) a done marker in this REUSED leg log, which would let
            # the watchdog+wait fall through while the fresh trainer is still
            # initializing (observed 2026-08-20: three concurrent trainers).
            # Wait out stragglers, then truncate the log.
            old_pid=$(cat "$pidfile" 2>/dev/null || true)
            while [ -n "$old_pid" ] && kill -0 "$old_pid" 2>/dev/null; do
                say "$model: waiting for straggler trainer pid $old_pid"
                sleep 20
            done
            : > "$log"
            # EXTRA_TRAIN_ARGS (word-split on purpose): e.g. warm-start flags
            # "--init_from <registry>/weights.npz --init_step 10000" when the
            # Orbax run dir was lost but the published checkpoint survived.
            nohup python bin/train.py "$model" -d "$train_dir" -o "$run" \
                --steps "$tgt" --num_workers 3 ${EXTRA_TRAIN_ARGS:-} > "$log" 2>&1 < /dev/null &
            echo $! > "$pidfile"

            # watchdog blocks until the done marker appears (restarting through
            # relay wedges), or gives up after MAX_RESTARTS
            tools/train_watchdog.sh "$pidfile" "$log" "exported inference model to" -- \
                python bin/train.py "$model" -d "$train_dir" -o "$run" \
                --steps "$tgt" --num_workers 3 ${EXTRA_TRAIN_ARGS:-} 2>> "$run.watchdog.log"
            sleep "$COOLDOWN_S"
        ) 9>>"$LOCKFILE"
        if ! grep -q "exported inference model to" "$log" 2>/dev/null; then
            say "$model: leg to step $tgt never finished; skipping eval/publish"
            return 1
        fi
        say "$model: leg to step $tgt done (cooled down under lock)"
    done

    run_step "${model}_eval" 2700 python tools/quality_eval.py \
        --model "$run" --eval_dir "$eval_dir" --out "$run/quality_report.json"
    # SKIP_FP32=1 drops the fp32 companion eval (the fp32==bf16 quality
    # equivalence is already established; saves ~15 min of TPU per model
    # when the session is wall-clock bound).
    if [ "${SKIP_FP32:-0}" != "1" ]; then
        run_step "${model}_eval_fp32" 2700 env MBEXWN_WN_DTYPE= MBEXWN_SUBNET_DTYPE= \
            python tools/quality_eval.py --model "$run" --eval_dir "$eval_dir" \
            --out "$run/quality_report_fp32.json"
    fi
    # Publish directly after the primary eval (shift eval follows): if the
    # session is cut off mid-chain the trained weights are already in the
    # tracked registry instead of stranded in gitignored .runs/.
    if [ -s "$run/quality_report.json" ]; then
        run_step "${model}_publish" 600 python tools/publish_model.py --run "$run" \
            --report "$run/quality_report.json" --dest "$dest"
        # AUTOCOMMIT=1: commit the registry immediately after a successful
        # publish so a workspace reset between sessions cannot lose a
        # trained model (the .runs/ checkpoints are gitignored and were
        # lost exactly this way on 2026-08-20).
        if [ "${AUTOCOMMIT:-0}" = "1" ] && [ -n "$(git status --porcelain "$dest")" ]; then
            git add "$dest" && git commit -q -m "Publish $model $CORPUS-corpus checkpoint (train_chain autocommit)" \
                && say "$model: registry committed" || say "$model: autocommit failed"
        fi
    fi
    # SKIP_SHIFT=1 defers the shifted-OOD companion eval (e.g. intermediate
    # stages of a staged retrain; the final stage runs it).
    if [ "${SKIP_SHIFT:-0}" = "1" ]; then return 0; fi
    run_step "${model}_eval_shift" 2700 python tools/quality_eval.py \
        --model "$run" --eval_dir "$shift_dir" --out "$run/quality_report_shift.json"
    # ship the shifted-OOD companion next to the published weights (only if
    # this model's new weights actually were published above)
    if [ -s "$run/quality_report_shift.json" ] && [ -n "$(find "$dest/weights.npz" -newer "$run/quality_report.json" 2>/dev/null)" ]; then
        cp "$run/quality_report_shift.json" "$dest/quality_report_shift.json"
        if [ "${AUTOCOMMIT:-0}" = "1" ] && [ -n "$(git status --porcelain "$dest")" ]; then
            git add "$dest" && git commit -q -m "Ship $model $CORPUS shifted-OOD companion report" \
                && say "$model: shift report committed" || say "$model: shift autocommit failed"
        fi
    fi
    return 0
}

for m in $MODELS; do
    case "$m" in
    SING)
        train_one SING  ".data/sing_train_$CORPUS"  .data/sing_eval_v2  .data/sing_eval_shift \
            ".runs/sing_$CORPUS$RUN_SUFFIX"  mbexwn_vocoder_tpu/models_registry/MBExWN_TPU_SING_WNCHA320_24kHz ;;
    SPEECH)
        train_one SPEECH ".data/synth_train_$CORPUS" .data/synth_eval_v2 .data/synth_eval_shift \
            ".runs/speech_$CORPUS$RUN_SUFFIX" mbexwn_vocoder_tpu/models_registry/MBExWN_TPU_SPEECH_WNCHA320_24kHz ;;
    VOICE)
        train_one VOICE ".data/voice_train_$CORPUS" .data/voice_eval_v2 .data/voice_eval_shift \
            ".runs/voice_$CORPUS$RUN_SUFFIX" mbexwn_vocoder_tpu/models_registry/MBExWN_TPU_VOICE_WNCHA340_24kHz ;;
    *) say "unknown model '$m'" ;;
    esac
done

say "chain complete"
