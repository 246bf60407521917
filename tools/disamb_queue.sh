#!/usr/bin/env bash
# Disambiguation eval promised in PERFORMANCE.md ("Compute dtype" section):
# the v1-XL SING checkpoint (extracted from git history at 1a1e868 into
# .runs/sing_v1xl_ckpt) on its legacy eval set, TPU fp32 — the missing leg
# of the session-4 platform-vs-dtype confounder (TPU bf16 5.71 dB vs CPU
# fp32 4.18 dB).  If TPU fp32 ~= 5.7, the gap was platform; if ~= 4.2, dtype.
#
# Usage: nohup tools/disamb_queue.sh > .runs/disamb.log 2>&1 &
set -u
cd "$(dirname "$0")/.."

COLD_LOG=${COLD_LOG:-.runs/coldstart.log}
COOLDOWN_S=${COOLDOWN_S:-75}
QDIR=.runs/disamb
mkdir -p "$QDIR"

say() { echo "[disamb $(date -u +%H:%M:%S)] $*" >&2; }

say "waiting for 'coldstart queue complete' in $COLD_LOG"
while ! grep -q "coldstart queue complete" "$COLD_LOG" 2>/dev/null; do
    sleep 30
done
say "coldstart done; cooling down ${COOLDOWN_S}s"
sleep "$COOLDOWN_S"

say "step sing_v1xl_fp32"
timeout 2700 env MBEXWN_WN_DTYPE= MBEXWN_SUBNET_DTYPE= \
    python tools/quality_eval.py --model .runs/sing_v1xl_ckpt \
    --eval_dir .data/sing_eval --out "$QDIR/sing_v1xl_legacyeval_tpufp32.json" \
    > "$QDIR/sing_v1xl_fp32.log" 2>&1
say "step sing_v1xl_fp32 exit $?"

say "disamb queue complete"
