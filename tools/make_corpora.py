#!/usr/bin/env python3
"""Regenerate the synthetic training/eval corpora the shipped checkpoints
were trained on (deterministic per seed; see training/synthetic.py).

v2 corpora (the default build) use balance="natural": fricative noise mixed
8-20 dB below the voiced RMS, like real voices. The v1 corpora (--legacy)
had an unnatural balance — fricative bursts ~15 dB ABOVE voiced content —
which let the mel-L1 quality gate partly measure easy noise resynthesis
(round-3 diagnosis, tools/diagnose_sing_eval.py). v1 remains reproducible
only as provenance of the pre-v2 published checkpoints.

Current published registry checkpoint provenance (v2):
  SPEECH: train .data/synth_train_v2 (seed 30, 160 utt, speech style)
          eval  .data/synth_eval_v2  (seed 1099, 8 utt)
  SING:   train .data/sing_train_v2  (seed 31, 160 utt, singing style)
          eval  .data/sing_eval_v2   (seed 1098, 8 utt)
  VOICE:  train .data/voice_train_v2 (seed 32, 160 utt, mixed style)
          eval  .data/voice_eval_v2  (seed 1097, 8 utt)

Usage: python tools/make_corpora.py [--root .data] [--shifted] [--legacy]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mbexwn_vocoder_tpu.training.synthetic import make_corpus

# v3 training corpora (--v3): the round-4 quality lever.  Same natural
# balance and distribution as v2, 10x the utterance count — the round-3
# analysis showed held-out error is generalization-bound (train-set mel
# loss ~2.1 dB vs 8.1-8.6 dB held-out from 160 utterances) and training
# wall-time is corpus-size-independent at fixed steps.  Eval gates stay
# the v2 + shifted sets so the numbers remain comparable across rounds.
# The 480-utterance mid-size speech corpus is the middle point of the
# corpus-size-vs-error curve (used if the curve flattens before the bar).
V3_SPECS = [
    ("synth_train_v3", 40, 1600, "speech"),
    ("sing_train_v3", 41, 1600, "singing"),
    ("voice_train_v3", 42, 1600, "mixed"),
    ("synth_train_v3mid", 43, 480, "speech"),
]

# (name, seed, n, style) — natural balance, the current training/eval sets
V2_SPECS = [
    ("synth_train_v2", 30, 160, "speech"),
    ("synth_eval_v2", 1099, 8, "speech"),
    ("sing_train_v2", 31, 160, "singing"),
    ("sing_eval_v2", 1098, 8, "singing"),
    ("voice_train_v2", 32, 160, "mixed"),
    ("voice_eval_v2", 1097, 8, "mixed"),
]

# out-of-distribution eval sets (--shifted), natural balance: every voice
# parameter drawn from non-overlapping ranges (synthetic.synth_utterance
# shifted=True) — the quality gate's generalization leg
SHIFTED_SPECS = [
    ("synth_eval_shift", 1999, 8, "speech"),
    ("sing_eval_shift", 1998, 8, "singing"),
    ("voice_eval_shift", 1997, 8, "mixed"),
]

# v1 (--legacy): provenance of checkpoints published before the v2 retrain
LEGACY_SPECS = [
    ("synth_train", 10, 40, "speech"),
    ("synth_eval", 999, 8, "speech"),
    ("sing_train", 11, 40, "singing"),
    ("sing_eval", 998, 8, "singing"),
    ("voice_train", 12, 40, "mixed"),
    ("voice_eval", 997, 8, "mixed"),
    ("synth_train_xl", 20, 160, "speech"),
    ("sing_train_xl", 21, 160, "singing"),
    ("voice_train_xl", 22, 160, "mixed"),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default=".data")
    ap.add_argument("--shifted", action="store_true",
                    help="also build the out-of-distribution eval sets")
    ap.add_argument("--v3", action="store_true",
                    help="also build the 10x v3 training corpora (round-4 quality lever)")
    ap.add_argument("--legacy", action="store_true",
                    help="also build the v1 (unbalanced) corpora for pre-v2 provenance")
    args = ap.parse_args()
    for name, seed, n, style in V2_SPECS:
        out = os.path.join(args.root, name)
        paths = make_corpus(out, n_utterances=n, seed=seed, style=style, quiet=True)
        print(f"{out}: {len(paths)} utterances ({style}, seed {seed})")
    if args.v3:
        for name, seed, n, style in V3_SPECS:
            out = os.path.join(args.root, name)
            paths = make_corpus(out, n_utterances=n, seed=seed, style=style, quiet=True)
            print(f"{out}: {len(paths)} utterances ({style}, seed {seed}, v3)", flush=True)
    if args.shifted:
        for name, seed, n, style in SHIFTED_SPECS:
            out = os.path.join(args.root, name)
            paths = make_corpus(out, n_utterances=n, seed=seed, style=style, quiet=True,
                                shifted=True)
            print(f"{out}: {len(paths)} utterances ({style}, seed {seed}, SHIFTED)")
    if args.legacy:
        for name, seed, n, style in LEGACY_SPECS:
            out = os.path.join(args.root, name)
            paths = make_corpus(out, n_utterances=n, seed=seed, style=style, quiet=True,
                                balance="legacy")
            print(f"{out}: {len(paths)} utterances ({style}, seed {seed}, LEGACY v1)")


if __name__ == "__main__":
    main()
