#!/usr/bin/env python3
"""Regenerate the synthetic training/eval corpora the shipped checkpoints
were trained on (deterministic per seed; see training/synthetic.py).

The published registry checkpoints' provenance:
  SPEECH: train .data/synth_train  (seed 10, 40 utt, speech style)
          eval  .data/synth_eval   (seed 999, 8 utt)
  SING:   train .data/sing_train   (seed 11, 40 utt, singing style)
          eval  .data/sing_eval    (seed 998, 8 utt)
  VOICE:  train .data/voice_train  (seed 12, 40 utt, mixed style)
          eval  .data/voice_eval   (seed 997, 8 utt)

Usage: python tools/make_corpora.py [--root .data]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mbexwn_vocoder_tpu.training.synthetic import make_corpus

SPECS = [
    ("synth_train", 10, 40, "speech"),
    ("synth_eval", 999, 8, "speech"),
    ("sing_train", 11, 40, "singing"),
    ("sing_eval", 998, 8, "singing"),
    ("voice_train", 12, 40, "mixed"),
    ("voice_eval", 997, 8, "mixed"),
]

# larger variance-matched corpora for extended training runs (--xl); the
# train seeds differ from the base corpora so the 40-utterance sets are NOT
# subsets — a checkpoint's provenance names exactly one spec row
XL_SPECS = [
    ("synth_train_xl", 20, 160, "speech"),
    ("sing_train_xl", 21, 160, "singing"),
    ("voice_train_xl", 22, 160, "mixed"),
]

# out-of-distribution eval sets (--shifted): every voice parameter drawn from
# non-overlapping ranges (see synthetic.synth_utterance shifted=True) -- the
# quality gate's generalization leg, since train/eval otherwise share the
# generator distribution
SHIFTED_SPECS = [
    ("synth_eval_shift", 1999, 8, "speech"),
    ("sing_eval_shift", 1998, 8, "singing"),
    ("voice_eval_shift", 1997, 8, "mixed"),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default=".data")
    ap.add_argument("--xl", action="store_true", help="also build the 160-utterance training corpora")
    ap.add_argument("--shifted", action="store_true",
                    help="also build the out-of-distribution eval sets")
    args = ap.parse_args()
    for name, seed, n, style in SPECS + (XL_SPECS if args.xl else []):
        out = os.path.join(args.root, name)
        paths = make_corpus(out, n_utterances=n, seed=seed, style=style, quiet=True)
        print(f"{out}: {len(paths)} utterances ({style}, seed {seed})")
    if args.shifted:
        for name, seed, n, style in SHIFTED_SPECS:
            out = os.path.join(args.root, name)
            paths = make_corpus(out, n_utterances=n, seed=seed, style=style, quiet=True,
                                shifted=True)
            print(f"{out}: {len(paths)} utterances ({style}, seed {seed}, SHIFTED)")


if __name__ == "__main__":
    main()
