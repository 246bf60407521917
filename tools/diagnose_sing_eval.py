#!/usr/bin/env python3
"""Correlate sing_eval per-file mel-L1 with the generator's voice parameters.

Regenerates the deterministic corpora (training/synthetic.py) and prints, per
eval utterance, the voiced-F0 register stats next to the measured mel-L1 from
a quality report, plus the train corpus' register coverage — to pin down
which register the SING checkpoint fails on (quality bimodality diagnosis).

Pure NumPy (imports only training.synthetic) — safe to run next to a TPU job.
"""
import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mbexwn_vocoder_tpu.training.synthetic import synth_utterance


def corpus_stats(seed: int, n: int, style: str, balance: str = "legacy"):
    rng = np.random.RandomState(seed)
    rows = []
    for i in range(n):
        dur = rng.uniform(2.0, 4.0)
        ustyle = style if style != "mixed" else ("singing" if i % 2 else "speech")
        audio, f0 = synth_utterance(rng, duration_s=dur, sr=24000, style=ustyle,
                                    balance=balance)
        v = f0[f0 > 0]
        rows.append({
            "i": i, "style": ustyle, "dur": dur,
            "f0_med": float(np.median(v)) if v.size else 0.0,
            "f0_min": float(v.min()) if v.size else 0.0,
            "f0_max": float(v.max()) if v.size else 0.0,
            "voiced_frac": float((f0 > 0).mean()),
            "rms": float(np.sqrt((audio ** 2).mean())),
        })
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--report", default="mbexwn_vocoder_tpu/models_registry/"
                    "MBExWN_TPU_SING_WNCHA320_24kHz/quality_report.json")
    ap.add_argument("--eval_seed", type=int, default=998)
    ap.add_argument("--train_seed", type=int, default=21)
    ap.add_argument("--train_n", type=int, default=160)
    ap.add_argument("--style", default="singing")
    ap.add_argument("--balance", default="legacy", choices=["legacy", "natural"],
                    help="corpus generator balance; v1 sets (seeds 998/21) are legacy")
    args = ap.parse_args()

    errs = {}
    if os.path.exists(args.report):
        rep = json.load(open(args.report))
        for f in rep["files"]:
            idx = int(f["file"].rsplit("_", 1)[1].split(".")[0])
            errs[idx] = f["mel_L1_dB"]

    print(f"== eval corpus (seed {args.eval_seed}) vs per-file mel-L1 ==")
    ev = corpus_stats(args.eval_seed, 8, args.style, balance=args.balance)
    for r in ev:
        e = errs.get(r["i"], float("nan"))
        print(f"  [{r['i']}] mel-L1 {e:6.2f} dB | f0 med {r['f0_med']:6.1f} Hz "
              f"range {r['f0_min']:5.1f}-{r['f0_max']:6.1f} | voiced {r['voiced_frac']:.2f} "
              f"| rms {r['rms']:.3f} | {r['dur']:.2f}s {r['style']}")

    print(f"\n== train corpus (seed {args.train_seed}, n={args.train_n}) register coverage ==")
    tr = corpus_stats(args.train_seed, args.train_n, args.style, balance=args.balance)
    meds = np.array([r["f0_med"] for r in tr if r["f0_med"] > 0])
    hist, edges = np.histogram(meds, bins=12, range=(100, 700))
    for h, e0, e1 in zip(hist, edges[:-1], edges[1:]):
        print(f"  {e0:5.0f}-{e1:5.0f} Hz: {'#' * h} ({h})")
    print(f"  train f0_med: min {meds.min():.0f}  p10 {np.percentile(meds, 10):.0f}  "
          f"med {np.median(meds):.0f}  p90 {np.percentile(meds, 90):.0f}  max {meds.max():.0f}")
    bad = [r for r in ev if errs.get(r["i"], 0) > 6]
    good = [r for r in ev if errs.get(r["i"], 99) <= 6]
    if bad and good:
        print(f"\n  bad-file f0_med:  {sorted(round(r['f0_med']) for r in bad)}")
        print(f"  good-file f0_med: {sorted(round(r['f0_med']) for r in good)}")


if __name__ == "__main__":
    main()
