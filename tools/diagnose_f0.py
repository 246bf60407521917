#!/usr/bin/env python3
"""F0-predictor diagnosis against the synthetic corpus's ground truth.

Regenerates an eval corpus in-process (same seeds as tools/make_corpora.py,
so the ground-truth F0 contour is known exactly), runs ONLY the model's F0
subnet (`block.generate_f0`) on each utterance's mel, and reports per-file
pitch accuracy on voiced frames: median |cents| error, gross-error rate
(>100 cents), and octave-error rate (within 100 cents of ±1200).  Separates
"the checkpoint mis-predicts pitch" from "the envelope/excitation is off" —
the two failure modes a plain mel-L1 number can't tell apart
(reference's own validator reports only mel error, resynth_mel.py:86-96).

CPU-friendly: the F0 subnet is ~2% of the model's FLOPs; no WaveNet runs.

Usage: python tools/diagnose_f0.py --model SING --style singing --seed 998 [--n 8]
"""
import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="SING")
    ap.add_argument("--style", default="singing", choices=["speech", "singing", "mixed"])
    ap.add_argument("--seed", type=int, default=998, help="corpus seed (998=sing_eval, 999=synth_eval, 997=voice_eval)")
    ap.add_argument("--n", type=int, default=8)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax

    if os.environ.get("MBEXWN_PLATFORM", "cpu") == "cpu":
        jax.config.update("jax_platforms", "cpu")

    from mbexwn_vocoder_tpu.mel_inverter import MELInverter
    from mbexwn_vocoder_tpu.training.synthetic import synth_utterance

    inv = MELInverter(args.model)
    model = inv.model
    hop = model.spect_hop_size
    stp = model.block.spect_to_pulse_upsampling_factor
    pulse_sr = model.sample_rate / hop * stp

    # regenerate the eval corpus stream (same RNG consumption order as
    # make_corpus so utterance i matches synthetic_<seed>_<i:04d>.wav)
    rng = np.random.RandomState(args.seed)
    rows = []
    for i in range(args.n):
        dur = rng.uniform(2.0, 4.0)
        ustyle = args.style if args.style != "mixed" else ("singing" if i % 2 else "speech")
        audio, f0_true = synth_utterance(rng, duration_s=dur, sr=24000, style=ustyle)

        dd = inv.generate_mel_from_snd(audio, srate=24000)
        mel = inv.scale_mel(dd)
        # the F0 subnet consumes the RMS-normalized conditioning mel exactly
        # as infer() builds it (models/pan_wavenet.py::infer)
        if model.norm_mel_components is not None:
            _, in_mell, _ = model.norm_mel_components.normalize_inputs_by_rms(
                None, mel, synth_length=mel.shape[1] * hop)
        else:
            in_mell = mel
        f0_pred = np.asarray(model.block.generate_f0(inv.params, in_mell))[0]  # (T_mel*stp,)

        # ground truth at pulse rate (sample-rate contour -> decimate)
        idx = np.clip((np.arange(f0_pred.shape[0]) * 24000 / pulse_sr).astype(int), 0, f0_true.shape[0] - 1)
        f0_ref = f0_true[idx]
        voiced = f0_ref > 0
        if not voiced.any():
            continue
        cents = 1200.0 * np.log2(np.maximum(f0_pred[voiced], 1e-3) / f0_ref[voiced])
        rows.append({
            "utt": f"synthetic_{args.seed:03d}_{i:04d}", "style": ustyle,
            "median_abs_cents": round(float(np.median(np.abs(cents))), 1),
            "gross_err_pct": round(float(np.mean(np.abs(cents) > 100.0) * 100), 1),
            "octave_err_pct": round(float(np.mean(np.abs(np.abs(cents) - 1200.0) < 100.0) * 100), 1),
            "f0_range_hz": [round(float(f0_ref[voiced].min()), 1), round(float(f0_ref[voiced].max()), 1)],
        })
        print(f"{rows[-1]['utt']} [{ustyle:7s}] median {rows[-1]['median_abs_cents']:7.1f} cents, "
              f"gross {rows[-1]['gross_err_pct']:5.1f}%, octave {rows[-1]['octave_err_pct']:5.1f}%, "
              f"F0 {rows[-1]['f0_range_hz']}", file=sys.stderr)

    report = {"model": args.model, "corpus_seed": args.seed, "files": rows}
    print(json.dumps(report))
    if args.out:
        json.dump(report, open(args.out, "w"), indent=1)


if __name__ == "__main__":
    main()
