#!/usr/bin/env python3
"""Round-trip quality evaluation: mel-L1 dB on held-out audio.

For every wav in --eval_dir: analyze -> synthesize with the model under
--model (a registry id or a trained output dir with weights.npz) ->
re-analyze the synthesis -> mean |log-mel| error in dB.  This is exactly the
reference's built-in quality metric (resynth_mel.py:86-96 verbose mode) and
the BASELINE.md quality gate's measurable form.

Usage: python tools/quality_eval.py --model /path/to/run --eval_dir d [--out report.json]
"""
import argparse
import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", required=True)
    ap.add_argument("--eval_dir", required=True)
    ap.add_argument("--out", default=None)
    ap.add_argument("--max_files", type=int, default=0)
    args = ap.parse_args()

    if os.environ.get("MBEXWN_PLATFORM") == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax as _jax

    try:  # persistent compile cache: eval shapes compile once per image
        _cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
        os.makedirs(_cache, exist_ok=True)
        _jax.config.update("jax_compilation_cache_dir", _cache)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
    except Exception:
        pass
    import numpy as np

    from mbexwn_vocoder_tpu.compat.audio_io import read_wav
    from mbexwn_vocoder_tpu.dsp.db import log_to_db
    from mbexwn_vocoder_tpu.mel_inverter import MELInverter

    inv = MELInverter(model_id_or_path=args.model)
    files = sorted(glob.glob(os.path.join(args.eval_dir, "*.wav")))
    if args.max_files:
        files = files[: args.max_files]
    if not files:
        raise SystemExit(f"no wavs under {args.eval_dir}")

    rows = []
    for path in files:
        snd, sr = read_wav(path)
        dd = inv.generate_mel_from_snd(snd, srate=sr)
        log_mel = inv.scale_mel(dd)
        syn = inv.synth_from_mel(log_mel)
        mel_resyn = inv.generate_mel_from_snd(syn, srate=inv.srate)["mell"].T[np.newaxis]
        T = min(log_mel.shape[1], mel_resyn.shape[1])
        err_db = float(log_to_db * np.mean(np.abs(log_mel[:, :T] - mel_resyn[:, :T])))
        rows.append({"file": os.path.basename(path), "mel_L1_dB": round(err_db, 3),
                     "dur_s": round(snd.shape[-1] / sr, 2)})
        print(f"{os.path.basename(path):40s} mel-L1 {err_db:7.3f} dB", file=sys.stderr)

    mean_db = float(np.mean([r["mel_L1_dB"] for r in rows]))
    blk = getattr(inv.model, "block", None)
    # blk.*_compute_dtype is the RESOLVED value (env > config precedence,
    # models/mbexwn.py::_dtype_pref); None means "compute in param dtype",
    # i.e. float32 — record that explicitly so the artifact alone proves
    # which dtype actually applied (advisor round-3 finding).
    report = {"model": args.model, "n_files": len(rows), "mean_mel_L1_dB": round(mean_db, 3),
              "platform": _jax.devices()[0].platform,
              "wn_compute_dtype": str(getattr(blk, "wn_compute_dtype", None) or "float32"),
              "subnet_compute_dtype": str(getattr(blk, "subnet_compute_dtype", None) or "float32"),
              "eval_dir": args.eval_dir,
              "files": rows}
    print(json.dumps(report))
    if args.out:
        json.dump(report, open(args.out, "w"), indent=1)


if __name__ == "__main__":
    main()
