#!/usr/bin/env python3
"""Round-trip quality evaluation: mel-L1 dB + F0-RMSE + MCD on held-out audio.

For every wav in --eval_dir: analyze -> synthesize with the model under
--model (a registry id or a trained output dir with weights.npz) ->
re-analyze the synthesis.  Three metrics per file (the round-3/4 lesson:
mel-L1 alone was fooled once by a corpus-balance artifact, so the gate is
triangulated):

- mel_L1_dB   — mean |log-mel| error in dB; exactly the reference's built-in
                quality metric (resynth_mel.py:86-96 verbose mode) and the
                BASELINE.md quality gate's measurable form.
- f0_rmse_hz / voicing_err_pct — YIN F0 contours (dsp/f0.py) of original vs
                resynthesis; RMSE over frames both call voiced, plus the
                voiced/unvoiced decision mismatch rate.  Guards pitch errors
                a broadband mel-L1 barely moves.
- mcd_dB      — mel-cepstral distortion: orthonormal DCT-II cepstra of the
                log-mel frames, coefficients 1..24 (c0/energy excluded),
                (10*sqrt(2)/ln 10)*||dc||_2 per frame, mean over frames.
                The standard timbre metric, computed from the same aligned
                mel pair as mel_L1_dB.

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
    from mbexwn_vocoder_tpu.dsp.f0 import estimate_f0
    from mbexwn_vocoder_tpu.mel_inverter import MELInverter

    inv = MELInverter(model_id_or_path=args.model)
    _blk = getattr(inv.model, "block", None)
    f0_min = float(getattr(_blk, "pp_min_frequency", 50.0) or 50.0)
    f0_max = float(getattr(_blk, "pp_max_frequency", 600.0) or 600.0)

    def _f0_metrics(orig, syn, sr):
        """F0-RMSE (Hz, frames voiced in both) + voicing mismatch (%)."""
        hop = max(1, int(round(sr / 80.0)))  # the model's 80 Hz frame rate
        f_o = estimate_f0(orig, sr, hop, fmin=max(f0_min, 40.0), fmax=f0_max)
        f_s = estimate_f0(np.asarray(syn, dtype=np.float64), sr, hop,
                          fmin=max(f0_min, 40.0), fmax=f0_max)
        n = min(f_o.shape[-1], f_s.shape[-1])
        f_o, f_s = f_o[:n], f_s[:n]
        v_o, v_s = f_o > 0, f_s > 0
        both = v_o & v_s
        rmse = float(np.sqrt(np.mean((f_o[both] - f_s[both]) ** 2))) if both.any() else float("nan")
        verr = float(np.mean(v_o != v_s) * 100.0) if n else float("nan")
        return rmse, verr

    def _mcd(mel_a, mel_b):
        """Mel-cepstral distortion (dB) between aligned log-mel frame sets."""
        from scipy.fft import dct

        c_a = dct(np.asarray(mel_a), type=2, norm="ortho", axis=-1)[..., 1:25]
        c_b = dct(np.asarray(mel_b), type=2, norm="ortho", axis=-1)[..., 1:25]
        per_frame = np.sqrt(np.sum((c_a - c_b) ** 2, axis=-1))
        return float((10.0 * np.sqrt(2.0) / np.log(10.0)) * np.mean(per_frame))
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
        mcd = _mcd(log_mel[0, :T], mel_resyn[0, :T])
        syn_np = np.asarray(syn).reshape(-1)
        n_cmp = min(snd.shape[-1], syn_np.shape[-1])
        f0_rmse, voicing_err = _f0_metrics(snd[..., :n_cmp].reshape(-1), syn_np[:n_cmp], sr)
        rows.append({"file": os.path.basename(path), "mel_L1_dB": round(err_db, 3),
                     "mcd_dB": round(mcd, 3),
                     "f0_rmse_hz": round(f0_rmse, 2) if np.isfinite(f0_rmse) else None,
                     "voicing_err_pct": round(voicing_err, 2) if np.isfinite(voicing_err) else None,
                     "dur_s": round(snd.shape[-1] / sr, 2)})
        print(f"{os.path.basename(path):40s} mel-L1 {err_db:7.3f} dB  "
              f"MCD {mcd:6.3f} dB  F0-RMSE {f0_rmse:6.2f} Hz  V-err {voicing_err:5.2f}%",
              file=sys.stderr)

    mean_db = float(np.mean([r["mel_L1_dB"] for r in rows]))
    mean_mcd = float(np.mean([r["mcd_dB"] for r in rows]))
    f0_vals = [r["f0_rmse_hz"] for r in rows if r["f0_rmse_hz"] is not None]
    mean_f0 = float(np.mean(f0_vals)) if f0_vals else None
    v_vals = [r["voicing_err_pct"] for r in rows if r["voicing_err_pct"] is not None]
    mean_verr = float(np.mean(v_vals)) if v_vals else None
    blk = getattr(inv.model, "block", None)
    # blk.*_compute_dtype is the RESOLVED value (env > config precedence,
    # models/mbexwn.py::_dtype_pref); None means "compute in param dtype",
    # i.e. float32 — record that explicitly so the artifact alone proves
    # which dtype actually applied (advisor round-3 finding).
    report = {"model": args.model, "n_files": len(rows), "mean_mel_L1_dB": round(mean_db, 3),
              "mean_mcd_dB": round(mean_mcd, 3),
              "mean_f0_rmse_hz": round(mean_f0, 2) if mean_f0 is not None else None,
              "mean_voicing_err_pct": round(mean_verr, 2) if mean_verr is not None else None,
              "platform": _jax.devices()[0].platform,
              # ops/precision.py policy actually in effect (round-5: DEFAULT
              # truncation cost the TPU gate ~2.4 dB; provenance matters)
              "matmul_precision": (os.environ.get("MBEXWN_MATMUL_PRECISION") or "highest"),
              "wn_compute_dtype": str(getattr(blk, "wn_compute_dtype", None) or "float32"),
              "subnet_compute_dtype": str(getattr(blk, "subnet_compute_dtype", None) or "float32"),
              "eval_dir": args.eval_dir,
              "files": rows}
    print(json.dumps(report))
    if args.out:
        json.dump(report, open(args.out, "w"), indent=1)


if __name__ == "__main__":
    main()
