#!/usr/bin/env python3
"""Aggregate quality reports into the PERFORMANCE.md matrix.

Scans the model registry (and optionally extra run dirs) for
quality_report*.json files and prints one table row per model:
mean mel-L1 dB (+ per-file range) for the primary gate, the fp32
companion, and the shifted-OOD companion — the tri-gate evidence layout
tools/publish_model.py ships.

Usage: python tools/quality_matrix.py [--runs .runs/speech_v3 ...] [--md]
"""
import argparse
import glob
import json
import os


def _fmt(rep):
    if rep is None:
        return "—"
    vals = [r["mel_L1_dB"] for r in rep.get("files", [])]
    rng = f" ({min(vals):.2f}–{max(vals):.2f})" if vals else ""
    return f"{rep['mean_mel_L1_dB']:.2f} dB{rng}"


def _load(path):
    try:
        return json.load(open(path))
    except Exception:
        return None


def collect(dirs):
    rows = []
    for d in dirs:
        pri = _load(os.path.join(d, "quality_report.json"))
        if pri is None:
            continue
        rows.append({
            "model": os.path.basename(d.rstrip("/")),
            "primary": pri,
            "fp32": _load(os.path.join(d, "quality_report_fp32.json")),
            "shift": _load(os.path.join(d, "quality_report_shift.json")),
            "v2gate": _load(os.path.join(d, "quality_report_v2gate.json")),
        })
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--registry", default="mbexwn_vocoder_tpu/models_registry")
    ap.add_argument("--runs", nargs="*", default=[], help="extra run dirs to include")
    ap.add_argument("--md", action="store_true", help="markdown table output")
    args = ap.parse_args()

    dirs = sorted(glob.glob(os.path.join(args.registry, "MBExWN_TPU_*"))) + list(args.runs)
    rows = collect(dirs)
    if args.md:
        print("| Model | gate (eval set) | mean mel-L1 | fp32 | shifted OOD |")
        print("|---|---|---|---|---|")
        for r in rows:
            p = r["primary"]
            print(f"| {r['model']} | {os.path.basename(p.get('eval_dir', '?'))} "
                  f"({p.get('platform', '?')} {p.get('wn_compute_dtype', '?')}) "
                  f"| {_fmt(p)} | {_fmt(r['fp32'])} | {_fmt(r['shift'])} |")
    else:
        for r in rows:
            p = r["primary"]
            print(f"{r['model']:45s} gate={p.get('eval_dir', '?'):28s} "
                  f"primary={_fmt(p):24s} fp32={_fmt(r['fp32']):24s} shift={_fmt(r['shift'])}")
            if r["v2gate"] is not None:
                print(f"{'':45s} v2gate(companion)={_fmt(r['v2gate'])}")


if __name__ == "__main__":
    main()
