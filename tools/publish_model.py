#!/usr/bin/env python3
"""Publish a trained run as a distributable model directory.

Takes a training output dir (weights.npz + config.yaml written by
bin/train.py) and installs it into the model registry — the same
"config + weights side by side" layout the reference distributes its
pretrained checkpoints in (reference mel_inverter.py:184-239, zip layout of
download_and_install_MBExWN_pretrained_models.sh).  Weights are downcast to
float16 + zip-compressed for distribution (~4x smaller than raw fp32 .npz);
`load_params` restores fp32 master params at load.

Usage:
  python tools/publish_model.py --run .runs/speech_synth \
      --dest mbexwn_vocoder_tpu/models_registry/MBExWN_TPU_SPEECH_WNCHA320_24kHz \
      [--report .runs/speech_synth/quality_report.json]
"""
import argparse
import json
import os
import shutil
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mbexwn_vocoder_tpu.compat.params_io import load_params, save_params


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--run", required=True, help="training output dir (weights.npz + config.yaml)")
    ap.add_argument("--dest", default=None, help="registry model dir (default: keep run config's registry id)")
    ap.add_argument("--report", default=None, help="quality_report.json to ship alongside")
    ap.add_argument("--fp32", action="store_true", help="keep fp32 weights (no distribution downcast)")
    ap.add_argument("--take-run-config", action="store_true",
                    help="replace an existing registry config.yaml with the run's config")
    ap.add_argument("--force", action="store_true",
                    help="publish even if the new quality report is worse than the "
                         "registry's existing report on the same eval set")
    args = ap.parse_args()

    src_weights = os.path.join(args.run, "weights.npz")
    src_config = os.path.join(args.run, "config.yaml")
    for p in (src_weights, src_config):
        if not os.path.exists(p):
            raise SystemExit(f"missing {p} — did the training run complete?")

    dest = args.dest
    if dest is None:
        raise SystemExit("--dest is required (registry model dir)")

    # no-downgrade guard: an unattended retrain chain must never replace a
    # better checkpoint with a worse one.  Compare means only against an
    # existing registry report measured on the SAME eval set (the registry
    # may carry reports from different gate generations, e.g. the v1-gate
    # quality_report.json next to quality_report_v2gate.json).
    if args.report and os.path.exists(args.report) and not args.force:
        new_rep = json.load(open(args.report))
        for name in ("quality_report.json", "quality_report_v2gate.json"):
            old_path = os.path.join(dest, name)
            if not os.path.exists(old_path):
                continue
            old_rep = json.load(open(old_path))
            if old_rep.get("eval_dir") != new_rep.get("eval_dir"):
                continue
            # Means are only comparable when both evals ran under the same
            # numerics regime.  Round-5 incident: after the matmul-precision
            # fix every re-eval improved ~2.4 dB, so a *worse* new model
            # still beat the registry's stale pre-fix mean and a downgrade
            # was published.  When regimes differ, demand an explicit
            # decision instead of comparing across them.
            regime = ("matmul_precision", "platform")
            if any(old_rep.get(k) != new_rep.get(k) for k in regime):
                raise SystemExit(
                    f"refusing to publish over {old_path}: the existing report was "
                    f"measured under a different numerics regime "
                    f"({ {k: old_rep.get(k) for k in regime} } vs "
                    f"{ {k: new_rep.get(k) for k in regime} }), so means are not "
                    "comparable.  Re-evaluate the PUBLISHED weights under the "
                    "current policy (tools/quality_eval.py --model <registry dir>), "
                    "ship that as quality_report.json, then retry — or pass --force."
                )
            if new_rep["mean_mel_L1_dB"] > old_rep["mean_mel_L1_dB"]:
                raise SystemExit(
                    f"refusing to downgrade {dest}: new mean "
                    f"{new_rep['mean_mel_L1_dB']} dB > published "
                    f"{old_rep['mean_mel_L1_dB']} dB on {old_rep.get('eval_dir')} "
                    f"({name}).  Pass --force to publish anyway."
                )

    os.makedirs(dest, exist_ok=True)

    params = load_params(src_weights)
    dst_weights = os.path.join(dest, "weights.npz")
    if args.fp32:
        save_params(dst_weights, params, compressed=True)
    else:
        save_params(dst_weights, params, dtype=np.float16, compressed=True)
    # the run's config.yaml is what the weights were actually trained under
    # (it may differ from the registry's via --cargs overrides); publishing
    # weights against a mismatched architecture config would fail at load or,
    # worse, load silently wrong.  If dest already has a config, require the
    # model-defining blocks to agree; --take-run-config replaces it.
    dst_config = os.path.join(dest, "config.yaml")
    if os.path.exists(dst_config) and not args.take_run_config:
        # resolve <@CONFIG_DIR@/...> includes on both sides before comparing:
        # registry configs reference common/base.yaml, run configs are dumped
        # fully resolved
        from mbexwn_vocoder_tpu.config.config_utils import read_config

        run_cfg = read_config(src_config)
        reg_cfg = read_config(dst_config)
        for key in ("mbexwn_config", "preprocess_config"):
            if run_cfg.get(key) != reg_cfg.get(key):
                raise SystemExit(
                    f"run config's {key} differs from the registry config at {dst_config} — "
                    "the trained weights would not match the published architecture. "
                    "Pass --take-run-config to publish the run's config instead."
                )
    else:
        shutil.copyfile(src_config, dst_config)

    if args.report and os.path.exists(args.report):
        shutil.copyfile(args.report, os.path.join(dest, "quality_report.json"))
        # a *_v2gate companion that re-measured the PREVIOUS weights on this
        # same eval set is superseded by the new primary report (the history
        # stays in git + PERFORMANCE.md; a report describing replaced weights
        # must not sit next to the new ones)
        v2gate = os.path.join(dest, "quality_report_v2gate.json")
        if os.path.exists(v2gate):
            new_rep = json.load(open(args.report))
            if json.load(open(v2gate)).get("eval_dir") == new_rep.get("eval_dir"):
                os.remove(v2gate)
        # ship the companion evidence reports when the eval produced them:
        # forced-fp32 (dtype-cost isolation) and the shifted out-of-
        # distribution set (generalization leg of the quality gate)
        # a companion that was NOT regenerated for these weights describes the
        # replaced checkpoint and must not sit next to the new ones — same
        # rule as the v2gate companion above (it can be re-shipped later by
        # copying it into dest once the eval runs).
        for suffix in ("_fp32", "_shift"):
            side = args.report.replace(".json", f"{suffix}.json")
            dst_side = os.path.join(dest, f"quality_report{suffix}.json")
            if side != args.report and os.path.exists(side):
                shutil.copyfile(side, dst_side)
            elif os.path.exists(dst_side):
                os.remove(dst_side)

    sizes = {os.path.basename(p): f"{os.path.getsize(p) / 1e6:.1f} MB"
             for p in (dst_weights,)}
    print(json.dumps({"published": dest, **sizes}))


if __name__ == "__main__":
    main()
