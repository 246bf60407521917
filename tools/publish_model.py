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
    args = ap.parse_args()

    src_weights = os.path.join(args.run, "weights.npz")
    src_config = os.path.join(args.run, "config.yaml")
    for p in (src_weights, src_config):
        if not os.path.exists(p):
            raise SystemExit(f"missing {p} — did the training run complete?")

    dest = args.dest
    if dest is None:
        raise SystemExit("--dest is required (registry model dir)")
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
        # ship the companion evidence reports when the eval produced them:
        # forced-fp32 (dtype-cost isolation) and the shifted out-of-
        # distribution set (generalization leg of the quality gate)
        for suffix in ("_fp32", "_shift"):
            side = args.report.replace(".json", f"{suffix}.json")
            if side != args.report and os.path.exists(side):
                shutil.copyfile(side, os.path.join(dest, f"quality_report{suffix}.json"))

    sizes = {os.path.basename(p): f"{os.path.getsize(p) / 1e6:.1f} MB"
             for p in (dst_weights,)}
    print(json.dumps({"published": dest, **sizes}))


if __name__ == "__main__":
    main()
