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
    # keep the registry config.yaml authoritative if dest already has one
    # (the run config is a dump of the same dict); otherwise install it
    dst_config = os.path.join(dest, "config.yaml")
    if not os.path.exists(dst_config):
        shutil.copyfile(src_config, dst_config)

    if args.report and os.path.exists(args.report):
        shutil.copyfile(args.report, os.path.join(dest, "quality_report.json"))

    sizes = {os.path.basename(p): f"{os.path.getsize(p) / 1e6:.1f} MB"
             for p in (dst_weights,)}
    print(json.dumps({"published": dest, **sizes}))


if __name__ == "__main__":
    main()
