#!/usr/bin/env python3
"""Export inference weights from a training run's latest Orbax checkpoint.

bin/train.py writes `weights.npz` + `config.yaml` only when its step loop
completes; a run that was killed (or is still mid-flight) has neither, just
`checkpoints/<step>/`.  This tool materializes both so the run can be
published (`tools/publish_model.py`) or loaded directly by MELInverter:

  python tools/export_from_checkpoint.py --run .runs/voice_synth --model VOICE

--model names the registry config the run was launched with (used to write
the resolved config.yaml the trainer would have dumped; pass the same
--cargs overrides if any were used at launch).
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--run", required=True, help="training output dir containing checkpoints/")
    ap.add_argument("--model", required=True, help="registry id / config source the run used")
    ap.add_argument("--cargs", default=None, nargs="+", help="config overrides used at launch")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")  # restore to host, never claim the TPU

    import mbexwn_vocoder_tpu as mv
    from mbexwn_vocoder_tpu.compat.params_io import save_params
    from mbexwn_vocoder_tpu.config import config_utils as cutils
    from mbexwn_vocoder_tpu.training.checkpointing import CheckpointManager

    ckpt_dir = os.path.join(args.run, "checkpoints")
    if not os.path.isdir(ckpt_dir):
        raise SystemExit(f"no checkpoints under {args.run}")
    params, step = CheckpointManager(ckpt_dir).restore_params_only()
    if params is None:
        raise SystemExit(f"no completed checkpoint in {ckpt_dir}")

    hparams = cutils.read_config(mv.get_config_file(model_id_or_path=args.model))
    if args.cargs:
        cutils.modify_config(hparams, args.cargs)

    save_params(os.path.join(args.run, "weights.npz"), params)
    cutils.dump_config(os.path.join(args.run, "config.yaml"), hparams)
    print(json.dumps({"run": args.run, "exported_step": step}))


if __name__ == "__main__":
    main()
