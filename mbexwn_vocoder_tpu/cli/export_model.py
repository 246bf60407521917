"""CLI: AOT-export a model to a self-contained StableHLO serving artifact.

No reference counterpart (the reference always needs the Python model code;
see compat/export.py).  The artifact runs with jax alone:

    from mbexwn_vocoder_tpu.compat.export import synth_from_artifact
    wav = synth_from_artifact("model.aot", mel)   # (B, T_mel, 80) float32
"""
from __future__ import annotations

import sys


def main(model, output, t_mel, batch_size=1, platforms=None, verbose=False):
    from ..compat.export import export_model_dir

    meta = export_model_dir(model, output, T_mel=t_mel, batch_size=batch_size,
                            platforms=platforms, verbose=verbose)
    print(f"wrote {output}: {meta['bytes']} bytes, platforms={meta['platforms']}, "
          f"input=({meta['batch_size']}, {meta['T_mel']}, {meta['mel_channels']}) "
          f"-> {meta['T_mel'] * meta['hop_size']} samples @ {meta['sample_rate']} Hz",
          file=sys.stderr)


def cli():
    from ..platform import apply_platform_override

    apply_platform_override()
    from argparse import ArgumentParser

    p = ArgumentParser(description="export a model as a self-contained AOT serving artifact")
    p.add_argument("--model", required=True, help="model id or model directory")
    p.add_argument("-o", "--output", required=True)
    p.add_argument("-T", "--t_mel", type=int, required=True, help="mel frames per call")
    p.add_argument("-b", "--batch_size", type=int, default=1)
    p.add_argument("-p", "--platforms", nargs="+", default=None,
                   help="lowering platforms, e.g. tpu cpu (default: current backend)")
    p.add_argument("-v", "--verbose", action="store_true")
    a = p.parse_args()
    main(a.model, a.output, a.t_mel, a.batch_size, a.platforms, a.verbose)


if __name__ == "__main__":
    cli()
