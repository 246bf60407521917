"""CLI: convert a reference model directory (config.yaml + weights.tf) into
this framework's native weights.npz."""
from __future__ import annotations


def cli():
    from argparse import ArgumentParser

    from ..platform import apply_platform_override

    apply_platform_override()

    parser = ArgumentParser(description="convert a reference weights.tf checkpoint to weights.npz")
    parser.add_argument("model_dir", help="model directory containing config.yaml and weights.tf")
    parser.add_argument("-o", "--output", default=None, help="output path (default <model_dir>/weights.npz)")
    args = parser.parse_args()

    from ..compat.tf_checkpoint import convert_model_dir

    convert_model_dir(args.model_dir, args.output)


if __name__ == "__main__":
    cli()
