"""CLI: convert a reference model directory (config.yaml + weights.tf) into
this framework's native weights.npz."""
from __future__ import annotations


def cli():
    from argparse import ArgumentParser

    from ..platform import apply_platform_override

    apply_platform_override()

    parser = ArgumentParser(
        description="convert a reference weights.tf checkpoint to weights.npz",
        epilog=(
            "Expected model_dir layout (the reference's published MW-*-FD model "
            "directories, as installed by scripts/download_and_install_MBExWN_pretrained_models.sh, "
            "have exactly this shape): config.yaml plus the TF checkpoint triple "
            "weights.tf.index / weights.tf.data-00000-of-00001 (referred to as "
            "'weights.tf', mel_inverter.py:206-210).  Legacy dead variables from "
            "abandoned training trials that the published checkpoints carry "
            "(wavegen_1d.py:84-91) are skipped automatically: restoration goes "
            "through the live reference object graph, so checkpoint entries no "
            "built layer owns are ignored.  Requires TensorFlow + the MBExWN_NVoc "
            "package importable; the produced weights.npz loads TF-free."
        ),
    )
    parser.add_argument("model_dir", help="model directory containing config.yaml and weights.tf")
    parser.add_argument("-o", "--output", default=None, help="output path (default <model_dir>/weights.npz)")
    args = parser.parse_args()

    from ..compat.tf_checkpoint import convert_model_dir

    convert_model_dir(args.model_dir, args.output)


if __name__ == "__main__":
    cli()
