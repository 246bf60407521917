"""CLI: `.mell` mel pickles -> resynthesized audio.

reference: bin/resynth_mel.py:34-135 (same flags, same verbose round-trip
mel-error report -- the built-in quality validator, SURVEY §3.4).
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np


def main(model_id, input_mell_files, output_dir, format="wav", verbose=False, seed=42,
         quiet=False, use_gpu=False, num_threads=2, batch=8, pipeline=0):
    from .. import list_models
    from ..compat import iovar
    from ..compat.audio_io import write_wav
    from ..dsp.db import log_to_db
    from ..mel_inverter import MELInverter


    MelInv = MELInverter(model_id_or_path=model_id, verbose=verbose)

    if output_dir and not os.path.exists(output_dir):
        os.makedirs(output_dir)

    if pipeline:
        _main_pipelined(MelInv, input_mell_files, output_dir, format, verbose,
                        quiet, depth=pipeline, batch=batch)
        return

    for mell_file in input_mell_files:
        outfile = os.path.join(
            output_dir, "syn_" + os.path.splitext(os.path.basename(mell_file))[0] + "." + format
        )
        if not quiet:
            print(f"synthesize {mell_file} into {outfile}", file=sys.stderr)

        dd = iovar.load_var(mell_file)
        log_mel_spectrogram = MelInv.scale_mel(dd, verbose=verbose)

        start_time = time.time()
        syn_audio = MelInv.synth_from_mel(log_mel_spectrogram)
        end_time = time.time()

        if verbose:
            mel_resyn = MelInv.generate_mel_from_snd(syn_audio, srate=MelInv.srate)["mell"].T[np.newaxis]
            mell_err = log_to_db * np.mean(
                np.abs(log_mel_spectrogram - mel_resyn[:, : log_mel_spectrogram.shape[1]])
            )
            print(
                f"    synthesized audio with {syn_audio.size} samples in {end_time - start_time:.3f}s "
                f"({syn_audio.size / (end_time - start_time):.2f}Hz), mel_error: {mell_err:.3f}dB",
                file=sys.stderr,
            )

        if np.max(np.abs(syn_audio)) > 1:
            norm = 0.99 / np.max(np.abs(syn_audio))
            print(f"    to prevent clipping you would need to normalize {outfile} by {norm:.3f}", file=sys.stderr)

        write_wav(outfile, syn_audio, MelInv.srate)


def _main_pipelined(MelInv, input_mell_files, output_dir, format, verbose, quiet, depth,
                    batch=1):
    """Depth-bounded pipelined serving loop: device synthesis of file i+1
    overlaps the readback/mel-check/wav-write of file i (serving.py); with
    batch>1, same-bucket files additionally micro-batch into one dispatch."""
    from ..compat import iovar
    from ..compat.audio_io import write_wav
    from ..dsp.db import log_to_db
    from ..serving import PipelinedSynthesizer

    ps = PipelinedSynthesizer(MelInv.model, MelInv.params,
                              length_buckets=MelInv.length_buckets, depth=depth, batch=batch)
    outfiles, mels = [], []
    for mell_file in input_mell_files:
        outfiles.append(os.path.join(
            output_dir, "syn_" + os.path.splitext(os.path.basename(mell_file))[0] + "." + format
        ))
        mels.append(MelInv.scale_mel(iovar.load_var(mell_file), verbose=verbose))

    start_time = time.time()
    for i, syn_audio in enumerate(ps.stream(m for m in mels)):
        if not quiet:
            print(f"synthesize {input_mell_files[i]} into {outfiles[i]}", file=sys.stderr)
        if verbose:
            mel_resyn = MelInv.generate_mel_from_snd(syn_audio, srate=MelInv.srate)["mell"].T[np.newaxis]
            mell_err = log_to_db * np.mean(np.abs(mels[i] - mel_resyn[:, : mels[i].shape[1]]))
            print(f"    mel_error: {mell_err:.3f}dB", file=sys.stderr)
        if np.max(np.abs(syn_audio)) > 1:
            norm = 0.99 / np.max(np.abs(syn_audio))
            print(f"    to prevent clipping you would need to normalize {outfiles[i]} by {norm:.3f}",
                  file=sys.stderr)
        write_wav(outfiles[i], syn_audio, MelInv.srate)
    if not quiet:
        dur = time.time() - start_time
        n = sum(m.shape[1] for m in mels) * MelInv.hop_size
        print(f"pipelined {len(mels)} files ({n} samples) in {dur:.3f}s "
              f"({n / dur:.2f}Hz, depth {depth})", file=sys.stderr)


def apply_precision(precision):
    """Map the --precision choice onto the compute-dtype env knobs.

    Must run before the model is constructed; an EMPTY value forces fp32
    (models/mbexwn.py::_dtype_pref). setdefault keeps the documented
    precedence: an explicitly exported MBEXWN_*_DTYPE always wins.
    """
    if precision == "default":
        return
    val = "" if precision == "quality" else "bfloat16"
    os.environ.setdefault("MBEXWN_WN_DTYPE", val)
    os.environ.setdefault("MBEXWN_SUBNET_DTYPE", val)


def cli():
    from ..platform import apply_platform_override

    apply_platform_override()
    from argparse import ArgumentParser

    from .. import list_models

    parser = ArgumentParser(description="resynthesize audio from mel spectrograms")
    parser.add_argument("model_id", default=None, nargs="?", const=None,
                        help="model identifier (substring match); omit to list models")
    parser.add_argument("-i", "--input_mell_files", nargs="+", help="mell spectra pickle files")
    parser.add_argument("-o", "--output_dir", help="output directory")
    parser.add_argument("--format", default="wav", help="audio format (wav)")
    parser.add_argument("-v", "--verbose", action="store_true")
    parser.add_argument("-q", "--quiet", action="store_true")
    parser.add_argument("-g", "--use_gpu", action="store_true",
                        help="accepted for reference-CLI compatibility (the accelerator "
                             "here is the ambient TPU/JAX backend; use MBEXWN_PLATFORM=cpu "
                             "to force CPU)")
    parser.add_argument("--pipeline", type=int, default=0, metavar="DEPTH",
                        help="serve files through a DEPTH-deep async pipeline "
                             "(overlaps device synthesis with readback/writes)")
    parser.add_argument("--batch", type=int, default=8, metavar="B",
                        help="with --pipeline: micro-batch up to B consecutive "
                             "same-length-bucket files into one device batch "
                             "(throughput per file approaches the batched rate); "
                             "coalescing is on by default, --batch 1 opts out")
    parser.add_argument("-nt", "--cpu_threads", "--num_threads", type=int, default=None,
                        help="bound host CPU threads for fair CPU benchmarking "
                             "(reference default: 2; resynth_mel.py:61-62)")
    parser.add_argument("--precision", choices=("quality", "fast", "default"),
                        default="default",
                        help="compute precision: 'quality' forces fp32 everywhere "
                             "(same-backend evals measure no mel-L1 cost for bf16 — "
                             "PERFORMANCE.md dtype section — this is the belt-and-"
                             "braces mode), 'fast' forces bf16 (~1.8x step rate), "
                             "'default' uses the model config "
                             "(env MBEXWN_WN_DTYPE/MBEXWN_SUBNET_DTYPE still wins)")
    args = parser.parse_args()
    apply_precision(args.precision)
    del args.precision
    if args.cpu_threads is not None:
        # must happen before the jax backend initializes
        import os as _os

        _os.environ["XLA_FLAGS"] = (
            _os.environ.get("XLA_FLAGS", "")
            + f" --xla_cpu_multi_thread_eigen={'true' if args.cpu_threads > 1 else 'false'}"
            + f" intra_op_parallelism_threads={args.cpu_threads}"
        ).strip()
        _os.environ.setdefault("OMP_NUM_THREADS", str(args.cpu_threads))
    del args.cpu_threads

    if not args.model_id:
        print("Please select one of the following models for mel inversion:")
        for kk, ll in list_models().items():
            for md in ll:
                print(f" - {kk}/{md}")
    else:
        main(**vars(args))


if __name__ == "__main__":
    cli()
