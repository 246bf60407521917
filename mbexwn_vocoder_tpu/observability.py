"""Observability: profiling traces, NaN/finite guards, metrics logging and
architecture summaries.

The reference's equivalents are wall-clock prints, tf.summary scalars and
commented-out debug plots (SURVEY §5: resynth_mel.py:86-96,
wavegen_1d.py:390-402); here these are first-class:

- `profile_trace`: context manager around jax.profiler for XLA/TPU traces
- `debug_nans` / `check_finite`: opt-in numeric guards at stage boundaries
  (the reference's tf.debugging.check_numerics is commented out,
  wavegen_1d.py:502)
- `MetricsLogger`: JSONL scalar stream (the tf.summary.scalar equivalent)
- `model_summary`: per-layer shape/param-count printer mirroring the manual
  summary() printers (custom_pulsed_generator.py:1054-1141)
"""
from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Dict, Iterator, Optional

import numpy as np


@contextlib.contextmanager
def profile_trace(log_dir: str) -> Iterator[None]:
    """Capture a jax.profiler trace (view with tensorboard/xprof)."""
    import jax

    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def debug_nans(enable: bool = True) -> Iterator[None]:
    """Enable jax debug-nans within a scope (fails fast at the op that
    produced the first NaN)."""
    import jax

    old = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", enable)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", old)


def check_finite(tree, name: str = "value") -> None:
    """Host-side finite check over a pytree (stage-boundary guard)."""
    import jax

    for path, leaf in jax.tree_util.tree_leaves_with_path(tree):
        arr = np.asarray(leaf)
        if not np.all(np.isfinite(arr)):
            bad = int(np.sum(~np.isfinite(arr)))
            raise FloatingPointError(f"{name}{jax.tree_util.keystr(path)}: {bad} non-finite values")


class MetricsLogger:
    """Append-only JSONL scalar stream, one record per step."""

    def __init__(self, log_dir: str, name: str = "metrics"):
        os.makedirs(log_dir, exist_ok=True)
        self.path = os.path.join(log_dir, f"{name}.jsonl")
        self._fh = open(self.path, "a", buffering=1)
        self._t0 = time.time()

    def log(self, step: int, metrics: Dict) -> None:
        rec = {"step": int(step), "time": round(time.time() - self._t0, 3)}
        for k, v in metrics.items():
            try:
                rec[k] = float(v)
            except (TypeError, ValueError):
                pass
        self._fh.write(json.dumps(rec) + "\n")

    def close(self) -> None:
        self._fh.close()


def _count_params(tree) -> int:
    import jax

    return int(sum(np.prod(np.asarray(l).shape) for l in jax.tree_util.tree_leaves(tree)))


def model_summary(model, params, T_mel: int = 64, print_fn=print) -> None:
    """Architecture summary with per-stage shapes and parameter counts."""
    blk = model.block
    stp = blk.spect_to_pulse_upsampling_factor
    hop = blk.spect_hop_size
    print_fn(f"Model {model.name}")
    print_fn("---------------------------------------")
    print_fn(f"{'Input mel':28s} -> (B, {T_mel}, {blk.mel_channels})")
    if "pp_subnet" in params:
        print_fn(f"{'PulseParameterGenerator':28s} -> (B, {T_mel * stp}) "
                 f"## {_count_params(params['pp_subnet'])}")
    print_fn(f"{'PulseWavetable':28s} -> {tuple(np.asarray(params['wavetables']).shape)} "
             f"(F0 grid {len(blk.wavetable.F0_list)})")
    t = T_mel * stp // blk.pulse_channels
    for bl in blk.pp_waveNetBlocks:
        n = _count_params(params[bl.name])
        t_out = bl.out_length(t)
        print_fn(f"  {bl.name:26s} -> (B, {t_out}, {bl.wavenet.n_out_channels}) ## {n}")
        t = t_out
    if "wn_post_net" in params:
        print_fn(f"  {'wn_post_net':26s} -> (B, {t}, {blk.mb_factor}) "
                 f"## {_count_params(params['wn_post_net'])}")
    print_fn(f"{'PQMF synthesis':28s} -> (B, {T_mel * hop})")
    if "ps_subnet" in params:
        print_fn(f"{'PulseSpectrumGenerator':28s} -> (B, {T_mel}, {blk.ps_max_ceps_coefs}) "
                 f"## {_count_params(params['ps_subnet'])}")
    print_fn(f"{'STFT filter + iSTFT':28s} -> (B, {T_mel * hop})")
    print_fn(f"{'total params':28s} ## {_count_params(params)}")
    print_fn("---------------------------------------")


def dump_controls(path: str, model, params, mel, rng=None) -> Dict:
    """Debug dump of internal control signals (F0, excitation, envelope).

    reference: custom_pulsed_generator.py:706-713 (dump_controls pickles).
    """
    import jax.numpy as jnp

    from .compat.iovar import save_var

    F0, excitation, specenv, rms = model.infer_components(params, jnp.asarray(mel), rng=rng)
    data = {
        "pulse_frequency": np.asarray(F0),
        "pulse_signal": np.asarray(excitation),
        "PulseFilterSpectrum": np.abs(np.asarray(specenv)),
    }
    if rms is not None:
        data["upsampled_rms"] = np.asarray(rms)
    save_var(path, data)
    return data


def synthesis_flops(model, T_mel: int = 1, batch: int = 1) -> Dict:
    """Analytic FLOP count per synthesis call (roofline bookkeeping).

    Counts the MXU-relevant work: subnets, WaveNet stack, post net, PQMF,
    oscillator tent matmul and the rDFT matmuls of the envelope path.
    """
    blk = model.block
    hop = blk.spect_hop_size
    stp = blk.spect_to_pulse_upsampling_factor
    t12k = T_mel * stp
    t_wn_in = t12k // blk.pulse_channels

    def conv_flops(t, cin, cout, k):
        return 2 * t * cin * cout * k

    total = 0
    breakdown = {}

    def seq_flops(seq, t, cin):
        f = 0
        for layer in seq.layers:
            name = layer.__class__.__name__
            if name == "Conv1DWeightNorm":
                f += conv_flops(layer.out_length(t), cin, layer.filters, layer.kernel_size)
                cin = layer.filters
                t = layer.out_length(t)
            elif name == "Conv1DUpDownSample":
                f += conv_flops(t, cin, layer.filters, layer.kernel_size)
                cin = layer.out_filters
                t = layer.out_length(t)
            else:
                t = layer.out_length(t)
        return f

    if blk.pp_subnet is not None:
        breakdown["pp_subnet"] = seq_flops(blk.pp_subnet, T_mel, blk.mel_channels)
    if getattr(blk, "ps_subnet", None) is not None:
        breakdown["ps_subnet"] = seq_flops(blk.ps_subnet, T_mel, blk.mel_channels)

    wn = 0
    t = t_wn_in
    for bl in blk.pp_waveNetBlocks:
        w = bl.wavenet
        wn += conv_flops(t, blk.wn_in_channels, w.n_channels, 1)  # start
        for conv, rs in zip(w.conv_layers, w.res_skip_layers):
            wn += conv_flops(t, w.n_grp_channels, conv.filters, conv.kernel_size)
            wn += conv_flops(t, w.n_grp_channels, rs.filters, 1)
        wn += conv_flops(t, w.n_channels, w.n_out_channels, 1)  # end
        wn += conv_flops(T_mel, blk.mel_channels, 2 * w.n_channels, w.cond_layer.kernel_size if w.cond_layer else 0)
        if bl.up_down_sample is not None:
            wn += conv_flops(t, w.n_out_channels, bl.up_down_sample.filters, 3)
            t = bl.out_length(t)
    breakdown["wavenet"] = wn
    breakdown["post_pqmf"] = conv_flops(t, blk.wn_post_net.filters, blk.mb_factor, 1) + (
        conv_flops(T_mel * hop, blk.mb_factor, 1, blk.multi_band_config["taps"] + 1)
        if blk.pqmf_filters is not None else 0
    )
    breakdown["oscillator"] = 2 * t12k * blk.wavetable.n_wavetable * len(blk.wavetable.F0_list)
    K = blk.fft_size // 2 + 1
    breakdown["envelope_rdft"] = 2 * T_mel * blk.ps_max_ceps_coefs * K * 2
    breakdown["stft_istft"] = 2 * (T_mel + 2) * blk.stft_win_size * K * 2 * 2

    total = batch * sum(breakdown.values())
    audio_seconds = batch * T_mel * hop / blk.sample_rate
    return {
        "flops_per_call": total,
        "flops_per_audio_second": total / audio_seconds,
        "breakdown": {k: batch * v for k, v in breakdown.items()},
    }
