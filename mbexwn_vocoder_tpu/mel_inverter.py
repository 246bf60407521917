"""MELInverter: the high-level inference facade.

reference: MBExWN_NVoc/mel_inverter.py:21-239.

Loads a model directory (config.yaml + weights), rescales external mel
spectrograms into the model's convention (offset/scale/fft-size compensation,
hop-size interpolation), and drives synthesis through one jitted XLA program
per (batch, length-bucket) shape.
"""
from __future__ import annotations

import os
import sys

from typing import Dict, Optional, Union

import numpy as np
from scipy.interpolate import interp1d

from . import get_config_file
from .analysis import compute_mel_spectrogram_internal, log_to_db
from .config import config_utils as cutils
from .dsp.resample import resample
from .models.factory import create_model

_DEF_BUCKETS = (64, 128, 256, 512, 1024, 2048, 4096)


class MELInverter:
    def __init__(self, model_id_or_path: Union[str, None] = None, verbose: bool = False,
                 length_buckets=_DEF_BUCKETS, use_jit: bool = True):
        self.model = None
        self.params = None
        self.model_id_or_path = model_id_or_path
        self.config_file = None
        self.preprocess_config = None
        self.mel_channels = None
        self.hop_size = None
        self.fft_size = None
        self.fmin = None
        self.fmax = None
        self._srate = None
        self.win_len = None

        self.lin_amp_scale = 1
        self.lin_amp_off = 1.0e-5
        self.mel_amp_scale = 1
        self.use_max_limit = False

        self.length_buckets = tuple(sorted(length_buckets))
        self.use_jit = use_jit
        self._jitted = {}

        if model_id_or_path:
            self.load_model(model_id_or_path=model_id_or_path, verbose=verbose)

    @property
    def srate(self):
        return self._srate

    # ------------------------------------------------------------- mel prep

    def scale_mel(self, mel_config: Dict, verbose=False) -> np.ndarray:
        """Rescale an external `.mell` dict into the model's convention.

        reference: mel_inverter.py:48-148
        """
        lin_scale_win = 1
        if mel_config["fmin"] != self.fmin:
            raise RuntimeError(f"mell fmin {mel_config['fmin']} does not match model fmin {self.fmin}")
        if ((mel_config["fmax"] is None) and self.fmax != mel_config["sr"] / 2) or (
            (mel_config["fmax"] is not None) and mel_config["fmax"] != self.fmax
        ):
            raise RuntimeError(f"mell fmax {mel_config['fmax']} does not match model fmax {self.fmax}")

        if "mell" in mel_config:
            log_mel_spectrogram = np.array(mel_config["mell"].T[np.newaxis], dtype=np.float64)
            if mel_config.get("log_spec_offset", 0) != 0:
                log_mel_spectrogram -= mel_config["log_spec_offset"]
            if mel_config.get("log_spec_scale", 1) != 1:
                log_mel_spectrogram /= mel_config["log_spec_scale"]
            mel_spectrogram = np.exp(log_mel_spectrogram)
        elif "mel" in mel_config:
            mel_spectrogram = np.array(mel_config["mel"].T[np.newaxis])
        else:
            raise RuntimeError("error::no supported mel spectrum (keys: mell or mel) in mel_config")

        dd_n_fft = mel_config.get("nfft") or mel_config.get("n_fft") or mel_config.get("fft_size")
        fft_scale_factor = self.fft_size // dd_n_fft
        if fft_scale_factor * lin_scale_win != 1:
            mel_spectrogram *= fft_scale_factor * lin_scale_win

        if mel_config.get("lin_spec_offset") not in (None, 0):
            mel_spectrogram -= mel_config["lin_spec_offset"]
        if mel_config.get("lin_spec_scale", 1) != 1:
            mel_spectrogram /= mel_config["lin_spec_scale"]

        if self.lin_amp_scale != 1:
            mel_spectrogram *= self.lin_amp_scale

        if self.use_max_limit:
            mell = np.log(np.fmax(mel_spectrogram, self.lin_amp_off)).astype(np.float32)
        else:
            mell = np.log(mel_spectrogram + self.lin_amp_off).astype(np.float32)

        if verbose:
            print(
                f"    stats conditioning mell:: mean: {log_to_db * np.mean(mell):.3f}dB, "
                f"max: {log_to_db * np.max(mell):.3f}dB, min: {log_to_db * np.min(mell):.3f}dB "
                f"mell.shape {mell.shape}",
                file=sys.stderr,
            )

        # hop-size adaptation by time interpolation (mel_inverter.py:117-146)
        if np.abs((mel_config["hoplen"] / mel_config["sr"]) / (self.hop_size / self.srate) - 1) > 0.001:
            if verbose:
                print(
                    f"ATTENTION::interpolate mel spectrum to adapt hop size from "
                    f"{mel_config['hoplen'] / mel_config['sr']} to {self.hop_size / self.srate}",
                    file=sys.stderr,
                )
            mell = interp1d(
                np.arange(mell.shape[1]) * mel_config["hoplen"] / mel_config["sr"],
                mell,
                axis=1,
                bounds_error=False,
                fill_value="extrapolate",
            )(
                np.arange(0, (mell.shape[1] - 1 + 0.1) * mel_config["hoplen"] / mel_config["sr"],
                          self.hop_size / self.srate)
            ).astype(np.float32)

        return mell * self.mel_amp_scale

    # ------------------------------------------------------------ synthesis

    def _bucket_len(self, T: int) -> int:
        for b in self.length_buckets:
            if T <= b:
                return b
        return T

    def _synth_fn(self, T_pad: int):
        """One jitted synthesis program per padded mel length."""
        import jax

        if T_pad not in self._jitted:
            model = self.model

            def fn(params, mell):
                return model.infer(params, mell, synth_length=mell.shape[1] * self.hop_size)

            self._jitted[T_pad] = jax.jit(fn) if self.use_jit else fn
        return self._jitted[T_pad]

    def warm(self, buckets=None, batch_size: int = 1) -> None:
        """Precompile the synthesis programs for the given length buckets
        (all configured buckets by default).  Useful before serving: first
        compiles on this TPU toolchain take ~1-4 min per shape."""
        import jax.numpy as jnp

        for b in buckets or self.length_buckets:
            mell = np.full((batch_size, b, self.mel_channels), -10.0, dtype=np.float32)
            y = self._synth_fn(b)(self.params, jnp.asarray(mell))
            np.asarray(y[0, :4])

    def synth_from_mel(self, scaled_mell: np.ndarray) -> np.ndarray:
        """Mel (B, T, C) -> waveform (B*T*hop,) raveled like the reference.

        Variable-length mels are edge-padded to static length buckets (XLA
        wants static shapes) and the padded audio tail is trimmed.  The
        trailing ~30 mel frames of output can deviate slightly from an
        exact-length computation (the padded frames sit inside the conv
        receptive field there, and the noise-channel draw depends on the
        padded shape); pass length_buckets=(T,) for bit-exact lengths at the
        cost of one XLA compile per distinct T.
        """
        import jax.numpy as jnp

        T = scaled_mell.shape[1]
        T_pad = self._bucket_len(T)
        if T_pad != T:
            # edge-pad with the last frame: the model is convolutional, so
            # padded frames only influence the (trimmed) tail beyond the
            # receptive-field boundary
            pad = np.repeat(scaled_mell[:, -1:], T_pad - T, axis=1)
            mell_in = np.concatenate([scaled_mell, pad], axis=1)
        else:
            mell_in = scaled_mell
        syn_audio = self._synth_fn(T_pad)(self.params, jnp.asarray(mell_in))
        syn_audio = np.asarray(syn_audio)[:, : T * self.hop_size]
        return syn_audio.ravel()

    def generate_mel_from_snd(self, snd, srate) -> Dict:
        """Analysis round trip helper (reference: mel_inverter.py:156-182)."""
        data_dict = {
            "nfft": self.fft_size,
            "hoplen": self.hop_size,
            "winlen": self.win_len,
            "nmels": self.mel_channels,
            "sr": self.srate,
            "fmin": self.fmin,
            "fmax": self.fmax,
            "lin_spec_offset": self.lin_amp_off,
            "lin_spec_scale": self.lin_amp_scale,
            "log_spec_offset": 0.0,
            "log_spec_scale": self.mel_amp_scale,
            "time_axis": 1,
        }
        if srate != self.srate:
            snd, _ = resample(snd, srate, self.srate, axis=-1)
        if len(snd.shape) == 1:
            snd = np.array(snd)[np.newaxis]
        mel_ref, *rest = compute_mel_spectrogram_internal(
            snd, preprocess_config=self.preprocess_config, band_limit=None, dtype=np.float32, do_post=False
        )
        data_dict["mell"] = mel_ref[0].T
        return data_dict

    # -------------------------------------------------------------- loading

    def load_model(self, model_id_or_path, verbose=False):
        import jax

        config_file = get_config_file(model_id_or_path=model_id_or_path)
        self.config_file = config_file
        model_dir = os.path.dirname(config_file)
        hparams = cutils.read_config(config_file=config_file)
        training_config = hparams["training_config"]
        self.preprocess_config = hparams["preprocess_config"]

        self.model, mr_mode = create_model(hparams, training_config, self.preprocess_config, quiet=not verbose)

        weights_npz = os.path.join(model_dir, "weights.npz")
        weights_tf = os.path.join(model_dir, "weights.tf")
        if os.path.exists(weights_npz):
            from .compat.params_io import load_params

            if verbose:
                print(f"restore from {weights_npz}", file=sys.stderr)
            self.params = load_params(weights_npz)
        elif os.path.exists(weights_tf + ".index"):
            from .compat.tf_checkpoint import convert_reference_checkpoint

            if verbose:
                print(f"convert + restore from {weights_tf}", file=sys.stderr)
            self.params = convert_reference_checkpoint(weights_tf, self.model)
        else:
            if verbose:
                print(
                    f"no weights found in {model_dir} (weights.npz or weights.tf); "
                    f"using random initialisation",
                    file=sys.stderr,
                )
            self.params = self.model.init(jax.random.PRNGKey(42))

        # bake g*v/||v|| into plain kernels once -- the per-call recompute is
        # a training-time need only (reference: conv_layers.py:149-153)
        from .ops.conv import fold_weight_norm

        self.params = fold_weight_norm(self.params)

        self.mel_channels = self.preprocess_config["mel_channels"]
        self.hop_size = self.preprocess_config["hop_size"]
        self.fft_size = self.preprocess_config["fft_size"]
        self.fmin = self.preprocess_config["fmin"]
        self.fmax = self.preprocess_config["fmax"]
        self._srate = self.preprocess_config["sample_rate"]
        self.win_len = self.preprocess_config.get("win_size", self.fft_size)

        self.lin_amp_scale = self.preprocess_config.get("lin_amp_scale", 1)
        self.lin_amp_off = self.preprocess_config.get("lin_amp_off", 1.0e-5)
        if self.lin_amp_off is None:
            self.lin_amp_off = 1.0e-5
        self.mel_amp_scale = self.preprocess_config.get("mel_amp_scale", 1)
        self.use_max_limit = bool(self.preprocess_config.get("use_max_limit", False))
