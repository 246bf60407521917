"""Harness for using the upstream reference implementation (read-only mount at
/root/reference) as a numerical oracle in tests.

The reference imports librosa (absent in this image); we provide a shim module
backed by our own slaney-mel implementation for the few symbols it touches.
Tests importing through this module are skipped automatically if the reference
tree is not mounted.
"""
import os
import sys
import types

import numpy as np
import pytest

REFERENCE_ROOT = "/root/reference"

_installed = False


def _install_librosa_shim():
    import mbexwn_vocoder_tpu.dsp.mel as mel

    import importlib.machinery

    librosa = types.ModuleType("librosa")
    librosa.__spec__ = importlib.machinery.ModuleSpec("librosa", None)

    class ParameterError(Exception):
        pass

    librosa.ParameterError = ParameterError

    filters = types.ModuleType("librosa.filters")

    def _mel(sr=None, n_fft=None, n_mels=128, fmin=0.0, fmax=None, htk=False, norm="slaney", dtype=np.float32):
        norm_arg = "slaney" if norm in ("slaney", 1) else None
        return mel._mel_basis(sr=sr, n_fft=n_fft, n_mels=n_mels, fmin=fmin, fmax=fmax, htk=htk, norm=norm_arg, dtype=dtype)

    filters.mel = _mel

    core = types.ModuleType("librosa.core")
    convert = types.ModuleType("librosa.core.convert")
    convert.mel_frequencies = mel.mel_frequencies
    convert.hz_to_mel = mel.hz_to_mel
    convert.mel_to_hz = mel.mel_to_hz
    core.convert = convert

    feature = types.ModuleType("librosa.feature")

    def _melspectrogram(y=None, norm="slaney", **kwargs):
        # only used by the reference as a probe for slaney-norm support
        return np.zeros((128, 1), dtype=np.float32)

    feature.melspectrogram = _melspectrogram

    librosa.filters = filters
    librosa.core = core
    librosa.feature = feature

    sys.modules["librosa"] = librosa
    sys.modules["librosa.filters"] = filters
    sys.modules["librosa.core"] = core
    sys.modules["librosa.core.convert"] = convert
    sys.modules["librosa.feature"] = feature


def _install_legacy_numpy_scipy_aliases():
    """The reference targets numpy<1.24 / scipy<1.13; restore the removed
    aliases it uses so it can run as an oracle under modern versions."""
    import math

    import scipy.signal as ss

    for name, val in (("int", int), ("float", float), ("math", math)):
        if not hasattr(np, name):
            setattr(np, name, val)
    if not hasattr(np, "cast"):
        class _Cast:
            def __getitem__(self, dtype):
                return lambda x: np.asarray(x).astype(dtype)

        np.cast = _Cast()
    if not hasattr(ss, "kaiser"):
        ss.kaiser = ss.windows.kaiser
    if not hasattr(ss, "hanning"):
        ss.hanning = ss.windows.hann
    # the reference computes firwin numtaps as int*float (python2-era division);
    # modern scipy rejects float numtaps -- coerce
    if not getattr(ss.firwin, "_coerced", False):
        _orig_firwin = ss.firwin

        def _firwin(numtaps, *args, **kwargs):
            return _orig_firwin(int(numtaps), *args, **kwargs)

        _firwin._coerced = True
        ss.firwin = _firwin


def require_reference():
    """Make the reference package importable; returns its root module name."""
    global _installed
    if not os.path.isdir(os.path.join(REFERENCE_ROOT, "MBExWN_NVoc")):
        pytest.skip("reference tree not mounted at /root/reference")
    if not _installed:
        os.environ.setdefault("TF_USE_LEGACY_KERAS", "1")
        _install_librosa_shim()
        _install_legacy_numpy_scipy_aliases()
        if REFERENCE_ROOT not in sys.path:
            sys.path.insert(0, REFERENCE_ROOT)
        _installed = True
    return "MBExWN_NVoc"
