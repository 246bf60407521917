"""Convert a reference Keras `weights.tf` checkpoint into this framework's
parameter tree.

Strategy: the reference's checkpoint variable names are built from a deeply
nested, programmatically-named object graph (custom_pulsed_generator.py:83-146,
conv_layers.py:66) and contain legacy dead variables that must be skipped
(wavegen_1d.py:84-86).  The robust converter therefore instantiates the
reference model (TensorFlow + the MBExWN_NVoc package must be importable),
restores the checkpoint into it exactly as upstream inference does
(mel_inverter.py:200-210), and then walks the live object tree
(tf_weight_map.py).  Use `convert_model_dir` to produce a native weights.npz
once and drop the TF dependency afterwards.
"""
from __future__ import annotations

import os
import sys
from typing import Optional


def _require_reference_package():
    os.environ.setdefault("TF_USE_LEGACY_KERAS", "1")
    try:
        import MBExWN_NVoc  # noqa: F401
    except ImportError as e:
        raise RuntimeError(
            "converting weights.tf requires TensorFlow and the upstream MBExWN_NVoc package "
            "to be importable (pip-install the reference or add it to PYTHONPATH); "
            "alternatively provide a pre-converted weights.npz"
        ) from e


def convert_reference_checkpoint(weights_tf_path: str, our_model, hparams: Optional[dict] = None):
    """weights.tf (+.index/.data files) -> our parameter tree."""
    _require_reference_package()
    import jax.numpy as jnp
    from MBExWN_NVoc.vocoder.model.models import create_model as ref_create_model

    from ..config import config_utils as cutils
    from .tf_weight_map import pan_wavenet_params

    if hparams is None:
        config_file = os.path.join(os.path.dirname(weights_tf_path), "config.yaml")
        hparams = cutils.read_config(config_file)

    ref_model, _ = ref_create_model(
        hparams, hparams["training_config"], hparams["preprocess_config"], quiet=True,
        use_tf25_compatible_implementation=True,
    )
    ref_model.build_model(variable_time_dim=True)
    ref_model.load_weights(weights_tf_path)
    return pan_wavenet_params(ref_model, our_model, jnp)


def convert_model_dir(model_dir: str, out_path: Optional[str] = None) -> str:
    """Convert <model_dir>/weights.tf into <model_dir>/weights.npz."""
    from ..config import config_utils as cutils
    from ..models.factory import create_model
    from .params_io import save_params

    config_file = os.path.join(model_dir, "config.yaml")
    hparams = cutils.read_config(config_file)
    model, _ = create_model(hparams, hparams["training_config"], hparams["preprocess_config"], quiet=True)
    params = convert_reference_checkpoint(os.path.join(model_dir, "weights.tf"), model, hparams)
    out_path = out_path or os.path.join(model_dir, "weights.npz")
    save_params(out_path, params)
    print(f"wrote {out_path}", file=sys.stderr)
    return out_path
