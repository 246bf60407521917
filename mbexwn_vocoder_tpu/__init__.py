# MBExWN-TPU: a TPU-native (JAX/XLA/Pallas) re-implementation of the
# Multi-Band Excited WaveNet neural vocoder.
#
# Capability parity target: roebel/MBExWN_Vocoder (see /root/reference).
# Reference anchors are cited throughout as `file:line` into that tree.
#
# This is NOT a port: the compute path is JAX/XLA (jit + pallas), the model is
# a functional pytree design, and parallelism is expressed with
# jax.sharding.Mesh + shard_map instead of TF graph mode.

from typing import Union, Dict, List

mbexwn_tpu_version = (0, 1, 0)

# Registry of model ids per voice domain, mirroring the reference registry
# (reference: MBExWN_NVoc/__init__.py:21-31).  The shipped checkpoints are not
# distributable here; these ids map to locally authored configs under
# models_registry/ that reproduce the architecture family (and can load
# converted reference checkpoints when present).
_mel_inv_models: Dict[str, List[str]] = {
    "SING": [
        "MBExWN_TPU_SING_WNCHA320_24kHz",
    ],
    "SPEECH": [
        "MBExWN_TPU_SPEECH_WNCHA320_24kHz",
    ],
    "VOICE": [
        "MBExWN_TPU_VOICE_WNCHA340_24kHz",
    ],
}


def list_models(voice_type: Union[str, None] = None):
    """List all known mel-inverter model ids per voice domain.

    reference: MBExWN_NVoc/__init__.py:33-44
    """
    import copy

    if voice_type is None:
        return copy.deepcopy(_mel_inv_models)
    return copy.deepcopy({voice_type: _mel_inv_models[voice_type]})


def get_config_file(model_id_or_path, verbose=False):
    """Resolve a model id (substring match) or directory path to a config.yaml.

    reference: MBExWN_NVoc/__init__.py:47-65
    """
    import os
    from pathlib import Path

    model_dir = None
    if os.path.exists(model_id_or_path):
        model_dir = model_id_or_path
    else:
        for kk, ll in list_models().items():
            for md in ll:
                if model_id_or_path in f"{kk}/{md}":
                    model_dir = Path(__file__).absolute().parent / "models_registry" / md
                    break
            if model_dir is not None:
                break

    if model_dir is None:
        raise FileNotFoundError(
            f"error::no model matching {model_id_or_path} in registry {list_models()}"
        )
    config_file = os.path.join(model_dir, "config.yaml")
    if not os.path.exists(config_file):
        raise FileNotFoundError(f"error::loading config file from {config_file}")
    return config_file
