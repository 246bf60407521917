"""Hierarchical YAML config system.

Capability parity with the reference config subsystem
(reference: MBExWN_NVoc/vocoder/model/config_utils.py, 554 LoC):

- YAML read with cross-file include syntax ``<@CONFIG_DIR@/file:key:...>``
  (config_utils.py:46-52,123-135) and env/user expansion (:41-44)
- ``__defaults__`` fill-in for dicts and lists-of-dicts (:271-312)
- CLI override mini-language ``a:b:[i]:key=val`` (:193-229, :102-191)
- typed string auto-conversion (:80-96)
- dtype-name mapping (:18-30) -- mapped to numpy/jax dtypes here
- per-block schema validators (:373-515)
- ``get_list_parameter`` broadcasting (:232-269)
- ``get_model_config`` dispatch (:517-552), ``dump_config`` (:341)

The shipped reference config.yaml format is parsed unchanged so converted
reference model directories remain loadable.
"""
from __future__ import annotations

import ast
import io
import os
import re
import sys
from copy import deepcopy

import numpy as np
import yaml

try:
    import jax.numpy as jnp

    _HAVE_JAX = True
except ImportError:  # config parsing must not hard-require jax
    _HAVE_JAX = False

# dtype-name mapping; the reference maps "tf.float32" etc -- we accept the
# same strings (checkpoint-compat) and map them onto numpy/jax dtypes
_type_map = {
    "tf.float32": np.float32,
    "tf.float16": np.float16,
    "np.float32": np.float32,
    "np.float16": np.float16,
    "jnp.float32": np.float32,
    "jnp.bfloat16": jnp.bfloat16 if _HAVE_JAX else "bfloat16",
    "float32": np.float32,
    "None": None,
}
_inverse_type_map = {
    np.float32: "np.float32",
    np.float16: "np.float16",
}


def _fill_format(vv, config_base_dir=None):
    """Replace env vars, dtype names and cross-file component includes."""
    if isinstance(vv, str):
        if vv in _type_map:
            vv = _type_map[vv]
        else:
            if "$" in vv:
                vv = os.path.expandvars(vv)
            if "~" in vv:
                vv = os.path.expanduser(vv)
            vs = vv.strip()
            vsmapped = re.sub("<@CONFIG_DIR@/(.*)>$", f"{config_base_dir}/\\1", vs)
            if vs != vsmapped:
                file_name, *keys = vsmapped.split(":")
                vv = read_config(file_name, config_base_dir=config_base_dir)
                for kk in keys:
                    vv = vv[kk]
    elif isinstance(vv, dict):
        for kk, _vv in vv.items():
            vv[kk] = _fill_format(_vv, config_base_dir=config_base_dir)
    elif isinstance(vv, list):
        for ie in range(len(vv)):
            vv[ie] = _fill_format(vv[ie], config_base_dir=config_base_dir)
    return vv


def _fix_config(config):
    """Map dtype objects back to their string names for dumping."""
    for kk, vv in config.items():
        if isinstance(vv, dict):
            config[kk] = _fix_config(vv)
        elif isinstance(vv, type) and vv in _inverse_type_map:
            config[kk] = _inverse_type_map[vv]
    return config


_int_pat = re.compile(r"^ *[0-9]+ *$")
# attention: this pattern matches the empty string too (guarded at call site)
_float_pat = re.compile(r"^ *(-?\d*(?:\.\d*)?(?:[eE][-+]?\d+)?) *$")
_list_dict_quoted_pat = re.compile("^ *[{\\[\"'].*[}\\]\"'] *$")


def _auto_convert_str(par_string):
    ppss = par_string.lower()
    if ppss in ("none", "null"):
        return None
    if ppss == "true":
        return True
    if ppss == "false":
        return False
    if _int_pat.match(par_string) or _float_pat.match(par_string) or _list_dict_quoted_pat.match(par_string):
        try:
            return ast.literal_eval(par_string.strip())
        except Exception:
            print(f"error evaluating python expression <{par_string}>", file=sys.stderr)
            raise
    return par_string


_index_regexp = re.compile(r"^ *\[ *([-]?[0-9]+) *\] *$")


def set_sub_dict_multi(sub_config, plist, config_base_dir=None):
    """Apply a parsed ':'-separated override path to a nested config."""
    while plist:
        (ent, mrk), *plist = plist
        if (not ent) and (not mrk):
            continue
        if "=" in ent:
            key, val_str = ent.split("=")
            if isinstance(sub_config, list) and re.match(_index_regexp, key):
                key = int(re.match(_index_regexp, key).group(1))
                if key < 0:
                    key = len(sub_config)
                while len(sub_config) <= key:
                    sub_config.append(None)
            elif key not in sub_config:
                raise RuntimeError(
                    f"multi_modify_config::error:: you try to change the config key '{key}' "
                    f"that does not exist in {sub_config}"
                )
            try:
                if val_str.startswith("<"):
                    if not val_str.endswith(">"):
                        raise RuntimeError(f"multi_modify_config::error:: erroneous file specification {val_str}")
                    file, *dict_path = val_str[1:-1].split(":")
                    file = file.replace("@CONFIG_DIR@", config_base_dir or "")
                    other_config = read_config(file)
                    for dd in dict_path:
                        other_config = other_config[dd]
                    sub_config[key] = deepcopy(other_config)
                else:
                    sub_config[key] = _auto_convert_str(val_str)
            except Exception:
                print(f"set_sub_dict_multi::error evaluating {ent} {key} {val_str}", file=sys.stderr)
                raise
        elif re.match(_index_regexp, ent):
            ind = int(re.match(_index_regexp, ent).group(1))
            plist = set_sub_dict_multi(sub_config[ind], plist, config_base_dir=config_base_dir)
        else:
            if not plist:
                raise RuntimeError(
                    f"multi_modify_config::error:: you access a key {ent} in {sub_config} without any "
                    f"further args. Did you miss to place an equal sign?"
                )
            if ent not in sub_config:
                raise RuntimeError(f"multi_modify_config::error:: key {ent} does not exist in {sub_config}")
            plist = set_sub_dict_multi(sub_config[ent], plist, config_base_dir=config_base_dir)
    return plist


def _find_sub_entries(carg):
    """Split a cargs string on ':' without cutting inside {}/[]/<> groups."""
    dict_level = list_level = redirect_level = 0
    parsed_args = []
    last_start = 0
    ind = 0
    for ind, cc in enumerate(carg):
        if cc == "{":
            dict_level += 1
        elif cc == "}":
            dict_level -= 1
            if dict_level < 0:
                raise RuntimeError("cargs string contains unbalanced dictionary entries")
        elif cc == "[":
            list_level += 1
        elif cc == "]":
            list_level -= 1
            if list_level < 0:
                raise RuntimeError("cargs string contains unbalanced list entries")
        elif cc == "<":
            redirect_level += 1
        elif cc == ">":
            redirect_level -= 1
            if redirect_level < 0:
                raise RuntimeError("cargs string contains file redirection entry")
        elif cc == ":" and dict_level == 0 and list_level == 0 and redirect_level == 0:
            parsed_args.append((carg[last_start:ind], cc))
            last_start = ind + 1
    if last_start < ind:
        parsed_args.append((carg[last_start:], ""))
    return parsed_args


def modify_config(hparams, config_args, config_base_dir=None):
    """Apply a list of ':'-separated override strings to the config dict."""
    if config_args is None:
        return hparams
    if config_base_dir is None:
        config_base_dir = os.path.join(os.path.dirname(os.path.dirname(__file__)), "models_registry")

    for carg in config_args:
        if "=" in carg:
            plist = _find_sub_entries(carg)
            plist = set_sub_dict_multi(hparams, plist, config_base_dir)
            if plist:
                raise RuntimeError(
                    f"modify_config::error:: carg processing error in '{carg}' set_sub_dict_multi "
                    f"returns non empty {plist}"
                )
        else:
            cal = carg.split(":")
            if len(cal) < 2:
                raise RuntimeError(
                    f"modify_config::error:: parsing carg '{carg}' does not produce exploitable config "
                    f"modification entry."
                )
            sub_config = hparams
            for cc in cal[:-2]:
                sub_config = sub_config[cc]
            if cal[-2] not in sub_config:
                raise RuntimeError(
                    f"modify_config::error:: you try to change the config key '{cal[-2]}' that does not "
                    f"exist in {sub_config}"
                )
            sub_config[cal[-2]] = _auto_convert_str(cal[-1])
    return hparams


def get_list_parameter(val, n_elements, n_repeater=None, n_repeater_list=None):
    """Broadcast a scalar/list config value to a list of n_elements."""
    try:
        val_list = val[:]
    except TypeError:
        val_list = [val]

    if (n_repeater is not None) and n_repeater_list:
        raise RuntimeError(
            f"get_list_parameter::error::only one of the arguments n_repeater {n_repeater} "
            f"and n_repeater_list {n_repeater_list} is allowed to be present"
        )

    if len(val_list) == 1:
        val_list = val_list * n_elements
    elif (n_repeater is not None) and (len(val_list) * n_repeater < n_elements + n_repeater):
        val_list = [vv for vv in val_list for _ in range(n_repeater)]
        if len(val_list) < n_elements:
            val_list = val_list + [val_list[-1] for _ in range(n_elements - len(val_list))]
        val_list = val_list[:n_elements]
    elif (n_repeater_list is not None) and (np.sum(n_repeater_list) == n_elements):
        _tmp_list = []
        for vv, rr in zip(val_list, n_repeater_list):
            _tmp_list += [vv] * rr
        val_list = _tmp_list
    elif len(val_list) != n_elements:
        raise RuntimeError(
            f"config_utils::error:: cannot construct list of {n_elements} from {val} "
            f"with n_repeater {n_repeater} n_repeater_list {n_repeater_list}"
        )
    return val_list


def _fill_defaults(config):
    """Resolve __defaults__ entries in dicts and in lists of dicts."""
    tmp_config = deepcopy(config)
    for kk, vv in tmp_config.items():
        if kk == "__defaults__":
            for dk, dv in tmp_config[kk].items():
                if dk not in config:
                    config[dk] = dv
            config.pop("__defaults__")
        elif isinstance(vv, dict):
            _fill_defaults(config[kk])
        elif isinstance(vv, list):
            list_entry_defaults = None
            defaults_index = None
            for ie, ve in enumerate(vv):
                if isinstance(ve, dict) and (len(ve) == 1) and ("__defaults__" in ve.keys()):
                    if defaults_index is not None:
                        raise RuntimeError(f"read_config::error::multiple __defaults__ entries in list {vv}")
                    list_entry_defaults = deepcopy(ve["__defaults__"])
                    defaults_index = ie
            if defaults_index is not None:
                del config[kk][defaults_index]
                for le in config[kk]:
                    if not isinstance(le, dict):
                        raise RuntimeError(
                            f"read_config::error::cannot use default values from {list_entry_defaults} "
                            f"for list entries that are not dicts {le}"
                        )
                    for dk, dv in list_entry_defaults.items():
                        if dk not in le:
                            le[dk] = dv
            for ve in config[kk]:
                if isinstance(ve, dict):
                    _fill_defaults(ve)
    return


def read_config(config_file, config_base_dir=None):
    """Read YAML config(s), resolving includes, dtypes and __defaults__."""
    if config_base_dir is None:
        config_base_dir = os.path.join(os.path.dirname(os.path.dirname(__file__)), "models_registry")

    config_files = config_file if isinstance(config_file, (list, tuple)) else [config_file]

    config_io = io.StringIO()
    for file in config_files:
        with open(file, "r") as fi:
            config_io.write(fi.read())
    config_io.seek(0)
    config = yaml.safe_load(config_io)
    for kk, vv in config.items():
        config[kk] = _fill_format(vv, config_base_dir=config_base_dir)
    _fill_defaults(config)
    return config


def dump_config(config_file, config):
    """Write config to a YAML file."""
    if os.path.dirname(config_file) and not os.path.exists(os.path.dirname(config_file)):
        os.makedirs(os.path.dirname(config_file), exist_ok=True)
    config = _fix_config(deepcopy(config))
    with open(config_file, "w") as fo:
        yaml.safe_dump(config, fo)
    return config


# ---------------------------------------------------------------------------
# schema validators (reference: config_utils.py:353-515)
# ---------------------------------------------------------------------------


def _check_config_dict_implementation(config_dict, config_name, required_keys, optional_keys, obsolete_keys):
    possible_keys = required_keys + optional_keys + obsolete_keys
    unsupported = []
    obsolete_found = []
    required = list(required_keys)
    for kk in config_dict:
        if kk not in possible_keys:
            unsupported.append(kk)
        if kk in obsolete_keys:
            obsolete_found.append(kk)
        while kk in required:
            required.remove(kk)
    if unsupported:
        raise RuntimeError(
            f"{config_name}::error: the following top level entries in your {config_name} are not "
            f"supported {unsupported}"
        )
    if required:
        raise RuntimeError(
            f"{config_name}::error: the following required entries in your {config_name} are not "
            f"provided {required}"
        )
    if obsolete_found:
        print(f"obsolete parameters {obsolete_found} detected in {config_name}, please update your config",
              file=sys.stderr)


def check_config_dict(hparams):
    optional_keys = [
        "preprocess_config", "training_config", "checkpoint_config", "pickle_config",
        "path_config", "mbexwn_config", "wavegan_config", "aliases", "use_tf25_compatible_implementation",
        "parallel_config",
    ]
    required_keys = ["preprocess_config", "training_config", "checkpoint_config", "pickle_config"]
    _check_config_dict_implementation(hparams, "config_dict", required_keys=required_keys,
                                      optional_keys=optional_keys, obsolete_keys=[])


def check_preprocess_config(preprocess_config):
    required_keys = ["sample_rate", "segment_length", "hop_size", "mel_channels", "fft_size", "fmin", "fmax"]
    optional_keys = [
        "use_centered_STFT", "win_size", "random_filter_length", "random_filter_amp",
        "random_mult", "random_mult_max_amp", "band_pass", "norm_mel", "mel_amp_scale",
        "lin_amp_scale", "lin_amp_off", "use_max_limit",
    ]
    _check_config_dict_implementation(preprocess_config, "preprocess_config", required_keys=required_keys,
                                      optional_keys=optional_keys, obsolete_keys=["include_sub_sampled"])


def check_training_config(training_config):
    required_keys = ["epochs", "epoch_size", "train_batch_size", "ftype", "optimizer"]
    optional_keys = [
        "learning_rate", "reduce_on_plateau", "read_files_max_length_s", "add_speaker_id",
        "file_reader_procs", "batch_creat_procs", "total_loss_debug_thresh",
        "dither_level", "spect_loss_config", "stage", "all_optimizers_start",
        "pretrain_activations_target", "pretrain_activations_max_iters",
        "pretrain_activations_to_rmse", "pretrain_activations_lr",
        "TD_loss_weight", "TD_loss_win_len", "grad_clip_norm", "weight_decay",
        "lr_schedule", "batch_cache_config", "batch_min_cache_perc", "batch_cache_perc",
        "pca_num_steps", "init_inv1x1_with_pca", "output_soft_thresh_fac", "batch_debug_dir",
    ]
    obsolete_keys = ["buffer_size", "mixed_precision", "mell_loss_weight", "cpdl_loss_weight", "seed"]
    _check_config_dict_implementation(training_config, "training_config", required_keys=required_keys,
                                      optional_keys=optional_keys, obsolete_keys=obsolete_keys)


def check_spect_loss_config(spect_loss_config):
    required_keys = ["win_size", "hop_size"]
    optional_keys = [
        "spect_loss_weight", "spect_loss_schedule", "loss_type", "fft_over", "mell_loss_weight",
        "MCCTP_loss_weight", "PP_loss_weight", "BC_loss_weight", "MCCT_loss_weight",
        "MCCTS_loss_weight", "NLL_loss_weight", "MODSPEC_loss_weight", "NPOW_loss_weight",
        "NLL_min_std", "PP_band_width_Hz", "PP_segment_size_s", "PP_loss_method",
        "remove_mean_hz", "BC_segment_size_s", "BC_loss_method", "BC_max_off_Hz",
        "MODSPEC_loss_method", "masking_noise_std", "rel_masking_noise_atten_db",
        "low_band_extra_weight", "low_band_extra_weight_limit_Hz",
        "low_band_extra_weight_transition_Hz", "MCC_segment_size_s", "MCC_pad_size_s",
        "lin_amp_off", "rel_lin_amp_off", "magnitude_compression", "use_lin_amp_off_for_mc",
        "spect_error_gain",
    ]
    obsolete_keys = [
        "cpdl_loss_weight", "MCCT_segment_size_s", "MCCT_pad_size_s", "RIC_loss_weight",
        "RIC_num_filters", "RIC_band_width", "RIC_seed", "RIC_segment_size_s",
    ]
    _check_config_dict_implementation(spect_loss_config, "spect_loss_config", required_keys=required_keys,
                                      optional_keys=optional_keys, obsolete_keys=obsolete_keys)


def check_checkpoint_config(checkpoint_config):
    required_keys = ["max_to_keep", "log_dir", "checkpoint_dir", "save_model_every", "show_progress_every",
                     "save_audio_every"]
    optional_keys = ["keep_audio_every", "store_model_every"]
    _check_config_dict_implementation(checkpoint_config, "checkpoint_config", required_keys=required_keys,
                                      optional_keys=optional_keys, obsolete_keys=[])


def check_wavenet_config(wavenet_config):
    required_keys = ["n_layers", "n_channels", "kernel_size"]
    optional_keys = [
        "enable_weight_norm", "enable_equalized_lr", "dilation_rate_step", "max_log2_dilation_rate",
        "activation", "return_activations", "weight_schedule", "disabled", "loss_thresh",
        "rel_masking_noise_atten_db",
    ]
    _check_config_dict_implementation(wavenet_config, "wavenet_config", required_keys=required_keys,
                                      optional_keys=optional_keys, obsolete_keys=["use_weight_norm", "n_in_channels"])


def get_model_config(hparams):
    """Return the model-family config block (only mbexwn is supported)."""
    if "mbexwn_config" in hparams:
        return hparams["mbexwn_config"]
    raise RuntimeError(
        f"get_model_config::error::no known model config found in hparams with keys: {list(hparams.keys())}"
    )
