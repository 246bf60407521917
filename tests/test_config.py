"""Config-system tests: include syntax, __defaults__, cargs mini-language and
the authored registry configs."""
import os

import numpy as np
import pytest

import mbexwn_vocoder_tpu as mv
from mbexwn_vocoder_tpu.config import (
    check_config_dict,
    check_preprocess_config,
    check_spect_loss_config,
    check_training_config,
    check_checkpoint_config,
    get_list_parameter,
    get_model_config,
    modify_config,
    read_config,
    dump_config,
)


def test_registry_configs_parse_and_validate():
    for domain in ("SPEECH", "SING", "VOICE"):
        cfg_file = mv.get_config_file(domain)
        hp = read_config(cfg_file)
        check_config_dict(hp)
        check_preprocess_config(hp["preprocess_config"])
        check_training_config(hp["training_config"])
        check_spect_loss_config(hp["training_config"]["spect_loss_config"])
        check_checkpoint_config(hp["checkpoint_config"])
        mc = get_model_config(hp)
        assert mc["pulse_rate_factor"] == 2
        # include was resolved to a dict, dtype string mapped
        assert hp["preprocess_config"]["sample_rate"] == 24000
        assert hp["training_config"]["ftype"] is np.float32


def test_rate_algebra_consistency():
    """The authored configs must satisfy the reference's rate constraints
    (custom_pulsed_generator.py:334-353,469-472,265-267)."""
    hp = read_config(mv.get_config_file("SPEECH"))
    pc = hp["preprocess_config"]
    mc = get_model_config(hp)
    sr = pc["sample_rate"]
    pulse_rate = sr / mc["pulse_rate_factor"]
    ups = int(np.prod(mc["pp_mod_subnet_upsampling_factors"]))
    mb = mc["multi_band_config"]["subbands"]
    assert pulse_rate / mc["pulse_channels"] * ups * mb == sr
    spect_rate = sr / pc["hop_size"]
    wn_in = pulse_rate / mc["pulse_channels"]
    lin = mc["pp_mod_subnet"]["cond_lin_upsampling"]
    assert wn_in == (wn_in // (spect_rate * lin)) * spect_rate * lin
    # pp subnet upsampling product == spect_to_pulse factor
    sts = pc["hop_size"] // mb
    stp = (sts * mc["pulse_channels"]) // ups
    tot = 1
    for spec in mc["pp_subnet"]:
        if len(spec) > 2:
            u = spec[2]
            tot *= int(u[1:]) if isinstance(u, str) else int(u)
    assert tot == stp == pulse_rate / spect_rate


def test_include_and_defaults(tmp_path):
    inc = tmp_path / "inc.yaml"
    inc.write_text("sub: {a: 1, b: 2}\n")
    main = tmp_path / "main.yaml"
    main.write_text(
        "block: <@CONFIG_DIR@/inc.yaml:sub>\n"
        "lst:\n"
        "  - {__defaults__: {x: 7, y: 8}}\n"
        "  - {x: 1}\n"
        "  - {y: 2}\n"
        "top:\n"
        "  __defaults__: {p: 3}\n"
        "  q: 4\n"
    )
    cfg = read_config(str(main), config_base_dir=str(tmp_path))
    assert cfg["block"] == {"a": 1, "b": 2}
    assert cfg["lst"] == [{"x": 1, "y": 8}, {"x": 7, "y": 2}]
    assert cfg["top"] == {"p": 3, "q": 4}


def test_modify_config_mini_language():
    cfg = {"a": {"b": [{"k": 1}, {"k": 2}], "c": 5}, "d": "s"}
    modify_config(cfg, ["a:c=7"])
    assert cfg["a"]["c"] == 7
    modify_config(cfg, ["a:b:[1]:k=99"])
    assert cfg["a"]["b"][1]["k"] == 99
    modify_config(cfg, ["d=[1,2,3]"])
    assert cfg["d"] == [1, 2, 3]
    modify_config(cfg, ["a:c:None"])  # legacy non '=' syntax
    assert cfg["a"]["c"] is None
    with pytest.raises(RuntimeError):
        modify_config(cfg, ["a:zzz=1"])


def test_get_list_parameter():
    assert get_list_parameter(3, 4) == [3, 3, 3, 3]
    assert get_list_parameter([1, 2], 4, n_repeater=2) == [1, 1, 2, 2]
    assert get_list_parameter([1, 2, 3, 4], 4) == [1, 2, 3, 4]
    with pytest.raises(RuntimeError):
        get_list_parameter([1, 2, 3], 4)


def test_dump_roundtrip(tmp_path):
    hp = read_config(mv.get_config_file("SPEECH"))
    out = tmp_path / "dumped.yaml"
    dump_config(str(out), hp)
    hp2 = read_config(str(out))
    assert hp2["preprocess_config"] == {
        k: (np.float32 if v is np.float32 else v) for k, v in hp["preprocess_config"].items()
    }
    assert get_model_config(hp2)["pp_mod_subnet"]["n_channels"] == 320


def test_validator_rejects_unknown_and_missing():
    with pytest.raises(RuntimeError):
        check_preprocess_config({"sample_rate": 1, "bogus_key": 2})
    with pytest.raises(RuntimeError):
        check_spect_loss_config({"win_size": [0.1]})  # hop_size missing
