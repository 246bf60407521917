"""End-to-end CLI tests: generate_mel -> resynth_mel -> view_mel through the
real file formats (wav + .mell pickle)."""
import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def tone_wav(tmp_path_factory):
    from mbexwn_vocoder_tpu.compat.audio_io import write_wav

    d = tmp_path_factory.mktemp("audio")
    path = str(d / "tone.wav")
    t = np.arange(12000) / 24000.0  # 0.5 s
    x = (0.5 * np.sin(2 * np.pi * 220 * t) * (0.5 - 0.5 * np.cos(2 * np.pi * t / t[-1]))).astype(np.float32)
    write_wav(path, x, 24000)
    return path


def test_generate_mel_cli(tone_wav, tmp_path):
    from mbexwn_vocoder_tpu.cli.generate_mel import main
    from mbexwn_vocoder_tpu.compat import iovar

    outdir = str(tmp_path / "mel")
    main([tone_wav], outdir, model_id="SPEECH")
    mell_file = os.path.join(outdir, "tone.mell")
    assert os.path.exists(mell_file)
    dd = iovar.load_var(mell_file)
    assert dd["nfft"] == 2048 and dd["hoplen"] == 300 and dd["nmels"] == 80
    assert dd["mell"].shape[0] == 80
    # 12000 samples / hop 300 + 1 frames
    assert dd["mell"].shape[1] == 41


def test_full_round_trip(tone_wav, tmp_path):
    """generate_mel -> resynth (random weights) -> audio of the right length,
    finite, via the same code path a user runs."""
    from mbexwn_vocoder_tpu.cli.generate_mel import main as gen_main
    from mbexwn_vocoder_tpu.cli.resynth_mel import main as syn_main
    from mbexwn_vocoder_tpu.compat.audio_io import read_wav

    meldir = str(tmp_path / "mel")
    outdir = str(tmp_path / "syn")
    gen_main([tone_wav], meldir, model_id="SPEECH")
    syn_main("SPEECH", [os.path.join(meldir, "tone.mell")], outdir, verbose=True)
    wav = os.path.join(outdir, "syn_tone.wav")
    assert os.path.exists(wav)
    y, sr = read_wav(wav)
    assert sr == 24000
    assert y.shape[0] == 41 * 300  # T_mel * hop
    assert np.all(np.isfinite(y))


def test_resynth_pipelined_matches_blocking(tone_wav, tmp_path):
    """--pipeline N serves the same files through serving.PipelinedSynthesizer;
    outputs must be identical to the blocking loop."""
    from mbexwn_vocoder_tpu.cli.generate_mel import main as gen_main
    from mbexwn_vocoder_tpu.cli.resynth_mel import main as syn_main
    from mbexwn_vocoder_tpu.compat.audio_io import read_wav

    meldir = str(tmp_path / "mel")
    gen_main([tone_wav], meldir, model_id="SPEECH")
    mells = [os.path.join(meldir, "tone.mell")]
    syn_main("SPEECH", mells, str(tmp_path / "blocking"))
    syn_main("SPEECH", mells, str(tmp_path / "pipelined"), pipeline=2)
    y0, _ = read_wav(os.path.join(str(tmp_path / "blocking"), "syn_tone.wav"))
    y1, sr = read_wav(os.path.join(str(tmp_path / "pipelined"), "syn_tone.wav"))
    assert sr == 24000
    np.testing.assert_array_equal(y0, y1)


def test_view_mel_cli(tone_wav, tmp_path, capsys):
    from mbexwn_vocoder_tpu.cli.view_mel import main

    png = str(tmp_path / "mel.png")
    main([tone_wav, tone_wav], model_id="SPEECH", output=png, diff_mel=True)
    assert os.path.exists(png)
    out = capsys.readouterr().out
    assert "mel-L1 diff" in out


def test_mel_inverter_scale_mel_round_trip(tone_wav):
    """scale_mel inverts the .mell storage conventions: feeding the dict from
    generate_mel_from_snd reproduces the internal log-mel."""
    from mbexwn_vocoder_tpu.compat.audio_io import read_wav
    from mbexwn_vocoder_tpu.mel_inverter import MELInverter

    inv = MELInverter("SPEECH")
    snd, sr = read_wav(tone_wav)
    dd = inv.generate_mel_from_snd(snd, sr)
    mell = inv.scale_mel(dd)
    assert mell.shape == (1, dd["mell"].shape[1], 80)
    assert np.all(np.isfinite(mell))

    # fmin/fmax mismatch must raise (mel_inverter.py:60-63)
    dd_bad = dict(dd)
    dd_bad["fmin"] = 123.0
    with pytest.raises(RuntimeError):
        inv.scale_mel(dd_bad)


def test_resynth_precision_knob(monkeypatch):
    """--precision maps onto the compute-dtype env knobs (quality=fp32 via
    EMPTY value, fast=bf16), without clobbering an explicit export."""
    from mbexwn_vocoder_tpu.cli.resynth_mel import apply_precision

    for var in ("MBEXWN_WN_DTYPE", "MBEXWN_SUBNET_DTYPE"):
        monkeypatch.delenv(var, raising=False)

    apply_precision("default")
    assert "MBEXWN_WN_DTYPE" not in os.environ

    apply_precision("quality")
    assert os.environ["MBEXWN_WN_DTYPE"] == ""  # empty value forces fp32
    assert os.environ["MBEXWN_SUBNET_DTYPE"] == ""

    # an explicit export wins over the knob
    monkeypatch.setenv("MBEXWN_WN_DTYPE", "float32")
    monkeypatch.setenv("MBEXWN_SUBNET_DTYPE", "float32")
    apply_precision("fast")
    assert os.environ["MBEXWN_WN_DTYPE"] == "float32"

    monkeypatch.delenv("MBEXWN_WN_DTYPE")
    monkeypatch.delenv("MBEXWN_SUBNET_DTYPE")
    apply_precision("fast")
    assert os.environ["MBEXWN_WN_DTYPE"] == "bfloat16"
    assert os.environ["MBEXWN_SUBNET_DTYPE"] == "bfloat16"
