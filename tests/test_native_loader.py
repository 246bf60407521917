"""Native C++ segment loader: build, parse-correctness vs the Python WAV
reader, threading, and dataset integration."""
import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    from mbexwn_vocoder_tpu.compat.audio_io import write_wav

    d = tmp_path_factory.mktemp("corpus")
    rng = np.random.RandomState(0)
    paths = []
    for i, subtype in enumerate(["float32", "pcm16"]):
        x = (0.3 * np.sin(2 * np.pi * (200 + 50 * i) * np.arange(30000) / 24000)).astype(np.float32)
        p = str(d / f"f{i}.wav")
        write_wav(p, x, 24000, subtype=subtype)
        paths.append(p)
    return paths


def test_native_loader_builds_and_parses(corpus):
    from mbexwn_vocoder_tpu.compat.native_loader import NativeSegmentLoader, available

    if not available():
        pytest.skip("no C++ toolchain")
    loader = NativeSegmentLoader(corpus, segment_len=6000, sample_rate=24000, seed=3)
    assert loader.n_files == 2
    assert loader.total_samples == 60000
    batch = loader.next_batch(8)
    assert batch.shape == (8, 6000) and batch.dtype == np.float32
    assert np.all(np.isfinite(batch))
    # segments are real audio: unit-amplitude sine content, not junk
    assert 0.05 < np.abs(batch).max() <= 0.31
    loader.close()


def test_native_decode_matches_python_reader(corpus):
    """Decode the full file (segment_len == file length) and compare
    sample-exactly with the Python WAV reader."""
    from mbexwn_vocoder_tpu.compat.audio_io import read_wav
    from mbexwn_vocoder_tpu.compat.native_loader import NativeSegmentLoader, available

    if not available():
        pytest.skip("no C++ toolchain")
    for path in corpus:
        ref, sr = read_wav(path)
        loader = NativeSegmentLoader([path], segment_len=ref.shape[0], sample_rate=24000, n_workers=1)
        seg = loader.next_batch(1)[0]
        loader.close()
        np.testing.assert_allclose(seg, ref, rtol=0, atol=2e-5)


def test_dataset_uses_native_path(corpus, tmp_path):
    import mbexwn_vocoder_tpu as mv
    from mbexwn_vocoder_tpu.compat.native_loader import available
    from mbexwn_vocoder_tpu.config import read_config
    from mbexwn_vocoder_tpu.training.data import SegmentDataset

    if not available():
        pytest.skip("no C++ toolchain")
    data_dir = os.path.dirname(corpus[0])
    pc = read_config(mv.get_config_file("SPEECH"))["preprocess_config"]
    pc = dict(pc, segment_length=6000)
    ds = SegmentDataset(data_dir, pc, seed=1)
    assert ds._native is not None
    b = ds.batch(2)
    assert b["audio"].shape == (2, 6000)
    assert b["mel"].shape[0] == 2 and np.all(np.isfinite(b["mel"]))
