"""Training data pipeline: wav directory -> (audio, mel, F0) segment batches.

The reference validates batch_cache/file_reader config keys
(config_utils.py:397-440) but ships no loader; this is the equivalent
subsystem: random segment sampling, mel analysis, F0 extraction, and a
threaded prefetch queue so host IO overlaps device compute.
"""
from __future__ import annotations

import os
import queue
import threading
from typing import Dict, Iterator, List, Optional

import numpy as np

from ..analysis import compute_mel_spectrogram_internal
from ..compat.audio_io import read_wav
from ..dsp.f0 import estimate_f0, upsample_f0
from ..dsp.resample import resample


def list_audio_files(data_dir: str, exts=(".wav",)) -> List[str]:
    files = []
    for root, _, names in os.walk(data_dir):
        for n in sorted(names):
            if os.path.splitext(n)[1].lower() in exts:
                files.append(os.path.join(root, n))
    if not files:
        raise RuntimeError(f"no audio files found under {data_dir}")
    return files


class SegmentDataset:
    """Random fixed-length segments with per-segment mel + F0 targets."""

    def __init__(self, data_dir: str, preprocess_config: Dict, seed: int = 0,
                 fmin_f0: float = 50.0, fmax_f0: float = 600.0, cache_audio: bool = True,
                 use_native: bool = True):
        self.files = list_audio_files(data_dir)
        self.pc = dict(preprocess_config)
        self.segment_length = self.pc["segment_length"]
        self.hop = self.pc["hop_size"]
        self.sr = self.pc["sample_rate"]
        self.rng = np.random.RandomState(seed)
        self.fmin_f0 = fmin_f0
        self.fmax_f0 = fmax_f0
        self._cache: Dict[str, np.ndarray] = {}
        self.cache_audio = cache_audio

        # native C++ segment server (native/segment_loader.cc): used when the
        # whole corpus parses at the model sample rate, else python fallback
        self._native = None
        if use_native:
            try:
                from ..compat.native_loader import NativeSegmentLoader, available

                if available():
                    loader = NativeSegmentLoader(self.files, self.segment_length, self.sr, seed=seed)
                    if loader.n_files == len(self.files):
                        self._native = loader
                    else:
                        loader.close()
            except Exception:
                self._native = None

    def _load(self, path: str) -> np.ndarray:
        if path in self._cache:
            return self._cache[path]
        snd, sr = read_wav(path)
        if sr != self.sr:
            snd, _ = resample(snd, sr, self.sr, axis=0)
        snd = snd.astype(np.float32)
        if self.cache_audio:
            self._cache[path] = snd
        return snd

    def sample_segment(self) -> Dict[str, np.ndarray]:
        path = self.files[self.rng.randint(len(self.files))]
        snd = self._load(path)
        L = self.segment_length
        if snd.shape[0] < L:
            snd = np.pad(snd, (0, L - snd.shape[0]))
        start = self.rng.randint(max(1, snd.shape[0] - L + 1))
        seg = snd[start : start + L]
        mell, _ = compute_mel_spectrogram_internal(seg[None], preprocess_config=self.pc, do_post=True)
        f0_frames = estimate_f0(seg, self.sr, self.hop, fmin=self.fmin_f0, fmax=self.fmax_f0)
        f0 = upsample_f0(f0_frames, self.hop, L)
        return {"audio": seg, "mel": mell[0].astype(np.float32), "F0": f0}

    def _features(self, seg: np.ndarray) -> Dict[str, np.ndarray]:
        mell, _ = compute_mel_spectrogram_internal(seg[None], preprocess_config=self.pc, do_post=True)
        f0_frames = estimate_f0(seg, self.sr, self.hop, fmin=self.fmin_f0, fmax=self.fmax_f0)
        f0 = upsample_f0(f0_frames, self.hop, seg.shape[0])
        return {"audio": seg, "mel": mell[0].astype(np.float32), "F0": f0}

    def batch(self, batch_size: int) -> Dict[str, np.ndarray]:
        if self._native is not None:
            audio = self._native.next_batch(batch_size)
            segs = [self._features(audio[i]) for i in range(batch_size)]
        else:
            segs = [self.sample_segment() for _ in range(batch_size)]
        return {k: np.stack([s[k] for s in segs]) for k in segs[0]}


class PrefetchLoader:
    """Threaded prefetch of batches (host IO overlapping device compute)."""

    def __init__(self, dataset: SegmentDataset, batch_size: int, num_workers: int = 2, depth: int = 4):
        self.dataset = dataset
        self.batch_size = batch_size
        self.q: "queue.Queue" = queue.Queue(maxsize=depth)
        self._stop = threading.Event()
        self.workers = [threading.Thread(target=self._worker, daemon=True) for _ in range(num_workers)]
        for w in self.workers:
            w.start()

    def _worker(self):
        while not self._stop.is_set():
            batch = self.dataset.batch(self.batch_size)
            # block until the batch is consumed (short timeouts so close()
            # still wins): recomputing on queue.Full would silently burn a
            # full core re-extracting mel/F0 whenever the queue is full
            while not self._stop.is_set():
                try:
                    self.q.put(batch, timeout=1.0)
                    break
                except queue.Full:
                    continue

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        while True:
            yield self.q.get()

    def close(self):
        self._stop.set()
