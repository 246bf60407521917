"""TPU lock protocol: the python side (tools/tpu_lock.py, used by bench.py)
and the bash side (`flock` in tools/train_chain.sh / tools/r5_queue.sh) must
exclude each other on the same .runs/tpu.lock file."""
import os
import subprocess
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

import tpu_lock


def _flock_nb(path):
    """Exit code of a non-blocking bash flock attempt on `path`."""
    return subprocess.run(
        ["flock", "-n", str(path), "-c", "true"],
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
    ).returncode


def test_python_holder_excludes_bash_flock(tmp_path, monkeypatch):
    lock_path = tmp_path / "tpu.lock"
    monkeypatch.setattr(tpu_lock, "LOCK_PATH", str(lock_path))
    monkeypatch.setenv("MBEXWN_TPU_LOCK", "1")  # conftest pins 0 for the suite

    holder = tpu_lock.acquire_tpu_lock(timeout_s=5, label="test")
    assert holder is not None
    assert _flock_nb(lock_path) != 0, "bash flock should fail while python holds"
    assert f"pid={os.getpid()}" in open(lock_path).read()

    holder.close()
    assert _flock_nb(lock_path) == 0, "bash flock should succeed after release"


def test_python_waiter_times_out_against_bash_holder(tmp_path, monkeypatch):
    lock_path = tmp_path / "tpu.lock"
    monkeypatch.setattr(tpu_lock, "LOCK_PATH", str(lock_path))
    monkeypatch.setenv("MBEXWN_TPU_LOCK", "1")

    # bash-side holder (what a train_chain leg does), held for 30 s
    p = subprocess.Popen(["flock", str(lock_path), "-c", "sleep 30"])
    try:
        # wait until bash actually holds it
        for _ in range(100):
            if _flock_nb(lock_path) != 0:
                break
        else:
            pytest.fail("bash holder never acquired")
        with pytest.raises(TimeoutError):
            tpu_lock.acquire_tpu_lock(timeout_s=1, label="test")
    finally:
        p.terminate()
        p.wait()


def test_disabled_by_env(tmp_path, monkeypatch):
    monkeypatch.setattr(tpu_lock, "LOCK_PATH", str(tmp_path / "tpu.lock"))
    monkeypatch.setenv("MBEXWN_TPU_LOCK", "0")
    assert tpu_lock.acquire_tpu_lock(timeout_s=1) is None
