"""Cooperative single-tenant TPU lock.

The axon relay TPU is single-tenant: a second claimant wedges forever
(CLAUDE.md "TPU runtime").  Round 4 showed the cost of NOT enforcing that
cooperatively: the driver's `python bench.py` raced the repo's own training
chain and the captured headline halved (BENCH_r04 b1 243.6x vs the builder's
486.4x measured hours earlier on an idle host).

Protocol: every process that claims the TPU takes an exclusive `flock` on
`.runs/tpu.lock` for its whole device lifetime, INCLUDING the post-exit
cooldown the relay needs before the next claimant (>=60 s, >=120 s after a
crash).  Bash steps (tools/train_chain.sh, the measurement queues) use
`flock(1)` around each leg; Python entry points that the driver may invoke
concurrently (bench.py) use `acquire_tpu_lock` below.

The lock is advisory and repo-local — it cannot protect against a claimant
outside this repo — but every TPU-touching path in this repo routes through
it, which is exactly the race the round-4 regression came from.
"""
from __future__ import annotations

import fcntl
import os
import sys
import time

LOCK_PATH = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                         ".runs", "tpu.lock")


def acquire_tpu_lock(timeout_s: float = 3600.0, label: str = ""):
    """Block until the repo-wide TPU lock is held; returns the open fd holder.

    Keep the returned object alive for as long as the process touches the
    TPU (the lock releases on close/process exit).  Returns None without
    locking when MBEXWN_TPU_LOCK=0 (tests, CPU-only runs).

    A training leg holds the lock for ~25 min, so the default timeout is a
    full hour; progress is logged so a waiting driver run is diagnosable.
    """
    if os.environ.get("MBEXWN_TPU_LOCK", "1") == "0":
        return None
    os.makedirs(os.path.dirname(LOCK_PATH), exist_ok=True)
    f = open(LOCK_PATH, "a+")
    t0 = time.time()
    last_note = 0.0
    while True:
        try:
            fcntl.flock(f.fileno(), fcntl.LOCK_EX | fcntl.LOCK_NB)
            break
        except OSError:
            waited = time.time() - t0
            if waited >= timeout_s:
                holder = _holder(f)
                f.close()
                raise TimeoutError(
                    f"TPU lock {LOCK_PATH} still held after {int(waited)} s "
                    f"(holder: {holder}); refusing to race the single-tenant device")
            if waited - last_note >= 60 or last_note == 0.0:
                print(f"[tpu_lock] waiting for {LOCK_PATH} "
                      f"(held by: {_holder(f)}; {int(waited)} s elapsed)",
                      file=sys.stderr, flush=True)
                last_note = waited
            time.sleep(5.0)
    try:
        f.seek(0)
        f.truncate()
        f.write(f"pid={os.getpid()} label={label or os.path.basename(sys.argv[0])} "
                f"t={time.strftime('%Y-%m-%dT%H:%M:%SZ', time.gmtime())}\n")
        f.flush()
    except OSError:
        pass
    return f


def _holder(f) -> str:
    try:
        f.seek(0)
        return f.read().strip() or "unknown"
    except OSError:
        return "unknown"
