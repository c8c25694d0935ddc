"""Cross-process TPU run lock.

The chip is reachable by ~one JAX process at a time (through the axon
tunnel, but also generally: a second process sharing the chip corrupts
both runs' timings). The round-2 benchmark postmortem recorded exactly
this failure: the official gate artifact timed a run that shared the
device path with other work and published a 24x-degraded number
(BENCH_r02.json, VERDICT round 2). The reference never needed this —
its benchmark owns the whole machine by construction (a single OpenMP
process, src/latticeboltzmann.c:127) — so this is the framework's
equivalent of "run the benchmark on an idle node".

Every TPU-touching entry point of this repo (bench.py, bench_suite,
scripts/anatomy.py, scripts/scaling.py --mode tpu) serializes on one
advisory flock. The lock auto-releases when its holder exits or dies
(kernel-managed), so no stale-lock cleanup is ever needed.
"""

from __future__ import annotations

import contextlib
import fcntl
import os
import sys
import time

LOCK_PATH = "/tmp/lbm_tpu.lock"


@contextlib.contextmanager
def tpu_lock(wait_s: float = 1800.0, path: str = LOCK_PATH):
    """Hold the inter-process TPU lock for the duration of the context.

    Blocks up to `wait_s` for another holder to finish (poll + flock
    LOCK_NB), then proceeds ANYWAY with a stderr warning — a benchmark
    that runs contended is recoverable by rerunning; one that never
    runs leaves no artifact at all. Yields True if the lock was
    acquired, False if it timed out and is running unlocked.
    """
    try:
        fd = os.open(path, os.O_CREAT | os.O_RDWR, 0o666)
        try:  # umask typically masks the create mode to 0644; make the
            os.fchmod(fd, 0o666)  # shared /tmp file writable cross-user
        except OSError:
            pass
    except OSError as e:
        # e.g. another user owns the lockfile at 0644: a benchmark that
        # cannot lock should still RUN (unlocked, flagged) — never die
        # before producing an artifact
        print(
            f"tpu_lock: cannot open {path} ({e}); running UNLOCKED",
            file=sys.stderr, flush=True,
        )
        yield False
        return
    acquired = False
    # Bind the cleanup callables as locals: a holder that lives until
    # interpreter shutdown (scripts/anatomy.py holds the lock for the
    # process lifetime) runs this finally during module teardown, when
    # the fcntl/os module globals may already be cleared to None.
    _flock, _unlock, _close = fcntl.flock, fcntl.LOCK_UN, os.close
    try:
        deadline = time.monotonic() + wait_s
        warned = False
        while True:
            try:
                fcntl.flock(fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
                acquired = True
                break
            except OSError:
                if time.monotonic() >= deadline:
                    print(
                        f"tpu_lock: still held after {wait_s:.0f} s; "
                        "proceeding UNLOCKED (timings may be contended)",
                        file=sys.stderr, flush=True,
                    )
                    break
                if not warned:
                    print(
                        f"tpu_lock: waiting for {path} (another TPU run "
                        "of this repo is active)",
                        file=sys.stderr, flush=True,
                    )
                    warned = True
                # clamp to the deadline so small wait_s stays a bound
                time.sleep(max(0.05, min(5.0, deadline - time.monotonic())))
        if acquired:
            os.ftruncate(fd, 0)
            os.write(fd, f"pid={os.getpid()}\n".encode())
        yield acquired
    finally:
        if acquired:
            try:
                _flock(fd, _unlock)
            except OSError:
                pass
        _close(fd)
