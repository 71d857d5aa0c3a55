"""Advisory lock marking a heavy DuckDB sweep in progress.

The r14 bench was polluted by running concurrently with the sf10 oracle
retry sweep (32 cores + up to 100 GB): 34 queries showed >1.5x phantom
regressions in code that did not change. Mutual exclusion is now a
protocol, not discipline:

  - every long DuckDB run (oracle_sweep.py, baseline_duckdb.py) holds
    /tmp/graft/oracle_sweep.lock (contents: its PID) for its lifetime;
  - graft.Bench polls the same path at startup and waits (bounded) for
    the lock to clear; if it cannot, it proceeds but tags its output
    JSON with "contended":true so a polluted number can never be read
    as a clean round-over-round signal.

A lock whose PID is dead is stale and ignored (a killed sweep must not
block the round's bench forever).
"""
import atexit
import os

LOCK = os.environ.get("GRAFT_SWEEP_LOCK", "/tmp/graft/oracle_sweep.lock")


def holder():
    """PID holding the lock, or None if free/stale."""
    try:
        pid = int(open(LOCK).read().strip())
    except (OSError, ValueError):
        return None
    try:
        os.kill(pid, 0)
    except (ProcessLookupError, PermissionError):
        return None
    return pid


def acquire():
    """Atomically take the lock (O_CREAT|O_EXCL — the r15 check-then-write
    let two sweeps starting in the same instant both pass the holder check
    and both believe they owned it). On EEXIST: a live holder refuses; a
    stale one is unlinked and the create retried."""
    os.makedirs(os.path.dirname(LOCK), exist_ok=True)
    for _ in range(3):
        try:
            fd = os.open(LOCK, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            h = holder()
            if h is not None and h != os.getpid():
                raise SystemExit(
                    f"another sweep holds {LOCK} (pid {h}); refusing to start — "
                    "two concurrent DuckDB sweeps pollute each other and any "
                    "bench window")
            # stale (dead pid / unreadable) or our own: clear and retry
            try:
                os.unlink(LOCK)
            except OSError:
                pass
            continue
        with os.fdopen(fd, "w") as f:
            f.write(str(os.getpid()))
        atexit.register(release)
        return
    raise SystemExit(f"could not acquire {LOCK} after 3 attempts")


def release():
    try:
        if holder() == os.getpid():
            os.unlink(LOCK)
    except OSError:
        pass
