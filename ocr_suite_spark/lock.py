"""T6 — single-instance lock on the checkpoint directory.

The reference enforces one watcher per database with a pid lockfile,
including stale- and corrupt-lockfile takeover (/root/reference
tools/ocs-watcher/ocsw/single_instance.py, tested in
tests/test_single_instance.py:35-162). Same contract here, guarding the
progress store: two concurrent `extract_resumable` runs over one
checkpoint dir would interleave progress appends and dynamic partition
overwrites — the one writer the design assumes (ProgressStore docstring)
becomes an enforced invariant instead of a convention.

Semantics:
- acquire = atomic O_CREAT|O_EXCL create of ``<ckpt>/LOCK`` holding
  ``{"pid": ..., "host": ..., "acquired_at": ...}``.
- held by a LIVE pid on this host -> ``LockHeldError``.
- stale (pid dead) or corrupt (unparseable json) -> taken over, like the
  reference.
- on a real cluster the driver host runs exactly one of these per job;
  cross-host mutual exclusion comes from the storage layer (Iceberg
  snapshot CAS) — this lock is the driver-side guard, as in the
  reference (one watcher per machine per DB).
"""

from __future__ import annotations

import json
import os
import socket
import time


class LockHeldError(RuntimeError):
    pass


class SingleInstanceLock:
    def __init__(self, ckpt_dir: str):
        self.path = os.path.join(ckpt_dir.rstrip("/"), "LOCK")

    def _owner_alive(self) -> bool:
        try:
            with open(self.path) as f:
                info = json.load(f)
            pid = int(info["pid"])
            host = info["host"]
        except Exception:
            return False  # corrupt lockfile = stale (reference semantics)
        if host != socket.gethostname():
            # a foreign host's lock cannot be liveness-checked from here;
            # treat as held (conservative — matches the reference, which is
            # per-machine by design)
            return True
        try:
            os.kill(pid, 0)
            return True
        except (ProcessLookupError, PermissionError):
            return False

    def acquire(self) -> "SingleInstanceLock":
        os.makedirs(os.path.dirname(self.path), exist_ok=True)
        for _ in range(2):  # second try after removing a stale lock
            try:
                fd = os.open(self.path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            except FileExistsError:
                if self._owner_alive():
                    raise LockHeldError(
                        f"another extraction holds {self.path} "
                        "(live pid; refusing to run concurrently)"
                    ) from None
                try:
                    os.unlink(self.path)  # stale/corrupt: take over
                except FileNotFoundError:
                    pass
                continue
            with os.fdopen(fd, "w") as f:
                json.dump(
                    {
                        "pid": os.getpid(),
                        "host": socket.gethostname(),
                        "acquired_at": time.time(),
                    },
                    f,
                )
            return self
        raise LockHeldError(f"could not acquire {self.path}")

    def release(self) -> None:
        try:
            os.unlink(self.path)
        except FileNotFoundError:
            pass

    def __enter__(self) -> "SingleInstanceLock":
        return self.acquire()

    def __exit__(self, *exc) -> None:
        self.release()
