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
        except PermissionError:
            # EPERM: the pid EXISTS but belongs to another user — the lock
            # is live (a shared checkpoint dir across users is exactly the
            # case T6 must protect). Only ESRCH means dead.
            return True
        except ProcessLookupError:
            return False

    def _payload(self) -> bytes:
        return json.dumps(
            {
                "pid": os.getpid(),
                "host": socket.gethostname(),
                "acquired_at": time.time(),
            }
        ).encode()

    def _owns(self) -> bool:
        try:
            with open(self.path) as f:
                info = json.load(f)
            return int(info["pid"]) == os.getpid() and info["host"] == socket.gethostname()
        except Exception:
            return False

    def acquire(self) -> "SingleInstanceLock":
        os.makedirs(os.path.dirname(self.path), exist_ok=True)
        try:
            fd = os.open(self.path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            if self._owner_alive():
                raise LockHeldError(
                    f"another extraction holds {self.path} "
                    "(live pid; refusing to run concurrently)"
                ) from None
            # Stale/corrupt: take over by atomically renaming a fresh
            # lockfile OVER the stale one (never unlink-then-create — two
            # racing takeovers could each observe the stale file, and the
            # loser's pending unlink would delete the winner's fresh lock,
            # leaving two holders). rename is atomic; exactly one payload
            # survives, and the post-verify below decides who won.
            tmp = f"{self.path}.takeover.{os.getpid()}"
            with open(tmp, "wb") as f:
                f.write(self._payload())
            os.rename(tmp, self.path)
            if not self._owns():
                raise LockHeldError(
                    f"lost stale-takeover race for {self.path}"
                ) from None
            return self
        with os.fdopen(fd, "wb") as f:
            f.write(self._payload())
        # Post-create verify: a concurrent stale-takeover rename can clobber
        # an O_EXCL create that landed between its liveness check and its
        # rename; ownership is only real if our pid is the one on disk.
        if not self._owns():
            raise LockHeldError(f"lost acquisition race for {self.path}")
        return self

    def release(self) -> None:
        if not self._owns():
            return  # never delete a lock we don't hold
        try:
            os.unlink(self.path)
        except FileNotFoundError:
            pass

    def __enter__(self) -> "SingleInstanceLock":
        return self.acquire()

    def __exit__(self, *exc) -> None:
        self.release()
