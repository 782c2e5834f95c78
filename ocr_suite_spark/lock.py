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
- acquire = O_CREAT|O_EXCL create of ``<ckpt>/LOCK`` holding
  ``{"pid": ..., "host": ..., "acquired_at": ...}``.
- held by a LIVE pid on this host -> ``LockHeldError`` (EPERM from the
  liveness probe means the pid exists under another user = live).
- stale (pid dead) or corrupt (unparseable json) -> taken over, like the
  reference.
- The whole acquire section is serialized through a kernel ``flock`` on a
  sidecar (``LOCK.mutex``): check-alive → unlink-stale → create is one
  critical section, so two racing takeovers can never both succeed (the
  reference's unlink-then-create has that race; an earlier rename-based
  fix here still let a second rename land after the first racer's
  ownership check). flock is released by the kernel if the holder dies
  mid-acquire, so the sidecar cannot itself go stale. The LOCK file stays
  the visible pid record (reference contract); the sidecar is only the
  acquire mutex.
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

    def _with_mutex(self, fn):
        """Run fn under an exclusive kernel flock on the sidecar. BOTH
        acquire and release take it, so the acquire section's
        check-alive → unlink-stale → create can never interleave with a
        holder's release (a release without the flock could unlink LOCK
        between a waiter's exists-check and its unlink, crashing the
        waiter). The flock is released by the kernel if the process dies
        mid-section — the sidecar cannot go stale."""
        import fcntl

        gfd = os.open(f"{self.path}.mutex", os.O_CREAT | os.O_RDWR)
        try:
            fcntl.flock(gfd, fcntl.LOCK_EX)
            return fn()
        finally:
            fcntl.flock(gfd, fcntl.LOCK_UN)
            os.close(gfd)

    def acquire(self) -> "SingleInstanceLock":
        os.makedirs(os.path.dirname(self.path), exist_ok=True)

        def _acquire():
            if os.path.exists(self.path):
                if self._owner_alive():
                    raise LockHeldError(
                        f"another extraction holds {self.path} "
                        "(live pid; refusing to run concurrently)"
                    )
                try:
                    os.unlink(self.path)  # stale/corrupt takeover
                except FileNotFoundError:
                    pass  # vanished between exists() and unlink (crashed owner's
                    # cleanup, NFS, ...) — absent is exactly what we wanted
            fd = os.open(self.path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            with os.fdopen(fd, "wb") as f:
                f.write(self._payload())
            return self

        return self._with_mutex(_acquire)

    def release(self) -> None:
        def _release():
            if not self._owns():
                return  # never delete a lock we don't hold
            try:
                os.unlink(self.path)
            except FileNotFoundError:
                pass

        self._with_mutex(_release)

    def __enter__(self) -> "SingleInstanceLock":
        return self.acquire()

    def __exit__(self, *exc) -> None:
        self.release()
