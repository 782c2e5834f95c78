"""T6 single-instance lock: live-holder rejection, stale- and
corrupt-lockfile takeover (reference contract:
tools/ocs-watcher/tests/test_single_instance.py:35-162)."""

from __future__ import annotations

import json
import os
import socket
import subprocess
import sys
import tempfile

import pytest

from ocr_suite_spark.lock import LockHeldError, SingleInstanceLock


@pytest.fixture()
def ckpt():
    return tempfile.mkdtemp(prefix="ocs-lock-")


def test_second_acquire_rejected_while_held(ckpt):
    with SingleInstanceLock(ckpt):
        with pytest.raises(LockHeldError, match="live pid"):
            SingleInstanceLock(ckpt).acquire()
    # released on exit -> acquirable again
    with SingleInstanceLock(ckpt):
        pass


def test_stale_lock_taken_over(ckpt):
    # a pid that existed and is now dead: a finished subprocess
    p = subprocess.run([sys.executable, "-c", "pass"], check=True)
    dead_pid = p.args and subprocess.Popen([sys.executable, "-c", "pass"])
    dead_pid.wait()
    with open(os.path.join(ckpt, "LOCK"), "w") as f:
        json.dump({"pid": dead_pid.pid, "host": socket.gethostname(), "acquired_at": 0}, f)
    with SingleInstanceLock(ckpt) as lk:  # takeover, no error
        info = json.load(open(lk.path))
        assert info["pid"] == os.getpid()


def test_corrupt_lockfile_taken_over(ckpt):
    with open(os.path.join(ckpt, "LOCK"), "w") as f:
        f.write("{not json")
    with SingleInstanceLock(ckpt) as lk:
        assert json.load(open(lk.path))["pid"] == os.getpid()


def test_foreign_host_lock_is_respected(ckpt):
    with open(os.path.join(ckpt, "LOCK"), "w") as f:
        json.dump({"pid": 1, "host": "some-other-machine", "acquired_at": 0}, f)
    with pytest.raises(LockHeldError):
        SingleInstanceLock(ckpt).acquire()


def test_extract_resumable_is_single_instance(spark, sf_dir, ckpt):
    from ocr_suite_spark import datagen
    from ocr_suite_spark.progress import extract_resumable

    docs = datagen.interleaved_from_documents(spark, sf_dir).limit(10)
    with SingleInstanceLock(ckpt):  # someone else is running
        with pytest.raises(LockHeldError):
            extract_resumable(spark, docs, ckpt + "/out", ckpt, n_buckets=2)
    # lock released -> run proceeds and releases its own lock at the end
    res = extract_resumable(spark, docs, ckpt + "/out", ckpt, n_buckets=2)
    assert res.count() == 10
    assert not os.path.exists(os.path.join(ckpt, "LOCK"))


def test_concurrent_stale_takeover_race(ckpt):
    """The reference's two-subprocess race, hardened: N processes racing to
    take over one STALE lock must produce exactly ONE holder (the flock'd
    acquire section makes check-alive -> unlink -> create atomic; the naive
    unlink-then-create — and even rename-then-verify — can mint two)."""
    import multiprocessing as mp

    dead = subprocess.Popen([sys.executable, "-c", "pass"])
    dead.wait()
    with open(os.path.join(ckpt, "LOCK"), "w") as f:
        json.dump({"pid": dead.pid, "host": socket.gethostname(), "acquired_at": 0}, f)

    def racer(q, barrier, done, ckpt_dir):
        from ocr_suite_spark.lock import LockHeldError, SingleInstanceLock

        barrier.wait()  # all racers start the acquire simultaneously
        try:
            lk = SingleInstanceLock(ckpt_dir).acquire()
            q.put(("won", os.getpid()))
            done.wait()  # hold until every racer has attempted exactly once
            lk.release()
        except LockHeldError:
            q.put(("lost", os.getpid()))
            done.wait()

    n = 8
    q: mp.Queue = mp.Queue()
    barrier = mp.Barrier(n)
    done = mp.Barrier(n)
    procs = [mp.Process(target=racer, args=(q, barrier, done, ckpt)) for _ in range(n)]
    for p in procs:
        p.start()
    results = [q.get(timeout=60) for _ in range(n)]
    for p in procs:
        p.join()
    winners = [pid for status, pid in results if status == "won"]
    assert len(winners) == 1, results
    # and the lock is released again after the winner exits
    with SingleInstanceLock(ckpt):
        pass
