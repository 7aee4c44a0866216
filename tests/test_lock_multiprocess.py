"""Two-process write-lock integration: the reference's single-writer
guarantee (trough/write.py:55-57) is cross-process, so prove exclusion,
handoff, and stale-lock stealing against a REAL second interpreter running
the REAL ``SegmentStore._file_lock`` code path (no Spark needed — the lock
only touches the store root)."""

from __future__ import annotations

import os
import subprocess
import sys
import time

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Child program: acquire the segment lock via the real code path, signal
# acquisition through a sentinel file, then either hold until told to
# release, or die abruptly (skipping the finally) to leave a stale lock.
CHILD = r"""
import os, sys, time
sys.path.insert(0, sys.argv[1])
from trough_spark.store import SegmentStore

root, mode = sys.argv[2], sys.argv[3]
store = SegmentStore.__new__(SegmentStore)
store.root = root
store.lock_timeout = 5.0
with SegmentStore._file_lock(store, "seg1"):
    open(os.path.join(root, "child_has_lock"), "w").close()
    if mode == "die":
        os._exit(0)  # abrupt death: the finally never runs -> stale lock
    deadline = time.monotonic() + 30
    while not os.path.exists(os.path.join(root, "release")) and time.monotonic() < deadline:
        time.sleep(0.02)
"""


def _mini_store(root: str, timeout: float):
    from trough_spark.store import SegmentStore

    store = SegmentStore.__new__(SegmentStore)
    store.root = root
    store.lock_timeout = timeout
    return store


def _spawn(root: str, mode: str) -> subprocess.Popen:
    return subprocess.Popen([sys.executable, "-c", CHILD, REPO, root, mode])


def _wait_for(path: str, timeout: float = 15.0) -> None:
    deadline = time.monotonic() + timeout
    while not os.path.exists(path):
        assert time.monotonic() < deadline, f"timed out waiting for {path}"
        time.sleep(0.02)


def test_live_holder_excludes_second_process(tmp_path):
    from trough_spark.store import SegmentStore, WriteLockError

    root = str(tmp_path)
    child = _spawn(root, "hold")
    try:
        _wait_for(os.path.join(root, "child_has_lock"))
        store = _mini_store(root, timeout=0.5)
        with pytest.raises(WriteLockError):
            with SegmentStore._file_lock(store, "seg1"):
                pass
    finally:
        open(os.path.join(root, "release"), "w").close()
        assert child.wait(timeout=15) == 0
    # after the child releases, acquisition succeeds
    with SegmentStore._file_lock(_mini_store(root, 5.0), "seg1"):
        pass


def test_waiter_acquires_after_holder_releases(tmp_path):
    from trough_spark.store import SegmentStore

    root = str(tmp_path)
    child = _spawn(root, "hold")
    try:
        _wait_for(os.path.join(root, "child_has_lock"))
        # schedule the release while we are already blocked waiting
        open(os.path.join(root, "release"), "w").close()
        t0 = time.monotonic()
        with SegmentStore._file_lock(_mini_store(root, 10.0), "seg1"):
            took = time.monotonic() - t0
        assert took < 10.0
    finally:
        child.wait(timeout=15)


def test_stale_lock_from_dead_process_is_stolen(tmp_path):
    from trough_spark.store import SegmentStore

    root = str(tmp_path)
    child = _spawn(root, "die")
    _wait_for(os.path.join(root, "child_has_lock"))
    child.wait(timeout=15)  # child is now dead, lockfile still on disk
    lock_path = os.path.join(root, "_locks", "seg1.lock")
    assert os.path.exists(lock_path), "child must have left a stale lock"
    t0 = time.monotonic()
    with SegmentStore._file_lock(_mini_store(root, 5.0), "seg1"):
        pass
    assert time.monotonic() - t0 < 2.0, "stale lock must be stolen, not waited out"
