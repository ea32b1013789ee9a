"""Single-writer work-dir lock for the training pipelines.

Two training processes sharing one work dir race on the same orbax
checkpoint directories; tensorstore's OCDBT writer detects the conflicting
commit and aborts one writer mid-epoch (observed live on this project: two
concurrently launched `pretrain-kfold` runs on one work dir died with
``tensorstore/kvstore/transaction.cc`` commit aborts). The reference has no
guard at all — two of its ``main_*.py`` launches pointed at one
``--output_dir`` clobber each other's ``.pth`` files last-writer-wins
(/root/reference/model/main_autoenc.py output_dir handling). We refuse
loudly instead.

Mechanism: ``flock(LOCK_EX | LOCK_NB)`` on ``<work_dir>/.writer.lock``,
held for the duration of the pipeline. flock is kernel-atomic (no
check-then-create race between two simultaneous launches) and is released
automatically when the holding process dies — a SIGKILLed run leaves no
stale lock and resumes with no manual cleanup, and a recycled pid can
never masquerade as a live holder. The file's JSON payload (pid, start
time) is purely diagnostic for the refusal message; a leftover file with
no active flock locks nothing.

Semantics
---------
* :func:`locked_workdir` decorates a pipeline entry taking a ``work_dir``
  argument: the lock is taken before the body runs (before any config or
  data is touched) and released in ``finally`` — an exception mid-run
  cannot leave the dir locked for the rest of a long-lived host process.
* Acquisition is re-entrant within one process (per-path hold count): the
  k-fold pipelines are routinely chained in one process and tests call
  them repeatedly; an inner hold released by ``finally`` does not drop an
  outer one.
* A second live holder raises :class:`WorkdirLockedError` naming the
  holder's pid and the remediation.

Scope: single host (flock does not span NFS reliably; multi-host SPMD
launches run one process per host against host-local or per-host-suffixed
work dirs — parallel/mesh.py).
"""
from __future__ import annotations

import fcntl
import functools
import inspect
import json
import os
import time
from typing import Dict

_LOCK_NAME = ".writer.lock"
# realpath -> [fd, hold_count]; the open fd IS the lock
_held: Dict[str, list] = {}


class WorkdirLockedError(RuntimeError):
    """Another live process holds the work-dir writer lock."""


def _lock_path(work_dir: str) -> str:
    return os.path.join(work_dir, _LOCK_NAME)


def acquire_workdir_lock(work_dir: str) -> None:
    """Take (or re-enter) the single-writer flock on ``work_dir``.

    Raises :class:`WorkdirLockedError` if another live process holds it.
    """
    os.makedirs(work_dir, exist_ok=True)
    key = os.path.realpath(work_dir)
    if key in _held:
        _held[key][1] += 1
        return
    path = _lock_path(work_dir)
    fd = os.open(path, os.O_RDWR | os.O_CREAT, 0o644)
    try:
        fcntl.flock(fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
    except OSError:
        holder = "unknown pid"
        try:
            held = json.loads(os.read(fd, 4096) or b"{}")
            holder = f"pid {held.get('pid', '?')} (started {held.get('started', '?')})"
        except ValueError:
            pass
        os.close(fd)
        raise WorkdirLockedError(
            f"work dir {work_dir!r} is locked by live {holder}. Two training "
            "processes sharing one work dir corrupt each other's checkpoints "
            "(concurrent orbax/tensorstore commits). Wait for that run or "
            "point this one at a different --work-dir. (The lock is a kernel "
            "flock: it vanishes with its process, so it is never stale.)"
        ) from None
    # record the hold FIRST: if the diagnostic write below failed after the
    # flock was won (e.g. ENOSPC), an unrecorded fd would wedge this process
    # out of its own lock for the rest of its lifetime
    _held[key] = [fd, 1]
    try:
        payload = json.dumps(
            {"pid": os.getpid(), "started": time.strftime("%Y-%m-%dT%H:%M:%S")}
        ).encode()
        os.ftruncate(fd, 0)
        os.pwrite(fd, payload, 0)
    except OSError:
        pass  # payload is purely diagnostic; the flock itself is the lock


def release_workdir_lock(work_dir: str) -> None:
    """Drop one hold; the flock is released when the count reaches zero.

    No-op if this process does not hold the lock. The lock file itself is
    left in place deliberately: unlinking it would let a racer flock the
    old inode while a third process creates-and-flocks a fresh file —
    two winners. A file with no active flock locks nothing.
    """
    key = os.path.realpath(work_dir)
    entry = _held.get(key)
    if entry is None:
        return
    entry[1] -= 1
    if entry[1] > 0:
        return
    fd, _ = _held.pop(key)
    try:
        fcntl.flock(fd, fcntl.LOCK_UN)
    finally:
        os.close(fd)


def locked_workdir(fn):
    """Hold the work-dir writer lock for the duration of ``fn``.

    ``fn`` must take a ``work_dir`` argument (positionally or by keyword).
    The lock is acquired BEFORE the body runs — a locked dir is refused
    before any config or data is touched — and released in ``finally``.
    """
    sig = inspect.signature(fn)

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        bound = sig.bind_partial(*args, **kwargs)
        work_dir = bound.arguments["work_dir"]
        acquire_workdir_lock(work_dir)
        try:
            return fn(*args, **kwargs)
        finally:
            release_workdir_lock(work_dir)

    return wrapper
