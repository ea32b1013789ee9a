"""Single-writer work-dir lock for the training pipelines.

Two training processes sharing one work dir race on the same orbax
checkpoint directories; tensorstore's OCDBT writer detects the conflicting
commit and aborts one writer mid-epoch (observed live on this project: two
concurrently launched `pretrain-kfold` runs on one work dir died with
``tensorstore/kvstore/transaction.cc`` commit aborts, and the survivor's
silently-corrupted fold checkpoint produced a below-chance downstream
AUROC). The reference has no guard at all — two of its ``main_*.py``
launches pointed at one ``--output_dir`` clobber each other's ``.pth``
files last-writer-wins (/root/reference/model/main_autoenc.py output_dir
handling). We refuse loudly instead.

Semantics
---------
* One lock file per work dir (``<work_dir>/.writer.lock``), containing the
  holder's pid and start time as JSON.
* Same-process re-acquisition is a no-op refresh: the k-fold pipelines are
  routinely chained in one process (pretrain -> extract -> probe on the same
  dir), and tests call them repeatedly.
* A lock whose pid is dead is stale and silently replaced — a SIGKILLed run
  must stay resumable without manual cleanup, so release-on-exit is a
  nicety (registered via atexit) rather than a correctness requirement.
* A lock whose pid is alive in another process raises
  :class:`WorkdirLockedError` with the pid and the remediation.

Scope: single host. Staleness is decided by pid liveness (``os.kill(pid,
0)``), which cannot be checked across hosts; multi-host SPMD launches run
one process per host against host-local or per-host-suffixed work dirs
(parallel/mesh.py), so cross-host contention does not arise in the
supported layouts.
"""
from __future__ import annotations

import atexit
import json
import os
import time
from typing import Optional

_LOCK_NAME = ".writer.lock"
_atexit_registered = set()


class WorkdirLockedError(RuntimeError):
    """Another live process holds the work-dir writer lock."""


def _lock_path(work_dir: str) -> str:
    return os.path.join(work_dir, _LOCK_NAME)


def _pid_alive(pid: int) -> bool:
    if pid <= 0:
        return False
    try:
        os.kill(pid, 0)
    except ProcessLookupError:
        return False
    except PermissionError:
        return True  # exists, owned by someone else
    return True


def _read_lock(path: str) -> Optional[dict]:
    try:
        with open(path) as f:
            return json.load(f)
    except (OSError, ValueError):
        # vanished between listdir and open, or torn write from a killed
        # process — both mean "not a live holder"
        return None


def _write_lock(path: str) -> None:
    payload = json.dumps(
        {"pid": os.getpid(), "started": time.strftime("%Y-%m-%dT%H:%M:%S")}
    )
    tmp = f"{path}.{os.getpid()}.tmp"
    with open(tmp, "w") as f:
        f.write(payload)
    os.replace(tmp, path)  # atomic on POSIX


def acquire_workdir_lock(work_dir: str) -> None:
    """Take (or refresh) the single-writer lock on ``work_dir``.

    Raises :class:`WorkdirLockedError` if another live process holds it.
    """
    os.makedirs(work_dir, exist_ok=True)
    path = _lock_path(work_dir)
    held = _read_lock(path)
    if held is not None:
        pid = int(held.get("pid", -1))
        if pid == os.getpid():
            return  # re-entrant: we already own this dir
        if _pid_alive(pid):
            raise WorkdirLockedError(
                f"work dir {work_dir!r} is locked by live pid {pid} (started "
                f"{held.get('started', '?')}). Two training processes sharing "
                "one work dir corrupt each other's checkpoints (concurrent "
                "orbax/tensorstore commits). Wait for that run, point this one "
                f"at a different --work-dir, or — if pid {pid} belongs to a "
                f"different machine that crashed — delete {path}."
            )
        print(
            f"Replacing stale work-dir lock {path} (pid {pid} is dead)",
            flush=True,
        )
    _write_lock(path)
    # A stale lock can be observed by two racers at once; os.replace means
    # last-writer-wins, so confirm we are the one that won.
    winner = _read_lock(path)
    if winner is not None and int(winner.get("pid", -1)) != os.getpid():
        raise WorkdirLockedError(
            f"lost the work-dir lock race for {work_dir!r} to live pid "
            f"{winner.get('pid')} — use a different --work-dir."
        )
    real = os.path.realpath(work_dir)
    if real not in _atexit_registered:
        _atexit_registered.add(real)
        atexit.register(release_workdir_lock, work_dir)


def release_workdir_lock(work_dir: str) -> None:
    """Drop the lock if this process holds it (no-op otherwise)."""
    path = _lock_path(work_dir)
    held = _read_lock(path)
    if held is not None and int(held.get("pid", -1)) == os.getpid():
        try:
            os.remove(path)
        except OSError:
            pass
