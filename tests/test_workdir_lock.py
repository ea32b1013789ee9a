"""Single-writer work-dir lock (utils/locking.py).

Two training processes pointed at one work dir race on the same orbax
checkpoint directories (concurrent tensorstore OCDBT commits abort one
writer — observed live). Every training pipeline entry must refuse a second
live writer. The mechanism is a kernel flock: atomic against simultaneous
launches, auto-released when the holder dies (no stale-lock cleanup), and
immune to pid reuse.
"""
import os
import subprocess
import sys

import pytest

from vit_ae_plus_plus_tpu.utils.locking import (
    WorkdirLockedError,
    acquire_workdir_lock,
    locked_workdir,
    release_workdir_lock,
)


def lock_path(d):
    return os.path.join(d, ".writer.lock")


_HOLD_SRC = """
import fcntl, json, os, sys, time
fd = os.open(sys.argv[1], os.O_RDWR | os.O_CREAT, 0o644)
fcntl.flock(fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
os.ftruncate(fd, 0)
os.pwrite(fd, json.dumps({"pid": os.getpid(), "started": "held"}).encode(), 0)
print("HELD", flush=True)
time.sleep(120)
"""

_TRY_SRC = """
import fcntl, os, sys
fd = os.open(sys.argv[1], os.O_RDWR | os.O_CREAT, 0o644)
try:
    fcntl.flock(fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
    print("GOT")
except OSError:
    print("REFUSED")
"""


def hold_lock_in_child(d):
    """Spawn a process that really flocks the work dir's lock file."""
    os.makedirs(d, exist_ok=True)
    p = subprocess.Popen(
        [sys.executable, "-c", _HOLD_SRC, lock_path(d)],
        stdout=subprocess.PIPE, text=True,
    )
    assert p.stdout.readline().strip() == "HELD"
    return p


def other_process_can_lock(d) -> bool:
    out = subprocess.run(
        [sys.executable, "-c", _TRY_SRC, lock_path(d)],
        capture_output=True, text=True,
    ).stdout.strip()
    assert out in ("GOT", "REFUSED"), out
    return out == "GOT"


def test_acquire_blocks_others_release_frees(tmp_path):
    d = str(tmp_path / "work")
    acquire_workdir_lock(d)
    assert not other_process_can_lock(d)
    release_workdir_lock(d)
    assert other_process_can_lock(d)


def test_reentrant_holds_until_outermost_release(tmp_path):
    d = str(tmp_path / "work")
    acquire_workdir_lock(d)
    acquire_workdir_lock(d)  # chained pipelines / repeated calls
    release_workdir_lock(d)  # inner release must NOT drop the outer hold
    assert not other_process_can_lock(d)
    release_workdir_lock(d)
    assert other_process_can_lock(d)


def test_leftover_file_without_flock_does_not_block(tmp_path):
    """A lock file left by a SIGKILLed run holds no flock — resume needs no
    manual cleanup, and a recycled pid in the payload cannot fake liveness."""
    d = str(tmp_path / "work")
    os.makedirs(d)
    with open(lock_path(d), "w") as f:
        f.write('{"pid": 1, "started": "2020-01-01"}')  # pid 1 is alive
    acquire_workdir_lock(d)
    release_workdir_lock(d)


def test_torn_payload_does_not_block(tmp_path):
    d = str(tmp_path / "work")
    os.makedirs(d)
    with open(lock_path(d), "w") as f:
        f.write('{"pid": 123')  # killed mid-write; flock is gone anyway
    acquire_workdir_lock(d)
    release_workdir_lock(d)


def test_live_holder_refused_then_freed_by_its_death(tmp_path):
    d = str(tmp_path / "work")
    holder = hold_lock_in_child(d)
    try:
        with pytest.raises(WorkdirLockedError) as ei:
            acquire_workdir_lock(d)
        assert str(holder.pid) in str(ei.value)
        assert "--work-dir" in str(ei.value)
    finally:
        holder.kill()
        holder.wait()
    # the kernel released the flock with the process: no cleanup needed
    acquire_workdir_lock(d)
    release_workdir_lock(d)


def test_decorator_releases_on_exception(tmp_path):
    d = str(tmp_path / "work")

    @locked_workdir
    def boom(work_dir):
        assert not other_process_can_lock(work_dir)  # held during the body
        raise RuntimeError("mid-run failure")

    with pytest.raises(RuntimeError, match="mid-run"):
        boom(d)
    assert other_process_can_lock(d)  # finally released it


# The decorator wraps every training-pipeline entry, so a locked work dir
# must be refused before any config/data is touched — which also lets these
# run with no configs at all.
@pytest.mark.parametrize(
    "entry",
    ["pretrain_kfold", "moco_kfold", "resnet_kfold", "probe_kfold",
     "finetune_single", "contrastive_train"],
)
def test_every_training_pipeline_refuses_locked_workdir(tmp_path, entry):
    from vit_ae_plus_plus_tpu.pipelines import (
        contrastive,
        finetune,
        moco_kfold,
        pretrain_kfold,
        probe_kfold,
        resnet_kfold,
    )

    fns = {
        "pretrain_kfold": lambda d: pretrain_kfold.pretrain_kfold(None, None, d),
        "moco_kfold": lambda d: moco_kfold.moco_kfold(None, None, d),
        "resnet_kfold": lambda d: resnet_kfold.resnet_kfold(None, None, d),
        "probe_kfold": lambda d: probe_kfold.probe_kfold(None, None, d, None),
        "finetune_single": lambda d: finetune.finetune_single(None, None, d, None),
        "contrastive_train": lambda d: contrastive.contrastive_train(None, None, d),
    }
    d = str(tmp_path / "work")
    holder = hold_lock_in_child(d)
    try:
        with pytest.raises(WorkdirLockedError):
            fns[entry](d)
    finally:
        holder.kill()
        holder.wait()


def test_cli_formats_lock_error(tmp_path, capsys, monkeypatch):
    """The console entry reports a held lock as `error: ...` + rc 2, not a
    traceback (the lock is taken before any data/config is touched, so a
    bogus --data-path never gets the chance to fail first)."""
    from vit_ae_plus_plus_tpu import cli

    d = str(tmp_path / "work")
    holder = hold_lock_in_child(d)
    try:
        monkeypatch.setattr(
            sys, "argv",
            ["vitae", "pretrain-kfold", "--data-path", str(tmp_path / "nope"),
             "--work-dir", d],
        )
        assert cli.run() == 2
        err = capsys.readouterr().err
        assert "WorkdirLockedError" in err and str(holder.pid) in err
    finally:
        holder.kill()
        holder.wait()
