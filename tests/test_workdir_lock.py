"""Single-writer work-dir lock (utils/locking.py).

Two training processes pointed at one work dir race on the same orbax
checkpoint directories (concurrent tensorstore OCDBT commits abort one
writer and can leave a silently-corrupt checkpoint behind — observed live).
Every training pipeline entry must refuse a second live writer.
"""
import json
import os
import subprocess
import sys

import pytest

from vit_ae_plus_plus_tpu.utils.locking import (
    WorkdirLockedError,
    acquire_workdir_lock,
    release_workdir_lock,
)


def lock_path(d):
    return os.path.join(d, ".writer.lock")


def write_foreign_lock(d, pid):
    os.makedirs(d, exist_ok=True)
    with open(lock_path(d), "w") as f:
        json.dump({"pid": pid, "started": "2026-01-01T00:00:00"}, f)


def dead_pid():
    p = subprocess.Popen(["true"])
    p.wait()
    return p.pid


def test_acquire_creates_and_release_removes(tmp_path):
    d = str(tmp_path / "work")
    acquire_workdir_lock(d)
    assert os.path.exists(lock_path(d))
    with open(lock_path(d)) as f:
        assert json.load(f)["pid"] == os.getpid()
    release_workdir_lock(d)
    assert not os.path.exists(lock_path(d))


def test_reentrant_within_one_process(tmp_path):
    d = str(tmp_path / "work")
    acquire_workdir_lock(d)
    acquire_workdir_lock(d)  # chained pipelines / repeated calls: no-op
    release_workdir_lock(d)


def test_stale_lock_from_dead_pid_is_replaced(tmp_path, capsys):
    d = str(tmp_path / "work")
    write_foreign_lock(d, dead_pid())
    acquire_workdir_lock(d)
    assert "stale" in capsys.readouterr().out
    with open(lock_path(d)) as f:
        assert json.load(f)["pid"] == os.getpid()
    release_workdir_lock(d)


def test_live_foreign_pid_refused_with_actionable_message(tmp_path):
    d = str(tmp_path / "work")
    other = subprocess.Popen([sys.executable, "-c", "import time; time.sleep(60)"])
    try:
        write_foreign_lock(d, other.pid)
        with pytest.raises(WorkdirLockedError) as ei:
            acquire_workdir_lock(d)
        msg = str(ei.value)
        assert str(other.pid) in msg and "--work-dir" in msg
        # and the foreign lock is left untouched
        with open(lock_path(d)) as f:
            assert json.load(f)["pid"] == other.pid
    finally:
        other.kill()
        other.wait()


def test_torn_lock_file_treated_as_stale(tmp_path):
    d = str(tmp_path / "work")
    os.makedirs(d, exist_ok=True)
    with open(lock_path(d), "w") as f:
        f.write('{"pid": 123')  # killed mid-write
    acquire_workdir_lock(d)
    release_workdir_lock(d)


def test_release_does_not_remove_foreign_lock(tmp_path):
    d = str(tmp_path / "work")
    write_foreign_lock(d, 1)  # pid 1: alive, never ours
    release_workdir_lock(d)
    assert os.path.exists(lock_path(d))
    os.remove(lock_path(d))


# The acquire call is the FIRST statement of every training-pipeline entry,
# so a locked work dir must be refused before any config/data is touched —
# which also lets these run with no configs at all.
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
    other = subprocess.Popen([sys.executable, "-c", "import time; time.sleep(60)"])
    try:
        write_foreign_lock(d, other.pid)
        with pytest.raises(WorkdirLockedError):
            fns[entry](d)
    finally:
        other.kill()
        other.wait()


def test_cli_formats_lock_error(tmp_path, capsys, monkeypatch):
    """The console entry reports a held lock as `error: ...` + rc 2, not a
    traceback (the lock is taken before any data/config is touched, so a
    bogus --data-path never gets the chance to fail first)."""
    from vit_ae_plus_plus_tpu import cli

    d = str(tmp_path / "work")
    other = subprocess.Popen([sys.executable, "-c", "import time; time.sleep(60)"])
    try:
        write_foreign_lock(d, other.pid)
        monkeypatch.setattr(
            sys, "argv",
            ["vitae", "pretrain-kfold", "--data-path", str(tmp_path / "nope"),
             "--work-dir", d],
        )
        assert cli.run() == 2
        err = capsys.readouterr().err
        assert "WorkdirLockedError" in err and str(other.pid) in err
    finally:
        other.kill()
        other.wait()
