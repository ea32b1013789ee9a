"""Environment diagnostics (utils/doctor.py + the doctor CLI)."""

from vit_ae_plus_plus_tpu.utils.doctor import _FAIL, _OK, run_doctor


def test_doctor_passes_in_ci(capsys):
    assert run_doctor() == 0
    out = capsys.readouterr().out
    assert "device compute" in out and "all checks passed" in out


def test_doctor_reports_failures(capsys):
    checks = [
        ("always-ok", lambda: (_OK, "fine")),
        ("always-bad", lambda: (_FAIL, "broken thing")),
        ("crasher", lambda: 1 / 0),
    ]
    assert run_doctor(checks) == 1
    out = capsys.readouterr().out
    assert "broken thing" in out and "check crashed" in out
    assert "2 check(s) FAILED" in out


def test_doctor_cli():
    from vit_ae_plus_plus_tpu.cli import main as cli_main

    assert cli_main(["doctor"]) == 0
