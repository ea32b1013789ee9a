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


def test_doctor_flags_cross_machine_cache_entries(tmp_path):
    """XLA:CPU AOT cache entries compiled on another machine are a documented
    SIGILL hazard (cpu_aot_loader). The cache dir is keyed by machine
    fingerprint (utils/cache.py); entries in the UN-keyed legacy root must
    surface as a WARN naming the remediation (VERDICT r4 #4)."""
    from vit_ae_plus_plus_tpu.utils.cache import (
        default_cache_dir, machine_fingerprint,
    )
    from vit_ae_plus_plus_tpu.utils.doctor import _check_cache_machine_key

    fp = machine_fingerprint()
    assert len(fp) == 12 and fp == machine_fingerprint()  # stable
    assert default_cache_dir().endswith(fp)

    # empty / keyed-only root: ok
    status, detail = _check_cache_machine_key(str(tmp_path))
    assert status == "ok" and fp in detail
    (tmp_path / fp).mkdir()
    (tmp_path / fp / "entry").write_bytes(b"x")  # keyed entry is fine
    (tmp_path / ".probe").write_bytes(b"x")  # dotfiles ignored
    status, _ = _check_cache_machine_key(str(tmp_path))
    assert status == "ok"

    # a stray entry directly in the un-keyed root: warn + remediation
    (tmp_path / "xla_compile_abc123").write_bytes(b"\x7fELF")
    status, detail = _check_cache_machine_key(str(tmp_path))
    assert status == "warn"
    assert "xla_compile_abc123" in detail and "SIGILL" in detail
    assert fp in detail  # the remediation names the keyed dir


def test_enable_compilation_cache_is_noop_on_cpu(tmp_path):
    """On XLA:CPU the persistent cache is skipped by design — every AOT load
    logs a cpu_aot_loader tuning-flag mismatch (+prefer-no-gather never shows
    up in the host probe), even for same-machine entries (VERDICT r4 #3). An
    explicit path still forces it (the suite's conftest dir relies on this)."""
    import jax

    from vit_ae_plus_plus_tpu.utils.cache import enable_compilation_cache
    from vit_ae_plus_plus_tpu.utils.doctor import _check_compilation_cache

    assert jax.default_backend() == "cpu"
    was = jax.config.jax_compilation_cache_dir
    try:
        jax.config.update("jax_compilation_cache_dir", None)
        enable_compilation_cache()  # default path: must stay unset on CPU
        assert jax.config.jax_compilation_cache_dir is None
        status, detail = _check_compilation_cache()  # doctor says why
        assert status == "ok" and "XLA:CPU" in detail

        forced = str(tmp_path / "forced_cache")
        enable_compilation_cache(path=forced)  # explicit path wins
        assert jax.config.jax_compilation_cache_dir == forced
        status, detail = _check_compilation_cache()
        assert status == "ok" and "writable" in detail
    finally:
        jax.config.update("jax_compilation_cache_dir", was)


def test_doctor_flags_stale_vitae_fingerprint(tmp_path, monkeypatch):
    """A .vitae built on another platform/jax (or in the retired format)
    must surface as a WARN naming the artifact (VERDICT r3 #7)."""
    import json
    import zipfile

    from vit_ae_plus_plus_tpu.serving_aot import _FORMAT_VERSION, _fingerprint
    from vit_ae_plus_plus_tpu.utils.doctor import _check_vitae_engines

    monkeypatch.chdir(tmp_path)
    status, detail = _check_vitae_engines()
    assert status == "ok" and "no .vitae" in detail

    good = dict(_fingerprint(), format_version=_FORMAT_VERSION)
    with zipfile.ZipFile(tmp_path / "good.vitae", "w") as zf:
        zf.writestr("meta.json", json.dumps(good))
    status, detail = _check_vitae_engines()
    assert status == "ok" and "1 artifact" in detail

    stale = dict(good, jax_version="0.0.1")
    with zipfile.ZipFile(tmp_path / "stale.vitae", "w") as zf:
        zf.writestr("meta.json", json.dumps(stale))
    legacy = dict(good, format_version=1)
    with zipfile.ZipFile(tmp_path / "legacy.vitae", "w") as zf:
        zf.writestr("meta.json", json.dumps(legacy))
    status, detail = _check_vitae_engines()
    assert status == "warn"
    assert "stale.vitae" in detail and "jax_version" in detail
    assert "legacy.vitae" in detail and "format 1" in detail
    assert "compile-engine" in detail  # the remedy is actionable
