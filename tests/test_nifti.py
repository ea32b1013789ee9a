"""Built-in NIfTI-1 I/O (utils/nifti.py) — round trips, hand-packed headers
for the cases the writer never produces (int16 + scl_slope, big-endian,
gzip), and failure modes."""

import gzip
import struct

import numpy as np
import pytest

from vit_ae_plus_plus_tpu.utils.nifti import is_nifti, read_nifti, write_nifti


def _pack_nifti(arr: np.ndarray, bo: str = "<", datatype: int = 16,
                slope: float = 1.0, inter: float = 0.0) -> bytes:
    """Hand-packed single-file NIfTI-1 blob (independent of write_nifti)."""
    hdr = bytearray(348)
    struct.pack_into(bo + "i", hdr, 0, 348)
    dim = [arr.ndim] + list(arr.shape) + [1] * (7 - arr.ndim)
    struct.pack_into(bo + "8h", hdr, 40, *dim)
    struct.pack_into(bo + "h", hdr, 70, datatype)
    struct.pack_into(bo + "f", hdr, 108, 352.0)
    struct.pack_into(bo + "2f", hdr, 112, slope, inter)
    hdr[344:348] = b"n+1\x00"
    return bytes(hdr) + b"\x00" * 4 + np.asarray(
        arr, arr.dtype.newbyteorder(bo)
    ).tobytes(order="F")


def test_write_read_roundtrip_nii_and_gz(tmp_path):
    vol = np.random.default_rng(0).standard_normal((5, 6, 7)).astype(np.float32)
    for name in ("v.nii", "v.nii.gz"):
        path = str(tmp_path / name)
        write_nifti(path, vol)
        np.testing.assert_array_equal(read_nifti(path), vol)
        with open(path, "rb") as f:
            assert is_nifti(f.read())


def test_read_int16_with_scaling():
    raw = np.arange(24, dtype=np.int16).reshape(2, 3, 4)
    blob = _pack_nifti(raw, datatype=4, slope=0.5, inter=-1.0)
    out = read_nifti(blob)
    np.testing.assert_allclose(out, raw.astype(np.float32) * 0.5 - 1.0)
    assert out.dtype == np.float32


def test_read_big_endian():
    vol = np.random.default_rng(1).standard_normal((3, 4, 2)).astype(np.float32)
    np.testing.assert_array_equal(read_nifti(_pack_nifti(vol, bo=">")), vol)


def test_fortran_order_is_respected():
    """Voxel (x, y, z) indexing must survive the round trip — a C-order
    reshape would transpose the volume."""
    vol = np.zeros((4, 5, 6), np.float32)
    vol[1, 2, 3] = 7.0
    out = read_nifti(_pack_nifti(vol))
    assert out[1, 2, 3] == 7.0 and out.sum() == 7.0


def test_4d_roundtrip(tmp_path):
    vol = np.random.default_rng(2).standard_normal((4, 4, 4, 3)).astype(np.float32)
    path = str(tmp_path / "v4.nii")
    write_nifti(path, vol)
    np.testing.assert_array_equal(read_nifti(path), vol)


def test_gzipped_bytes_and_magic_detection():
    vol = np.ones((2, 2, 2), np.float32)
    blob = gzip.compress(_pack_nifti(vol))
    assert is_nifti(blob)
    np.testing.assert_array_equal(read_nifti(blob), vol)
    assert not is_nifti(b"\x93NUMPY garbage")
    assert not is_nifti(gzip.compress(b"not a nifti at all"))


def test_scl_slope_zero_and_nan_mean_unscaled():
    """Spec: slope == 0 -> ignore scaling entirely (inter too); NaN slope
    (common in tool-written headers) also means unscaled — regression for
    the all-NaN-volume bug."""
    raw = np.arange(8, dtype=np.int16).reshape(2, 2, 2)
    np.testing.assert_array_equal(
        read_nifti(_pack_nifti(raw, datatype=4, slope=0.0, inter=5.0)),
        raw.astype(np.float32),
    )
    out = read_nifti(_pack_nifti(raw, datatype=4, slope=float("nan"),
                                 inter=float("nan")))
    np.testing.assert_array_equal(out, raw.astype(np.float32))
    assert np.isfinite(out).all()


def test_ingest_overwrite_guard_runs_before_reading(tmp_path):
    """Re-running ingestion without overwrite must fail up front, not after
    re-reading every scan and clobbering volumes_all.npy."""
    from vit_ae_plus_plus_tpu.data.splits import ingest_nifti_volumes

    scans = tmp_path / "s"
    scans.mkdir()
    write_nifti(str(scans / "a.nii"), np.ones((4, 4, 4), np.float32))
    with open(tmp_path / "l.csv", "w") as f:
        f.write("a,1\n")
    out = tmp_path / "o"
    ingest_nifti_volumes(str(scans), str(tmp_path / "l.csv"), str(out))
    before = (out / "volumes_all.npy").stat().st_mtime_ns
    with pytest.raises(FileExistsError, match="overwrite"):
        ingest_nifti_volumes(str(scans), str(tmp_path / "l.csv"), str(out))
    assert (out / "volumes_all.npy").stat().st_mtime_ns == before
    ingest_nifti_volumes(str(scans), str(tmp_path / "l.csv"), str(out),
                         overwrite=True)  # explicit overwrite proceeds


def test_ingest_labels_csv_malformed_rows(tmp_path):
    """Short or non-numeric rows fail with a message naming the line;
    float labels ('1.0') are data, not a header."""
    from vit_ae_plus_plus_tpu.data.splits import ingest_nifti_volumes

    scans = tmp_path / "s"
    scans.mkdir()
    write_nifti(str(scans / "a.nii"), np.ones((4, 4, 4), np.float32))
    bad = tmp_path / "bad.csv"
    bad.write_text("a,1\nstray\n")
    with pytest.raises(ValueError, match="bad.csv:2"):
        ingest_nifti_volumes(str(scans), str(bad), str(tmp_path / "o1"))
    floaty = tmp_path / "f.csv"
    floaty.write_text("a,1.0\n")  # headerless, float label
    _, labels_path = ingest_nifti_volumes(
        str(scans), str(floaty), str(tmp_path / "o2")
    )
    assert np.load(labels_path).tolist() == [1]


def test_unsupported_datatype_raises():
    vol = np.zeros((2, 2, 2), np.float32)
    blob = bytearray(_pack_nifti(vol))
    struct.pack_into("<h", blob, 70, 1)  # DT_BINARY: unsupported
    with pytest.raises(ValueError, match="datatype"):
        read_nifti(bytes(blob))


def test_nifti_ingestion_feeds_split_bootstrap(tmp_path):
    """prepare-data brats --nifti-dir: a directory of .nii.gz scans + a
    labels CSV becomes the monolithic arrays and then real splits."""
    from vit_ae_plus_plus_tpu.cli import main as cli_main
    from vit_ae_plus_plus_tpu.data.splits import ingest_nifti_volumes

    rng = np.random.default_rng(4)
    scans = tmp_path / "scans"
    scans.mkdir()
    with open(tmp_path / "labels.csv", "w") as f:
        f.write("name,label\n")
        for i in range(20):
            vol = rng.standard_normal((8, 8, 8)).astype(np.float32)
            write_nifti(str(scans / f"case_{i:03d}.nii.gz"), vol)
            f.write(f"case_{i:03d},{i % 2}\n")

    out = tmp_path / "splits"
    vol_path, lab_path = ingest_nifti_volumes(
        str(scans), str(tmp_path / "labels.csv"), str(out)
    )
    vols = np.load(vol_path)
    assert vols.shape == (20, 8, 8, 8, 1) and vols.dtype == np.float32
    labs = np.load(lab_path)
    assert labs.tolist() == [i % 2 for i in range(20)]
    # the scan written as case_003 must land at index 3 with its own voxels
    np.testing.assert_array_equal(
        vols[3, ..., 0], read_nifti(str(scans / "case_003.nii.gz"))
    )

    # full CLI path: ingest + stratified split bootstrap in one command
    out2 = tmp_path / "splits_cli"
    rc = cli_main(["prepare-data", "brats", "--nifti-dir", str(scans),
                   "--labels-csv", str(tmp_path / "labels.csv"),
                   "--out-dir", str(out2)])
    assert rc == 0
    x_train = np.load(out2 / "x_train_ssl.npy")
    assert x_train.shape[1:] == (8, 8, 8, 1)
    # missing label row fails loudly
    write_nifti(str(scans / "case_xxx.nii.gz"), np.zeros((8, 8, 8), np.float32))
    with pytest.raises(KeyError, match="case_xxx"):
        ingest_nifti_volumes(str(scans), str(tmp_path / "labels.csv"),
                             str(tmp_path / "s3"))


def test_egd_nifti_scan_conversion(tmp_path, capsys):
    """convert_egd_nifti_scans: per-scan NIfTI modalities -> the npy layout
    EGDDataset reads (data/egd.py:88); incomplete scans are skipped like the
    bootstrap's missing-file tolerance (egd_split.py:26-27)."""
    from vit_ae_plus_plus_tpu.data.splits import convert_egd_nifti_scans

    rng = np.random.default_rng(5)
    src = tmp_path / "nii"
    wants = {}
    for i in range(3):
        scan = f"MR_{i:03d}"
        (src / scan).mkdir(parents=True)
        mods = ("flair", "t1ce", "t1", "t2") if i != 1 else ("flair", "t1")
        for m in mods:
            vol = rng.standard_normal((6, 6, 6)).astype(np.float32)
            write_nifti(str(src / scan / f"{m}.nii.gz"), vol)
            wants[(scan, m)] = vol

    out = tmp_path / "npy"
    assert convert_egd_nifti_scans(str(src), str(out)) == 2
    assert "skipping MR_001" in capsys.readouterr().out
    assert not (out / "MR_001").exists()
    for scan in ("MR_000", "MR_002"):
        for m in ("flair", "t1ce", "t1", "t2"):
            np.testing.assert_array_equal(
                np.load(out / scan / f"{m}.npy"), wants[(scan, m)]
            )
    with pytest.raises(FileNotFoundError, match="no complete"):
        convert_egd_nifti_scans(str(src / "MR_001"), str(tmp_path / "x"))


def test_egd_splits_keep_zero_padded_subject_ids(tmp_path):
    """Regression: numeric CSV subjects must parse as str (reference
    egd_split.py:41-44) — as ints they lose zero-padding and never match
    the MR_* scan dirs, silently emptying every split."""
    from vit_ae_plus_plus_tpu.data.splits import prepare_egd_splits

    rng = np.random.default_rng(6)
    root = tmp_path / "scans"
    for i in range(4):
        d = root / f"MR_{i:03d}"
        d.mkdir(parents=True)
        for m in ("flair", "t1ce", "t1", "t2"):
            np.save(d / f"{m}.npy", rng.standard_normal((4, 4, 4)).astype(np.float32))
    with open(tmp_path / "rad.csv", "w") as f:
        f.write("idx,Subject,who_idh_mutation_status\n")
        for i in range(4):
            f.write(f"{i},{i:03d},{i % 2 if i < 3 else -1}\n")
    ssl, labelled = prepare_egd_splits(
        str(tmp_path / "rad.csv"), str(root), str(tmp_path / "out")
    )
    assert ssl == ["MR_003"]
    assert labelled == [("MR_000", 0), ("MR_001", 1), ("MR_002", 0)]


def test_sanity_viz_save_nifti_falls_back_to_builtin(tmp_path):
    """With nibabel absent in this env, save_nifti must still write valid
    files via the built-in writer."""
    from vit_ae_plus_plus_tpu.pipelines.sanity_viz import save_nifti

    recon = {
        name: np.random.default_rng(3).standard_normal((1, 1, 4, 4, 4)).astype(np.float32)
        for name in ("original", "masked", "reconstruction", "paste")
    }
    assert save_nifti(recon, str(tmp_path), sample_idx=0)
    out = read_nifti(str(tmp_path / "reconstruction_0.nii.gz"))
    np.testing.assert_array_equal(out, recon["reconstruction"][0, 0])
