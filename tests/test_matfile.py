"""MAT5 reader + split2 setup: the reference ships split2's ids as a
MATLAB v5 file (data/kitti_split2/kitti_ids_new.mat, loaded at its
setup_split.py:46); these tests synthesize equivalent .mat bytes from
scratch and check the in-repo reader and the renumbering link step."""

import os
import struct
import subprocess
import sys
import zlib

import numpy as np
import pytest

from groomed_nms_tpu.data.matfile import load_mat_numeric

REPO = os.path.join(os.path.dirname(os.path.abspath(__file__)), os.pardir)

_MI_FOR = {"f8": 9, "f4": 7, "i4": 5, "u2": 4, "u1": 2}
_MX_FOR = {"f8": 6, "f4": 7, "i4": 12, "u2": 11, "u1": 9}


def _element(mi, payload):
    pad = (8 - len(payload) % 8) % 8
    return struct.pack("<II", mi, len(payload)) + payload + b"\0" * pad


def _matrix(name, arr):
    code = arr.dtype.str.lstrip("<>|=")
    flags = _element(6, struct.pack("<II", _MX_FOR[code], 0))
    dims = _element(5, np.asarray(arr.shape, "<i4").tobytes())
    name_el = _element(1, name.encode())
    data = _element(_MI_FOR[code], arr.tobytes(order="F"))
    return _element(14, flags + dims + name_el + data)


def _mat_bytes(variables, compress=()):
    header = b"MATLAB 5.0 MAT-file, test fixture".ljust(116) + b"\0" * 8 \
        + struct.pack("<H2s", 0x0100, b"IM")
    body = b""
    for name, arr in variables.items():
        el = _matrix(name, np.asarray(arr))
        if name in compress:
            z = zlib.compress(el)
            el = struct.pack("<II", 15, len(z)) + z  # miCOMPRESSED: no pad
        body += el
    return header + body


def test_reads_uncompressed_and_compressed(tmp_path):
    ids_train = np.arange(0, 40, 3, dtype="<u2").reshape(1, -1)
    ids_val = np.array([[2, 5, 8, 11]], dtype="<u2")
    weights = np.linspace(0, 1, 6).astype("<f8").reshape(2, 3)
    path = tmp_path / "ids.mat"
    path.write_bytes(_mat_bytes(
        {"ids_train": ids_train, "ids_val": ids_val, "w": weights},
        compress=("ids_val", "w")))
    got = load_mat_numeric(str(path))
    np.testing.assert_array_equal(got["ids_train"], ids_train)
    np.testing.assert_array_equal(got["ids_val"], ids_val)
    np.testing.assert_allclose(got["w"], weights)
    # column-major round trip must preserve the 2-D layout
    assert got["w"].shape == (2, 3)


def test_small_element_name():
    """Variable names <= 4 bytes use the packed small-element format."""
    arr = np.array([[7, 9]], dtype="<i4")
    # hand-pack: small element tag = (nbytes << 16) | miINT8
    flags = _element(6, struct.pack("<II", _MX_FOR["i4"], 0))
    dims = _element(5, np.asarray(arr.shape, "<i4").tobytes())
    name_el = struct.pack("<I", (2 << 16) | 1) + b"ab\0\0"
    data = _element(_MI_FOR["i4"], arr.tobytes(order="F"))
    el = _element(14, flags + dims + name_el + data)
    header = b"x".ljust(124) + struct.pack("<H2s", 0x0100, b"IM")
    import tempfile
    with tempfile.NamedTemporaryFile(suffix=".mat", delete=False) as f:
        f.write(header + el)
    got = load_mat_numeric(f.name)
    os.unlink(f.name)
    np.testing.assert_array_equal(got["ab"], arr)


def test_matches_scipy_when_available(tmp_path):
    scipy_io = pytest.importorskip("scipy.io")
    rng = np.random.default_rng(0)
    vars_ = {"a": rng.integers(0, 7000, (1, 50)).astype("<u2"),
             "b": rng.normal(size=(3, 4)).astype("<f8")}
    path = tmp_path / "x.mat"
    scipy_io.savemat(str(path), vars_)
    ours, theirs = load_mat_numeric(str(path)), scipy_io.loadmat(str(path))
    for k, v in vars_.items():
        np.testing.assert_array_equal(ours[k], theirs[k])
        np.testing.assert_array_equal(ours[k], v)


def test_rejects_non_mat5(tmp_path):
    p = tmp_path / "bad.mat"
    p.write_bytes(b"\x89HDF\r\n" + b"\0" * 200)   # v7.3-style container
    with pytest.raises(ValueError):
        load_mat_numeric(str(p))


def test_setup_split_from_mat(tmp_path):
    """scripts/setup_split.py consumes kitti_ids_new.mat and renumbers
    consecutively (reference data/kitti_split2/setup_split.py:58-75)."""
    kitti = tmp_path / "kitti" / "training"
    for sub, ext in (("image_2", ".png"), ("calib", ".txt"),
                     ("label_2", ".txt")):
        d = kitti / sub
        d.mkdir(parents=True)
        for i in range(8):
            (d / f"{i:06d}{ext}").write_bytes(b"x")
    split = tmp_path / "kitti_split2"
    split.mkdir()
    (split / "kitti_ids_new.mat").write_bytes(_mat_bytes(
        {"ids_train": np.array([[1, 4, 7]], "<u2"),
         "ids_val": np.array([[0, 2]], "<u2")},
        compress=("ids_train", "ids_val")))
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "setup_split.py"),
         "--kitti", str(tmp_path / "kitti"), "--split-dir", str(split)],
        capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    # training/000001.png -> raw 000004.png etc: consecutive renumbering
    link = split / "training" / "image_2" / "000001.png"
    assert os.readlink(link) == str(kitti / "image_2" / "000004.png")
    assert sorted(os.listdir(split / "training" / "image_2")) == \
        ["000000.png", "000001.png", "000002.png"]
    assert os.readlink(split / "validation" / "label_2" / "000001.txt") == \
        str(kitti / "label_2" / "000002.txt")
