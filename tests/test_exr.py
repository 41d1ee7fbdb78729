"""Native EXR writer/reader round-trips (reference depth output format,
eval/eval.py:291-310)."""
import struct

import numpy as np
import pytest

from pixelnerf_tpu.utils.exr import read_exr, write_exr


def test_single_channel_roundtrip(tmp_path):
    img = np.random.default_rng(0).uniform(0, 3, (17, 23)).astype(np.float32)
    path = str(tmp_path / "depth.exr")
    write_exr(path, img)
    back = read_exr(path)
    np.testing.assert_array_equal(back, img)


def test_rgb_roundtrip(tmp_path):
    img = np.random.default_rng(1).uniform(0, 1, (8, 9, 3)).astype(np.float32)
    path = str(tmp_path / "rgb.exr")
    write_exr(path, img)
    np.testing.assert_array_equal(read_exr(path), img)


def test_half_roundtrip(tmp_path):
    img = np.random.default_rng(2).uniform(0, 1, (6, 5)).astype(np.float32)
    path = str(tmp_path / "half.exr")
    write_exr(path, img, half=True)
    np.testing.assert_array_equal(read_exr(path), img.astype(np.float16))


def test_header_is_valid_exr(tmp_path):
    """Magic number, version, and required attributes are spec-conformant."""
    path = str(tmp_path / "t.exr")
    write_exr(path, np.zeros((2, 2), np.float32))
    buf = open(path, "rb").read()
    magic, version = struct.unpack_from("<Ii", buf, 0)
    assert magic == 0x01312F76
    assert version == 2
    for attr in (b"channels", b"compression", b"dataWindow", b"displayWindow",
                 b"lineOrder", b"pixelAspectRatio", b"screenWindowCenter",
                 b"screenWindowWidth"):
        assert attr + b"\x00" in buf


def test_rejects_non_exr(tmp_path):
    path = str(tmp_path / "no.exr")
    open(path, "wb").write(b"not an exr file at all")
    with pytest.raises(AssertionError):
        read_exr(path)
