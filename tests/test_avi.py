"""Zero-dependency 16-bit grayscale AVI container (depthmap_tpu/io/avi.py).

The reference's depth videos are gray16le AVIs written by ffmpeg
(src/video_mode.py:71-84); this environment has neither ffmpeg nor pyav, so
the rebuild ships its own rawvideo Y16 RIFF writer.  These tests pin the
roundtrip exactly and sanity-check the container structure against the AVI
spec (so the files stay readable by ffmpeg-based players).
"""
from __future__ import annotations

import struct

import numpy as np
import pytest

from depthmap_tpu.io.avi import read_gray16_avi, write_gray16_avi


def _frames(rng, n=4, h=24, w=32):
    return [(rng.random((h, w)) * 65535).astype(np.uint16)
            for _ in range(n)]


def test_roundtrip_exact(tmp_path, rng):
    frames = _frames(rng)
    p = str(tmp_path / "d.avi")
    write_gray16_avi(frames, 24.0, p)
    got = read_gray16_avi(p)
    assert got is not None
    fps, back = got
    assert abs(fps - 24.0) < 1e-9
    assert len(back) == len(frames)
    for a, b in zip(frames, back):
        np.testing.assert_array_equal(a, b)


def test_fractional_fps(tmp_path, rng):
    frames = _frames(rng, n=2)
    p = str(tmp_path / "ntsc.avi")
    write_gray16_avi(frames, 30000 / 1001, p)
    fps, back = read_gray16_avi(p)
    assert abs(fps - 30000 / 1001) < 1e-9   # exact rational scale/rate
    assert len(back) == 2


def test_container_structure(tmp_path, rng):
    """RIFF/AVI /hdrl/movi/idx1 layout with correct sizes and the Y16
    fourcc in both strh (handler) and strf (biCompression)."""
    frames = _frames(rng, n=3, h=16, w=20)
    p = str(tmp_path / "s.avi")
    write_gray16_avi(frames, 10.0, p)
    data = open(p, "rb").read()
    assert data[:4] == b"RIFF" and data[8:12] == b"AVI "
    (riff_size,) = struct.unpack("<I", data[4:8])
    assert riff_size == len(data) - 8          # spec: file size - 8
    assert b"hdrl" in data and b"movi" in data and b"idx1" in data
    assert data.count(b"00db") == 6            # 3 movi chunks + 3 idx rows
    # strf: biBitCount == 16, biCompression == 'Y16 '
    strf = data.index(b"strf") + 8
    bits, = struct.unpack("<H", data[strf + 14:strf + 16])
    assert bits == 16 and data[strf + 16:strf + 20] == b"Y16 "
    # all frame payloads present and even-aligned
    assert len(data) > 3 * 16 * 20 * 2


def test_reader_rejects_non_avi(tmp_path):
    p = tmp_path / "not.avi"
    p.write_bytes(b"hello world, definitely not RIFF")
    assert read_gray16_avi(str(p)) is None
    png = tmp_path / "x.png"
    png.write_bytes(b"\x89PNG\r\n\x1a\n" + b"\x00" * 64)
    assert read_gray16_avi(str(png)) is None


def test_writer_rejects_bad_input(tmp_path, rng):
    with pytest.raises(ValueError):
        write_gray16_avi([], 24.0, str(tmp_path / "e.avi"))
    a = (rng.random((8, 8)) * 65535).astype(np.uint16)
    b = (rng.random((8, 10)) * 65535).astype(np.uint16)
    with pytest.raises(ValueError):
        write_gray16_avi([a, b], 24.0, str(tmp_path / "m.avi"))


def test_truncated_file_returns_none(tmp_path, rng):
    """A partially-written Y16 AVI (disk full, interrupted write) must
    return None — the video-ingest contract — not raise struct.error or
    ValueError from chunk sizes pointing past the buffer end."""
    frames = [(rng.random((24, 32)) * 65535).astype(np.uint16)
              for _ in range(4)]
    p = tmp_path / "full.avi"
    write_gray16_avi(frames, 24.0, str(p))
    data = p.read_bytes()
    assert read_gray16_avi(str(p)) is not None
    # severing frame payloads or headers must yield None
    for cut in (len(data) // 2, 20, 13):
        t = tmp_path / f"cut{cut}.avi"
        t.write_bytes(data[:cut])
        assert read_gray16_avi(str(t)) is None, cut
    # severing only the trailing idx1 index keeps all frames readable
    # (players tolerate a missing index) — and must not raise
    t = tmp_path / "noidx.avi"
    t.write_bytes(data[:len(data) - 7])
    got = read_gray16_avi(str(t))
    assert got is None or len(got[1]) == len(frames)
    # corrupt a chunk-size field to a huge value: must not crash either
    bad = bytearray(data)
    bad[16:20] = struct.pack("<I", 0x7FFFFFFF)
    t = tmp_path / "badsize.avi"
    t.write_bytes(bytes(bad))
    assert read_gray16_avi(str(t)) is None
