import hashlib
import os

from depthmap_tpu.utils import download as D


def test_checkpoint_registry_covers_models():
    # every convertible model has a download entry
    from depthmap_tpu.models.convert import CHECKPOINT_FILES
    for mt, fn in CHECKPOINT_FILES.items():
        assert mt in D.CHECKPOINT_URLS
        assert D.CHECKPOINT_URLS[mt][0] == fn


def test_sha256_prefix(tmp_path):
    p = tmp_path / "f.bin"
    p.write_bytes(b"hello world")
    full = hashlib.sha256(b"hello world").hexdigest()
    assert D.sha256_prefix_ok(str(p), full[:16])
    assert not D.sha256_prefix_ok(str(p), "deadbeef")
    assert D.sha256_prefix_ok(str(p), None)


def test_ensure_file_downloaded_existing(tmp_path):
    p = tmp_path / "w.bin"
    p.write_bytes(b"x" * 10)
    # existing + no hash -> returned without touching the network
    assert D.ensure_file_downloaded(str(p), ["http://invalid.invalid/x"]) \
        == str(p)


def test_ensure_file_downloaded_all_mirrors_fail(tmp_path):
    import pytest
    with pytest.raises(RuntimeError, match="any mirror"):
        D.ensure_file_downloaded(str(tmp_path / "nope.bin"),
                                 ["http://invalid.invalid/a",
                                  "http://invalid.invalid/b"])
