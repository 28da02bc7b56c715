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


def test_tofu_pin_recorded_and_verified(tmp_path, monkeypatch):
    """First successful 'download' of an unhashed file pins its sha256; a
    later mismatching file with the same name is rejected against the pin."""
    import io
    import json
    import urllib.request

    payload = b"checkpoint-bytes-v1"

    class FakeResp(io.BytesIO):
        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

    monkeypatch.setattr(urllib.request, "urlopen",
                        lambda u, timeout=60: FakeResp(payload))
    target = tmp_path / "model.pt"
    out = D.ensure_file_downloaded(str(target), ["http://mirror/a"])
    assert out == str(target)
    pins = json.load(open(tmp_path / D.PIN_FILENAME))
    assert pins["model.pt"] == hashlib.sha256(payload).hexdigest()

    # tampered local file -> rejected against the pin, not silently reused
    target.write_bytes(b"evil")
    monkeypatch.setattr(urllib.request, "urlopen",
                        lambda u, timeout=60: FakeResp(b"also-evil"))
    import pytest
    with pytest.raises(RuntimeError, match="pinned sha256"):
        D.ensure_file_downloaded(str(target), ["http://mirror/a"])


def test_tofu_pins_existing_local_file(tmp_path):
    """An existing unhashed local file gets pinned on first use, so later
    runs detect modification."""
    import json
    p = tmp_path / "w.bin"
    p.write_bytes(b"x" * 10)
    D.ensure_file_downloaded(str(p), ["http://invalid.invalid/x"])
    pins = json.load(open(tmp_path / D.PIN_FILENAME))
    assert pins["w.bin"] == hashlib.sha256(b"x" * 10).hexdigest()
