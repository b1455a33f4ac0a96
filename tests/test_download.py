"""Exercise the artifact fetcher's download path against a localhost HTTP
server (reference: SimilarDomains/download.py:47-138).  No egress needed —
this validates the full urlretrieve -> unpack -> marker -> cached-return
flow that the registry's real URLs would take."""

import http.server
import io
import os
import threading
import zipfile

import pytest

from gagan_tpu.utils import download as dl


@pytest.fixture()
def http_root(tmp_path):
    root = tmp_path / "served"
    root.mkdir()
    handler = lambda *a, **kw: http.server.SimpleHTTPRequestHandler(  # noqa: E731
        *a, directory=str(root), **kw)
    server = http.server.ThreadingHTTPServer(("127.0.0.1", 0), handler)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    try:
        yield root, f"http://127.0.0.1:{server.server_address[1]}"
    finally:
        server.shutdown()
        thread.join(timeout=5)


def _zip_bytes(inner_name: str, payload: bytes) -> bytes:
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr(inner_name, payload)
    return buf.getvalue()


def test_fetch_download_extract_and_cache(http_root, tmp_path, monkeypatch):
    root, base_url = http_root
    (root / "toy.pt.zip").write_bytes(
        _zip_bytes("toy.pt/weights.bin", b"\x01\x02\x03"))
    (root / "flat.bin").write_bytes(b"raw-artifact")
    monkeypatch.setitem(dl.SOURCES, "toy", dl.Source(
        f"{base_url}/toy.pt.zip", "toy.pt.zip", extract=True))
    monkeypatch.setitem(dl.SOURCES, "flat", dl.Source(
        f"{base_url}/flat.bin", "flat.bin", extract=False))

    dest = tmp_path / "pretrained"
    out = dl.fetch("toy", dest_dir=str(dest))
    assert out == str(dest / "toy.pt")
    assert (dest / "toy.pt" / "weights.bin").read_bytes() == b"\x01\x02\x03"
    assert os.path.exists(str(dest / "toy.pt.zip.extracted"))

    # Cached: serve a different body; without force the old extract wins.
    (root / "toy.pt.zip").write_bytes(
        _zip_bytes("toy.pt/weights.bin", b"\xff"))
    assert dl.fetch("toy", dest_dir=str(dest)) == out
    assert (dest / "toy.pt" / "weights.bin").read_bytes() == b"\x01\x02\x03"
    # force=True re-downloads and re-extracts.
    dl.fetch("toy", dest_dir=str(dest), force=True)
    assert (dest / "toy.pt" / "weights.bin").read_bytes() == b"\xff"

    # Non-archive artifact: final path is the file itself.
    flat = dl.fetch("flat", dest_dir=str(dest))
    assert flat == str(dest / "flat.bin")
    assert open(flat, "rb").read() == b"raw-artifact"


def test_fetch_unknown_and_unreachable(tmp_path, monkeypatch):
    with pytest.raises(KeyError):
        dl.fetch("no-such-artifact")
    # Unreachable host surfaces the actionable RuntimeError.
    monkeypatch.setitem(dl.SOURCES, "dead", dl.Source(
        "http://127.0.0.1:9/dead.bin", "dead.bin"))
    with pytest.raises(RuntimeError, match="Place dead.bin under"):
        dl.fetch("dead", dest_dir=str(tmp_path))
