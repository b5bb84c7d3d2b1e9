"""tools/download_dataset.py against a local HTTP server: index parsing,
flat layout, resume skip, flaky-server retry, and missing-segment logging
(the reference documents the index format and missing-chunk semantics at
README.md:321-343 but ships no fetch code)."""

import http.server
import json
import os
import sys
import threading

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from download_dataset import download_dataset, download_models, MODELS  # noqa: E402


@pytest.fixture()
def corpus_server(tmp_path):
    """Serve a tiny contractor-layout corpus over 127.0.0.1; yields
    (base_url, docroot).  'flaky.mp4' fails once with 500 then succeeds —
    exercising the retry path."""
    docroot = tmp_path / "blob"
    (docroot / "8.0").mkdir(parents=True)
    for name in ("seg-a", "seg-b", "flaky"):
        (docroot / "8.0" / f"{name}.mp4").write_bytes(b"\x00" * 64 + name.encode())
        (docroot / "8.0" / f"{name}.jsonl").write_text(
            json.dumps({"keyboard": {"keys": []}}) + "\n"
        )
    failures = {"/8.0/flaky.mp4": 1}

    class Handler(http.server.SimpleHTTPRequestHandler):
        def __init__(self, *a, **kw):
            super().__init__(*a, directory=str(docroot), **kw)

        def do_GET(self):  # noqa: N802 — http.server API
            if failures.get(self.path, 0) > 0:
                failures[self.path] -= 1
                self.send_error(500, "flaky")
                return
            super().do_GET()

        def log_message(self, *a):  # silence per-request lines
            pass

    server = http.server.ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    try:
        yield f"http://127.0.0.1:{server.server_address[1]}", docroot
    finally:
        server.shutdown()


def _index(tmp_path, base_url, relpaths):
    path = tmp_path / "index.json"
    path.write_text(json.dumps({"basedir": base_url, "relpaths": relpaths}))
    return str(path)


def test_download_resume_and_retry(corpus_server, tmp_path):
    base_url, _ = corpus_server
    out = tmp_path / "data"
    index = _index(tmp_path, base_url, ["8.0/seg-a", "8.0/seg-b", "8.0/flaky"])

    counts = download_dataset(index, str(out), workers=2)
    assert counts == {"done": 3, "skipped": 0, "failed": 0}
    # flat layout: the out dir IS a --data-dir (loader pairs by basename)
    for name in ("seg-a", "seg-b", "flaky"):
        assert (out / f"{name}.mp4").read_bytes().endswith(name.encode())
        assert (out / f"{name}.jsonl").exists()
    assert not list(out.glob("*.part"))

    # second run: everything complete → skipped, nothing re-fetched
    counts = download_dataset(index, str(out), workers=2)
    assert counts == {"done": 0, "skipped": 3, "failed": 0}


def test_missing_segment_logged_not_fatal(corpus_server, tmp_path):
    base_url, _ = corpus_server
    out = tmp_path / "data"
    index = _index(
        tmp_path, base_url, ["8.0/seg-a", "8.0/does-not-exist"]
    )
    counts = download_dataset(index, str(out), workers=1, retries=1)
    assert counts["done"] == 1 and counts["failed"] == 1
    failed = (out / "failed.txt").read_text()
    assert "does-not-exist" in failed
    # the good segment still landed
    assert (out / "seg-a.mp4").exists()


def test_limit_and_filter(corpus_server, tmp_path):
    base_url, _ = corpus_server
    index = _index(tmp_path, base_url, ["8.0/seg-a", "8.0/seg-b"])

    out1 = tmp_path / "lim"
    assert download_dataset(index, str(out1), limit=1) == {
        "done": 1, "skipped": 0, "failed": 0,
    }
    out2 = tmp_path / "filt"
    counts = download_dataset(index, str(out2), relpath_filter="seg-b")
    assert counts["done"] == 1 and (out2 / "seg-b.mp4").exists()


def test_models_registry_covers_readme_table():
    """Every published checkpoint family (reference README.md:39-87) is
    addressable: 3 foundation widths, 3 BC fine-tunes, 3 RL fine-tunes, the
    4x IDM — each resolving to one .model + one .weights URL."""
    assert len(MODELS) == 10
    for name, (model, weights) in MODELS.items():
        assert model.endswith(".model"), name
        assert weights.endswith(".weights"), name


def test_download_models_local(tmp_path, monkeypatch, corpus_server):
    """download_models through the real fetch path against the local server."""
    base_url, docroot = corpus_server
    (docroot / "m.model").write_bytes(b"M")
    (docroot / "m.weights").write_bytes(b"W")
    import download_dataset as dd

    monkeypatch.setitem(
        dd.MODELS, "local-test", (f"{base_url}/m.model", f"{base_url}/m.weights")
    )
    out = tmp_path / "ckpt"
    download_models(["local-test"], str(out))
    assert (out / "m.model").read_bytes() == b"M"
    assert (out / "m.weights").read_bytes() == b"W"
    with pytest.raises(SystemExit):
        download_models(["no-such-model"], str(out))
