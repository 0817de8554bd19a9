"""Replication fetch (S12): the reference's Update::download protocol
over a file:// tree, plus HTTP retry semantics via a mocked opener —
no network."""

import gzip
import io
import os
import urllib.error

import pytest

from osm_replication_rust_spark.sources import replication as R


def _mk_tree(root, head=5, start=3):
    """Replication dir: state.txt head + per-seq diff/state pairs."""
    os.makedirs(root, exist_ok=True)
    with open(os.path.join(root, "state.txt"), "w") as f:
        f.write(f"#Mon Jan 01 00:00:00 UTC 2024\nsequenceNumber={head}\n")
    for n in range(start, head + 1):
        split = R.seq_split(n)
        d = os.path.join(root, os.path.dirname(split))
        os.makedirs(d, exist_ok=True)
        with gzip.open(os.path.join(root, split + ".osc.gz"), "wb") as f:
            f.write(f"<osmChange seq={n}/>".encode())
        with open(os.path.join(root, split + ".state.txt"), "w") as f:
            f.write(f"sequenceNumber={n}\n")


def test_fetch_walk_file_scheme(tmp_path):
    remote = tmp_path / "remote"
    _mk_tree(str(remote), head=5)
    state = tmp_path / "state.txt"
    state.write_text("sequenceNumber=2\n")
    got = R.fetch_new_diffs(
        str(state), f"file://{remote}/", str(tmp_path / "diffs")
    )
    assert [n for n, _, _ in got] == [3, 4, 5]
    for n, osc, st in got:
        assert gzip.open(osc).read() == f"<osmChange seq={n}/>".encode()
        assert R.read_state(open(st).read()) == n
        assert f"planet/minute/{R.seq_split(n)}" in osc.replace(os.sep, "/")


def test_fetch_clamp_and_noop(tmp_path):
    remote = tmp_path / "remote"
    _mk_tree(str(remote), head=9, start=3)
    state = tmp_path / "state.txt"
    state.write_text("sequenceNumber=2\n")
    got = R.fetch_new_diffs(
        str(state), str(remote) + "/", str(tmp_path / "d"), max_state=4
    )
    assert [n for n, _, _ in got] == [3, 4]
    state.write_text("sequenceNumber=9\n")
    assert R.fetch_new_diffs(str(state), str(remote) + "/", str(tmp_path / "d")) == []


def test_state_errors(tmp_path):
    with pytest.raises(R.StateNotFound):
        R.read_state_from_url(str(tmp_path / "missing.txt"))
    bad = tmp_path / "bad.txt"
    bad.write_text("no sequence here\n")
    with pytest.raises(R.StateIncorrect):
        R.read_state_from_url(str(bad))


def test_http_retry_then_success(tmp_path, monkeypatch):
    calls = {"n": 0}

    class FakeResp(io.BytesIO):
        headers = {"Last-Modified": "Mon, 01 Jan 2024 00:00:00 GMT"}

        def __init__(self):
            super().__init__(b"diff-bytes")

        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

    def fake_urlopen(req, timeout=None):
        calls["n"] += 1
        if calls["n"] <= 2:
            raise urllib.error.URLError("flaky")
        return FakeResp()

    monkeypatch.setattr(R.urllib.request, "urlopen", fake_urlopen)
    monkeypatch.setattr(R, "RETRY_WAIT_S", 0.0)
    dest = str(tmp_path / "out" / "x.osc.gz")
    R.download("http://replication.example/000/000/003.osc.gz", dest,
               retry_wait=0.0)
    assert calls["n"] == 3
    assert open(dest, "rb").read() == b"diff-bytes"
    # Last-Modified preserved as mtime (2024-01-01 00:00:00 UTC)
    assert int(os.path.getmtime(dest)) == 1704067200


def test_http_retry_exhaustion(tmp_path, monkeypatch):
    def always_fail(req, timeout=None):
        raise urllib.error.URLError("down")

    monkeypatch.setattr(R.urllib.request, "urlopen", always_fail)
    with pytest.raises(urllib.error.URLError):
        R.download("http://replication.example/state.txt",
                   str(tmp_path / "y"), retry_wait=0.0)


def test_fetch_int_cursor_and_empty_poll(tmp_path):
    """fetch_new_diffs accepts the sequence number directly, and an
    up-to-date poll still creates the tree root so downstream directory
    scans are clean no-ops (review regression)."""
    remote = tmp_path / "remote"
    _mk_tree(str(remote), head=4)
    dest = str(tmp_path / "d")
    got = R.fetch_new_diffs(3, str(remote) + "/", dest)
    assert [n for n, _, _ in got] == [4]
    # up to date: nothing fetched, tree root exists
    dest2 = str(tmp_path / "d2")
    assert R.fetch_new_diffs(4, str(remote) + "/", dest2) == []
    assert os.path.isdir(os.path.join(dest2, "planet", "minute"))


def test_http_retry_covers_mid_body_failures(tmp_path, monkeypatch):
    """A connection dropped while the BODY streams (not a URLError)
    must still be retried, and the partial temp file must be hidden
    from Spark's *.osc* glob (dot-prefixed)."""
    import http.client

    calls = {"n": 0}
    seen_tmp = {}

    class DropResp:
        headers = {}

        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

        def read(self, *a):
            raise http.client.IncompleteRead(b"partial")

    class GoodResp(io.BytesIO):
        headers = {}

        def __init__(self):
            super().__init__(b"ok-bytes")

        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

    def fake_urlopen(req, timeout=None):
        calls["n"] += 1
        return DropResp() if calls["n"] == 1 else GoodResp()

    monkeypatch.setattr(R.urllib.request, "urlopen", fake_urlopen)
    dest = str(tmp_path / "t" / "001.osc.gz")

    real_open = open

    def spy_open(path, *a, **k):
        p = str(path)
        if p.endswith(".part"):
            seen_tmp["name"] = os.path.basename(p)
        return real_open(path, *a, **k)

    monkeypatch.setattr("builtins.open", spy_open)
    R.download("http://replication.example/001.osc.gz", dest, retry_wait=0.0)
    assert calls["n"] == 2
    assert real_open(dest, "rb").read() == b"ok-bytes"
    assert seen_tmp["name"].startswith(".")  # hidden from *.osc* globs
