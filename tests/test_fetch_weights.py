"""tools/fetch_weights.py — released-weight staging (local HTTP server)."""

import http.server
import importlib.util
import os
import sys
import threading

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_tool():
    spec = importlib.util.spec_from_file_location(
        "fetch_weights", os.path.join(REPO, "tools", "fetch_weights.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_fetch_all_against_local_server(tmp_path, monkeypatch):
    src = tmp_path / "release"
    src.mkdir()
    tool = _load_tool()
    from inaspeechsegmenter_tpu.models import registry

    names = list(registry.DMODELS)
    for name in names[:-1]:                       # one file missing
        (src / name).write_bytes(b"weights:" + name.encode())

    handler = lambda *a, **kw: http.server.SimpleHTTPRequestHandler(  # noqa: E731
        *a, directory=str(src), **kw)
    httpd = http.server.ThreadingHTTPServer(("127.0.0.1", 0), handler)
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    base = "http://127.0.0.1:%d/" % httpd.server_address[1]
    try:
        # the tool binds DMODELS at import time — patch ITS binding
        monkeypatch.setattr(tool, "DMODELS", {n: base for n in names})
        dest = tmp_path / "staged"

        failed = tool.fetch_all(str(dest))
        assert failed == [names[-1]]              # the missing one, only
        for name in names[:-1]:
            assert (dest / name).read_bytes() == b"weights:" + name.encode()
        assert not (dest / names[-1]).exists()
        assert not list(dest.glob("*.part*"))     # no temp litter on failure

        # idempotent: present files are not re-downloaded (mtime stable)
        mtimes = {n: os.path.getmtime(dest / n) for n in names[:-1]}
        (src / names[-1]).write_bytes(b"late")    # last file appears
        failed = tool.fetch_all(str(dest))
        assert failed == []
        for n, old in mtimes.items():
            assert os.path.getmtime(dest / n) == old
        assert (dest / names[-1]).read_bytes() == b"late"
    finally:
        httpd.shutdown()
        httpd.server_close()


def test_mid_transfer_failure_leaves_no_part_file(tmp_path, monkeypatch):
    """A connection that dies mid-body (Content-Length larger than what is
    sent) must record the failure AND remove the partially-written temp
    file — flaky-network retries must not accumulate .part litter."""

    class ShortHandler(http.server.BaseHTTPRequestHandler):
        def do_GET(self):
            self.send_response(200)
            self.send_header("Content-Length", "4096")
            self.end_headers()
            self.wfile.write(b"only-a-prefix")    # then close early

        def log_message(self, *a):
            pass

    tool = _load_tool()
    httpd = http.server.ThreadingHTTPServer(("127.0.0.1", 0), ShortHandler)
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    base = "http://127.0.0.1:%d/" % httpd.server_address[1]
    try:
        monkeypatch.setattr(tool, "DMODELS", {"w.hdf5": base})
        dest = tmp_path / "staged"
        failed = tool.fetch_all(str(dest))
        assert failed == ["w.hdf5"]
        assert not (dest / "w.hdf5").exists()
        assert not list(dest.glob("*.part*")), "partial download left litter"
    finally:
        httpd.shutdown()
        httpd.server_close()
