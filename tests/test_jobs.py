"""Job farm tests: in-process queue semantics (like the reference's
test_pyroserver) plus the real TCP transport."""

import numpy as np
import pandas as pd
import pytest

from inaspeechsegmenter_tpu.parallel.jobs import JobServer, JobClient


@pytest.fixture()
def jobs_csv(tmp_path):
    """Messy fixture in the spirit of media/pyroserver_test.csv: whitespace
    and duplicate rows that must be stripped/deduped."""
    p = tmp_path / "jobs.csv"
    rows = ["source_path,dest_path",
            " /data/a.mp3 , /out/a.csv",
            "/data/b.mp3,/out/b.csv ",
            "/data/a.mp3,/out/a.csv",       # duplicate after strip
            "/data/c.mp3,  /out/c.csv"]
    p.write_text("\n".join(rows) + "\n")
    return str(p)


def test_inprocess_dedup_and_lease(jobs_csv):
    np.random.seed(0)
    srv = JobServer(jobs_csv)
    assert srv.has_more_jobs()
    lsrc, ldst = srv.get_njobs("host ok", nbjobs=20)
    assert len(lsrc) == 3  # dedup removed one
    assert set(lsrc) == {"/data/a.mp3", "/data/b.mp3", "/data/c.mp3"}
    assert all(not s.startswith(" ") and not s.endswith(" ") for s in lsrc)
    assert not srv.has_more_jobs()
    assert srv.get_njobs("host again")[0] == []


def test_lease_chunks(jobs_csv, tmp_path):
    p = tmp_path / "many.csv"
    df = pd.DataFrame({"source_path": [f"/s/{i}.wav" for i in range(45)],
                       "dest_path": [f"/d/{i}.csv" for i in range(45)]})
    df.to_csv(p, index=False)
    srv = JobServer(str(p))
    seen = []
    while srv.has_more_jobs():
        lsrc, _ = srv.get_njobs("c", nbjobs=20)
        assert len(lsrc) <= 20
        seen += lsrc
    assert sorted(seen) == sorted(df.source_path)


def test_tcp_roundtrip(jobs_csv):
    srv = JobServer(jobs_csv)
    tcp, uri = srv.serve(host="127.0.0.1", port=0)
    try:
        client = JobClient(uri)
        lsrc, ldst = client.get_njobs("clienthost -1", nbjobs=2)
        assert len(lsrc) == 2
        src, dst = client.get_job("one more")
        assert src.startswith("/data/")
        assert not client.has_more_jobs()
        # set_jobs re-feeds a running server (like the setjobs script)
        client.set_jobs(jobs_csv)
        assert client.has_more_jobs()
        client.close()
    finally:
        tcp.shutdown()


def test_stop_after_dispatch(jobs_csv):
    srv = JobServer(jobs_csv)
    tcp, uri = srv.serve(host="127.0.0.1", port=0, stop_after_dispatch=True)
    client = JobClient(uri)
    client.get_njobs("drain", nbjobs=50)
    tcp._thread.join(timeout=5)
    assert not tcp._thread.is_alive()


def test_empty_jobs_csv(tmp_path):
    p = tmp_path / "empty.csv"
    p.write_text("source_path,dest_path\n")
    srv = JobServer(str(p))
    assert not srv.has_more_jobs()
    assert srv.get_njobs("x") == ([], [])


def test_tcp_rejects_unknown_method(jobs_csv):
    import json
    import socket

    srv = JobServer(jobs_csv)
    tcp, uri = srv.serve(host="127.0.0.1", port=0)
    try:
        host, port = uri.split("//")[1].split(":")
        with socket.create_connection((host, int(port))) as s:
            f = s.makefile("rw")
            # only the 4 lease methods are RPC surface; everything else on
            # the object (serve, __init__, _lock...) must be unreachable
            f.write(json.dumps({"method": "serve"}) + "\n")
            f.flush()
            resp = json.loads(f.readline())
            assert "error" in resp and "unknown method" in resp["error"]
            f.write(json.dumps({"method": "has_more_jobs"}) + "\n")
            f.flush()
            assert json.loads(f.readline()) == {"result": True}
    finally:
        tcp.shutdown()
