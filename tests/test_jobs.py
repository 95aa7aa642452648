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
        tcp.server_close()


def test_stop_after_dispatch(jobs_csv):
    srv = JobServer(jobs_csv)
    tcp, uri = srv.serve(host="127.0.0.1", port=0, stop_after_dispatch=True)
    client = JobClient(uri)
    client.get_njobs("drain", nbjobs=50)
    tcp._thread.join(timeout=5)
    try:
        assert not tcp._thread.is_alive()
    finally:
        tcp.server_close()


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
        tcp.server_close()


def test_client_times_out_on_unresponsive_server():
    """A server that stops responding mid-read surfaces a bounded
    ConnectionError instead of blocking the worker in readline() forever
    (round-3 fix; the reference's Pyro4 proxy also fails fast)."""
    import socket
    import time

    from inaspeechsegmenter_tpu.parallel.jobs import JobClient

    # accepts connections but never replies: every readline must time out
    lst = socket.socket()
    lst.bind(("127.0.0.1", 0))
    lst.listen(4)
    uri = "tcp://127.0.0.1:%d" % lst.getsockname()[1]
    try:
        cli = JobClient(uri, timeout=0.5, reconnect=1)
        t0 = time.time()
        try:
            cli.get_njobs("w", nbjobs=1)
            raised = False
        except ConnectionError:
            raised = True
        took = time.time() - t0
        assert raised
        # 2 attempts x 0.5 s timeout + backoff, generous slack
        assert took < 8.0
        cli.close()
    finally:
        lst.close()


def test_client_fails_fast_when_server_gone():
    """Connection refused (server process dead) raises ConnectionError
    after the bounded reconnect attempts."""
    import socket

    from inaspeechsegmenter_tpu.parallel.jobs import JobClient

    # grab a port and release it so nothing listens there
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    import pytest

    with pytest.raises((ConnectionError, OSError)):
        JobClient("tcp://127.0.0.1:%d" % port, timeout=0.5, reconnect=1)


def test_work_loop_exits_when_server_killed(jobs_csv, tmp_path):
    """Kill the real server process (SIGKILL) mid-lease: the worker's
    client_work_loop terminates within the timeout instead of hanging
    (VERDICT r2 weak point 5 / SURVEY section 5 failure detection)."""
    import os
    import signal
    import subprocess
    import sys
    import time

    from inaspeechsegmenter_tpu.parallel.jobs import client_work_loop

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    code = (
        "import sys; sys.path.insert(0, %r)\n"
        "from inaspeechsegmenter_tpu.parallel.jobs import JobServer\n"
        "srv = JobServer(%r)\n"
        "tcp, uri = srv.serve(host='127.0.0.1', port=0)\n"
        "print(uri, flush=True)\n"
        "import time; time.sleep(600)\n" % (repo, jobs_csv))
    proc = subprocess.Popen([sys.executable, "-c", code],
                            stdout=subprocess.PIPE, text=True)
    try:
        # skip the server's log lines ([jobserver] queued/listening ...)
        uri = ""
        for _ in range(10):
            line = proc.stdout.readline().strip()
            if line.startswith("tcp://"):
                uri = line
                break
        assert uri.startswith("tcp://")

        class KillerSegmenter:
            def __init__(self):
                self.calls = 0

            def batch_process(self, lsrc, ldst, **kw):
                self.calls += 1
                proc.kill()          # server dies while we "process"
                proc.wait()
                return (0.0, len(lsrc), 0.0, [])

        seg = KillerSegmenter()
        t0 = time.time()
        client_work_loop(uri, seg, hostname="w", timeout=1.0, reconnect=1)
        assert seg.calls == 1
        assert time.time() - t0 < 15.0
    finally:
        if proc.poll() is None:
            proc.send_signal(signal.SIGKILL)
            proc.wait()


def test_duplicate_request_replayed_not_reexecuted(jobs_csv):
    """At-most-once: a resent request (same client+id — the reconnect path
    after a lost reply) gets the server's cached response replayed instead
    of leasing the NEXT batch and orphaning the first."""
    import json
    import socket

    srv = JobServer(jobs_csv)
    tcp, uri = srv.serve(host="127.0.0.1", port=0)
    try:
        host, port = uri.split("//")[1].split(":")
        req = json.dumps({"method": "get_njobs", "args": ["w"],
                          "kwargs": {"nbjobs": 1}, "client": "c1",
                          "id": 7}) + "\n"
        with socket.create_connection((host, int(port))) as s:
            f = s.makefile("rw")
            f.write(req)
            f.flush()
            first = json.loads(f.readline())
        # "reconnect" and resend the exact same request
        with socket.create_connection((host, int(port))) as s:
            f = s.makefile("rw")
            f.write(req)
            f.flush()
            second = json.loads(f.readline())
            assert second == first          # replayed, not re-leased
            # a NEW id leases the next batch
            f.write(json.dumps({"method": "get_njobs", "args": ["w"],
                                "kwargs": {"nbjobs": 1}, "client": "c1",
                                "id": 8}) + "\n")
            f.flush()
            third = json.loads(f.readline())
            assert third["result"] != first["result"]
    finally:
        tcp.shutdown()
        tcp.server_close()


def test_farm_vfs_worker(synthetic_model_dir, media_dir, tmp_path):
    """The --vfs worker path over real TCP: a VoiceFemininityScoring worker
    drains a lease queue through client_work_loop (its batch_process adapter
    routes to batch_score) and writes score csvs."""
    from inaspeechsegmenter_tpu.models.resnet import ResNetXVector
    from inaspeechsegmenter_tpu.parallel.jobs import client_work_loop
    from inaspeechsegmenter_tpu.vfs import VoiceFemininityScoring

    out = tmp_path / "silence2sec.csv"
    csv = tmp_path / "jobs.csv"
    pd.DataFrame({"source_path": [f"{media_dir}/silence2sec.wav"],
                  "dest_path": [str(out)]}).to_csv(csv, index=False)
    srv = JobServer(str(csv))
    tcp, uri = srv.serve(host="127.0.0.1", port=0)
    try:
        net = ResNetXVector("bottleneck", (1, 1, 1, 1), 8, 64, 256)
        worker = VoiceFemininityScoring(
            gd_model_criteria="bgc", allow_download=False, ffmpeg=None,
            xvector_net=net, xvector_params=net.init_params(seed=3))
        client_work_loop(uri, worker, hostname="vfs-w")
    finally:
        tcp.shutdown()
        tcp.server_close()
    header, row = out.read_text().splitlines()
    assert header == "score\tspeech_duration\tnb_vectors"
    assert row.split("\t") == ["", "0.0", "0"]


def test_client_keys_distinct_across_instances(jobs_csv):
    """Replay identity must not depend on id(self): a freed address can be
    reused by a later JobClient, colliding with the server's replay cache."""
    srv = JobServer(jobs_csv)
    tcp, uri = srv.serve(host="127.0.0.1", port=0)
    try:
        keys = []
        for _ in range(3):
            c = JobClient(uri)
            keys.append(c._client)
            c._drop()
            del c
        assert len(set(keys)) == 3, keys
    finally:
        tcp.shutdown()
        tcp.server_close()


def test_inflight_duplicate_not_reexecuted(jobs_csv):
    """A retry arriving while the original request is still executing must
    block and replay, not execute the method a second time."""
    import json
    import socket
    import threading
    import time

    srv = JobServer(jobs_csv)
    calls = []
    orig = srv.get_njobs

    def slow_get_njobs(msg, nbjobs=20):
        calls.append(msg)
        time.sleep(0.5)
        return orig(msg, nbjobs=nbjobs)

    srv.get_njobs = slow_get_njobs
    tcp, uri = srv.serve(host="127.0.0.1", port=0)
    try:
        host, port = uri.split("//")[1].split(":")
        req = json.dumps({"method": "get_njobs", "args": ["w"],
                          "kwargs": {"nbjobs": 1}, "client": "dup",
                          "id": 1}) + "\n"
        results = []

        def send():
            with socket.create_connection((host, int(port))) as s:
                f = s.makefile("rw")
                f.write(req)
                f.flush()
                results.append(json.loads(f.readline()))

        t1 = threading.Thread(target=send)
        t2 = threading.Thread(target=send)
        t1.start()
        time.sleep(0.15)       # original is mid-execution
        t2.start()
        t1.join()
        t2.join()
        assert len(calls) == 1          # executed exactly once
        assert results[0] == results[1]  # retry got the replay
    finally:
        tcp.shutdown()
        tcp.server_close()


def test_get_job_empty_queue_clean_error(tmp_path):
    """A worker racing the last job gets a clean IndexError (reference
    exception class) without skewing the lease counter."""
    import pytest

    from inaspeechsegmenter_tpu.parallel.jobs import JobServer

    csv = tmp_path / "jobs.csv"
    csv.write_text("source_path,dest_path\na.wav,a.csv\n")
    srv = JobServer(str(csv))
    srv.get_job("w1")
    i_before = srv.i
    with pytest.raises(IndexError, match="no jobs left"):
        srv.get_job("w2")
    assert srv.i == i_before


def test_lease_counter_counts_actual_jobs(jobs_csv):
    """Over-asking on a short queue must not skew the lease numbering
    operators correlate with corpus progress."""
    srv = JobServer(jobs_csv)                 # 3 unique jobs
    ls, _ = srv.get_njobs("w", nbjobs=20)
    assert len(ls) == 3 and srv.i == 3
    ls, _ = srv.get_njobs("w", nbjobs=20)     # empty queue
    assert ls == [] and srv.i == 3


def test_active_client_lock_survives_cache_eviction(jobs_csv):
    """At-most-once under eviction pressure: while client A's request is
    still EXECUTING, other clients touching the (cap-bounded) lock map
    must not evict A's lock — a fresh lock would let A's retry execute
    concurrently with the original and lease a second batch."""
    import json
    import socket
    import threading
    import time

    srv = JobServer(jobs_csv)
    calls = []
    orig = srv.get_njobs

    def slow_get_njobs(msg, nbjobs=20):
        calls.append(msg)
        time.sleep(1.0)                      # hold the client lock
        return orig(msg, nbjobs=nbjobs)

    srv.get_njobs = slow_get_njobs
    tcp, uri = srv.serve(host="127.0.0.1", port=0, cap=1)
    try:
        host, port = uri.split("//")[1].split(":")
        addr = (host, int(port))
        req = json.dumps({"method": "get_njobs", "args": ["A"],
                          "kwargs": {"nbjobs": 1}, "client": "A",
                          "id": 1}) + "\n"
        replies = {}

        def call(tag, line):
            with socket.create_connection(addr) as s:
                f = s.makefile("rw")
                f.write(line)
                f.flush()
                replies[tag] = json.loads(f.readline())

        t_orig = threading.Thread(target=call, args=("orig", req))
        t_orig.start()
        time.sleep(0.3)                      # A is mid-execution
        # eviction pressure from another client (cap=1)
        call("b", json.dumps({"method": "has_more_jobs", "client": "B",
                              "id": 1}) + "\n")
        # A's retry (lost-reply resend) while the original still runs
        t_retry = threading.Thread(target=call, args=("retry", req))
        t_retry.start()
        t_orig.join(10)
        t_retry.join(10)
        assert replies["retry"] == replies["orig"]   # replayed
        assert calls == ["A"], calls                 # executed ONCE
    finally:
        tcp.shutdown()
        tcp.server_close()
