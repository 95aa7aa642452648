"""Composed distributed drive: multihost runtime + mesh engine + TCP farm.

Round-3 tested each distributed piece alone (test_multihost.py,
test_parallel_engine.py, test_farm_fault.py).  This drives them TOGETHER,
the way a production fleet composes them (SURVEY.md §5 distributed
backend: ICI engine + DCN dispatch):

* two worker subprocesses each `init_multihost` over a jax.distributed
  loopback coordinator (2 virtual CPU devices each, process_count == 2),
* each builds a REAL `Segmenter` (synthetic small weights) and a
  `ParallelEngine` over its LOCAL mesh (file-level data parallelism stays
  on-host; DCN carries only job dispatch — the reference farm's topology,
  pyro_server.py:57-65),
* both drain ONE TCP `JobServer` through `client_work_loop` (20-job
  leases, skipifexist=True, nbtry=3),
* the non-coordinator worker is SIGKILLed mid-lease (its leased jobs are
  lost, per the reference fault model), the survivor drains the rest,
* a re-fed recovery pass completes the corpus WITHOUT re-processing
  finished outputs (mtime-stable), and every csv byte-matches the
  single-process `Segmenter` output.
"""

import os
import signal
import socket
import subprocess
import sys
import time

import numpy as np
import pandas as pd
import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = """
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
os.environ["ISS_TPU_MODEL_DIR"] = %(modeldir)r
sys.path.insert(0, %(repo)r)
import jax
jax.config.update("jax_platforms", "cpu")
nproc = %(nproc)d
if nproc > 1:
    # distributed init MUST precede anything that initializes the XLA
    # backend — including the compile cache, which scopes per backend
    from inaspeechsegmenter_tpu.parallel.multihost import init_multihost
    ok = init_multihost(coordinator_address=%(addr)r, num_processes=nproc,
                        process_id=%(pid)d)
    assert ok and jax.process_count() == nproc, jax.process_count()
from inaspeechsegmenter_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
from inaspeechsegmenter_tpu import Segmenter
from inaspeechsegmenter_tpu.parallel.engine import ParallelEngine
from inaspeechsegmenter_tpu.parallel.jobs import client_work_loop
from inaspeechsegmenter_tpu.parallel.mesh import make_mesh

seg = Segmenter(vad_engine="smn", detect_gender=True, ffmpeg=None,
                allow_download=False)
engine = ParallelEngine(seg, mesh=make_mesh(devices=jax.local_devices()))
client_work_loop(%(uri)r, engine)
print("WORKER-DONE", flush=True)
# skip the jax.distributed shutdown barrier: the PEER process is
# SIGKILLed by design in this test, so a clean collective shutdown can
# never complete — the work is done and flushed at this point
os._exit(0)
"""


def _spawn(uri, modeldir, nproc, pid, addr):
    env = dict(os.environ)
    for k in ("JAX_COORDINATOR_ADDRESS", "JAX_PROCESS_ID",
              "JAX_NUM_PROCESSES"):
        env.pop(k, None)
    code = WORKER % dict(repo=REPO, modeldir=modeldir, nproc=nproc,
                         pid=pid, addr=addr, uri=uri)
    return subprocess.Popen([sys.executable, "-c", code], env=env, cwd=REPO,
                            stdout=subprocess.PIPE,
                            stderr=subprocess.STDOUT, text=True)


def _mix(i, seconds=2.0, sr=16000):
    rng = np.random.default_rng(100 + i)
    t = np.arange(int(seconds * sr)) / sr
    sig = (rng.standard_normal(len(t)) * 0.1
           + np.sin(2 * np.pi * (200 + 37 * i) * t) * 0.1)
    return np.clip(np.rint(sig * 32768), -32768, 32767).astype(np.int16)


def _wait(predicate, timeout, what):
    t0 = time.time()
    while time.time() - t0 < timeout:
        if predicate():
            return
        time.sleep(0.1)
    raise TimeoutError(f"{what} not reached after {timeout}s")


def test_multihost_engines_drain_farm_with_crash(tmp_path,
                                                 synthetic_model_dir):
    from inaspeechsegmenter_tpu import Segmenter
    from inaspeechsegmenter_tpu.audio import write_wav
    from inaspeechsegmenter_tpu.parallel.jobs import JobServer

    n_jobs = 26                      # lease 20 + a second lease line
    srcs, dsts = [], []
    for i in range(n_jobs):
        src = str(tmp_path / f"in_{i}.wav")
        write_wav(src, _mix(i), 16000)
        srcs.append(src)
        dsts.append(str(tmp_path / f"out_{i}.csv"))
    csv = tmp_path / "jobs.csv"
    pd.DataFrame({"source_path": srcs, "dest_path": dsts}).to_csv(
        csv, index=False)

    # single-process reference outputs (the correctness oracle)
    seg = Segmenter(vad_engine="smn", detect_gender=True, ffmpeg=None,
                    allow_download=False)
    refs = {}
    ref_dir = tmp_path / "ref"
    ref_dir.mkdir()
    ref_outs = [str(ref_dir / f"out_{i}.csv") for i in range(n_jobs)]
    _, n_ok, _, _ = seg.batch_process(srcs, ref_outs)
    assert n_ok == n_jobs
    for d, r in zip(dsts, ref_outs):
        with open(r, "rb") as fh:
            refs[d] = fh.read()

    # pre-warm the 2-device engine programs into the persistent compile
    # cache: the workers build the same mesh shape, and two subprocesses
    # cold-compiling the vmapped fused pipeline CONCURRENTLY on a 1-core
    # host would blow every timeout below
    import jax

    from inaspeechsegmenter_tpu.parallel.engine import ParallelEngine
    from inaspeechsegmenter_tpu.parallel.mesh import make_mesh

    warm = ParallelEngine(seg, mesh=make_mesh(devices=jax.devices()[:2]))
    warm_dir = tmp_path / "warm"
    warm_dir.mkdir()
    _, n_ok, _, _ = warm.batch_process(
        srcs[:3], [str(warm_dir / f"w{i}.csv") for i in range(3)])
    assert n_ok == 3

    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    coord = "127.0.0.1:%d" % s.getsockname()[1]
    s.close()

    srv = JobServer(str(csv))
    tcp, uri = srv.serve(host="127.0.0.1", port=0)
    try:
        workers = [_spawn(uri, synthetic_model_dir, 2, pid, coord)
                   for pid in (0, 1)]
        # kill the NON-coordinator mid-lease (killing process 0 would take
        # the jax.distributed coordinator down with it)
        try:
            _wait(lambda: sum(os.path.exists(d) for d in dsts) >= 2, 600,
                  "first outputs")
        except TimeoutError:
            for i, w in enumerate(workers):  # diagnose, don't just die
                w.kill()
                out, _ = w.communicate(timeout=30)
                print(f"--- worker {i} output ---\n{out}")
            raise
        workers[1].send_signal(signal.SIGKILL)
        workers[1].wait(timeout=30)
        out0, _ = workers[0].communicate(timeout=600)
        assert "WORKER-DONE" in out0, out0
        done_first = [d for d in dsts if os.path.exists(d)]
        assert len(done_first) < n_jobs, \
            "the SIGKILL lost no jobs — kill happened after the victim drained"
        for d in done_first:                      # outputs are exact
            with open(d, "rb") as fh:
                assert fh.read() == refs[d], d

        # recovery: re-feed the same manifest; one fresh (single-process)
        # engine worker completes the corpus idempotently
        mtimes = {d: os.path.getmtime(d) for d in done_first}
        srv.set_jobs(str(csv))
        rec = _spawn(uri, synthetic_model_dir, 1, 0, coord)
        out, _ = rec.communicate(timeout=600)
        assert "WORKER-DONE" in out, out
        for d in dsts:
            assert os.path.exists(d), d
            with open(d, "rb") as fh:
                assert fh.read() == refs[d], d
        for d, old in mtimes.items():
            assert os.path.getmtime(d) == old, f"{d} was re-processed"
    finally:
        for w in workers:
            if w.poll() is None:
                w.kill()
        tcp.shutdown()
        tcp.server_close()
