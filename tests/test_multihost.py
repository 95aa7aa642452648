"""Multi-host (DCN) smoke test: two local processes over the
jax.distributed CPU loopback drive init_multihost + global_mesh
(parallel/multihost.py) — the only distributed piece previously untested.
"""

import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
sys.path.insert(0, %(repo)r)
import jax
jax.config.update("jax_platforms", "cpu")
from inaspeechsegmenter_tpu.parallel.multihost import init_multihost, global_mesh
ok = init_multihost(coordinator_address=%(addr)r, num_processes=2,
                    process_id=%(pid)d)
assert ok, "init_multihost returned False with explicit args"
assert jax.process_count() == 2, jax.process_count()
assert len(jax.local_devices()) == 2
mesh = global_mesh()
assert mesh.devices.size == 4, mesh
assert mesh.axis_names == ("data",)
print("MULTIHOST_OK", %(pid)d, mesh.devices.size, flush=True)
"""


def test_two_process_loopback():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    addr = "127.0.0.1:%d" % port
    env = dict(os.environ)
    env.pop("JAX_COORDINATOR_ADDRESS", None)
    env.pop("JAX_PROCESS_ID", None)
    env.pop("JAX_NUM_PROCESSES", None)
    procs = [subprocess.Popen(
        [sys.executable, "-c", WORKER % dict(repo=REPO, addr=addr, pid=pid)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env, cwd=REPO) for pid in (0, 1)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=240)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out}"
        assert f"MULTIHOST_OK {pid} 4" in out, out


def test_init_multihost_noop_without_coordinator(monkeypatch):
    from inaspeechsegmenter_tpu.parallel.multihost import init_multihost

    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    assert init_multihost() is False
