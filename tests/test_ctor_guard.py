"""Public constructors must fail cleanly (bounded) on a dead device link.

Round-3 hardening bounded the BENCH entry points (utils/env.wait_for_device)
but `Segmenter()` / `VoiceFemininityScoring()` still hung forever on a
stalled accelerator: the ctor uploads params and (auto frontend) runs a
link round-trip.  `utils/env.require_device` now probes first and raises
TimeoutError within ISS_CTOR_LINK_WAIT seconds.  These tests simulate a
dead backend with an unknown platform name in a subprocess (the probe
child can never initialize it, exactly like a tunnel that never answers).
"""

import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_dead_backend(code, wait="4"):
    env = dict(os.environ)
    prev = env.get("PYTHONPATH", "")
    env["PYTHONPATH"] = REPO + (os.pathsep + prev if prev else "")
    env["JAX_PLATFORMS"] = "fakeaccel"  # platform that can never answer
    env["ISS_CTOR_LINK_WAIT"] = wait
    return subprocess.run([sys.executable, "-c", code], env=env,
                          capture_output=True, text=True, timeout=240)


def test_segmenter_ctor_times_out_cleanly():
    t0 = time.monotonic()
    r = _run_dead_backend(
        "from inaspeechsegmenter_tpu import Segmenter\n"
        "try:\n"
        "    Segmenter(ffmpeg=None, allow_download=False)\n"
        "except TimeoutError as e:\n"
        "    print('CLEAN_TIMEOUT', e)\n")
    assert "CLEAN_TIMEOUT" in r.stdout, (r.stdout, r.stderr)
    assert "ISS_CTOR_LINK_WAIT" in r.stdout  # actionable message
    # bounded: wait (4 s) + one probe-child startup + interpreter startup,
    # far below the unbounded hang this guards against
    assert time.monotonic() - t0 < 180


def test_vfs_ctor_times_out_cleanly():
    r = _run_dead_backend(
        "from inaspeechsegmenter_tpu import VoiceFemininityScoring\n"
        "try:\n"
        "    VoiceFemininityScoring(ffmpeg=None, allow_download=False)\n"
        "except TimeoutError as e:\n"
        "    print('CLEAN_TIMEOUT', e)\n")
    assert "CLEAN_TIMEOUT" in r.stdout, (r.stdout, r.stderr)


def test_guard_skips_on_cpu_and_latches(monkeypatch):
    """On CPU platforms the guard is free, and one success (e.g. the bench's
    wait_for_device) latches the whole process."""
    from inaspeechsegmenter_tpu.utils import env as env_mod

    monkeypatch.setattr(env_mod, "_DEVICE_OK", False)
    t0 = time.monotonic()
    env_mod.require_device("test")          # conftest pins cpu
    assert time.monotonic() - t0 < 0.1
    assert env_mod._DEVICE_OK


def test_guard_skips_when_backend_already_initialized(monkeypatch):
    """A process that already initialized a backend (the CLIs call
    jax.default_backend() for cache scoping before constructing models)
    must NOT spawn a probe subprocess: the first device contact already
    succeeded, and on exclusive accelerators (libtpu grants one process)
    the probe child could never attach — the guard would turn a healthy
    device into a spurious TimeoutError after the full wait."""
    import jax

    from inaspeechsegmenter_tpu.utils import env as env_mod

    jax.default_backend()                     # initialize (cpu in tests)
    monkeypatch.setattr(env_mod, "_DEVICE_OK", False)
    monkeypatch.setenv("JAX_PLATFORMS", "fakeaccel")   # pretend accelerator
    probed = []
    monkeypatch.setattr(env_mod, "wait_for_device",
                        lambda *a, **k: probed.append(1) or False)
    env_mod.require_device("test")            # must not probe, must not raise
    assert not probed
    assert env_mod._DEVICE_OK


def test_guard_opt_out(monkeypatch):
    """ISS_CTOR_LINK_WAIT <= 0 skips the probe even on accelerators."""
    from inaspeechsegmenter_tpu.utils import env as env_mod

    monkeypatch.setattr(env_mod, "_DEVICE_OK", False)
    monkeypatch.setenv("JAX_PLATFORMS", "fakeaccel")
    monkeypatch.setenv("ISS_CTOR_LINK_WAIT", "0")
    env_mod.require_device("test")          # returns instead of probing
    assert env_mod._DEVICE_OK
