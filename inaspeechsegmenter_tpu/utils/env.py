"""Environment-knob plumbing shared by the CLI / tool entry points."""

from __future__ import annotations

import os


# process-wide "the device link answered at least once" latch: one
# successful probe (from a bench entry point or a constructor) covers all
# later constructors in the process
_DEVICE_OK = False


def require_device(what="constructor"):
    """Bounded guard before a constructor's first device touch.

    `Segmenter()` / `VoiceFemininityScoring()` upload parameters and (on
    auto frontend selection) run a link-bandwidth round-trip during
    construction; on a stalled accelerator link those block forever with
    no diagnostic (the tunneled-TPU stalls run tens of minutes).  This
    probes the link with the same subprocess pattern the bench entry
    points use (`wait_for_device`) and raises a clear ``TimeoutError``
    after ``ISS_CTOR_LINK_WAIT`` seconds (default 600; <=0 skips the
    guard) instead of hanging the caller.

    Skipped entirely on CPU platforms (nothing to stall) and after any
    prior successful probe in this process.
    """
    global _DEVICE_OK
    if _DEVICE_OK:
        return
    plat = (os.environ.get("JAX_PLATFORMS") or "").split(",")[0].strip()
    if not plat:
        # tests and embedders pin the platform through the config API
        # (sitecustomize hooks ignore the env var); reading the config
        # only imports jax — it does not initialize a backend
        try:
            import jax

            plat = (jax.config.jax_platforms or "").split(",")[0].strip()
        except Exception:
            plat = ""
    if plat.lower() == "cpu":
        _DEVICE_OK = True
        return
    # if THIS process already initialized a backend (CLI bootstrap_runtime
    # calls jax.default_backend() for cache scoping; embedders may have run
    # device work), the first device contact already succeeded — and on
    # exclusive accelerators (libtpu grants one process) a subprocess probe
    # could never succeed, so probing here would turn a healthy device into
    # a spurious TimeoutError after the full wait
    try:
        from jax._src import xla_bridge

        if xla_bridge.backends_are_initialized():
            _DEVICE_OK = True
            return
    except Exception:
        pass   # private API moved: fall through to the subprocess probe
    wait = float(os.environ.get("ISS_CTOR_LINK_WAIT", "600"))
    if wait <= 0:
        _DEVICE_OK = True
        return
    if not wait_for_device(wait, probe_timeout=min(120.0, wait)):
        raise TimeoutError(
            f"{what}: the accelerator link did not answer a probe within "
            f"ISS_CTOR_LINK_WAIT={wait:.0f}s — the device backend appears "
            "stalled or unreachable. Raise ISS_CTOR_LINK_WAIT to keep "
            "waiting, set it <=0 to skip this guard, or set "
            "JAX_PLATFORMS=cpu to run without the accelerator.")
    _DEVICE_OK = True


def wait_for_device(max_wait=1800.0, probe_timeout=120.0):
    """Block until the default JAX device answers a matmul, or give up.

    The tunneled TPU host stalls for tens of minutes at a time (observed
    ~50 min); a harness that dives straight into device work hangs with no
    diagnostic.  Probes in a SUBPROCESS (a stalled in-process call can't
    be cancelled) with the persistent compile cache enabled so a healthy
    link answers in seconds.  Returns True when the device responds,
    False when ``max_wait`` elapses first."""
    import subprocess
    import sys
    import time

    code = (
        # platform pin FIRST: enable_compilation_cache scopes its dir per
        # backend, which initializes the backend — after that the pin is
        # inert and the probe would target the wrong platform
        "from inaspeechsegmenter_tpu.utils.env import apply_platform_env\n"
        "apply_platform_env()\n"
        "from inaspeechsegmenter_tpu.utils.cache import "
        "enable_compilation_cache\n"
        "enable_compilation_cache()\n"
        "import jax.numpy as jnp\n"
        "x = jnp.ones((256, 256))\n"
        "print(float((x @ x)[0, 0]))\n")
    # APPEND the package root to PYTHONPATH (never replace: hosts carry
    # their platform plugin on the ambient PYTHONPATH)
    root = os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))))
    env = dict(os.environ)
    prev = env.get("PYTHONPATH", "")
    env["PYTHONPATH"] = prev + (os.pathsep if prev else "") + root
    deadline = time.time() + max_wait
    global _DEVICE_OK
    while True:
        try:
            r = subprocess.run([sys.executable, "-c", code], env=env,
                               capture_output=True, timeout=probe_timeout)
            if r.returncode == 0:
                _DEVICE_OK = True  # constructors need no second probe
                return True
        except subprocess.TimeoutExpired:
            pass
        if time.time() >= deadline:
            return False
        print("[wait_for_device] device link not answering; retrying "
              "(stalls of tens of minutes are a known link mode)",
              file=sys.stderr)


def apply_platform_env():
    """Re-assert ``JAX_PLATFORMS`` from the environment after jax import.

    Some hosts install a ``sitecustomize`` hook that registers an
    accelerator PJRT plugin at interpreter startup and force-selects it,
    overriding the ``JAX_PLATFORMS`` value the parent process put in the
    child's environment.  Entry points that are routinely spawned as
    subprocesses (workers, acceptance tools, the multichip dryrun) call
    this right after importing jax so an explicit ``JAX_PLATFORMS=cpu``
    request is honored regardless of such hooks.  No-op when the variable
    is unset or backends are already initialized.
    """
    plat = os.environ.get("JAX_PLATFORMS")
    if not plat:
        return
    try:
        import jax

        jax.config.update("jax_platforms", plat)
    except Exception:
        pass
