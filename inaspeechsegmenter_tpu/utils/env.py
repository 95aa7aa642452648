"""Environment-knob plumbing shared by the CLI / tool entry points."""

from __future__ import annotations

import os


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
    while True:
        try:
            r = subprocess.run([sys.executable, "-c", code], env=env,
                               capture_output=True, timeout=probe_timeout)
            if r.returncode == 0:
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
