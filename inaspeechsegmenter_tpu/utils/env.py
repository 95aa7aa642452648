"""Environment-knob plumbing shared by the CLI / tool entry points."""

from __future__ import annotations

import os


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
