#!/usr/bin/env python
"""Fetch every released weight file into a directory (networked hosts).

Uses the registry's own filename -> release-URL map (models/registry.py
DMODELS, mirroring reference remote_utils.py:4-15) so CI / Docker builds /
first-run hosts can stage all 7 files with one command and then run the
acceptance battery (tools/verify_weights.py) with zero manual steps.

Usage::

    python tools/fetch_weights.py [DEST_DIR]      # default ~/.keras/inaSpeechSegmenter

Exit status: 0 = every file present (downloaded or already there);
1 = at least one download failed (e.g. egress-less host).
"""

from __future__ import annotations

import importlib.util
import os
import sys
import urllib.request


def _load_dmodels():
    """Import the registry MODULE FILE directly (not via the package):
    the package __init__ pulls in jax and the full Segmenter stack, which
    a fetch-only environment (e.g. the CI staging step before the
    framework install) does not have.  registry.py itself needs only
    numpy."""
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "_iss_registry", os.path.join(root, "inaspeechsegmenter_tpu",
                                      "models", "registry.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.DMODELS


DMODELS = _load_dmodels()


def fetch_all(dest):
    os.makedirs(dest, exist_ok=True)
    failed = []
    for name, url in DMODELS.items():
        path = os.path.join(dest, name)
        if os.path.exists(path) and os.path.getsize(path) > 0:
            print(f"  {name:<36} already present")
            continue
        tmp = f"{path}.part{os.getpid()}"
        try:
            urllib.request.urlretrieve(url + name, tmp)
            os.replace(tmp, path)
            print(f"  {name:<36} downloaded "
                  f"({os.path.getsize(path)} bytes)")
        except Exception as exc:
            failed.append(name)
            print(f"  {name:<36} FAILED: {type(exc).__name__}: {exc}")
            # a mid-transfer failure (connection drop, short read) leaves
            # the partially-written temp file behind — remove it so flaky
            # retries don't accumulate .part litter in the weights dir
            try:
                os.remove(tmp)
            except OSError:
                pass
    return failed


def main():
    dest = sys.argv[1] if len(sys.argv) > 1 else os.path.expanduser(
        "~/.keras/inaSpeechSegmenter")
    print(f"fetching released weights into {dest}")
    failed = fetch_all(dest)
    if failed:
        print(f"FAILED: {len(failed)} of {len(DMODELS)} files "
              f"({', '.join(failed)}) — egress-less host?")
        return 1
    print(f"ok: all {len(DMODELS)} weight files present")
    return 0


if __name__ == "__main__":
    sys.exit(main())
