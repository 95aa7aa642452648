"""bench.py must ALWAYS print one parseable JSON record.

The tunneled TPU runtime can abort mid-measurement (observed:
JaxRuntimeError ABORTED "TPU backend error" with the very next link probe
healthy).  The driver captures bench.py's stdout as the round artifact —
a traceback instead of a JSON line loses the round's numbers, so the
segmentation measurement retries once with a fresh Segmenter and then
degrades to a zero-record carrying the failure and the last successful
measurement (same contract as the pre-existing stalled-link branch).
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_midrun_failure_yields_error_record(tmp_path):
    # Inject a Segmenter that always blows up: bench.main() resolves
    # `Segmenter` from the package at call time, so patching the package
    # attribute up front hits both the first attempt and the retry.
    code = (
        "import sys\n"
        f"sys.path.insert(0, {REPO!r})\n"
        "import bench\n"
        "import inaspeechsegmenter_tpu as iss\n"
        "class Boom:\n"
        "    def __init__(self, *a, **k):\n"
        "        raise RuntimeError('injected abort')\n"
        "iss.Segmenter = Boom\n"
        "bench.main()\n"
    )
    env = dict(os.environ)
    prev = env.get("PYTHONPATH", "")
    env["PYTHONPATH"] = REPO + (os.pathsep + prev if prev else "")
    env["JAX_PLATFORMS"] = "cpu"
    env["ISS_BENCH_SECONDS"] = "3"
    env["ISS_BENCH_FILES"] = "3"
    # keep the retry's re-probe cheap and point the state file away from
    # the host's real last-measurement cache
    env["ISS_BENCH_LINK_WAIT"] = "60"
    env["HOME"] = str(tmp_path)
    r = subprocess.run([sys.executable, "-c", code], env=env,
                       capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, (r.stdout, r.stderr)
    lines = [ln for ln in r.stdout.splitlines() if ln.startswith("{")]
    assert len(lines) == 1, r.stdout
    rec = json.loads(lines[0])
    assert rec["metric"] == "segmentation_realtime_factor_1chip"
    assert rec["value"] == 0 and rec["vs_baseline"] == 0
    assert "injected abort" in rec["error"]
    # no fresh-looking VFS number may ride along a failed run
    assert rec["vfs_realtime_factor_1chip"] == 0
