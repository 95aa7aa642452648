"""Package install smoke: the wheel is buildable, installable, and usable
WITHOUT the repo on sys.path — console scripts resolve and a tiny
segmentation runs end-to-end from the installed package (the reference's
console-script contract, setup.py:171-172).

Local flavor: `pip wheel --no-build-isolation` + `--target` install (the
air-gapped host cannot create a dependency venv); CI's `package` job does
the full clean-venv + `pip install dist/*.whl` variant on a networked
runner.
"""

import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SCRIPTS = [
    "ina_speech_segmenter",
    "ina_speech_segmenter_job_server",
    "ina_speech_segmenter_job_client",
    "ina_speech_segmenter_job_setjobs",
    "ina_speech_segmenter_vfs",
    "ina_speech_segmenter_eval",
]

E2E = """
import os, sys
assert not any(p.rstrip('/') == %(repo)r for p in sys.path), sys.path
import numpy as np
from inaspeechsegmenter_tpu.models.synthetic import ensure_synthetic_env
ensure_synthetic_env()
from inaspeechsegmenter_tpu.audio import write_wav
rng = np.random.default_rng(0)
write_wav("t.wav", (rng.standard_normal(16000 * 8) * 3000
                    ).astype(np.int16), 16000)
from inaspeechsegmenter_tpu import Segmenter
seg = Segmenter(vad_engine="smn", detect_gender=True, ffmpeg=None,
                allow_download=False)
dur, n_ok, avg, lmsg = seg.batch_process(["t.wav"], ["t.csv"])
assert n_ok == 1 and open("t.csv").readline() == "labels\\tstart\\tstop\\n"
print("E2E-OK")
"""


@pytest.fixture(scope="module")
def installed(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("pkg")
    wheels = tmp / "wheels"
    target = tmp / "site"
    subprocess.run(
        [sys.executable, "-m", "pip", "wheel", "--no-deps",
         "--no-build-isolation", "-q", "-w", str(wheels), REPO],
        check=True)
    built = list(wheels.glob("inaspeechsegmenter_tpu-*.whl"))
    assert len(built) == 1, built
    subprocess.run(
        [sys.executable, "-m", "pip", "install", "-q", "--no-deps",
         "--no-index", "--target", str(target), str(built[0])],
        check=True)
    return target


def _env(target):
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["PYTHONPATH"] = str(target)
    env["JAX_PLATFORMS"] = "cpu"
    return env


def test_console_scripts_resolve(installed, tmp_path):
    for s in SCRIPTS:
        script = installed / "bin" / s
        assert script.exists(), f"console script {s} not generated"
        r = subprocess.run([sys.executable, str(script), "--help"],
                           env=_env(installed), cwd=str(tmp_path),
                           capture_output=True, text=True, timeout=120)
        assert r.returncode == 0, (s, r.stdout, r.stderr)
        assert "usage" in (r.stdout + r.stderr).lower(), s


def test_installed_package_segments(installed, tmp_path):
    r = subprocess.run([sys.executable, "-c", E2E % {"repo": REPO}],
                       env=_env(installed), cwd=str(tmp_path),
                       capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, (r.stdout, r.stderr)
    assert "E2E-OK" in r.stdout
