"""On-TPU gate for the bf16 serving default (advisor round-2 finding).

The TPU serving default for the patch CNNs is ``ISS_CNN_PRECISION=high``
(bf16 3-pass) while golden parity work pins exact f32 (``highest``).  The
zero-flip claim in docs/performance.md was a one-off measurement; this test
is the standing gate: it runs the full fused segmentation (smn + gender) on
musanmix.wav under both precisions on the real TPU and asserts the
frame-label diff stays inside the <=0.1% budget (BASELINE.md north star).

Runs only where a TPU is visible outside the suite's CPU platform pin
(skips elsewhere), and in subprocesses because precision is resolved at
trace time — two modes cannot share one process's jit cache.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import sys
import numpy as np
import jax
if jax.devices()[0].platform != "tpu":
    sys.exit(77)
from inaspeechsegmenter_tpu.models.synthetic import ensure_synthetic_env
ensure_synthetic_env(size="full")
from inaspeechsegmenter_tpu import Segmenter
seg = Segmenter(vad_engine="smn", detect_gender=True, ffmpeg=None)
segments = seg(sys.argv[2])
np.savez(sys.argv[1],
         labs=np.array([s[0] for s in segments]),
         starts=np.array([s[1] for s in segments], dtype=np.float64),
         stops=np.array([s[2] for s in segments], dtype=np.float64))
"""


def _frames(segments, step=0.02):
    total = segments[-1][2]
    n = int(round(total / step))
    lab = np.empty(n, dtype=object)
    for name, start, stop in segments:
        lab[int(round(start / step)): int(round(stop / step))] = name
    return lab


@pytest.mark.slow
def test_high_vs_highest_frame_budget(tmp_path, media_dir, live_tpu):
    # also drop ISS_TPU_MODEL_DIR: the session-scoped synthetic fixture
    # leaks a size='small' dir through it, which would silently replace
    # the full-shape models this gate is supposed to measure
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS", "ISS_TPU_MODEL_DIR")}
    prev = env.get("PYTHONPATH", "")
    env["PYTHONPATH"] = REPO + (os.pathsep + prev if prev else "")

    outs = {}
    for mode in ("highest", "high"):
        env_m = dict(env, ISS_CNN_PRECISION=mode)
        out = str(tmp_path / f"{mode}.npz")
        r = subprocess.run(
            [sys.executable, "-c", WORKER, out,
             os.path.join(media_dir, "musanmix.wav")],
            env=env_m, cwd=REPO, capture_output=True, text=True, timeout=900)
        if r.returncode == 77:
            pytest.skip("no TPU visible outside the test platform pin")
        assert r.returncode == 0, r.stderr[-2000:]
        with np.load(out) as z:
            outs[mode] = list(zip(z["labs"], z["starts"], z["stops"]))

    f_exact = _frames(outs["highest"])
    f_fast = _frames(outs["high"])
    n = min(len(f_exact), len(f_fast))
    assert abs(len(f_exact) - len(f_fast)) <= 1
    diff = float(np.mean(f_exact[:n] != f_fast[:n]))
    assert diff <= 0.001, f"bf16-3pass frame diff {diff:.4%} exceeds 0.1%"
