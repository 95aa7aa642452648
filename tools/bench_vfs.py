"""VFS (voice femininity scoring) pipeline benchmark on 1 chip.

Measures the full `VoiceFemininityScoring.__call__` wall time on a long
synthetic broadcast-style file (decode -> VAD -> VBx features -> batched
ResNet101 x-vectors -> MLP), plus:

* A/B of the round-3 speech-only window filter (`ISS_XVEC_SPEECH_ONLY`),
  interleaved in one process (the tunneled link drifts between runs);
* the two-file `batch_score` prefetch overlap vs 2x single-file.

Weights: deterministic synthetic stand-ins for the CNN/MLP plus a
random-init FULL ResNet101 (the real x-vector architecture — compute cost
is identical to the released checkpoint).  Prints one JSON line per
metric.

Usage: python tools/bench_vfs.py  [ISS_BENCH_VFS_SECONDS=1200]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_vfs_workload(seconds, seed=3):
    """Full-architecture synthetic-weight VFS + synthetic broadcast WAVs.

    Returns ``(vfs, path, halves)``: a `VoiceFemininityScoring` with a
    random-init FULL ResNet101 (compute cost identical to the released
    checkpoint), one `seconds`-long WAV, and the same signal split into two
    half files (for the batch-prefetch A/B).  The caller must already have
    installed the synthetic model env (`ensure_synthetic_env`).  Shared by
    this tool and the driver-facing bench.py so both measure the same
    workload."""
    from bench import synth_int16
    from inaspeechsegmenter_tpu.audio import write_wav
    from inaspeechsegmenter_tpu.models.resnet import ResNet101XVector
    from inaspeechsegmenter_tpu.vfs import VoiceFemininityScoring

    net = ResNet101XVector()
    params = net.init_params(seed=11)
    vfs = VoiceFemininityScoring(gd_model_criteria="vfp", ffmpeg=None,
                                 allow_download=False,
                                 xvector_net=net, xvector_params=params)

    tmp = tempfile.mkdtemp(prefix="iss_vfs_bench_")
    sig = synth_int16(seconds, seed=seed)
    path = os.path.join(tmp, "long.wav")
    write_wav(path, sig, 16000)
    halves = []
    for i, half in enumerate(np.split(sig, 2)):
        p = os.path.join(tmp, f"half{i}.wav")
        write_wav(p, half, 16000)
        halves.append(p)
    return vfs, path, halves


def measure_vfs(seconds, rounds=3, workload=None):
    """Best-of-``rounds`` full-pipeline VFS real-time factor with the
    speech-only window filter on (the production default).  Returns the
    flat record fields bench.py folds into the driver artifact."""
    import time as _time

    vfs, path, _ = workload if workload is not None \
        else build_vfs_workload(seconds)
    os.environ["ISS_XVEC_SPEECH_ONLY"] = "1"
    vfs(path)  # warm: compiles the bucket programs
    best, res = None, None
    for _ in range(rounds):
        t0 = _time.perf_counter()
        res = vfs(path)
        dt = _time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return {
        "vfs_realtime_factor_1chip": round(seconds / best, 1),
        "vfs_vs_baseline": round(seconds / best / 500.0, 3),
        "vfs_speech_fraction": round(res[1] / seconds, 3),
        "vfs_n_xvectors": res[2],
    }


def main():
    from inaspeechsegmenter_tpu.utils.cache import enable_compilation_cache
    from inaspeechsegmenter_tpu.utils.env import (apply_platform_env,
                                                  wait_for_device)

    # honor an explicit JAX_PLATFORMS pin over any sitecustomize
    # accelerator hook (see bench.py)
    apply_platform_env()

    # bounded wait for the tunneled link (see bench.py): the cache setup
    # below initializes the backend and would hang on a dead link
    state = os.path.expanduser(
        "~/.cache/inaspeechsegmenter_tpu/last_bench_vfs.json")
    if not wait_for_device(float(os.environ.get("ISS_BENCH_LINK_WAIT",
                                                "1800"))):
        rec = {"metric": "vfs_realtime_factor_1chip", "value": 0,
               "unit": "x_realtime", "vs_baseline": 0,
               "error": "device link stalled; no measurement possible"}
        try:
            with open(state) as fh:
                rec["last_successful_run"] = json.load(fh)
        except (OSError, ValueError):
            pass   # missing or corrupt state must not break the record
        print(json.dumps(rec))
        return
    enable_compilation_cache()
    from inaspeechsegmenter_tpu.models.synthetic import ensure_synthetic_env

    ensure_synthetic_env(size="full")

    seconds = int(os.environ.get("ISS_BENCH_VFS_SECONDS", "1200"))
    vfs, path, halves = build_vfs_workload(seconds)
    tmp = os.path.dirname(path)

    def run(speech_only):
        os.environ["ISS_XVEC_SPEECH_ONLY"] = "1" if speech_only else "0"
        t0 = time.perf_counter()
        score, dur, n = vfs(path)
        return time.perf_counter() - t0, (score, dur, n)

    # warm both variants (compiles), then interleave A/B best-of-5 — the
    # tunneled link's throughput swings ~2x between minutes, so best-of
    # captures pipeline capability rather than link weather
    run(True)
    run(False)
    t_on, r_on = [], None
    t_off, r_off = [], None
    for _ in range(5):
        t, r_on = run(True)
        t_on.append(t)
        t, r_off = run(False)
        t_off.append(t)
    # output-identical filter up to batch-shape float drift: the two runs
    # compile different batch shapes, so a gender-MLP p sitting exactly on
    # the 0.5 threshold could flip one count (tests bound the per-window
    # embedding drift at 1e-5); duration and retained-count must be equal
    assert r_on[1] == r_off[1] and r_on[2] == r_off[2], (r_on, r_off)
    if r_on[0] != r_off[0]:
        assert abs(r_on[0] - r_off[0]) <= 1.0 / max(r_on[2], 1), (r_on, r_off)
    best_on, best_off = min(t_on), min(t_off)
    frac_speech = r_on[1] / seconds
    rec = {
        "metric": "vfs_realtime_factor_1chip",
        "value": round(seconds / best_on, 1),
        "unit": "x_realtime",
        "vs_baseline": round(seconds / best_on / 500.0, 3),
        "speech_fraction": round(frac_speech, 3),
        "n_xvectors": r_on[2],
    }
    print(json.dumps(rec))
    try:
        os.makedirs(os.path.dirname(state), exist_ok=True)
        tmp_state = f"{state}.part{os.getpid()}"
        with open(tmp_state, "w") as fh:
            json.dump(dict(rec, measured_at=time.strftime(
                "%Y-%m-%d %H:%M UTC", time.gmtime())), fh)
        os.replace(tmp_state, state)
    except OSError:
        pass
    print(json.dumps({
        "metric": "vfs_speech_only_speedup",
        "value": round(best_off / best_on, 2),
        "unit": "x",
        "embed_all_s": round(best_off, 2),
        "speech_only_s": round(best_on, 2),
    }))

    # batch overlap: decode+VAD of file 2 behind ResNet of file 1.  Uses
    # batch_score's own core-count-aware prefetch depth: on 1-core hosts
    # (like the tunneled bench host, where the device client busy-spins and
    # starves producer threads) the default is depth 1 — forcing 2 there
    # measured 0.86x, i.e. net-negative, which is exactly why the default
    # is core-count-aware.  Multi-core production hosts get depth 2.
    os.environ["ISS_XVEC_SPEECH_ONLY"] = "1"
    os.environ.pop("ISS_PREFETCH", None)
    from inaspeechsegmenter_tpu.utils.prefetch import prefetch_depth

    depth = prefetch_depth()
    outs = [os.path.join(tmp, f"b{i}.csv") for i in range(2)]
    for h in halves:  # warm the half-length buckets
        vfs(h)
    t_sum = None
    t_batch = None
    for _ in range(3):
        t0 = time.perf_counter()
        for h in halves:
            vfs(h)
        t_sum = min(t_sum or 1e9, time.perf_counter() - t0)
        for o in outs:
            if os.path.exists(o):
                os.remove(o)
        t0 = time.perf_counter()
        dur, n_ok, _, _ = vfs.batch_score(halves, outs)
        assert n_ok == 2
        t_batch = min(t_batch or 1e9, time.perf_counter() - t0)
    print(json.dumps({
        "metric": "vfs_batch_prefetch_speedup",
        "value": round(t_sum / t_batch, 2),
        "unit": "x",
        "prefetch_depth": int(depth),
        "serial_2files_s": round(t_sum, 2),
        "batch_2files_s": round(t_batch, 2),
    }))


if __name__ == "__main__":
    main()
