"""Online-family latency benchmark (OnlineSegmenter / OnlineVFS).

For a live monitoring surface, latency IS the spec: this measures, on one
chip with full-size synthetic weights,

* time-to-first-provisional label/score (how soon after the stream starts
  the monitor says anything);
* steady-state per-feed `feed()+current()` latency at 1 s and 10 s feed
  cadences (p50/p95 over a measured pass, after an identical warm pass so
  the numbers reflect serving, not compile weather);
* `current()` cost as a function of backlog (5/10/20 min fed) — the decode
  is a whole-timeline device Viterbi, so this term grows with backlog; the
  measured slope documents the bound (docs/performance.md);
* `finalize()` cost vs the equivalent offline `segment_signal` /
  `score_signal` call on the same signal.

The reference has no online surface at all (its closest analogue is the
file-at-a-time featGenerator overlap, reference segmenter.py:377-387);
these numbers exist so the live path has a measured spec, per-round
regressions are visible, and any backlog-dependent term is a documented
bound rather than a surprise.

Prints one JSON line per metric.
Usage: python tools/bench_online.py   [ISS_BENCH_ONLINE_FULL_SECONDS=180]
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SR = 16000


def _percentiles(lat_s):
    ms = sorted(1000.0 * x for x in lat_s)
    return (round(ms[len(ms) // 2], 1),
            round(ms[int(0.95 * len(ms))], 1))


def seg_cadence(seg, sig, cadence_s):
    """Warm pass + measured pass of feed()+current() at a fixed cadence."""
    from inaspeechsegmenter_tpu.online import OnlineSegmenter

    block = cadence_s * SR
    out = None
    for measured in (False, True):
        online = OnlineSegmenter(seg)
        lat, t_first = [], None
        t0 = time.perf_counter()
        for i in range(0, len(sig), block):
            t1 = time.perf_counter()
            online.feed(sig[i:i + block])
            labels = online.current()
            lat.append(time.perf_counter() - t1)
            if t_first is None and labels:
                t_first = time.perf_counter() - t0
        t1 = time.perf_counter()
        final = online.finalize()
        t_fin = time.perf_counter() - t1
        if measured:
            p50, p95 = _percentiles(lat)
            out = {
                "metric": f"online_seg_feed_latency_{cadence_s}s",
                # None when no provisional label appeared before the
                # stream ended (short smoke runs): a missing first-label
                # time is data, not a crash
                "first_provisional_s": (round(t_first, 3)
                                        if t_first is not None else None),
                "feed_plus_current_ms_p50": p50,
                "feed_plus_current_ms_p95": p95,
                "finalize_s": round(t_fin, 3),
                "audio_seconds": len(sig) // SR,
                "n_final_segments": len(final),
            }
    return out


def seg_backlog(seg, sig, checkpoints_min=(5, 10, 20)):
    """current() cost at several backlog depths, measured where the cost
    actually occurs: the poll right after a NEW feature group lands (the
    whole-timeline provisional decode).  Polls between group arrivals hit
    the provisional-result cache and are reported separately — feeding 10 s
    blocks and timing an arbitrary poll would mostly measure that cache
    (a feature group is ~2 min of audio) and hide the decode term."""
    from inaspeechsegmenter_tpu.online import OnlineSegmenter

    block = 10 * SR
    out = None
    for measured in (False, True):
        online = OnlineSegmenter(seg)
        marks = {}
        pos = 0

        def feed_until_new_group(pos):
            m0 = online.chunks_ready
            while online.chunks_ready == m0 and pos + block <= len(sig):
                online.feed(sig[pos:pos + block])
                pos += block
            # a poll timed without a new group would hit the provisional
            # cache and record ~0 ms as the decode cost — report signal
            # exhaustion instead of silently corrupting the slope
            return pos, online.chunks_ready > m0

        for m in checkpoints_min:
            while pos < m * 60 * SR:
                online.feed(sig[pos:pos + block])
                pos += block
            costs = []
            for _ in range(2):                # 2 group arrivals / mark
                pos, fresh = feed_until_new_group(pos)
                if not fresh:
                    break
                t1 = time.perf_counter()
                online.current()
                costs.append(time.perf_counter() - t1)
            # None = signal too short for this mark (needs ~2 group
            # lengths of headroom past the checkpoint, scaling with
            # ISS_UPLOAD_CHUNKS) — data, not a fake 0 ms decode
            marks[m] = round(1000.0 * max(costs), 1) if costs else None
        # cached poll: a second current() with no new group
        t1 = time.perf_counter()
        online.current()
        cached_ms = round(1000.0 * (time.perf_counter() - t1), 2)
        if measured:
            mins = sorted(m for m in marks if marks[m] is not None)
            slope = ((marks[mins[-1]] - marks[mins[0]])
                     / max(mins[-1] - mins[0], 1)) if len(mins) >= 2 else None
            out = {
                "metric": "online_current_cost_vs_backlog",
                "decode_ms_after_group_by_backlog_min": marks,
                "cached_poll_ms": cached_ms,
                "slope_ms_per_backlog_min": (round(slope, 2)
                                             if slope is not None else None),
            }
    return out


def vfs_cadence(vfs, sig, cadence_s=1):
    """OnlineVFS feed()+current() latency + first provisional score."""
    from inaspeechsegmenter_tpu.online import OnlineVFS

    block = cadence_s * SR
    out = None
    for measured in (False, True):
        online = OnlineVFS(vfs)
        lat, t_first_speech, t_first_score = [], None, None
        t0 = time.perf_counter()
        for i in range(0, len(sig), block):
            t1 = time.perf_counter()
            online.feed(sig[i:i + block])
            score, sdur, n = online.current()
            lat.append(time.perf_counter() - t1)
            if t_first_speech is None and sdur:
                t_first_speech = time.perf_counter() - t0
            if t_first_score is None and score is not None:
                t_first_score = time.perf_counter() - t0
        t1 = time.perf_counter()
        online.finalize()
        t_fin = time.perf_counter() - t1
        if measured:
            p50, p95 = _percentiles(lat)
            out = {
                "metric": f"online_vfs_feed_latency_{cadence_s}s",
                "first_speech_s": (round(t_first_speech, 3)
                                   if t_first_speech else None),
                "first_score_s": (round(t_first_score, 3)
                                  if t_first_score else None),
                "feed_plus_current_ms_p50": p50,
                "feed_plus_current_ms_p95": p95,
                "finalize_s": round(t_fin, 3),
                "audio_seconds": len(sig) // SR,
            }
    return out


def main():
    from inaspeechsegmenter_tpu.utils.cache import enable_compilation_cache
    from inaspeechsegmenter_tpu.utils.env import (apply_platform_env,
                                                  wait_for_device)

    # honor an explicit JAX_PLATFORMS pin over any sitecustomize
    # accelerator hook (see bench.py)
    apply_platform_env()

    if not wait_for_device(float(os.environ.get("ISS_BENCH_LINK_WAIT",
                                                "1800"))):
        print(json.dumps({"metric": "online_latency", "value": 0,
                          "error": "device link stalled"}))
        return
    enable_compilation_cache()
    from inaspeechsegmenter_tpu.models.synthetic import ensure_synthetic_env

    ensure_synthetic_env(size="full")

    from bench import synth_int16
    from inaspeechsegmenter_tpu import Segmenter

    seg = Segmenter(vad_engine="smn", detect_gender=True, ffmpeg=None,
                    allow_download=False)

    seconds = int(os.environ.get("ISS_BENCH_ONLINE_FULL_SECONDS", "180"))
    sig = synth_int16(seconds, seed=7)
    print(json.dumps(seg_cadence(seg, sig, 1)))
    sig10 = synth_int16(4 * seconds, seed=8)
    print(json.dumps(seg_cadence(seg, sig10, 10)))

    # offline cost of the same signal, for the finalize comparison
    t0 = time.perf_counter()
    seg.segment_signal(sig10)
    print(json.dumps({
        "metric": "offline_segment_signal_s",
        "value": round(time.perf_counter() - t0, 3),
        "audio_seconds": len(sig10) // SR,
    }))

    backlog_min = int(os.environ.get("ISS_BENCH_ONLINE_BACKLOG_MIN", "20"))
    marks = (tuple(m for m in (5, 10, 20) if m <= backlog_min)
             or (backlog_min,))  # tiny smoke runs: one checkpoint
    # headroom past the last checkpoint: each mark waits for 2 further
    # feature-group arrivals (~123 s of audio each)
    big = synth_int16(backlog_min * 60 + 360, seed=9)
    print(json.dumps(seg_backlog(seg, big, marks)))

    # OnlineVFS: full ResNet101 x-vector architecture, random init
    from bench_vfs import build_vfs_workload

    vfs_seconds = int(os.environ.get("ISS_BENCH_ONLINE_VFS_SECONDS", "120"))
    vfs, _, _ = build_vfs_workload(8)  # tiny file; we feed signals directly
    os.environ["ISS_XVEC_SPEECH_ONLY"] = "1"
    vsig = synth_int16(vfs_seconds, seed=10)
    print(json.dumps(vfs_cadence(vfs, vsig, 1)))
    t0 = time.perf_counter()
    vfs.score_signal(vsig)
    print(json.dumps({
        "metric": "offline_score_signal_s",
        "value": round(time.perf_counter() - t0, 3),
        "audio_seconds": len(vsig) // SR,
    }))


if __name__ == "__main__":
    main()
