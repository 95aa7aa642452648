"""Bench tooling contracts (the driver artifact's diagnostic fields).

These pin the review findings on the measurement layer: the
upload-codec byte ratio must reflect the REAL per-group upload decisions
(not a whole-file packing the pipeline never performs), and the online
backlog battery must report signal exhaustion as missing data instead of
timing a cached poll and calling it the decode cost.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))


def _mixed_sig(seconds=300, seed=0):
    """Silence + tones + noise so pack_best's three outcomes (bits /
    elide / raw-decline) can all appear across groups."""
    rng = np.random.default_rng(seed)
    n = seconds * 16000
    sig = np.zeros(n, np.float32)
    pos = 0
    while pos < n:
        kind = rng.integers(0, 3)
        end = min(pos + int(rng.uniform(2, 20) * 16000), n)
        t = np.arange(end - pos, dtype=np.float32) / 16000.0
        if kind == 1:
            sig[pos:end] = np.sin(2 * np.pi * 300.0 * t) * 0.3
        elif kind == 2:
            sig[pos:end] = rng.standard_normal(end - pos) * 0.3
        pos = end
    return np.clip(np.rint(sig * 32768.0), -32768, 32767).astype(np.int16)


def test_group_shipped_bytes_mirrors_real_group_loop(monkeypatch):
    """The diagnostic must pack the exact slices `mspec_loge_chunks`
    packs: same bucket padding, same per-group boundaries (lookahead
    included), one accept/decline per group."""
    from inaspeechsegmenter_tpu.dsp import codec, sidekit

    sig = _mixed_sig(300)

    diag_slices = []
    real_slices = []
    orig = codec.pack_best

    def spy_diag(raw, _out=diag_slices):
        _out.append((len(raw), int(np.int64(raw[:64]).sum())))
        return orig(raw)

    # both the helper and the real loop use sidekit's module binding
    # (the once-redundant local import was removed in round 5's advisor
    # pass)
    monkeypatch.setattr(sidekit, "pack_best", spy_diag)
    monkeypatch.setenv("ISS_UPLOAD_CODEC", "1")
    shipped, raw_b = sidekit.group_shipped_bytes(sig)

    # the real loop bound pack_best into the sidekit namespace at import
    def spy_real(raw, _out=real_slices):
        _out.append((len(raw), int(np.int64(raw[:64]).sum())))
        return None          # decline: no device decode work in the test

    monkeypatch.setattr(sidekit, "pack_best", spy_real)
    fe = sidekit.SidekitFrontend()
    fe.mspec_loge_chunks(sig)

    assert diag_slices == real_slices        # identical group slicing
    assert 0 < shipped <= raw_b              # codec can only save bytes
    assert raw_b == 2 * sum(n for n, _ in real_slices)


def test_group_shipped_bytes_codec_off_is_raw(monkeypatch):
    from inaspeechsegmenter_tpu.dsp.sidekit import group_shipped_bytes

    monkeypatch.setenv("ISS_UPLOAD_CODEC", "0")
    shipped, raw_b = group_shipped_bytes(_mixed_sig(60))
    assert shipped == raw_b


@pytest.mark.usefixtures("synthetic_model_dir")
def test_seg_backlog_reports_exhaustion_as_none():
    """A signal too short for a backlog checkpoint must yield None marks
    and a None slope — never a cached ~0 ms poll recorded as the decode
    cost (that silently corrupts the published slope)."""
    from bench_online import seg_backlog

    from inaspeechsegmenter_tpu import Segmenter

    seg = Segmenter(vad_engine="smn", detect_gender=True, ffmpeg=None,
                    allow_download=False)
    sig = _mixed_sig(30, seed=1)             # far below one feature group
    out = seg_backlog(seg, sig, checkpoints_min=(0,))
    assert out["decode_ms_after_group_by_backlog_min"] == {0: None}
    assert out["slope_ms_per_backlog_min"] is None
    assert out["cached_poll_ms"] >= 0.0
