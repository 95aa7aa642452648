"""Overlapped VFS scorer: output-identical to the serial path.

The overlapped pipeline (vfs.py `_score_signal_overlapped`) changes ONLY
the schedule — speculative x-vector extraction behind the VAD upload —
so its result must equal the serial `score_signal` exactly: same blocked
feature programs (dsp/vbx.py VbxPcmStream), same window set via the exact
decoded timeline, catch-up embedding for speculation misses, speculative
extras dropped.
"""

import os

import numpy as np
import pytest


def synth_i16(seconds, seed=5, sr=16000):
    """Broadcast-ish int16 mix (speech-band bursts / tones / silence)."""
    rng = np.random.default_rng(seed)
    n = seconds * sr
    sig = np.zeros(n, np.float32)
    pos = 0
    while pos < n:
        kind = rng.integers(0, 4)
        end = min(pos + int(rng.uniform(0.5, 6.0) * sr), n)
        t = np.arange(end - pos, dtype=np.float32) / sr
        if kind == 1:
            sig[pos:end] = rng.standard_normal(end - pos) * 0.1
        elif kind == 2:
            f0 = rng.uniform(100, 1000)
            sig[pos:end] = sum(np.sin(2 * np.pi * f0 * k * t)
                               for k in range(1, 4)) * 0.1
        elif kind == 3:
            env = 0.5 + 0.5 * np.sin(2 * np.pi * 4 * t)
            sig[pos:end] = rng.standard_normal(end - pos) * 0.15 * env
        pos = end
    return np.clip(np.rint(sig * 32768.0), -32768, 32767).astype(np.int16)


@pytest.fixture(scope="module")
def vfs(synthetic_model_dir):
    from inaspeechsegmenter_tpu import VoiceFemininityScoring
    from inaspeechsegmenter_tpu.models.resnet import ResNetXVector

    net = ResNetXVector("bottleneck", (1, 1, 1, 1), 8, 64, 256)
    return VoiceFemininityScoring(
        gd_model_criteria="vfp", allow_download=False, ffmpeg=None,
        xvector_net=net, xvector_params=net.init_params(seed=7))


def _serial(vfs, sig, monkeypatch, name):
    monkeypatch.setenv("ISS_VFS_OVERLAP", "0")
    try:
        return vfs.score_signal(sig, name)
    finally:
        monkeypatch.setenv("ISS_VFS_OVERLAP", "auto")


@pytest.mark.parametrize("seed", [5, 9])
def test_overlap_equals_serial(vfs, monkeypatch, seed):
    monkeypatch.setenv("ISS_VBX_UPLOAD", "int16")
    sig = synth_i16(100, seed=seed)     # > 2 feature chunks
    assert vfs._overlap_eligible()
    assert vfs._overlap_eligible_signal(sig)
    over = vfs.score_signal(sig, f"t{seed}")
    serial = _serial(vfs, sig, monkeypatch, f"t{seed}")
    assert over == serial


def test_overlap_equals_serial_no_dilation_and_full(vfs, monkeypatch):
    """Both speculation extremes must stay exact: dilate=0 (misses are
    caught up) and a huge dilation (every energy-active window embedded,
    extras dropped)."""
    monkeypatch.setenv("ISS_VBX_UPLOAD", "int16")
    sig = synth_i16(95, seed=11)
    serial = _serial(vfs, sig, monkeypatch, "d")
    for d in ("0", "100000"):
        monkeypatch.setenv("ISS_VFS_PROV_DILATE", d)
        assert vfs.score_signal(sig, "d") == serial


def test_overlap_equals_serial_catchup_only(vfs, monkeypatch):
    """An always-empty provisional mask forces the pure catch-up path —
    still exact (and proves the final set never depends on the mask)."""
    import inaspeechsegmenter_tpu.vfs as vfs_mod

    monkeypatch.setenv("ISS_VBX_UPLOAD", "int16")
    monkeypatch.setenv("ISS_VFS_PROV_DILATE", "0")
    sig = synth_i16(95, seed=13)
    serial = _serial(vfs, sig, monkeypatch, "c")

    real = vfs_mod._prov_step

    def never(pipe, s, cnt, probs_v, loge_c, ratio):
        s, cnt, mask = real(pipe, s, cnt, probs_v, loge_c, ratio)
        return s, cnt, mask & False

    monkeypatch.setattr(vfs_mod, "_prov_step", never)
    assert vfs.score_signal(sig, "c") == serial


def test_overlap_file_call(vfs, monkeypatch, tmp_path):
    """__call__ on a WAV routes through the overlapped path and equals
    the serial file scoring."""
    from inaspeechsegmenter_tpu.audio import write_wav

    monkeypatch.setenv("ISS_VBX_UPLOAD", "int16")
    sig = synth_i16(92, seed=6)
    p = str(tmp_path / "long.wav")
    write_wav(p, sig, 16000)
    over = vfs(p)
    monkeypatch.setenv("ISS_VFS_OVERLAP", "0")
    serial = vfs(p)
    assert over == serial


def test_overlap_silence(vfs, monkeypatch):
    """No speech -> (None, 0-ish, 0), same as serial."""
    monkeypatch.setenv("ISS_VBX_UPLOAD", "int16")
    sig = np.zeros(16000 * 90, np.int16)
    over = vfs.score_signal(sig, "s")
    serial = _serial(vfs, sig, monkeypatch, "s")
    assert over == serial


def test_short_signals_fall_back(vfs, monkeypatch):
    """Signals below the streaming threshold take the serial path (the
    overlap gate) — result equality is trivial but the route must not
    crash on the boundary."""
    monkeypatch.setenv("ISS_VBX_UPLOAD", "int16")
    sig = synth_i16(10, seed=3)
    assert not vfs._overlap_eligible_signal(sig)
    assert vfs.score_signal(sig, "short") == _serial(vfs, sig, monkeypatch,
                                                     "short")


# ---------------------------------------------------------------------------
# OnlineVFS on the incremental device feature stream (int16 mode)
# ---------------------------------------------------------------------------

def test_online_vfs_stream_finalize_equals_score_signal(vfs, monkeypatch):
    """int16 live stream: incremental blocks + cached embeddings, finalize
    reassembles the EXACT offline result (and equals the overlapped and
    serial scorers, which equal each other)."""
    from inaspeechsegmenter_tpu.online import OnlineVFS

    monkeypatch.setenv("ISS_VBX_UPLOAD", "int16")
    sig = synth_i16(100, seed=5)
    online = OnlineVFS(vfs, basename="live")
    block = 16000 * 3
    for pos in range(0, len(sig), block):
        online.feed(sig[pos: pos + block])
        if (pos // block) % 5 == 0:
            online.current()
    assert online._use_stream
    assert online._parts == []          # raw PCM dropped: bounded memory
    got = online.finalize()
    want = vfs.score_signal(sig, "live")
    assert got == want


def test_online_vfs_stream_reuses_embeddings(vfs, monkeypatch):
    """finalize() must NOT re-embed windows the live loop already
    embedded: only the misses go through the catch-up batch."""
    from inaspeechsegmenter_tpu.online import OnlineVFS

    monkeypatch.setenv("ISS_VBX_UPLOAD", "int16")
    monkeypatch.setenv("ISS_ONLINE_VFS_BATCH", "8")
    sig = synth_i16(100, seed=13)
    online = OnlineVFS(vfs, basename="live")
    block = 16000 * 2
    for pos in range(0, len(sig), block):
        online.feed(sig[pos: pos + block])
        online.current()
    cached = {s for s, e in online._emb.items() if e is not None}
    calls = []
    xm = vfs.xvector_model
    real = xm.embeddings_from_features

    def spy(fea, starts):
        calls.append(list(np.asarray(starts)))
        return real(fea, starts)

    monkeypatch.setattr(xm, "embeddings_from_features", spy)
    got = online.finalize()
    for batch in calls:
        assert not (set(batch) & cached), "re-embedded a cached window"
    monkeypatch.setattr(xm, "embeddings_from_features", real)
    assert got == vfs.score_signal(sig, "live")


def test_online_vfs_float_stream_keeps_fallback(vfs, monkeypatch):
    """Float feeds stay on the buffered-prefix path and finalize exactly."""
    from inaspeechsegmenter_tpu.online import OnlineVFS

    monkeypatch.setenv("ISS_VBX_UPLOAD", "int16")
    sig = (synth_i16(70, seed=9).astype(np.float32) / 32768.0)
    online = OnlineVFS(vfs, basename="fl")
    block = 16000 * 4
    for pos in range(0, len(sig), block):
        online.feed(sig[pos: pos + block])
        online.current()
    assert not online._use_stream
    assert online.finalize() == vfs.score_signal(sig, "fl")


def test_online_vfs_stream_tiny_total(vfs, monkeypatch):
    """A stream that ends below one analysis window falls back to the
    offline error contract (raw prefix retained for exactly this case)."""
    from inaspeechsegmenter_tpu.online import OnlineVFS

    monkeypatch.setenv("ISS_VBX_UPLOAD", "int16")
    online = OnlineVFS(vfs, basename="tiny")
    online.feed(np.zeros(300, np.int16))
    import pytest as _pytest
    with _pytest.raises(ValueError, match="too short"):
        online.finalize()
