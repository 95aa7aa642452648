"""OnlineSegmenter: incremental feeding converges EXACTLY to the offline
result at finalize(), provisional decodes are well-formed, and memory is
bounded (raw PCM dropped once feature groups are computed)."""

import numpy as np
import pytest

from inaspeechsegmenter_tpu import OnlineSegmenter


@pytest.fixture(scope="module")
def seg(synthetic_model_dir):
    from inaspeechsegmenter_tpu import Segmenter

    return Segmenter(vad_engine="smn", detect_gender=True, ffmpeg=None,
                     allow_download=False)


def _broadcastish(n, seed, dtype=np.int16):
    rng = np.random.default_rng(seed)
    sig = rng.standard_normal(n).astype(np.float32) * 0.1
    sig[: n // 6] = 0.0                         # leading silence
    sig[n // 2: n // 2 + n // 8] = 0.0          # mid silence (elidable)
    if dtype == np.int16:
        return np.clip(np.rint(sig * 32768.0), -32768, 32767).astype(np.int16)
    return sig


def _check_tiling(lseg, start=0.0):
    assert lseg, "empty provisional lseg"
    assert lseg[0][1] == start
    for (l1, s1, e1), (l2, s2, e2) in zip(lseg[:-1], lseg[1:]):
        assert e1 == s2 and l1 != l2


@pytest.mark.parametrize("dtype", [np.int16, np.float32])
def test_finalize_equals_offline(seg, dtype):
    """Feed in ragged pieces -> finalize() == segment_signal(whole)."""
    from inaspeechsegmenter_tpu.dsp.sidekit import CHUNK, HOP

    n = int(3.4 * CHUNK * HOP)                  # 3.4 chunks (~2.3 min)
    sig = _broadcastish(n, seed=1, dtype=dtype)
    online = OnlineSegmenter(seg)
    rng = np.random.default_rng(2)
    pos = 0
    while pos < n:
        step = int(rng.uniform(0.3, 2.9) * 16000)
        online.feed(sig[pos: pos + step])
        pos += step
    got = online.finalize()
    want = seg.segment_signal(sig)
    assert got == want
    assert online.finalize() == want            # idempotent


def test_finalize_short_media_equals_offline(seg):
    """Sub-chunk input routes through the same fused short-media path."""
    sig = _broadcastish(16000 * 5, seed=3)      # 5 s, far below one chunk
    online = OnlineSegmenter(seg)
    online.feed(sig[: 16000 * 2]).feed(sig[16000 * 2:])
    assert online.finalize() == seg.segment_signal(sig)


def test_current_provisional_and_memory_bound(seg):
    """current() yields a well-formed tiling at every stage; raw PCM is
    dropped once its feature group is computed (bounded memory)."""
    from inaspeechsegmenter_tpu.dsp.sidekit import CHUNK, HOP

    n = int(6.2 * CHUNK * HOP)
    sig = _broadcastish(n, seed=4)
    online = OnlineSegmenter(seg)
    piece = CHUNK * HOP                         # one chunk per feed
    saw_streaming_provisional = False
    for pos in range(0, n, piece):
        online.feed(sig[pos: pos + piece])
        lseg = online.current()
        _check_tiling(lseg)
        if len(online._mels) >= 2:
            saw_streaming_provisional = True
            # buffer holds at most the not-yet-computed suffix + lookahead
            assert online.buffered_samples <= (online._group + 1) * piece
    assert saw_streaming_provisional
    assert online._consumed > 0                 # raw prefix was dropped
    assert online.finalize() == seg.segment_signal(sig)


def test_start_sec_offset(seg):
    from inaspeechsegmenter_tpu.dsp.sidekit import CHUNK, HOP

    sig = _broadcastish(int(2.5 * CHUNK * HOP), seed=5)
    online = OnlineSegmenter(seg, start_sec=7.5)
    online.feed(sig)
    got = online.finalize()
    assert got == seg.segment_signal(sig, start_sec=7.5)
    assert got[0][1] == 7.5


def test_feed_dtype_change_rejected(seg):
    online = OnlineSegmenter(seg)
    online.feed(np.zeros(1000, np.int16))
    with pytest.raises(TypeError, match="dtype"):
        online.feed(np.zeros(1000, np.float32))


def test_feed_after_finalize_rejected(seg):
    online = OnlineSegmenter(seg)
    online.feed(_broadcastish(16000 * 3, seed=6))
    online.finalize()
    with pytest.raises(RuntimeError):
        online.feed(np.zeros(100, np.int16))


def test_tiny_first_feeds_do_not_crash(seg):
    """The documented live loop starts with small capture callbacks: under
    one 25 ms analysis window current() returns [] instead of raising."""
    online = OnlineSegmenter(seg)
    online.feed(np.zeros(256, np.int16))
    assert online.current() == []
    online.feed(np.zeros(100, np.int16))
    assert online.current() == []


def test_streaming_kill_switch_passthrough(seg, monkeypatch):
    """ISS_STREAMING=0 (the documented switch disabling the streaming
    chunk programs) turns the online object into a buffering passthrough
    to the fused offline path — same result, no chunk programs."""
    from inaspeechsegmenter_tpu.dsp.sidekit import CHUNK, HOP

    monkeypatch.setenv("ISS_STREAMING", "0")
    sig = _broadcastish(int(2.4 * CHUNK * HOP), seed=8)
    online = OnlineSegmenter(seg)
    # the flag disables the streaming DECODE: neither run_streaming nor
    # the shared stream_decode may run (feature chunking is used by the
    # fused path too and stays)
    monkeypatch.setattr(
        seg.pipeline, "run_streaming",
        lambda *a, **k: (_ for _ in ()).throw(AssertionError("streamed")))
    monkeypatch.setattr(
        seg.pipeline, "stream_decode",
        lambda *a, **k: (_ for _ in ()).throw(AssertionError("streamed")))
    for pos in range(0, len(sig), 16000 * 30):
        online.feed(sig[pos: pos + 16000 * 30])
    got = online.finalize()
    assert got == seg.segment_signal(sig)


def test_stream_gender_speculative_equals_offline(seg, monkeypatch):
    """ISS_STREAM_GENDER=1: online finalize computes per-chunk gender
    emissions like offline run_streaming and still equals the offline
    result under the same flag."""
    from inaspeechsegmenter_tpu.dsp.sidekit import CHUNK, HOP

    monkeypatch.setenv("ISS_STREAM_GENDER", "1")
    sig = _broadcastish(int(3.1 * CHUNK * HOP), seed=9)
    online = OnlineSegmenter(seg)
    for pos in range(0, len(sig), CHUNK * HOP):
        online.feed(sig[pos: pos + CHUNK * HOP])
    got = online.finalize()
    assert got == seg.segment_signal(sig)


def test_current_poll_reuses_provisional_emission(seg):
    """Polling current() between chunk arrivals must not dispatch new CNN
    work: the zero-right-halo emission is cached per mel count."""
    from inaspeechsegmenter_tpu.dsp.sidekit import CHUNK, HOP

    sig = _broadcastish(int(3.4 * CHUNK * HOP), seed=10)
    online = OnlineSegmenter(seg)
    online.feed(sig)
    first = online.current()
    calls = []
    pipe = seg.pipeline
    real = pipe._jit_vad_chunk
    pipe._jit_vad_chunk = lambda *a, **k: (calls.append(1), real(*a, **k))[1]
    try:
        again = online.current()
    finally:
        pipe._jit_vad_chunk = real
    assert again == first and calls == []


@pytest.mark.parametrize("seed", [21, 22, 23])
def test_finalize_equals_offline_random_blocks(seg, seed):
    """Property soak over the feed/materialize boundary arithmetic: feeds
    of RANDOM sizes (1 sample .. 2.5 s, including zero-length) with
    interleaved polls must still finalize bit-identically to offline."""
    from inaspeechsegmenter_tpu.dsp.sidekit import CHUNK, HOP

    rng = np.random.default_rng(seed)
    n = int((2.1 + rng.uniform(0, 2.2)) * CHUNK * HOP)
    sig = _broadcastish(n, seed=seed)
    online = OnlineSegmenter(seg)
    pos = 0
    while pos < n:
        size = int(rng.choice([1, 7, 160, 1601, 16000, 40000,
                               rng.integers(1, 40000)]))
        online.feed(sig[pos: pos + size])
        pos += size
        if rng.uniform() < 0.1:
            online.feed(sig[pos:pos])          # zero-length feed
            online.current()
    assert online.finalize() == seg.segment_signal(sig)


def test_feed_copies_caller_buffer(seg):
    """feed() must copy: capture callbacks reuse their buffer — the old
    concatenate-per-feed copied implicitly; the O(block) append must too."""
    online = OnlineSegmenter(seg)
    buf = np.full(1600, 100, np.int16)
    online.feed(buf)
    buf[:] = -100                               # caller reuses the buffer
    online.feed(buf)
    sig = online._materialize()
    assert (sig[:1600] == 100).all() and (sig[1600:] == -100).all()


def test_current_poll_reuses_decode(seg):
    """Steady-state polls must not re-dispatch the whole-timeline Viterbi:
    between feature-group completions the decode inputs (m chunks, capped
    frame count) are unchanged, so the provisional result is cached.  A
    caller mutating the returned list must not corrupt the cache, and a
    feed that completes a NEW group must refresh the result."""
    from inaspeechsegmenter_tpu.dsp.sidekit import CHUNK, HOP

    sig = _broadcastish(int(3.4 * CHUNK * HOP), seed=11)
    online = OnlineSegmenter(seg)
    online.feed(sig)
    first = online.current()
    calls = []
    pipe = seg.pipeline
    real = pipe.stream_decode
    pipe.stream_decode = lambda *a, **k: (calls.append(1), real(*a, **k))[1]
    try:
        again = online.current()                  # no new data
        assert again == first and calls == []
        again[0] = ("mutated", -1.0, -1.0)        # caller-side mutation
        assert online.current() == first and calls == []
        online.feed(_broadcastish(100, seed=12))  # < 1 frame of new audio
        assert online.current() == first and calls == []
        # complete the next feature group: decode must run exactly once
        more = _broadcastish(int(3.2 * CHUNK * HOP), seed=13)
        online.feed(more)
        refreshed = online.current()
        assert calls == [1]
        assert online.current() == refreshed and calls == [1]
    finally:
        pipe.stream_decode = real


def _growing_wav_writer(path, sig, piece, delay):
    """Write a canonical WAV header with a BOGUS (unpatched) data size,
    then append samples in pieces — like a recorder writing to disk."""
    import struct
    import threading
    import time

    fmt = struct.pack("<HHIIHH", 1, 1, 16000, 32000, 2, 16)
    header = (b"RIFF" + struct.pack("<I", 0xFFFFFFFF) + b"WAVE"
              + b"fmt " + struct.pack("<I", len(fmt)) + fmt
              + b"data" + struct.pack("<I", 0xFFFFFFFF))

    def run():
        with open(path, "wb") as f:
            f.write(header[:16])                 # header lands in two steps
            f.flush()
            time.sleep(delay)
            f.write(header[16:])
            f.flush()
            for pos in range(0, len(sig), piece):
                time.sleep(delay)
                f.write(sig[pos: pos + piece].astype("<i2").tobytes())
                f.flush()

    th = threading.Thread(target=run, daemon=True)
    th.start()
    return th


def test_follow_wav_equals_offline(seg, tmp_path):
    """follow_wav tails a recorder-in-progress (bogus header sizes,
    incremental appends) and finalizes to the exact offline labels."""
    from inaspeechsegmenter_tpu.online import follow_wav

    sig = _broadcastish(16000 * 30, seed=11)     # 30 s, sub-chunk
    p = str(tmp_path / "grow.wav")
    th = _growing_wav_writer(p, sig, piece=16000 * 5, delay=0.15)
    updates = []
    got = follow_wav(p, seg, idle_timeout=2.0, poll=0.1,
                     on_update=lambda o: updates.append(o._total))
    th.join(timeout=10)
    assert got == seg.segment_signal(sig)
    assert len(updates) >= 2 and updates == sorted(updates)


def test_follow_wav_rejects_wrong_format(seg, tmp_path):
    import struct

    from inaspeechsegmenter_tpu.audio.wav import WavFormatError
    from inaspeechsegmenter_tpu.online import follow_wav

    fmt = struct.pack("<HHIIHH", 1, 2, 44100, 176400, 4, 16)  # stereo 44k
    p = tmp_path / "bad.wav"
    p.write_bytes(b"RIFF" + struct.pack("<I", 100) + b"WAVE"
                  + b"fmt " + struct.pack("<I", len(fmt)) + fmt
                  + b"data" + struct.pack("<I", 0) + b"\x00" * 64)
    with pytest.raises(WavFormatError, match="PCM16 mono 16 kHz"):
        follow_wav(str(p), seg, idle_timeout=1.0, poll=0.05)


def test_cli_follow(seg, synthetic_model_dir, tmp_path, capsys):
    """CLI --follow drives follow_wav end to end and exports the csv."""
    from inaspeechsegmenter_tpu.cli.segment import main

    sig = _broadcastish(16000 * 20, seed=12)
    p = str(tmp_path / "live.wav")
    out = tmp_path / "out"
    out.mkdir()
    # the writer may not have created the file when main() starts —
    # --follow accepts a not-yet-existing recording by design
    th = _growing_wav_writer(p, sig, piece=16000 * 10, delay=0.1)
    main(["-i", p, "-o", str(out), "-b", "none",
          "--follow", "--follow_idle", "2"])
    th.join(timeout=10)
    assert "finalized" in capsys.readouterr().out
    want = tmp_path / "want.csv"
    from inaspeechsegmenter_tpu.export import seg2csv

    seg2csv(seg.segment_signal(sig), str(want))
    assert (out / "live.csv").read_text() == want.read_text()


@pytest.mark.parametrize("vad_engine,gender", [("sm", True), ("smn", False)])
def test_finalize_equals_offline_engine_variants(synthetic_model_dir,
                                                 vad_engine, gender):
    """Exact offline equality holds for the sm engine and with gender
    detection off (different label sets / tail programs)."""
    from inaspeechsegmenter_tpu import Segmenter
    from inaspeechsegmenter_tpu.dsp.sidekit import CHUNK, HOP

    s = Segmenter(vad_engine=vad_engine, detect_gender=gender, ffmpeg=None,
                  allow_download=False)
    sig = _broadcastish(int(2.6 * CHUNK * HOP), seed=13)
    online = OnlineSegmenter(s)
    for pos in range(0, len(sig), 16000 * 20):
        online.feed(sig[pos: pos + 16000 * 20])
    assert online.finalize() == s.segment_signal(sig)


def test_follow_no_audio_times_out_cleanly(seg, tmp_path):
    """Idle timeout with zero audio raises a clear TimeoutError (never a
    deep-stack 'media too short' from finalizing an empty stream) — both
    for a file that never appears and for a header-only file."""
    from inaspeechsegmenter_tpu.online import follow_wav

    with pytest.raises(TimeoutError, match="never appeared"):
        follow_wav(str(tmp_path / "ghost.wav"), seg,
                   idle_timeout=0.5, poll=0.05)
    import struct

    fmt = struct.pack("<HHIIHH", 1, 1, 16000, 32000, 2, 16)
    p = tmp_path / "headeronly.wav"
    p.write_bytes(b"RIFF" + struct.pack("<I", 0xFFFFFFFF) + b"WAVE"
                  + b"fmt " + struct.pack("<I", len(fmt)) + fmt
                  + b"data" + struct.pack("<I", 0xFFFFFFFF))
    with pytest.raises(TimeoutError, match="no data payload"):
        follow_wav(str(p), seg, idle_timeout=0.5, poll=0.05)


def test_follow_extensible_wav_accepted(seg, tmp_path):
    """WAVE_FORMAT_EXTENSIBLE wrapping canonical PCM16 mono 16 kHz (WASAPI
    recorders) is followed like the offline reader reads it."""
    import struct

    from inaspeechsegmenter_tpu.online import follow_wav

    sig = _broadcastish(16000 * 4, seed=14)
    sub = struct.pack("<H", 1) + b"\x00" * 14        # SubFormat GUID: PCM
    fmt = (struct.pack("<HHIIHH", 0xFFFE, 1, 16000, 32000, 2, 16)
           + struct.pack("<HHI", 22, 16, 1) + sub)
    p = tmp_path / "ext.wav"
    p.write_bytes(b"RIFF" + struct.pack("<I", 0xFFFFFFFF) + b"WAVE"
                  + b"fmt " + struct.pack("<I", len(fmt)) + fmt
                  + b"data" + struct.pack("<I", 0xFFFFFFFF)
                  + sig.astype("<i2").tobytes())
    got = follow_wav(str(p), seg, idle_timeout=0.5, poll=0.05)
    assert got == seg.segment_signal(sig)


def test_follow_backlog_reads_are_bounded(seg, tmp_path, monkeypatch):
    """Attaching to an already-long file drains the backlog in bounded
    per-group reads, not one whole-file blob."""
    from inaspeechsegmenter_tpu.dsp.sidekit import CHUNK, HOP
    from inaspeechsegmenter_tpu.online import follow_wav

    import struct

    sig = _broadcastish(int(4.2 * CHUNK * HOP), seed=15)
    fmt = struct.pack("<HHIIHH", 1, 1, 16000, 32000, 2, 16)
    p = tmp_path / "backlog.wav"
    p.write_bytes(b"RIFF" + struct.pack("<I", 0xFFFFFFFF) + b"WAVE"
                  + b"fmt " + struct.pack("<I", len(fmt)) + fmt
                  + b"data" + struct.pack("<I", 0xFFFFFFFF)
                  + sig.astype("<i2").tobytes())
    fed = []
    got = follow_wav(str(p), seg, idle_timeout=0.5, poll=0.05,
                     on_update=lambda o: fed.append(o._total))
    max_batch = (3 * CHUNK + 2) * HOP       # one default upload group
    steps = np.diff([0] + fed)
    assert (steps <= max_batch).all() and len(fed) >= 2
    assert got == seg.segment_signal(sig)


def test_follow_wav_ignores_trailing_metadata(seg, tmp_path):
    """The normal recorder close sequence — back-patch the RIFF/data
    sizes, then a tagger appends LIST/id3 chunks AFTER the data payload —
    must not leak metadata bytes into the stream as int16 audio: the
    finalized labels equal the offline read of the samples alone (the
    offline `audio.wav.read_wav` reads exactly the declared data size)."""
    import struct

    from inaspeechsegmenter_tpu.audio import write_wav
    from inaspeechsegmenter_tpu.online import follow_wav

    sig = _broadcastish(16000 * 8, seed=21)
    p = str(tmp_path / "tagged.wav")
    write_wav(p, sig, 16000)                     # correct declared sizes
    with open(p, "ab") as f:                     # tagger appends INFO junk
        junk = b"\x7f\x01" * 4000                # loud if misread as PCM
        f.write(b"LIST" + struct.pack("<I", len(junk) + 4) + b"INFO" + junk)
    got = follow_wav(p, seg, idle_timeout=1.0, poll=0.05)
    assert got == seg.segment_signal(sig)


def test_follow_wav_metadata_after_growth(seg, tmp_path):
    """Growth phase with bogus header sizes, then the close sequence
    (size back-patch + trailing tag chunk) while follow is live."""
    import struct
    import threading
    import time

    from inaspeechsegmenter_tpu.online import follow_wav

    sig = _broadcastish(16000 * 10, seed=22)
    p = str(tmp_path / "grow_tag.wav")
    fmt = struct.pack("<HHIIHH", 1, 1, 16000, 32000, 2, 16)
    header = (b"RIFF" + struct.pack("<I", 0xFFFFFFFF) + b"WAVE"
              + b"fmt " + struct.pack("<I", len(fmt)) + fmt
              + b"data" + struct.pack("<I", 0xFFFFFFFF))

    def run():
        with open(p, "wb") as f:
            f.write(header)
            f.flush()
            for pos in range(0, len(sig), 16000 * 2):
                time.sleep(0.1)
                f.write(sig[pos: pos + 16000 * 2].astype("<i2").tobytes())
                f.flush()
            # close sequence: patch data size, then append a tag chunk
            f.seek(len(header) - 4)
            f.write(struct.pack("<I", 2 * len(sig)))
            f.seek(0, 2)
            junk = b"\x7f\x01" * 2000
            f.write(b"LIST" + struct.pack("<I", len(junk) + 4)
                    + b"INFO" + junk)

    th = threading.Thread(target=run, daemon=True)
    th.start()
    got = follow_wav(p, seg, idle_timeout=1.5, poll=0.05)
    th.join(timeout=10)
    assert got == seg.segment_signal(sig)


def test_follow_wav_fixed_placeholder_size(seg, tmp_path):
    """A recorder that writes a small FIXED placeholder data size (not
    0/0xFFFFFFFF) and only back-patches on close must not stall live
    feeding at the placeholder bound: once the payload grows past it the
    bytes there are raw PCM (no chunk id), so the EOF bound applies
    (online._data_end).  After the close back-patch + tag append, the
    finalized labels equal the offline read of the samples alone."""
    import struct
    import threading
    import time

    from inaspeechsegmenter_tpu.online import follow_wav

    sig = _broadcastish(16000 * 10, seed=23)
    placeholder = 16000  # 0.5 s of int16 — tiny vs the real payload
    p = str(tmp_path / "placeholder.wav")
    fmt = struct.pack("<HHIIHH", 1, 1, 16000, 32000, 2, 16)
    header = (b"RIFF" + struct.pack("<I", 0xFFFFFFFF) + b"WAVE"
              + b"fmt " + struct.pack("<I", len(fmt)) + fmt
              + b"data" + struct.pack("<I", placeholder))

    progressed = []

    def run():
        with open(p, "wb") as f:
            f.write(header)
            f.flush()
            for pos in range(0, len(sig), 16000 * 2):
                time.sleep(0.1)
                f.write(sig[pos: pos + 16000 * 2].astype("<i2").tobytes())
                f.flush()
            # close: back-patch the true size, then a tagger appends
            f.seek(len(header) - 4)
            f.write(struct.pack("<I", 2 * len(sig)))
            f.seek(0, 2)
            junk = b"\x7f\x01" * 2000
            f.write(b"LIST" + struct.pack("<I", len(junk) + 4)
                    + b"INFO" + junk)

    th = threading.Thread(target=run, daemon=True)
    th.start()
    got = follow_wav(p, seg, idle_timeout=1.5, poll=0.05,
                     on_update=lambda o: progressed.append(
                         (time.monotonic(), o._total)))
    th.join(timeout=10)
    assert got == seg.segment_signal(sig)
    # live feeding progressed past the placeholder bound well BEFORE the
    # close-time back-patch (~5 s in): the stream did not stall
    early = [t for t, total in progressed if total > placeholder // 2]
    assert early and early[0] < progressed[0][0] + 3.0


# ---------------------------------------------------------------------------
# Committed-prefix provisional decode (round 5): current() re-decodes only
# the uncommitted suffix once a silence boundary commits, finalize() stays
# bit-exact, and the per-poll decode work is O(suffix), not O(stream).
# ---------------------------------------------------------------------------

def _silence_boundary_signal(chunks, seed=21):
    """~`chunks` feature chunks of noise with guaranteed digital silence
    straddling every chunk boundary (so commit opportunities exist)."""
    from inaspeechsegmenter_tpu.dsp.sidekit import CHUNK, HOP

    n = (chunks * CHUNK + 2) * HOP
    rng = np.random.default_rng(seed)
    sig = (rng.standard_normal(n) * 3000).astype(np.int16)
    for b in range(1, chunks):
        c = b * CHUNK * HOP
        sig[c - 4 * 16000: c + 4 * 16000] = 0     # 8 s of silence
    return sig


def test_commit_advances_and_finalize_exact(seg):
    sig = _silence_boundary_signal(3)
    online = OnlineSegmenter(seg)
    block = 5 * 16000
    for pos in range(0, len(sig), block):
        online.feed(sig[pos: pos + block])
        online.current()
    assert online._commit >= 1, "no commit despite silence boundaries"
    assert len(online._committed_ids) == online._commit * 2048
    final = online.finalize()
    offline = seg.segment_signal(sig)
    assert final == offline


def test_commit_suffix_decode_equals_full(seg):
    """With a noEnergy-committed seam, the suffix decode must agree with
    the full provisional decode frame-for-frame (the seam argument: VAD /
    gender Viterbi segments never cross a silence boundary, the energy
    Viterbi state is pinned by the long agreeing run)."""
    from inaspeechsegmenter_tpu.dsp.sidekit import frame_count, CHUNK

    sig = _silence_boundary_signal(3, seed=33)
    online = OnlineSegmenter(seg)
    block = 7 * 16000
    for pos in range(0, len(sig), block):
        online.feed(sig[pos: pos + block])
        if pos // block % 3 == 0:
            online.current()
    online.current()
    assert online._commit >= 1
    m = len(online._mels)
    n = min(frame_count(online._total), m * CHUNK)
    suffix = online._decode_provisional(n)
    probs = [online._chunk_probs(c) for c in range(m - 1)]
    probs.append(online._chunk_probs(m - 1, zero_right=True))
    full = online._decode(online._mels, probs, n)
    np.testing.assert_array_equal(suffix, full)


def test_commit_decode_is_suffix_sized(seg, monkeypatch):
    """After a commit, the stream_decode call for a new poll must see only
    the uncommitted chunks — the O(total-timeline) re-decode is gone."""
    sig = _silence_boundary_signal(6, seed=5)
    online = OnlineSegmenter(seg)
    block = 6 * 16000
    seen = []
    real = seg.pipeline.stream_decode

    def spy(vp, gp, chunks, pv, pg, *a, **kw):
        seen.append(len(chunks))
        return real(vp, gp, chunks, pv, pg, *a, **kw)

    monkeypatch.setattr(seg.pipeline, "stream_decode", spy)
    two_groups = len(sig) * 4 // 6          # one complete 3-chunk group
    for pos in range(0, two_groups, block):
        online.feed(sig[pos: pos + block])
        online.current()
    assert online._commit >= 1
    c_before = online._commit
    for pos in range(two_groups, len(sig), block):
        online.feed(sig[pos: pos + block])
    online.current()
    m = len(online._mels)
    # the fresh poll decoded exactly the uncommitted suffix, not the
    # whole timeline
    assert seen[-1] == m - c_before < m


def test_force_commit_on_unbroken_audio(seg):
    """A stream with no silence for COMMIT_MAXBACK chunks force-commits at
    the horizon (bounded decode regardless of content); finalize stays
    exact."""
    from inaspeechsegmenter_tpu.dsp.sidekit import CHUNK, HOP

    rng = np.random.default_rng(7)
    n = (4 * CHUNK + 2) * HOP
    sig = (rng.standard_normal(n) * 3000).astype(np.int16)  # never silent
    online = OnlineSegmenter(seg)
    online.COMMIT_MAXBACK = 2
    block = 10 * 16000
    for pos in range(0, len(sig), block):
        online.feed(sig[pos: pos + block])
        online.current()
    assert online._commit >= 1
    assert online.finalize() == seg.segment_signal(sig)
