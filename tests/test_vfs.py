"""Voice Femininity Scoring: timeline logic units + end-to-end with
synthetic weights (reference vbx_segmenter.py:28-202 semantics)."""

import numpy as np
import pytest

from inaspeechsegmenter_tpu.annotations import SpeechTimeline
from inaspeechsegmenter_tpu.vfs import (add_needed_vectors,
                                        get_femininity_score)


@pytest.mark.smoke
def test_timeline_basic():
    tl = SpeechTimeline([(1.0, 2.0), (3.0, 5.0)])
    assert tl.total_duration() == 3.0
    assert tl.contains_point(1.5)
    assert not tl.contains_point(1.0)   # strict inequality like the reference
    assert not tl.contains_point(2.5)
    assert tl.overlap_duration(0.0, 10.0) == 3.0
    assert tl.overlap_duration(1.5, 3.5) == pytest.approx(1.0)
    assert tl.overlap_duration(2.1, 2.9) == 0.0


def test_timeline_from_vad():
    vad = [("noEnergy", 0, 1), ("speech", 1, 3), ("music", 3, 4),
           ("speech", 4, 6)]
    tl = SpeechTimeline.from_vad(vad)
    assert len(tl) == 2
    assert tl.total_duration() == 4.0


def test_timeline_vs_bruteforce(rng):
    bounds = np.sort(rng.uniform(0, 100, 40))
    intervals = [(bounds[i], bounds[i + 1]) for i in range(0, 40, 4)]
    tl = SpeechTimeline(intervals)
    grid = np.linspace(0, 100, 5000)
    for a, b in [(0, 100), (10, 30), (55.5, 56.5), (99, 100)]:
        brute = sum(max(0.0, min(e, b) - max(s, a)) for s, e in intervals)
        assert tl.overlap_duration(a, b) == pytest.approx(brute, abs=1e-9)
    for m in grid[::37]:
        brute = any(s < m < e for s, e in intervals)
        assert tl.contains_point(m) == brute


@pytest.mark.smoke
def test_add_needed_vectors():
    # 10 windows total, only 2 kept -> back-fill to round(0.5*10)=5
    kept = [(f"k{i}", (i, i + 1), np.ones(4)) for i in range(2)]
    t_mid = [(0.1 * i, f"k{i}", (i, i + 1), np.ones(4)) for i in range(10)]
    out = add_needed_vectors(list(kept), t_mid)
    assert len(out) == 5
    # reference skips the first len(kept) sorted entries (assumed already
    # kept) and back-fills the next-best ones (vbx_segmenter.py:50)
    assert {k for k, _, _ in out[2:]} == {"k7", "k6", "k5"}


@pytest.mark.smoke
def test_femininity_score():
    preds = [(0, 1, 0.9), (1, 2, 0.4), (2, 3, 0.5), (3, 4, 0.1)]
    assert get_femininity_score(preds) == 0.5


@pytest.fixture(scope="module")
def vfs(synthetic_model_dir):
    from inaspeechsegmenter_tpu import VoiceFemininityScoring
    from inaspeechsegmenter_tpu.models.resnet import ResNetXVector

    net = ResNetXVector("bottleneck", (1, 1, 1, 1), 8, 64, 256)
    return VoiceFemininityScoring(
        gd_model_criteria="vfp", allow_download=False, ffmpeg=None,
        xvector_net=net, xvector_params=net.init_params(seed=7))


@pytest.mark.smoke
def test_vfs_end_to_end(vfs, media_dir):
    score, speech_dur, n = vfs(f"{media_dir}/lamartine.wav")
    if speech_dur == 0:
        # synthetic VAD CNN may classify everything as music/noise
        assert score is None and n == 0
    else:
        assert 0.0 <= score <= 1.0
        assert n > 0
        assert speech_dur > 0


def test_vfs_injected_vad_callable(vfs, media_dir):
    """Reference duck-type contract (vbx_segmenter.py:164): `vad` is
    called with the PATH, so a plain callable can replace the Segmenter
    (how the strict shared-VAD oracle test pins both frameworks to one
    timeline).  Must not require Segmenter-only surface like
    segment_signal."""
    calls = []

    def fake_vad(p):
        calls.append(p)
        return [("speech", 0.0, 8.0), ("noEnergy", 8.0, 15.0)]

    old = vfs.vad
    vfs.vad = fake_vad
    try:
        score, speech_dur, n = vfs(f"{media_dir}/lamartine.wav")
    finally:
        vfs.vad = old
    assert calls and calls[0].endswith("lamartine.wav")
    assert abs(speech_dur - 8.0) < 1e-9
    assert n > 0 and 0.0 <= score <= 1.0


def test_vfs_injected_extractor_callable(vfs, media_dir):
    """Reference duck-type contract (vbx_segmenter.py:182): the x-vector
    extractor is called with exactly (basename, features, duration) — a
    reference-style 3-arg callable must keep working even though ours
    takes an extra speech-only `timeline` kwarg."""
    def fake_extractor(basename, fea, duration):
        return [(f"{basename}_w0", (0.0, 1.44), np.ones(4, np.float32)),
                (f"{basename}_w1", (0.24, 1.68), np.ones(4, np.float32))]

    def fake_mlp(x):
        return np.full((len(x), 1), 0.9, np.float32)

    old_x, old_mlp, old_vad = (vfs.xvector_model,
                               vfs.gender_detection_mlp_model, vfs.vad)
    vfs.xvector_model = fake_extractor
    vfs.gender_detection_mlp_model = fake_mlp
    vfs.vad = lambda p: [("speech", 0.0, 15.0)]
    try:
        score, speech_dur, n = vfs(f"{media_dir}/lamartine.wav")
    finally:
        vfs.xvector_model, vfs.gender_detection_mlp_model, vfs.vad = (
            old_x, old_mlp, old_vad)
    assert n == 2 and score == 1.0


def test_vfs_silence(vfs, media_dir):
    """Silence has no speech -> (None, 0, 0), weight-independent."""
    score, speech_dur, n = vfs(f"{media_dir}/silence2sec.wav")
    assert score is None
    assert speech_dur == 0
    assert n == 0


def test_window_layout(vfs, media_dir):
    """x-vector windows follow the reference stride bookkeeping: starts at
    multiples of 0.24 s, 1.44 s long, tail window at exact remaining length."""
    rng = np.random.default_rng(0)
    fea = rng.standard_normal((400, 64)).astype(np.float32)
    xv = vfs.xvector_model("base", fea, 4.0)
    # starts: range(0, 400-144, 24) -> 0..240 step 24 = 11 full windows
    # tail: 400 - 240 - 24 = 136 >= 10 -> one more
    assert len(xv) == 12
    keys = [k for k, _, _ in xv]
    assert keys[0] == "base_00000000-00000144"
    assert keys[-1] == "base_00000264-00000400"
    segs = [seg for _, seg, _ in xv]
    assert segs[0] == (0.0, 1.44)
    assert segs[1] == (0.24, 1.68)
    assert segs[-1] == (2.64, 4.0)
    for _, _, x in xv:
        assert x.shape == (256,)


def test_vfs_batch_score(vfs, media_dir, tmp_path):
    """batch_score: status tuples, skipifexist resume, csv outputs."""
    import os

    ins = [f"{media_dir}/silence2sec.wav", f"{media_dir}/lamartine.wav",
           str(tmp_path / "missing.wav")]
    outs = [str(tmp_path / f"s{i}.csv") for i in range(3)]
    dur, n_ok, avg, lmsg = vfs.batch_score(ins, outs, nbtry=2, trydelay=0.01)
    assert n_ok == 2
    assert [m[1] for m in lmsg] == [0, 0, 2]
    with open(outs[0]) as fh:
        header, row = fh.read().splitlines()
    assert header == "score\tspeech_duration\tnb_vectors"
    assert row.split("\t") == ["", "0.0", "0"]   # silence: score None
    assert not os.path.exists(outs[2])

    # resume: existing outputs skipped, same tuple contract as batch_process
    mtime = os.path.getmtime(outs[0])
    _, n_ok2, _, lmsg2 = vfs.batch_score(ins, outs, skipifexist=True)
    assert n_ok2 == 0
    assert [m[1] for m in lmsg2] == [1, 1, 2]
    assert os.path.getmtime(outs[0]) == mtime

    # farm adapter delegates to batch_score
    _, _, _, lmsg3 = vfs.batch_process(ins, outs, skipifexist=True)
    assert [m[1] for m in lmsg3] == [1, 1, 2]


def test_subbatch_equals_single_batch(vfs, monkeypatch):
    """Sub-batched extraction (ISS_XVEC_BATCH) returns the same embeddings
    as one whole-batch forward — the sub-batching exists because a single
    all-windows forward OOMs on hour-scale files (vfs.py
    get_embeddings_batch)."""
    rng = np.random.default_rng(3)
    fea = rng.standard_normal((1000, 64)).astype(np.float32)
    monkeypatch.setenv("ISS_XVEC_BATCH", "8")
    xv_sub = vfs.xvector_model("b", fea, 10.0)
    monkeypatch.setenv("ISS_XVEC_BATCH", "4096")
    xv_one = vfs.xvector_model("b", fea, 10.0)
    assert len(xv_sub) == len(xv_one) == 36 + 1
    for (ka, sa, xa), (kb, sb, xb) in zip(xv_sub, xv_one):
        assert ka == kb and sa == sb
        np.testing.assert_allclose(xa, xb, rtol=0, atol=1e-5)


def test_sharded_extractor_matches_single(vfs, monkeypatch):
    """x-vector extraction sharded over an 8-device mesh (windows on the
    data axis) returns the same embeddings as the single-device path."""
    import jax
    from inaspeechsegmenter_tpu.parallel.mesh import make_mesh
    from inaspeechsegmenter_tpu.vfs import JaxResnetExtractor

    rng = np.random.default_rng(5)
    fea = rng.standard_normal((700, 64)).astype(np.float32)
    monkeypatch.setenv("ISS_XVEC_BATCH", "16")
    sharded = JaxResnetExtractor(
        params=vfs.xvector_model.params, net=vfs.xvector_model.net,
        mesh=make_mesh(8))
    assert len(jax.devices()) == 8
    xv_m = sharded("b", fea, 7.0)
    xv_1 = vfs.xvector_model("b", fea, 7.0)
    assert len(xv_m) == len(xv_1) > 20
    for (ka, sa, xa), (kb, sb, xb) in zip(xv_m, xv_1):
        assert ka == kb and sa == sb
        # the SPMD-partitioned program schedules conv reductions
        # differently than the single-device one — small float drift on a
        # random-weight net with |emb| ~ 40 is expected
        np.testing.assert_allclose(xa, xb, rtol=1e-4, atol=1e-3)


def test_speech_only_extraction_output_identical(vfs, monkeypatch):
    """Skipping non-speech-midpoint windows before the ResNet (the round-3
    VFS optimization) is output-identical after apply_vad: such windows can
    be neither retained (midpoint test fails) nor back-filled (the pool is
    midpoint-in-speech only, reference vbx_segmenter.py:129-145)."""
    rng = np.random.default_rng(21)
    fea = rng.standard_normal((1200, 64)).astype(np.float32)
    # speech covers ~the middle third of the 12 s file
    tl = SpeechTimeline([(3.5, 8.25)])
    monkeypatch.setenv("ISS_XVEC_SPEECH_ONLY", "0")
    xv_all = vfs.xvector_model("b", fea, 12.0, timeline=tl)
    monkeypatch.setenv("ISS_XVEC_SPEECH_ONLY", "1")
    xv_sp = vfs.xvector_model("b", fea, 12.0, timeline=tl)
    # the filter really skipped work
    assert 0 < len(xv_sp) < len(xv_all)
    kept_all = vfs.apply_vad(list(xv_all), tl)
    kept_sp = vfs.apply_vad(list(xv_sp), tl)
    assert len(kept_all) == len(kept_sp) > 0
    for (ka, sa, xa), (kb, sb, xb) in zip(kept_all, kept_sp):
        assert ka == kb and sa == sb
        # different window counts compile different batch shapes; per-sample
        # math is identical up to XLA scheduling/reassociation noise
        np.testing.assert_allclose(xa, xb, rtol=1e-5, atol=1e-5)


def test_vfs_speech_only_end_to_end(vfs, media_dir, monkeypatch):
    """Full VFS scores are byte-identical with and without the speech-only
    window filter."""
    monkeypatch.setenv("ISS_XVEC_SPEECH_ONLY", "0")
    ref = vfs(f"{media_dir}/lamartine.wav")
    monkeypatch.setenv("ISS_XVEC_SPEECH_ONLY", "1")
    ours = vfs(f"{media_dir}/lamartine.wav")
    assert ours == ref


def test_score_prepared_empty_after_apply_vad(vfs):
    """A speech sliver can leave zero window midpoints in speech: score is
    None (like the no-speech case) rather than the reference's
    ZeroDivisionError (vbx_segmenter.py:55-61 — documented deviation)."""
    rng = np.random.default_rng(2)
    fea = rng.standard_normal((1200, 64)).astype(np.float32)
    sliver = SpeechTimeline([(11.9, 12.0)])
    score, dur, n = vfs._score_prepared(("b", fea, sliver, 12.0,
                                         sliver.total_duration()))
    assert score is None and n == 0
    assert dur == sliver.total_duration() > 0


def test_batch_score_bad_destination(vfs, media_dir, tmp_path):
    """An unwritable destination fails THAT file's status tuple; the rest of
    the corpus still scores (the write used to escape the prefetch loop and
    abort the whole batch, losing all accumulated statuses)."""
    import os

    bad = str(tmp_path / "is_a_dir.csv")
    os.makedirs(bad)
    ins = [f"{media_dir}/lamartine.wav", f"{media_dir}/silence2sec.wav"]
    outs = [bad, str(tmp_path / "ok.csv")]
    _, n_ok, _, lmsg = vfs.batch_score(ins, outs, nbtry=1, trydelay=0.01)
    assert [m[1] for m in lmsg] == [2, 0]
    assert n_ok == 1
    assert lmsg[0][2].startswith("error:")
    assert os.path.exists(outs[1])


def test_xvec_layout_nondivisor_mesh(vfs, monkeypatch):
    """On a mesh whose device count does NOT divide ISS_XVEC_BATCH, the
    gather pre-padding (embeddings_from_features) and the forward dispatch
    (get_embeddings_batch) share one `_xvec_layout`: every ResNet forward
    shape comes from the bounded {sub} + bucket-ladder set (a disagreement
    would compile a fresh ResNet program per ragged window count) and the
    embeddings equal the single-device path."""
    from inaspeechsegmenter_tpu.parallel.mesh import make_mesh
    from inaspeechsegmenter_tpu.vfs import JaxResnetExtractor

    rng = np.random.default_rng(7)
    fea = rng.standard_normal((700, 64)).astype(np.float32)
    monkeypatch.setenv("ISS_XVEC_BATCH", "16")
    ext = JaxResnetExtractor(params=vfs.xvector_model.params,
                             net=vfs.xvector_model.net, mesh=make_mesh(6))
    sub, buckets = ext._xvec_layout()
    assert sub % 6 == 0 and all(b % 6 == 0 and b <= sub for b in buckets)
    # idempotent ladder: a pre-padded tail bucket dispatches as itself
    assert all(next(x for x in buckets if x >= b) == b for b in buckets)
    shapes = []
    real = ext._sharded_fwd
    ext._sharded_fwd = (
        lambda p, w: (shapes.append(int(w.shape[0])), real(p, w))[1])
    xv_m = ext("b", fea, 7.0)
    assert shapes and all(s == sub or s in buckets for s in shapes)
    xv_1 = vfs.xvector_model("b", fea, 7.0)
    assert len(xv_m) == len(xv_1) > 20
    for (ka, sa, xa), (kb, sb, xb) in zip(xv_m, xv_1):
        assert ka == kb and sa == sb
        np.testing.assert_allclose(xa, xb, rtol=1e-4, atol=1e-3)


def test_timeline_overlapping_and_touching_intervals():
    """Caller-injected timelines may carry overlapping intervals: queries
    must honor the union.  Touching intervals stay SEPARATE because the
    reference tests each segment's strict interior (vbx_segmenter.py:36)
    — a shared boundary point is not speech."""
    tl = SpeechTimeline([(0.0, 10.0), (2.0, 3.0)])
    assert tl.contains_point(5.0)              # inside the spanning one
    assert tl.overlap_duration(0.0, 10.0) == pytest.approx(10.0)
    assert tl.total_duration() == pytest.approx(10.0)
    touching = SpeechTimeline([(1.0, 2.0), (2.0, 3.0)])
    assert len(touching) == 2
    assert not touching.contains_point(2.0)    # strict interior only
    assert touching.contains_point(1.5) and touching.contains_point(2.5)
    assert touching.overlap_duration(0.0, 4.0) == pytest.approx(2.0)


def test_score_signal_equals_call(vfs, media_dir):
    """score_signal on the decoded signal == __call__ on the file (the
    VFS counterpart of Segmenter.segment_signal)."""
    from inaspeechsegmenter_tpu.audio import read_wav

    sig, sr = read_wav(f"{media_dir}/lamartine.wav", dtype="int16")
    assert sr == 16000
    want = vfs(f"{media_dir}/lamartine.wav")
    got = vfs.score_signal(sig, "lamartine")
    assert got == want


def test_score_signal_rejects_injected_vad(vfs):
    import pytest

    saved = vfs.vad
    try:
        vfs.vad = lambda fpath: [("speech", 0.0, 1.0)]
        with pytest.raises(TypeError, match="score_signal"):
            vfs.score_signal(np.zeros(16000 * 2, np.int16))
    finally:
        vfs.vad = saved


def test_online_vfs_finalize_equals_score_signal(vfs, media_dir):
    """OnlineVFS fed in pieces finalizes to exactly the canonical
    score_signal result; provisional current() is well-typed."""
    from inaspeechsegmenter_tpu.audio import read_wav
    from inaspeechsegmenter_tpu.online import OnlineVFS

    sig, _ = read_wav(f"{media_dir}/lamartine.wav", dtype="int16")
    online = OnlineVFS(vfs, basename="lamartine")
    provs = []
    for pos in range(0, len(sig), 16000 * 3):
        online.feed(sig[pos: pos + 16000 * 3])
        provs.append(online.current())
    for score, dur, n in provs:
        assert (score is None) or 0.0 <= score <= 1.0
        assert dur >= 0 and n >= 0
    got = online.finalize()
    assert got == vfs.score_signal(sig, "lamartine")
    assert online.finalize() == got          # idempotent
    with pytest.raises(RuntimeError):
        online.feed(np.zeros(100, np.int16))


def test_online_vfs_empty_stream(vfs):
    from inaspeechsegmenter_tpu.online import OnlineVFS

    online = OnlineVFS(vfs)
    assert online.current() == (None, 0.0, 0) or online.current()[0] is None
    assert online.finalize() == (None, 0.0, 0)


def test_online_vfs_embedding_cache_incremental(vfs, media_dir, monkeypatch):
    """Windows are embedded once: a later current() with more audio only
    embeds NEW windows (the ResNet work is incremental)."""
    from inaspeechsegmenter_tpu.audio import read_wav
    from inaspeechsegmenter_tpu.online import OnlineVFS

    monkeypatch.setenv("ISS_ONLINE_VFS_BATCH", "1")   # embed eagerly
    sig, _ = read_wav(f"{media_dir}/lamartine.wav", dtype="int16")
    online = OnlineVFS(vfs, basename="lam")
    online.feed(sig[: len(sig) // 2])
    online.current()
    cached = set(online._emb)
    calls = []
    real = vfs.xvector_model.embeddings_from_features

    def spy(fea, starts):
        calls.append(np.asarray(starts))
        return real(fea, starts)

    vfs.xvector_model.embeddings_from_features = spy
    try:
        online.feed(sig[len(sig) // 2:])
        online.current()
    finally:
        vfs.xvector_model.embeddings_from_features = real
    for starts in calls:
        assert not (set(starts.tolist()) & cached), \
            "re-embedded an already-cached window"


def test_online_vfs_poll_reuses_score(vfs, media_dir, monkeypatch):
    """Steady-state polls must not re-dispatch the scoring MLP: with the
    VAD timeline and the embedding store unchanged, current() is cached."""
    from inaspeechsegmenter_tpu.audio import read_wav
    from inaspeechsegmenter_tpu.online import OnlineVFS

    monkeypatch.setenv("ISS_ONLINE_VFS_BATCH", "1")
    sig, _ = read_wav(f"{media_dir}/lamartine.wav", dtype="int16")
    online = OnlineVFS(vfs, basename="lam")
    online.feed(sig)
    first = online.current()
    calls = []
    real = vfs._score_xvectors
    monkeypatch.setattr(
        vfs, "_score_xvectors",
        lambda *a, **k: (calls.append(1), real(*a, **k))[1])
    assert online.current() == first and calls == []
    assert online.current() == first and calls == []


def test_online_vfs_feed_copies_buffer(vfs):
    """feed() must COPY: capture callbacks reuse their buffer (e.g.
    sounddevice's indata) — an aliased store would silently turn the
    stream into copies of the last block."""
    from inaspeechsegmenter_tpu.online import OnlineVFS

    online = OnlineVFS(vfs)
    buf = np.zeros(1600, np.int16)
    buf[:] = 100
    online.feed(buf)
    buf[:] = -100                       # caller reuses the buffer
    online.feed(buf)
    sig = online._signal()
    assert (sig[:1600] == 100).all() and (sig[1600:] == -100).all()


def test_online_vfs_final_starts_head_guard(vfs):
    """No window may be cache-embedded before the stream head's CMVN
    window saturates (early frames use up to lc+rc context; the mirror
    tail moves the last frames as the signal grows)."""
    from inaspeechsegmenter_tpu.online import OnlineVFS

    online = OnlineVFS(vfs)
    fe = vfs.features
    too_few = fe.lc + fe.rc + online.TAIL_GUARD      # one frame short
    assert online._final_starts(too_few) == []
    enough = fe.lc + fe.rc + 1 + online.TAIL_GUARD
    starts = online._final_starts(enough + 144)
    assert starts and all(
        s + 144 <= enough + 144 - fe.rc - online.TAIL_GUARD for s in starts)


def test_follow_wav_vfs_equals_score_signal(vfs, tmp_path):
    """follow_wav_vfs tails a growing recording and finalizes to exactly
    score_signal on the full samples."""
    import struct
    import threading
    import time

    from inaspeechsegmenter_tpu.online import follow_wav_vfs

    rng = np.random.default_rng(21)
    sig = (rng.standard_normal(16000 * 12) * 2000).astype(np.int16)
    p = str(tmp_path / "grow.wav")
    fmt = struct.pack("<HHIIHH", 1, 1, 16000, 32000, 2, 16)

    def writer():
        with open(p, "wb") as f:
            f.write(b"RIFF" + struct.pack("<I", 0xFFFFFFFF) + b"WAVE"
                    + b"fmt " + struct.pack("<I", len(fmt)) + fmt
                    + b"data" + struct.pack("<I", 0xFFFFFFFF))
            for pos in range(0, len(sig), 16000 * 4):
                time.sleep(0.15)
                f.write(sig[pos: pos + 16000 * 4].astype("<i2").tobytes())
                f.flush()

    th = threading.Thread(target=writer, daemon=True)
    th.start()
    got = follow_wav_vfs(p, vfs, idle_timeout=2.0, poll=0.1)
    th.join(timeout=10)
    assert got == vfs.score_signal(sig, "grow")


def test_cli_vfs_parallel_matches_single(vfs, synthetic_model_dir, tmp_path,
                                         monkeypatch, media_dir):
    """--parallel builds an all-device mesh, hands it to the ctor, and the
    batch csv is identical to the single-device run."""
    import jax

    import inaspeechsegmenter_tpu.vfs as vfs_mod
    from inaspeechsegmenter_tpu.cli.vfs import main

    seen = {}
    real = vfs_mod.VoiceFemininityScoring

    def ctor(**kw):
        seen.update(kw)
        return real(gd_model_criteria="vfp", ffmpeg=None,
                    allow_download=False,
                    xvector_net=vfs.xvector_model.net,
                    xvector_params=vfs.xvector_model.params,
                    mesh=kw.get("mesh"))

    monkeypatch.setattr(vfs_mod, "VoiceFemininityScoring", ctor)
    single, par = tmp_path / "single", tmp_path / "par"
    single.mkdir(), par.mkdir()
    wav = f"{media_dir}/lamartine.wav"
    main(["-i", wav, "-o", str(single), "-b", "none"])
    assert seen.get("mesh") is None
    main(["-i", wav, "-o", str(par), "-b", "none", "--parallel"])
    assert seen["mesh"] is not None
    assert seen["mesh"].devices.size == len(jax.devices())
    assert ((par / "lamartine.csv").read_text()
            == (single / "lamartine.csv").read_text())


def test_cli_vfs_follow(vfs, synthetic_model_dir, tmp_path, capsys,
                        monkeypatch):
    """VFS CLI --follow drives follow_wav_vfs end to end, printing
    provisional scores and writing the csv."""
    import struct
    import threading
    import time

    import inaspeechsegmenter_tpu.vfs as vfs_mod
    from inaspeechsegmenter_tpu.cli.vfs import main

    # route the CLI's ctor to the tiny-net fixture instance (the real
    # ResNet101 on CPU takes minutes)
    monkeypatch.setattr(vfs_mod, "VoiceFemininityScoring",
                        lambda **kw: vfs)
    rng = np.random.default_rng(22)
    sig = (rng.standard_normal(16000 * 8) * 2000).astype(np.int16)
    p = str(tmp_path / "live.wav")
    out = tmp_path / "out"
    out.mkdir()
    fmt = struct.pack("<HHIIHH", 1, 1, 16000, 32000, 2, 16)

    def writer():
        time.sleep(0.3)                      # file appears AFTER the CLI
        with open(p, "wb") as f:
            f.write(b"RIFF" + struct.pack("<I", 0xFFFFFFFF) + b"WAVE"
                    + b"fmt " + struct.pack("<I", len(fmt)) + fmt
                    + b"data" + struct.pack("<I", 0xFFFFFFFF)
                    + sig.astype("<i2").tobytes())

    th = threading.Thread(target=writer, daemon=True)
    th.start()
    main(["-i", p, "-o", str(out), "-b", "none",
          "--follow", "--follow_idle", "2"])
    th.join(timeout=10)
    assert "finalized" in capsys.readouterr().out
    from inaspeechsegmenter_tpu.vfs import score_to_csv

    want = tmp_path / "want.csv"
    score_to_csv(vfs.score_signal(sig, "live"), str(want))
    assert (out / "live.csv").read_text() == want.read_text()
