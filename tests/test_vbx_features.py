"""VBx feature frontend parity vs the reference chain (dither -> mirror pad ->
povey fbank -> CMVN), reference vbx_segmenter.py:72-89 + features_vbx.py."""

import numpy as np

from inaspeechsegmenter_tpu.dsp.vbx import (VbxFrontend, povey_window,
                                            preprocess_signal)


def _ref_features(ref_features_vbx, signal):
    fv = ref_features_vbx
    noverlap, winlen, sr, fdim = 240, 400, 16000, 64
    window = fv.povey_window(winlen)
    fbank_mx = fv.mel_fbank_mx(winlen, sr, NUMCHANS=fdim, LOFREQ=20.0,
                               HIFREQ=7600, htk_bug=False)
    np.random.seed(3)
    sig = fv.add_dither((signal * 2 ** 15).astype(int))
    seg = np.r_[sig[noverlap // 2 - 1::-1], sig, sig[-1:-winlen // 2 - 1:-1]]
    fea = fv.fbank_htk(seg, window, noverlap, fbank_mx, USEPOWER=True,
                       ZMEANSOURCE=True)
    return fv.cmvn_floating_kaldi(fea, 150, 149, norm_vars=False).astype(np.float32)


def test_povey_window(ref_features_vbx):
    np.testing.assert_allclose(povey_window(400),
                               ref_features_vbx.povey_window(400), atol=0)


def test_preprocess_bit_exact(ref_features_vbx, rng):
    """Seeded dither and mirror padding must match the reference bit-for-bit."""
    sig = np.clip(rng.standard_normal(16000) * 0.1, -1, 1)
    ours = preprocess_signal(sig)
    np.random.seed(3)
    ref = ref_features_vbx.add_dither((sig * 2 ** 15).astype(int))
    ref = np.r_[ref[119::-1], ref, ref[-1:-201:-1]]
    np.testing.assert_array_equal(ours, ref)


def test_features_parity_random(ref_features_vbx, rng):
    sig = np.clip(rng.standard_normal(16000 * 3) * 0.1, -1, 1)
    ours = np.asarray(VbxFrontend().features(sig))
    ref = _ref_features(ref_features_vbx, sig)
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, rtol=2e-3, atol=2e-3)


def test_features_parity_lamartine(ref_features_vbx, media_dir):
    from inaspeechsegmenter_tpu.audio import read_wav

    sig, sr = read_wav(f"{media_dir}/lamartine.wav", dtype="float64")
    assert sr == 16000
    ours = np.asarray(VbxFrontend().features(sig))
    ref = _ref_features(ref_features_vbx, sig)
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, rtol=5e-3, atol=5e-3)
    # frame count matches the HTK convention
    assert len(ours) == (len(sig) + 320 - 400) // 160 + 1


def test_i16_upload_matches_f32(ref_features_vbx, media_dir, monkeypatch):
    """int16 upload mode (device dither + mirror pad, dsp/vbx.py
    _features_i16) vs the exact host-dithered f32 path: <= 1 f32-ulp signal
    difference, tight feature agreement — and still within the reference
    parity budget."""
    from inaspeechsegmenter_tpu.audio import read_wav

    sig, _ = read_wav(f"{media_dir}/lamartine.wav", dtype="float64")
    fe = VbxFrontend()
    monkeypatch.setenv("ISS_VBX_UPLOAD", "f32")
    exact = np.asarray(fe.features(sig))
    monkeypatch.setenv("ISS_VBX_UPLOAD", "int16")
    ours = np.asarray(fe.features(sig))
    assert ours.shape == exact.shape
    np.testing.assert_allclose(ours, exact, rtol=1e-4, atol=1e-4)
    ref = _ref_features(ref_features_vbx, sig)
    np.testing.assert_allclose(ours, ref, rtol=5e-3, atol=5e-3)


def test_i16_upload_with_codec(media_dir, monkeypatch):
    """Zero-elision codec on the int16 VBx path: digital-silence signal
    regions ship elided and reconstruct identically."""
    rng = np.random.default_rng(11)
    sig = rng.standard_normal(16000 * 40) * 0.05
    sig[16000 * 5:16000 * 30] = 0.0       # digital silence -> elided blocks
    sig = np.round(sig * 32768) / 32768   # losslessly int16-scaled
    fe = VbxFrontend()
    monkeypatch.setenv("ISS_VBX_UPLOAD", "int16")
    monkeypatch.setenv("ISS_UPLOAD_CODEC", "0")
    raw = np.asarray(fe.features(sig))
    monkeypatch.setenv("ISS_UPLOAD_CODEC", "1")
    packed = np.asarray(fe.features(sig))
    np.testing.assert_array_equal(raw, packed)


def test_i16_upload_with_bits_codec(monkeypatch):
    """Predictive bit-packing on the int16 VBx path: compressible audible
    content ships packed and reconstructs identically."""
    rng = np.random.default_rng(12)
    n = 16000 * 40
    t = np.arange(n) / 16000
    sig = (np.sin(2 * np.pi * 330 * t) * 0.2
           + rng.standard_normal(n) * 0.01)
    sig = np.round(np.clip(sig, -1, 1) * 32768) / 32768   # int16-exact
    fe = VbxFrontend()
    monkeypatch.setenv("ISS_VBX_UPLOAD", "int16")
    monkeypatch.setenv("ISS_UPLOAD_CODEC", "0")
    raw = np.asarray(fe.features(sig))
    monkeypatch.setenv("ISS_UPLOAD_CODEC", "1")
    monkeypatch.setenv("ISS_UPLOAD_PACK", "auto")
    from inaspeechsegmenter_tpu.dsp.codec import pack_best
    si = np.clip(np.rint(np.asarray(sig) * 32768), -32768, 32767
                 ).astype(np.int16)
    pad = (-len(si)) % 320
    assert pack_best(np.pad(si, (0, pad)))[0] == "bits"   # really exercises it
    packed = np.asarray(fe.features(sig))
    np.testing.assert_array_equal(raw, packed)


def test_i16_upload_rejects_out_of_range(monkeypatch):
    """float sources beyond int16 range must fall back to the f32 path."""
    sig = np.zeros(16000 * 2)
    sig[100] = 1.5                        # > int16 full scale
    fe = VbxFrontend()
    monkeypatch.setenv("ISS_VBX_UPLOAD", "int16")
    out = np.asarray(fe.features(sig))
    assert out.shape[1] == 64 and len(out) == (len(sig) - 80) // 160 + 1


def test_features_from_shared_pcm(media_dir, monkeypatch):
    """PCM buffers kept from the segmenter's VAD upload produce identical
    VBx features to a fresh int16 upload of the same signal (the VFS
    single-transfer path)."""
    from inaspeechsegmenter_tpu.audio import read_wav
    from inaspeechsegmenter_tpu.dsp.sidekit import SidekitFrontend
    from inaspeechsegmenter_tpu.pipeline import bucket_chunks
    from inaspeechsegmenter_tpu.dsp.sidekit import CHUNK, frame_count

    sig, _ = read_wav(f"{media_dir}/lamartine.wav", dtype="int16")
    monkeypatch.setenv("ISS_VBX_UPLOAD", "int16")
    fe = VbxFrontend()
    direct = np.asarray(fe.features(sig.astype(np.float64) / 32768.0))

    sfe = SidekitFrontend()
    t = frame_count(len(sig))
    bucket = bucket_chunks(max(1, -(-t // CHUNK))) * CHUNK
    _, _, pcm = sfe.mspec_loge_chunks(sig, pad_frames_to=bucket,
                                      keep_pcm=True)
    assert pcm is not None
    shared = np.asarray(fe.features_from_pcm(pcm, len(sig)))
    np.testing.assert_array_equal(direct, shared)


def test_features_from_shared_pcm_multigroup(monkeypatch):
    """Multi-group PCM reconstruction (the 2*HOP lookahead stripping in
    features_from_pcm) over several upload groups, with and without the
    elision codec."""
    from inaspeechsegmenter_tpu.dsp.sidekit import (CHUNK, SidekitFrontend,
                                                    frame_count)
    from inaspeechsegmenter_tpu.pipeline import bucket_chunks

    rng = np.random.default_rng(13)
    sig = (rng.standard_normal(CHUNK * 160 * 3 + 12345) * 2000
           ).astype(np.int16)
    sig[160 * CHUNK:160 * CHUNK + 400000] = 0   # elidable silence
    monkeypatch.setenv("ISS_VBX_UPLOAD", "int16")
    monkeypatch.setenv("ISS_UPLOAD_CHUNKS", "1")  # force multiple groups
    fe = VbxFrontend()
    for codec in ("0", "1"):
        monkeypatch.setenv("ISS_UPLOAD_CODEC", codec)
        direct = np.asarray(fe.features(sig.astype(np.float64) / 32768.0))
        sfe = SidekitFrontend()
        t = frame_count(len(sig))
        bucket = bucket_chunks(max(1, -(-t // CHUNK))) * CHUNK
        _, _, pcm = sfe.mspec_loge_chunks(sig, pad_frames_to=bucket,
                                          keep_pcm=True)
        assert len(pcm) >= 3
        shared = np.asarray(fe.features_from_pcm(pcm, len(sig)))
        np.testing.assert_array_equal(direct, shared)


def test_features_from_shared_pcm_exact_bucket_tail(monkeypatch):
    """Regression: when the frame count exactly fills the chunk bucket, up
    to 79 trailing samples fall past the feature window — the shared PCM
    must still cover them (the VBx mirror tail reads the true last 200
    samples), so mspec_loge_chunks grows by one chunk in that case."""
    from inaspeechsegmenter_tpu.dsp.sidekit import (CHUNK, HOP,
                                                    SidekitFrontend,
                                                    frame_count)
    from inaspeechsegmenter_tpu.pipeline import bucket_chunks

    rng = np.random.default_rng(17)
    # t == CHUNK exactly, with the maximal 79-sample overhang of loud samples
    n = CHUNK * HOP + 399
    sig = (rng.standard_normal(n) * 3000).astype(np.int16)
    assert frame_count(n) == CHUNK
    monkeypatch.setenv("ISS_VBX_UPLOAD", "int16")
    fe = VbxFrontend()
    direct = np.asarray(fe.features(sig.astype(np.float64) / 32768.0))
    sfe = SidekitFrontend()
    t = frame_count(len(sig))
    bucket = bucket_chunks(max(1, -(-t // CHUNK))) * CHUNK
    outs, _, pcm = sfe.mspec_loge_chunks(sig, pad_frames_to=bucket,
                                         keep_pcm=True)
    assert sum(int(p.shape[0]) for p in pcm) >= n
    # grown by exactly one chunk (tail programs pad probs to the ladder
    # themselves, so emissions never run on padding chunks)
    assert len(outs) == bucket // CHUNK + 1
    shared = np.asarray(fe.features_from_pcm(pcm, len(sig)))
    np.testing.assert_array_equal(direct, shared)


def test_keep_pcm_none_for_float_sources():
    from inaspeechsegmenter_tpu.dsp.sidekit import SidekitFrontend

    fe = SidekitFrontend()
    sig = np.zeros(16000 * 5, np.float32)
    outs, t, pcm = fe.mspec_loge_chunks(sig, keep_pcm=True)
    assert pcm is None and t == (len(sig) - 400) // 160 + 1


def test_dither_buffer_growth_continues_stream():
    """Growing the device dither cache extends the MT19937(3) stream with
    just the delta — the result must equal one fresh full draw."""
    import numpy as np

    from inaspeechsegmenter_tpu.dsp.vbx import VbxFrontend

    fe = VbxFrontend()
    fe._dither_buffer(1000)                     # first growth: 1 MiB block
    n = (1 << 20) + 5
    buf = np.asarray(fe._dither_buffer(n))      # delta growth
    rng = np.random.RandomState(3)
    ref = (8.0 * (2.0 * rng.rand(2 << 20) - 1.0)).astype(np.float32)
    np.testing.assert_array_equal(buf, ref[:n])  # exact-length slice
    # the underlying cache holds the full continued stream
    np.testing.assert_array_equal(np.asarray(fe._dither_dev), ref)


def test_dither_buffer_shape_keyed_on_request():
    """_dither_buffer returns exactly the requested length: the traced
    dither shape must equal the signal bucket so a 2^20-sample buffer
    growth cannot invalidate every compiled signal-bucket fbank program
    (round-3 review finding).  The stream stays a prefix sequence."""
    from inaspeechsegmenter_tpu.dsp.vbx import VbxFrontend

    fe = VbxFrontend()
    d1 = np.asarray(fe._dither_buffer(1000))
    assert d1.shape == (1000,)
    d2 = np.asarray(fe._dither_buffer((1 << 20) + 5))   # forces a growth
    assert d2.shape == ((1 << 20) + 5,)
    np.testing.assert_array_equal(d2[:1000], d1)        # MT19937(3) prefix
    d3 = np.asarray(fe._dither_buffer(1000))            # after growth:
    assert d3.shape == (1000,)                          # shape unchanged
    np.testing.assert_array_equal(d3, d1)


def test_online_stream_equals_offline_blocks(monkeypatch):
    """VbxPcmStreamOnline (unknown length, growing capacity, safe-block
    gating) must produce BIT-identical features to the offline
    VbxPcmStream on the finished signal, for any append slicing."""
    from inaspeechsegmenter_tpu.dsp.vbx import (VbxPcmStream,
                                                VbxPcmStreamOnline)

    rng = np.random.default_rng(23)
    n = 16000 * 30 + 12345
    sig = (rng.standard_normal(n) * 2500).astype(np.int16)
    fe = VbxFrontend()

    off = VbxPcmStream(fe, n)
    off.append(sig)
    want = np.asarray(off.finish())

    for seed in (1, 2):
        r2 = np.random.default_rng(seed)
        on = VbxPcmStreamOnline(fe, capacity=1 << 18)  # force growth
        pos = 0
        while pos < n:
            ln = int(r2.integers(1, 16000 * 7))
            on.append(sig[pos: pos + ln])
            pos += ln
            assert on.frames_ready <= (pos - 80) // 160 + 1 if pos >= 400 \
                else on.frames_ready == 0
        got = np.asarray(on.finalize())
        np.testing.assert_array_equal(got, want)


def test_online_stream_safe_blocks_are_final(monkeypatch):
    """Rows behind frames_ready never change as more audio arrives —
    the online embedding cache's exactness precondition."""
    from inaspeechsegmenter_tpu.dsp.vbx import VBX_BLK, VbxPcmStreamOnline

    rng = np.random.default_rng(29)
    fe = VbxFrontend()
    on = VbxPcmStreamOnline(fe, capacity=1 << 21)
    first = (rng.standard_normal((VBX_BLK + 400) * 160) * 2500
             ).astype(np.int16)
    on.append(first)
    fr = on.frames_ready
    assert fr >= VBX_BLK
    snap = np.asarray(on.fea_buffer[:fr])
    on.append((rng.standard_normal(16000 * 20) * 2500).astype(np.int16))
    np.testing.assert_array_equal(np.asarray(on.fea_buffer[:fr]), snap)
    total = on._pos
    final = np.asarray(on.finalize())
    np.testing.assert_array_equal(final[:fr], snap)
    assert len(final) == (total - 80) // 160 + 1
