"""End-to-end Segmenter tests on real media with synthetic CNN weights.

The released reference weights are not fetchable in this environment, so the
CNNs are random synthetic stand-ins — every *weight-independent* behavior is
still asserted exactly (energy VAD segmentation of silence, timeline tiling,
frame arithmetic, determinism, API contracts), and the fused device pipeline
is cross-checked against the compositional per-segment API on identical
weights.
"""

import numpy as np
import pytest

from inaspeechsegmenter_tpu.audio import read_wav


@pytest.fixture(scope="module")
def seg_smn(synthetic_model_dir):
    from inaspeechsegmenter_tpu import Segmenter

    return Segmenter(vad_engine="smn", detect_gender=True, ffmpeg=None,
                     allow_download=False)


@pytest.mark.smoke
def test_silence_is_noenergy(seg_smn, media_dir):
    """Weight-independent golden parity: silence has no energetic frames, so
    the result equals the reference golden csv exactly
    (media/silence2sec-smn-gender.csv)."""
    out = seg_smn(f"{media_dir}/silence2sec.wav")
    assert out == [("noEnergy", 0.0, 1.98)]


@pytest.mark.smoke
def test_tiling_and_vocab(seg_smn, media_dir):
    out = seg_smn(f"{media_dir}/musanmix.wav")
    assert len(out) > 1
    assert out[0][1] == 0
    for (l1, s1, e1), (l2, s2, e2) in zip(out[:-1], out[1:]):
        assert e1 == s2  # segments tile the timeline
        assert l1 != l2  # run-length encoded: no adjacent equal labels
    vocab = {"noEnergy", "speech", "music", "noise", "female", "male"}
    assert {lab for lab, _, _ in out} <= vocab
    # gender engine relabels all speech
    assert "speech" not in {lab for lab, _, _ in out}


def test_deterministic(seg_smn, media_dir):
    a = seg_smn(f"{media_dir}/lamartine.wav")
    b = seg_smn(f"{media_dir}/lamartine.wav")
    assert a == b


def test_no_gender(synthetic_model_dir, media_dir):
    from inaspeechsegmenter_tpu import Segmenter

    seg = Segmenter(vad_engine="smn", detect_gender=False, ffmpeg=None,
                    allow_download=False)
    out = seg(f"{media_dir}/musanmix.wav")
    assert {lab for lab, _, _ in out} <= {"noEnergy", "speech", "music", "noise"}


def test_sm_engine(synthetic_model_dir, media_dir):
    from inaspeechsegmenter_tpu import Segmenter

    seg = Segmenter(vad_engine="sm", detect_gender=False, ffmpeg=None,
                    allow_download=False)
    out = seg(f"{media_dir}/musanmix.wav")
    assert {lab for lab, _, _ in out} <= {"noEnergy", "speech", "music"}


def test_start_sec_offset(seg_smn, media_dir):
    """segment_feats applies the start_sec shift with float64 host math."""
    sig, _ = read_wav(f"{media_dir}/silence2sec.wav", dtype="float32")
    mspec, loge = seg_smn.frontend.mspec_loge_np(sig)
    out = seg_smn.segment_feats(mspec, loge, 0, 12.5)
    assert out == [("noEnergy", 12.5, 12.5 + 1.98)]


def test_fused_equals_compositional(seg_smn, media_dir, ref_viterbi,
                                    ref_viterbi_utils):
    """The single fused XLA program must reproduce the reference's
    compositional control flow (energy VAD -> per-segment VAD CNN ->
    per-segment gender CNN) stage by stage on identical weights."""
    from inaspeechsegmenter_tpu.pipeline import rle

    sig, _ = read_wav(f"{media_dir}/musanmix.wav", dtype="float32")
    mspec, loge = seg_smn.frontend.mspec_loge_np(sig)

    # reference-style energy activity (host oracle viterbi)
    thr = np.mean(loge[np.isfinite(loge)]) + np.log(seg_smn.energy_ratio)
    act = ref_viterbi.viterbi_decoding(
        ref_viterbi_utils.pred2logemission(loge > thr),
        ref_viterbi_utils.log_trans_exp(150, cost0=-5))[::2]
    lseg = [("energy" if lab else "noEnergy", a, b) for lab, a, b in rle(act)]

    # compositional per-segment stages through the public DnnSegmenter API
    lseg = seg_smn.vad(mspec, lseg, 0)
    lseg = seg_smn.gender(mspec, lseg, 0)
    compositional = [(lab, s * .02, e * .02) for lab, s, e in lseg]

    fused = seg_smn.segment_feats(mspec, loge, 0, 0)
    assert [lab for lab, _, _ in fused] == [lab for lab, _, _ in compositional]
    np.testing.assert_allclose([s for _, s, _ in fused],
                               [s for _, s, _ in compositional], atol=1e-9)


def test_short_media_difflen(seg_smn, tmp_path):
    """<68-frame media triggers the pad-to-68 path and a warning."""
    from inaspeechsegmenter_tpu.audio import write_wav

    rng = np.random.default_rng(3)
    sig = (rng.standard_normal(16000 // 2) * 0.1).astype(np.float32)  # 0.5 s
    p = str(tmp_path / "short.wav")
    write_wav(p, sig, 16000)
    with pytest.warns(UserWarning, match="duration is short"):
        out = seg_smn(p)
    t = (len(sig) - 400) // 160 + 1
    n20 = (t + 1) // 2
    assert out[-1][2] == pytest.approx(n20 * 0.02)
    for (l1, s1, e1), (l2, s2, e2) in zip(out[:-1], out[1:]):
        assert e1 == s2


def test_batch_process(seg_smn, media_dir, tmp_path):
    """batch_process writes exports and returns reference status tuples."""
    inputs = [f"{media_dir}/silence2sec.wav", "/nonexistent/file.wav",
              f"{media_dir}/silence2sec.wav"]
    outputs = [str(tmp_path / "a.csv"), str(tmp_path / "b.csv"),
               str(tmp_path / "c.csv")]
    dur, n_ok, avg, msgs = seg_smn.batch_process(inputs, outputs, nbtry=1)
    assert n_ok == 2
    codes = [m[1] for m in msgs]
    assert codes.count(0) == 2 and codes.count(2) == 1
    with open(outputs[0]) as f:
        assert f.read() == "labels\tstart\tstop\nnoEnergy\t0.0\t1.98\n"
    # skipifexist on a re-run
    _, n_ok2, _, msgs2 = seg_smn.batch_process(
        [inputs[0]], [outputs[0]], skipifexist=True)
    assert n_ok2 == 0 and msgs2[0][1] == 1


def test_batch_identical_inputs_byte_identical(seg_smn, media_dir, tmp_path):
    """Two identical inputs must produce byte-identical csvs (the reference
    test_batch property, run_test.py:107-120)."""
    import filecmp

    inputs = [f"{media_dir}/lamartine.wav", f"{media_dir}/lamartine.wav"]
    outputs = [str(tmp_path / "a.csv"), str(tmp_path / "b.csv")]
    _, n_ok, _, _ = seg_smn.batch_process(inputs, outputs)
    assert n_ok == 2
    assert filecmp.cmp(outputs[0], outputs[1], shallow=False)


def test_stage_timers(seg_smn, media_dir):
    """Per-stage observability: decode/features/segment all timed."""
    seg_smn.timers.reset()
    seg_smn(f"{media_dir}/silence2sec.wav")
    s = seg_smn.timers.summary()
    assert s["decode"]["calls"] == 1
    assert s["features"]["calls"] == 1
    assert s["segment"]["calls"] == 1
    assert all(v["total_s"] >= 0 for v in s.values())


def test_no_ffmpeg_restrictions(seg_smn, media_dir):
    with pytest.raises(NotImplementedError):
        seg_smn(f"{media_dir}/silence2sec.wav", start_sec=1.0)
    with pytest.raises(NotImplementedError):
        seg_smn("http://example.com/a.wav")


@pytest.mark.slow
def test_streaming_equals_fused(seg_smn, media_dir, tmp_path, monkeypatch):
    """The streaming per-chunk path returns labels identical to the fused
    whole-file program, including replicate edges and padded buckets."""
    import os
    from inaspeechsegmenter_tpu.audio import write_wav
    from inaspeechsegmenter_tpu.dsp.sidekit import CHUNK, HOP

    rng = np.random.default_rng(7)
    files = [f"{media_dir}/musanmix.wav"]          # 74.5 s: 2 chunks
    # a synthetic file whose frame count lands just past a chunk boundary
    # (max replicate-edge frames in the final chunk)
    n = (2 * CHUNK + 5) * HOP + 400
    sig = np.clip(np.rint(rng.standard_normal(n) * 3000), -32768,
                  32767).astype(np.int16)
    sig[: n // 3] = 0                              # leading noEnergy region
    p = tmp_path / "longtail.wav"
    write_wav(str(p), sig, 16000)
    files.append(str(p))

    for f in files:
        monkeypatch.setenv("ISS_STREAMING", "0")
        fused = seg_smn(f)
        monkeypatch.setenv("ISS_STREAMING", "1")
        streamed = seg_smn(f)
        assert streamed == fused, f
        # opt-in speculative gender emissions must be exact too
        monkeypatch.setenv("ISS_STREAM_GENDER", "1")
        spec = seg_smn(f)
        monkeypatch.delenv("ISS_STREAM_GENDER")
        assert spec == fused, f


def test_streaming_short_file_falls_back(seg_smn, tmp_path):
    """Single-chunk and sub-68-frame media run the fused path unchanged."""
    from inaspeechsegmenter_tpu.audio import write_wav

    rng = np.random.default_rng(3)
    short = (rng.standard_normal(16000) * 0.1).astype(np.float32)
    p = tmp_path / "short1s.wav"
    write_wav(str(p), np.clip(np.rint(short * 32768), -32768,
                              32767).astype(np.int16), 16000)
    out = seg_smn(str(p))
    assert out and abs(out[-1][2] - 0.98) < 0.05


def test_batch_process_bad_destination(seg_smn, media_dir, tmp_path):
    """A failing export (dst is a directory) yields that file's (dst, 2,
    'error: ...') tuple instead of aborting the batch."""
    import os

    bad = str(tmp_path / "is_a_dir.csv")
    os.makedirs(bad)
    inputs = [f"{media_dir}/silence2sec.wav", f"{media_dir}/silence2sec.wav"]
    outputs = [bad, str(tmp_path / "ok.csv")]
    _, n_ok, _, msgs = seg_smn.batch_process(inputs, outputs, nbtry=1)
    assert [m[1] for m in msgs] == [2, 0]
    assert n_ok == 1
    assert msgs[0][2].startswith("error:")
    assert os.path.exists(outputs[1])


def test_streaming_lazy_jit_guard_assigned_last(seg_smn, monkeypatch):
    """run_streaming's lazy init must assign its guard attribute
    (_jit_vad_chunk) LAST: two prefetch threads share one pipeline (VFS
    batch_score producers), and a thread that sees the guard non-None
    immediately calls _jit_tail — which must therefore already be set.
    Asserts the guard is still None during EVERY jax.jit call of the init
    block (the pre-fix order assigned it first)."""
    import jax
    import jax.numpy as jnp

    from inaspeechsegmenter_tpu.pipeline import FusedPipeline
    from inaspeechsegmenter_tpu.segmenter import patch_counts

    pipe = FusedPipeline(seg_smn.vad.as_pipeline_stage(),
                         seg_smn.gender.as_pipeline_stage(),
                         energy_ratio=seg_smn.energy_ratio)
    guard_snapshots = []
    real_jit = jax.jit

    def spy(*a, **k):
        guard_snapshots.append(pipe._jit_vad_chunk is None)
        return real_jit(*a, **k)

    monkeypatch.setattr(jax, "jit", spy)
    rng = np.random.default_rng(11)
    c = 2048
    chunks = [(jnp.asarray(rng.standard_normal((c, 24)), jnp.float32),
               jnp.asarray(rng.standard_normal(c), jnp.float32))
              for _ in range(2)]
    t = 2 * c - 10
    nfp, n20 = patch_counts(t, 0)
    ids = np.asarray(pipe.run_streaming(
        seg_smn.vad.model.params, seg_smn.gender.model.params,
        chunks, t, nfp, n20))[:n20]
    monkeypatch.undo()
    assert guard_snapshots and all(guard_snapshots)
    # sanity: streamed labels equal the fused whole-file program
    mspec = jnp.concatenate([m for m, _ in chunks])
    loge = jnp.concatenate([l for _, l in chunks])
    want = np.asarray(pipe.run(
        seg_smn.vad.model.params, seg_smn.gender.model.params,
        mspec, loge, t, nfp, n20))[:n20]
    np.testing.assert_array_equal(ids, want)
