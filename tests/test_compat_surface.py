"""Reference import-path compatibility surface.

A user of the reference package should find every public module-level
symbol under the same sub-module path after swapping the import root
(SURVEY.md §2 public symbols).  Numeric behavior of the host VBx feature
functions is asserted against the reference module (oracle)."""

import numpy as np
import pytest

REFERENCE_SURFACE = {
    "export_funcs": ["seg2csv", "seg2textgrid"],
    "io": ["media2sig16kmono"],
    "sidekit_mfcc": ["mfcc", "hz2mel", "mel2hz", "trfbank", "framing",
                     "pre_emphasis", "power_spectrum"],
    "features_vbx": ["framing", "mel", "mel_inv", "preemphasis",
                     "mel_fbank_mx", "fbank_htk", "povey_window",
                     "add_dither", "cmvn_floating_kaldi"],
    "viterbi_utils": ["pred2logemission", "log_trans_exp", "diag_trans_exp"],
    "pyannote_viterbi": ["viterbi_decoding", "VITERBI_CONSTRAINT_NONE",
                         "VITERBI_CONSTRAINT_FORBIDDEN",
                         "VITERBI_CONSTRAINT_MANDATORY"],
    "vbx_segmenter": ["VoiceFemininityScoring", "VBxExtractor",
                      "is_mid_speech", "add_needed_vectors",
                      "get_femininity_score", "get_annot_VAD",
                      "get_features"],
    "resnet": ["ResNet101"],
    "remote_utils": ["get_remote"],
    "thread_returning": ["ThreadReturning"],
    "segmenter": ["Segmenter"],
}


@pytest.mark.parametrize("mod,names", sorted(REFERENCE_SURFACE.items()))
def test_symbols_present(mod, names):
    import importlib

    m = importlib.import_module(f"inaspeechsegmenter_tpu.{mod}")
    missing = [n for n in names if not hasattr(m, n)]
    assert not missing, f"{mod} missing {missing}"


def test_thread_returning_join_returns_value():
    from inaspeechsegmenter_tpu.thread_returning import ThreadReturning

    t = ThreadReturning(target=lambda a, b: a + b, args=(2, 3))
    t.start()
    assert t.join() == 5


def test_host_framing_matches_reference(ref_features_vbx, rng):
    from inaspeechsegmenter_tpu.dsp.vbx_host import framing

    a = rng.standard_normal(1000)
    for window, shift in [(400, 160), (7, 3), (1000, 1)]:
        np.testing.assert_array_equal(
            framing(a, window, shift), ref_features_vbx.framing(a, window, shift))
    a2 = rng.standard_normal((300, 4))
    np.testing.assert_array_equal(
        framing(a2, 64, 32), ref_features_vbx.framing(a2, 64, 32))


def test_host_fbank_htk_matches_reference(ref_features_vbx, rng):
    from inaspeechsegmenter_tpu.dsp.vbx_host import fbank_htk
    from inaspeechsegmenter_tpu.dsp.mel import kaldi_mel_fbank

    sig = rng.standard_normal(16000) * 1000
    fb = kaldi_mel_fbank(400, 16000, numchans=64, lofreq=20.0, hifreq=7600,
                         htk_bug=False)
    win = ref_features_vbx.povey_window(400)
    for kw in [dict(USEPOWER=True, ZMEANSOURCE=True),
               dict(),
               dict(_E="first"), dict(_E="last"),
               dict(_E="first", RAWENERGY=False),
               dict(_E="last", ENORMALISE=False),
               dict(USEPOWER=4, PREEMCOEF=None)]:
        ours = fbank_htk(sig, win, 240, fb, **kw)
        ref = ref_features_vbx.fbank_htk(sig, win, 240, fb, **kw)
        np.testing.assert_allclose(ours, ref, rtol=1e-12, atol=1e-12)
    # scalar window (Hamming / rectangular)
    for ham in (True, False):
        np.testing.assert_allclose(
            fbank_htk(sig, 400, 240, fb, USEHAMMING=ham),
            ref_features_vbx.fbank_htk(sig, 400, 240, fb, USEHAMMING=ham),
            rtol=1e-12, atol=1e-12)


def test_host_cmvn_matches_reference(ref_features_vbx, rng):
    from inaspeechsegmenter_tpu.dsp.vbx_host import cmvn_floating_kaldi

    for n in (5, 150, 600):        # shorter than / around / beyond window
        x = rng.standard_normal((n, 64))
        for nv in (True, False):
            np.testing.assert_allclose(
                cmvn_floating_kaldi(x.copy(), 150, 149, norm_vars=nv),
                ref_features_vbx.cmvn_floating_kaldi(x.copy(), 150, 149,
                                                     norm_vars=nv),
                rtol=1e-10, atol=1e-12)


def test_host_get_features_matches_reference(ref_features_vbx, rng):
    """Full host chain (dither+pad+fbank+CMVN) == reference get_features
    (bit-compatible global-seed dither)."""
    from inaspeechsegmenter_tpu.dsp.vbx_host import get_features

    sig = np.clip(rng.standard_normal(16000) * 0.1, -1, 1)
    fv = ref_features_vbx
    noverlap, winlen = 240, 400
    window = fv.povey_window(winlen)
    fbank_mx = fv.mel_fbank_mx(winlen, 16000, NUMCHANS=64, LOFREQ=20.0,
                               HIFREQ=7600, htk_bug=False)
    np.random.seed(3)
    ref_sig = fv.add_dither((sig * 2 ** 15).astype(int))
    seg = np.r_[ref_sig[noverlap // 2 - 1::-1], ref_sig,
                ref_sig[-1:-winlen // 2 - 1:-1]]
    ref = fv.fbank_htk(seg, window, noverlap, fbank_mx, USEPOWER=True,
                       ZMEANSOURCE=True)
    ref = fv.cmvn_floating_kaldi(ref, 150, 149, norm_vars=False
                                 ).astype(np.float32)
    np.testing.assert_array_equal(get_features(sig), ref)


def test_mel_fbank_mx_reference_signature(ref_features_vbx):
    from inaspeechsegmenter_tpu.features_vbx import mel_fbank_mx

    ours = mel_fbank_mx(400, 16000, NUMCHANS=64, LOFREQ=20.0, HIFREQ=7600,
                        htk_bug=False)
    ref = ref_features_vbx.mel_fbank_mx(400, 16000, NUMCHANS=64, LOFREQ=20.0,
                                        HIFREQ=7600, htk_bug=False)
    np.testing.assert_array_equal(ours, ref)


def test_sidekit_framing_pre_emphasis(rng):
    """framing/pre_emphasis reproduce the reference sidekit semantics."""
    from inaspeechsegmenter_tpu.sidekit_mfcc import framing, pre_emphasis

    sig = rng.standard_normal(2000).astype(np.float32)
    f = framing(sig, 400, win_shift=160)
    assert f.shape == ((2000 - 400) // 160 + 1, 400)
    np.testing.assert_array_equal(f[0], sig[:400])
    np.testing.assert_array_equal(f[1], sig[160:560])
    # context + padding
    fc = framing(sig, 400, win_shift=160, context=(80, 80))
    assert fc.shape == (f.shape[0], 560)
    np.testing.assert_array_equal(fc[0][80:], sig[:480])
    np.testing.assert_array_equal(fc[0][:80], np.zeros(80))
    fe = framing(sig, 400, win_shift=160, context=(80, 0), pad="edge")
    np.testing.assert_array_equal(fe[0][:80], np.full(80, sig[0]))
    # reference squeezes a single-frame result down to (win,)
    one = framing(sig[:400], 400, win_shift=160)
    assert one.shape == (400,)
    np.testing.assert_array_equal(one, sig[:400])

    p = pre_emphasis(sig, 0.97)
    np.testing.assert_allclose(p[1:], sig[1:] - 0.97 * sig[:-1], rtol=1e-6)
    assert p[0] == sig[0] - 0.97 * sig[0]
    f2 = pre_emphasis(f, 0.97)
    np.testing.assert_allclose(f2[:, 0], f[:, 0] * (1 - 0.97), rtol=1e-5)


def test_trfbank_alias(rng):
    from inaspeechsegmenter_tpu.dsp.mel import htk_triangular_fbank
    from inaspeechsegmenter_tpu.sidekit_mfcc import trfbank

    fb, freqs = trfbank(16000, 512, 100, 8000, 0, 24)
    fb2, freqs2 = htk_triangular_fbank(16000, 512, 100, 8000, 0, 24)
    np.testing.assert_array_equal(fb, fb2)
    assert fb.shape == (24, 257)


def test_resnet101_compat_ctor():
    from inaspeechsegmenter_tpu.resnet import ResNet101

    net = ResNet101(feat_dim=64, embed_dim=256)
    assert net.num_blocks == (3, 4, 23, 3)
    with pytest.raises(NotImplementedError):
        ResNet101(squeeze_excitation=True)


def test_vbx_segmenter_helpers():
    from inaspeechsegmenter_tpu.vbx_segmenter import (get_annot_VAD,
                                                      is_mid_speech)

    vad = get_annot_VAD([("noEnergy", 0.0, 1.0), ("speech", 1.0, 3.0),
                         ("music", 3.0, 5.0), ("speech", 5.0, 6.0)])
    assert vad.total_duration() == 3.0
    assert is_mid_speech(1.0, 3.0, vad)          # mid 2.0 in speech
    assert not is_mid_speech(3.0, 5.0, vad)      # mid 4.0 in music
    assert is_mid_speech(4.5, 6.5, vad)          # mid 5.5 in 2nd interval


def test_slaney_mel_scale_matches_reference():
    """hz2mel/mel2hz htk=False (Slaney) must match the reference branch,
    including the scalar squeeze for shape-(1,) inputs."""
    from conftest import load_ref_module

    ref = load_ref_module("sidekit_mfcc")

    from inaspeechsegmenter_tpu.sidekit_mfcc import hz2mel, mel2hz

    f = np.array([0.0, 250.0, 999.0, 1000.0, 4000.0, 7999.0])
    np.testing.assert_allclose(hz2mel(f, htk=False),
                               ref.hz2mel(f, htk=False), rtol=1e-12)
    z = np.array([0.0, 10.0, 15.0, 25.0, 40.0])
    np.testing.assert_allclose(mel2hz(z, htk=False),
                               ref.mel2hz(z, htk=False), rtol=1e-12)
    assert np.isscalar(hz2mel(np.array([440.0]), htk=False)) or \
        np.ndim(hz2mel(np.array([440.0]), htk=False)) == 0


def test_framing_returns_writable_frames(rng):
    """The reference's framing returns writable frames (as_strided);
    notebook code mutates them in place — ours must allow that too."""
    from inaspeechsegmenter_tpu import features_vbx, sidekit_mfcc

    sig = rng.standard_normal(4000)
    f1 = features_vbx.framing(sig, 400, 160)
    f1 -= f1.mean(axis=1, keepdims=True)        # must not raise
    f2 = sidekit_mfcc.framing(sig, 400, 160)
    f2 -= f2.mean(axis=1, keepdims=True)
    assert f1.shape[1] == 400 and f2.shape[1] == 400


def test_power_spectrum_float64_matches_reference(rng):
    """power_spectrum preserves the input dtype: float64 signals (the
    reference io default) must reproduce the reference bit-for-bit."""
    from conftest import load_ref_module

    ref = load_ref_module("sidekit_mfcc")

    from inaspeechsegmenter_tpu.sidekit_mfcc import power_spectrum

    sig = rng.standard_normal(16000).astype(np.float64)
    spec_ours, loge_ours = power_spectrum(sig, fs=16000)
    spec_ref, loge_ref = ref.power_spectrum(sig, fs=16000)
    assert loge_ours.dtype == loge_ref.dtype == np.float64
    np.testing.assert_array_equal(loge_ours, loge_ref)
    np.testing.assert_allclose(spec_ours, spec_ref, rtol=1e-6, atol=1e-8)
