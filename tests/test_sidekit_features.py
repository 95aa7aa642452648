"""SIDEKIT feature frontend parity vs the reference mfcc chain."""

import numpy as np
import pytest

from inaspeechsegmenter_tpu.dsp import SidekitFrontend


@pytest.fixture(scope="module")
def frontend():
    return SidekitFrontend()


def _ref_feats(ref_sidekit, sig):
    import warnings
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        _, loge, _, mspec = ref_sidekit.mfcc(sig.astype(np.float32),
                                             get_mspec=True)
    return mspec, loge


def test_random_signal_parity(frontend, ref_sidekit, rng):
    sig = (rng.standard_normal(16000 * 5) * 0.1).astype(np.float32)
    mspec, loge = frontend.mspec_loge_np(sig)
    ref_mspec, ref_loge = _ref_feats(ref_sidekit, sig)
    assert mspec.shape == ref_mspec.shape
    np.testing.assert_allclose(loge, ref_loge, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(mspec, ref_mspec, rtol=1e-3, atol=2e-3)


def test_real_audio_parity(frontend, ref_sidekit, musanmix_sig):
    mspec, loge = frontend.mspec_loge_np(musanmix_sig)
    ref_mspec, ref_loge = _ref_feats(ref_sidekit, musanmix_sig)
    assert mspec.shape == ref_mspec.shape
    # silent regions produce -inf logs on both sides
    fin = np.isfinite(ref_mspec)
    np.testing.assert_array_equal(np.isfinite(mspec), fin)
    np.testing.assert_allclose(mspec[fin], ref_mspec[fin], rtol=1e-3, atol=3e-3)
    finl = np.isfinite(ref_loge)
    np.testing.assert_array_equal(np.isfinite(loge), finl)
    np.testing.assert_allclose(loge[finl], ref_loge[finl], rtol=1e-4, atol=1e-3)


def test_chunk_boundaries(frontend, ref_sidekit, rng):
    """Signal spanning multiple device chunks: no seams at chunk edges."""
    from inaspeechsegmenter_tpu.dsp import CHUNK

    n = (2 * CHUNK + 100) * 160 + 400
    r = np.random.default_rng(5)
    sig = (r.standard_normal(n) * 0.1).astype(np.float32)
    mspec, loge = frontend.mspec_loge_np(sig)
    ref_mspec, ref_loge = _ref_feats(ref_sidekit, sig)
    assert mspec.shape == ref_mspec.shape
    np.testing.assert_allclose(mspec, ref_mspec, rtol=1e-3, atol=2e-3)


def test_frame_count_and_energy_semantics(frontend, ref_sidekit, rng):
    """Log-energy must be post-pre-emphasis, pre-window (sidekit order)."""
    sig = (rng.standard_normal(16000) * 0.3).astype(np.float32)
    _, loge = frontend.mspec_loge_np(sig)
    _, ref_loge = _ref_feats(ref_sidekit, sig)
    assert len(loge) == (len(sig) - 400) // 160 + 1
    np.testing.assert_allclose(loge, ref_loge, rtol=1e-4, atol=1e-4)


def test_int16_input_identical(frontend, rng):
    """int16 input with device-side conversion must equal the float32 path
    bit-for-bit (int16/2^15 is exactly representable)."""
    i16 = (rng.standard_normal(16000) * 8000).astype(np.int16)
    f32 = i16.astype(np.float32) / 32768.0
    m1, l1 = frontend.mspec_loge_np(i16)
    m2, l2 = frontend.mspec_loge_np(f32)
    np.testing.assert_array_equal(m1, m2)
    np.testing.assert_array_equal(l1, l2)


def test_media2sig_auto(media_dir):
    """'auto' dtype returns int16 for PCM16-mono-16k sources, equivalent to
    the float32 read."""
    from inaspeechsegmenter_tpu.audio import media2sig16kmono

    a = media2sig16kmono(f"{media_dir}/musanmix.wav", ffmpeg=None,
                         dtype="auto")
    assert a.dtype == np.int16
    f = media2sig16kmono(f"{media_dir}/musanmix.wav", ffmpeg=None,
                         dtype="float32")
    np.testing.assert_array_equal(a.astype(np.float32) / 32768.0, f)


def test_streamed_equals_monolithic(frontend, rng):
    """The chunk-streamed upload path must equal the single-dispatch
    `_features_padded` program bit-for-bit."""
    import jax.numpy as jnp

    sig = (rng.standard_normal(16000 * 50) * 0.2).astype(np.float32)
    m1, l1, t = frontend.mspec_loge(sig)
    from inaspeechsegmenter_tpu.dsp.sidekit import CHUNK, HOP

    n_chunks = m1.shape[0] // CHUNK
    need = (n_chunks * CHUNK + 2) * HOP
    pad = np.pad(sig, (0, max(0, need - len(sig))))[:need]
    m2, l2 = frontend._features_padded(jnp.asarray(pad))
    np.testing.assert_array_equal(np.asarray(m1), np.asarray(m2))
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))


def test_cepstra_parity(frontend, ref_sidekit, rng):
    sig = (rng.standard_normal(16000 * 2) * 0.2).astype(np.float32)
    mspec, _ = frontend.mspec_loge_np(sig)
    ceps = frontend.cepstra(mspec)
    ref_ceps, _, _, _ = ref_sidekit.mfcc(sig.astype(np.float32), get_mspec=True)
    assert ceps.shape == ref_ceps.shape
    np.testing.assert_allclose(ceps, ref_ceps, rtol=1e-2, atol=5e-3)


def test_mfcc_convenience_parity(ref_sidekit, rng):
    """Reference-signature `sidekit_mfcc.mfcc` convenience entry returns
    [ceps, loge, spec, mspec] matching the reference function (reference
    sidekit_mfcc.py:278-352), incl. non-default filter counts."""
    from inaspeechsegmenter_tpu.sidekit_mfcc import mfcc

    sig = (rng.standard_normal(16000 * 2) * 0.1).astype(np.float32)
    ours = mfcc(sig, get_spec=True, get_mspec=True)
    ref = ref_sidekit.mfcc(sig, get_spec=True, get_mspec=True)
    assert len(ours) == len(ref) == 4
    for a, b in zip(ours, ref):
        assert a.shape == b.shape
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)
    # non-default band/filter config exercises the generic fbank path
    ours = mfcc(sig, lowfreq=50, maxfreq=7000, nlogfilt=30, nceps=10)
    ref = ref_sidekit.mfcc(sig, lowfreq=50, maxfreq=7000, nlogfilt=30,
                           nceps=10)
    np.testing.assert_allclose(ours[0], ref[0], rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(ours[1], ref[1], rtol=1e-6, atol=1e-6)
