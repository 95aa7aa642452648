"""Native C++ audio library (WAV decode + polyphase resample) tests.

Skipped when libissaudio.so is not built (`make -C native`).
"""

import io

import numpy as np
import pytest

from inaspeechsegmenter_tpu.audio import write_wav, read_wav
from inaspeechsegmenter_tpu.audio import native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library not built")


def test_decode_float_bitexact(rng):
    sig = np.clip(rng.standard_normal(10000) * 0.3, -1, 1).astype(np.float32)
    buf = io.BytesIO()
    write_wav(buf, sig, 44100, subtype="FLOAT")
    dec, sr = native.decode_mono_f32(buf.getvalue())
    assert sr == 44100
    np.testing.assert_array_equal(dec, sig)


@pytest.mark.parametrize("subtype,tol", [("PCM_16", 1e-7), ("PCM_32", 1e-7)])
def test_decode_pcm_matches_python_reader(rng, subtype, tol):
    sig = np.clip(rng.standard_normal(5000) * 0.5, -0.99, 0.99)
    buf = io.BytesIO()
    write_wav(buf, sig, 16000, subtype=subtype)
    blob = buf.getvalue()
    dec, sr = native.decode_mono_f32(blob)
    ref, _ = read_wav(blob, dtype="float32")
    np.testing.assert_allclose(dec, ref, atol=tol)


def test_stereo_mixdown(rng):
    left = rng.standard_normal(1000).astype(np.float32) * 0.2
    right = rng.standard_normal(1000).astype(np.float32) * 0.2
    buf = io.BytesIO()
    write_wav(buf, np.stack([left, right], 1), 8000, subtype="FLOAT")
    dec, _ = native.decode_mono_f32(buf.getvalue())
    np.testing.assert_allclose(dec, (left + right) / 2, atol=1e-6)


@pytest.mark.parametrize("sr_in", [8000, 22050, 44100, 48000])
def test_resample_sine_quality(sr_in):
    """A mid-band tone must survive resampling to 16 kHz almost exactly."""
    t = np.arange(sr_in * 2) / sr_in
    tone = np.sin(2 * np.pi * 440 * t).astype(np.float32)
    out = native.resample(tone, sr_in, 16000)
    expect_len = len(tone) * 16000 // sr_in
    assert abs(len(out) - expect_len) <= 1
    t16 = np.arange(len(out)) / 16000
    ideal = np.sin(2 * np.pi * 440 * t16)
    err = np.abs(out[200:-200] - ideal[200:-200]).max()
    assert err < 1e-3, (sr_in, err)


def test_decode_to_16k_mono(tmp_path, rng):
    sig = np.clip(rng.standard_normal(44100) * 0.2, -1, 1).astype(np.float32)
    p = str(tmp_path / "a.wav")
    write_wav(p, sig, 44100, subtype="FLOAT")
    out = native.decode_to_16k_mono(p)
    assert abs(len(out) - 16000) <= 1


def test_io_path_resamples_non16k(tmp_path, rng):
    """media2sig16kmono without ffmpeg accepts non-16k WAV via the native
    resampler (capability superset over the reference contract)."""
    from inaspeechsegmenter_tpu.audio import media2sig16kmono

    sig = np.clip(rng.standard_normal(32000) * 0.2, -1, 1).astype(np.float32)
    p = str(tmp_path / "b.wav")
    write_wav(p, sig, 32000, subtype="FLOAT")
    out = media2sig16kmono(p, ffmpeg=None, dtype="float32")
    assert abs(len(out) - 16000) <= 1


def test_resample_antialiasing():
    """Above-Nyquist input must not leak through (the sinc center tap was
    once a factor L too large, making polyphase phase 0 a passthrough)."""
    native = pytest.importorskip("inaspeechsegmenter_tpu.audio.native")
    if not native.available():
        pytest.skip("native lib not built")
    sr_in, sr_out = 44100, 16000
    t = np.arange(sr_in) / sr_in
    alias = native.resample(
        np.sin(2 * np.pi * 9777 * t).astype(np.float32), sr_in, sr_out)
    assert np.abs(alias[100:-100]).max() < 0.15
    keep = native.resample(
        np.sin(2 * np.pi * 1000 * t).astype(np.float32), sr_in, sr_out)
    rms = np.sqrt(np.mean(keep[100:-100] ** 2))
    assert abs(rms - 1 / np.sqrt(2)) < 0.01
