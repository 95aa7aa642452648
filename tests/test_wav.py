"""WAV reader/writer tests: roundtrips, scipy cross-check, real fixtures."""

import io

import numpy as np
import pytest
from scipy.io import wavfile

from inaspeechsegmenter_tpu.audio import read_wav, write_wav

pytestmark = pytest.mark.smoke


@pytest.mark.parametrize("subtype", ["PCM_16", "PCM_32", "FLOAT", "DOUBLE"])
def test_roundtrip(subtype, rng):
    sig = np.clip(rng.standard_normal(1000) * 0.3, -0.99, 0.99).astype(np.float64)
    buf = io.BytesIO()
    write_wav(buf, sig, 16000, subtype=subtype)
    out, sr = read_wav(buf.getvalue(), dtype="float64")
    assert sr == 16000
    tol = {"PCM_16": 1 / 32768, "PCM_32": 1e-9, "FLOAT": 1e-7, "DOUBLE": 0}[subtype]
    np.testing.assert_allclose(out, sig, atol=tol + 1e-12)


def test_vs_scipy_pcm16(tmp_path, rng):
    sig = (rng.standard_normal(5000) * 10000).astype(np.int16)
    p = tmp_path / "x.wav"
    wavfile.write(str(p), 16000, sig)
    out, sr = read_wav(str(p), dtype="int16")
    assert sr == 16000
    np.testing.assert_array_equal(out, sig)
    # float scaling matches libsndfile convention (int/2^15)
    outf, _ = read_wav(str(p), dtype="float64")
    np.testing.assert_allclose(outf, sig / 32768.0, atol=0)


def test_real_fixture(media_dir):
    sig, sr = read_wav(f"{media_dir}/musanmix.wav", dtype="float32")
    assert sr == 16000
    assert sig.ndim == 1
    ref_sr, ref = wavfile.read(f"{media_dir}/musanmix.wav")
    assert len(sig) == len(ref)
    np.testing.assert_allclose(sig, ref / 32768.0, atol=1e-7)


def test_stereo(tmp_path, rng):
    sig = (rng.standard_normal((100, 2)) * 0.1).astype(np.float32)
    p = tmp_path / "st.wav"
    write_wav(str(p), sig, 8000, subtype="FLOAT")
    out, sr = read_wav(str(p), dtype="float32")
    assert sr == 8000
    assert out.shape == (100, 2)
    np.testing.assert_allclose(out, sig, atol=0)


def test_malformed_inputs_raise_cleanly():
    """Corrupt/truncated bytes raise WavFormatError, never crash or hang."""
    import struct

    import numpy as np

    from inaspeechsegmenter_tpu.audio.wav import (WavFormatError, read_wav,
                                                  write_wav)
    import io

    buf = io.BytesIO()
    write_wav(buf, np.zeros(100, np.float32), 16000)
    good = buf.getvalue()

    for bad in [b"", b"RIFF", b"nope" + good[4:],
                good[:8] + b"XXXX" + good[12:],          # not WAVE
                good[:20],                               # truncated fmt
                good[:12] + b"data" + struct.pack("<I", 4) + b"abcd"]:
        try:
            read_wav(bad)
        except WavFormatError:
            continue
        raise AssertionError(f"no clean error for {bad[:16]!r}")

    # unsupported format code
    mutated = bytearray(good)
    mutated[20:22] = struct.pack("<H", 0x0055)           # MP3-in-WAV
    try:
        read_wav(bytes(mutated))
        raise AssertionError("format code 0x55 accepted")
    except WavFormatError as e:
        assert "0x55" in str(e)

    # a data chunk truncated mid-frame still decodes whole frames
    sig, sr = read_wav(good[:-3])
    assert sr == 16000 and sig.shape == (98,)

    # truncated WAVE_FORMAT_EXTENSIBLE: fmt declares size 40 but the
    # stream ends before the SubFormat GUID — still a clean error
    ext = bytearray(good)
    ext[20:22] = struct.pack("<H", 0xFFFE)
    ext[16:20] = struct.pack("<I", 40)          # declared fmt size
    try:
        read_wav(bytes(ext[:36]))               # EOF inside the fmt chunk
    except WavFormatError:
        pass
    else:
        raise AssertionError("truncated extensible fmt accepted")


def test_pcm24():
    """Hand-crafted PCM_24 file decodes with correct sign extension."""
    import struct

    import numpy as np

    from inaspeechsegmenter_tpu.audio.wav import read_wav

    vals = np.array([0, 1, -1, 8388607, -8388608, 123456], dtype=np.int32)
    payload = b"".join(int(v & 0xFFFFFF).to_bytes(3, "little") for v in vals)
    fmt = struct.pack("<HHIIHH", 1, 1, 16000, 16000 * 3, 3, 24)
    body = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(payload)) + payload
    blob = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body
    out, sr = read_wav(blob, dtype="float64")
    np.testing.assert_allclose(out, vals / 8388608.0, atol=1e-12)


def test_float_fullscale_to_int32_no_wrap(tmp_path):
    """A full-scale float sample (1.0) read/written as int32 must clip to
    INT32_MAX, not wrap to INT32_MIN (the clip bound 2**31-1 is
    unrepresentable in float32, so float32 arithmetic wraps)."""
    from inaspeechsegmenter_tpu.audio import read_wav, write_wav

    sig = np.array([1.0, -1.0, 0.0, 0.5], np.float32)
    p = str(tmp_path / "f32.wav")
    write_wav(p, sig, 16000, subtype="FLOAT")
    out, sr = read_wav(p, dtype="int32")
    assert out[0] == 2**31 - 1 and out[1] == -(2**31)
    # write path: PCM_32 from float32 full-scale
    p2 = str(tmp_path / "i32.wav")
    write_wav(p2, sig, 16000, subtype="PCM_32")
    out2, _ = read_wav(p2, dtype="float64")
    assert out2[0] > 0.99 and abs(out2[1] + 1.0) < 1e-9


def test_float_to_int16_rounds_like_libsndfile(tmp_path):
    """Float sources read as int16 round to nearest (libsndfile lrintf),
    not truncate toward zero."""
    from inaspeechsegmenter_tpu.audio import read_wav, write_wav

    # 0.5000229*32768 = 16384.75: rint -> 16385, truncation -> 16384
    sig = np.array([16384.75 / 32768.0, -16384.75 / 32768.0], np.float64)
    p = str(tmp_path / "f64.wav")
    write_wav(p, sig, 16000, subtype="DOUBLE")
    out, _ = read_wav(p, dtype="int16")
    assert out[0] == 16385 and out[1] == -16385


def test_fix_streamed_riff_skips_metadata_containing_data():
    """_fix_streamed_riff must patch the REAL data chunk header by walking
    the chunk list — a raw find() lands inside LIST/INFO metadata text
    containing 'data' (ffmpeg passes source tags through), corrupting the
    metadata and leaving the bogus data size in place."""
    import io as _io
    import struct

    from inaspeechsegmenter_tpu.audio import read_wav
    from inaspeechsegmenter_tpu.audio.io import _fix_streamed_riff

    payload = np.arange(100, dtype="<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, 16000, 32000, 2, 16)
    info = b"INFO" + b"INAM" + struct.pack("<I", 16) + b"database lecture"
    body = (b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"LIST" + struct.pack("<I", len(info)) + info
            + b"data" + struct.pack("<I", 0xFFFFFFFF) + payload)
    blob = b"RIFF" + struct.pack("<I", 0xFFFFFFFF) + b"WAVE" + body
    fixed = _fix_streamed_riff(blob)
    assert b"database lecture" in fixed          # metadata untouched
    data_off = 12 + 8 + len(fmt) + 8 + len(info)
    assert fixed[data_off:data_off + 4] == b"data"
    size = struct.unpack("<I", fixed[data_off + 4:data_off + 8])[0]
    assert size == len(payload)
    sig, sr = read_wav(_io.BytesIO(fixed), dtype="int16")
    assert sr == 16000
    np.testing.assert_array_equal(sig, np.arange(100, dtype=np.int16))
