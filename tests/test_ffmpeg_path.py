"""ffmpeg decode path tests using a fake ffmpeg executable.

No real ffmpeg exists in this environment, so a stand-in script parses the
reference command line (validating the exact flags the reference builds,
io.py:61-68), applies -ss/-to windowing, resamples with scipy, and streams a
WAV with bogus RIFF sizes to stdout like real `ffmpeg ... pipe:1` does.
"""

import os
import stat
import sys
import textwrap

import numpy as np
import pytest

from inaspeechsegmenter_tpu.audio import media2sig16kmono, write_wav


@pytest.fixture()
def fake_ffmpeg(tmp_path):
    script = tmp_path / "ffmpeg"
    script.write_text(textwrap.dedent(f"""\
        #!{sys.executable}
        import sys, numpy as np
        sys.path.insert(0, {repr(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))})
        from inaspeechsegmenter_tpu.audio import read_wav
        args = sys.argv[1:]
        def val(flag):
            return args[args.index(flag) + 1] if flag in args else None
        infile = val('-i')
        assert val('-f') == 'wav' and val('-acodec') == 'pcm_s16le'
        assert val('-ar') == '16000' and val('-ac') == '1'
        assert args[-1] == 'pipe:1'
        sig, sr = read_wav(infile, dtype='float64')
        if sig.ndim > 1:
            sig = sig.mean(axis=1)
        if sr != 16000:
            import math
            from scipy.signal import resample_poly
            g = math.gcd(sr, 16000)
            sig = resample_poly(sig, 16000 // g, sr // g)
        start = float(val('-ss')) if val('-ss') else 0.0
        stop = float(val('-to')) if val('-to') else None
        a = int(start * 16000)
        b = int(stop * 16000) if stop is not None else len(sig)
        sig = sig[a:b]
        pcm = np.clip(np.rint(sig * 32768.0), -32768, 32767).astype('<i2')
        raw = pcm.tobytes()
        import struct
        fmt = struct.pack('<HHIIHH', 1, 1, 16000, 32000, 2, 16)
        # streamed wav: bogus 0xFFFFFFFF sizes like ffmpeg pipes emit
        out = (b'RIFF' + b'\\xff\\xff\\xff\\xff' + b'WAVE'
               + b'fmt ' + struct.pack('<I', len(fmt)) + fmt
               + b'data' + b'\\xff\\xff\\xff\\xff' + raw)
        sys.stdout.buffer.write(out)
    """))
    script.chmod(script.stat().st_mode | stat.S_IEXEC)
    return str(script)


@pytest.fixture()
def wav_44k(tmp_path, rng):
    sig = np.clip(rng.standard_normal(44100 * 2) * 0.2, -1, 1)
    p = str(tmp_path / "in44.wav")
    write_wav(p, sig, 44100, subtype="FLOAT")
    return p, sig


def test_ffmpeg_decode_resample(fake_ffmpeg, wav_44k):
    p, sig = wav_44k
    out = media2sig16kmono(p, ffmpeg=fake_ffmpeg, dtype="float32")
    assert abs(len(out) - 32000) <= 2
    assert np.abs(out).max() > 0.01


def test_ffmpeg_start_stop(fake_ffmpeg, tmp_path, rng):
    sig = np.clip(rng.standard_normal(16000 * 4) * 0.2, -1, 1)
    p = str(tmp_path / "in16.wav")
    write_wav(p, sig, 16000, subtype="PCM_16")
    out = media2sig16kmono(p, start_sec=1.0, stop_sec=2.5,
                           ffmpeg=fake_ffmpeg, dtype="float64")
    assert abs(len(out) - 16000 * 1.5) <= 2
    np.testing.assert_allclose(out[:100], sig[16000:16100], atol=2 / 32768)


def test_ffmpeg_error_propagates(fake_ffmpeg):
    # the decode error contract: ffmpeg's nonzero exit surfaces as a
    # RuntimeError carrying its stderr (audio/io.py:100) — a bare
    # Exception assert would also pass on unrelated crashes
    with pytest.raises(RuntimeError):
        media2sig16kmono("/nonexistent/file.mp3", ffmpeg=fake_ffmpeg)


def test_segmenter_with_ffmpeg(fake_ffmpeg, wav_44k, synthetic_model_dir):
    """Full Segmenter through the (fake) ffmpeg decode path, including
    start_sec/stop_sec windows that are rejected without ffmpeg."""
    from inaspeechsegmenter_tpu import Segmenter

    p, _ = wav_44k
    seg = Segmenter(vad_engine="smn", detect_gender=False,
                    ffmpeg=fake_ffmpeg, allow_download=False)
    out = seg(p, start_sec=0.25, stop_sec=1.75)
    assert out[0][1] == 0.25
    assert out[-1][2] <= 0.25 + 1.5 + 0.02
    for (l1, s1, e1), (l2, s2, e2) in zip(out[:-1], out[1:]):
        assert e1 == s2
