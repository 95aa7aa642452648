"""Media decode: anything -> 16 kHz mono PCM on the host.

Mirrors the behavior of the reference `media2sig16kmono`
(reference io.py:32-79):

* With ffmpeg available, any media/url is decoded via an ffmpeg subprocess
  piping 16 kHz mono pcm_s16le WAV to stdout, honoring start/stop windows
  pushed into `-ss`/`-to`.
* With ``ffmpeg=None``, only local 16 kHz WAV files are accepted and
  start/stop/url raise NotImplementedError — identical contract to the
  reference no-ffmpeg path (io.py:37-55) — except parsing uses the
  first-party RIFF reader instead of libsndfile.

This is the single host-side stage of the pipeline; everything downstream is
device-resident.
"""

from __future__ import annotations

import os
import shutil
import subprocess

import numpy as np

from .wav import read_wav

SR = 16000


def _cast_signal(sig, dtype):
    """Cast float samples to the requested dtype: integer targets are
    rounded and saturated (a bare astype would truncate and WRAP overshoot
    past full scale into opposite-sign clicks)."""
    out_dtype = np.dtype(dtype)
    if out_dtype.kind in "iu":
        info = np.iinfo(out_dtype)
        sig = np.clip(np.rint(sig), info.min, info.max)
    return sig.astype(out_dtype)


def media2sig16kmono(medianame, start_sec=None, stop_sec=None, ffmpeg="ffmpeg",
                     dtype="float64"):
    """Decode a media file to a 16 kHz mono signal.

    :param dtype: numpy dtype, or 'auto' — 'auto' returns int16 when the
        source is losslessly 16-bit PCM mono (halving host->device transfer;
        int16/2^15 converts to the identical float32 on device) and float32
        otherwise.
    :return: 1-D numpy array.
    """
    if dtype == "auto":
        return _media2sig_auto(medianame, start_sec, stop_sec, ffmpeg)
    if ffmpeg is None:
        if start_sec is not None or stop_sec is not None:
            raise NotImplementedError(
                f"start_sec={start_sec} and stop_sec={stop_sec} cannot be set "
                f"when running without ffmpeg. Please cut down your audio "
                f"files beforehand or use ffmpeg."
            )
        if medianame.startswith("http://") or medianame.startswith("https://"):
            raise NotImplementedError(
                f"Without ffmpeg you cannot process media content on http "
                f"servers. You need to download your audio files beforehand "
                f"or use ffmpeg. You gave medianame={medianame}."
            )
        sig, sr = read_wav(medianame, dtype=dtype)
        if sig.ndim > 1:
            # mono mixdown (capability superset: the reference returns the
            # 2-D array as-is); honor the requested dtype — int16 callers
            # branch on it for the half-size upload path
            sig = _cast_signal(sig.mean(axis=1), dtype)
        if sr != SR:
            # capability superset over the reference no-ffmpeg path: if the
            # native resampler (native/issaudio.cc) is built, accept any WAV
            # rate; otherwise keep the reference's 16 kHz-only contract
            from . import native

            if native.available():
                sig = native.resample(sig.astype(np.float32), sr, SR)
                # sinc overshoot past full scale must saturate, not wrap
                return _cast_signal(sig, dtype)
            assert sr == SR, (
                f"Without ffmpeg, only files sampled at 16000 Hz are "
                f"supported (build native/issaudio for resampling). "
                f"The file {medianame} is sampled at {sr} Hz."
            )
        return sig

    cmd = [ffmpeg, "-i", medianame, "-f", "wav", "-acodec", "pcm_s16le",
           "-ar", str(SR), "-ac", "1"]
    if start_sec is not None:
        cmd += ["-ss", "%f" % start_sec]
    if stop_sec is not None:
        cmd += ["-to", "%f" % stop_sec]
    cmd += ["pipe:1"]

    proc = subprocess.run(cmd, stdout=subprocess.PIPE, stderr=subprocess.PIPE)
    if proc.returncode != 0:
        raise RuntimeError(proc.stderr.decode(errors="replace"))
    # ffmpeg writes a streaming WAV with an unknown-length data chunk; the
    # RIFF sizes may be 0xFFFFFFFF — patch the actual size before parsing.
    sig, sr = read_wav(_fix_streamed_riff(proc.stdout), dtype=dtype)
    assert sr == SR
    return sig


def _media2sig_auto(medianame, start_sec, stop_sec, ffmpeg):
    if ffmpeg is not None:
        # ffmpeg emits pcm_s16le: int16 is always exact on this path
        return media2sig16kmono(medianame, start_sec, stop_sec, ffmpeg,
                                "int16")
    import struct

    from .wav import WavFormatError, _read_chunks, read_wav

    if (start_sec is not None or stop_sec is not None
            or medianame.startswith("http://")
            or medianame.startswith("https://")):
        # delegate to the float path, which enforces (and raises) the
        # reference no-ffmpeg restrictions
        return media2sig16kmono(medianame, start_sec, stop_sec, ffmpeg,
                                "float32")
    try:
        # walk the RIFF chunks for the real fmt header — scanning raw bytes
        # for b"fmt " can hit a stale header copy inside a JUNK/LIST chunk
        fmt = None
        with open(medianame, "rb") as f:
            for cid, size, offset in _read_chunks(f):
                if cid == b"fmt ":
                    f.seek(offset)
                    raw = f.read(size)
                    if len(raw) >= 16:
                        fmt = struct.unpack("<HHIIHH", raw[:16])
                    break
        if fmt is not None:
            code, channels, sr, _, _, bits = fmt
            if code == 1 and bits == 16 and channels == 1 and sr == SR:
                sig, sr = read_wav(medianame, dtype="int16")
                return sig
    except (OSError, WavFormatError, struct.error):
        pass
    return media2sig16kmono(medianame, start_sec, stop_sec, ffmpeg, "float32")


def _fix_streamed_riff(blob: bytes) -> bytes:
    """Rewrite bogus RIFF/data sizes emitted when ffmpeg streams to a pipe."""
    if len(blob) < 44:
        return blob
    ba = bytearray(blob)
    # clamp to the 4-byte RIFF field for >= 4 GiB streams (~37 h at 16 kHz
    # mono s16le); 0xFFFFFFFE keeps the s16 sample alignment and read_wav
    # truncates payloads to whole frames
    ba[4:8] = min(len(blob) - 8, 0xFFFFFFFE).to_bytes(4, "little")
    # walk the chunk headers for the real data chunk — a raw find() can
    # land inside LIST/INFO metadata text containing "data" (ffmpeg passes
    # source tags through), patching 4 bytes of metadata and leaving the
    # real bogus size in place.  Pre-data chunk sizes are valid (ffmpeg
    # writes them before streaming); the data chunk's own bogus size is
    # exactly what we are here to fix, and the walk stops there.
    idx = -1
    pos = 12
    while pos + 8 <= len(blob):
        cid = blob[pos:pos + 4]
        size = int.from_bytes(blob[pos + 4:pos + 8], "little")
        if cid == b"data":
            idx = pos
            break
        pos += 8 + size + (size & 1)
    if idx >= 0:
        size = min(len(blob) - idx - 8, 0xFFFFFFFE)
        if len(blob) - idx - 8 > size:
            import warnings

            warnings.warn(
                "streamed WAV exceeds the 4 GiB RIFF limit (~37 h at "
                "16 kHz mono); audio past that point is dropped — use "
                "start_sec/stop_sec to window very long media")
        ba[idx + 4: idx + 8] = size.to_bytes(4, "little")
    return bytes(ba)


def check_ffmpeg(ffmpeg):
    """Validate the ffmpeg binary like the reference ctor (segmenter.py:227-231)."""
    if ffmpeg is not None and shutil.which(ffmpeg) is None:
        raise Exception("ffmpeg program not found")
    return ffmpeg
