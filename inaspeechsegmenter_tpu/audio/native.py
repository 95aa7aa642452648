"""ctypes bindings for the native audio library (native/issaudio.cc).

Provides WAV decode + mono mixdown + polyphase resampling to 16 kHz as a
C++ shared library, replacing the reference's libsndfile/ffmpeg native
surface for WAV inputs.  Falls back gracefully (returns None from
`load_library`) when the library is not built — the pure-Python RIFF reader
remains the portable path.

Build: `make -C native` (writes libissaudio.so next to this module).
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB = None
_TRIED = False
_PACK_OK = False   # iss_pack_bits present AND speaks the current format


def _pack_format_ok(lib) -> bool:
    """True when the library's pack_bits writes the CURRENT codec format.

    The dsp/codec.py bit-packing format changed in issaudio 0.3.0 (exact
    odd/even widths, 32-byte sub-rows); a stale 0.2.x build would encode
    buffers the v2 device decoder garbles.  Gate on the version string so
    mixed builds fall back to the (byte-identical) numpy encoder instead.
    """
    try:
        lib.iss_version.restype = ctypes.c_char_p
        ver = lib.iss_version().decode()          # "issaudio-X.Y.Z"
        parts = tuple(int(p) for p in ver.rsplit("-", 1)[1].split("."))
        return parts >= (0, 3, 0)
    except (AttributeError, IndexError, ValueError, UnicodeDecodeError):
        return False


def load_library():
    """Load libissaudio.so if present; returns ctypes lib or None."""
    global _LIB, _TRIED, _PACK_OK
    if _TRIED:
        return _LIB
    _TRIED = True
    candidates = [
        os.environ.get("ISS_AUDIO_LIB"),
        os.path.join(os.path.dirname(__file__), "libissaudio.so"),
    ]
    for path in candidates:
        if path and os.path.exists(path):
            try:
                lib = ctypes.CDLL(path)
            except OSError:
                continue
            lib.iss_wav_info.restype = ctypes.c_int64
            lib.iss_wav_info.argtypes = [
                ctypes.c_char_p, ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int32)]
            lib.iss_wav_decode_f32.restype = ctypes.c_int64
            lib.iss_wav_decode_f32.argtypes = [
                ctypes.c_char_p, ctypes.c_int64,
                ctypes.POINTER(ctypes.c_float), ctypes.c_int64]
            lib.iss_resample.restype = ctypes.c_int64
            lib.iss_resample.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
                ctypes.c_int32, ctypes.c_int32,
                ctypes.POINTER(ctypes.c_float), ctypes.c_int64]
            if hasattr(lib, "iss_pack_bits") and _pack_format_ok(lib):
                lib.iss_pack_bits.restype = ctypes.c_int64
                lib.iss_pack_bits.argtypes = [
                    ctypes.POINTER(ctypes.c_int16), ctypes.c_int64,
                    ctypes.c_double,
                    ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64]
                _PACK_OK = True
            _LIB = lib
            return _LIB
    return None


def available():
    return load_library() is not None


def wav_info(blob: bytes):
    """(samplerate, channels, n_frames, bits) or None."""
    lib = load_library()
    if lib is None:
        return None
    sr = ctypes.c_int32()
    ch = ctypes.c_int32()
    nf = ctypes.c_int64()
    bits = ctypes.c_int32()
    ret = lib.iss_wav_info(blob, len(blob), ctypes.byref(sr),
                           ctypes.byref(ch), ctypes.byref(nf),
                           ctypes.byref(bits))
    if ret != 0:
        return None
    return sr.value, ch.value, nf.value, bits.value


def decode_mono_f32(blob: bytes):
    """Decode a WAV blob to mono float32; returns (signal, samplerate)."""
    lib = load_library()
    info = wav_info(blob)
    if lib is None or info is None:
        raise ValueError("native decode unavailable or not a WAV")
    sr, _ch, n_frames, _bits = info
    out = np.empty(n_frames, np.float32)
    n = lib.iss_wav_decode_f32(
        blob, len(blob), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n_frames)
    if n < 0:
        raise ValueError("native WAV decode failed")
    return out[:n], sr


def resample(sig: np.ndarray, sr_in: int, sr_out: int = 16000):
    """Polyphase sinc resample float32 mono signal."""
    lib = load_library()
    if lib is None:
        raise RuntimeError("native audio library not built (make -C native)")
    sig = np.ascontiguousarray(sig, np.float32)
    cap = int(len(sig) * sr_out / sr_in) + 16
    out = np.empty(cap, np.float32)
    n = lib.iss_resample(
        sig.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(sig),
        sr_in, sr_out, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        cap)
    if n < 0:
        raise ValueError("native resample failed")
    return out[:n]


def pack_bits(sig_i16: np.ndarray, min_save: float = 0.05):
    """Native single-pass encoder for the predictive bit-packing upload
    codec (dsp/codec.py) — byte-identical to the numpy reference encoder.

    :return: packed uint8 array, a 0-length array when packing would not
        save ``min_save`` of the raw bytes (decline — caller falls back to
        elision/raw), or None when the native library (or the symbol, in
        pre-0.2 builds — or a pre-0.3 FORMAT, see `_pack_format_ok`) is
        unavailable and the numpy encoder should run.
    """
    lib = load_library()
    if lib is None or not _PACK_OK:
        return None
    sig = np.ascontiguousarray(sig_i16, np.int16)
    nb = len(sig) // 320
    cap = nb * 640 + 5 * nb + 2 * 128 * 1024
    out = np.empty(cap, np.uint8)
    n = lib.iss_pack_bits(
        sig.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)), len(sig),
        min_save, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), cap)
    if n < 0:
        return None          # unexpected; numpy path takes over
    if n == 0:
        return out[:0]       # declined
    return out[:n]


def decode_to_16k_mono(path_or_blob):
    """WAV file/bytes -> (16 kHz mono float32 signal). Uses the native
    decoder + resampler; any input rate accepted."""
    if isinstance(path_or_blob, (bytes, bytearray)):
        blob = bytes(path_or_blob)
    else:
        with open(path_or_blob, "rb") as f:
            blob = f.read()
    sig, sr = decode_mono_f32(blob)
    if sr != 16000:
        sig = resample(sig, sr, 16000)
    return sig
