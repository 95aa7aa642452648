"""Host-side SIDEKIT frontend: upload features, not audio.

Same semantics as the device frontend (dsp/sidekit.py, itself parity-tested
against reference sidekit_mfcc.py:200-352): framing 400/160, per-frame
pre-emphasis 0.97, log-energy after pre-emphasis / before windowing, Hann
window, 512-pt rFFT power spectrum, 24 HTK-mel filters, log.

Why it exists: the dominant cost on link-limited hosts is the host->device
transfer of the raw signal — 320 bytes per frame (int16 PCM) vs 100 bytes
per frame for the (mspec, loge) features (25 float32).  Computing features
on the host CPU (scipy pocketfft + BLAS, both release the GIL, so prefetch
threads parallelize across files) cuts link bytes 3.2x and turns a
link-bound pipeline into a compute-bound one.  On hosts with a fat PCIe
link the device frontend wins (the CPU is free); `segmenter._default_frontend`
measures the link once and picks.

Padding semantics: rows in [t, bucket) are filled with -inf, exactly the
value the device frontend computes for all-zero padded frames (log of a zero
power spectrum); the fused pipeline masks them by n_frames / patch-finiteness
either way.
"""

from __future__ import annotations

import numpy as np

from .mel import htk_triangular_fbank
from .sidekit import WIN, HOP, NFFT, frame_count

try:                              # scipy's pocketfft is ~2x numpy's FFT here
    from scipy import fft as _sfft

    def _rfft(x, n):
        return _sfft.rfft(x, n=n, axis=-1)
except ImportError:               # pragma: no cover
    def _rfft(x, n):
        return np.fft.rfft(x, n=n, axis=-1)


class HostSidekitFrontend:
    """Drop-in for SidekitFrontend: mspec_loge(sig, pad_frames_to) ->
    (mspec_dev, loge_dev, n_frames), with the heavy math on the host CPU."""

    def __init__(self, lowfreq=100, maxfreq=8000, nlinfilt=0, nlogfilt=24,
                 fs=16000, prefac=0.97, nceps=13):
        self.fs = fs
        self.prefac = np.float32(prefac)
        self.nceps = nceps
        self.nmel = nlinfilt + nlogfilt
        fbank, _ = htk_triangular_fbank(fs, NFFT, lowfreq, maxfreq,
                                        nlinfilt, nlogfilt)
        self.fbank_t = np.ascontiguousarray(fbank.T, np.float32)  # (257, nmel)
        self.window = np.hanning(WIN).astype(np.float32)

    def _features_np(self, sig):
        """float32 signal -> ((t, nmel) mspec, (t,) loge), both float32."""
        t = frame_count(len(sig))
        if t == 0:
            return (np.zeros((0, self.nmel), np.float32),
                    np.zeros(0, np.float32))
        frames = np.lib.stride_tricks.sliding_window_view(
            sig, WIN)[::HOP][:t]
        # per-frame pre-emphasis (first sample against itself), as one
        # vectorized subtract: frames - 0.97 * frames shifted right
        pre = np.empty((t, WIN), np.float32)
        np.multiply(frames[:, :-1], self.prefac, out=pre[:, 1:])
        pre[:, 0] = frames[:, 0] * self.prefac
        pre = frames - pre
        with np.errstate(divide="ignore"):
            loge = np.log(np.einsum("ij,ij->i", pre, pre,
                                    dtype=np.float32)).astype(np.float32)
            pre *= self.window
            spec = _rfft(pre, NFFT)
            spec = (spec.real * spec.real +
                    spec.imag * spec.imag).astype(np.float32)
            mspec = np.log(spec @ self.fbank_t)
        return mspec, loge

    # ---- public API (SidekitFrontend interface) ---------------------------
    def mspec_loge(self, sig, pad_frames_to: int | None = None):
        import jax.numpy as jnp

        sig = np.asarray(sig)
        if sig.dtype == np.int16:
            sig = sig.astype(np.float32) * np.float32(1 / 32768.0)
        else:
            sig = np.ascontiguousarray(sig, np.float32)
        mspec, loge = self._features_np(sig)
        t = len(loge)
        want = t if pad_frames_to is None else max(t, pad_frames_to)
        if want > t:
            mspec = np.pad(mspec, ((0, want - t), (0, 0)),
                           constant_values=-np.inf)
            loge = np.pad(loge, (0, want - t), constant_values=-np.inf)
        return jnp.asarray(mspec), jnp.asarray(loge), t

    def mspec_loge_np(self, sig):
        sig = np.asarray(sig)
        if sig.dtype == np.int16:
            sig = sig.astype(np.float32) * np.float32(1 / 32768.0)
        return self._features_np(np.ascontiguousarray(sig, np.float32))

    def cepstra(self, mspec):
        from scipy.fftpack import dct
        return dct(np.asarray(mspec), type=2, norm="ortho",
                   axis=-1)[:, 1:self.nceps + 1]

    def __hash__(self):
        return id(self)

    def __eq__(self, other):
        return self is other
