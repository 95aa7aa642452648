"""SIDEKIT-flavor log-mel feature frontend, TPU-native.

Reproduces the exact semantics of the reference frontend
(reference sidekit_mfcc.py:200-352 `power_spectrum`/`mfcc`):

* framing: 400-sample window, 160-sample hop, no padding
  (frame count = (n-400)//160 + 1)
* per-frame pre-emphasis 0.97 (first sample of each frame against itself)
* per-frame log-energy computed AFTER pre-emphasis and BEFORE windowing
  (sidekit_mfcc.py:218-226)
* Hann window (numpy.hanning — the reference comment says Hamming but the
  code is Hann, sidekit_mfcc.py:221-223)
* 512-point rFFT power spectrum
* 24 HTK-mel triangular filters 100–8000 Hz; mspec = log(spec @ fbank.T)
* optional DCT-II ortho cepstra 1..nceps (computed but unused by the
  segmentation pipeline, provided for API parity)

TPU design: instead of the reference's numpy FFT over a materialized
(T, 512) frame matrix in 500k-frame chunks, frames are gathered on device in
fixed-size chunks under `lax.map` (static shapes, bounded memory) and the DFT
is expressed as two (C,400)x(400,257) matmuls against cos/sin coefficient
matrices — MXU work instead of an FFT butterfly, which for a 512-point
transform is both faster on TPU and numerically transparent.  The mel
projection is one more matmul.  Everything stays on device; nothing is
returned to the host until the caller asks.
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .codec import BLOCK, pack_best
from .mel import htk_triangular_fbank

WIN = 400
HOP = 160
NFFT = 512
NBINS = NFFT // 2 + 1
CHUNK = 4096  # frames per device chunk (~41 s of audio)


def _upload_codec_enabled() -> bool:
    """Zero-block elision on int16 uploads (dsp/codec.py).

    `auto` (default): on for accelerator backends — the upload link is the
    measured bottleneck there and reconstruction is bit-exact and ~free;
    off on CPU where "upload" is a host memcpy that packing can only slow
    down.  `1`/`0` force it either way.
    """
    mode = os.environ.get("ISS_UPLOAD_CODEC", "auto")
    if mode == "auto":
        return jax.default_backend() != "cpu"
    return mode not in ("0", "off")


def frame_count(n_samples: int) -> int:
    return (n_samples - WIN) // HOP + 1 if n_samples >= WIN else 0


def group_shipped_bytes(sig_i16):
    """Link bytes the upload path ships for this int16 signal vs raw.

    Mirrors `mspec_loge_chunks`'s BATCH-path group loop exactly — same
    chunk-bucket padding, same per-ISS_UPLOAD_CHUNKS-group slices
    (lookahead included), one `pack_best` accept/decline + page
    quantization per group — with no device work.  Diagnostics (bench.py's
    ``upload_codec_byte_ratio``) must report the bytes the measured run
    actually shipped, not a whole-file packing the pipeline never performs.

    Scope: the ``keep_pcm`` (shared-PCM / VFS) path grows its chunk count
    by ONE chunk when the signal outruns the feature window
    (`iter_group_feats`); this accounting does NOT model that growth, so
    the ratio is exact for the batch-segmentation path and a close upper
    bound (the growth chunk is near-all zeros, elided by the codec) for
    the shared-PCM path.

    :return: ``(shipped_bytes, raw_bytes)`` — equal when the codec is
        disabled for this backend/dtype.
    """
    sig = np.ascontiguousarray(sig_i16, dtype=np.int16)
    n_chunks = max(1, -(-max(frame_count(len(sig)), 1) // CHUNK))
    need = (n_chunks * CHUNK + 2) * HOP
    sig = np.pad(sig, (0, max(0, need - len(sig))))[:need]
    group = max(1, int(os.environ.get("ISS_UPLOAD_CHUNKS", "3")))
    codec = _upload_codec_enabled()
    shipped = raw_b = 0
    for g in range(0, n_chunks, group):
        k = min(group, n_chunks - g)
        raw = sig[g * CHUNK * HOP: ((g + k) * CHUNK + 2) * HOP]
        raw_b += 2 * len(raw)
        p = pack_best(raw) if codec else None
        shipped += 2 * len(raw) if p is None else p[1].nbytes
    return shipped, raw_b


def _dft_matrices(win=WIN, nfft=NFFT):
    """Real-input DFT as two (win, nfft//2+1) float32 matmul operands.

    X[k] = sum_{n<win} x[n] * exp(-2i*pi*n*k/nfft) — zero-padding to nfft is
    implicit in truncating the coefficient matrix to `win` rows.
    """
    n = np.arange(win)[:, None]
    k = np.arange(nfft // 2 + 1)[None, :]
    ang = -2.0 * np.pi * n * k / nfft
    return (np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32))


class SidekitFrontend:
    """Stateful frontend holding device-resident constants and jit caches."""

    def __init__(self, lowfreq=100, maxfreq=8000, nlinfilt=0, nlogfilt=24,
                 fs=16000, prefac=0.97, nceps=13):
        self.fs = fs
        self.prefac = prefac
        self.nceps = nceps
        self.nmel = nlinfilt + nlogfilt
        fbank, _ = htk_triangular_fbank(fs, NFFT, lowfreq, maxfreq,
                                        nlinfilt, nlogfilt)
        self.fbank_t = jnp.asarray(fbank.T)           # (257, nmel)
        self.window = jnp.asarray(np.hanning(WIN).astype(np.float32))
        dcos, dsin = _dft_matrices()
        self.dcos = jnp.asarray(dcos)
        self.dsin = jnp.asarray(dsin)

    # ---- core chunk computation ------------------------------------------
    def _chunk_feats(self, sig_slice):
        """((C+2)*HOP,) samples -> ((C,nmel) mspec, (C,) loge).

        C is derived from the input shape (jit specializes per shape), so
        the same code serves single chunks and multi-chunk upload groups.
        Framing without gathers: the slice viewed as (C+2, HOP) rows
        turns each 400-sample window into rows i, i+1 and the first 80
        lanes of i+2 — element gathers run on the TPU scalar core and are
        ~100x slower than these strided slices."""
        nchunk = sig_slice.shape[0] // HOP - 2
        s2 = sig_slice.reshape(nchunk + 2, HOP)
        f0 = s2[0:nchunk]
        f1 = s2[1:nchunk + 1]
        f2 = s2[2:nchunk + 2, : WIN - 2 * HOP]
        frames = jnp.concatenate([f0, f1, f2], axis=1)            # (C, WIN)
        # per-frame pre-emphasis (first sample against itself)
        shifted = jnp.concatenate([frames[:, :1], frames[:, :-1]], axis=1)
        frames = frames - self.prefac * shifted
        loge = jnp.log(jnp.sum(frames * frames, axis=1))
        fw = frames * self.window
        hp = jax.lax.Precision.HIGHEST
        re = jnp.dot(fw, self.dcos, precision=hp)
        im = jnp.dot(fw, self.dsin, precision=hp)
        spec = re * re + im * im                                  # (C, 257)
        mspec = jnp.log(jnp.dot(spec, self.fbank_t, precision=hp))
        return mspec, loge

    @partial(jax.jit, static_argnames=("self",))
    def _features_padded(self, sig_pad):
        if sig_pad.dtype == jnp.int16:
            # device-side PCM16 -> float32 (int16/2^15 is exact)
            sig_pad = sig_pad.astype(jnp.float32) * np.float32(1 / 32768.0)
        n_chunks = (sig_pad.shape[0] - 2 * HOP) // (CHUNK * HOP)

        def one(i):
            s = jax.lax.dynamic_slice(
                sig_pad, (i * CHUNK * HOP,), ((CHUNK + 2) * HOP,))
            return self._chunk_feats(s)

        mspec, loge = jax.lax.map(one, jnp.arange(n_chunks))
        return mspec.reshape(-1, self.nmel), loge.reshape(-1)

    @partial(jax.jit, static_argnames=("self", "keep_pcm"))
    def _one_chunk(self, s, keep_pcm=False):
        pcm = s
        if s.dtype == jnp.int16:
            s = s.astype(jnp.float32) * np.float32(1 / 32768.0)
        m, l = self._chunk_feats(s)
        return (m, l, pcm) if keep_pcm else (m, l)

    @partial(jax.jit, static_argnames=("self", "nb", "keep_pcm"))
    def _one_chunk_packed(self, buf, nb, keep_pcm=False):
        from .codec import unpack_zero_elide
        pcm = unpack_zero_elide(buf, nb)
        s = pcm.astype(jnp.float32) * np.float32(1 / 32768.0)
        m, l = self._chunk_feats(s)
        return (m, l, pcm) if keep_pcm else (m, l)

    @partial(jax.jit, static_argnames=("self", "nb", "keep_pcm"))
    def _one_chunk_bits(self, buf, nb, keep_pcm=False):
        from .codec import unpack_bits
        pcm = unpack_bits(buf, nb)
        s = pcm.astype(jnp.float32) * np.float32(1 / 32768.0)
        m, l = self._chunk_feats(s)
        return (m, l, pcm) if keep_pcm else (m, l)

    def group_feats(self, raw, k, keep_pcm=False, codec=None):
        """Feature-compute ONE upload group: ``raw`` covers k chunks plus
        the 2*HOP lookahead (length (k*CHUNK+2)*HOP).  The single owner of
        the group computation (codec gating + per-chunk split), shared by
        `mspec_loge_chunks` and the OnlineSegmenter — whose finalize()
        bit-exactness depends on issuing IDENTICAL group calls.
        -> ([(mspec_c, loge_c)] * k, pcm_part | None)."""
        if codec is None:
            codec = _upload_codec_enabled() and raw.dtype == np.int16
        packed = pack_best(raw) if codec else None
        if packed is None:
            res = self._one_chunk(jnp.asarray(raw), keep_pcm=keep_pcm)
        elif packed[0] == "bits":
            # predictive bit-packing: ~35-60% fewer link bytes on audible
            # content, reconstructed bit-exactly on device (dsp/codec.py)
            res = self._one_chunk_bits(jnp.asarray(packed[1]),
                                       len(raw) // BLOCK,
                                       keep_pcm=keep_pcm)
        else:
            # digital-silence blocks elided: ships fewer link bytes,
            # reconstructed bit-exactly on device (dsp/codec.py)
            res = self._one_chunk_packed(jnp.asarray(packed[1]),
                                         len(raw) // BLOCK,
                                         keep_pcm=keep_pcm)
        m, l = res[0], res[1]
        outs = [(m[j * CHUNK:(j + 1) * CHUNK],
                 l[j * CHUNK:(j + 1) * CHUNK]) for j in range(k)]
        return outs, (res[2] if keep_pcm else None)

    # ---- public API ------------------------------------------------------
    def mspec_loge_chunks(self, sig, pad_frames_to: int | None = None,
                          keep_pcm: bool = False):
        """Per-chunk device features: ([(mspec_c, loge_c)], n_frames)
        — or, with ``keep_pcm=True`` on an int16 signal,
        ``([(mspec_c, loge_c)], n_frames, pcm_parts)`` where ``pcm_parts``
        are the device-resident int16 upload-group buffers (each covering
        its groups' samples plus a 2*HOP lookahead): a consumer that needs
        the same PCM (the VBx frontend inside VoiceFemininityScoring)
        reuses them instead of paying a second upload of the file.

        Each element covers CHUNK frames; uploads and chunk programs are
        dispatched asynchronously in order, so a consumer that only needs
        chunk c (e.g. the streaming CNN path) is not serialized on the
        whole file's transfer.

        Transfers are issued in groups of ``ISS_UPLOAD_CHUNKS`` chunks
        (default 3 = ~3.9 MB of int16 PCM): the tunneled host->device link
        has a strong per-transfer cost, measured 24 MB/s at 1.3 MB
        transfers vs 45-48 MB/s at 2.4-4.8 MB, while a monolithic transfer
        degrades again (25 MB/s at 19 MB) and would also serialize the
        streaming consumer.  Per-chunk feature arrays are sliced out on
        device (HBM-local, free relative to the link).
        """
        outs = []
        pcm_parts = []
        shared = False
        for chunks_g, pcm in self.iter_group_feats(sig, pad_frames_to,
                                                   keep_pcm):
            outs.extend(chunks_g)
            if pcm is not None:
                shared = True
                pcm_parts.append(pcm)
        t = frame_count(len(sig))
        if keep_pcm:
            return outs, t, (pcm_parts if shared else None)
        return outs, t

    def iter_group_feats(self, sig, pad_frames_to: int | None = None,
                         keep_pcm: bool = False):
        """Generator over upload groups: yields ``(chunks_g, pcm_part)``
        per group, dispatching that group's upload + feature programs
        first — the body of `mspec_loge_chunks`, exposed so interleaved
        consumers (the overlapped VFS scorer) can schedule their own
        device work between groups while later uploads are still in
        flight.  ``pcm_part`` is None unless ``keep_pcm`` and the signal
        is int16."""
        keep = np.int16 if np.asarray(sig).dtype == np.int16 else np.float32
        sig = np.ascontiguousarray(sig, dtype=keep)
        t = frame_count(len(sig))
        want = t if pad_frames_to is None else max(t, pad_frames_to)
        n_chunks = max(1, -(-want // CHUNK))
        need = (n_chunks * CHUNK + 2) * HOP
        keep_pcm = keep_pcm and keep is np.int16   # float sources: no share
        if keep_pcm and len(sig) > need:
            # the PCM consumer (the VBx frontend's mirror tail) reads the
            # TRUE last samples of the signal; when the frame count exactly
            # fills the chunk count, up to WIN-2*HOP-1 = 79 trailing
            # samples fall past the feature window — grow by one chunk so
            # the shared buffers cover the whole signal.  (Downstream tail
            # program shapes are unaffected: `stream_decode` pads the
            # PROBS to the bucket ladder itself, so emissions are only
            # ever computed for real chunks.)
            n_chunks += 1
            need = (n_chunks * CHUNK + 2) * HOP
        if len(sig) < need:
            sig = np.pad(sig, (0, need - len(sig)))
        else:
            sig = sig[:need]
        group = max(1, int(os.environ.get("ISS_UPLOAD_CHUNKS", "3")))
        codec = _upload_codec_enabled() and keep is np.int16
        for g in range(0, n_chunks, group):
            k = min(group, n_chunks - g)
            raw = sig[g * CHUNK * HOP: ((g + k) * CHUNK + 2) * HOP]
            chunks_g, pcm = self.group_feats(raw, k, keep_pcm=keep_pcm,
                                             codec=codec)
            yield chunks_g, pcm

    def mspec_loge(self, sig, pad_frames_to: int | None = None):
        """Compute (mspec, loge, n_frames) for a 1-D float signal.

        Returns device arrays padded up to a whole number of chunks (garbage
        past `n_frames`); callers slice or mask with `n_frames`.

        :param pad_frames_to: optionally force at least this many (padded)
            frames, to stabilize jit cache keys across files.
        """
        outs, t = self.mspec_loge_chunks(sig, pad_frames_to)
        mspec = jnp.concatenate([m for m, _ in outs])
        loge = jnp.concatenate([l for _, l in outs])
        return mspec, loge, t

    def mspec_loge_np(self, sig):
        """Host-side convenience: trimmed numpy (mspec, loge)."""
        mspec, loge, t = self.mspec_loge(sig)
        return np.asarray(mspec[:t]), np.asarray(loge[:t])

    def cepstra(self, mspec):
        """DCT-II ortho cepstra, coefficients 1..nceps (API parity with the
        reference `mfcc` return; unused by the segmentation pipeline)."""
        from scipy.fftpack import dct
        return dct(np.asarray(mspec), type=2, norm="ortho", axis=-1)[:, 1:self.nceps + 1]

    def __hash__(self):
        return id(self)

    def __eq__(self, other):
        return self is other
