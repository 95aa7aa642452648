"""VBx/Kaldi-flavor 64-band log-mel frontend for x-vector extraction.

Reproduces the reference feature chain (reference vbx_segmenter.py:72-89
`get_features` + features_vbx.py): int16-scaled dither with numpy's global
RNG seeded at 3 (bit-exact host-side), mirror padding (120 front / 200 back),
HTK framing (400 win / 160 hop), ZMEANSOURCE per-frame mean removal,
pre-emphasis 0.97, Povey window (Hann^0.85), 512-pt power spectrum,
`log(max(1, spec @ fbank))` with a 64-channel 20–7600 Hz mel bank
(htk_bug=False), then floating-window CMVN (LC=150/RC=149, mean only) with
Kaldi edge handling via cumulative sums.

Host does only the RNG-dependent dither and mirror pad; framing, FFT
(as cos/sin matmuls on the MXU), mel projection and CMVN run on device.
"""

from __future__ import annotations

import os
import threading
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .codec import BLOCK, pack_best, unpack_bits, unpack_zero_elide
from .mel import kaldi_mel_fbank
from .sidekit import _dft_matrices, _upload_codec_enabled

WIN = 400
HOP = 160
NFFT = 512
FEAT_DIM = 64
SR = 16000


def povey_window(winlen=WIN):
    return np.power(0.5 - 0.5 * np.cos(np.linspace(0, 2 * np.pi, winlen)), 0.85)


def add_dither_seeded(x_int, level=8, seed=3):
    """HTK-style dither on the int16-scaled signal, reproducing the
    reference's np.random.seed(3) for bit-compatible features
    (vbx_segmenter.py:84-85)."""
    rng = np.random.RandomState(seed)
    return x_int + level * (rng.rand(*x_int.shape) * 2 - 1)


def preprocess_signal(signal):
    """float64 16 kHz signal -> dithered, mirror-padded float64 array
    (vbx_segmenter.py:84-86)."""
    noverlap = 240
    sig_int = (np.asarray(signal) * 2 ** 15).astype(int)
    sig = add_dither_seeded(sig_int)
    return np.r_[sig[noverlap // 2 - 1::-1], sig, sig[-1:-WIN // 2 - 1:-1]]


class VbxFrontend:
    def __init__(self, lc=150, rc=149):
        self.lc = lc
        self.rc = rc
        fbank = kaldi_mel_fbank(WIN, SR, numchans=FEAT_DIM, lofreq=20.0,
                                hifreq=7600, htk_bug=False)
        self.fbank = jnp.asarray(fbank.astype(np.float32))      # (257, 64)
        self.window = jnp.asarray(povey_window().astype(np.float32))
        dcos, dsin = _dft_matrices(WIN, NFFT)
        self.dcos = jnp.asarray(dcos)
        self.dsin = jnp.asarray(dsin)
        self._dither_dev = None      # device-resident dither prefix cache
        self._dither_len = 0
        # grow-on-demand cache is hit from batch_score's prefetch threads;
        # racing growths could leave _dither_len ahead of the actual buffer
        self._dither_lock = threading.Lock()

    @partial(jax.jit, static_argnames=("self",))
    def _fbank_cmvn_padded(self, seg_pad, n_frames):
        """Bucket-padded fbank + CMVN: padded length is static (one compile
        per bucket), the true frame count `n_frames` is traced, so arbitrary
        file lengths share compiled programs.  Padded frames are zeros ->
        log(max(1, 0)) = 0 rows that CMVN never reads (window starts clamp
        to n_frames)."""
        t_pad = seg_pad.shape[0] // HOP - 2
        # gather-free framing: rows of HOP samples; window = rows i, i+1
        # and the first 80 lanes of i+2
        s2 = seg_pad.reshape(t_pad + 2, HOP)
        frames = jnp.concatenate(
            [s2[0:t_pad], s2[1:t_pad + 1], s2[2:t_pad + 2, : WIN - 2 * HOP]],
            axis=1)                                              # (T, 400)
        frames = frames - jnp.mean(frames, axis=1, keepdims=True)  # ZMEANSOURCE
        shifted = jnp.concatenate([frames[:, :1], frames[:, :-1]], axis=1)
        frames = frames - 0.97 * shifted                         # pre-emphasis
        fw = frames * self.window
        hp = jax.lax.Precision.HIGHEST
        re = jnp.dot(fw, self.dcos, precision=hp)
        im = jnp.dot(fw, self.dsin, precision=hp)
        spec = re * re + im * im
        fea = jnp.log(jnp.maximum(1.0, jnp.dot(spec, self.fbank, precision=hp)))
        return self._cmvn(fea, n_frames)

    def _cmvn(self, x, n):
        """Floating-window mean normalization, Kaldi edge handling
        (features_vbx.py:131-149, norm_vars=False); `n` may be traced."""
        win_len = jnp.minimum(n, self.lc + self.rc + 1)
        ws = jnp.clip(jnp.arange(x.shape[0]) - self.lc, 0, n - win_len)
        f = jnp.concatenate([jnp.zeros((1, x.shape[1]), x.dtype),
                             jnp.cumsum(x, axis=0)])
        return x - (f[ws + win_len] - f[ws]) / win_len

    # ---- int16 upload path -----------------------------------------------
    def _dither_buffer(self, n):
        """Device-resident dither prefix, grown on demand.

        The reference dither stream is the MT19937(3) prefix sequence
        (vbx_segmenter.py:84-85) — identical for every file up to its
        length — so it is generated host-side once per growth step
        (quantized to 2^20 samples to bound regenerations) and kept in
        HBM; per-file uploads then ship int16 PCM instead of the dithered
        float32 signal (half the link bytes, steady-state).
        """
        with self._dither_lock:
            if n > self._dither_len:
                grow = -(-n // (1 << 20)) * (1 << 20)
                if self._dither_dev is None:
                    self._dither_rng = np.random.RandomState(3)
                    d = (8.0 * (2.0 * self._dither_rng.rand(grow) - 1.0)
                         ).astype(np.float32)
                    self._dither_dev = _upload_pieces(d, 1 << 20)
                else:
                    # extend with just the delta: the kept RandomState
                    # continues the MT19937(3) stream, so only the new
                    # samples cross the link (re-shipping the whole prefix
                    # cost seconds per growth on hour-scale corpora)
                    delta = grow - self._dither_len
                    d = (8.0 * (2.0 * self._dither_rng.rand(delta) - 1.0)
                         ).astype(np.float32)
                    self._dither_dev = jnp.concatenate(
                        [self._dither_dev, _upload_pieces(d, 1 << 20)])
                self._dither_len = grow
            # slice to the requested length BEFORE handing the buffer to a
            # jitted fbank program: the traced dither shape is then the
            # signal bucket `n` alone, so a 2^20-sample buffer growth does
            # not change the traced shapes and invalidate every compiled
            # signal-bucket program (the slice itself is a trivial device
            # op keyed on the rare (buffer_len, n) pairs)
            return self._dither_dev[:n]

    def _seg_from_i16(self, sig_i16, dither, n_sig):
        """Traced: dither + mirror-pad the int16 signal on device,
        reproducing preprocess_signal up to f32 rounding (the reference
        adds the f64 dither before the final f32 cast; adding the
        f32-rounded dither to the exact f32 integer signal differs by
        <= 1 ulp of the sample value — bounded in tests/test_vbx_features.py).
        """
        s = sig_i16.shape[0]
        x = sig_i16.astype(jnp.float32) + dither[:s]
        x = jnp.where(jnp.arange(s) < n_sig, x, 0.0)
        front = x[:120][::-1]
        seg = jnp.concatenate([front, x])[:s]
        tail = jax.lax.dynamic_slice(x, (n_sig - 200,), (200,))[::-1]
        return jax.lax.dynamic_update_slice(seg, tail, (120 + n_sig,))

    @partial(jax.jit, static_argnames=("self",))
    def _fbank_cmvn_i16(self, sig_i16, dither, n_sig, n_frames):
        seg = self._seg_from_i16(sig_i16, dither, n_sig)
        return self._fbank_cmvn_padded(seg, n_frames)

    @partial(jax.jit, static_argnames=("self", "nb"))
    def _fbank_cmvn_i16_packed(self, buf, dither, n_sig, n_frames, nb):
        sig = unpack_zero_elide(buf, nb)
        seg = self._seg_from_i16(sig, dither, n_sig)
        return self._fbank_cmvn_padded(seg, n_frames)

    @partial(jax.jit, static_argnames=("self", "nb"))
    def _fbank_cmvn_i16_bits(self, buf, dither, n_sig, n_frames, nb):
        sig = unpack_bits(buf, nb)
        seg = self._seg_from_i16(sig, dither, n_sig)
        return self._fbank_cmvn_padded(seg, n_frames)

    def _features_i16(self, sig_i16, n):
        """int16 device path: (n,) int16 exact samples -> (T, 64) fea."""
        n_frames = (n - 80) // HOP + 1
        t_bucket = -(-n_frames // 1024) * 1024
        s = (t_bucket + 2) * HOP + 2 * BLOCK     # mirror-tail headroom
        sig = np.zeros(s, np.int16)
        sig[:n] = sig_i16
        dither = self._dither_buffer(s)
        packed = pack_best(sig) if _upload_codec_enabled() else None
        piece = 2 << 20                          # 4 MB of int16 per transfer
        if packed is not None and packed[0] == "bits":
            buf = _upload_pieces(packed[1], 4 << 20)   # uint8 pieces
            fea = self._fbank_cmvn_i16_bits(buf, dither, jnp.int32(n),
                                            jnp.int32(n_frames),
                                            s // BLOCK)
        elif packed is not None:
            buf = _upload_pieces(packed[1], piece)
            fea = self._fbank_cmvn_i16_packed(buf, dither, jnp.int32(n),
                                              jnp.int32(n_frames),
                                              s // BLOCK)
        else:
            fea = self._fbank_cmvn_i16(_upload_pieces(sig, piece), dither,
                                       jnp.int32(n), jnp.int32(n_frames))
        return fea[:n_frames]

    def features_from_pcm(self, pcm_parts, n):
        """x-vector features from device-resident int16 PCM upload buffers
        (the sidekit frontend's `keep_pcm` groups) — zero additional link
        bytes: VoiceFemininityScoring's VAD pass already shipped the
        samples.

        :param pcm_parts: [(len_g,) int16 device arrays], each covering its
            upload group's samples plus a 2*HOP lookahead (the groups
            overlap by that lookahead).
        :param n: true sample count of the signal.
        """

        n_frames = (n - 80) // HOP + 1
        t_bucket = -(-n_frames // 1024) * 1024
        s = (t_bucket + 2) * HOP + 2 * BLOCK
        # strip each group's 2*HOP lookahead except the last's, then pad
        pieces = [p[:p.shape[0] - 2 * HOP] for p in pcm_parts[:-1]]
        pieces.append(pcm_parts[-1])
        have = sum(int(p.shape[0]) for p in pieces)
        if have < s:
            pieces.append(jnp.zeros(s - have, jnp.int16))
        sig_dev = jnp.concatenate(pieces)[:s]
        # zero anything past n (codec padding / sidekit chunk padding)
        dither = self._dither_buffer(s)
        fea = self._fbank_cmvn_i16(sig_dev, dither, jnp.int32(n),
                                   jnp.int32(n_frames))
        return fea[:n_frames]

    def features(self, signal):
        """Reference-compatible entry: float64 signal -> (T, 64) float32.

        ``ISS_VBX_UPLOAD``: ``f32`` ships the host-dithered float32 signal
        (bit-exact vs the reference preprocessing); ``int16`` ships exact
        int16 PCM and adds the cached device dither on chip (half the link
        bytes + zero-block elision, <= 1 f32-ulp signal difference);
        ``auto`` (default) picks int16 on accelerator backends when the
        signal is losslessly int16-scaled, f32 on CPU.
        """
        if vbx_i16_enabled():
            sig_int = (np.asarray(signal) * 2 ** 15).astype(np.int64)
            n = len(sig_int)
            if (n >= 400 and sig_int.min() >= -32768
                    and sig_int.max() <= 32767):
                return self._features_i16(sig_int.astype(np.int16), n)
        seg = preprocess_signal(signal).astype(np.float32)
        n_frames = (len(seg) - WIN) // HOP + 1
        # bucket the padded length (1024-frame steps) to bound compiles
        t_bucket = -(-max(n_frames, 1) // 1024) * 1024
        need = (t_bucket + 2) * HOP
        seg = np.pad(seg, (0, max(0, need - len(seg))))[:need]
        seg_dev = _upload_pieces(seg, 1 << 20)         # 1M floats = 4 MB
        fea = self._fbank_cmvn_padded(seg_dev, jnp.int32(n_frames))
        return fea[:n_frames]

    def __hash__(self):
        return id(self)

    def __eq__(self, other):
        return self is other


def vbx_i16_enabled():
    """True when the int16 (device-dither) VBx path is selected — the same
    decision `features()` makes; callers holding shared device PCM use it
    to honor an explicit `ISS_VBX_UPLOAD=f32` exactness request."""
    mode = os.environ.get("ISS_VBX_UPLOAD", "auto")
    return mode == "int16" or (mode == "auto"
                               and jax.default_backend() != "cpu")


def _upload_pieces(arr, piece):
    """Upload a host array in ~4 MB pieces, concatenated on device — the
    tunneled link's per-transfer sweet spot (docs/performance.md)."""
    if len(arr) <= piece:
        return jnp.asarray(arr)
    parts = [jnp.asarray(arr[i:i + piece]) for i in range(0, len(arr), piece)]
    return jnp.concatenate(parts)
