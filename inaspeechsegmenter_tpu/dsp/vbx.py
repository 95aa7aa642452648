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

# Blocked feature grid for the int16 device path (VbxPcmStream).  The CMVN
# floating window reaches up to lc+rc+1 = 300 frames to either side of a
# frame once the global clamps engage (the first frame's window is
# [0, 300), the last frame's is [n-300, n)), so a block computed with a
# 304-frame halo sees every sample any of its windows can touch.  BLK is a
# latency/efficiency trade: ~82 s of audio per block keeps the per-block
# matmuls MXU-sized while giving the overlapped VFS pipeline a fine enough
# grain to hide x-vector work behind the upload stream.
VBX_BLK = 8192          # frames owned per block
VBX_HALO = 304          # context frames on each side (>= lc + rc + 1)
_MARGIN = VBX_HALO * HOP    # left margin so block 0's halo slice stays >= 0
_EXT = VBX_BLK + 2 * VBX_HALO   # frames materialized per block program


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

    # ---- blocked int16 device path (VbxPcmStream) --------------------------
    #
    # The canonical int16 feature numerics: the dithered mirror-padded
    # signal lives in one device buffer (assembled incrementally or in one
    # go), and features are computed per fixed-grid VBX_BLK-frame block
    # with a VBX_HALO-frame halo.  The CMVN window means use a cumsum LOCAL
    # to the block's halo'd extent, so a frame's feature value depends only
    # on the block grid — identical whether the file was processed whole
    # (`features_from_pcm`, `_features_i16`) or streamed block-by-block as
    # uploads land (the overlapped VFS pipeline, OnlineVFS).  That
    # bit-equality is what lets the overlapped scorer reuse speculative
    # x-vector embeddings in the exact final result.

    @partial(jax.jit, static_argnames=("self",), donate_argnums=(1,))
    def _stream_append(self, buf, piece, dither_full, pos, n_limit):
        """Write dithered f32 samples for ``piece`` (int16, x-coordinate
        position ``pos``) into the seg-coordinate buffer.  Samples at or
        past ``n_limit`` are forced to 0.0 (the canonical zero padding —
        dither is only ever added to real samples)."""
        d = jax.lax.dynamic_slice(dither_full, (pos,), (piece.shape[0],))
        x = piece.astype(jnp.float32) + d
        x = jnp.where(pos + jnp.arange(piece.shape[0]) < n_limit, x, 0.0)
        return jax.lax.dynamic_update_slice(buf, x, (_MARGIN + 120 + pos,))

    @partial(jax.jit, static_argnames=("self",), donate_argnums=(1,))
    def _stream_front_mirror(self, buf):
        """seg[p] = x[119 - p] for p < 120 (vbx_segmenter.py:86), copied
        from the already-written dithered values."""
        front = jax.lax.dynamic_slice(buf, (_MARGIN + 120,), (120,))[::-1]
        return jax.lax.dynamic_update_slice(buf, front, (_MARGIN,))

    @partial(jax.jit, static_argnames=("self",), donate_argnums=(1,))
    def _stream_tail_mirror(self, buf, n):
        """seg[120 + n + j] = x[n - 1 - j] for j < 200, traced n."""
        tail = jax.lax.dynamic_slice(
            buf, (_MARGIN + 120 + n - 200,), (200,))[::-1]
        return jax.lax.dynamic_update_slice(buf, tail, (_MARGIN + 120 + n,))

    @partial(jax.jit, static_argnames=("self",), donate_argnums=(5,))
    def _block_features(self, buf, a_f, n_frames, win_len, fea_buf):
        """Fbank + blocked CMVN for the block owning frames
        [a_f, a_f + VBX_BLK); writes the rows into ``fea_buf``.

        Gather-free CMVN: the window start ``ws = clip(i - lc, 0,
        n_frames - win_len)`` takes one of three forms — the unclamped
        interior (two STATIC slices of the local cumsum), the start clamp
        (ws = 0, one value for every clamped row) and the end clamp
        (ws = n_frames - win_len, one value) — selected per row.
        """
        seg = jax.lax.dynamic_slice(
            buf, (_MARGIN + (a_f - VBX_HALO) * HOP,), ((_EXT + 2) * HOP,))
        s2 = seg.reshape(_EXT + 2, HOP)
        frames = jnp.concatenate(
            [s2[0:_EXT], s2[1:_EXT + 1], s2[2:_EXT + 2, : WIN - 2 * HOP]],
            axis=1)
        frames = frames - jnp.mean(frames, axis=1, keepdims=True)
        shifted = jnp.concatenate([frames[:, :1], frames[:, :-1]], axis=1)
        frames = frames - 0.97 * shifted
        fw = frames * self.window
        hp = jax.lax.Precision.HIGHEST
        re = jnp.dot(fw, self.dcos, precision=hp)
        im = jnp.dot(fw, self.dsin, precision=hp)
        spec = re * re + im * im
        fea = jnp.log(jnp.maximum(1.0, jnp.dot(spec, self.fbank,
                                               precision=hp)))
        g_idx = a_f - VBX_HALO + jnp.arange(_EXT)
        fea = jnp.where(((g_idx >= 0) & (g_idx < n_frames))[:, None],
                        fea, 0.0)
        f = jnp.concatenate([jnp.zeros((1, FEAT_DIM), fea.dtype),
                             jnp.cumsum(fea, axis=0)])    # (_EXT + 1, 64)
        i_g = a_f + jnp.arange(VBX_BLK)
        # interior: ws = i - lc -> local i_l - lc, window [i-lc, i+rc+1)
        sum_int = (f[VBX_HALO + self.rc + 1: VBX_HALO + self.rc + 1 + VBX_BLK]
                   - f[VBX_HALO - self.lc: VBX_HALO - self.lc + VBX_BLK])
        # start clamp: ws = 0 (only reachable while a_f - HALO <= 0)
        lo = jnp.clip(VBX_HALO - a_f, 0, _EXT)
        sum_start = (jax.lax.dynamic_slice(f, (lo + win_len, 0),
                                           (1, FEAT_DIM))
                     - jax.lax.dynamic_slice(f, (lo, 0), (1, FEAT_DIM)))
        # end clamp: ws = n_frames - win_len
        we = jnp.clip(n_frames - win_len - (a_f - VBX_HALO), 0, _EXT)
        sum_end = (jax.lax.dynamic_slice(f, (we + win_len, 0),
                                         (1, FEAT_DIM))
                   - jax.lax.dynamic_slice(f, (we, 0), (1, FEAT_DIM)))
        start_m = (i_g - self.lc < 0)[:, None]
        int_m = ((i_g - self.lc >= 0)
                 & (i_g - self.lc <= n_frames - win_len))[:, None]
        sums = jnp.where(start_m, sum_start,
                         jnp.where(int_m, sum_int, sum_end))
        out = (fea[VBX_HALO: VBX_HALO + VBX_BLK]
               - sums / win_len.astype(jnp.float32))
        return jax.lax.dynamic_update_slice(fea_buf, out, (a_f, 0))

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

    def _dither_full(self, n):
        """Grow-and-return the WHOLE device dither buffer (>= n samples).
        The stream append program dynamic-slices it at traced positions, so
        callers grow it once up front — the buffer shape is part of the
        program's jit key."""
        self._dither_buffer(n)
        with self._dither_lock:
            return self._dither_dev

    @partial(jax.jit, static_argnames=("self", "nb"))
    def _unpack_elide_i16(self, buf, nb):
        return unpack_zero_elide(buf, nb)

    @partial(jax.jit, static_argnames=("self", "nb"))
    def _unpack_bits_i16(self, buf, nb):
        return unpack_bits(buf, nb)

    def _features_i16(self, sig_i16, n):
        """int16 device path: (n,) int16 exact samples -> (T, 64) fea.

        Upload (codec-packed, unpacked bit-exactly on device) then the
        blocked-grid feature computation (`VbxPcmStream`) — numerically
        identical to the shared-PCM and overlapped paths by construction.
        """
        n_frames = (n - 80) // HOP + 1
        t_bucket = -(-n_frames // 1024) * 1024
        s = (t_bucket + 2) * HOP + 2 * BLOCK     # mirror-tail headroom
        sig = np.zeros(s, np.int16)
        sig[:n] = sig_i16
        packed = pack_best(sig) if _upload_codec_enabled() else None
        if packed is not None and packed[0] == "bits":
            pcm = self._unpack_bits_i16(
                _upload_pieces(packed[1], 4 << 20), s // BLOCK)
        elif packed is not None:
            pcm = self._unpack_elide_i16(
                _upload_pieces(packed[1], 2 << 20), s // BLOCK)
        else:
            pcm = _upload_pieces(sig, 2 << 20)
        stream = VbxPcmStream(self, n)
        stream.append(pcm)
        return stream.finish()

    def features_from_pcm(self, pcm_parts, n):
        """x-vector features from device-resident int16 PCM upload buffers
        (the sidekit frontend's `keep_pcm` groups) — zero additional link
        bytes: VoiceFemininityScoring's VAD pass already shipped the
        samples.  Runs the same per-block programs as the incremental
        `VbxPcmStream` path, so the two are bit-identical.

        :param pcm_parts: [(len_g,) int16 device arrays], each covering its
            upload group's samples plus a 2*HOP lookahead (the groups
            overlap by that lookahead).
        :param n: true sample count of the signal.
        """
        stream = VbxPcmStream(self, n)
        # strip each group's 2*HOP lookahead except the last's
        pieces = [p[:p.shape[0] - 2 * HOP] for p in pcm_parts[:-1]]
        pieces.append(pcm_parts[-1])
        for p in pieces:
            stream.append(p)
        if stream._pos < n:
            # defensive: callers guarantee coverage (the keep_pcm bucket
            # growth); zeros here would only ever pad codec slack
            stream.append(np.zeros(n - stream._pos, np.int16))
        return stream.finish()

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


class VbxPcmStream:
    """Incremental blocked VBx features from int16 PCM pieces.

    Owns the device seg buffer (dithered, mirror-padded, f32) and the
    (nb*VBX_BLK, 64) feature buffer, both assembled by donated in-place
    updates.  `append` consumes exact int16 samples in order (device or
    host arrays) and runs every feature block whose halo'd extent is now
    final; `fea_buffer` hands the growing feature array to the x-vector
    gather path.  Values are bit-identical however the same signal is
    sliced into appends (the block grid is fixed), which is what the
    overlapped VFS scorer's exactness rests on.

    :param fe: the shared `VbxFrontend` (compiled programs + dither cache).
    :param n_samples: true sample count of the signal (known up front for
        offline use; an online caller may pass its best upper bound and
        `reserve` a larger one later... the offline scorers always know).
    """

    def __init__(self, fe, n_samples):
        self.fe = fe
        self.n = int(n_samples)
        assert self.n >= 400, "VbxPcmStream needs one full analysis window"
        self.n_frames = (self.n - 80) // HOP + 1
        self.nb = max(1, -(-self.n_frames // VBX_BLK))
        # buffer end covers the last block's slice [(a_f-H)*HOP,
        # +(_EXT+2)*HOP) and the mirror tail at 120+n+200
        s_b = max(_MARGIN + ((self.nb - 1) * VBX_BLK - VBX_HALO) * HOP
                  + (_EXT + 2) * HOP,
                  _MARGIN + 120 + self.n + 200)
        import jax.numpy as _jnp

        self._buf = _jnp.zeros(s_b, _jnp.float32)
        self._fea = _jnp.zeros((self.nb * VBX_BLK, FEAT_DIM), _jnp.float32)
        # appends past this x-position would make the buffer/dither
        # dynamic-slices clamp their start index (silent data corruption);
        # samples there are upload padding and are dropped instead
        self._cap = s_b - _MARGIN - 120
        # one up-front dither growth: per-append growth would recompile
        # the append program on every new buffer shape
        self._dither = fe._dither_full(self._cap)
        self._pos = 0
        self._blocks_done = 0
        self._front_done = False
        self._tail_done = False

    def append(self, piece):
        """Consume the next samples (int16, device or host array).  Samples
        past ``n_samples`` (upload padding) are zeroed, matching the
        canonical padded-signal semantics."""
        import jax.numpy as _jnp

        ln = min(int(piece.shape[0]), self._cap - self._pos)
        if ln <= 0:
            return
        piece = piece[:ln]
        if not isinstance(piece, jax.Array):
            piece = _upload_pieces(np.ascontiguousarray(piece, np.int16),
                                   2 << 20)
        self._buf = self.fe._stream_append(self._buf, piece, self._dither,
                                           _jnp.int32(self._pos),
                                           _jnp.int32(self.n))
        self._pos += ln
        if not self._front_done and self._pos >= 120:
            self._buf = self.fe._stream_front_mirror(self._buf)
            self._front_done = True
        if not self._tail_done and self._pos >= self.n:
            self._buf = self.fe._stream_tail_mirror(self._buf,
                                                    _jnp.int32(self.n))
            self._tail_done = True
        self._run_ready_blocks()

    def _run_ready_blocks(self):
        import jax.numpy as _jnp

        win_len = min(self.n_frames, self.fe.lc + self.fe.rc + 1)
        while self._blocks_done < self.nb:
            b = self._blocks_done
            # the block's halo'd slice must be final: either every sample
            # it can read is written, or the whole signal (incl. the
            # mirror tail) is
            slice_end_seg = ((b + 1) * VBX_BLK + VBX_HALO + 2) * HOP
            if not (self._tail_done or 120 + self._pos >= slice_end_seg):
                return
            if not self._front_done:
                return
            self._fea = self.fe._block_features(
                self._buf, _jnp.int32(b * VBX_BLK),
                _jnp.int32(self.n_frames), _jnp.int32(win_len), self._fea)
            self._blocks_done += 1

    @property
    def frames_ready(self):
        """Feature frames finalized so far."""
        return min(self._blocks_done * VBX_BLK, self.n_frames)

    @property
    def fea_buffer(self):
        """The (nb*VBX_BLK, 64) device feature buffer — rows past
        `frames_ready` are not yet valid."""
        return self._fea

    def finish(self):
        """All samples appended -> the complete (n_frames, 64) features."""
        assert self._pos >= self.n and self._blocks_done == self.nb, \
            (self._pos, self.n, self._blocks_done, self.nb)
        return self._fea[: self.n_frames]


class VbxPcmStreamOnline:
    """Growing-capacity variant of `VbxPcmStream` for live streams whose
    final length is unknown: blocks are computed as soon as their halo'd
    extent is final INDEPENDENT of the eventual signal end — a block's
    rows use only interior/start CMVN clamps once the frontier is
    HALO + GUARD frames past its extent, so the values are bit-identical
    to the offline computation on the finished signal (asserted in
    tests/test_vbx_features.py).  `finalize()` writes the mirror tail and
    computes the remaining end-dependent blocks with the exact length.
    """

    GUARD = 16          # frontier slack before a block is trusted final

    def __init__(self, fe, capacity=1 << 23):
        self.fe = fe
        self._pos = 0
        self._blocks_done = 0
        self._front_done = False
        self._final = None
        self._cap = 0
        self._buf = None
        self._fea = None
        self._grow(capacity)

    def _grow(self, need_samples):
        cap = max(self._cap, 1 << 23)
        while cap < need_samples:
            cap *= 2
        if cap == self._cap:
            return
        import jax.numpy as _jnp

        n_frames_cap = (cap - 80) // HOP + 1
        nb = max(1, -(-n_frames_cap // VBX_BLK))
        s_b = max(_MARGIN + ((nb - 1) * VBX_BLK - VBX_HALO) * HOP
                  + (_EXT + 2) * HOP,
                  _MARGIN + 120 + cap + 200)
        buf = _jnp.zeros(s_b, _jnp.float32)
        fea = _jnp.zeros((nb * VBX_BLK, FEAT_DIM), _jnp.float32)
        if self._buf is not None:
            buf = jax.lax.dynamic_update_slice(buf, self._buf, (0,))
            fea = jax.lax.dynamic_update_slice(fea, self._fea, (0, 0))
        self._buf, self._fea = buf, fea
        self._cap = cap
        self._nb_cap = nb
        self._dither = self.fe._dither_full(cap + 200)

    def append(self, piece):
        """Consume the next live samples (int16, device or host array)."""
        import jax.numpy as _jnp

        assert self._final is None, "append() after finalize()"
        ln = int(piece.shape[0])
        if ln == 0:
            return
        self._grow(self._pos + ln)
        if not isinstance(piece, jax.Array):
            piece = _upload_pieces(np.ascontiguousarray(piece, np.int16),
                                   2 << 20)
        # n_limit far past any real position: every live sample is real
        self._buf = self.fe._stream_append(self._buf, piece, self._dither,
                                           _jnp.int32(self._pos),
                                           _jnp.int32(2 ** 30))
        self._pos += ln
        if not self._front_done and self._pos >= 120:
            self._buf = self.fe._stream_front_mirror(self._buf)
            self._front_done = True
        self._run_safe_blocks()

    def _frames_now(self):
        return (self._pos - 80) // HOP + 1 if self._pos >= 400 else 0

    def _run_safe_blocks(self):
        import jax.numpy as _jnp

        frames_now = self._frames_now()
        win_len = min(max(frames_now, 1), self.fe.lc + self.fe.rc + 1)
        while self._blocks_done < self._nb_cap:
            b = self._blocks_done
            if ((b + 1) * VBX_BLK + VBX_HALO + self.GUARD > frames_now
                    or not self._front_done):
                return
            # rows here take only interior/start CMVN branches, so the
            # traced n_frames (the current frontier) yields the same
            # values the finished-signal call will
            self._fea = self.fe._block_features(
                self._buf, _jnp.int32(b * VBX_BLK), _jnp.int32(frames_now),
                _jnp.int32(win_len), self._fea)
            self._blocks_done += 1

    @property
    def frames_ready(self):
        """Feature frames final so far (safe blocks only)."""
        return min(self._blocks_done * VBX_BLK, max(self._frames_now(), 0))

    @property
    def fea_buffer(self):
        return self._fea

    def finalize(self):
        """The stream is complete: mirror the tail, compute the remaining
        blocks with the exact length -> (n_frames, 64) features, equal to
        the offline `VbxPcmStream` on the same samples."""
        import jax.numpy as _jnp

        if self._final is not None:
            return self._final
        n = self._pos
        assert n >= 400, "finalize() below one analysis window"
        n_frames = (n - 80) // HOP + 1
        self._buf = self.fe._stream_tail_mirror(self._buf, _jnp.int32(n))
        win_len = min(n_frames, self.fe.lc + self.fe.rc + 1)
        nb = max(1, -(-n_frames // VBX_BLK))
        while self._blocks_done < nb:
            self._fea = self.fe._block_features(
                self._buf, _jnp.int32(self._blocks_done * VBX_BLK),
                _jnp.int32(n_frames), _jnp.int32(win_len), self._fea)
            self._blocks_done += 1
        self._final = self._fea[:n_frames]
        return self._final


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
