"""Online (incremental) segmentation of a growing recording.

Framework extension — the reference is strictly file-at-a-time (its
`Segmenter.__call__` decodes a complete file, reference segmenter.py:279-294).
This wraps the SAME streaming chunk programs the offline path uses
(`pipeline.run_streaming` / `dsp/sidekit.mspec_loge_chunks`) behind an
append-only API, so a caller can follow a recording while it is being
written (tape capture, live ingest, `tail -f`-style corpus arrival):

    online = OnlineSegmenter(segmenter)
    while capturing:
        online.feed(next_pcm_block)          # any size, any cadence
        print(online.current())              # provisional labels so far
    lseg = online.finalize()                 # EXACT == segmenter.segment_signal(all_pcm)

Guarantees and costs:

* ``finalize()`` is exactly equal to the offline result on the full
  signal (tests/test_online.py): features are computed through the
  offline path's own `SidekitFrontend.group_feats` (identical slices,
  identical programs — including the int16 zero-elision codec), chunk
  emissions use the same halo'd streaming programs, and the decode goes
  through the shared `pipeline.stream_decode`.  With ``ISS_STREAMING=0``
  (the documented switch that disables the streaming chunk programs)
  the whole object becomes a buffering passthrough to the offline fused
  path, exactly like `Segmenter.segment_signal` under that flag.
* ``current()`` is PROVISIONAL: the newest chunk's CNN emissions are
  computed without its right halo and the global Viterbi smoothing can
  revise earlier labels as context arrives (the same contract as
  streaming-ASR partial hypotheses).  Every decode reuses the
  bucket-ladder tail programs, so no per-length recompiles, and the
  provisional emission is cached per mel count so a tight
  feed()/current() polling loop dispatches no redundant CNN work.
* Memory is bounded: raw PCM is dropped as soon as its feature group is
  computed; only the per-chunk device features (~0.4 MB per 41 s chunk)
  and cached emissions are retained — the state the global decode needs
  anyway.
* Availability granularity is one upload group (``ISS_UPLOAD_CHUNKS``
  x ~41 s chunks): a chunk's features are computed when its group's
  samples (plus the 2*HOP lookahead) have been fed, exactly like the
  offline grouping — this is what makes finalize() bit-identical.
"""

from __future__ import annotations

import os

import numpy as np

from .annotations import SpeechTimeline
from .dsp.sidekit import CHUNK, HOP, frame_count

_LOG_ZERO = float(np.log(1e-200))


def _loge_stats(loge_c):
    """(finite sum, finite count) of one chunk's log-energies — the
    committed-prefix contribution to the suffix decode's global energy
    threshold.  Jitted lazily (module import must not touch the device)."""
    global _loge_stats_jit
    try:
        return _loge_stats_jit(loge_c)
    except NameError:
        import jax
        import jax.numpy as jnp

        def stats(lg):
            fin = jnp.isfinite(lg)
            return (jnp.sum(jnp.where(fin, lg, 0.0)),
                    jnp.sum(fin.astype(jnp.float32)))

        _loge_stats_jit = jax.jit(stats)
        return _loge_stats_jit(loge_c)


class OnlineSegmenter:
    """Incremental counterpart of `Segmenter.segment_signal`.

    :param segmenter: a constructed `Segmenter` (its frontend, CNNs and
        compiled program caches are shared).
    :param start_sec: label offset in seconds, like the offline APIs.
    """

    # Committed-prefix decode bounds: a chunk boundary commits when the
    # labels COMMIT_RUN 20 ms frames to each side are all noEnergy — the
    # energy Viterbi's state there is pinned by ~96 consecutive 10 ms
    # frames of agreeing near-certain emissions (each worth ~23 nats vs a
    # 345-nat transition), and the VAD/gender Viterbi levels reset at
    # every energy boundary, so no decoding segment crosses the seam.
    # COMMIT_GUARD chunks stay uncommitted behind the frontier (their
    # emissions/threshold are still moving); if no silence boundary shows
    # up for COMMIT_MAXBACK chunks (~11 min of unbroken audio), the
    # decode force-commits at that horizon — current() is PROVISIONAL by
    # contract, and finalize() always re-decodes the full stream exactly.
    COMMIT_RUN = 48
    COMMIT_GUARD = 1
    COMMIT_MAXBACK = 16

    def __init__(self, segmenter, start_sec=0):
        self.seg = segmenter
        self.start_sec = start_sec
        self._group = max(1, int(os.environ.get("ISS_UPLOAD_CHUNKS", "3")))
        # honor the documented streaming kill switch: buffer everything
        # and hand the offline fused path the whole signal
        self._passthrough = (
            os.environ.get("ISS_STREAMING", "1") == "0"
            or not hasattr(segmenter.frontend, "group_feats"))
        self._dtype = None          # decided by the first feed
        self._pending = None        # materialized samples not yet consumed
        self._tail = []             # fed blocks not yet materialized: feed()
                                    # is O(block); the concatenate happens
                                    # once per feature group, not per feed
        self._consumed = 0          # samples dropped from the buffer front
        self._total = 0             # samples fed overall
        self._mels = []             # [(mspec_c, loge_c)] device arrays
        self._probs = {}            # chunk idx -> final (vad, gender) probs
        self._prov = None           # (mel_count, vad, gender) cache
        self._cur = None            # (decode inputs key, lseg) cache
        self._finalized = None
        self._commit = 0            # chunks whose labels are frozen
        self._commit_act = False    # energy activity at the seam
        self._committed_ids = np.zeros(0, np.int32)
        self._stat_handles = []     # per-chunk (sum, cnt) device scalars
        self._ext_stats = (0.0, 0.0)   # accumulated committed loge stats
        self._polled = False        # pace commits only for poll consumers

    @property
    def seconds_fed(self):
        """Seconds of audio fed so far (cheap: no device work)."""
        return self._total / 16000.0

    @property
    def chunks_ready(self):
        """Feature chunks computed so far (cheap: no device work)."""
        return len(self._mels)

    @property
    def _spec_gender(self):
        return (self.seg.detect_gender
                and os.environ.get("ISS_STREAM_GENDER", "0") == "1")

    # -- feeding -----------------------------------------------------------
    def feed(self, pcm):
        """Append a block of 16 kHz mono samples (int16, or float in
        [-1, 1]).  All blocks must share one kind — the offline result
        this converges to is computed on a single-dtype signal."""
        if self._finalized is not None:
            raise RuntimeError("feed() after finalize()")
        pcm = np.asarray(pcm)
        kind = np.int16 if pcm.dtype == np.int16 else np.float32
        if self._dtype is None:
            self._dtype = kind
            self._pending = np.zeros(0, kind)
        elif kind != self._dtype:
            raise TypeError(
                f"feed dtype changed from {np.dtype(self._dtype).name} to "
                f"{pcm.dtype.name}; an online stream must keep one sample "
                "kind (the offline equivalence is per-signal)")
        # COPY (the old concatenate-per-feed copied too): capture callbacks
        # reuse their buffer; appending keeps feed() O(block) instead of
        # O(everything buffered)
        self._tail.append(np.array(pcm, dtype=self._dtype, copy=True))
        self._total += len(pcm)
        if not self._passthrough:
            self._compute_ready_groups(final_pad_chunks=None)
            # commit pacing: a consumer that polls must never face an
            # unbounded suffix decode because it polled RARELY — once the
            # uncommitted span outruns the force-commit horizon by a
            # group, run the decode+commit now (bounded: the suffix never
            # exceeds MAXBACK + a couple of groups), so any later poll —
            # and every poll during a follow-mode backlog drain — costs
            # O(horizon), not O(stream)
            if (self._polled and len(self._mels) >= 2
                    and (len(self._mels) - self._commit
                         > self.COMMIT_MAXBACK + self._group)):
                self.current()
        return self

    def _materialize(self):
        """Flush fed blocks into the contiguous buffer (one concatenate
        per feature group / fallback read, not one per feed)."""
        if self._tail:
            self._pending = np.concatenate([self._pending, *self._tail])
            self._tail = []
        return self._pending

    @property
    def buffered_samples(self):
        """Raw samples currently held (memory-bound observability)."""
        return (len(self._pending) if self._pending is not None else
                0) + sum(len(p) for p in self._tail)

    def _group_slice_end(self, g, k):
        # offline group slice: sig[g*CHUNK*HOP : ((g+k)*CHUNK + 2)*HOP]
        return ((g + k) * CHUNK + 2) * HOP

    def _compute_ready_groups(self, final_pad_chunks):
        """Feature-compute every group whose slice is fully fed — via the
        offline path's own `group_feats`, so programs AND values are
        shared; with ``final_pad_chunks`` set (finalize), zero-pad and
        compute through that chunk count."""
        while True:
            g = len(self._mels)
            if final_pad_chunks is not None and g >= final_pad_chunks:
                return
            k = self._group
            if final_pad_chunks is not None:
                k = min(k, final_pad_chunks - g)
            end = self._group_slice_end(g, k)
            have = self._total        # == consumed + pending + tail
            if final_pad_chunks is None and have < end:
                return                # cheap: no materialization needed
            self._materialize()
            start = g * CHUNK * HOP
            raw = np.zeros(end - start, self._dtype)
            avail = self._pending[start - self._consumed:
                                  max(start - self._consumed,
                                      end - self._consumed)]
            raw[:len(avail)] = avail
            chunks_g, _ = self.seg.frontend.group_feats(raw, k)
            self._mels.extend(chunks_g)
            for mc, lc in chunks_g:
                # threshold stats for the committed-prefix decode,
                # D2H-prefetched so the eventual host read is free
                s, cnt = _loge_stats(lc)
                s.copy_to_host_async()
                cnt.copy_to_host_async()
                self._stat_handles.append((s, cnt))
            for c in range(max(g, 1), g + k):
                self._final_probs(c - 1)      # c-1's right halo now exists
            # drop raw samples the next groups will never read — but only
            # once the streaming decode is committed to (>= 2 chunks):
            # the short-media fallbacks in current()/finalize() hand the
            # WHOLE buffer back to the offline fused path
            keep_from = (g + k) * CHUNK * HOP
            if g + k >= 2 and keep_from > self._consumed:
                cut = min(keep_from, have) - self._consumed
                self._pending = self._pending[cut:]
                self._consumed += cut

    # -- emissions ---------------------------------------------------------
    def _chunk_probs(self, c, zero_right=False):
        """CNN emissions (vad, gender-or-None) for chunk c, via the halo
        policy's single owner (`pipeline.chunk_emissions` — shared with
        run_streaming, which finalize()'s bit-exactness requires).  Final
        emissions (real right halo) are cached per chunk; the provisional
        zero-right emission is cached per mel count so polling current()
        between chunk arrivals dispatches nothing new."""
        if not zero_right and c in self._probs:
            return self._probs[c]
        if zero_right and self._prov is not None \
                and self._prov[0] == (len(self._mels), self._spec_gender):
            return self._prov[1]
        pv, pg = self.seg.pipeline.chunk_emissions(
            self.seg.vad.model.params,
            self.seg.gender.model.params if self._spec_gender else None,
            self._mels, c, zero_right=zero_right)
        if zero_right:
            self._prov = ((len(self._mels), self._spec_gender), (pv, pg))
        else:
            self._probs[c] = (pv, pg)
        return pv, pg

    def _final_probs(self, c):
        if 0 <= c < len(self._mels) - 1 and c not in self._probs:
            self._chunk_probs(c)

    # -- decoding ----------------------------------------------------------
    def _decode(self, mels, probs, n_frames):
        """Shared streaming-tail decode (pipeline.stream_decode pads the
        chunk count to the bucket ladder, so both provisional and final
        decodes reuse the offline tail program set)."""
        pv = [v for v, _ in probs]
        pg = [g for _, g in probs] if self._spec_gender else None
        if pg is not None and any(g is None for g in pg):
            # ISS_STREAM_GENDER flipped on mid-stream: earlier cached
            # emissions have no gender part — fall back to the in-tail
            # gender pass (label-identical per the chunked==fused
            # equivalence, tests/test_segmenter_e2e.py)
            pg = None
        n20 = (n_frames + 1) // 2
        ids = self.seg.pipeline.stream_decode(
            self.seg.vad.model.params,
            self.seg.gender.model.params if self.seg.detect_gender
            else None,
            mels, pv, pg, n_frames, n_frames, n20)
        return np.asarray(ids)[:n20]

    def current(self):
        """Provisional labels over everything fed so far
        -> [(label, start_s, stop_s)].  May be revised by later feeds;
        `finalize()` gives the exact offline result.

        The result is cached on its exact decode inputs: the provisional
        decode only sees ``min(frame_count(total), m*CHUNK)`` frames, so
        between feature-group completions (the common steady-state poll)
        nothing it reads has changed and the whole-timeline Viterbi
        dispatch + readback is skipped — `current()` cost is then O(1)
        per poll and O(backlog-decode) only when new chunks land."""
        if self._finalized is not None:
            return self._finalized
        self._polled = True
        m = len(self._mels)
        if m < 2:
            # less than two chunks of features: the offline path would use
            # the fused whole-file program anyway — do the same on the
            # (still fully buffered) prefix.  Under a complete 25 ms
            # analysis window there is nothing to label yet.
            if frame_count(self._total) == 0:
                return []
            key = ("short", self._total, self._spec_gender)
            if self._cur is None or self._cur[0] != key:
                self._cur = (key, self.seg.segment_signal(
                    self._materialize(), self.start_sec))
            return list(self._cur[1])
        n = min(frame_count(self._total), m * CHUNK)
        key = (m, n, self._spec_gender, self._commit)
        if self._cur is None or self._cur[0] != key:
            ids = self._decode_provisional(n)
            lseg = self.seg.ids_to_lseg(ids, self.start_sec)
            self._advance_commit(ids, m)
            # re-key on the ADVANCED commit: the labels are unchanged by
            # committing, and a stale key would force the very next poll
            # to re-decode for nothing
            self._cur = ((m, n, self._spec_gender, self._commit), lseg)
        return list(self._cur[1])

    def _decode_provisional(self, n_frames):
        """Labels over everything fed: frozen committed prefix + a decode
        of ONLY the uncommitted suffix chunks — O(suffix), flat in stream
        length (the round-3 whole-timeline re-decode cost ~8 ms per
        backlog minute, unbounded for live monitoring)."""
        m = len(self._mels)
        c0 = self._commit
        probs = [self._chunk_probs(c) for c in range(c0, m - 1)]
        probs.append(self._chunk_probs(m - 1, zero_right=True))
        if c0 == 0:
            return self._decode(self._mels, probs, n_frames)
        pv = [v for v, _ in probs]
        pg = [g for _, g in probs] if self._spec_gender else None
        if pg is not None and any(g is None for g in pg):
            pg = None
        n_suf = n_frames - c0 * CHUNK
        n20s = (n_suf + 1) // 2
        # seam: a near-one-hot energy init at the committed state; the
        # committed loge stats keep the threshold global
        e_init = np.full(2, _LOG_ZERO, np.float32)
        e_init[1 if self._commit_act else 0] = 0.0
        ext = (self._ext_stats[0], self._ext_stats[1], e_init)
        ids_s = self.seg.pipeline.stream_decode(
            self.seg.vad.model.params,
            self.seg.gender.model.params if self.seg.detect_gender else None,
            self._mels[c0:], pv, pg, n_suf, n_suf, n20s, ext=ext)
        return np.concatenate([self._committed_ids,
                               np.asarray(ids_s)[:n20s]])

    def _advance_commit(self, ids, m):
        """Freeze the label prefix up to the newest committable chunk
        boundary (see COMMIT_* above) and fold the frozen chunks' loge
        stats into the suffix threshold."""
        n20 = len(ids)
        c20 = CHUNK // 2
        best = None
        for b in range(m - self.COMMIT_GUARD, self._commit, -1):
            f = b * c20
            if f - self.COMMIT_RUN < 0 or f + self.COMMIT_RUN > n20:
                continue
            if not ids[f - self.COMMIT_RUN: f + self.COMMIT_RUN].any():
                best = (b, False)
                break
        if best is None and m - self._commit > self.COMMIT_MAXBACK:
            b = m - self.COMMIT_MAXBACK
            f = b * c20
            if 0 < f <= n20:
                best = (b, bool(ids[min(f, n20 - 1)] != 0))
        if best is None:
            return
        b, act = best
        s, cnt = self._ext_stats
        for c in range(self._commit, b):
            hs, hc = self._stat_handles[c]
            s += float(hs)
            cnt += float(hc)
        self._ext_stats = (s, cnt)
        self._committed_ids = np.array(ids[: b * c20], np.int32, copy=True)
        self._commit = b
        self._commit_act = act

    def finalize(self):
        """Flush the stream and return the EXACT offline labels — equal to
        ``segmenter.segment_signal(<everything fed>)``.  Idempotent."""
        if self._finalized is not None:
            return self._finalized
        t = frame_count(self._total)
        # real chunk count, like the offline streaming path (the decode
        # pads probs to the bucket ladder itself)
        n_chunks = max(1, -(-t // CHUNK))
        if self._passthrough or t < 68 or n_chunks < 2:
            # the offline path takes its fused short-media branch here;
            # nothing has been dropped yet (no group completed), so just
            # hand it the whole buffer (same errors on too-short input)
            self._finalized = self.seg.segment_signal(
                self._materialize() if self._total else
                np.zeros(0, self._dtype or np.float32), self.start_sec)
            return self._finalized
        self._compute_ready_groups(final_pad_chunks=n_chunks)
        mels = self._mels[:n_chunks]
        probs = [self._chunk_probs(c) for c in range(n_chunks - 1)]
        probs.append(self._chunk_probs(n_chunks - 1, zero_right=True))
        self._finalized = self.seg.ids_to_lseg(
            self._decode(mels, probs, t), self.start_sec)
        return self._finalized


def _wav_data_offset(path):
    """Offset of the data payload in a (possibly still-growing) canonical
    PCM16 mono 16 kHz WAV, or None while the header is incomplete.  The
    data chunk's own size is routinely bogus in files being written
    (writers back-patch it on close), so only the chunk WALK is trusted —
    via the shared `audio.wav._read_chunks` (which also handles pre-data
    metadata chunks of any size and word alignment)."""
    import struct

    from .audio import wav as _wav

    with open(path, "rb") as f:
        if len(f.read(12)) < 12:
            return None                         # header still being written
        f.seek(0)
        fmt = None
        for cid, size, offset in _wav._read_chunks(f):
            if cid == b"fmt ":
                f.seek(offset)
                raw = f.read(size)
                if len(raw) < 16:
                    return None                 # fmt still being written
                code, channels, sr, _, _, bits = struct.unpack(
                    "<HHIIHH", raw[:16])
                if code == _wav._WAVE_FORMAT_EXTENSIBLE and len(raw) >= 26:
                    # real format = first 2 bytes of the SubFormat GUID
                    # (WASAPI/libsndfile recorders write canonical PCM16
                    # audio behind an extensible fmt chunk)
                    code = struct.unpack("<H", raw[24:26])[0]
                fmt = (code, channels, sr, bits)
            elif cid == b"data":
                if fmt is None:
                    return None
                if fmt != (1, 1, 16000, 16):
                    code, channels, sr, bits = fmt
                    raise _wav.WavFormatError(
                        f"{path}: follow mode needs PCM16 mono 16 kHz WAV, "
                        f"got format={code} channels={channels} sr={sr} "
                        f"bits={bits}")
                return offset
    return None


def follow_wav(path, segmenter, idle_timeout=10.0, poll=0.5, start_sec=0,
               on_update=None):
    """Tail a GROWING PCM16 mono 16 kHz WAV file and return the final
    labels once it stops growing.

    Polls the file every ``poll`` seconds, feeds newly appended samples to
    an `OnlineSegmenter` in bounded batches (one upload-group slice per
    read: attaching to an already-hours-long file drains the backlog
    without materializing it whole), and finalizes after ``idle_timeout``
    seconds without file activity — the result then equals
    ``segmenter.segment_signal(<the whole file's samples>)``.  ANY file
    growth (header/metadata chunks included) counts as activity, so a
    slow muxer prologue cannot trip the idle timer.  If no audio ever
    arrives, raises TimeoutError instead of finalizing an empty stream.
    ``on_update(online)`` is called after each feed batch."""
    return _follow_stream(path, OnlineSegmenter(segmenter, start_sec),
                          idle_timeout, poll, on_update)


def follow_wav_vfs(path, vfs, idle_timeout=10.0, poll=0.5, on_update=None):
    """Tail a GROWING PCM16 mono 16 kHz WAV and return the final
    femininity scoring once it stops growing — the `OnlineVFS`
    counterpart of `follow_wav`; the result equals
    ``vfs.score_signal(<the whole file's samples>)``."""
    basename = os.path.splitext(os.path.basename(path))[0]
    return _follow_stream(path, OnlineVFS(vfs, basename=basename),
                          idle_timeout, poll, on_update)


def _data_end(path, data_off, size):
    """Feed bound for this poll: the data chunk's CURRENT declared size
    when it looks back-patched (``data_off + declared <= size``), else
    EOF.  Recorders finalize the size on close and taggers then append
    LIST/INFO/id3 chunks AFTER the data payload — those bytes are not
    samples, and the offline reader (`audio.wav.read_wav`, which
    finalize() must agree with) reads exactly ``declared`` bytes.
    Growing files carry 0/0xFFFFFFFF/stale placeholders instead, which
    keep the EOF bound.  Re-read every poll: some writers back-patch
    periodically, not just on close.

    A recorder may also write a small FIXED nonzero placeholder and only
    back-patch on close; once the payload grows past it, trusting it
    would stall live feeding at that bound until close.  Disambiguate by
    looking at what follows the declared end: a genuine back-patch is
    followed by nothing or by appended metadata chunks (LIST/INFO/id3 —
    a printable 4CC), while a growing payload puts raw PCM there — then
    the declared size is stale and the EOF bound applies until it
    changes."""
    import struct

    try:
        with open(path, "rb") as f:
            f.seek(data_off - 4)
            declared = struct.unpack("<I", f.read(4))[0]
            if declared in (0, 0xFFFFFFFF) or data_off + declared > size:
                return size
            end = data_off + declared + (declared & 1)   # word-aligned
            if size >= end + 8:
                f.seek(end)
                fourcc = f.read(4)
                if not all(0x20 <= b <= 0x7e for b in fourcc):
                    return size          # raw samples, not a chunk id
    except (OSError, struct.error):
        return size
    return data_off + declared


def _follow_stream(path, online, idle_timeout, poll, on_update):
    """Shared tail loop driving any online consumer (feed/finalize)."""
    import time

    data_off = None
    pos = 0
    last_size = -1
    last_activity = time.time()
    # one upload-group slice of int16 bytes per read
    group = getattr(online, "_group", 3)
    max_read = ((group * CHUNK + 2) * HOP) * 2
    while True:
        size = os.path.getsize(path) if os.path.exists(path) else 0
        if size != last_size:
            last_size = size
            last_activity = time.time()
        if data_off is None and size >= 12:
            data_off = _wav_data_offset(path)
            if data_off is not None:
                pos = data_off
        end = (_data_end(path, data_off, size)
               if data_off is not None else 0)
        if data_off is not None and end - pos >= 2:
            want = min(((end - pos) // 2) * 2, max_read)
            with open(path, "rb") as f:
                f.seek(pos)
                blob = f.read(want)
            pos += len(blob)
            online.feed(np.frombuffer(blob, "<i2"))
            last_activity = time.time()
            if on_update is not None:
                on_update(online)
            if len(blob) == max_read:
                continue                        # backlog catch-up: no sleep
        elif time.time() - last_activity >= idle_timeout:
            if online._total == 0:
                raise TimeoutError(
                    f"--follow: no audio arrived in {path!r} within "
                    f"{idle_timeout}s (the file "
                    + ("never appeared" if not os.path.exists(path)
                       else "has no data payload yet") + ")")
            return online.finalize()
        time.sleep(poll)


class OnlineVFS:
    """Live voice-femininity monitoring of a growing recording.

    Framework extension (the reference's VFS is strictly file-at-a-time,
    vbx_segmenter.py:147-202).  Feed 16 kHz mono blocks as they arrive;
    ``current()`` returns a PROVISIONAL ``(score | None, speech_dur, n)``
    using the provisional online VAD and x-vectors embedded so far;
    ``finalize()`` runs the canonical scoring on the full signal — exactly
    equal to ``vfs.score_signal(<everything fed>)``.

    The expensive work is incremental on two levels.  Embeddings: a
    window is embedded ONCE, as soon as its features are final, and
    cached for every later provisional score.  Features: int16 streams
    on the device VBx path run through `VbxPcmStreamOnline` — fixed-grid
    feature blocks computed as the stream passes their halo'd extent,
    bit-identical to the finished-signal computation, with the raw PCM
    DROPPED once absorbed (bounded memory) — and ``finalize()``
    reassembles the exact offline result from the cached embeddings plus
    one catch-up batch (equal to ``vfs.score_signal(<everything fed>)``,
    asserted in tests).  Float streams (or forced-f32 VBx) keep the
    buffered-prefix fallback: features recomputed on the grown prefix
    only when at least ``ISS_ONLINE_VFS_BATCH`` (default 32) new windows
    are embeddable, raw PCM retained for the exact finalize.
    """

    TAIL_GUARD = 4     # frontier frames the mirror tail may still change

    def __init__(self, vfs, basename="<live>"):
        self.vfs = vfs
        self.basename = basename
        self.vad_online = OnlineSegmenter(vfs.vad)
        self._parts = []
        self._total = 0
        self._dtype = None
        self._emb = {}          # window start frame -> RAW xvector | None
        self._fea = None        # device features of the buffered prefix
        self._fea_len = -1
        self._cur = None        # (scoring inputs key, result) cache
        self._finalized = None
        self._stream = None     # VbxPcmStreamOnline (int16 device path)
        self._use_stream = None
        self._min_new = max(1, int(os.environ.get("ISS_ONLINE_VFS_BATCH",
                                                  "32")))

    @property
    def _group(self):
        # one owner of the upload-group size (follow_wav_vfs's bounded
        # reads must track the VAD's actual grouping)
        return self.vad_online._group

    def feed(self, pcm):
        """Append a block of 16 kHz mono samples (int16 or float).  The
        block is COPIED: live-capture callbacks routinely reuse their
        buffer (e.g. sounddevice's ``indata``), and an aliased store would
        silently turn the whole stream into copies of the last block."""
        if self._finalized is not None:
            raise RuntimeError("feed() after finalize()")
        pcm = np.asarray(pcm)
        kind = np.int16 if pcm.dtype == np.int16 else np.float32
        if self._dtype is None:
            self._dtype = kind
            self._use_stream = kind == np.int16 and self._stream_eligible()
            if self._use_stream:
                from .dsp.vbx import VbxPcmStreamOnline

                self._stream = VbxPcmStreamOnline(self.vfs.features)
        elif kind != self._dtype:
            raise TypeError("feed dtype changed mid-stream")
        if self._use_stream:
            self._stream.append(np.ascontiguousarray(pcm, np.int16))
            # raw PCM kept only until one analysis window exists (the
            # too-short finalize must reproduce the offline error path);
            # past that the stream owns the samples — bounded memory
            if self._total < 400:
                self._parts.append(np.array(pcm, dtype=self._dtype,
                                            copy=True))
            elif self._parts:
                self._parts = []
        else:
            self._parts.append(np.array(pcm, dtype=self._dtype, copy=True))
        self._total += len(pcm)
        self.vad_online.feed(pcm)
        return self

    def _stream_eligible(self):
        """int16 device feature path available for incremental use?"""
        from .dsp.vbx import VbxFrontend, vbx_i16_enabled
        from .vfs import JaxResnetExtractor

        return (vbx_i16_enabled()
                and isinstance(self.vfs.features, VbxFrontend)
                and isinstance(self.vfs.xvector_model, JaxResnetExtractor))

    def _signal(self):
        return (np.concatenate(self._parts) if self._parts
                else np.zeros(0, self._dtype or np.float32))

    def _frames_now(self):
        # VBx frame count of the mirror-padded signal (+120 front,
        # +200 back, 400-sample windows at 160-hop)
        n = self._total + 320
        return (n - 400) // 160 + 1 if n >= 400 else 0

    def _final_starts(self, frames):
        """Window starts whose features are FINAL at `frames`: the window
        plus the CMVN right context is behind the frontier (minus the
        mirror-tail guard), and enough frames exist that the stream
        head's CMVN window is saturated (early frames use up to lc+rc
        context, not just rc)."""
        from .vfs import STEP, WINLEN

        fe = self.vfs.features
        if frames < fe.lc + fe.rc + 1 + self.TAIL_GUARD:
            return []
        horizon = frames - fe.rc - self.TAIL_GUARD
        return [s for s in range(0, frames - WINLEN, STEP)
                if s + WINLEN <= horizon]

    def current(self):
        """Provisional (score | None, speech_duration_s, n_xvectors)."""
        if self._finalized is not None:
            return self._finalized
        from .vfs import WINLEN

        import jax.numpy as jnp

        timeline = SpeechTimeline.from_vad(self.vad_online.current())
        speech_dur = timeline.total_duration()
        if not speech_dur:
            return None, speech_dur, 0

        def seg_of(s):
            return (round(s / 100.0, 3), round(s / 100.0 + WINLEN / 100.0, 3))

        if self._use_stream:
            from .vfs import STEP

            # every window fully behind the stream's final-feature
            # frontier (block granularity already embeds the CMVN guard)
            fr = self._stream.frames_ready
            starts = list(range(0, max(fr - WINLEN + 1, 0), STEP))
        else:
            starts = self._final_starts(self._frames_now())
        in_speech = [s for s in starts
                     if timeline.contains_point(
                         (seg_of(s)[0] + seg_of(s)[1]) / 2)]
        new = [s for s in in_speech if s not in self._emb]
        # batch the expensive part: embed only when enough NEW windows
        # accumulated (or none were ever embedded)
        if new and (len(new) >= self._min_new or not self._emb):
            if self._use_stream:
                # incremental device features: rows behind `frames_ready`
                # are final and bit-equal to the offline computation — no
                # prefix recompute, no re-upload, O(new windows) only
                fea_dev = self._stream.fea_buffer
            else:
                sig = self._signal()
                if self._fea is None or len(sig) != self._fea_len:
                    signal64 = (sig.astype(np.float64) / 32768.0
                                if self._dtype == np.int16
                                else np.asarray(sig, np.float64))
                    self._fea = self.vfs.features.features(signal64)
                    self._fea_len = len(sig)
                fea_dev = jnp.asarray(self._fea, jnp.float32)
            embs = self.vfs.xvector_model.embeddings_from_features(
                fea_dev, np.asarray(new, np.int32))
            for s, e in zip(new, embs):
                # NaN embeddings recorded as None: never retained, never
                # re-embedded (the canonical extractor logs and drops
                # them the same way, vfs.py)
                self._emb[s] = None if np.isnan(e).any() else e
        # scoring inputs are fully determined by the VAD timeline and the
        # (grow-only) embedding store: between changes the MLP dispatch +
        # readback is skipped, so steady-state polls cost no device work
        # (the VAD result above is itself cached the same way)
        key = (tuple(timeline.intervals), len(self._emb))
        if self._cur is None or self._cur[0] != key:
            xv = [(f"{self.basename}_{s:08}-{s + WINLEN:08}", seg_of(s),
                   self._emb[s] * 10) for s in starts
                  if self._emb.get(s) is not None]
            self._cur = (key, self.vfs._score_xvectors(xv, timeline,
                                                       speech_dur))
        return self._cur[1]

    def finalize(self):
        """Canonical scoring of the full signal — exactly equal to
        ``vfs.score_signal(<everything fed>)``.  Idempotent; an empty
        stream returns (None, 0.0, 0)."""
        if self._finalized is not None:
            return self._finalized
        if self._total == 0:
            self._finalized = (None, 0.0, 0)
        elif self._use_stream and self._total >= 400:
            # exact offline reassembly from the incremental state: the
            # stream's features are bit-equal to the offline ones, cached
            # embeddings are reused, misses embed in one catch-up batch
            vad_seg = self.vad_online.finalize()
            timeline = SpeechTimeline.from_vad(vad_seg)
            speech_duration = timeline.total_duration()
            if not speech_duration:
                self._finalized = (None, speech_duration, 0)
                return self._finalized
            fea = self._stream.finalize()

            def collect(fea_final, needed):
                done = {s: e for s, e in self._emb.items() if e is not None}
                missing = [s for s in needed if s not in done]
                if missing:
                    embs = self.vfs.xvector_model.embeddings_from_features(
                        fea_final, np.asarray(missing, np.int32))
                    for s, e in zip(missing, embs):
                        done[s] = e
                return done

            self._finalized = self.vfs._finish_from_embeddings(
                self.basename, fea, self._total / 16000.0, timeline,
                speech_duration, collect)
        else:
            self._finalized = self.vfs.score_signal(self._signal(),
                                                    self.basename)
        return self._finalized
