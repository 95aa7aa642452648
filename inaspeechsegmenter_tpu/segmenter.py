"""Public segmentation API — reference-compatible `Segmenter`.

Mirrors the reference public surface (reference segmenter.py:111-387):
`DnnSegmenter` subclasses with the same class attributes and per-call
contract, and `Segmenter(vad_engine, detect_gender, ffmpeg, batch_size,
energy_ratio)` with `__call__(media, start_sec, stop_sec)`,
`segment_feats(mspec, loge, difflen, start_sec)` and `batch_process(...)`
(skipifexist / nbtry / trydelay / status-tuple semantics included).

Execution is entirely different from the reference: features, CNNs and
Viterbi run as one fused XLA program per length bucket (see pipeline.py);
`batch_size` is accepted for API parity but the device pipeline always
processes patches in fixed MXU-friendly chunks.
"""

from __future__ import annotations

import os
import time
import warnings

import numpy as np

from .audio.io import media2sig16kmono, check_ffmpeg
from .dsp.sidekit import SidekitFrontend, frame_count
from .export import seg2csv, seg2textgrid
from .models.registry import load_patch_model
from .pipeline import FusedPipeline, rle, bucket_rows
from .utils.env import require_device
from .utils.prefetch import run_prefetched, staged_producer
from .utils.timing import StageTimers


class DnnSegmenter:
    """Patch-CNN segmentation stage (abstract).

    Child classes define `nmel`, `viterbi_arg`, `model_fname`, `inlabel`,
    `outlabels` — same contract as the reference DnnSegmenter
    (segmenter.py:111-125).  The loaded model is a JAX forward pass imported
    from the Keras hdf5 (or native npz) weights.
    """

    def __init__(self, batch_size=32, allow_download=True):
        self.model = load_patch_model(self.model_fname,
                                      allow_download=allow_download)
        self.batch_size = batch_size

    def as_pipeline_stage(self):
        return (self.model.forward, self.nmel, len(self.outlabels),
                self.viterbi_arg)

    def __call__(self, mspec, lseg, difflen=0):
        """Reference-compatible per-stage call: consume (label,start,stop)
         20ms-frame segments, re-label those matching `inlabel` through the
        CNN + Viterbi, pass others through unchanged."""
        from .decode.transitions import diag_trans_exp
        from .decode.viterbi import viterbi_path
        from .dsp.patches import gather_normalized_patches
        import jax.numpy as jnp

        mspec = np.asarray(mspec, np.float32)
        t = len(mspec)
        n20 = (t + 1) // 2 - (int(difflen / 2) if difflen > 0 else 0)
        # pad rows to an even chunkable length for the gather
        tpad = max(t, 68)
        mspec_pad = jnp.asarray(np.pad(mspec, ((0, tpad - t), (0, 0))))
        # gather + CNN in bounded chunks like the reference's
        # keras.predict(batch_size) (segmenter.py:162-163): one all-patch
        # tensor would grow device memory with file length (hour-scale
        # media ~180k patches).  Chunks are padded to one static shape so
        # a single compiled program serves the whole file.
        chunk = max(int(self.batch_size), 256)
        if n20 <= 0:
            return [seg for seg in lseg]
        probs_l = []
        for j0 in range(0, n20, chunk):
            j = j0 + jnp.arange(chunk)
            patches, finite = gather_normalized_patches(
                mspec_pad, jnp.minimum(j, n20 - 1), t, self.nmel)
            p = self.model.forward(self.model.params, patches[..., None])
            p = jnp.where(finite[:, None], p, 0.5)
            probs_l.append(p[:min(chunk, n20 - j0)])
        probs = jnp.concatenate(probs_l) if len(probs_l) > 1 else probs_l[0]
        inmask = np.zeros(n20, bool)
        for lab, start, stop in lseg:
            if lab == self.inlabel:
                inmask[start:stop] = True
        reset = np.zeros(n20, bool)
        reset[1:] = inmask[1:] != inmask[:-1]
        # also reset at every in-label segment START: the reference decodes
        # each (label, start, stop) segment independently (segmenter.py:
        # 166-178), so two ADJACENT same-label segments must not share one
        # Viterbi (mask transitions alone would merge them)
        for lab, start, stop in lseg:
            if lab == self.inlabel and 0 < start < n20:
                reset[start] = True
        em = jnp.where(jnp.asarray(inmask)[:, None], jnp.log(probs), 0.0)
        states = np.asarray(viterbi_path(
            em, diag_trans_exp(self.viterbi_arg, len(self.outlabels)),
            reset=jnp.asarray(reset)))
        ret = []
        for lab, start, stop in lseg:
            if lab != self.inlabel:
                ret.append((lab, start, stop))
                continue
            for s, a, b in rle(states[start:stop]):
                ret.append((self.outlabels[s], a + start, b + start))
        return ret


class SpeechMusic(DnnSegmenter):
    # Voice activity detection, 'sm' engine (reference segmenter.py:182-188)
    outlabels = ("speech", "music")
    model_fname = "keras_speech_music_cnn.hdf5"
    inlabel = "energy"
    nmel = 21
    viterbi_arg = 150


class SpeechMusicNoise(DnnSegmenter):
    # Voice activity detection, 'smn' engine (reference segmenter.py:190-196)
    outlabels = ("speech", "music", "noise")
    model_fname = "keras_speech_music_noise_cnn.hdf5"
    inlabel = "energy"
    nmel = 21
    viterbi_arg = 80


class Gender(DnnSegmenter):
    # Gender segmentation (reference segmenter.py:198-204)
    outlabels = ("female", "male")
    model_fname = "keras_male_female_cnn.hdf5"
    inlabel = "speech"
    nmel = 24
    viterbi_arg = 80


class Segmenter:
    def __init__(self, vad_engine="smn", detect_gender=True, ffmpeg="ffmpeg",
                 batch_size=32, energy_ratio=0.03, allow_download=True):
        """Load models and build the fused device pipeline.

        Same parameters/defaults as the reference ctor (segmenter.py:208-247):
        `vad_engine` in {'sm','smn'}, `detect_gender` bool, `ffmpeg` binary
        name or None (then only 16 kHz WAV input is accepted), `batch_size`
        (API parity), `energy_ratio` for the energy VAD threshold.
        """
        # bounded probe before the ctor's device touches (param uploads,
        # auto-frontend link measurement): a stalled accelerator link must
        # raise a clear TimeoutError, not hang the caller (ISS_CTOR_LINK_WAIT)
        require_device("Segmenter()")
        self.ffmpeg = check_ffmpeg(ffmpeg)
        self.energy_ratio = energy_ratio
        self.batch_size = batch_size

        assert vad_engine in ["sm", "smn"]
        if vad_engine == "sm":
            self.vad = SpeechMusic(batch_size, allow_download)
        elif vad_engine == "smn":
            self.vad = SpeechMusicNoise(batch_size, allow_download)

        assert detect_gender in [True, False]
        self.detect_gender = detect_gender
        if detect_gender:
            self.gender = Gender(batch_size, allow_download)

        self.frontend = _default_frontend()
        self.pipeline = FusedPipeline(
            self.vad.as_pipeline_stage(),
            self.gender.as_pipeline_stage() if detect_gender else None,
            energy_ratio=energy_ratio)
        # label-id -> name table used to decode the fused pipeline output
        self.labels = ["noEnergy"] + list(self.vad.outlabels)
        if detect_gender:
            self.labels += list(self.gender.outlabels)
        self.timers = StageTimers("decode", "features", "segment")

    # ------------------------------------------------------------------
    def _media2feats(self, medianame, start_sec, stop_sec):
        """Decode + features; returns (mspec_dev, loge_dev, t, difflen).

        Matches reference `_media2feats` (segmenter.py:53-67) incl. the
        short-media pad-to-68-frames-with-min behavior.
        """
        with self.timers.time("decode"):
            # 'auto' keeps losslessly-PCM16 sources as int16 so the device
            # upload is half-size; conversion to the identical float32
            # happens on device
            sig = media2sig16kmono(medianame, start_sec, stop_sec,
                                   self.ffmpeg, "auto")
        return self._sig2feats(sig, medianame)

    def _sig2feats(self, sig, medianame="<signal>"):
        """Features for a decoded signal -> (mspec_dev, loge_dev, t, difflen)."""
        with self.timers.time("features"):
            t = frame_count(len(sig))
            bucket = bucket_rows(t)
            mspec, loge, t = self.frontend.mspec_loge(sig, pad_frames_to=bucket)
        mspec, difflen = short_media_pad(mspec, t, medianame)
        return mspec, loge, t, difflen

    def ids_to_lseg(self, ids, start_sec=0.0):
        """Frame-label ids (20 ms hop) -> [(label, start_s, stop_s)].

        The single frame->seconds conversion shared by every decode
        surface (fused, streaming, batch engine, sequence-parallel)."""
        return [(self.labels[lab], start_sec + start * .02,
                 start_sec + stop * .02)
                for lab, start, stop in rle(ids)]

    def _fused_segment(self, mspec_dev, loge_dev, t, difflen, start_sec):
        n_frames_patch, n20 = patch_counts(t, difflen)
        with self.timers.time("segment"):
            ids = self.pipeline.run(
                self.vad.model.params,
                self.gender.model.params if self.detect_gender else None,
                mspec_dev, loge_dev, t, n_frames_patch, n20)
            ids = np.asarray(ids)[:n20]
        return self.ids_to_lseg(ids, start_sec)

    # ------------------------------------------------------------------
    def segment_feats(self, mspec, loge, difflen, start_sec):
        """Segment host-side features (API parity, segmenter.py:250-276).

        `mspec` (T,24) float32 log-mel, `loge` (T,) log-energy, `difflen`
        as produced by `_media2feats`.
        """
        import jax.numpy as jnp

        loge = np.asarray(loge, np.float32)
        mspec = np.asarray(mspec, np.float32)
        t = len(loge)
        bucket = bucket_rows(max(t, len(mspec)))
        loge_pad = np.full(bucket, -np.inf, np.float32)
        loge_pad[:t] = loge
        mspec_pad = np.zeros((bucket, mspec.shape[1]), np.float32)
        mspec_pad[:len(mspec)] = mspec
        return self._fused_segment(jnp.asarray(mspec_pad),
                                   jnp.asarray(loge_pad), t, difflen,
                                   start_sec)

    def __call__(self, medianame, start_sec=None, stop_sec=None):
        """Segment a media file -> [(label, start_s, stop_s)] tiling the
        analyzed window (reference segmenter.py:279-294).

        Multi-chunk files take the streaming path: one VAD-CNN program per
        feature chunk is dispatched as that chunk's upload lands, so CNN
        emissions overlap the remaining transfers instead of waiting for the
        whole file (pipeline.run_streaming); identical labels to the fused
        whole-file program (asserted in tests/test_segmenter_e2e.py).
        Disable with ISS_STREAMING=0.
        """
        s0 = 0 if start_sec is None else start_sec
        with self.timers.time("decode"):
            sig = media2sig16kmono(medianame, start_sec, stop_sec,
                                   self.ffmpeg, "auto")
        return self.segment_signal(sig, s0, medianame)

    def segment_signal(self, sig, start_sec=0, medianame="<signal>",
                       return_pcm=False):
        """Segment an already-decoded 16 kHz mono signal (int16 or float)
        -> [(label, start_s, stop_s)] — or ``(lseg, pcm_parts | None)``
        with ``return_pcm=True``.

        Framework extension: callers that already hold the PCM (e.g.
        `VoiceFemininityScoring`, which needs the same signal for its VBx
        features) skip a second decode of the same file; identical output
        to `__call__` on the file (the decode is deterministic).
        ``return_pcm=True`` additionally hands back the device-resident
        int16 upload buffers (when the streaming int16 path ran; None
        otherwise) so the same transfer also feeds the VBx frontend.
        """
        s0 = start_sec
        if not (os.environ.get("ISS_STREAMING", "1") != "0"
                and hasattr(self.frontend, "mspec_loge_chunks")):
            mspec, loge, t, difflen = self._sig2feats(sig, medianame)
            ret = self._fused_segment(mspec, loge, t, difflen, s0)
            return (ret, None) if return_pcm else ret

        import jax.numpy as jnp

        # REAL chunks only: stream_decode pads the probs/mels to the
        # bucket ladder itself, so computing features + CNN emissions
        # for padding chunks would be pure waste (a 1200 s file pads
        # 30 -> 42 chunks on the ladder: 40% extra chunk programs).
        #
        # Emission dispatch is INTERLEAVED with the upload groups: the
        # device executes its queue in order, so emissions all dispatched
        # after the last upload (the old run_streaming driver) could only
        # START once the final transfer landed — on link-bound hosts the
        # whole CNN pass ran serially after the upload.  Dispatching each
        # chunk's emissions as soon as its right halo exists lets them
        # execute between the remaining transfers; values are identical
        # (same chunk_emissions programs, same halos).
        spec_gender = (self.detect_gender
                       and os.environ.get("ISS_STREAM_GENDER", "0") == "1")
        vp = self.vad.model.params
        gp = self.gender.model.params if self.detect_gender else None
        with self.timers.time("features"):
            t = frame_count(len(sig))
            chunks, probs_v, probs_g = [], [], []
            pcm = [] if return_pcm else None

            def dispatch_ready():
                while len(probs_v) < len(chunks) - 1:
                    c = len(probs_v)
                    pv, pg = self.pipeline.chunk_emissions(
                        vp, gp if spec_gender else None, chunks, c)
                    probs_v.append(pv)
                    if spec_gender:
                        probs_g.append(pg)

            for chunks_g, pcm_g in self.frontend.iter_group_feats(
                    sig, keep_pcm=return_pcm):
                chunks.extend(chunks_g)
                if pcm is not None and pcm_g is not None:
                    pcm.append(pcm_g)
                if t >= 68 and len(chunks) >= 2:
                    dispatch_ready()
            if pcm is not None and not pcm:
                pcm = None          # float sources: no shared PCM
        if t >= 68 and len(chunks) >= 2:
            n20 = (t + 1) // 2
            with self.timers.time("segment"):
                pv, pg = self.pipeline.chunk_emissions(
                    vp, gp if spec_gender else None, chunks,
                    len(chunks) - 1)
                probs_v.append(pv)
                if spec_gender:
                    probs_g.append(pg)
                ids = self.pipeline.stream_decode(
                    vp, gp, chunks, probs_v,
                    probs_g if spec_gender else None, t, t, n20)
                ids = np.asarray(ids)[:n20]
            ret = self.ids_to_lseg(ids, s0)
            return (ret, pcm) if return_pcm else ret
        # short or single-chunk media: fused whole-file program
        mspec = jnp.concatenate([m for m, _ in chunks])
        loge = jnp.concatenate([l for _, l in chunks])
        mspec, difflen = short_media_pad(mspec, t, medianame)
        ret = self._fused_segment(mspec, loge, t, difflen, s0)
        return (ret, pcm) if return_pcm else ret

    def refresh_frontend(self):
        """Re-evaluate the auto host-vs-device frontend choice against a
        fresh (TTL-cached) link probe; a no-op unless ISS_FRONTEND is
        'auto' and the decision actually flipped.  Called at the start of
        every `batch_process` so a farm worker that outlives a link-speed
        regime change adapts at the next lease instead of never."""
        if os.environ.get("ISS_FRONTEND", "auto") != "auto":
            return self.frontend
        new = _default_frontend()
        if type(new) is not type(self.frontend):
            self.frontend = new
        return self.frontend

    # ------------------------------------------------------------------
    def batch_process(self, linput, loutput, verbose=False, skipifexist=False,
                      nbtry=1, trydelay=2., output_format="csv"):
        """Batch segmentation with host decode/feature prefetch overlapping
        device inference (reference segmenter.py:297-335 semantics: returns
        (t_batch_dur, nb_processed, avg_per_file, status tuples))."""
        if verbose:
            print("batch_processing %d files" % len(linput))

        if output_format == "csv":
            fexport = seg2csv
        elif output_format == "textgrid":
            fexport = seg2textgrid
        else:
            raise NotImplementedError()

        # long-lived servers: the ctor's link probe may be hours stale and
        # the tunneled link swings several-fold by the hour — re-evaluate
        # the auto frontend choice per batch (never mid-batch, so one
        # batch's outputs all come from one frontend)
        self.refresh_frontend()

        produce = staged_producer(
            lambda src: self._media2feats(src, None, None),
            skipifexist=skipifexist, nbtry=nbtry, trydelay=trydelay)

        def consume(feats, item, msg):
            mspec, loge, t, difflen = feats
            b = time.time()
            lseg = self._fused_segment(mspec, loge, t, difflen, 0)
            fexport(lseg, item[1])
            return (msg[0], msg[1], "ok " + str(time.time() - b))

        # Shared depth-N prefetch driver (utils/prefetch.py): the next
        # files' decode+features overlap the current file's device
        # inference, and a bad destination fails that one file's status
        # tuple instead of the batch.
        return run_prefetched(list(zip(linput, loutput)), produce, consume,
                              verbose=verbose)


_LINK_MBPS = None       # (value, measured_at_monotonic)


def _link_bandwidth_mbps(max_age_s=None):
    """Measured host->device link bandwidth (MB/s), cached with a TTL.

    Tunneled links swing several-fold between hours (docs/performance.md),
    so a once-per-process probe can leave a long-lived server on the wrong
    frontend for its remaining lifetime; the cached value expires after
    ``ISS_LINK_PROBE_TTL`` seconds (default 600) and the next caller
    re-probes (~0.1 s).  ``max_age_s=None`` uses the env default; pass
    ``float('inf')`` for the old once-per-process behavior."""
    global _LINK_MBPS
    if max_age_s is None:
        max_age_s = float(os.environ.get("ISS_LINK_PROBE_TTL", "600"))
    now = time.monotonic()
    if _LINK_MBPS is None or now - _LINK_MBPS[1] > max_age_s:
        import jax
        import jax.numpy as jnp

        buf = np.zeros(1 << 20, np.float32)          # 4 MB
        jax.block_until_ready(jnp.asarray(buf))      # warm the path
        t0 = time.perf_counter()
        jax.block_until_ready(jnp.asarray(np.ones(2 << 20, np.float32)))
        _LINK_MBPS = (8.0 / max(time.perf_counter() - t0, 1e-6), now)
    return _LINK_MBPS[0]


def _default_frontend():
    """Frontend selection (all variants parity-tested against the numpy
    reference):

    * `jnp`   — on-device features, raw signal uploaded (default on CPU and
                on fat-link hosts: the chip computes features ~free and the
                host CPU stays idle);
    * `host`  — features on the host CPU, only (mspec, loge) uploaded —
                3.2x fewer link bytes than int16 PCM; wins when the
                host->device link, not the chip, bounds throughput;
    * `pallas`— fused on-device feature kernel (dsp/pallas_fe.py).  Kept
                opt-in: features are ~5% of the device budget, and measured
                end-to-end it is upload-bound exactly like `jnp`, so the
                kernel cannot pay for its extra compile time (see
                docs/performance.md);
    * `auto`  (default) — `jnp` on CPU; on accelerators pick `host` only
                when the host has enough cores to hide feature FFTs behind
                device work (>= 4) AND the measured link is slow
                (< 250 MB/s).  On single-core hosts the accelerator runtime's
                busy-wait threads starve host numpy whenever device work is
                in flight, so host features cannot overlap and `jnp` wins
                regardless of link speed.
    """
    choice = os.environ.get("ISS_FRONTEND", "auto")
    if choice == "pallas":
        from .dsp.pallas_fe import PallasSidekitFrontend

        return PallasSidekitFrontend()
    if choice == "host":
        from .dsp.host_fe import HostSidekitFrontend

        return HostSidekitFrontend()
    if choice == "auto":
        import jax

        if jax.default_backend() != "cpu" and (os.cpu_count() or 1) >= 4 \
                and _link_bandwidth_mbps() < 250:
            from .dsp.host_fe import HostSidekitFrontend

            return HostSidekitFrontend()
    return SidekitFrontend()


def patch_counts(t, difflen):
    """(n_frames_patch, n20) for the fused pipeline: the reference's
    68-frame short-media pad arithmetic (segmenter.py:60-66, 150-152) —
    the single source for both the per-file and the batched engine path."""
    if difflen > 0:
        return 68, (68 + 1) // 2 - int(difflen / 2)
    return t, (t + 1) // 2


def short_media_pad(mspec, t, medianame):
    """Shared t<68 handling -> (mspec, difflen): warn like the reference
    (segmenter.py:62-66) and pad the mel rows with their min value."""
    if t >= 68:
        return mspec, 0
    warnings.warn(
        "media %s duration is short. Robust results require length "
        "of at least 720 milliseconds" % medianame)
    return _pad_short_mspec(mspec, t), 68 - t


def _pad_short_mspec(mspec_dev, t):
    """Pad a <68-frame mel spectrogram to 68 rows with its min value
    (reference segmenter.py:62-66), keeping the padded device layout."""
    import jax.numpy as jnp

    if t < 1:
        # the reference crashes the same way deeper in (np.min over an
        # empty array, segmenter.py:62-66); make the error actionable
        raise ValueError(
            "media too short to analyse: no complete 25 ms analysis "
            "window (need >= 400 samples at 16 kHz)")
    m = np.asarray(mspec_dev[:t])
    fill = np.min(m)
    out = np.full((mspec_dev.shape[0], m.shape[1]), 0.0, np.float32)
    out[:t] = m
    out[t:68] = fill
    return jnp.asarray(out)
