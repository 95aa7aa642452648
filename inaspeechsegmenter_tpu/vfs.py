"""Voice Femininity Scoring — the VBx x-vector pipeline.

Mirrors the reference contract (reference vbx_segmenter.py:92-202):
``VoiceFemininityScoring(gd_model_criteria, backend)(fpath)`` returns
``(score | None, speech_duration, n_retained_xvectors)`` with identical
VAD-overlap filtering (midpoint in speech, overlap >= threshold, >=50%
back-fill) and window bookkeeping (144-frame windows, step 24, tail >= 10
frames, x-vectors scaled x10, NaN windows dropped).

TPU redesign of the reference hot spot: the reference runs one ONNX
`session.run` per 1.44 s window (vbx_segmenter.py:222-224, "most costly part"
per its own comments); here all full windows are batched into a single padded
(B, 64, 144) ResNet101 forward on the MXU.
"""

from __future__ import annotations

import logging
import os

import jax
import jax.numpy as jnp
import numpy as np

from .annotations import SpeechTimeline
from .audio.io import media2sig16kmono
from .dsp.vbx import VbxFrontend, vbx_i16_enabled as _vbx_i16_enabled
from .models.registry import get_remote, load_patch_model
from .models.resnet import ResNet101XVector
from .segmenter import Segmenter
from .utils.env import require_device

logger = logging.getLogger(__name__)

STEP = 24
WINLEN = 144
FEAT_DIM = 64
EMBED_DIM = 256
SR = 16000


def add_needed_vectors(xvectors, t_mid):
    """Back-fill best-VAD-overlap windows until >= 50% are retained
    (reference vbx_segmenter.py:40-52)."""
    min_pred = round(0.5 * len(t_mid))
    if len(xvectors) < min_pred:
        t_mid = sorted(t_mid, key=lambda e: e[0], reverse=True)
        diff = min_pred - len(xvectors)
        for _, k, seg, x in t_mid[len(xvectors):len(xvectors) + diff]:
            xvectors.append((k, seg, x))
    return xvectors


def get_femininity_score(g_preds):
    """Fraction of retained windows with p >= 0.5
    (reference vbx_segmenter.py:55-61)."""
    return sum(1 for _, _, p in g_preds if p >= 0.5) / len(g_preds)


def score_to_csv(result, dst):
    """Write one (score, speech_duration, nb_vectors) result as the VFS
    csv row (shared by batch_score and the CLI --follow path)."""
    score, speech_dur, n_vec = result
    with open(dst, "w") as fh:
        fh.write("score\tspeech_duration\tnb_vectors\n")
        fh.write("%s\t%s\t%d\n" % (
            "" if score is None else repr(float(score)),
            repr(float(speech_dur)), n_vec))


def _accepts_timeline(extractor):
    """True if the x-vector extractor takes a ``timeline`` kwarg (our
    speech-only fast path).  Reference-style extractors are called with
    exactly (basename, features, duration) — vbx_segmenter.py:182."""
    import inspect

    try:
        params = inspect.signature(extractor).parameters
    except (TypeError, ValueError):
        return False
    return ("timeline" in params
            or any(p.kind == inspect.Parameter.VAR_KEYWORD
                   for p in params.values()))


class JaxResnetExtractor:
    """Batched x-vector extractor (replaces OnnxBackendExtractor).

    Loads weights from `raw_81.pth` (torch checkpoint) or a converted native
    npz; runs all full windows in one batched forward, padded to power-of-two
    batch buckets to bound recompiles.  The ragged tail window (>=10 frames)
    runs at its exact length like the reference (vbx_segmenter.py:234-243).
    """

    def __init__(self, allow_download=True, params=None, net=None,
                 mesh=None):
        self.net = net or ResNet101XVector(feat_dim=FEAT_DIM,
                                           embed_dim=EMBED_DIM)
        self.mesh = mesh
        self._sharded_fwd = None
        # masked-forward program for the ragged tail window: every tail
        # length (10..144 frames) runs zero-padded to WINLEN through this
        # ONE program (n_valid traced) instead of compiling a full
        # ResNet101 per distinct length — 20-40 s each through the
        # tunneled link, recurring across a corpus
        self._masked_fwd = self.net._jit
        if mesh is not None:
            # multi-chip x-vector extraction: windows are independent, so
            # the sub-batch axis shards over the mesh data axis (params
            # replicated) and every chip runs its slice of the ResNet —
            # XLA inserts no collectives until the host gathers embeddings
            from jax.sharding import NamedSharding, PartitionSpec as P

            data = NamedSharding(mesh, P("data"))
            rep = NamedSharding(mesh, P())
            self._sharded_fwd = jax.jit(
                self.net.forward,
                in_shardings=(rep, data), out_shardings=data)
        if params is not None:
            self.params = params
        else:
            path = self._find_weights(allow_download)
            if path.endswith(".npz"):
                self.params = _load_resnet_npz(path)
            elif path.endswith(".pth"):
                self.params = self.net.load_torch_checkpoint(path)
            else:
                self.params = _load_resnet_onnx(self.net, path)
        # device-resident params: numpy leaves would re-upload the ~60 MB
        # ResNet checkpoint on EVERY jitted forward (one per 256-window
        # sub-batch — measured 57 s/20 min of audio through the tunneled
        # link before this line)
        self.params = jax.tree_util.tree_map(jnp.asarray, self.params)

    def _find_weights(self, allow_download):
        for name in ("raw_81.pth", "final.onnx"):
            try:
                return get_remote(name, allow_download=allow_download)
            except FileNotFoundError:
                continue
        raise FileNotFoundError(
            "no x-vector weights found (raw_81.pth / final.onnx); set "
            "ISS_TPU_MODEL_DIR or provide params")

    def get_embedding(self, fea):
        """(T, 64) features -> (256,) x-vector (single window, exact length)."""
        out = self.net(self.params, jnp.asarray(fea.T[None]))
        return np.asarray(out)[0]

    def get_embedding_masked(self, fea_dev, start, length):
        """Tail-window embedding via the bounded masked program: gather the
        window zero-padded to WINLEN on device and run the shared masked
        forward at its true length (see models/resnet.py forward(n_valid));
        equal to `get_embedding` on the exact-length slice up to float
        reassociation (tests/test_resnet.py::test_masked_forward_*)."""
        t = fea_dev.shape[0]
        # clamped gather: positions >= `length` duplicate the last frame,
        # but the masked forward zeroes every position >= n_valid anyway
        idx = jnp.minimum(start + jnp.arange(WINLEN), t - 1)
        out = self._masked_fwd(self.params,
                               jnp.transpose(fea_dev[idx], (1, 0))[None],
                               jnp.asarray([length], jnp.int32))
        return np.asarray(out)[0]

    def dispatch_windows(self, fea_dev, starts):
        """Gather + ResNet-forward ONE sub-batch of full windows; returns
        the (len(starts), 256) device output with NO host sync — the
        overlapped scorer's speculative unit.  Callers pass exactly
        `_xvec_layout()[0]` starts so every dispatch reuses the one
        compiled full-sub-batch program; per-window values are identical
        to `embeddings_from_features` (eval-mode BN, per-sample pooling:
        batch composition cannot change a window's embedding)."""
        idx = (jnp.asarray(np.asarray(starts, np.int32))[:, None]
               + jnp.arange(WINLEN)[None, :])
        wins = jnp.transpose(fea_dev[idx], (0, 2, 1))
        fwd = self._sharded_fwd if self._sharded_fwd is not None else self.net
        return fwd(self.params, wins)

    def get_embeddings_batch(self, windows):
        """(B, 64, T) stacked windows (host or device) -> (B, 256) np.

        Runs fixed-size sub-batches of ``ISS_XVEC_BATCH`` (default 256)
        windows: a single all-windows forward scales its activation memory
        with the file length and OOMs v5e at ~5k windows (a 20-minute
        file); sub-batching bounds memory at ~1.5 GB and reuses one
        compiled program for every full sub-batch.  The tail sub-batch
        pads to a power-of-two bucket.  BN is eval-mode and pooling is
        per-sample, so sub-batching is numerically identical to one batch.
        """
        b = len(windows)
        if b == 0:
            return np.zeros((0, self.net.embed_dim), np.float32)
        sub, buckets = self._xvec_layout()
        fwd = self._sharded_fwd if self._sharded_fwd is not None else self.net
        w = jnp.asarray(windows, jnp.float32)
        outs = []
        for g in range(0, b, sub):
            k = min(sub, b - g)
            bucket = next(x for x in buckets if x >= k)
            if bucket == k:   # full sub-batch, or a pre-padded tail bucket
                outs.append(fwd(self.params, w[g:g + k]))
            else:
                part = jnp.concatenate([
                    w[g:g + k],
                    jnp.zeros((bucket - k,) + w.shape[1:], jnp.float32)])
                outs.append(fwd(self.params, part)[:k])
        return np.concatenate([np.asarray(o) for o in outs])

    def _xvec_layout(self):
        """(sub, buckets): the mesh-rounded sub-batch size and the sorted
        ladder of mesh-divisible tail buckets (pow2 capped at sub).  ONE
        owner for the layout shared by the gather pre-padding
        (`embeddings_from_features`) and the forward dispatch
        (`get_embeddings_batch`): if the two disagreed, every pre-padded
        tail count would compile a fresh ResNet101 program (20-40 s each
        through a remote-compile tunnel) and could pad past the ~1.5 GB
        activation bound.  The bucket ladder is idempotent by construction
        (every bucket maps to itself), so a pre-padded group is dispatched
        as-is.  On a 1-device mesh this reduces to the plain pow2 ladder.
        """
        sub = max(1, int(os.environ.get("ISS_XVEC_BATCH", "256")))
        n_dev = self.mesh.devices.size if self.mesh is not None else 1
        sub = -(-sub // n_dev) * n_dev          # shardable sub-batches
        buckets = sorted({-(-min(1 << p, sub) // n_dev) * n_dev
                          for p in range((sub - 1).bit_length() + 1)})
        return sub, buckets

    def embeddings_from_features(self, fea_dev, starts):
        """Device-resident path: gather the (nw, 64, WINLEN) windows from
        the on-device feature array instead of stacking them on host — the
        windows overlap 6x (STEP=24 vs WINLEN=144), so a host stack
        re-uploads every feature frame six times over the link.  The
        window count is padded to whole sub-batches plus a tail bucket so
        every ResNet forward comes from the bounded `_xvec_layout` program
        set and the padding waste stays < one tail bucket.
        """
        sub, buckets = self._xvec_layout()
        nw = len(starts)
        full = (nw // sub) * sub
        tail = nw - full
        nw_pad = full + (next(x for x in buckets if x >= tail) if tail else 0)
        st = np.zeros(nw_pad, np.int32)
        st[:nw] = starts
        idx = jnp.asarray(st)[:, None] + jnp.arange(WINLEN)[None, :]
        wins = jnp.transpose(fea_dev[idx], (0, 2, 1))    # (nw_pad, 64, 144)
        return self.get_embeddings_batch(wins)[:nw]

    def __call__(self, basename, fea, duration, timeline=None):
        """Reference-compatible VBxExtractor.__call__ (vbx_segmenter.py:217-246):
        returns [(key, (seg_start, seg_end), xvector*10)].

        ``timeline``: optional `SpeechTimeline` — windows whose midpoint is
        NOT in speech are skipped before the ResNet runs.  Output-identical
        to embedding everything: `apply_vad` (reference
        vbx_segmenter.py:129-145) discards such windows unconditionally —
        they can be neither retained nor back-filled — so skipping them
        only removes wasted compute (the reference's own "most costly
        part", vbx_segmenter.py:174-176).  Disable with
        ``ISS_XVEC_SPEECH_ONLY=0`` (the skipped windows then just get
        embedded and discarded later).
        """
        speech_only = (timeline is not None
                       and os.environ.get("ISS_XVEC_SPEECH_ONLY", "1") != "0")

        def midpoint_in_speech(seg):
            # the exact midpoint apply_vad will test (same rounding)
            return timeline.contains_point((seg[0] + seg[1]) / 2)

        xvectors = []
        starts = list(range(0, len(fea) - WINLEN, STEP))
        segs = [(round(s / 100.0, 3), round(s / 100.0 + WINLEN / 100.0, 3))
                for s in starts]
        if speech_only:
            kept = [i for i, seg in enumerate(segs) if midpoint_in_speech(seg)]
        else:
            kept = list(range(len(starts)))
        if kept:
            embs = self.embeddings_from_features(
                jnp.asarray(fea, jnp.float32),
                np.asarray([starts[i] for i in kept], np.int32))
            for i, emb in zip(kept, embs):
                key = f"{basename}_{starts[i]:08}-{starts[i] + WINLEN:08}"
                if np.isnan(emb).any():
                    logger.warning(f"NaN found, not processing: {key}{os.linesep}")
                else:
                    xvectors.append((key, segs[i], emb))
        start = starts[-1] if starts else 0
        if len(fea) - start - STEP >= 10:
            tail_seg = (round((start + STEP) / 100.0, 3), round(duration, 3))
            if not speech_only or midpoint_in_speech(tail_seg):
                tail_len = len(fea) - (start + STEP)
                if os.environ.get("ISS_XVEC_TAIL", "masked") == "exact":
                    emb = self.get_embedding(
                        np.asarray(fea[start + STEP:], np.float32))
                else:
                    emb = self.get_embedding_masked(
                        jnp.asarray(fea, jnp.float32), start + STEP, tail_len)
                key = f"{basename}_{start + STEP:08}-{len(fea):08}"
                if np.isnan(emb).any():
                    logger.warning(f"NaN found, not processing: {key}{os.linesep}")
                else:
                    xvectors.append((key, tail_seg, emb))
        return [(key, seg, x * 10) for key, seg, x in xvectors]


from functools import partial as _partial


@_partial(jax.jit, static_argnames=("pipe",))
def _prov_step(pipe, s, cnt, probs_v, loge_c, energy_ratio):
    """One provisional-VAD step for the overlapped scorer: fold chunk c's
    finite log-energies into the running global stats and decode a
    CHUNK-LOCAL 20 ms speech mask with the real pipeline machinery
    (energy Viterbi under the RUNNING threshold, then the masked VAD
    Viterbi) — restricted to this chunk's frames, so it costs O(chunk)
    regardless of backlog, entirely ON DEVICE (host numpy is starved by
    the runtime's busy-wait threads on small hosts — a host-side
    threshold pass measured +0.6 s on the 1-core bench host).  Heuristic
    only (chunk-edge Viterbi mixing and running-threshold drift can
    disagree with the global decode — measured ~2% of windows on the
    bench mix): it chooses which windows to embed early; the exact
    decoded timeline makes the final call."""
    from .pipeline import EPS, _shift_right

    fin = jnp.isfinite(loge_c)
    s = s + jnp.sum(jnp.where(fin, loge_c, 0.0))
    cnt = cnt + jnp.sum(fin.astype(jnp.float32))
    thr = s / jnp.maximum(cnt, 1.0) + jnp.log(energy_ratio)
    act = loge_c > thr
    em = jnp.stack([
        jnp.where(act, np.float32(np.log(EPS)), np.float32(np.log(1 - EPS))),
        jnp.where(act, np.float32(np.log(1 - EPS)), np.float32(np.log(EPS))),
    ], axis=1)
    reset = jnp.zeros(loge_c.shape[0], bool).at[0].set(True)
    energy20 = pipe._viterbi(em, pipe.e_trans, pipe.e_init, reset)[::2] == 1
    emv = jnp.where(energy20[:, None], jnp.log(probs_v), 0.0)
    resetv = (energy20 != _shift_right(energy20)).at[0].set(True)
    v_states = pipe._viterbi(emv, pipe.v_trans, pipe.v_init, resetv)
    return s, cnt, energy20 & (v_states == 0)


class _EmbedSession:
    """Speculative x-vector dispatch bookkeeping for the overlapped scorer.

    Windows queue as their provisional verdicts arrive; every full
    `ISS_XVEC_BATCH` sub-batch is dispatched immediately (device output
    kept, NO host sync — the ResNet executes behind the remaining upload
    stream).  `collect` materializes everything once and embeds whatever
    the speculation missed in one exact catch-up batch."""

    def __init__(self, xm):
        self.xm = xm
        self.sub, self.buckets = xm._xvec_layout()
        self.pending = []
        self.batches = []           # (real_starts, device_out)

    def queue(self, start, fea_dev):
        self.pending.append(start)
        if len(self.pending) >= self.sub:
            batch = self.pending[: self.sub]
            self.pending = self.pending[self.sub:]
            out = self.xm.dispatch_windows(fea_dev, batch)
            out.copy_to_host_async()    # D2H rides behind the compute
            self.batches.append((batch, out))

    def flush(self, fea_dev):
        """Dispatch the ragged remainder, padded to a layout bucket (the
        pad windows are discarded at collect)."""
        if self.pending:
            k = len(self.pending)
            bucket = next(x for x in self.buckets if x >= k)
            batch = self.pending + [0] * (bucket - k)
            out = self.xm.dispatch_windows(fea_dev, batch)
            out.copy_to_host_async()
            self.batches.append((self.pending, out))
            self.pending = []

    def collect(self, fea, needed_starts):
        """-> {start: (256,) np embedding} for every needed window —
        speculative results plus one catch-up batch for the misses."""
        done = {}
        for batch, out in self.batches:
            arr = np.asarray(out)
            for j, s in enumerate(batch):
                done[s] = arr[j]
        missing = [s for s in needed_starts if s not in done]
        if missing:
            embs = self.xm.embeddings_from_features(
                fea, np.asarray(missing, np.int32))
            for s, e in zip(missing, embs):
                done[s] = e
        return done

    @property
    def n_speculative(self):
        return sum(len(b) for b, _ in self.batches) + len(self.pending)


class VoiceFemininityScoring:
    """Voice femininity scoring with the reference constructor contract
    (vbx_segmenter.py:97-127)."""

    def __init__(self, gd_model_criteria="bgc", backend="jax",
                 allow_download=True, xvector_params=None, xvector_net=None,
                 ffmpeg="ffmpeg", mesh=None):
        """`mesh`: optional 1-D `jax.sharding.Mesh` ('data' axis) — x-vector
        window batches shard across its devices (framework extension; the
        reference farms whole files to single-GPU workers instead)."""
        assert backend in ["jax", "onnx", "pytorch"], \
            "backend is accepted for API parity; execution is always JAX"
        # bounded probe before the ~60 MB ResNet param upload below: a
        # stalled accelerator link raises TimeoutError instead of hanging
        # (ISS_CTOR_LINK_WAIT; see utils/env.require_device)
        require_device("VoiceFemininityScoring()")
        self.xvector_model = JaxResnetExtractor(allow_download,
                                                params=xvector_params,
                                                net=xvector_net, mesh=mesh)
        assert gd_model_criteria in ["bgc", "vfp"], \
            "Gender detection model criteria must be 'bgc' or 'vfp'"
        if gd_model_criteria == "bgc":
            gd_model = "interspeech2023_all.hdf5"
            self.vad_thresh = 0.7
        else:
            gd_model = "interspeech2023_cvfr.hdf5"
            self.vad_thresh = 0.62
        self.gender_detection_mlp_model = load_patch_model(
            gd_model, allow_download=allow_download)
        self.vad = Segmenter(vad_engine="smn", detect_gender=False,
                             allow_download=allow_download, ffmpeg=ffmpeg)
        self.ffmpeg = ffmpeg
        self.features = VbxFrontend()

    def apply_vad(self, xvectors, timeline: SpeechTimeline):
        """Keep windows whose midpoint is in speech and whose speech overlap
        >= vad_thresh; back-fill to >= 50% (vbx_segmenter.py:129-145)."""
        midpoint_seg = []
        n_xvectors = []
        for key, (start, stop), x in xvectors:
            if timeline.contains_point((start + stop) / 2):
                dur = stop - start
                overlap = timeline.overlap_duration(start, stop)
                if overlap / dur >= self.vad_thresh:
                    n_xvectors.append((key, (start, stop), x))
                midpoint_seg.append((overlap / dur, key, (start, stop), x))
        return add_needed_vectors(n_xvectors, midpoint_seg)

    def _prepare(self, fpath):
        """Decode + VAD + VBx features (everything before the ResNet):
        -> (basename, fea | None, timeline, duration, speech_duration)."""
        basename = os.path.splitext(os.path.basename(fpath))[0]

        # single decode: 'auto' yields exact int16 for losslessly-PCM16
        # sources (the reference decodes the file twice — float64 here and
        # float32 inside its VAD, vbx_segmenter.py:160-164 — with
        # identical sample values); non-PCM16 sources keep the two-decode
        # reference behavior since float32 'auto' would round the float64
        # feature input
        sig = media2sig16kmono(fpath, ffmpeg=self.ffmpeg, dtype="auto")
        # non-PCM16 source: reference two-decode behavior — float64 for the
        # features (the float32 'auto' signal would round the feature
        # input), the 'auto' signal for the VAD
        signal = None if sig.dtype == np.int16 else media2sig16kmono(
            fpath, ffmpeg=self.ffmpeg, dtype="float64")
        if not hasattr(self.vad, "segment_signal"):
            # reference duck-type contract: `vad` is simply CALLED with the
            # path (vbx_segmenter.py:164 `self.vad(fpath)`), so a plain
            # callable can be injected in its place — keep that working
            # (the shared-decode fast paths below need a Segmenter)
            vad_seg = self.vad(fpath)
            return self._finish_prepare(sig, signal, None, basename, vad_seg)
        return self._prepare_signal(sig, basename, signal64=signal,
                                    medianame=fpath)

    def _prepare_signal(self, sig, basename="<signal>", signal64=None,
                        medianame="<signal>"):
        """VAD + VBx features for an already-decoded 16 kHz mono signal —
        the signal-based counterpart of `_prepare` (requires the standard
        Segmenter VAD)."""
        if signal64 is None and sig.dtype != np.int16:
            # a float signal IS the feature signal; _finish_prepare's
            # fallback divides by 2^15 (the int16 scaling) and would turn
            # an already [-1, 1] float input into near-silence
            signal64 = np.asarray(sig, np.float64)
        pcm = None
        if sig.dtype == np.int16:
            # the VAD upload doubles as the VBx feature input: ask the
            # segmenter to keep its device-resident PCM buffers.  The
            # float64 view is only materialized if the device-PCM fast
            # path is unavailable (it costs 8 bytes/sample host-side).
            vad_seg, pcm = self.vad.segment_signal(sig, 0, medianame,
                                                   return_pcm=True)
        else:
            # the VAD consumes the already-decoded signal
            vad_seg = self.vad.segment_signal(sig, 0, medianame)
        return self._finish_prepare(sig, signal64, pcm, basename, vad_seg)

    def _finish_prepare(self, sig, signal, pcm, basename, vad_seg):
        n_samples = len(sig)
        duration = n_samples / SR
        timeline = SpeechTimeline.from_vad(vad_seg)
        speech_duration = timeline.total_duration()

        fea = None
        if speech_duration:
            # stays device-resident: the extractor gathers its windows on
            # device (embeddings_from_features) — no host round trip
            if (pcm is not None and n_samples >= 400
                    and _vbx_i16_enabled()):
                fea = self.features.features_from_pcm(pcm, n_samples)
            else:
                if signal is None:
                    signal = sig.astype(np.float64) / 32768.0
                fea = self.features.features(signal)
        return basename, fea, timeline, duration, speech_duration

    def score_signal(self, sig, basename="<signal>"):
        """Score an already-decoded 16 kHz mono signal (int16, or float in
        [-1, 1]) -> (score | None, speech_duration_s, n_retained_xvectors).

        Framework extension, the VFS counterpart of
        `Segmenter.segment_signal`: callers that already hold the PCM (the
        OnlineVFS live monitor, pipelines with their own decode) skip the
        file round trip; identical output to `__call__` on a file whose
        decode yields ``sig``.  Float inputs are treated as the feature
        signal directly (the reference feeds float64 to its features)."""
        if not hasattr(self.vad, "segment_signal"):
            raise TypeError(
                "score_signal needs the standard Segmenter VAD (an injected "
                "path-based VAD callable cannot consume a signal)")
        sig = np.asarray(sig)
        if self._overlap_eligible() and self._overlap_eligible_signal(sig):
            return self._score_signal_overlapped(sig, basename)
        return self._score_prepared(self._prepare_signal(sig, basename))

    def _score_prepared(self, prepared):
        """ResNet + gender MLP on prepared features
        -> (score | None, speech_duration_s, n_retained_xvectors)."""
        basename, fea, timeline, duration, speech_duration = prepared
        if not speech_duration:
            return None, speech_duration, 0
        if _accepts_timeline(self.xvector_model):
            # speech-only extraction: midpoint-filtered windows (exact,
            # non-speech-midpoint windows can never be kept or back-filled)
            x_vectors = self.xvector_model(basename, fea, duration,
                                           timeline=timeline)
        else:
            # reference duck-type contract (vbx_segmenter.py:182): the
            # extractor is called with exactly (basename, features,
            # duration) — keep injected reference-style extractors working
            x_vectors = self.xvector_model(basename, fea, duration)
        return self._score_xvectors(x_vectors, timeline, speech_duration)

    def _score_xvectors(self, x_vectors, timeline, speech_duration):
        """apply_vad -> gender MLP -> femininity score: the scoring tail
        shared by `_score_prepared` and `OnlineVFS.current()` (one owner,
        so score-rule changes cannot silently diverge between the offline
        and live paths)."""
        x_vectors = self.apply_vad(x_vectors, timeline)
        if not x_vectors:
            # a speech sliver can leave no window midpoint in speech (then
            # the back-fill pool is empty too): score is undefined, same
            # contract as the no-speech case.  The reference crashes here
            # (ZeroDivisionError in get_femininity_score,
            # vbx_segmenter.py:55-61) — deliberate deviation.
            return None, speech_duration, 0

        x = np.asarray([x for _, _, x in x_vectors])
        pred = np.asarray(self.gender_detection_mlp_model(
            jnp.asarray(x))).squeeze()
        pred = np.atleast_1d(pred)
        g_preds = [(seg[0], seg[1], float(p))
                   for (_, seg, _), p in zip(x_vectors, pred)]
        return get_femininity_score(g_preds), speech_duration, len(g_preds)

    def __call__(self, fpath):
        """-> (score | None, speech_duration_s, n_retained_xvectors)."""
        if self._overlap_eligible():
            sig = media2sig16kmono(fpath, ffmpeg=self.ffmpeg, dtype="auto")
            basename = os.path.splitext(os.path.basename(fpath))[0]
            if self._overlap_eligible_signal(sig):
                return self._score_signal_overlapped(sig, basename)
            return self._score_prepared(
                self._prepare_signal(sig, basename, medianame=fpath))
        return self._score_prepared(self._prepare(fpath))

    # -- overlapped pipeline ---------------------------------------------
    #
    # The serial shape of `__call__` is [upload + VAD] then [x-vectors]:
    # window selection needs the decoded speech timeline, which is only
    # known once the LAST upload group has landed — so on link-bound hosts
    # the ResNet runs entirely after the transfer, the reference's own
    # "most costly part" (vbx_segmenter.py:174-176, :222-243) serialized
    # behind the wire.  The overlapped path speculates: as each upload
    # group lands it computes that region's VBx feature blocks
    # (`VbxPcmStream` — bit-identical to the whole-file path by
    # construction) and embeds windows whose midpoint falls in a cheap
    # PROVISIONAL speech mask (energy activity + VAD-CNN argmax, dilated
    # by ISS_VFS_PROV_DILATE 20 ms frames).  Exactness is unconditional:
    # an embedding depends only on final feature values, the final
    # selection re-runs the reference midpoint/overlap filters on the
    # EXACT decoded timeline, windows the speculation missed are embedded
    # in a catch-up batch, and speculative extras are dropped — so the
    # result is identical to the serial path (asserted in
    # tests/test_vfs_overlap.py), only the schedule changes.

    def _overlap_eligible(self):
        """Static gates: the overlap needs the standard Segmenter VAD (its
        streaming chunk machinery), the first-party extractor, the
        speech-only filter, and the int16 device VBx path."""
        if os.environ.get("ISS_VFS_OVERLAP", "auto") == "0":
            return False
        return (hasattr(self.vad, "segment_signal")
                and hasattr(self.vad.frontend, "iter_group_feats")
                and os.environ.get("ISS_STREAMING", "1") != "0"
                and isinstance(self.xvector_model, JaxResnetExtractor)
                and self.xvector_model.mesh is None
                and os.environ.get("ISS_XVEC_SPEECH_ONLY", "1") != "0"
                and isinstance(self.features, VbxFrontend)
                and _vbx_i16_enabled())

    def _overlap_eligible_signal(self, sig):
        """Per-signal gates: exact int16 PCM, long enough for the
        streaming chunk path (same threshold as segment_signal)."""
        from .dsp.sidekit import CHUNK, frame_count

        return (sig.dtype == np.int16 and len(sig) >= 400
                and frame_count(len(sig)) >= 68
                and frame_count(len(sig)) > CHUNK)

    def _score_signal_overlapped(self, sig, basename="<signal>"):
        """Upload/compute-overlapped scoring of an int16 signal; output
        identical to the serial `score_signal` (same feature programs,
        same window set, same scoring tail)."""
        import jax.numpy as jnp  # noqa: F811  (local: keep module lazy)

        from .dsp.sidekit import frame_count
        from .dsp.vbx import VbxPcmStream

        seg = self.vad
        vad_params = seg.vad.model.params
        t = frame_count(len(sig))
        n20 = (t + 1) // 2
        n = len(sig)
        duration = n / SR
        n_frames_vbx = (n - 80) // 160 + 1
        vstream = VbxPcmStream(self.features, n)
        session = _EmbedSession(self.xvector_model)
        dilate = max(0, int(os.environ.get("ISS_VFS_PROV_DILATE", "12")))
        # all full-window starts, in VBx frames (reference
        # vbx_segmenter.py:222); selection state per window
        all_starts = list(range(0, n_frames_vbx - WINLEN, STEP))
        queued = np.zeros(len(all_starts), bool)
        mid20 = np.minimum(
            ((np.asarray(all_starts) + WINLEN / 2) / 100.0 / 0.02)
            .astype(np.int64), max(n20 - 1, 0))

        chunks = []
        probs = []
        mask_handles = []       # device (C20,) bool per chunk
        masks_np = []           # materialized prefix of mask_handles
        stats = (jnp.zeros((), jnp.float32), jnp.zeros((), jnp.float32))
        pending_pcm = None

        def dispatch_chunk_work():
            """Emissions + provisional-mask step for every chunk whose
            right halo is now available."""
            nonlocal stats
            while len(probs) < len(chunks) - 1:
                c = len(probs)
                pv, _ = seg.pipeline.chunk_emissions(vad_params, None,
                                                     chunks, c)
                probs.append(pv)
                s, cnt, mask = _prov_step(seg.pipeline, stats[0], stats[1],
                                          pv, chunks[c][1],
                                          np.float32(seg.energy_ratio))
                stats = (s, cnt)
                # schedule the D2H copy now: by the time select_and_embed
                # materializes this mask (one group later) the bytes are
                # already host-side — a blocking fetch costs a ~24 ms
                # tunnel round trip EACH, ~0.8 s over a 20-minute file
                mask.copy_to_host_async()
                mask_handles.append(mask)

        def select_and_embed(ready):
            """Materialize provisional masks for the first ``ready``
            chunks and dispatch full speculative sub-batches."""
            while len(masks_np) < min(ready, len(mask_handles)):
                masks_np.append(np.asarray(mask_handles[len(masks_np)]))
            if not masks_np:
                return
            prov = np.concatenate(masks_np)
            if dilate:
                # dilated: within +-dilate 20 ms frames of provisional
                # speech (cumsum-based windowed any)
                c = np.zeros(len(prov) + 1, np.int64)
                np.cumsum(prov, out=c[1:])
                lo = np.maximum(np.arange(len(prov)) - dilate, 0)
                hi = np.minimum(np.arange(len(prov)) + dilate + 1, len(prov))
                prov = (c[hi] - c[lo]) > 0
            # a window is speculable once its feature rows are final and
            # its midpoint 20 ms frame has a provisional verdict
            frames_ok = vstream.frames_ready
            for i, s in enumerate(all_starts):
                if queued[i] or s + WINLEN > frames_ok:
                    continue
                if mid20[i] < len(prov) and prov[mid20[i]]:
                    queued[i] = True
                    session.queue(s, vstream.fea_buffer)

        for chunks_g, pcm in seg.frontend.iter_group_feats(
                sig, keep_pcm=True):
            # group uploads + feature programs are already dispatched;
            # issue the cheap dependent device work next, and only THEN
            # block on older provisional masks (the device executes
            # in dispatch order, so the reads below never stall the
            # upload stream of this group)
            ready_before = len(mask_handles)
            chunks.extend(chunks_g)
            if pending_pcm is not None:
                # strip the group's 2*HOP lookahead (the next group's
                # buffer re-covers it) — same as features_from_pcm
                vstream.append(pending_pcm[:pending_pcm.shape[0] - 320])
            pending_pcm = pcm
            dispatch_chunk_work()
            select_and_embed(ready_before)
        if pending_pcm is not None:
            vstream.append(pending_pcm)
        if vstream._pos < n:    # defensive; keep_pcm growth guarantees this
            vstream.append(np.zeros(n - vstream._pos, np.int16))
        # last chunk's emissions (no right halo — exactly run_streaming's
        # frontier behavior), then every remaining speculative window
        pv, _ = seg.pipeline.chunk_emissions(vad_params, None, chunks,
                                             len(chunks) - 1)
        probs.append(pv)
        select_and_embed(len(mask_handles))
        session.flush(vstream.fea_buffer)

        # exact decode (identical inputs/programs to segment_signal)
        ids = np.asarray(seg.pipeline.stream_decode(
            vad_params, None, chunks, probs, None, t, t, n20))[:n20]
        vad_seg = seg.ids_to_lseg(ids, 0)
        timeline = SpeechTimeline.from_vad(vad_seg)
        speech_duration = timeline.total_duration()
        if not speech_duration:
            return None, speech_duration, 0

        fea = vstream.finish()
        return self._finish_from_embeddings(
            basename, fea, duration, timeline, speech_duration,
            session.collect)

    def _finish_from_embeddings(self, basename, fea, duration, timeline,
                                speech_duration, collect):
        """Exact final scoring from (possibly pre-computed) embeddings:
        reference window set + midpoint filter on the decoded timeline,
        NaN drop, ragged tail window, x10 scaling, then the shared
        scoring tail.  ``collect(fea, needed_starts) -> {start: raw emb}``
        supplies full-window embeddings (speculative cache + catch-up).
        Shared by the overlapped scorer and OnlineVFS.finalize — both
        must equal the serial `score_signal` exactly."""
        n_frames_vbx = int(fea.shape[0])
        all_starts = list(range(0, n_frames_vbx - WINLEN, STEP))

        def midpoint_in_speech(sg):
            return timeline.contains_point((sg[0] + sg[1]) / 2)

        segs = [(round(s / 100.0, 3), round(s / 100.0 + WINLEN / 100.0, 3))
                for s in all_starts]
        kept = [i for i, sg in enumerate(segs) if midpoint_in_speech(sg)]
        embs = collect(fea, [all_starts[i] for i in kept])
        x_vectors = []
        for i in kept:
            s = all_starts[i]
            key = f"{basename}_{s:08}-{s + WINLEN:08}"
            emb = embs[s]
            if np.isnan(emb).any():
                logger.warning(f"NaN found, not processing: {key}{os.linesep}")
            else:
                x_vectors.append((key, segs[i], emb))
        start = all_starts[-1] if all_starts else 0
        if n_frames_vbx - start - STEP >= 10:
            tail_seg = (round((start + STEP) / 100.0, 3), round(duration, 3))
            if midpoint_in_speech(tail_seg):
                tail_len = n_frames_vbx - (start + STEP)
                if os.environ.get("ISS_XVEC_TAIL", "masked") == "exact":
                    emb = self.xvector_model.get_embedding(
                        np.asarray(fea[start + STEP:], np.float32))
                else:
                    emb = self.xvector_model.get_embedding_masked(
                        fea, start + STEP, tail_len)
                key = f"{basename}_{start + STEP:08}-{n_frames_vbx:08}"
                if np.isnan(emb).any():
                    logger.warning(
                        f"NaN found, not processing: {key}{os.linesep}")
                else:
                    x_vectors.append((key, tail_seg, emb))
        x_vectors = [(key, sg, x * 10) for key, sg, x in x_vectors]
        return self._score_xvectors(x_vectors, timeline, speech_duration)

    # ------------------------------------------------------------------
    def batch_score(self, linput, loutput, verbose=False, skipifexist=False,
                    nbtry=1, trydelay=2.):
        """Score a list of files, one tab-separated csv per input.

        Framework extension: the reference farms only segmentation jobs
        through batch_process (pyro_client.py:57-74); this gives the VFS
        pipeline the same corpus surface — identical status tuples,
        skipifexist resume, nbtry/trydelay retry with randomized backoff —
        so VFS jobs run through the job farm / CLI unchanged.

        Returns (total_duration_s, n_processed, avg_s_per_file, lmsg) with
        lmsg entries (dst, 0|1|2, 'ok t'|'already exists'|'error: ...').

        Host prefetch: decode + VAD + VBx features of the next
        ``ISS_PREFETCH`` files run on producer threads while the current
        file's ResNet batches execute (same pattern as
        Segmenter.batch_process; the reference's featGenerator analogue,
        segmenter.py:377-387 — its VFS pipeline has no such overlap).
        """
        import time

        from .utils.prefetch import run_prefetched, staged_producer
        from .utils.retry import retry_call

        produce = staged_producer(
            self._prepare,
            skipifexist=skipifexist, nbtry=nbtry, trydelay=trydelay)

        def consume(prepared, item, msg):
            dst = item[1]
            b = time.time()
            # the scoring phase gets the same nbtry/trydelay budget as
            # _prepare (the reference retried the whole file,
            # segmenter.py:360-368): transient device/link errors during
            # the ResNet/MLP must not permanently fail a corpus file
            result, err = retry_call(
                lambda: self._score_prepared(prepared),
                nbtry=nbtry, trydelay=trydelay)
            if result is None:
                return (dst, 2, "error: " + str(err))
            score_to_csv(result, dst)
            return (dst, 0, "ok " + str(time.time() - b))

        # Shared depth-N prefetch driver (utils/prefetch.py): decode+VAD+
        # features of the next files overlap the current file's ResNet,
        # and an unwritable destination fails that one file, not the batch.
        return run_prefetched(list(zip(linput, loutput)), produce, consume,
                              verbose=verbose)

    def batch_process(self, linput, loutput, verbose=False, skipifexist=False,
                      nbtry=1, trydelay=2., output_format="csv"):
        """Job-farm adapter: `client_work_loop` calls batch_process on its
        worker; VFS jobs reuse batch_score (output_format fixed to csv)."""
        assert output_format == "csv", "VFS batch output is csv only"
        return self.batch_score(linput, loutput, verbose=verbose,
                                skipifexist=skipifexist, nbtry=nbtry,
                                trydelay=trydelay)


def _load_resnet_npz(path):
    """Load a native ResNet checkpoint saved with save_resnet_npz."""
    with np.load(path) as z:
        flat = dict(z)
    return _unflatten(flat)


def save_resnet_npz(path, params):
    flat = {}

    def walk(node, prefix):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(v, f"{prefix}.{k}" if prefix else k)
        elif isinstance(node, list):
            for i, v in enumerate(node):
                walk(v, f"{prefix}#{i}")
        else:
            flat[prefix] = np.asarray(node)

    walk(params, "")
    np.savez(path, **flat)


def _unflatten(flat):
    root = {}
    for key, val in flat.items():
        parts = []
        for seg in key.split("."):
            for j, sub in enumerate(seg.split("#")):
                parts.append(sub if j == 0 else int(sub))
        node = root
        for a, b in zip(parts[:-1], parts[1:]):
            if isinstance(a, int):
                while len(node) <= a:
                    node.append(None)
                if node[a] is None:
                    node[a] = [] if isinstance(b, int) else {}
                node = node[a]
            else:
                if a not in node:
                    node[a] = [] if isinstance(b, int) else {}
                node = node[a]
        last = parts[-1]
        if isinstance(last, int):
            while len(node) <= last:
                node.append(None)
            node[last] = val
        else:
            node[last] = val
    return root


def _load_resnet_onnx(net, path):
    """Map `final.onnx` weights onto the ResNet pytree by graph topology.

    Uses the first-party protobuf reader (models/onnx_reader.py) — no
    `onnx`/`onnxruntime` dependency.  Initializer NAMES are ignored entirely
    (torch-exported graphs carry opaque names like ``onnx::Conv_123``);
    instead the Conv/BatchNormalization/Gemm node stream is consumed in graph
    order, which for this architecture (reference resnet.py:117-131 forward:
    conv1..conv3 then shortcut) is the forward execution order.  Every
    assignment is shape-checked against the expected architecture.
    """
    from .models.onnx_reader import read_model

    g = read_model(path)

    # exporters deduplicate identical initializers behind Identity nodes
    # (e.g. every fresh BN gamma aliases one shared ones-vector)
    alias = {n.outputs[0]: n.inputs[0] for n in g.nodes
             if n.op_type == "Identity" and n.inputs and n.outputs}

    def arr(name):
        seen = set()
        while name in alias and name not in g.initializers:
            if name in seen:
                raise ValueError(f"onnx graph: Identity cycle at {name!r}")
            seen.add(name)
            name = alias[name]
        if name not in g.initializers:
            raise ValueError(
                f"onnx graph: expected weight tensor {name!r} to be an "
                "initializer or Constant (dynamic weights unsupported)")
        return np.asarray(g.initializers[name], np.float32)

    events = []
    for node in g.nodes:
        if node.op_type == "Conv":
            w = arr(node.inputs[1])
            b = arr(node.inputs[2]) if len(node.inputs) > 2 else None
            events.append(("conv", w, b))
        elif node.op_type == "BatchNormalization":
            events.append(("bn", [arr(node.inputs[k]) for k in (1, 2, 3, 4)]))
        elif node.op_type == "Gemm":
            w = arr(node.inputs[1])
            b = arr(node.inputs[2]) if len(node.inputs) > 2 else None
            trans_b = bool(node.attrs.get("transB", 0))
            events.append(("gemm", w, b, trans_b))

    pos = 0

    def take(kind=None):
        nonlocal pos
        if pos >= len(events):
            raise ValueError("onnx graph ended early — architecture mismatch")
        ev = events[pos]
        if kind is not None and ev[0] != kind:
            raise ValueError(f"expected {kind}, got {ev[0]} at node {pos}")
        pos += 1
        return ev

    def peek():
        return events[pos][0] if pos < len(events) else None

    def take_conv_bn(shape):
        """Consume a Conv and its BatchNormalization.

        Eval-mode torch exports usually constant-fold BN into the conv
        (do_constant_folding default): then the conv carries a bias and no BN
        node follows — synthesize an identity BN whose beta is the bias.  In
        unfused graphs a conv bias is folded into the BN running mean
        (bn(x + b) == bn with mean - b).
        """
        _, w, b = take("conv")
        # ONNX conv weight (cout, cin, kh, kw) -> HWIO
        w = np.transpose(w, (2, 3, 1, 0))
        if w.shape != shape:
            raise ValueError(f"onnx conv shape {w.shape} != expected {shape}")
        cout = shape[-1]
        if peek() == "bn":
            gamma, beta, mean, var = take("bn")[1]
            if b is not None:
                mean = mean - b
        else:
            gamma = np.ones(cout, np.float32)
            beta = b if b is not None else np.zeros(cout, np.float32)
            mean = np.zeros(cout, np.float32)
            # our _bn adds eps=1e-5 to var; cancel it for an exact identity
            var = np.full(cout, 1.0 - 1e-5, np.float32)
        return w, dict(gamma=gamma, beta=beta, mean=mean, var=var)

    mc = net.m_channels
    params = {}
    params["conv1"], params["bn1"] = take_conv_bn((3, 3, 1, mc))
    in_planes = mc
    for si, (mult, nb, stride) in enumerate(
            zip([1, 2, 4, 8], net.num_blocks, [1, 2, 2, 2])):
        planes = mc * mult
        blocks = []
        for bi in range(nb):
            s = stride if bi == 0 else 1
            p = {}
            if net.block == "bottleneck":
                p["conv1"], p["bn1"] = take_conv_bn((1, 1, in_planes, planes))
                p["conv2"], p["bn2"] = take_conv_bn((3, 3, planes, planes))
                p["conv3"], p["bn3"] = take_conv_bn(
                    (1, 1, planes, planes * 4))
                out_planes = planes * 4
            else:
                p["conv1"], p["bn1"] = take_conv_bn((3, 3, in_planes, planes))
                p["conv2"], p["bn2"] = take_conv_bn((3, 3, planes, planes))
                out_planes = planes
            if s != 1 or in_planes != out_planes:
                p["sc_conv"], p["sc_bn"] = take_conv_bn(
                    (1, 1, in_planes, out_planes))
            blocks.append(p)
            in_planes = out_planes
        params[f"layer{si + 1}"] = blocks

    _, w, b, trans_b = take("gemm")
    if trans_b:                      # torch Linear: B is (out, in), transB=1
        w = np.transpose(w, (1, 0))
    from .models.resnet import pooled_freq

    feat = in_planes * 2 * pooled_freq(net.feat_dim)
    if w.shape != (feat, net.embed_dim):
        raise ValueError(
            f"onnx embedding shape {w.shape} != expected "
            f"{(feat, net.embed_dim)}")
    params["embedding"] = dict(
        w=w, b=b if b is not None else np.zeros(net.embed_dim, np.float32))
    if pos != len(events):
        raise ValueError(
            f"onnx graph has {len(events) - pos} unconsumed weighted nodes "
            "— architecture mismatch")
    return params
