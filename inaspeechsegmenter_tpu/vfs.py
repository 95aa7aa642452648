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
        return self._score_prepared(self._prepare(fpath))

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
