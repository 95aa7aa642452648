"""End-to-end VFS parity against the ACTUAL reference implementation.

Runs the reference ``VoiceFemininityScoring`` (vbx_segmenter.py:92-202) as an
executable oracle and compares its ``(score, speech_duration, n_vectors)``
contract with ours.  Two stand-ins make the reference importable here:

* ``pyannote.core`` — a minimal Segment/Timeline/Annotation implementing
  exactly the operations the reference uses (itertracks, label_duration,
  get_timeline, Timeline.crop/duration, label_timeline, len);
* ``onnxruntime`` — an InferenceSession whose ``run`` calls the SAME tiny
  JAX ResNet (shared weights) our extractor uses, so both frameworks share
  one embedding function and the comparison isolates the orchestration:
  VAD annotation, window bookkeeping (vbx_segmenter.py:217-246), VAD-overlap
  filtering + back-fill (:129-145, :40-52), MLP scoring and the final score.

The strict variant pins both frameworks to one VAD output, where results
must agree exactly; the full variant lets each run its own VAD (<=0.1%
frame-diff budget) and allows single-window flips at segment boundaries.
"""

import os
import sys
import types

import numpy as np
import pytest

pytestmark = pytest.mark.slow

tf = pytest.importorskip("tensorflow")

from test_reference_e2e import (  # noqa: E402
    MODEL_FNAMES, _install_shims, _make_cnn)

REF_ROOT = "/root/reference"
MEDIA = os.path.join(REF_ROOT, "media")

EMBED_DIM = 32


# ---------------------------------------------------------------------------
# pyannote.core stand-in (only the surface vbx_segmenter.py touches)
# ---------------------------------------------------------------------------

class _Segment:
    __slots__ = ("start", "end")

    def __init__(self, start, end):
        self.start = start
        self.end = end

    @property
    def stop(self):  # reference add_needed_vectors reads s.stop
        return self.end

    @property
    def duration(self):
        return self.end - self.start

    def _key(self):
        return (self.start, self.end)

    def __lt__(self, other):
        return self._key() < other._key()

    def __eq__(self, other):
        return isinstance(other, _Segment) and self._key() == other._key()

    def __hash__(self):
        return hash(self._key())


class _Timeline:
    def __init__(self, segments=None):
        self._segs = sorted(set(segments or []))

    def crop(self, support):
        out = []
        for s in self._segs:
            for t in support._segs:
                a, b = max(s.start, t.start), min(s.end, t.end)
                if b > a:
                    out.append(_Segment(a, b))
        return _Timeline(out)

    def duration(self):
        return sum(s.duration for s in self._segs)

    def __len__(self):
        return len(self._segs)

    def __iter__(self):
        return iter(self._segs)


class _Annotation:
    def __init__(self):
        self._tracks = {}                      # (segment, track) -> label

    def __setitem__(self, key, label):
        seg, track = key
        self._tracks[(seg, track)] = label

    def __len__(self):
        return len({seg for seg, _ in self._tracks})

    def itertracks(self, yield_label=False):
        for (seg, track) in sorted(self._tracks, key=lambda k: k[0]._key()):
            if yield_label:
                yield seg, track, self._tracks[(seg, track)]
            else:
                yield seg, track

    def get_timeline(self):
        return _Timeline([seg for seg, _ in self._tracks])

    def label_timeline(self, label):
        return _Timeline([seg for (seg, _), lab in self._tracks.items()
                          if lab == label])

    def label_duration(self, label):
        return self.label_timeline(label).duration()


# ---------------------------------------------------------------------------
# onnxruntime stand-in: delegates to a shared JAX embedding function
# ---------------------------------------------------------------------------

_EMBED_FN = [None]                     # set by the fixture


def _install_vfs_shims():
    _install_shims()
    if "pyannote" not in sys.modules:
        pyannote = types.ModuleType("pyannote")
        core = types.ModuleType("pyannote.core")
        core.Segment = _Segment
        core.Timeline = _Timeline
        core.Annotation = _Annotation
        pyannote.core = core
        sys.modules["pyannote"] = pyannote
        sys.modules["pyannote.core"] = core
    if "onnxruntime" not in sys.modules:
        ort = types.ModuleType("onnxruntime")

        class SessionOptions:
            pass

        class _Named:
            def __init__(self, name):
                self.name = name

        class InferenceSession:
            def __init__(self, path, so=None, providers=None):
                pass

            def get_inputs(self):
                return [_Named("feats")]

            def get_outputs(self):
                return [_Named("embedding")]

            def run(self, out_names, feed):
                x = np.asarray(feed["feats"], np.float32)   # (1, 64, T)
                return [_EMBED_FN[0](x)]

        ort.SessionOptions = SessionOptions
        ort.InferenceSession = InferenceSession
        sys.modules["onnxruntime"] = ort


# ---------------------------------------------------------------------------
# fixtures: shared weights (CNNs + MLP + tiny ResNet)
# ---------------------------------------------------------------------------

def _make_mlp(seed):
    keras = tf.keras
    # deterministic regardless of suite ordering (kernel inits draw from
    # TF's global RNG)
    keras.utils.set_random_seed(seed)
    rng = np.random.default_rng(seed)
    model = keras.Sequential([
        keras.layers.Input((EMBED_DIM,)),
        keras.layers.Dense(16, activation="relu"),
        keras.layers.Dense(1, activation="sigmoid"),
    ])
    # sharpen so p is decisive (not knife-edge at the 0.5 threshold)
    k, b = model.layers[-1].get_weights()
    model.layers[-1].set_weights(
        [k * 8.0, b + rng.standard_normal(b.shape).astype(np.float32)])
    return model


@pytest.fixture(scope="module")
def vfs_env(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("vfs_shared"))
    for fname, (nmel, n_out, seed) in MODEL_FNAMES.items():
        _make_cnn(nmel, n_out, seed).save(os.path.join(d, fname))
    for fname in ("interspeech2023_all.hdf5", "interspeech2023_cvfr.hdf5"):
        _make_mlp(21).save(os.path.join(d, fname))

    from inaspeechsegmenter_tpu.models.resnet import ResNetXVector

    net = ResNetXVector("bottleneck", (1, 1, 1, 1), m_channels=8,
                        feat_dim=64, embed_dim=EMBED_DIM)
    params = net.init_params(seed=7)

    def embed(x):                          # (1, 64, T) -> (1, EMBED_DIM)
        return np.asarray(net(params, x))

    _EMBED_FN[0] = embed

    _install_vfs_shims()
    sys.path.insert(0, REF_ROOT)
    try:
        import inaSpeechSegmenter.vbx_segmenter as ref_vbx
        import inaSpeechSegmenter.segmenter as ref_segmenter
    finally:
        sys.path.remove(REF_ROOT)
    saved = {"seg_get_remote": ref_segmenter.get_remote,
             "vbx_get_remote": ref_vbx.get_remote,
             "vbx_Segmenter": ref_vbx.Segmenter,
             "vbx_m2s": ref_vbx.media2sig16kmono}
    ref_segmenter.get_remote = lambda fname: os.path.join(d, fname)
    ref_vbx.get_remote = lambda fname: os.path.join(d, fname)
    # no ffmpeg binary in this env: force the reference onto its
    # soundfile/WAV path (its VFS hardcodes the ffmpeg defaults)
    _Seg, _m2s = ref_vbx.Segmenter, ref_vbx.media2sig16kmono
    ref_vbx.Segmenter = lambda **kw: _Seg(ffmpeg=None, **kw)
    ref_vbx.media2sig16kmono = (
        lambda fpath, **kw: _m2s(fpath, **{**kw, "ffmpeg": None}))

    old = os.environ.get("ISS_TPU_MODEL_DIR")
    os.environ["ISS_TPU_MODEL_DIR"] = d
    yield types.SimpleNamespace(ref_vbx=ref_vbx, net=net, params=params,
                                weights_dir=d)
    # restore the shared reference modules (session-cached in sys.modules
    # and also patched by test_reference_e2e's fixtures)
    ref_segmenter.get_remote = saved["seg_get_remote"]
    ref_vbx.get_remote = saved["vbx_get_remote"]
    ref_vbx.Segmenter = saved["vbx_Segmenter"]
    ref_vbx.media2sig16kmono = saved["vbx_m2s"]
    if old is None:
        os.environ.pop("ISS_TPU_MODEL_DIR", None)
    else:
        os.environ["ISS_TPU_MODEL_DIR"] = old


def _build_pair(vfs_env, criteria="bgc"):
    from inaspeechsegmenter_tpu.vfs import VoiceFemininityScoring

    ref = vfs_env.ref_vbx.VoiceFemininityScoring(gd_model_criteria=criteria)
    ref.vad.ffmpeg = None                      # no ffmpeg in this env
    tpu = VoiceFemininityScoring(gd_model_criteria=criteria, backend="jax",
                                 allow_download=False, ffmpeg=None,
                                 xvector_net=vfs_env.net,
                                 xvector_params=vfs_env.params)
    return ref, tpu


def test_reference_vfs_strict_shared_vad(vfs_env):
    """Pin both frameworks to one synthetic VAD timeline: everything
    downstream (windowing, overlap filtering, back-fill, MLP, score) must
    agree exactly.  The timeline is chosen so some windows pass the
    midpoint test but fail the overlap threshold (exercising back-fill)."""
    ref, tpu = _build_pair(vfs_env)
    path = os.path.join(MEDIA, "lamartine.wav")
    vad_out = [("speech", 0.0, 2.1), ("noise", 2.1, 3.4),
               ("speech", 3.4, 7.9), ("music", 7.9, 9.05),
               ("speech", 9.05, 13.0), ("noEnergy", 13.0, 15.0)]

    ref.vad = lambda p: vad_out
    tpu.vad = lambda p: vad_out

    r_score, r_dur, r_n = ref(path)
    t_score, t_dur, t_n = tpu(path)
    assert r_n == t_n and r_n > 0
    assert abs(r_dur - t_dur) < 1e-9
    assert abs(r_score - t_score) < 1e-9, (r_score, t_score)


@pytest.mark.parametrize("wav", ["lamartine.wav", "musanmix.wav"])
def test_reference_vfs_end_to_end(vfs_env, wav):
    """Full pipeline including each framework's own VAD: scores may differ
    only by boundary-window flips within the VAD frame-diff budget."""
    ref, tpu = _build_pair(vfs_env)
    path = os.path.join(MEDIA, wav)
    r_score, r_dur, r_n = ref(path)
    t_score, t_dur, t_n = tpu(path)
    assert abs(r_dur - t_dur) <= 0.1, (r_dur, t_dur)
    assert abs(r_n - t_n) <= 1, (r_n, t_n)
    if r_n == 0 or t_n == 0:
        # synthetic random CNNs may detect (almost) no speech; the VAD
        # agreement above is then the whole check
        assert (r_score is None) == (r_n == 0)
        assert (t_score is None) == (t_n == 0)
        return
    n = max(r_n, t_n)
    assert abs(r_score - t_score) <= 2.0 / n, (r_score, t_score, n)


def test_reference_vfs_oracle_is_live(vfs_env):
    src = sys.modules["inaSpeechSegmenter.vbx_segmenter"].__file__
    assert src.startswith(REF_ROOT)
