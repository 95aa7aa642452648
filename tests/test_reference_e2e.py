"""End-to-end parity against the ACTUAL reference code.

Imports /root/reference/inaSpeechSegmenter as an executable oracle (its real
Segmenter, feature code, Viterbi, orchestration — everything), with two thin
stand-ins for packages absent in this environment:

* ``skimage.util.view_as_windows`` — a stride-tricks equivalent (the
  reference only uses 2-D windows with an integer step, segmenter.py:78);
* ``soundfile.read`` — backed by our first-party WAV reader (the reference
  no-ffmpeg path only needs 16 kHz WAV, io.py:50);
* ``pytextgrid`` — import-time placeholder (seg2textgrid is never called).

Identical Keras hdf5 weights (saved by the in-env TF) are installed for both
frameworks, so the comparison covers the full pipeline: energy VAD + Viterbi,
patch extraction/normalization, CNN forward (TF vs our importer), per-segment
Viterbi smoothing, and frame->seconds conversion.  Budget: <=0.1% frame-label
diff (the project north star; reference methodology run_test.py:90-105).
"""

import os
import sys
import types

import numpy as np
import pytest

pytestmark = pytest.mark.slow

tf = pytest.importorskip("tensorflow")

REF_ROOT = "/root/reference"
MEDIA = os.path.join(REF_ROOT, "media")


# ---------------------------------------------------------------------------
# stand-in modules for deps absent in this env
# ---------------------------------------------------------------------------

def _view_as_windows(arr_in, window_shape, step=1):
    arr_in = np.asarray(arr_in)
    nd = arr_in.ndim
    if isinstance(window_shape, int):
        window_shape = (window_shape,) * nd
    if isinstance(step, int):
        step = (step,) * nd
    sw = np.lib.stride_tricks.sliding_window_view(arr_in, tuple(window_shape))
    return sw[tuple(slice(None, None, s) for s in step)]


def _sf_read(medianame, dtype="float64"):
    from inaspeechsegmenter_tpu.audio import read_wav

    return read_wav(medianame, dtype=dtype)


def _install_shims():
    if "skimage" not in sys.modules:
        skimage = types.ModuleType("skimage")
        util = types.ModuleType("skimage.util")
        util.view_as_windows = _view_as_windows
        skimage.util = util
        sys.modules["skimage"] = skimage
        sys.modules["skimage.util"] = util
    if "soundfile" not in sys.modules:
        sf = types.ModuleType("soundfile")
        sf.read = _sf_read
        sys.modules["soundfile"] = sf
    if "pytextgrid" not in sys.modules:
        ptg = types.ModuleType("pytextgrid")
        praat = types.ModuleType("pytextgrid.PraatTextGrid")

        class _Unavailable:
            def __init__(self, *a, **k):
                raise RuntimeError("pytextgrid not available in test env")

        praat.PraatTextGrid = praat.Interval = praat.Tier = _Unavailable
        ptg.PraatTextGrid = praat
        sys.modules["pytextgrid"] = ptg
        sys.modules["pytextgrid.PraatTextGrid"] = praat


# ---------------------------------------------------------------------------
# shared synthetic Keras weights (sharp logits so decisions are stable)
# ---------------------------------------------------------------------------

def _make_cnn(nmel, n_out, seed):
    keras = tf.keras
    # deterministic regardless of suite ordering: layer kernel inits draw
    # from TF's global RNG, which other tests advance
    keras.utils.set_random_seed(seed)
    rng = np.random.default_rng(seed)
    model = keras.Sequential([
        keras.layers.Input((68, nmel, 1)),
        keras.layers.Conv2D(8, 3, padding="same", activation="relu"),
        keras.layers.BatchNormalization(),
        keras.layers.MaxPooling2D((2, 1)),
        keras.layers.Conv2D(16, 3, padding="same", activation="relu"),
        keras.layers.MaxPooling2D((2, 2)),
        keras.layers.Flatten(),
        keras.layers.Dense(32, activation="relu"),
        keras.layers.Dense(n_out, activation="softmax"),
    ])
    # randomize BN stats (eval-mode parity must not be trivial) and sharpen
    # the final layer so softmax outputs are decisive: near-uniform random
    # predictions would make frame labels knife-edge-sensitive to float
    # noise, which is not what the parity budget measures
    bn = model.layers[1]
    bn.set_weights([w + rng.standard_normal(w.shape).astype(np.float32) * 0.1
                    for w in bn.get_weights()])
    fin = model.layers[-1]
    k, b = fin.get_weights()
    fin.set_weights([k * 6.0, b])
    return model


MODEL_FNAMES = {
    "keras_speech_music_cnn.hdf5": (21, 2, 11),
    "keras_speech_music_noise_cnn.hdf5": (21, 3, 12),
    "keras_male_female_cnn.hdf5": (24, 2, 13),
}


@pytest.fixture(scope="session")
def shared_weights_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("shared_h5")
    for fname, (nmel, n_out, seed) in MODEL_FNAMES.items():
        _make_cnn(nmel, n_out, seed).save(str(d / fname))
    return str(d)


@pytest.fixture(scope="session")
def ref_pkg(shared_weights_dir):
    _install_shims()
    sys.path.insert(0, REF_ROOT)
    try:
        import inaSpeechSegmenter as ref
    finally:
        sys.path.remove(REF_ROOT)
    # resolve models from the shared dir instead of the network registry
    ref.segmenter.get_remote = (
        lambda fname: os.path.join(shared_weights_dir, fname))
    return ref


@pytest.fixture()
def tpu_env(shared_weights_dir):
    # function-scoped on purpose: the env var must be restored before any
    # other test's fixtures resolve models (a session-scoped teardown would
    # leave the MLP-less shared dir active for the rest of the run)
    old = os.environ.get("ISS_TPU_MODEL_DIR")
    os.environ["ISS_TPU_MODEL_DIR"] = shared_weights_dir
    yield shared_weights_dir
    if old is None:
        os.environ.pop("ISS_TPU_MODEL_DIR", None)
    else:
        os.environ["ISS_TPU_MODEL_DIR"] = old


# ---------------------------------------------------------------------------
# frame-level comparison
# ---------------------------------------------------------------------------

def _frames(lseg):
    """Segment list -> per-20ms-frame label array."""
    n = int(round(lseg[-1][2] / 0.02))
    out = np.empty(n, object)
    for lab, start, stop in lseg:
        out[int(round(start / 0.02)):int(round(stop / 0.02))] = lab
    return out


def _assert_frame_parity(ref_seg, tpu_seg, budget=0.001):
    fr_ref = _frames(ref_seg)
    fr_tpu = _frames(tpu_seg)
    assert abs(len(fr_ref) - len(fr_tpu)) <= 1, (len(fr_ref), len(fr_tpu))
    n = min(len(fr_ref), len(fr_tpu))
    diff = np.mean(fr_ref[:n] != fr_tpu[:n])
    assert diff <= budget, (
        f"frame diff {diff:.4%} > {budget:.1%}: "
        f"ref={ref_seg[:5]}... tpu={tpu_seg[:5]}...")


WAVS = ["musanmix.wav", "silence2sec.wav", "lamartine.wav"]


@pytest.mark.parametrize("engine,gender", [("smn", True), ("sm", True),
                                           ("smn", False)])
def test_reference_end_to_end(ref_pkg, tpu_env, engine, gender):
    from inaspeechsegmenter_tpu import Segmenter

    ref_seg = ref_pkg.Segmenter(vad_engine=engine, detect_gender=gender,
                                ffmpeg=None)
    tpu_seg = Segmenter(vad_engine=engine, detect_gender=gender, ffmpeg=None,
                        allow_download=False)
    for wav in WAVS:
        path = os.path.join(MEDIA, wav)
        r = ref_seg(path)
        t = tpu_seg(path)
        assert len(r) > 0 and len(t) > 0
        _assert_frame_parity(r, t)


def test_reference_oracle_is_live(ref_pkg):
    """The oracle really is the reference code, not a stub."""
    assert ref_pkg.Segmenter.__module__ == "inaSpeechSegmenter.segmenter"
    src = sys.modules["inaSpeechSegmenter.segmenter"].__file__
    assert src.startswith(REF_ROOT)


def test_reference_batch_csv_byte_parity(ref_pkg, tpu_env, tmp_path):
    """batch_process: CSVs written by the reference and by this framework
    are byte-identical (export formatting + orchestration, not just the
    committed golden fixtures)."""
    import filecmp

    from inaspeechsegmenter_tpu import Segmenter

    ref_seg = ref_pkg.Segmenter(vad_engine="smn", detect_gender=True,
                                ffmpeg=None)
    tpu_seg = Segmenter(vad_engine="smn", detect_gender=True, ffmpeg=None,
                        allow_download=False)
    lin = [os.path.join(MEDIA, w) for w in WAVS]
    ref_out = [str(tmp_path / "ref" / (w + ".csv")) for w in WAVS]
    tpu_out = [str(tmp_path / "tpu" / (w + ".csv")) for w in WAVS]
    r_ret = ref_seg.batch_process(lin, ref_out)
    t_ret = tpu_seg.batch_process(lin, tpu_out)
    assert r_ret[1] == t_ret[1] == len(WAVS)          # nb_processed
    assert [m[1] for m in r_ret[3]] == [m[1] for m in t_ret[3]]
    for rf, tf_ in zip(ref_out, tpu_out):
        assert filecmp.cmp(rf, tf_, shallow=False), (rf, tf_)


def test_reference_segment_feats_offset(ref_pkg, tpu_env):
    """segment_feats with a nonzero start_sec: the frame->seconds offset
    conversion matches the reference (segmenter.py:276)."""
    from inaspeechsegmenter_tpu import Segmenter

    _install_shims()
    sig, sr = _sf_read(os.path.join(MEDIA, "musanmix.wav"), dtype="float32")
    assert sr == 16000
    mspec, loge, difflen = ref_pkg.segmenter._media2feats(
        os.path.join(MEDIA, "musanmix.wav"), None, None, None)

    ref_seg = ref_pkg.Segmenter(vad_engine="smn", detect_gender=True,
                                ffmpeg=None)
    tpu_seg = Segmenter(vad_engine="smn", detect_gender=True, ffmpeg=None,
                        allow_download=False)
    start = 12.34
    r = ref_seg.segment_feats(mspec, loge, difflen, start)
    t = tpu_seg.segment_feats(mspec, loge, difflen, start)
    assert r[0][1] == start and t[0][1] == start
    # same frame budget as the main e2e, after removing the offset
    r0 = [(lab, s - start, e - start) for lab, s, e in r]
    t0 = [(lab, s - start, e - start) for lab, s, e in t]
    _assert_frame_parity(r0, t0)
