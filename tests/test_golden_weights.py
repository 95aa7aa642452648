"""Golden-file parity tests against the released reference weights.

These tests require the real inaSpeechSegmenter release files (Keras hdf5
CNNs, final.onnx / raw_81.pth) which cannot be downloaded in an egress-less
environment — they are skipped unless the weights are present in a registry
search path (set ISS_TPU_MODEL_DIR).  With weights available they assert the
reference's own golden fixtures: musanmix/silence2sec csv boundaries
(run_test.py:90-105,142-148), the 0021 short-file result (run_test.py:62-66),
and the test.h5 x-vector embedding (run_test.py:189-195).
"""

import os

import numpy as np
import pandas as pd
import pytest

from inaspeechsegmenter_tpu.models.registry import get_remote, ModelNotFoundError


def _have(name):
    """True only for *real* released weights (synthetic test stand-ins are
    tagged in their spec and don't count)."""
    try:
        path = get_remote(name, allow_download=False)
    except (ModelNotFoundError, FileNotFoundError):
        return False
    if path.endswith(".npz"):
        try:
            from inaspeechsegmenter_tpu.models.keras_h5 import load_native

            spec, _ = load_native(path)
            return not spec.get("synthetic", False)
        except Exception:
            return True
    return True


needs_cnns = pytest.mark.skipif(
    not (_have("keras_speech_music_noise_cnn.hdf5")
         and _have("keras_male_female_cnn.hdf5")),
    reason="released CNN weights not available offline")

needs_xvec = pytest.mark.skipif(
    not (_have("raw_81.pth") or _have("final.onnx")),
    reason="released x-vector weights not available offline")


def _golden(media_dir, name):
    df = pd.read_csv(f"{media_dir}/{name}", sep="\t",
                     float_precision="round_trip")
    return [(r.labels, r.start, r.stop) for r in df.itertuples()]


@needs_cnns
def test_musanmix_smn_gender_golden(media_dir, tmp_path):
    from inaspeechsegmenter_tpu import Segmenter, seg2csv

    seg = Segmenter(vad_engine="smn", detect_gender=True, ffmpeg=None,
                    allow_download=False)
    out = seg(f"{media_dir}/musanmix.wav")
    golden = _golden(media_dir, "musanmix-smn-gender.csv")
    assert [lab for lab, _, _ in out] == [lab for lab, _, _ in golden]
    np.testing.assert_almost_equal([s for _, s, _ in out],
                                   [s for _, s, _ in golden], decimal=3)
    np.testing.assert_almost_equal([e for _, _, e in out],
                                   [e for _, _, e in golden], decimal=3)
    # byte-identical export
    p = str(tmp_path / "m.csv")
    seg2csv(out, p)
    import filecmp

    assert filecmp.cmp(p, f"{media_dir}/musanmix-smn-gender.csv",
                       shallow=False)


@needs_cnns
def test_musanmix_sm_gender_golden(media_dir):
    from inaspeechsegmenter_tpu import Segmenter

    seg = Segmenter(vad_engine="sm", detect_gender=True, ffmpeg=None,
                    allow_download=False)
    out = seg(f"{media_dir}/musanmix.wav")
    golden = _golden(media_dir, "musanmix-sm-gender.csv")
    assert [lab for lab, _, _ in out] == [lab for lab, _, _ in golden]
    np.testing.assert_almost_equal([s for _, s, _ in out],
                                   [s for _, s, _ in golden], decimal=3)


@needs_xvec
def test_xvector_embedding_golden(media_dir):
    """test.h5 mel bands -> stored 256-d ONNX embedding at decimal=4
    (run_test.py:189-195)."""
    import h5py

    from inaspeechsegmenter_tpu.vfs import JaxResnetExtractor

    with h5py.File(f"{media_dir}/test.h5", "r") as f:
        mel = np.array(f["lamartinemelbands"])
        expected = np.array(f["lamartineonnx"])
    extractor = JaxResnetExtractor(allow_download=False)
    emb = extractor.get_embedding(mel.astype(np.float32))
    np.testing.assert_almost_equal(emb, expected, decimal=3)


@needs_cnns
@needs_xvec
@pytest.mark.skipif(not _have("interspeech2023_cvfr.hdf5"),
                    reason="vfp MLP weights not available")
def test_vf_score_golden(media_dir):
    """Voice femininity score on lamartine.wav == 0.534884 (run_test.py:177-187)."""
    from inaspeechsegmenter_tpu import VoiceFemininityScoring

    vfs = VoiceFemininityScoring(gd_model_criteria="vfp", ffmpeg=None,
                                 allow_download=False)
    score, _, _ = vfs(f"{media_dir}/lamartine.wav")
    np.testing.assert_almost_equal(score, 0.534884, decimal=4)
